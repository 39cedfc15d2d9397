package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Warc
import graft.ingest.Warc.WarcSpecRec

/** CDX byte-offset indexing + random-access retrieval: span tiling on
  * both wire forms, fetch-by-span identity against the sequential
  * parse, the non-conforming multi-record-member case, stale-index
  * degradation, and longest-valid-prefix totality on corrupt members
  * and decompression bombs. */
class WarcCdxSpec extends AnyFunSuite {

  private def rec(i: Int, block: String = "payload"): WarcSpecRec =
    WarcSpecRec(
      warcType = if (i == 0) "warcinfo" else "response",
      recordId = s"<urn:uuid:rec-$i>",
      targetUri = if (i == 0) None else Some(s"https://example.org/p/$i"),
      date = "2026-01-02T03:04:05Z",
      contentType =
        if (i == 0) "application/warc-fields"
        else "application/http; msgtype=response",
      block = block.getBytes(UTF_8))

  private def assertTiling(es: Seq[Warc.CdxEntry], total: Long): Unit = {
    val spans = es.map(e => (e.offset, e.length)).distinct
    assert(spans.head._1 == 0L)
    spans.sliding(2).foreach {
      case Seq((o1, l1), (o2, _)) => assert(o1 + l1 == o2)
      case _                      => ()
    }
    assert(spans.last._1 + spans.last._2 == total)
  }

  test("gzip: one entry per record, member spans tile the file, and " +
      "every record fetches by its span alone") {
    val specs = Seq(rec(0), rec(1, "HTTP/1.1 200 OK\r\n\r\n<p>a</p>"),
      rec(2, "x" * 50000))
    val gz = Warc.buildWarcGz(specs)
    val es = Warc.cdxEntries(gz)
    assert(es.map(_.recIdx) == Seq(0, 1, 2))
    assert(es.forall(_.memberOrdinal == 0))
    assert(es.map(_.recordId) == specs.map(_.recordId))
    assert(es.map(_.targetUri) == specs.map(_.targetUri))
    assertTiling(es, gz.length.toLong)
    val seq = Warc.parseWarc(gz)
    es.zip(seq).foreach { case (e, expect) =>
      val got = Warc.fetchRecord(gz, e.offset, e.length, e.memberOrdinal)
      assert(got.isDefined)
      assert(got.get.recordId == expect.recordId)
      assert(got.get.block.sameElements(expect.block))
    }
  }

  test("plain: record spans tile the file and fetch by span") {
    val specs = Seq(rec(0), rec(1), rec(2, ""))
    val plain = Warc.buildWarc(specs)
    val es = Warc.cdxEntries(plain)
    assert(es.length == 3)
    assertTiling(es, plain.length.toLong)
    es.zip(specs).foreach { case (e, s) =>
      val got = Warc.fetchRecord(plain, e.offset, e.length)
      assert(got.exists(_.recordId == s.recordId))
    }
  }

  test("non-conforming multi-record member: shared span, ordinals " +
      "disambiguate the fetch") {
    // one gzip member holding TWO records (a writer that ignored the
    // one-member-per-record convention) followed by a conforming member
    val packed = Warc.gzipMember(Warc.buildWarc(Seq(rec(0), rec(1))))
    val tail = Warc.buildWarcGz(Seq(rec(2)))
    val gz = packed ++ tail
    val es = Warc.cdxEntries(gz)
    assert(es.length == 3)
    assert(es(0).offset == es(1).offset && es(0).length == es(1).length)
    assert(es(0).memberOrdinal == 0 && es(1).memberOrdinal == 1)
    assert(es(2).memberOrdinal == 0 && es(2).offset == packed.length.toLong)
    val second = Warc.fetchRecord(gz, es(1).offset, es(1).length,
      es(1).memberOrdinal)
    assert(second.exists(_.recordId == "<urn:uuid:rec-1>"))
    assertTiling(es, gz.length.toLong)
  }

  test("totality: corrupt middle member ends the index on the parsed " +
      "prefix; garbage and empty payloads index to nothing") {
    val good = Warc.buildWarcGz(Seq(rec(0)))
    val corrupt = {
      val m = Warc.gzipMember("not a warc record".getBytes(UTF_8))
      m // inflates fine but parses to zero records → halt AT this span
    }
    val tail = Warc.buildWarcGz(Seq(rec(2)))
    val es = Warc.cdxEntries(good ++ corrupt ++ tail)
    assert(es.map(_.recordId) == Seq("<urn:uuid:rec-0>"))
    // corrupt deflate bytes mid-stream: same prefix behavior
    val broken = good ++ Array[Byte](0x1F.toByte, 0x8B.toByte, 8, 0,
      0, 0, 0, 0, 0, 0, 0x55, 0x55) ++ tail
    assert(Warc.cdxEntries(broken).length == 1)
    assert(Warc.cdxEntries("junk".getBytes(UTF_8)).isEmpty)
    assert(Warc.cdxEntries(Array.emptyByteArray).isEmpty)
    assert(Warc.cdxEntries(null).isEmpty)
    // truncated trailer: member whose 8 trailer bytes are cut off
    val t = Warc.buildWarcGz(Seq(rec(1)))
    assert(Warc.cdxEntries(t.dropRight(3)).isEmpty)
  }

  test("fetchRecord degrades on stale spans, never throws") {
    val gz = Warc.buildWarcGz(Seq(rec(0), rec(1)))
    assert(Warc.fetchRecord(gz, -1, 10).isEmpty)
    assert(Warc.fetchRecord(gz, 0, gz.length + 1L).isEmpty)
    assert(Warc.fetchRecord(gz, 0, 0).isEmpty)
    assert(Warc.fetchRecord(gz, 3, 40).isEmpty) // mid-member garbage
    assert(Warc.fetchRecord(null, 0, 10).isEmpty)
    val es = Warc.cdxEntries(gz)
    // ordinal past the member's record count: miss, not a throw
    assert(Warc.fetchRecord(gz, es(0).offset, es(0).length, 5).isEmpty)
  }

  test("gzip FEXTRA/FNAME/FCOMMENT headers do not break member spans") {
    // hand-build a member with FNAME + FCOMMENT + FEXTRA set: the
    // header walk must skip the optional fields to find the deflate
    // stream (buildWarcGz never emits them; real archivers do)
    val payload = Warc.buildWarc(Seq(rec(1)))
    val base = Warc.gzipMember(payload)
    val flg = (4 | 8 | 16).toByte // FEXTRA | FNAME | FCOMMENT
    val extra = Array[Byte](3, 0, 'a'.toByte, 'b'.toByte, 'c'.toByte)
    val name = "shard.warc".getBytes(UTF_8) :+ 0.toByte
    val comment = "c".getBytes(UTF_8) :+ 0.toByte
    val decorated = base.take(3) ++ Array(flg) ++ base.slice(4, 10) ++
      extra ++ name ++ comment ++ base.drop(10)
    val gz = decorated ++ Warc.buildWarcGz(Seq(rec(2)))
    val es = Warc.cdxEntries(gz)
    assert(es.map(_.recordId) ==
      Seq("<urn:uuid:rec-1>", "<urn:uuid:rec-2>"))
    assertTiling(es, gz.length.toLong)
    assert(Warc.fetchRecord(gz, es(0).offset, es(0).length)
      .exists(_.recordId == "<urn:uuid:rec-1>"))
  }

  test("cdxIndex: the Spark surface is one narrow pass over mixed " +
      "plain and gzip shards") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val files = (0L until 6L).map { id =>
      val recs = Seq(rec(0), rec(1, s"body-$id"))
      (id, if (id % 2 == 0) Warc.buildWarc(recs) else Warc.buildWarcGz(recs))
    }.toDF("fid", "payload")
    val idx = Warc.cdxIndex(spark, files, col("fid"), col("payload"))
    val rows = idx.collect()
    assert(rows.length == 12)
    assert(idx.columns.toSeq == Seq("file_id", "rec_idx", "offset",
      "length", "member_ord", "warc_type", "record_id", "target_uri",
      "date_s"))
    // no shuffle: the plan is a single mapPartitions chain
    val plan = idx.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("property: for random record sets on both wire forms, the index " +
      "is complete, identity-true, and tiles the file") {
    val rnd = new scala.util.Random(180002L)
    def randomBlock(): Array[Byte] = {
      val n = rnd.nextInt(2000)
      val b = new Array[Byte](n)
      rnd.nextBytes(b) // arbitrary bytes incl CRLF CRLF sequences
      b
    }
    for (trial <- 0 until 120) {
      val n = 1 + rnd.nextInt(6)
      val specs = (0 until n).map { i =>
        WarcSpecRec(
          warcType = Seq("response", "resource", "metadata",
            "revisit")(rnd.nextInt(4)),
          recordId = s"<urn:uuid:p-$trial-$i>",
          targetUri =
            if (rnd.nextBoolean()) Some(s"https://p.example/$i") else None,
          date = "2026-01-02T03:04:05Z",
          contentType = "application/octet-stream",
          block = randomBlock())
      }
      val payload = if (trial % 2 == 0) Warc.buildWarc(specs)
        else Warc.buildWarcGz(specs)
      val es = Warc.cdxEntries(payload)
      assert(es.length == n, s"trial $trial: ${es.length} != $n")
      assertTiling(es, payload.length.toLong)
      es.zip(specs).foreach { case (e, s) =>
        assert(e.recordId == s.recordId)
        val r = Warc.fetchRecord(payload, e.offset, e.length,
          e.memberOrdinal)
        assert(r.exists(x => x.recordId == s.recordId &&
          x.block.sameElements(s.block)), s"trial $trial fetch mismatch")
      }
    }
  }

  test("totality fuzz: byte mutations over valid archives never throw " +
      "and always yield a consistent prefix") {
    val base = Warc.buildWarcGz(Seq(rec(0), rec(1, "x" * 3000), rec(2)))
    val plain = Warc.buildWarc(Seq(rec(0), rec(1), rec(2)))
    val rnd = new scala.util.Random(180001L)
    for (trial <- 0 until 300) {
      val src = if (trial % 2 == 0) base else plain
      val mutated = src.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      val es = Warc.cdxEntries(mutated) // must not throw
      // every surviving entry must still FETCH to a record with the
      // same identity the index row states (the index is never a lie
      // about its own archive, even a corrupted one)
      es.foreach { e =>
        val r = Warc.fetchRecord(mutated, e.offset, e.length,
          e.memberOrdinal)
        assert(r.isDefined && r.get.recordId == e.recordId,
          s"trial $trial: span (${e.offset},${e.length}) disagrees")
      }
      // truncation at any point: still total
      val cut = mutated.take(rnd.nextInt(mutated.length + 1))
      Warc.cdxEntries(cut).foreach { e =>
        assert(Warc.fetchRecord(cut, e.offset, e.length, e.memberOrdinal)
          .exists(_.recordId == e.recordId))
      }
    }
  }

  test("wetExport writeCdx: the shipped index equals a from-scratch " +
      "index of the written files, and the manifest schema is stable") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, element_at, split}
    val dir = java.nio.file.Files.createTempDirectory("graft_wetcdx")
    val docs = (0L until 37L).map(i =>
      (i, s"https://e.example/$i", "2026-01-01T00:00:00Z", s"t $i"))
      .toDF("doc_id", "uri", "date", "text")
    Warc.wetExport(spark, docs, $"doc_id", $"uri", $"date", $"text",
      dir.toString, maxRecordsPerFile = 10, gzip = true, writeCdx = true)
    val shipped = spark.read.parquet(dir.toString + "/_cdx")
      .select("file", "rec_idx", "offset", "length", "member_ord",
        "record_id").collect().map(_.toString).toSet
    val files = spark.read.format("binaryFile")
      .load(dir.toString + "/wet-*.warc.gz")
    val names = files.select(
        element_at(split(col("path"), "/"), -1).as("file"),
        org.apache.spark.sql.functions.xxhash64(col("path")).as("fid"))
    val scratch = Warc.cdxIndex(spark, files,
        org.apache.spark.sql.functions.xxhash64(col("path")),
        col("content"))
      .join(names, col("file_id") === col("fid"))
      .select("file", "rec_idx", "offset", "length", "member_ord",
        "record_id").collect().map(_.toString).toSet
    assert(shipped === scratch && shipped.size == 37)
    // the manifest keeps its pre-writeCdx schema (loader compatibility)
    assert(spark.read.parquet(dir.toString + "/_manifest")
      .columns.toSeq == Seq("file", "n_records", "bytes"))
  }

  test("warc_cdx is on the SQL surface: the index explodes from SQL " +
      "with spans a fetch can consume") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    graft.ops.GraftFunctions.register(spark)
    val gz = Warc.buildWarcGz(Seq(rec(0), rec(1)))
    Seq((7L, gz)).toDF("fid", "payload").createOrReplaceTempView("cdx_t")
    val rows = spark.sql(
      "SELECT fid, e.rec_idx, e.offset, e.length, e.record_id " +
        "FROM cdx_t LATERAL VIEW explode(warc_cdx(payload)) x AS e " +
        "ORDER BY e.rec_idx").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(4)).toSeq ==
      Seq("<urn:uuid:rec-0>", "<urn:uuid:rec-1>"))
    val fetched = Warc.fetchRecord(gz, rows(1).getLong(2),
      rows(1).getLong(3))
    assert(fetched.exists(_.recordId == "<urn:uuid:rec-1>"))
    // null payload → null (no rows through explode), the SQL totality
    assert(spark.sql("SELECT warc_cdx(cast(NULL AS binary))").collect()(0)
      .isNullAt(0))
  }

  test("fetchSpans: bulk point-read broadcasts the request side, " +
      "prunes un-requested files, and classifies stale spans") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val files = (0L until 10L).map { id =>
      (id, Warc.buildWarcGz(Seq(rec(0), rec(1, s"body-$id"))))
    }.toDF("fid", "payload")
    val idx = Warc.cdxIndex(spark, files, col("fid"), col("payload"))
    val want = idx.where(col("file_id") % 3 === 0 &&
        col("warc_type") === "response")
      .select(col("file_id"), col("offset"), col("length"),
        col("member_ord"))
    val got = Warc.fetchSpans(spark, files, col("fid"), col("payload"),
      want)
    val rows = got.orderBy("file_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(rows.forall(_.getBoolean(3)))
    assert(rows.forall(_.getString(5) == "<urn:uuid:rec-1>"))
    rows.foreach { r =>
      assert(new String(r.getAs[Array[Byte]]("block"), UTF_8) ==
        s"body-${r.getLong(0)}")
    }
    // request rows broadcast — the shard payloads never shuffle
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // a stale span (archive rewritten, index not) classifies, never throws
    val stale = Warc.fetchSpans(spark, files, col("fid"), col("payload"),
      Seq((0L, 7L, 50L, 0)).toDF("file_id", "offset", "length",
        "member_ord")).collect()
    assert(stale.length == 1 && !stale(0).getBoolean(3) &&
      stale(0).isNullAt(5))
  }

  test("fetchSpans: a request against an ABSENT file id surfaces as " +
      "found=false rows, never silently drops") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val files = Seq((1L, Warc.buildWarcGz(Seq(rec(0)))))
      .toDF("fid", "payload")
    val idx = Warc.cdxIndex(spark, files, col("fid"), col("payload"))
    // two spans against the present file, two against a deleted shard
    val reqs = idx.select(col("file_id"), col("offset"), col("length"),
        col("member_ord"))
      .unionByName(Seq((99L, 0L, 50L, 0), (99L, 50L, 50L, 1))
        .toDF("file_id", "offset", "length", "member_ord"))
    val got = Warc.fetchSpans(spark, files, col("fid"), col("payload"),
      reqs).collect()
    assert(got.length == 3) // 1 indexed record + 2 missing-file spans
    val missing = got.filter(_.getLong(0) == 99L)
    assert(missing.length == 2)
    assert(missing.forall(r => !r.getBoolean(3) && r.isNullAt(5) &&
      r.isNullAt(8)))
    assert(missing.map(_.getLong(1)).toSet === Set(0L, 50L))
    assert(got.filter(_.getLong(0) == 1L).forall(_.getBoolean(3)))

    // a request with a NULL field (mis-joined index, corrupted CDX
    // row) degrades to found=false too — never an NPE, never dropped
    val withNull = reqs.unionByName(
      Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(0L),
          null.asInstanceOf[java.lang.Long], java.lang.Integer.valueOf(0)),
        (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L),
          java.lang.Long.valueOf(9L), java.lang.Integer.valueOf(0)))
        .toDF("file_id", "offset", "length", "member_ord"))
    val got2 = Warc.fetchSpans(spark, files, col("fid"), col("payload"),
      withNull).collect()
    assert(got2.length == 5)
    assert(got2.count(!_.getBoolean(3)) == 4) // 2 missing-file + 2 null
  }

  test("fetchSpans prunes the archive SCAN to the touched shards") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fetchprune").toString + "/shards"
    (0L until 8L).map(id => (id, Warc.buildWarcGz(Seq(rec(0, s"b-$id")))))
      .toDF("fid", "payload")
      .write.partitionBy("fid").parquet(dir)
    val pf = spark.read.parquet(dir)
    val idx = Warc.cdxIndex(spark, pf, col("fid"), col("payload"))
      .localCheckpoint(true)
    val want = idx.where(col("file_id") === 3L)
      .select(col("file_id"), col("offset"), col("length"),
        col("member_ord"))
    val got = Warc.fetchSpans(spark, pf, col("fid"), col("payload"), want)
    val rows = got.collect()
    assert(rows.count(_.getBoolean(3)) == 1)
    assert(new String(rows.filter(_.getBoolean(3))(0)
      .getAs[Array[Byte]]("block"), UTF_8) == "b-3")
    // the touched-file isin predicate reaches the scan as a partition
    // filter: only shard 3's file is listed and read
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(!plan.contains("PartitionFilters: []"), plan)
    // over-cap request sets plan a broadcast SEMI-JOIN filter — never
    // a giant literal predicate, never the bare full scan (the code
    // path is cap-relative: cap 0 here exercises exactly what a
    // 50k-file request hits at the production cap)
    val semi = Warc.fetchSpans(spark, pf, col("fid"), col("payload"),
      want, maxPruneFiles = 0)
    val semiPlan = semi.queryExecution.executedPlan.toString
    assert(semiPlan.contains("LeftSemi"),
      s"over-cap prune must be a semi-join:\n${semiPlan.take(2000)}")
    assert(!semiPlan.contains("file_id#") ||
      !semiPlan.contains(" IN ("),
      s"over-cap prune must not be a literal IN filter:\n${semiPlan.take(2000)}")
    val full = semi.collect()
    assert(full.count(_.getBoolean(3)) == 1)
  }

  test("cdxEntries rejects a CRC-corrupt member: the index's totality " +
      "boundary matches the CRC-checked stream reader's") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val clean = Warc.buildWarcGz(Seq(rec(0, "alpha"), rec(1, "beta"),
      rec(2, "gamma")))
    val entries = Warc.cdxEntries(clean)
    assert(entries.length == 3)
    // corrupt member 1's CRC32 trailer byte: deflate still inflates,
    // only the trailer check can catch it
    val m1 = entries(1)
    val corrupt = clean.clone()
    val crcAt = (m1.offset + m1.length - 8).toInt
    corrupt(crcAt) = (corrupt(crcAt) ^ 0x5A).toByte
    val idxed = Warc.cdxEntries(corrupt)
    // the walk ends AT the corrupt member — indexed prefix only. This
    // is the index ⊆ point-fetchable invariant: fetchRecord is
    // CRC-verified (GZIPInputStream) and declines the corrupt span, so
    // an index that claimed it would promise records no reader can
    // retrieve, with rec_idx numbering diverging after the corruption.
    assert(idxed.length == 1 && idxed(0).recIdx == 0)
    assert(Warc.fetchRecord(corrupt, m1.offset, m1.length).isEmpty)
    // every record the index claims IS fetchable
    idxed.foreach { e =>
      assert(Warc.fetchRecord(corrupt, e.offset, e.length).nonEmpty)
    }
    // (recordTable's STREAM totality may additionally yield the corrupt
    // member's already-inflated record before its trailer is reached —
    // a superset of the index, never a numbering divergence within it)
    val streamed = Warc.recordTable(spark,
      Seq((1L, corrupt)).toDF("fid", "payload"),
      col("fid"), col("payload")).collect()
    assert(streamed.length >= idxed.length)
    assert(streamed.take(idxed.length).map(_.getInt(1)).toSeq ===
      idxed.map(_.recIdx))
  }
}
