package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Warc
import graft.ingest.Warc.WarcSpecRec

/** WARC (ISO 28500) codec: build→parse round-trips for plain and
  * per-record-gzip-member forms, spec details (header folding,
  * case-insensitive names, CRLF CRLF separators), longest-valid-prefix
  * totality on truncation/corruption, and the HTTP response split. */
class WarcSpec extends AnyFunSuite {

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

  test("plain round-trip: every header and block byte survives") {
    val specs = Seq(rec(0), rec(1, "HTTP/1.1 200 OK\r\n\r\n<html>x</html>"),
      rec(2, ""))
    val parsed = Warc.parseWarc(Warc.buildWarc(specs))
    assert(parsed.length == 3)
    parsed.zip(specs).zipWithIndex.foreach { case ((p, s), i) =>
      assert(p.recIdx == i)
      assert(p.warcType == s.warcType)
      assert(p.recordId == s.recordId)
      assert(p.targetUri == s.targetUri)
      assert(p.date == s.date)
      assert(p.contentType == s.contentType)
      assert(p.block.sameElements(s.block))
    }
  }

  test("gzip round-trip: one member per record parses identically") {
    val specs = Seq(rec(0), rec(1), rec(2, "x" * 100000))
    val gz = Warc.buildWarcGz(specs)
    assert((gz(0) & 0xFF) == 0x1F && (gz(1) & 0xFF) == 0x8B)
    val parsed = Warc.parseWarc(gz)
    assert(parsed.map(_.recordId) == specs.map(_.recordId))
    assert(parsed(2).block.length == 100000)
    // and each member alone is a valid one-record file (the Common
    // Crawl splittability property the per-member form exists for)
    assert(Warc.parseWarc(Warc.buildWarcGz(Seq(rec(1)))).length == 1)
  }

  test("streaming parse never materializes the decompressed shard") {
    // 200 members × ~16-32 KiB blocks = ~5.5 MB decompressed; the
    // member-streaming iterator must hold only the record currently
    // assembling (+ a read chunk), so its peak live buffer sits far
    // below the decompressed size the old whole-shard gunzip held
    val blocks = (0 until 200).map(i => rec(i.max(1), ("b" + i) * 8000))
    val gz = Warc.buildWarcGz(blocks)
    val it = new Warc.WarcStreamIterator(
      new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz)))
    var n = 0
    var decompressed = 0L
    while (it.hasNext) { decompressed += it.next().block.length; n += 1 }
    assert(n == 200)
    assert(decompressed > 5000000L)
    assert(it.peakBufferBytes > 0L)
    // one ~32 KiB record + 64 KiB chunking + growth slack ≪ 6.4 MB
    assert(it.peakBufferBytes < 512 * 1024L,
      s"peak=${it.peakBufferBytes} — streaming parse is buffering the shard")
    // mid-stream corruption: valid members before the damage survive
    // (the old whole-shard gunzip returned Nil here)
    val twoThenJunk = Warc.buildWarcGz(Seq(rec(1), rec(2))) ++
      Array[Byte](0x1F.toByte, 0x8B.toByte, 8, 0, 0, 0, 0, 0, 0, 0, 99, 99)
    assert(Warc.parseWarc(twoThenJunk).map(_.recordId) ==
      Seq(rec(1).recordId, rec(2).recordId))
  }

  test("assembly cap: a malformed record before a large tail ends the " +
      "iteration at the cap instead of buffering the remaining stream") {
    // one valid member, then a member whose record LIES about its
    // Content-Length (far past the stream end): parseOne can never
    // succeed, so pre-cap the iterator would buffer the entire
    // remaining decompressed stream hunting for the block. With the
    // cap, iteration ends on the valid prefix, no throw, and the peak
    // buffer honors the bound (totality on exactly the corrupt shards
    // quarantine exists for).
    val liar = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\nWARC-Record-ID: <urn:uuid:liar>\r\n" +
      "Content-Length: 999999999\r\n\r\n").getBytes(UTF_8)
    val bigTail = Warc.buildWarcGz(
      (0 until 64).map(i => rec(i.max(1), "t" * 32768))) // ~2 MB valid tail
    val gz = Warc.buildWarcGz(Seq(rec(1))) ++ Warc.gzipMember(liar) ++ bigTail
    val cap = 256 * 1024 // test-seam cap ≪ the 2 MB tail
    val it = new Warc.WarcStreamIterator(
      new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz)), maxAssemblyBytes = cap)
    val got = it.toVector // must not throw (no NegativeArraySizeException)
    assert(got.map(_.recordId) == Seq(rec(1).recordId))
    assert(it.peakBufferBytes <= cap.toLong,
      s"peak=${it.peakBufferBytes} — cap not honored")
  }

  test("quarantine: zero-record payloads classify, valid shards do not") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val good = Warc.buildWarc(Seq(rec(1)))
    val goodGz = Warc.buildWarcGz(Seq(rec(2)))
    val rows = Seq(
      (1L, good),
      (2L, goodGz),
      (3L, "not a warc at all".getBytes(UTF_8)),
      (4L, Array.empty[Byte]),
      (5L, "XX".getBytes(UTF_8) ++ good), // mangled version line
      (6L, null.asInstanceOf[Array[Byte]]))
      .toDF("fid", "payload")
    val q = Warc.quarantine(spark, rows, col("fid"), col("payload"))
      .collect().map(_.getLong(0)).toSet
    assert(q === Set(3L, 4L, 5L, 6L))
  }

  test("recordTable surfaces the Location header of 3xx responses") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val http301 = ("HTTP/1.1 301 Moved Permanently\r\n" +
      "LOCATION: /moved/here\r\nContent-Type: text/html\r\n\r\ngone")
      .getBytes(UTF_8)
    val http200 = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nok"
      .getBytes(UTF_8)
    val shard = Warc.buildWarc(Seq(
      WarcSpecRec("response", "<urn:uuid:l-1>",
        Some("https://e.example/old"), "2024-01-01T00:00:00Z",
        "application/http; msgtype=response", http301),
      WarcSpecRec("response", "<urn:uuid:l-2>",
        Some("https://e.example/new"), "2024-01-01T00:00:00Z",
        "application/http; msgtype=response", http200)))
    val rows = Warc.recordTable(spark, Seq((1L, shard)).toDF("f", "p"),
        col("f"), col("p"))
      .select(col("target_uri"), col("http_status"), col("location"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2)).orNull))
      .toSet
    // case-insensitive header name; non-3xx rows carry null
    assert(rows === Set(
      ("https://e.example/old", 301, "/moved/here"),
      ("https://e.example/new", 200, null)))
  }

  test("revisit headers round-trip: Refers-To, Payload-Digest, Profile") {
    val rev = WarcSpecRec(
      warcType = "revisit",
      recordId = "<urn:uuid:rev-9>",
      targetUri = Some("https://example.org/p/9"),
      date = "2026-01-02T03:04:05Z",
      contentType = "message/http",
      block = Array.empty[Byte],
      refersTo = Some("<urn:uuid:orig-9>"),
      payloadDigest = Some("sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"),
      profile = Some(
        "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"))
    for (build <- Seq[Seq[WarcSpecRec] => Array[Byte]](
        Warc.buildWarc, Warc.buildWarcGz)) {
      val p = Warc.parseWarc(build(Seq(rec(1), rev)))
      assert(p.length == 2)
      // non-revisit records carry no dedup headers
      assert(p(0).refersTo.isEmpty && p(0).payloadDigest.isEmpty)
      assert(p(1).warcType == "revisit")
      assert(p(1).refersTo == rev.refersTo)
      assert(p(1).payloadDigest == rev.payloadDigest)
      assert(p(1).profile == rev.profile)
      assert(p(1).block.isEmpty)
    }
  }

  test("unicode blocks survive byte-exact") {
    val s = rec(1, "héllo wörld é世界 😀")
    val p = Warc.parseWarc(Warc.buildWarc(Seq(s)))
    assert(p.head.block.sameElements(s.block))
  }

  test("header folding and case-insensitive names parse per spec") {
    val body = "abc"
    val raw = ("WARC/1.0\r\n" +
      "warc-type: response\r\n" +
      "WARC-RECORD-ID: <urn:uuid:x>\r\n" +
      "WARC-Target-URI: https://example.org/very/long\r\n" +
      " /folded/path\r\n" + // continuation line folds with one space
      "warc-date: 2026-01-01T00:00:00Z\r\n" +
      "content-length: 3\r\n" +
      "Content-Type: text/plain\r\n" +
      "\r\n" + body + "\r\n\r\n").getBytes(UTF_8)
    val p = Warc.parseWarc(raw)
    assert(p.length == 1)
    assert(p.head.warcType == "response")
    assert(p.head.targetUri.contains("https://example.org/very/long /folded/path"))
    assert(new String(p.head.block, UTF_8) == body)
  }

  test("truncation yields the longest valid record prefix, never throws") {
    val full = Warc.buildWarc(Seq(rec(0), rec(1), rec(2)))
    val oneAndTwo = Warc.buildWarc(Seq(rec(0), rec(1))).length
    for (cut <- 0 to full.length) {
      val got = Warc.parseWarc(full.take(cut))
      val want =
        if (cut >= full.length) 3
        else if (cut >= oneAndTwo) 2
        else if (cut >= Warc.buildWarc(Seq(rec(0))).length) 1
        else 0
      assert(got.length == want, s"cut=$cut")
    }
  }

  test("totality fuzz: garbage, corrupt gzip, hostile Content-Length") {
    val rnd = new scala.util.Random(0xBEEF)
    for (i <- 0 until 3000) {
      val p = new Array[Byte](if (i < 100) i else rnd.nextInt(500))
      rnd.nextBytes(p)
      Warc.parseWarc(p) // must not throw
    }
    // valid gzip magic, corrupt deflate stream → Nil, not a throw
    assert(Warc.parseWarc(Array[Byte](0x1F.toByte, 0x8B.toByte, 8, 0,
      0, 0, 0, 0, 0, 0, 99, 99, 99)) == Nil)
    // Content-Length far past the payload (incl. the Int-wrap zone)
    for (len <- Seq("4", s"${Int.MaxValue}", s"${Long.MaxValue}", "-1", "x")) {
      val raw = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"Content-Length: $len\r\n\r\nab\r\n\r\n").getBytes(UTF_8)
      val got = Warc.parseWarc(raw)
      assert(got.isEmpty || new String(got.head.block, UTF_8) == "ab")
    }
    // single-byte corruptions of a valid file: parse is total and any
    // record it does return carries an internally consistent length
    val base = Warc.buildWarc(Seq(rec(0), rec(1)))
    for (_ <- 0 until 2000) {
      val p = base.clone()
      p(rnd.nextInt(p.length)) = rnd.nextInt().toByte
      Warc.parseWarc(p).foreach(r => assert(r.block != null))
    }
  }

  test("duplicate header names: the FIRST occurrence wins") {
    // a smuggled second Content-Length must not reframe the record
    // past the one the walk validated with
    val raw = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 2\r\nContent-Length: 9999\r\n" +
      "WARC-Target-URI: https://first.example/\r\n" +
      "WARC-Target-URI: https://second.example/\r\n" +
      "\r\nab\r\n\r\n").getBytes(UTF_8)
    val p = Warc.parseWarc(raw)
    assert(p.length == 1)
    assert(new String(p.head.block, UTF_8) == "ab")
    assert(p.head.targetUri.contains("https://first.example/"))
  }

  test("httpParts splits status, headers, body; declines non-HTTP") {
    val block = ("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: https://example.org/\r\nContent-Type: text/html\r\n" +
      "\r\n<html>b</html>").getBytes(UTF_8)
    val Some((status, headers, body)) = Warc.httpParts(block)
    assert(status == 301)
    assert(headers.contains("Location: https://example.org/"))
    assert(new String(body, UTF_8) == "<html>b</html>")
    assert(Warc.httpParts("no http here".getBytes(UTF_8)).isEmpty)
    assert(Warc.httpParts("HTTP/1.1 200 OK\r\nno body sep".getBytes(UTF_8)).isEmpty)
    assert(Warc.httpParts(Array.empty[Byte]).isEmpty)
    // empty body after the separator is a valid split
    val Some((s2, _, b2)) =
      Warc.httpParts("HTTP/1.1 204 No Content\r\n\r\n".getBytes(UTF_8))
    assert(s2 == 204 && b2.isEmpty)
  }

  test("recordTable explodes files to typed rows, mixing plain and gz") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val html = "<html><body><p>doc body</p></body></html>"
    val resp = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    def file(id: Long): Array[Byte] = {
      val specs = Seq(rec(0), rec(1, resp))
      if (id % 2 == 0) Warc.buildWarc(specs) else Warc.buildWarcGz(specs)
    }
    val files = Seq((1L, file(1)), (2L, file(2)), (3L, "junk".getBytes(UTF_8)))
      .toDF("fid", "payload")
    val rows = Warc.recordTable(spark, files, $"fid", $"payload")
      .orderBy($"file_id", $"rec_idx").collect()
    assert(rows.length == 4) // 2 each for files 1-2; junk contributes 0
    val r1 = rows.filter(_.getLong(0) == 1L)
    assert(r1.map(_.getString(2)).toSeq == Seq("warcinfo", "response"))
    val respRow = r1(1)
    assert(respRow.getInt(respRow.fieldIndex("http_status")) == 200)
    assert(new String(respRow.getAs[Array[Byte]]("body"), UTF_8) == html)
    // non-response records carry the raw block as body, null status
    assert(r1(0).isNullAt(r1(0).fieldIndex("http_status")))
  }

  test("wetExport writes splittable shards that round-trip, with a manifest") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, input_file_name}
    val docs = (0L until 250L).map(i =>
      (i, s"https://x.example/$i", "2026-02-03T04:05:06Z",
        s"text of doc $i " + ("y" * (i % 40).toInt)))
      .toDF("doc_id", "uri", "date", "text").repartition(3)
    for (gzip <- Seq(true, false)) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_wet").toString + "/out"
      Warc.wetExport(spark, docs, $"doc_id", $"uri", $"date", $"text",
        dir, maxRecordsPerFile = 40, gzip = gzip)
      val files = spark.read.format("binaryFile")
        .load(dir + (if (gzip) "/*.warc.gz" else "/*.warc"))
        .select(input_file_name().as("f"), col("content"))
        .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      // per-file cap holds and every file parses independently
      val parsedPerFile = files.map { case (f, bytes) =>
        val recs = Warc.parseWarc(bytes)
        assert(recs.nonEmpty && recs.length <= 40, f)
        recs.foreach { r =>
          assert(r.warcType == "conversion")
          assert(r.contentType == "text/plain")
          assert(r.date == "2026-02-03T04:05:06Z")
        }
        recs
      }
      // full round trip: every doc's text and uri back byte-exact
      val back = parsedPerFile.flatten.map { r =>
        val i = r.recordId.stripPrefix("<urn:uuid:conv-").stripSuffix(">").toLong
        (i, r.targetUri.get, new String(r.block, UTF_8))
      }.toSet
      val want = docs.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
      assert(back === want)
      // manifest agrees with what is on disk
      val man = spark.read.parquet(dir + "/_manifest").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(man.map(_._2).sum == 250L)
      val byName = files.map { case (f, b) =>
        f.substring(f.lastIndexOf('/') + 1) -> b.length.toLong }.toMap
      man.foreach { case (name, _, bytes) =>
        assert(byName(name) == bytes, name) }
      // and a second export over the same dir replaces, never mixes
      Warc.wetExport(spark, docs.limit(10), $"doc_id", $"uri", $"date",
        $"text", dir, maxRecordsPerFile = 40, gzip = gzip)
      val n2 = spark.read.parquet(dir + "/_manifest")
        .agg(org.apache.spark.sql.functions.sum("n_records")).head().getLong(0)
      assert(n2 == 10L)
    }
  }
}
