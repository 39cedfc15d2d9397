package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{SigSeen, UrlSeen}
import graft.ingest.{CdxLog, Warc}

/** The OPERATIONAL crawl loop, end to end: each micro-batch of landed
  * shards advances ALL THREE standing states in one foreachBatch —
  * the archive index (CdxLog.append), the URL-seen fold, and the
  * media-signature fold — stamped with the SAME streaming batchId, so
  * an at-least-once replay of the whole micro-batch is a no-op on all
  * three. This is the transaction shape a rolling crawler actually
  * runs: land bytes, index them, remember what was fetched, remember
  * what it looked like. A crash BETWEEN folds leaves the loop
  * half-advanced; the shared DeltaLog replay guard makes the whole-
  * batch retry heal it — committed folds no-op, the missing fold
  * commits. */
class StreamingCrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("one micro-batch advances archive index, url state AND media " +
      "signatures together; replay is a no-op on all three; the " +
      "states agree with each other") {
    val dir = Files.createTempDirectory("graft_crawl_stream")
    val in = dir.resolve("shards"); Files.createDirectory(in)
    val cdx = dir.resolve("cdx").toString
    val seen = dir.resolve("seen").toString
    val sigs = dir.resolve("sigs").toString
    val glob = in.toString + "/*/wet-*.warc.gz"

    def drop(name: String, ids: Range): Unit = {
      val docs = ids.map(i => (i.toLong, s"https://c.example/p/$i",
        "2026-04-01T00:00:00Z", s"page $i"))
        .toDF("doc_id", "uri", "date", "text")
      Warc.wetExport(spark, docs, $"doc_id", $"uri", $"date", $"text",
        in.resolve(name).toString, maxRecordsPerFile = 20, gzip = true)
    }
    def runStream(): Unit = {
      val q = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, " +
          "length LONG, content BINARY")
        .load(glob)
        .writeStream
        .foreachBatch { (mb: org.apache.spark.sql.DataFrame, id: Long) =>
          val held = mb.localCheckpoint(true) // ONE read feeds all folds
          CdxLog.append(spark, held, xxhash64(col("path")),
            col("content"), cdx, id)
          val recs = Warc.recordTable(spark, held,
              xxhash64(col("path")), col("content"))
            .localCheckpoint(true) // consumed by the url AND sig folds
          UrlSeen.foldBatch(
            recs.select(xxhash64(col("record_id")).as("rid"),
              col("target_uri")),
            col("rid"), col("target_uri"), seen, id).count()
          SigSeen.foldBatch(
            recs.select(xxhash64(col("record_id")).as("rid"),
              xxhash64(col("body")).as("sig")),
            col("rid"), col("sig"), sigs, id).count()
          // self-maintenance rides the same loop: a tiny threshold
          // forces real cutovers between folds, proving the lifecycle
          // composes with streaming (watermark survives, replays stay
          // guarded, reads stay bounded-file)
          CdxLog.compactIfFragmented(spark, cdx, maxFiles = 1)
          UrlSeen.compactIfFragmented(spark, seen, maxFiles = 1)
          SigSeen.compactIfFragmented(spark, sigs, maxFiles = 1)
          ()
        }
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }

    drop("drop1", 0 until 40)
    runStream()
    drop("drop2", 100 until 125) // 25 new pages
    runStream()

    val idxCount = CdxLog.read(spark, cdx).count()
    val urlCount = UrlSeen.read(spark, seen).count()
    val sigCount = SigSeen.read(spark, sigs).count()
    assert(idxCount === 65 && urlCount === 65 && sigCount === 65)
    assert(CdxLog.watermark(spark, cdx) === Some(1L))
    assert(UrlSeen.watermark(spark, seen) === Some(1L))
    assert(SigSeen.watermark(spark, sigs) === Some(1L))

    // replay the whole loop: a fresh query over the same checkpoint
    // re-processes nothing, and all three states stay byte-identical
    val idxBefore = CdxLog.read(spark, cdx).collect()
      .map(_.toString).sorted
    val urlBefore = UrlSeen.read(spark, seen).collect()
      .map(_.toString).sorted
    val sigBefore = SigSeen.read(spark, sigs).collect()
      .map(_.toString).sorted
    runStream()
    assert(CdxLog.read(spark, cdx).collect().map(_.toString).sorted
      .sameElements(idxBefore))
    assert(UrlSeen.read(spark, seen).collect().map(_.toString).sorted
      .sameElements(urlBefore))
    assert(SigSeen.read(spark, sigs).collect().map(_.toString).sorted
      .sameElements(sigBefore))

    // cross-state agreement: every URL the archive holds is a URL the
    // crawler remembers, stamped to the same batch generation — and
    // the signature state advanced under the same stamps
    val archived = CdxLog.read(spark, cdx)
      .select(graft.ops.HtmlExprs.urlNormalize(col("target_uri"))
        .as("u"), col("batch_id"))
    val remembered = UrlSeen.read(spark, seen)
      .select(col("url_canon").as("u"),
        col("first_seen_batch").as("b"))
    val disagree = archived.join(remembered, Seq("u"), "left")
      .where(col("b").isNull || col("b") =!= col("batch_id"))
    assert(disagree.count() === 0)
    assert(SigSeen.read(spark, sigs)
      .select(col("first_seen_batch")).distinct().collect()
      .map(_.getLong(0)).toSet === Set(0L, 1L))

    // the in-loop maintenance actually cut generations over, and every
    // state reads from a compacted (bounded-file) current generation
    for (p <- Seq(cdx, seen, sigs)) {
      val l = graft.core.DeltaLog.listing(spark, p)
      assert(l.generation >= 1L, s"no cutover ran at $p")
      assert(l.deltas.map(_.parquetFiles).sum <= 1 + 32,
        s"unbounded files at $p: $l")
    }
  }

  test("cutover + prune BETWEEN micro-batches: the next trigger folds " +
      "into generation N+1, replay still no-ops after a kill in the " +
      "maintenance window") {
    val dir = Files.createTempDirectory("graft_crawl_cutover")
    val in = dir.resolve("shards"); Files.createDirectory(in)
    val cdx = dir.resolve("cdx").toString
    val seen = dir.resolve("seen").toString
    val sigs = dir.resolve("sigs").toString
    val glob = in.toString + "/*/wet-*.warc.gz"
    def drop(name: String, ids: Range): Unit = {
      val docs = ids.map(i => (i.toLong, s"https://g.example/p/$i",
        "2026-06-01T00:00:00Z", s"page $i"))
        .toDF("doc_id", "uri", "date", "text")
      Warc.wetExport(spark, docs, $"doc_id", $"uri", $"date", $"text",
        in.resolve(name).toString, maxRecordsPerFile = 20, gzip = true)
    }
    // the plain loop — NO in-loop maintenance, so the explicit
    // orchestrator-window cutover below is the ONLY generation mover
    def runStream(): Unit = {
      val q = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, " +
          "length LONG, content BINARY")
        .load(glob)
        .writeStream
        .foreachBatch { (mb: org.apache.spark.sql.DataFrame, id: Long) =>
          val held = mb.localCheckpoint(true)
          CdxLog.append(spark, held, xxhash64(col("path")),
            col("content"), cdx, id)
          val recs = Warc.recordTable(spark, held,
              xxhash64(col("path")), col("content"))
            .localCheckpoint(true)
          UrlSeen.foldBatch(
            recs.select(xxhash64(col("record_id")).as("rid"),
              col("target_uri")),
            col("rid"), col("target_uri"), seen, id).count()
          SigSeen.foldBatch(
            recs.select(xxhash64(col("record_id")).as("rid"),
              xxhash64(col("body")).as("sig")),
            col("rid"), col("sig"), sigs, id).count()
          ()
        }
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }

    drop("drop1", 0 until 30)
    runStream()
    val states = Seq(cdx, seen, sigs)
    val genBefore = states.map(p =>
      graft.core.DeltaLog.listing(spark, p).generation)

    // ── the orchestrator's maintenance window, between triggers ──
    CdxLog.compactInPlace(spark, cdx)
    UrlSeen.compactInPlace(spark, seen)
    SigSeen.compactInPlace(spark, sigs)
    states.foreach(p => graft.core.DeltaLog.pruneGenerations(spark, p))
    // the health surface reports the generation bump
    val genAfter = states.map(p =>
      graft.core.DeltaLog.listing(spark, p).generation)
    assert(genAfter === genBefore.map(_ + 1),
      s"cutover must bump every state's generation: $genBefore → $genAfter")
    // watermarks survive the cutover — the next trigger's replay guard
    // reads them from the NEW generation
    assert(CdxLog.watermark(spark, cdx) === Some(0L))
    assert(UrlSeen.watermark(spark, seen) === Some(0L))
    assert(SigSeen.watermark(spark, sigs) === Some(0L))

    // ── KILL between the cutover and the next trigger ──
    // in-process a kill means: nothing in memory survives; the next
    // trigger is a FRESH streaming query resolving every state and the
    // stream checkpoint from disk alone — which is exactly what
    // runStream() constructs. Nothing below references any pre-kill
    // in-memory handle.
    drop("drop2", 100 until 115)
    runStream()
    assert(CdxLog.read(spark, cdx).count() === 45)
    assert(UrlSeen.read(spark, seen).count() === 45)
    assert(SigSeen.read(spark, sigs).count() === 45)
    assert(UrlSeen.watermark(spark, seen) === Some(1L))
    // the fold landed as a delta of the POST-cutover generation, not a
    // resurrected root or orphan dir
    val postFold = states.map(p =>
      graft.core.DeltaLog.listing(spark, p).generation)
    assert(postFold === genAfter,
      s"fold must append inside generation N+1: $genAfter → $postFold")

    // replay the whole loop over the same checkpoint: no-op on all
    // three states, still inside the new generation
    val before = states.map(p => p match {
      case `cdx` => CdxLog.read(spark, p).collect().map(_.toString).sorted
      case `seen` => UrlSeen.read(spark, p).collect().map(_.toString).sorted
      case _ => SigSeen.read(spark, p).collect().map(_.toString).sorted
    })
    runStream()
    assert(CdxLog.read(spark, cdx).collect().map(_.toString).sorted
      .sameElements(before(0)))
    assert(UrlSeen.read(spark, seen).collect().map(_.toString).sorted
      .sameElements(before(1)))
    assert(SigSeen.read(spark, sigs).collect().map(_.toString).sorted
      .sameElements(before(2)))
  }

  test("crash BETWEEN folds: the whole-batch retry no-ops the " +
      "committed states and commits the missing one") {
    val dir = Files.createTempDirectory("graft_crawl_crash")
    val cdx = dir.resolve("cdx").toString
    val seen = dir.resolve("seen").toString
    val sigs = dir.resolve("sigs").toString
    val shard = Warc.buildWarcGz((0 until 10).map { i =>
      Warc.WarcSpecRec("resource", s"<urn:uuid:c-$i>",
        Some(s"https://x.example/$i"), "2026-05-01T00:00:00Z",
        "text/plain", s"media-$i".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
    })
    // one shard per batch (the append contract: one batch per file set)
    val all = Seq((1L, shard), (2L, shard)).toDF("fid", "payload")
      .localCheckpoint(true)
    def foldAll(id: Long, through: Int): Unit = {
      val files = all.where(col("fid") === id + 1)
      val recs = Warc.recordTable(spark, files, col("fid"), col("payload"))
      if (through >= 1)
        CdxLog.append(spark, files, col("fid"), col("payload"), cdx, id)
      if (through >= 2)
        UrlSeen.foldBatch(
          recs.select(xxhash64(col("record_id")).as("rid"),
            col("target_uri")),
          col("rid"), col("target_uri"), seen, id).count()
      if (through >= 3)
        SigSeen.foldBatch(
          recs.select(xxhash64(col("record_id")).as("rid"),
            xxhash64(col("body")).as("sig")),
          col("rid"), col("sig"), sigs, id).count()
    }

    // the loop dies after the second fold: archive + url committed,
    // signatures never folded
    foldAll(0L, through = 2)
    assert(CdxLog.watermark(spark, cdx) === Some(0L))
    assert(UrlSeen.watermark(spark, seen) === Some(0L))
    assert(SigSeen.watermark(spark, sigs) === None)
    val idxBefore = CdxLog.read(spark, cdx).collect().map(_.toString).sorted
    val urlBefore = UrlSeen.read(spark, seen).collect().map(_.toString).sorted

    // the orchestrator retries the WHOLE micro-batch at the same stamp
    foldAll(0L, through = 3)
    assert(CdxLog.read(spark, cdx).collect().map(_.toString).sorted
      .sameElements(idxBefore))
    assert(UrlSeen.read(spark, seen).collect().map(_.toString).sorted
      .sameElements(urlBefore))
    assert(SigSeen.watermark(spark, sigs) === Some(0L))
    assert(SigSeen.read(spark, sigs).count() === 10)

    // and the next batch advances all three normally
    foldAll(1L, through = 3)
    assert(CdxLog.watermark(spark, cdx) === Some(1L))
    assert(UrlSeen.watermark(spark, seen) === Some(1L))
    assert(SigSeen.watermark(spark, sigs) === Some(1L))
  }
}
