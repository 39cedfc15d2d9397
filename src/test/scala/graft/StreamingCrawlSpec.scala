package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.UrlSeen
import graft.ingest.{CdxLog, Warc}

/** The OPERATIONAL crawl loop, end to end: each micro-batch of landed
  * shards advances BOTH standing states in one foreachBatch — the
  * archive index (CdxLog.append) and the URL-seen fold — stamped with
  * the SAME streaming batchId, so an at-least-once replay of the
  * whole micro-batch is a no-op on both. This is the transaction
  * shape a rolling crawler actually runs: land bytes, index them,
  * remember what was fetched. */
class StreamingCrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("one micro-batch advances archive index AND url state together; " +
      "replay is a no-op on both; the states agree with each other") {
    val dir = Files.createTempDirectory("graft_crawl_stream")
    val in = dir.resolve("shards"); Files.createDirectory(in)
    val cdx = dir.resolve("cdx").toString
    val seen = dir.resolve("seen").toString
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
          val held = mb.localCheckpoint(true) // ONE read feeds both folds
          CdxLog.append(spark, held, xxhash64(col("path")),
            col("content"), cdx, id)
          val recs = Warc.recordTable(spark, held,
            xxhash64(col("path")), col("content"))
          UrlSeen.foldBatch(
            recs.select(xxhash64(col("record_id")).as("rid"),
              col("target_uri")),
            col("rid"), col("target_uri"), seen, id).count()
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
    assert(idxCount === 65 && urlCount === 65)
    assert(CdxLog.watermark(spark, cdx) === Some(1L))
    assert(UrlSeen.watermark(spark, seen) === Some(1L))

    // replay the whole loop: a fresh query over the same checkpoint
    // re-processes nothing, and both states stay byte-identical
    val idxBefore = CdxLog.read(spark, cdx).collect()
      .map(_.toString).sorted
    val urlBefore = UrlSeen.read(spark, seen).collect()
      .map(_.toString).sorted
    runStream()
    assert(CdxLog.read(spark, cdx).collect().map(_.toString).sorted
      .sameElements(idxBefore))
    assert(UrlSeen.read(spark, seen).collect().map(_.toString).sorted
      .sameElements(urlBefore))

    // cross-state agreement: every URL the archive holds is a URL the
    // crawler remembers, stamped to the same batch generation
    val archived = CdxLog.read(spark, cdx)
      .select(graft.ops.HtmlExprs.urlNormalize(col("target_uri"))
        .as("u"), col("batch_id"))
    val remembered = UrlSeen.read(spark, seen)
      .select(col("url_canon").as("u"),
        col("first_seen_batch").as("b"))
    val disagree = archived.join(remembered, Seq("u"), "left")
      .where(col("b").isNull || col("b") =!= col("batch_id"))
    assert(disagree.count() === 0)
  }
}
