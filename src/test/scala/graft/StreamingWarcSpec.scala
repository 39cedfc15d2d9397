package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Warc
import graft.streaming.StreamingIngest

/** Streaming WARC ingest: crawl shards landing in a directory stream
  * through the SAME record walk as the batch recordTable — the test
  * pins stream ≡ batch over identical files (gzip members included)
  * and checkpointed incremental pickup of late-arriving shards. */
class StreamingWarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed records equal the batch recordTable over the same shards") {
    val dir = Files.createTempDirectory("graft_warc_stream")
    val in = dir.resolve("shards"); Files.createDirectory(in)
    val out = dir.resolve("records").toString
    val glob = in.toString + "/*/wet-*.warc.gz"

    def drop(name: String, ids: Range, stamp: String): Unit = {
      val docs = ids.map(i => (i.toLong, s"https://s.example/$i", stamp,
        s"text $i")).toDF("doc_id", "uri", "date", "text")
      Warc.wetExport(spark, docs, $"doc_id", $"uri", $"date", $"text",
        in.resolve(name).toString, maxRecordsPerFile = 25, gzip = true)
    }
    def runStream(): Unit = {
      val q = StreamingIngest.warcRecordStream(spark, glob)
        .select(col("file_id"), col("rec_idx"), col("warc_type"),
          col("record_id"), col("target_uri"), col("content_length"),
          md5(col("body")).as("body_md5"))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    drop("drop1", 0 until 60, "2026-03-01T00:00:00Z")
    runStream()
    assert(spark.read.parquet(out).count() === 60)

    // late shards: the resumed stream (same checkpoint) picks up ONLY
    // the new files — no reprocessing, no loss
    drop("drop2", 100 until 130, "2026-03-02T00:00:00Z")
    runStream()
    val streamed = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(streamed.size === 90)

    // batch twin: the SAME files through the SAME walk
    val batch = Warc.recordTable(spark,
        spark.read.format("binaryFile").load(glob),
        xxhash64(col("path")), col("content"))
      .select(col("file_id"), col("rec_idx"), col("warc_type"),
        col("record_id"), col("target_uri"), col("content_length"),
        md5(col("body")).as("body_md5"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(spark.read.parquet(out)
      .where(col("warc_type") =!= "conversion").isEmpty)
    ()
  }
}
