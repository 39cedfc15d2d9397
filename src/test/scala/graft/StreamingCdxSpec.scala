package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{CdxLog, Warc}

/** Shards landing in a directory INDEX THEMSELVES: a binary-file
  * stream appends each micro-batch's CDX rows to the standing archive
  * log with the streaming batchId as the fold stamp — the
  * [[StreamingUrlSeenSpec]] contract for the archive index. Restart
  * replays must leave the standing index byte-identical, and a
  * point-read through the grown log must reach records from every
  * generation. */
class StreamingCdxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("landed shards append to the standing archive index; restart " +
      "replays are no-ops; point-reads span generations") {
    val dir = Files.createTempDirectory("graft_cdx_stream")
    val in = dir.resolve("shards"); Files.createDirectory(in)
    val state = dir.resolve("cdx").toString
    val glob = in.toString + "/*/wet-*.warc.gz"

    def drop(name: String, ids: Range): Unit = {
      val docs = ids.map(i => (i.toLong, s"https://s.example/$i",
        "2026-03-01T00:00:00Z", s"text $i"))
        .toDF("doc_id", "uri", "date", "text")
      Warc.wetExport(spark, docs, $"doc_id", $"uri", $"date", $"text",
        in.resolve(name).toString, maxRecordsPerFile = 25, gzip = true)
    }
    def runStream(): Unit = {
      val q = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, " +
          "length LONG, content BINARY")
        .load(glob)
        .writeStream
        .foreachBatch { (mb: org.apache.spark.sql.DataFrame, id: Long) =>
          CdxLog.append(spark, mb, xxhash64(col("path")), col("content"),
            state, id)
          ()
        }
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }

    drop("drop1", 0 until 60)
    runStream()
    assert(CdxLog.read(spark, state).count() === 60)

    drop("drop2", 100 until 130)
    runStream()
    assert(CdxLog.read(spark, state).count() === 90)
    assert(CdxLog.health(spark, state).maxList === 1)

    // a fresh query over the same checkpoint re-indexes nothing, and a
    // hand replay of batch 0 is a state no-op
    val before = CdxLog.read(spark, state).collect()
      .map(_.toString).sorted
    runStream()
    CdxLog.append(spark,
      spark.read.format("binaryFile").load(in.resolve("drop1").toString +
        "/wet-*.warc.gz"),
      xxhash64(col("path")), col("content"), state, 0L)
    val after = CdxLog.read(spark, state).collect()
      .map(_.toString).sorted
    assert(before.sameElements(after))

    // point-read one record from the FIRST generation through the
    // standing index built across both drops
    val all = spark.read.format("binaryFile").load(glob)
      .select(xxhash64(col("path")).as("fid"), col("content"))
    val idx = CdxLog.read(spark, state)
    val want = idx.where(col("record_id") === "<urn:uuid:conv-7>")
      .select(col("file_id"), col("offset"), col("length"),
        col("member_ord"))
    val got = Warc.fetchSpans(spark, all, col("fid"), col("content"),
      want).collect()
    assert(got.length == 1 &&
      new String(got(0).getAs[Array[Byte]]("block"),
        java.nio.charset.StandardCharsets.UTF_8) == "text 7")
  }
}
