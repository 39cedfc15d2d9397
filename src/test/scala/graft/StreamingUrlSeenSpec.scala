package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.UrlSeen

/** The rolling-crawl story end to end: UrlSeen.foldBatch inside
  * foreachBatch, with the STREAMING batchId as the fold's watermark
  * stamp — at-least-once replay of a micro-batch must leave the
  * standing URL index unchanged, which is exactly the fold's
  * idempotence contract. */
class StreamingUrlSeenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stateSet(path: String): Set[(String, Long, Long)] =
    UrlSeen.read(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("micro-batches fold into the standing URL index; restart replays " +
      "are no-ops") {
    val dir = Files.createTempDirectory("graft_surl")
    val in = dir.resolve("in"); Files.createDirectory(in)
    val state = dir.resolve("state").toString
    Files.writeString(in.resolve("b1.json"),
      """{"doc_id":1,"url":"https://a.example/x"}
        |{"doc_id":2,"url":"HTTPS://A.EXAMPLE:443/x#f"}
        |""".stripMargin)
    Files.writeString(in.resolve("b2.json"),
      """{"doc_id":9,"url":"https://a.example/x?"}
        |{"doc_id":10,"url":"https://b.example/y"}
        |""".stripMargin)

    def runStream(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, url STRING")
        .option("maxFilesPerTrigger", 1).json(in.toString)
        .writeStream
        .foreachBatch { (mb: org.apache.spark.sql.DataFrame, id: Long) =>
          UrlSeen.foldBatch(mb, col("doc_id"), col("url"), state, id)
            // materialize the annotation too — a consumer would sink it
            .count()
          ()
        }
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }
    runStream()
    val expected = Set(
      ("https://a.example/x", 0L, 1L),
      ("https://b.example/y", 1L, 10L))
    assert(stateSet(state) === expected)
    assert(UrlSeen.watermark(spark, state) === Some(1L))

    // a FRESH query over the same checkpoint re-processes nothing; and
    // hand-replaying batch 0 (the at-least-once shape foreachBatch must
    // survive) leaves the state bit-identical
    runStream()
    assert(stateSet(state) === expected)
    UrlSeen.foldBatch(
      Seq((1L, "https://a.example/x"), (2L, "HTTPS://A.EXAMPLE:443/x#f"))
        .toDF("doc_id", "url"),
      col("doc_id"), col("url"), state, 0L).count()
    assert(stateSet(state) === expected)
    assert(UrlSeen.watermark(spark, state) === Some(1L))
  }
}
