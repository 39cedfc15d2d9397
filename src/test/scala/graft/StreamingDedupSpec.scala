package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** Streaming exact dedup: duplicates arriving across micro-batches are
  * dropped by fingerprint state. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cross-micro-batch duplicates are dropped by fingerprint state") {
    val dir = Files.createTempDirectory("graft_sdedup")
    val in = dir.resolve("in"); Files.createDirectory(in)
    // batch files land one at a time; doc "alpha beta" repeats in both
    Files.writeString(in.resolve("b1.json"),
      """{"doc_id":1,"text":"alpha beta","ts":"2026-01-01T00:00:00.000Z"}
        |{"doc_id":2,"text":"gamma delta","ts":"2026-01-01T00:01:00.000Z"}
        |""".stripMargin)
    Files.writeString(in.resolve("b2.json"),
      """{"doc_id":3,"text":"alpha  beta!","ts":"2026-01-01T00:02:00.000Z"}
        |{"doc_id":4,"text":"epsilon zeta","ts":"2026-01-01T00:03:00.000Z"}
        |""".stripMargin)

    val schema = "doc_id LONG, text STRING, ts TIMESTAMP"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.toString)
      .withColumnRenamed("ts", "event_ts")
    val q = StreamingIngest.streamingDedup(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val ids = spark.sql("select doc_id from dedup_out")
      .as[Long].collect().sorted.toSeq
    // doc 3 normalizes to the same fingerprint as doc 1 → dropped
    assert(ids === Seq(1L, 2L, 4L))
  }
}
