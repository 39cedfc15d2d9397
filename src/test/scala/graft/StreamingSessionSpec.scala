package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** Streaming gap sessionization: inline closure on a within-batch gap
  * jump, event-time-timeout closure once the watermark passes end+gap,
  * and no emission for sessions the watermark hasn't passed. */
class StreamingSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sessions close inline on gap jumps and by event-time timeout") {
    val dir = Files.createTempDirectory("graft_ssess")
    val in = dir.resolve("in"); Files.createDirectory(in)
    // u1: burst A (00:00, 00:05), burst B (01:30, 01:31) — the 85-min jump
    // exceeds the 30-min gap, so burst A closes INLINE while processing b1
    Files.writeString(in.resolve("b1.json"),
      """{"user_id":1,"event_ts":"2026-01-01T00:00:00.000Z"}
        |{"user_id":1,"event_ts":"2026-01-01T00:05:00.000Z"}
        |{"user_id":1,"event_ts":"2026-01-01T01:30:00.000Z"}
        |{"user_id":1,"event_ts":"2026-01-01T01:31:00.000Z"}
        |""".stripMargin)
    // u2 at 06:00 → after this batch the watermark (10-min delay) is
    // 05:50, past burst B's end+gap (02:01) — u1's timeout fires in b3
    Files.writeString(in.resolve("b2.json"),
      """{"user_id":2,"event_ts":"2026-01-01T06:00:00.000Z"}
        |""".stripMargin)
    Files.writeString(in.resolve("b3.json"),
      """{"user_id":2,"event_ts":"2026-01-01T06:05:00.000Z"}
        |""".stripMargin)

    val stream = spark.readStream
      .schema("user_id LONG, event_ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).json(in.toString)
    val q = StreamingIngest.streamingSessions(spark, stream,
        gapMs = 30L * 60 * 1000, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
    val out = spark.sql("select * from sess_out")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
        r.getAs[Long]("session_end"), r.getAs[Long]("n_events"))).toSet
    // burst A: closed inline; burst B: closed by timeout. u2's session
    // stays OPEN (the watermark never passes 06:05 + 30min) → not emitted.
    assert(out === Set(
      (1L, t0, t0 + 5 * 60 * 1000L, 2L),
      (1L, t0 + 90 * 60 * 1000L, t0 + 91 * 60 * 1000L, 2L)))
  }
}
