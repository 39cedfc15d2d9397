package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** transformWithState (arbitrary-state v2): per-user per-type MapState
  * counts accumulate across micro-batches. Requires the RocksDB state
  * store provider (the API's backing store). */
class TransformWithStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("MapState counts accumulate per user and type across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft_tws")
      val in = dir.resolve("in"); Files.createDirectory(in)
      Files.writeString(in.resolve("b1.json"),
        """{"user_id":1,"event_type":"click"}
          |{"user_id":1,"event_type":"click"}
          |{"user_id":1,"event_type":"view"}
          |{"user_id":2,"event_type":"click"}
          |""".stripMargin)
      Files.writeString(in.resolve("b2.json"),
        """{"user_id":1,"event_type":"click"}
          |{"user_id":2,"event_type":"view"}
          |""".stripMargin)
      // distinct mtimes: batch order drives which totals are "latest"
      Files.setLastModifiedTime(in.resolve("b1.json"),
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
      Files.setLastModifiedTime(in.resolve("b2.json"),
        java.nio.file.attribute.FileTime.fromMillis(1000000010000L))

      val stream = spark.readStream
        .schema("user_id LONG, event_type STRING")
        .option("maxFilesPerTrigger", 1).json(in.toString)
      val q = StreamingIngest.runningTypeCounts(spark, stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_out")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)

      // update-mode sink: keep the LAST emission per (user, type)
      val rows = spark.sql("select * from tws_out").collect()
        .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
      val latest = rows.groupBy(_._1).view.mapValues(_.last._2).toMap
      assert(latest((1L, "click")) === 3L) // 2 in b1 + 1 in b2
      assert(latest((1L, "view")) === 1L)
      assert(latest((2L, "click")) === 1L)
      assert(latest((2L, "view")) === 1L)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("null user or type rows are dropped, not a MapState crash loop") {
    // a null event_type reaching MapState.containsKey/updateValue (or a
    // null user_id hitting the primitive key decode) kills the query,
    // and the restarted checkpoint replays the same batch — garbage
    // records must be dropped at the input, leaving real counts intact
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("graft_tws_null")
      val in = dir.resolve("in"); Files.createDirectory(in)
      Files.writeString(in.resolve("b1.json"),
        """{"user_id":1,"event_type":"click"}
          |{"user_id":1,"event_type":null}
          |{"user_id":null,"event_type":"view"}
          |{"user_id":1,"event_type":"click"}
          |""".stripMargin)
      val stream = spark.readStream
        .schema("user_id LONG, event_type STRING")
        .json(in.toString)
      val q = StreamingIngest.runningTypeCounts(spark, stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_null_out")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val rows = spark.sql("select * from tws_null_out").collect()
        .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
      assert(rows === Map((1L, "click") -> 2L))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
