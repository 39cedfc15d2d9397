package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TemporalOps

/** Hand-built boundary cases for the temporal operators: inclusive
  * as-of boundary, null before the first right row, key isolation,
  * session gap edges. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof join: inclusive boundary, forward fill, null before first") {
    val left = Seq(
      (1L, "u1", 5L),   // before any right row → null
      (2L, "u1", 10L),  // == right ts → inclusive match "a"
      (3L, "u1", 15L),  // between → still "a"
      (4L, "u1", 20L),  // == second right ts → "b"
      (5L, "u2", 50L),  // other key: only u2's rows visible → "c"
      (6L, "u3", 99L)   // key with no right rows → null
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("u1", 10L, "a"), ("u1", 20L, "b"), ("u2", 1L, "c")
    ).toDF("k", "ts", "v")
    val out = TemporalOps.asofJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTs = col("ts"), rightTs = col("ts"),
        payload = col("v"))
      .select("event_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === null)
    assert(out(2L) === "a")
    assert(out(3L) === "a")
    assert(out(4L) === "b")
    assert(out(5L) === "c")
    assert(out(6L) === null)
  }

  test("asof join: null payloads win the fill; null keys never match") {
    val left = Seq(
      (1L, Option("u1"), 30L),  // right@20 has null payload → null, not "a"
      (2L, Option.empty[String], 100L) // null key → no match despite null-key right row
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (Option("u1"), 10L, Option("a")),
      (Option("u1"), 20L, Option.empty[String]),
      (Option.empty[String], 1L, Option("ghost"))
    ).toDF("k", "ts", "v")
    val out = TemporalOps.asofJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTs = col("ts"), rightTs = col("ts"),
        payload = col("v"))
      .select("event_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === null, "null payload of the matched row must win")
    assert(out(2L) === null, "null keys must not equi-match")
  }

  test("sessionize: gap strictly-greater starts a new session") {
    val e = Seq(
      ("u1", 0L), ("u1", 100L),      // gap 100 == gap → same session
      ("u1", 201L),                  // gap 101 > 100 → new session
      ("u1", 250L),
      ("u2", 0L)                     // separate key
    ).toDF("k", "ts")
    val out = TemporalOps.sessionize(e, col("k"), col("ts"), gap = 100L)
      .select("k", "ts", "session_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("u1", 0L)) === 0L)
    assert(out(("u1", 100L)) === 0L)
    assert(out(("u1", 201L)) === 1L)
    assert(out(("u1", 250L)) === 1L)
    assert(out(("u2", 0L)) === 0L)
  }
}
