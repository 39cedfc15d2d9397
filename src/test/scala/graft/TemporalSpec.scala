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

  test("asof join: a null-timestamp right row never forward-fills") {
    // rightTs <= leftTs is UNKNOWN for a null ts; the null-ts row would
    // sort first in the ascending window (nulls first) and poison every
    // left row before the first real right row with its payload
    val left = Seq((1L, "u1", 5L), (2L, "u1", 15L))
      .toDF("event_id", "k", "ts")
    val right = Seq(
      ("u1", Option.empty[Long], "poison"),
      ("u1", Option(10L), "a"))
      .toDF("k", "ts", "v")
    val out = TemporalOps.asofJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTs = col("ts"), rightTs = col("ts"),
        payload = col("v"))
      .select("event_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === null, "no true preceding right row → null")
    assert(out(2L) === "a")
  }

  test("asof join: payload keeps its native type (long, timestamp)") {
    val left = Seq((1L, "u1", 10L), (2L, "u1", 5L)).toDF("event_id", "k", "ts")
    val longRight = Seq(("u1", 8L, 42L)).toDF("k", "ts", "v")
    val longOut = TemporalOps.asofJoin(left, longRight,
      leftKey = col("k"), rightKey = col("k"),
      leftTs = col("ts"), rightTs = col("ts"), payload = col("v"))
    assert(longOut.schema("payload").dataType ===
      org.apache.spark.sql.types.LongType)
    val byId = longOut.select("event_id", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(byId(1L) === 42L)
    assert(byId(2L) === null, "unmatched rows fill a typed null")

    val tsRight = Seq(("u1", 8L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
      .toDF("k", "ts", "v")
    val tsOut = TemporalOps.asofJoin(left, tsRight,
      leftKey = col("k"), rightKey = col("k"),
      leftTs = col("ts"), rightTs = col("ts"), payload = col("v"))
    assert(tsOut.schema("payload").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(tsOut.where(col("event_id") === 1L)
      .select("payload").collect().head.getTimestamp(0) ===
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
  }

  test("range join: inclusive bounds, bucket crossings, key isolation") {
    val left = Seq(
      (1L, "u1", 100L),
      (2L, "u2", 100L),
      (3L, "u3", 7L)   // window [-3, 7] crosses bucket boundary at 0
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      ("u1", 89L, "tooOld"),   // 100-10=90: just below → out
      ("u1", 90L, "lowEdge"),  // inclusive lower bound
      ("u1", 100L, "hiEdge"),  // inclusive upper bound
      ("u1", 101L, "tooNew"),
      ("u2", 95L, "otherKey"),
      ("u3", -3L, "negTs"),    // negative ts must floor-div correctly
      ("u3", 7L, "atEnd")
    ).toDF("k", "ts", "v")
    def run(lo: Long, hi: Long) = TemporalOps.rangeJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTs = col("ts"), rightTs = col("ts"),
        lower = lo, upper = hi, rightCols = Seq(col("v")))
      .select("event_id", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(run(-10L, 0L) ===
      Set(1L -> "lowEdge", 1L -> "hiEdge", 2L -> "otherKey",
        3L -> "negTs", 3L -> "atEnd"))
    // zero-width window: exact-ts equi join only
    assert(run(0L, 0L) === Set(1L -> "hiEdge", 3L -> "atEnd"))
  }

  test("range join: each matching pair appears exactly once") {
    // many rights inside ONE left window, spread across both candidate
    // buckets — explode must not double-count pairs
    val left = Seq((1L, "k", 1000L)).toDF("event_id", "k", "ts")
    val right = (900L to 1000L by 10).map(t => ("k", t, t.toString))
      .toDF("k", "ts", "v")
    val out = TemporalOps.rangeJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTs = col("ts"), rightTs = col("ts"),
        lower = -100L, upper = 0L, rightCols = Seq(col("v")))
      .select("v").as[String].collect().toSeq
    assert(out.sorted === (900L to 1000L by 10).map(_.toString).sorted)
    assert(out.size === out.distinct.size)
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

  // Both fixture vintages of the event-time projection. The testdata's
  // events.ts is currently timestamp[us], so the Long-nanos branch has
  // no fixture exercising it — these pin it (and the exactness of
  // integral div on values past double's 2^53 range) against the next
  // regeneration in either direction.
  test("epochMicros: Long column is nanos div 1000, exact past 2^53") {
    val big = 1767225600123456789L // ~2026 epoch nanos; > 2^53
    val df = Seq((1L, big)).toDF("id", "ts")
    val out = df.select(TemporalOps.epochMicros(df).as("us"))
      .collect().head.getLong(0)
    assert(out === big / 1000L) // 1767225600123456; double div would round
  }

  test("epochMicros/eventTime: timestamp column matches DuckDB epoch_us") {
    // built from a UTC Instant, not Timestamp.valueOf, so the test does
    // not depend on the JVM default timezone
    val inst = java.time.Instant.parse("2026-01-01T00:00:00.123456Z")
    val df = Seq((1L, java.sql.Timestamp.from(inst))).toDF("id", "ts")
    val us = df.select(TemporalOps.epochMicros(df).as("us"))
      .collect().head.getLong(0)
    assert(us === 1767225600123456L)
    val ts = df.select(TemporalOps.eventTime(df).as("t"))
      .collect().head.getTimestamp(0)
    assert(ts.toInstant === inst)
  }

  test("eventTime: Long nanos column yields the same instant") {
    val df = Seq((1L, 1767225600123456000L)).toDF("id", "ts")
    val ts = df.select(TemporalOps.eventTime(df).as("t"))
      .collect().head.getTimestamp(0)
    assert(ts.toInstant ===
      java.time.Instant.parse("2026-01-01T00:00:00.123456Z"))
  }
}
