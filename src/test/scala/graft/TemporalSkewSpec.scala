package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TemporalOps

/** Hot-key stress for the order-dependent temporal windows: one key
  * owning ~25% of all events. A window partition is indivisible — the
  * hot key's rows all land in one task and AQE cannot split them (its
  * skew handling applies to shuffle joins only) — so the thing to PIN
  * is that correctness is unaffected: results on the hot key must equal
  * an independently-computed reference exactly, and the plan must show
  * the single key-hashed window exchange the scaladoc caveat describes
  * (see TemporalOps: the mitigation is time-chunking, not row salting).
  */
class TemporalSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic irregular timestamps: gaps cycle 1,3,7,15,31 with a
  // session break (gap > 40) every 13th event
  private def tsSeq(n: Int, start: Long): Seq[Long] = {
    val gaps = Seq(1L, 3L, 7L, 15L, 31L)
    var t = start
    (0 until n).map { i =>
      val g = if (i % 13 == 12) 100L else gaps(i % gaps.length)
      t += g; t
    }
  }

  // the hot key owns 1000 of ~4000 events; 30 cold keys own 100 each
  private lazy val events = {
    val hot = tsSeq(1000, 0).map(("hot", _))
    val cold = (0 until 30).flatMap(k => tsSeq(100, 7 * k).map((s"u$k", _)))
    hot ++ cold
  }

  // sparse quote side shared by every as-of test AND its reference —
  // one definition, so the operator and the reference can never be
  // compared against different quotes
  private lazy val quoteRows: Seq[(String, Long, Long)] =
    events.zipWithIndex.collect {
      case ((k, t), i) if i % 97 == 0 => (k, t + 1, t * 10)
    }

  test("sessionize on a 25% hot key matches the sequential reference") {
    val df = events.toDF("user_id", "ts")
    val got = TemporalOps.sessionize(df, col("user_id"), col("ts"), gap = 40L)
      .select(col("user_id"), col("ts"), col("session_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // sequential per-key reference: a break wherever the gap exceeds 40
    for ((key, rows) <- events.groupBy(_._1)) {
      val sorted = rows.map(_._2).sorted
      var sid = -1L; var prev = Long.MinValue
      for (t <- sorted) {
        if (prev == Long.MinValue || t - prev > 40L) sid += 1
        assert(got((key, t)) === sid, s"session_id for ($key, $t)")
        prev = t
      }
    }
    // the hot key really is hot, and really did session correctly in
    // ONE window partition (many sessions, all from one task)
    assert(events.count(_._1 == "hot") * 4 >= events.size)
  }

  test("asofJoin on the hot key matches the sequential forward-fill") {
    val left = events.toDF("user_id", "ts")
    val right = quoteRows.toDF("user_id", "ts", "quote")
    val got = TemporalOps.asofJoin(left, right,
        col("user_id"), col("user_id"), col("ts"), col("ts"),
        col("quote"))
      .select(col("user_id"), col("ts"), col("payload"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val quotes = quoteRows.groupBy(_._1)
    for ((key, t) <- events) {
      val expect = quotes.getOrElse(key, Seq.empty)
        .filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3)
      assert(got((key, t)) === expect, s"asof payload for ($key, $t)")
    }
  }

  test("sessionizeChunked equals sessionize at every chunk width") {
    // the mitigation must be a pure plan change: identical output at a
    // width smaller than the gap (sessions span MANY chunks and every
    // boundary bridges), comparable to the gap, much larger (most keys
    // one chunk), and effectively-unchunked
    val df = events.toDF("user_id", "ts")
    val want = TemporalOps.sessionize(df, col("user_id"), col("ts"), 40L)
      .select("user_id", "ts", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    for (w <- Seq(7L, 40L, 64L, 1000L, Long.MaxValue / 4)) {
      val got = TemporalOps.sessionizeChunked(df, col("user_id"),
          col("ts"), gap = 40L, chunkWidth = w)
        .select("user_id", "ts", "session_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got === want, s"chunkWidth=$w diverged from sessionize")
    }
  }

  test("sessionizeChunked equivalence survives hostile keys and timestamps") {
    // null keys, null timestamps, negative timestamps (sign-exact floor
    // division), and duplicate (key, ts) rows — the degradation paths
    // where a plain equi-join or Int-floor chunking would silently
    // diverge from the unchunked operator
    val hostile = Seq[(String, java.lang.Long)](
      (null, 5L), (null, 50L), (null, null),
      ("a", null), ("a", -100L), ("a", -95L), ("a", -10L), ("a", 0L),
      ("a", 1L), ("a", 1L), ("a", 200L),
      ("b", Long.MinValue / 4), ("b", Long.MinValue / 4 + 30L),
      // the wrap zone: ts within pmod-of-width of Long.MinValue, where
      // the old (ts - pmod) idiom underflowed and chunked the EARLIEST
      // events into the LAST chunk
      ("c", Long.MinValue), ("c", Long.MinValue + 10L),
      ("c", Long.MinValue + 100L))
      .toDF("user_id", "ts")
    def render(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "ts", "session_id").collect()
        .map(r => (Option(r.getString(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          r.getLong(2))).sortBy(t => (t._1, t._2, t._3)).toSeq
    val want = render(TemporalOps.sessionize(hostile, col("user_id"),
      col("ts"), 40L))
    for (w <- Seq(7L, 64L, 10000L)) {
      val got = render(TemporalOps.sessionizeChunked(hostile,
        col("user_id"), col("ts"), gap = 40L, chunkWidth = w))
      assert(got === want, s"chunkWidth=$w diverged on hostile input")
    }
  }

  test("asofJoinChunked equals asofJoin at every chunk width") {
    val left = events.toDF("user_id", "ts")
    val right = quoteRows.toDF("user_id", "ts", "quote")
    def render(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("ts"), col("payload")).collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(t => (t._1, t._2)).toSeq
    val want = render(TemporalOps.asofJoin(left, right,
      col("user_id"), col("user_id"), col("ts"), col("ts"), col("quote")))
    // widths below the quote spacing (carry does all the work), around
    // it, and effectively-unchunked
    for (w <- Seq(13L, 97L, 5000L, Long.MaxValue / 4)) {
      val got = render(TemporalOps.asofJoinChunked(left, right,
        col("user_id"), col("user_id"), col("ts"), col("ts"),
        col("quote"), chunkWidth = w))
      assert(got === want, s"chunkWidth=$w diverged from asofJoin")
    }
  }

  test("asofJoinChunked equivalence survives hostile keys and timestamps") {
    val left = Seq[(String, java.lang.Long)](
      (null, 5L), (null, null), ("a", null), ("a", -100L), ("a", -1L),
      ("a", 0L), ("a", 3L), ("a", 3L), ("a", 500L), ("c", 7L),
      ("d", Long.MinValue + 5L), ("d", Long.MinValue + 200L))
      .toDF("user_id", "ts")
    val right = Seq[(String, java.lang.Long, java.lang.Long)](
      (null, 1L, 111L), ("a", null, 222L), ("a", -50L, 1L), ("a", 0L, 2L),
      ("a", 3L, null), ("a", 400L, 4L), ("b", 1L, 5L),
      // wrap zone: a quote at the very bottom of the Long domain must
      // still carry forward in ts order, not chunk-sort after its
      // consumers (the old (ts - pmod) idiom underflowed here)
      ("d", Long.MinValue, 7L))
      .toDF("user_id", "ts", "quote")
    def render(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("ts"), col("payload")).collect()
        .map(r => (Option(r.getString(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(t => (t._1, t._2)).toSeq
    val want = render(TemporalOps.asofJoin(left, right,
      col("user_id"), col("user_id"), col("ts"), col("ts"), col("quote")))
    // includes a right row with a NULL payload at ts 3 — the carry must
    // preserve "filled with null", not resurrect an older value
    assert(want.exists(t => t._2 === Some(3L) && t._3 === None))
    for (w <- Seq(7L, 64L, 10000L)) {
      val got = render(TemporalOps.asofJoinChunked(left, right,
        col("user_id"), col("user_id"), col("ts"), col("ts"),
        col("quote"), chunkWidth = w))
      assert(got === want, s"chunkWidth=$w diverged on hostile input")
    }
  }

  test("the chunked window exchange hashes on (key, chunk)") {
    // the point of the operator: the event-scale window partitions by
    // (key, chunk), so a hot key's history splits across chunks instead
    // of serializing in one task; only the slim summary window is keyed
    val df = events.toDF("user_id", "ts")
    val plan = TemporalOps.sessionizeChunked(df, col("user_id"),
        col("ts"), 40L, 64L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__k"), plan.take(2000))
    assert(plan.contains("__c"), "chunk column missing from the plan")
  }

  test("the window exchange hashes on the key — the documented shape") {
    val df = events.toDF("user_id", "ts")
    val plan = TemporalOps.sessionize(df, col("user_id"), col("ts"), 40L)
      .queryExecution.executedPlan.toString
    // one hash exchange on user_id feeding Window — the indivisible
    // partition the scaladoc caveat is about. If this ever becomes a
    // range/salted exchange the caveat (and the time-chunk guidance)
    // needs rewriting.
    assert(plan.contains("hashpartitioning(user_id"), plan.take(2000))
    assert(plan.contains("Window"), "sessionize no longer plans a Window")
  }
}
