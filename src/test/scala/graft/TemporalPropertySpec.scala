package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TemporalOps

/** Seeded randomized properties for the temporal operators — the family
  * that broke under fixture drift in rounds 7-8. Small key/timestamp
  * domains force the adversarial structure on purpose: hot keys, equal
  * timestamps, boundary hits, null keys/timestamps/payloads. Each
  * operator is compared against an independent driver-side reference
  * over the same rows. */
class TemporalPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  // (id, key, ts) with ~5% null keys and ~5% null timestamps; 4 live
  // keys × ts in [0, 50) guarantees collisions and boundary ties
  private def randomRows(n: Int, idBase: Long) =
    (0 until n).map { i =>
      val k = if (rnd.nextInt(20) == 0) null
        else s"k${rnd.nextInt(4)}"
      val ts = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(50).toLong)
      (idBase + i, k, ts)
    }

  test("asofJoin matches a brute-force reference on adversarial data") {
    for (round <- 0 until 5) {
      val leftRows = randomRows(120, 1000L * round)
      // right side made unique per (key, ts) — the operator's contract —
      // with ~20% legitimately-null payloads to exercise the fill marker
      val rightRows = randomRows(120, 500000L + 1000L * round)
        .filter(r => r._2 != null && r._3.isDefined)
        .groupBy(r => (r._2, r._3.get)).map { case (_, rs) => rs.maxBy(_._1) }
        .map(r => (r._2, r._3.get,
          if (rnd.nextInt(5) == 0) null else s"v${r._1}"))
        .toSeq
      val left = leftRows.map { case (id, k, ts) => (id, k, ts.map(java.lang.Long.valueOf).orNull) }
        .toDF("event_id", "k", "ts")
      val right = rightRows.toDF("k", "ts", "v")

      val got = TemporalOps.asofJoin(left, right,
          leftKey = col("k"), rightKey = col("k"),
          leftTs = col("ts"), rightTs = col("ts"), payload = col("v"))
        .select("event_id", "payload")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

      val byKey = rightRows.groupBy(_._1)
      val expected = leftRows.map { case (id, k, ts) =>
        val p = Option(k).zip(ts).flatMap { case (kk, t) =>
          val cands = byKey.getOrElse(kk, Seq.empty).filter(_._2 <= t)
          if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3)
        }
        id -> p.orNull
      }.toMap
      assert(got === expected, s"asof mismatch on round $round")
    }
  }

  test("rangeJoin matches a brute-force reference on adversarial data") {
    val (lower, upper) = (-7L, 3L)
    for (round <- 0 until 5) {
      val leftRows = randomRows(100, 1000L * round)
      val rightRows = randomRows(100, 500000L + 1000L * round)
      val left = leftRows.map { case (id, k, ts) => (id, k, ts.map(java.lang.Long.valueOf).orNull) }
        .toDF("event_id", "k", "ts")
      val right = rightRows.map { case (id, k, ts) => (id, k, ts.map(java.lang.Long.valueOf).orNull) }
        .toDF("prior_id", "k", "ts")

      val got = TemporalOps.rangeJoin(left,
          right.select(col("prior_id"), col("k"), col("ts").as("rts")),
          leftKey = col("k"), rightKey = col("k"),
          leftTs = col("ts"), rightTs = col("rts"),
          lower = lower, upper = upper,
          rightCols = Seq(col("prior_id")))
        .select("event_id", "prior_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val expected = (for {
        (lid, lk, lts) <- leftRows; if lk != null
        lt <- lts.toSeq
        (rid, rk, rts) <- rightRows; if rk == lk
        rt <- rts.toSeq
        if rt >= lt + lower && rt <= lt + upper
      } yield (lid, rid)).toSet
      assert(got === expected, s"range mismatch on round $round")
    }
  }

  test("sessionize matches a brute-force reference on adversarial data") {
    val gap = 5L
    for (round <- 0 until 5) {
      val rows = randomRows(150, 1000L * round)
        .filter(r => r._2 != null && r._3.isDefined)
        .map(r => (r._2, r._3.get)).distinct // operator keys sessions on (k, ts)
      val df = rows.toDF("k", "ts")
      val got = TemporalOps.sessionize(df, col("k"), col("ts"), gap = gap)
        .select("k", "ts", "session_id")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

      val expected = rows.groupBy(_._1).flatMap { case (k, ks) =>
        val sorted = ks.map(_._2).sorted
        var sid = 0L
        var prev = Long.MinValue
        sorted.map { t =>
          if (prev != Long.MinValue && t - prev > gap) sid += 1
          prev = t
          (k, t) -> sid
        }
      }
      assert(got === expected, s"sessionize mismatch on round $round")
    }
  }

  test("chunked temporal variants equal their keyed twins on adversarial data") {
    // the twins above are reference-checked; the chunked forms need only
    // EQUALITY TO THE TWIN, across random chunk widths including widths
    // smaller than the gap (sessions/fills spanning many chunks)
    for (round <- 0 until 5) {
      val widths = Seq(1L + rnd.nextInt(5), 7L + rnd.nextInt(20),
        100L + rnd.nextInt(1000)).map(_.toLong)
      val evRows = randomRows(150, 2000000L + 1000L * round)
      val ev = evRows.map { case (id, k, ts) =>
        (id, k, ts.map(java.lang.Long.valueOf).orNull) }
        .toDF("event_id", "k", "ts")
      val sWant = TemporalOps.sessionize(ev, col("k"), col("ts"), gap = 5L)
        .select("event_id", "session_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rightRows = randomRows(100, 3000000L + 1000L * round)
        .filter(r => r._2 != null && r._3.isDefined)
        .groupBy(r => (r._2, r._3.get)).map { case (_, rs) => rs.maxBy(_._1) }
        .map(r => (r._2, r._3.get,
          if (rnd.nextInt(5) == 0) null else s"v${r._1}"))
        .toSeq
      val right = rightRows.toDF("k", "ts", "v")
      val aWant = TemporalOps.asofJoin(ev, right,
          col("k"), col("k"), col("ts"), col("ts"), col("v"))
        .select("event_id", "payload")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      for (w <- widths) {
        val sGot = TemporalOps.sessionizeChunked(ev, col("k"), col("ts"),
            gap = 5L, chunkWidth = w)
          .select("event_id", "session_id")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(sGot === sWant, s"sessionizeChunked(w=$w) round $round")
        val aGot = TemporalOps.asofJoinChunked(ev, right,
            col("k"), col("k"), col("ts"), col("ts"), col("v"),
            chunkWidth = w)
          .select("event_id", "payload")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(aGot === aWant, s"asofJoinChunked(w=$w) round $round")
      }
    }
  }
}
