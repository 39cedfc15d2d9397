package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Contract tests for the span-removal rewrite
  * (Dedup.removeDuplicatedSpans) — the operator that turns the
  * duplicatedSpans audit into a corpus transformation. */
class DupRemoveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(java.lang.Long, String)], n: Int = 5,
                  keepFirst: Boolean = true) =
    Dedup.removeDuplicatedSpans(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = n, keepFirst = keepFirst)
      .collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
        ((Option(r.getString(1)).orNull, r.getLong(2), r.getLong(3))))
      .toMap

  test("keep-first: min-id doc byte-identical, others drop the span") {
    val shared = "alpha beta gamma delta epsilon"
    val out = run(Seq(
      (1L, s"one two  $shared"),            // keeper (double space kept!)
      (2L, s"$shared tail words here"),
      (3L, "entirely unrelated content words here now")))
    // keeper must return its text BYTE-identical, incl. the "  "
    assert(out(Some(1L)) === ((s"one two  $shared", 7L, 0L)))
    // doc 2 drops exactly the 5 shared positions, rejoined with spaces
    assert(out(Some(2L)) === (("tail words here", 8L, 5L)))
    assert(out(Some(3L))._3 === 0L)
  }

  test("overlapping spans union their positions, not double-count") {
    // docs share a 6-token run -> two overlapping 5-spans in each; the
    // non-keeper must lose 6 positions (the union), not 10
    val run6 = "s1 s2 s3 s4 s5 s6"
    val out = run(Seq(
      (1L, s"$run6 keeper unique suffix"),
      (2L, s"left pad $run6 other unique suffix two")))
    assert(out(Some(1L))._3 === 0L)
    assert(out(Some(2L)) === (("left pad other unique suffix two", 12L, 6L)))
  }

  test("keepFirst=false drops the span from EVERY document") {
    val shared = "b1 b2 b3 b4 b5"
    val out = run(Seq(
      (1L, s"$shared one uniq"), (2L, s"$shared two uniq")),
      keepFirst = false)
    assert(out(Some(1L)) === (("one uniq", 7L, 5L)))
    assert(out(Some(2L)) === (("two uniq", 7L, 5L)))
  }

  test("within-doc repetition alone never triggers removal") {
    val rep = "r1 r2 r3 r4 r5"
    val out = run(Seq(
      (1L, s"$rep middle $rep"),            // repeats only within doc 1
      (2L, "completely different other words")))
    assert(out(Some(1L))._3 === 0L)
    assert(out(Some(1L))._1 === s"$rep middle $rep")
  }

  test("matching is per-token case/punct-robust; removal drops RAW tokens") {
    val out = run(Seq(
      (1L, "Alpha, Beta gamma DELTA epsilon!"),   // keeper
      (2L, "alpha beta Gamma delta (epsilon) plus unique tail here")))
    assert(out(Some(1L))._3 === 0L)
    assert(out(Some(2L)) === (("plus unique tail here", 9L, 5L)))
  }

  test("degenerate rows: short, null, empty, fully-covered") {
    val shared = "c1 c2 c3 c4 c5"
    val out = run(Seq(
      (1L, s"$shared keeper pad"),
      (2L, shared),                          // fully covered -> ""
      (3L, "four tokens only here"),         // < n -> untouched
      (4L, null),                            // null -> null, 0, 0
      (5L, "")))
    assert(out(Some(2L)) === (("", 5L, 5L)))
    assert(out(Some(3L)) === (("four tokens only here", 4L, 0L)))
    assert(out(Some(4L)) === ((null, 0L, 0L)))
    assert(out(Some(5L)) === (("", 0L, 0L)))
  }

  test("null-id rows group as one doc and never win keeper") {
    val shared = "n1 n2 n3 n4 n5"
    val out = run(Seq(
      (null, s"$shared null tail"),
      (7L, s"$shared real tail")))
    // the null group loses the span (keeper = min real id = 7)
    assert(out(None) === (("null tail", 7L, 5L)))
    assert(out(Some(7L))._3 === 0L)
    // a span shared ONLY between two null-id rows still counts df>=2:
    // the null group drops it everywhere (documented degraded mode)
    val out2 = run(Seq(
      (null, "z1 z2 z3 z4 z5 one"), (null, "z1 z2 z3 z4 z5 two")))
    // both rows belong to the null group; both lose the span
    val vals = run(Seq(
      (null, "z1 z2 z3 z4 z5 one"), (8L, "unrelated other words entirely now")))
    assert(vals(Some(8L))._3 === 0L)
    assert(out2.size === 1 || out2.size === 2) // grouped join fans out
  }

  test("minDf raises the removal threshold (df-2 spans survive at minDf=3)") {
    val shared = "m1 m2 m3 m4 m5"
    val rows = Seq(
      (1L, s"$shared one"), (2L, s"$shared two"),             // df = 2
      (3L, s"v1 v2 v3 v4 v5 a"), (4L, s"v1 v2 v3 v4 v5 b"),
      (5L, s"v1 v2 v3 v4 v5 c"))                              // df = 3
    val out = Dedup.removeDuplicatedSpans(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = 5, minDf = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) === 0L && out(2L) === 0L, "df-2 span must survive")
    assert(out(3L) === 0L, "keeper untouched")
    assert(out(4L) === 5L && out(5L) === 5L, "df-3 span must drop")
    intercept[IllegalArgumentException] {
      Dedup.removeDuplicatedSpans(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), minDf = 1)
    }
  }

  test("within-doc self-dedup kernel: keep-first coverage, byte identity, " +
      "totality") {
    import graft.ops.TextKernels
    import org.apache.spark.unsafe.types.UTF8String
    def run(t: String, n: Int = 5): (String, Long, Long) = {
      val r = TextKernels.dropRepeatedSpans(UTF8String.fromString(t), n)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
    // exact within-doc repeat: second occurrence drops
    assert(run("a b c d e MID a b c d e") === (("a b c d e MID", 11L, 5L)))
    // case/punct-robust span identity, RAW tokens retained
    assert(run("A, b c d e! mid a b (c) d e") === (("A, b c d e! mid", 11L, 5L)))
    // overlapping repeats union their coverage
    assert(run("x1 x2 x3 x4 x5 x6 q x1 x2 x3 x4 x5 x6")
      === (("x1 x2 x3 x4 x5 x6 q", 13L, 6L)))
    // no repeat → BYTE-identical (whitespace preserved)
    assert(run("u1  u2\tu3 u4 u5 u6") === (("u1  u2\tu3 u4 u5 u6", 6L, 0L)))
    // shorter than n / empty: untouched
    assert(run("one two three") === (("one two three", 3L, 0L)))
    assert(run("") === (("", 0L, 0L)))
    // self-similar run: "a a a a a a" — spans at every position equal;
    // first keeps, positions 1..5 cover out
    assert(run("a a a a a a") === (("a", 6L, 5L)))
  }

  test("determinism: same input, same output across runs") {
    val rows = (1L to 50L).map { i =>
      (java.lang.Long.valueOf(i),
        if (i % 3 == 0) s"shared one two three four five tail$i"
        else s"uniq${i}a uniq${i}b uniq${i}c uniq${i}d uniq${i}e uniq${i}f")
    }
    val a = run(rows)
    val b = run(rows)
    assert(a === b)
    // exactly one keeper (doc 3) untouched among the sharers
    val sharers = rows.collect { case (i, t) if t.startsWith("shared") => i.toLong }
    assert(a(Some(sharers.min))._3 === 0L)
    // the two overlapping shared 5-spans ("shared one two three four",
    // "one two three four five") cover positions 0..5 -> 6 removed
    sharers.filter(_ != sharers.min).foreach(i => assert(a(Some(i))._3 === 6L))
  }
}
