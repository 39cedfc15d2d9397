package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SigSeen

/** Rolling-crawl perceptual-signature state: near-match fold
  * semantics, replay idempotence, monotone ordering, compaction
  * equivalence, and the delta-log stress leg. Signatures are raw
  * longs here — the image/audio gates prove the payload→signature
  * legs separately. */
class SigSeenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_sigseen")
    p.toFile.deleteOnExit()
    p.toString + "/idx"
  }

  private def stateSet(path: String): Set[(Long, Long, Long)] =
    SigSeen.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def annotate(rows: Seq[(Long, Long)], path: String, b: Long,
                       r: Int = 7) =
    SigSeen.foldBatch(rows.toDF("doc_id", "sig"),
        col("doc_id"), col("sig"), path, b, maxHamming = r)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2), x.getLong(3),
        if (x.isNullAt(4)) -1L else x.getLong(4))))
      .toMap

  // far-apart base signatures: distinct 16-bit words repeated 4× with
  // pairwise word distance ≥ 6 → signature distance ≥ 24, so one-bit
  // variants never cross classes at radius 7
  private val words: Seq[Long] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    var v = 0
    while (kept.length < 8 && v < 65536) {
      if (kept.forall(w => Integer.bitCount(w ^ v) >= 6)) kept += v
      v += 1
    }
    kept.toSeq.map(w => (0 until 4).map(i => w.toLong << (16 * i))
      .reduce(_ | _))
  }

  test("fold: near-seen across batches, exact and near dup_in_batch, " +
      "deterministic best state match") {
    val path = tmp()
    val b1 = annotate(Seq(
      (10L, words(0)), (11L, words(0)),        // exact in-batch dup
      (12L, words(1)), (13L, words(1) ^ 2L),   // NEAR in-batch dup (d=1)
      (14L, words(2))), path, 1L)
    assert(b1(10L) === ((words(0), "new", 10L, -1L)))
    assert(b1(11L) === ((words(0), "dup_in_batch", 10L, -1L)))
    assert(b1(12L) === ((words(1), "new", 12L, -1L)))
    assert(b1(13L) === ((words(1) ^ 2L, "dup_in_batch", 12L, -1L)))
    assert(b1(14L) === ((words(2), "new", 14L, -1L)))
    // the state stores EVERY distinct signature (near-dups included)
    assert(stateSet(path) === Set(
      (words(0), 1L, 10L), (words(1), 1L, 12L),
      (words(1) ^ 2L, 1L, 13L), (words(2), 1L, 14L)))
    // batch 2: exact re-sight, 3-bit variant, brand-new class
    val b2 = annotate(Seq(
      (20L, words(0)),                  // exact → seen at hamming 0
      (21L, words(2) ^ 0x15L),          // 3 bits off class 2 → seen
      (22L, words(3))), path, 2L)       // never seen → new
    assert(b2(20L) === ((words(0), "seen", 10L, 0L)))
    assert(b2(21L) === ((words(2) ^ 0x15L, "seen", 14L, 3L)))
    assert(b2(22L) === ((words(3), "new", 22L, -1L)))
    // best-match determinism: words(1) and words(1)^2 both in state;
    // a probe at distance 1 from words(1)^2 and 2 from words(1) must
    // report the CLOSER match's doc (13), not the earlier one
    val b3 = annotate(Seq((30L, words(1) ^ 2L ^ 4L)), path, 3L)
    assert(b3(30L) === ((words(1) ^ 2L ^ 4L, "seen", 13L, 1L)))
    // ties on hamming break to the EARLIER batch/doc: probe at d=1
    // from both words(0) (doc 10, b1) and words(0)^1... plant first
    val b4 = annotate(Seq((40L, words(4)), (41L, words(4) ^ 8L)), path, 4L)
    assert(b4(40L)._2 === "new" && b4(41L)._2 === "dup_in_batch")
    val b5 = annotate(Seq((50L, words(4) ^ 1L)), path, 5L)
    // d=1 to words(4) (b4, doc 40) and d=2 to words(4)^8 → closer wins
    assert(b5(50L) === ((words(4) ^ 1L, "seen", 40L, 1L)))
  }

  test("null signatures drop; radius honored exactly at the boundary") {
    val path = tmp()
    val out = SigSeen.foldBatch(
      Seq((1L, java.lang.Long.valueOf(words(0))),
        (2L, null.asInstanceOf[java.lang.Long]))
        .toDF("doc_id", "sig"),
      col("doc_id"), col("sig"), path, 1L).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    // distance exactly 7 is seen; 8 is not (disjoint flip positions so
    // the two probes are 15 apart and never judge each other)
    def flipA(base: Long, n: Int): Long =
      (0 until n).foldLeft(base)((s, i) => s ^ (1L << (i * 9)))
    def flipB(base: Long, n: Int): Long =
      (0 until n).foldLeft(base)((s, i) => s ^ (1L << (i * 7 + 1)))
    val b2 = annotate(Seq(
      (20L, flipA(words(0), 7)), (21L, flipB(words(0), 8))), path, 2L)
    assert(b2(20L)._2 === "seen" && b2(20L)._4 === 7L)
    assert(b2(21L)._2 === "new")
  }

  test("replay: state untouched, annotation identical; out-of-order " +
      "backfill fails loudly") {
    val path = tmp()
    annotate(Seq((1L, words(0))), path, 1L)
    val batch2 = Seq((5L, words(0) ^ 1L), (6L, words(5)))
    val first = annotate(batch2, path, 2L)
    val before = stateSet(path)
    val replay = annotate(batch2, path, 2L)
    assert(stateSet(path) === before, "replay must not touch the state")
    assert(replay === first)
    val e = intercept[IllegalArgumentException] {
      annotate(Seq((9L, words(6))), path, 0L)
    }
    assert(e.getMessage.contains("out-of-order"))
    assert(stateSet(path) === before)
  }

  test("compact: one delta, healed state, watermark preserved; folds " +
      "keep judging against full history") {
    val path = tmp()
    annotate(Seq((1L, words(0))), path, 1L)
    annotate(Seq((2L, words(1))), path, 2L)
    annotate(Seq((3L, words(2))), path, 3L)
    val dest = tmp()
    SigSeen.compact(spark, path, dest)
    assert(stateSet(dest) === stateSet(path))
    assert(SigSeen.watermark(spark, dest) === Some(3L))
    val b4 = annotate(Seq((9L, words(0) ^ 4L)), dest, 4L)
    assert(b4(9L) === ((words(0) ^ 4L, "seen", 1L, 1L)))
    intercept[IllegalArgumentException](SigSeen.compact(spark, dest, dest))
  }

  test("health telemetry: files grow per fold, replay adds none, " +
      "compaction collapses them; out-of-contract dup keys heal") {
    val path = tmp()
    annotate(Seq((1L, words(0)), (2L, words(1))), path, 1L)
    val h1 = SigSeen.health(spark, path)
    assert(h1.keys === 2L && h1.rows === 2L && h1.skew === 1.0)
    assert(h1.files >= 1)
    annotate(Seq((3L, words(2))), path, 2L)
    val h2 = SigSeen.health(spark, path)
    assert(h2.keys === 3L && h2.files > h1.files,
      "every fold must add at least one delta file")
    annotate(Seq((3L, words(2))), path, 2L) // replay
    assert(SigSeen.health(spark, path).files === h2.files,
      "a replay must not add files")
    // an out-of-contract writer (e.g. two uncoordinated jobs) plants a
    // duplicate signature; health flags it, compact() heals it
    SigSeen.read(spark, path).where(col("sig") === words(0))
      .select(col("sig"), lit(9L).as("first_seen_batch"),
        lit(999L).as("first_doc"))
      .write.parquet(path + "/delta-b9")
    val sick = SigSeen.health(spark, path)
    assert(sick.maxList === 2L && sick.skew > 1.0,
      s"duplicate key must surface in health: $sick")
    val dest = tmp()
    SigSeen.compact(spark, path, dest)
    val healed = SigSeen.health(spark, dest)
    assert(healed.maxList === 1L && healed.skew === 1.0 &&
      healed.keys === 3L)
    // min-fold kept the ORIGINAL stamp, not the rogue one
    assert(stateSet(dest).contains((words(0), 1L, 1L)))
    assert(healed.files < sick.files)
  }

  test("multi-signature fold: any-signature seen wins, in-batch " +
      "precedent next, empty arrays drop, every frame persists") {
    val path = tmp()
    // batch 1: doc 10 carries {w0, w1}; doc 11 carries {w2}
    SigSeen.foldBatchMulti(
      Seq((10L, Seq(words(0), words(1))), (11L, Seq(words(2))))
        .toDF("doc_id", "sigs"),
      col("doc_id"), col("sigs"), path, 1L).count()
    // the state holds EVERY frame signature, each stamped to its doc
    assert(stateSet(path) === Set(
      (words(0), 1L, 10L), (words(1), 1L, 10L), (words(2), 1L, 11L)))
    // batch 2: doc 20 = {novel w3, near-w1} → seen via its SECOND
    // frame (h=1, first_doc=10); doc 21 = {novel w4}; doc 22 = {w4^2}
    // → dup_in_batch behind 21; doc 23 = {} → no verdict row
    val out = SigSeen.foldBatchMulti(
      Seq((20L, Seq(words(3), words(1) ^ 4L)), (21L, Seq(words(4))),
        (22L, Seq(words(4) ^ 2L)), (23L, Seq.empty[Long]))
        .toDF("doc_id", "sigs"),
      col("doc_id"), col("sigs"), path, 2L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(20L) === (("seen", 10L, 1L)))
    assert(out(21L) === (("new", 21L, -1L)))
    assert(out(22L) === (("dup_in_batch", 21L, -1L)))
    assert(!out.contains(23L))
    // the novel frames of batch 2 persisted — including SEEN doc 20's
    // first frame, which nothing in state was near
    assert(stateSet(path).contains((words(3), 2L, 20L)))
    // replay: the verdicts and the state are identical
    val replay = SigSeen.foldBatchMulti(
      Seq((20L, Seq(words(3), words(1) ^ 4L)), (21L, Seq(words(4))),
        (22L, Seq(words(4) ^ 2L)))
        .toDF("doc_id", "sigs"),
      col("doc_id"), col("sigs"), path, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replay === Map(20L -> "seen", 21L -> "new",
      22L -> "dup_in_batch"))
  }

  test("delta-log stress: 30 ordered folds — novelty-only growth, " +
      "from-scratch equivalence, replay after compaction") {
    val path = tmp()
    // batch b plants: one re-sight of class b%8, one fresh signature
    def batchRows(b: Long): Seq[(Long, Long)] = Seq(
      (b * 100, words((b % 8).toInt)),
      (b * 100 + 1, words((b % 8).toInt) ^ (1L << ((b % 60) + 2)) ^ 1L))
    for (b <- 1L to 30L) annotate(batchRows(b), path, b)
    val st = stateSet(path)
    // growth ∝ novelty: each base enters once (8), each fresh variant
    // once (30) — never a rescan-and-rewrite of the standing rows
    assert(st.size === 38, s"state size ${st.size}")
    for (w <- 0 until 8) {
      val firstBatch = if (w == 0) 8L else w.toLong // min b with b%8 == w
      assert(st.exists { case (s, fb, _) => s == words(w) && fb == firstBatch },
        s"class $w must be stamped at its FIRST batch")
    }
    // from-scratch single-fold state over the union matches the
    // 30-fold state's signature set (stamps differ by construction)
    val scratch = tmp()
    annotate((1L to 30L).flatMap(batchRows), scratch, 1L)
    assert(stateSet(scratch).map(_._1) === st.map(_._1))
    // compaction mid-stream: equivalent state, folds continue
    val dest = tmp()
    SigSeen.compact(spark, path, dest)
    assert(stateSet(dest) === st)
    val cont = annotate(batchRows(31L), dest, 31L)
    assert(cont(3100L)._2 === "seen")
  }
}
