package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

/** Measures the recall tradeoff [[Ann.cosineNearDupPairs]] documents in
  * prose: centering the LSH hyperplanes at the corpus mean balances the
  * buckets (the join-cost win), but a NEAR-dup pair sitting AT the mean
  * has tiny, decorrelated centered residuals — its sign bits stop
  * tracking the raw cosine and the pair can be missed. Off the mean the
  * shared (position − mean) component dominates both residuals and
  * recall holds. This spec plants near-dup pairs at three points of
  * that density spectrum — far below the mean, at it, far above — and
  * pins both sides of the tradeoff, so a future change to the
  * centering/banding can't silently move either.
  *
  * Everything derives from a fixed seed — the measured recalls are
  * deterministic, which is what lets the spectrum shape be asserted
  * rather than merely logged.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 16

  test("centered LSH: near-dup recall across the density spectrum") {
    val rnd = new scala.util.Random(0xA11CE)
    // per-component noise at amplitude `a` (σ² = a²/3)
    def noise(a: Double): Array[Double] =
      Array.fill(dim)((rnd.nextDouble() * 2 - 1) * a)
    // position s·1⃗ + delta; the all-ones direction is the corpus axis
    def at(s: Double, delta: Array[Double]): Array[Double] = delta.map(s + _)

    // the cloud dominates the corpus (1200 of 1284 vectors) so the
    // corpus mean stays pinned at ≈ 1.02·1⃗ — the s = 1.0 bucket really
    // sits in the decorrelated zone instead of riding a mean offset
    val cloud = (0 until 1200).map { i =>
      (i.toLong, at(0.8 + 0.4 * rnd.nextDouble(), noise(0.35)))
    }
    // near-dup pairs: shared position s·1⃗, independent jitter sized to
    // ~15% of |s·1⃗| per member — raw cosine ≈ 0.978, comfortably over
    // the 0.95 threshold, at every scale. Centered residual =
    // (s − mean)·1⃗ + jitter: pure jitter at the mean (decorrelated),
    // dominated by the common offset far from it.
    val scales = Seq(0.2, 1.0, 3.0)
    val pairsPerScale = 12
    val planted = for {
      (s, si) <- scales.zipWithIndex
      p <- 0 until pairsPerScale
    } yield {
      val idA = 10000L + si * 1000 + p * 2
      // jitter amplitude: norm ≈ 0.15·s·|1⃗| — √dim is the |1⃗| factor,
      // so the planted geometry tracks `dim` instead of assuming 16
      val a = 0.15 * s * math.sqrt(3.0 / dim) * math.sqrt(dim)
      ((s, idA, idA + 1),
        Seq((idA, at(s, noise(a))), (idA + 1, at(s, noise(a)))))
    }
    // exact duplicates AT the mean — identical vectors center to
    // identical residuals, so recall 1.0 is a hard invariant even in
    // the decorrelated zone (the text_embed_dedup_recall gate premise)
    val exactAtMean = (0 until 6).map { p =>
      val id = 50000L + p * 2
      val v = at(1.0, noise(0.05))
      ((id, id + 1), Seq((id, v), (id + 1, v)))
    }
    val corpus = (cloud ++ planted.flatMap(_._2) ++ exactAtMean.flatMap(_._2))
      .toDF("vec_id", "embedding").localCheckpoint(true)

    val found = Ann.cosineNearDupPairs(corpus, col("vec_id"),
        col("embedding"), threshold = 0.95, bands = 10, bandBits = 6)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(keys: Seq[(Long, Long)]): Double =
      keys.count(found.contains).toDouble / keys.size
    val byScale = scales.map(s => s -> recallOf(
      planted.collect { case ((`s`, a, b), _) => (a, b) })).toMap

    // hard invariant: exact duplicates surface at ANY density
    assert(recallOf(exactAtMean.map(_._1)) === 1.0,
      "identical vectors must always collide, including at the mean")
    // off-mean near-dups: the shared centered component carries them
    assert(byScale(0.2) >= 0.9, s"below-mean recall ${byScale(0.2)}")
    assert(byScale(3.0) >= 0.9, s"above-mean recall ${byScale(3.0)}")
    // at the mean the documented soft spot must actually manifest — if
    // this ever reads ≥ 0.7 the planted jitter stopped landing in the
    // decorrelated zone and the spectrum needs re-centering
    assert(byScale(1.0) < 0.7,
      s"at-mean recall ${byScale(1.0)} — expected the documented " +
        "centered-LSH miss zone; the tradeoff note in " +
        "cosineNearDupPairs would be stale if this holds")
  }
}
