package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.BatchScore

/** Spec seam: a DISTINCT scorer id whose cache misses the suite can
  * count (top-level — an inner class would drag the spec into the
  * task closure). */
class ProbeScorer extends BatchScore.DocScorer {
  override def scorerId: String = "count-probe"
  override def scoreBatch(texts: Array[String]): Array[Long] =
    texts.map(_ => 1L)
}

/** Model-inference plumbing: batch-layout invariance, per-executor
  * singleton lifecycle, null/empty bypass, duplicate-id safety. The
  * stub scorer's arithmetic is additionally oracled end-to-end by the
  * `model_score` gate. */
class BatchScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(n: Int) = (0 until n).map(i =>
    (i.toLong, if (i % 13 == 0) null else s"doc text $i")).toDF("id", "t")

  test("scores are invariant to batch size and partition layout") {
    val base = docs(500)
    def scores(df: org.apache.spark.sql.DataFrame, bs: Int): Map[Long, Long] =
      BatchScore.score(spark, df, col("id"), col("t"), batchSize = bs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = scores(base, 64)
    assert(scores(base, 1) === ref)
    assert(scores(base, 499) === ref)
    assert(scores(base.repartition(17), 7) === ref)
    // null texts bypass the model and score 0
    assert((0 until 500).filter(_ % 13 == 0).forall(i => ref(i.toLong) == 0L))
    assert(ref(1L) != 0L)
  }

  test("counting scorer: one instance per scorer id, never per task") {
    val before = BatchScore.instantiationCount
    val df = docs(300).repartition(12)
    val s = new ProbeScorer
    BatchScore.score(spark, df, col("id"), col("t"),
      scorer = s, batchSize = 10).count()
    BatchScore.score(spark, df, col("id"), col("t"),
      scorer = s, batchSize = 10).count()
    // local mode: one JVM → exactly one instantiation for this id
    // across 12 partitions × 2 actions
    assert(BatchScore.instantiationCount - before === 1)
  }

  test("duplicate ids keep their own scores (positional re-zip)") {
    val df = Seq((1L, "alpha"), (1L, "beta"), (2L, ""), (2L, "gamma"))
      .toDF("id", "t")
    val got = BatchScore.score(spark, df, col("id"), col("t"), batchSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def ppm(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        f"${d(0) & 0xFF}%02x${d(1) & 0xFF}%02x${d(2) & 0xFF}%02x", 16) % 1000000L
    }
    assert(got.toSet === Set((1L, ppm("alpha")), (1L, ppm("beta")),
      (2L, 0L), (2L, ppm("gamma"))))
  }
}
