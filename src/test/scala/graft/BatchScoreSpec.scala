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

/** Spec seam for the token-budget path: records each batch's summed
  * whitespace-token count (top-level for closure cleanliness; the
  * buffer is JVM-static, which local mode makes visible to the
  * driver). */
class BatchRecordingScorer(id: String) extends BatchScore.DocScorer {
  override def scorerId: String = id
  override def scoreBatch(texts: Array[String]): Array[Long] = {
    BatchRecordingScorer.batchTokenSums.add(
      texts.map(_.split("\\s+").count(_.nonEmpty)).sum)
    texts.map(_.length.toLong)
  }
}
object BatchRecordingScorer {
  val batchTokenSums =
    new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

/** Model-inference plumbing: batch-layout invariance, per-executor
  * singleton lifecycle, null/empty bypass, duplicate-id safety. The
  * stub scorer's arithmetic is additionally oracled end-to-end by the
  * `model_score` gate (and the token-budget path by
  * `model_score_tokens`). */
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

  test("token-budget batches respect the budget and stay batch-invariant") {
    import graft.text.TextOps
    // ragged doc lengths: i%17+1 tokens each, some null/empty
    val df = (0 until 400).map { i =>
      (i.toLong,
        if (i % 13 == 0) null
        else if (i % 19 == 0) ""
        else (0 to i % 17).map(k => s"w$i-$k").mkString(" "))
    }.toDF("id", "t")
    def run(budget: Int, ctx: Int): Map[Long, (Long, Long, Long)] =
      BatchScore.scoreByTokens(spark, df, col("id"), col("t"),
          TextOps.tokens(col("t")), maxBatchTokens = budget,
          maxDocTokens = ctx)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    // scores/counts/flags are invariant to the batch budget and layout
    val ref = run(64, 8)
    assert(run(8, 8) === ref)
    assert(run(10000, 8) === ref)
    // truncation: docs longer than 8 tokens clamp to 8 and flag; the
    // score is the stub md5 ppm over the re-joined 8-token prefix
    def ppm(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        f"${d(0) & 0xFF}%02x${d(1) & 0xFF}%02x${d(2) & 0xFF}%02x",
        16) % 1000000L
    }
    val pre9 = (0 until 8).map(k => s"w9-$k").mkString(" ") // 8 of 10 tokens
    assert(ref(9L) === ((ppm(pre9), 8L, 1L)))
    assert(ref(1L)._3 === 0L) // 2 tokens: untouched
    assert(ref(0L) === ((0L, 0L, 0L)))   // null bypass
    assert(ref(19L) === ((0L, 0L, 0L)))  // empty bypass
    // every recorded batch fits the budget (single-doc batches are
    // exactly ctx-capped, so ≤ budget always holds when ctx ≤ budget)
    BatchRecordingScorer.batchTokenSums.clear()
    val rec = new BatchRecordingScorer("rec-" + System.nanoTime())
    BatchScore.scoreByTokens(spark, df.repartition(3), col("id"), col("t"),
      TextOps.tokens(col("t")), scorer = rec,
      maxBatchTokens = 24, maxDocTokens = 8).count()
    val sums = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      val itq = BatchRecordingScorer.batchTokenSums.iterator()
      while (itq.hasNext) b += itq.next()
      b.toSeq
    }
    assert(sums.nonEmpty)
    assert(sums.forall(_ <= 24), s"batch over budget: $sums")
    // packing is greedy, not degenerate one-doc-per-batch: fewer
    // batches than live docs
    assert(sums.length < 400 - (400 / 13 + 1) - (400 / 19 + 1))
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
