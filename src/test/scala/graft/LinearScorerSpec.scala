package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{BatchScore, LinearScorer}

/** Trained hashing-trick linear scorer: structural determinism
  * (bit-identical weights across runs and partitionings), hand-checked
  * closed-form weights, discrimination, and the DocScorer contract. */
class LinearScorerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 256

  private def tiny = Seq(
    (1, "good solid prose here"),
    (1, "more good clean prose"),
    (0, "bad spammy junk now"),
    (0, "such bad junk content")).toDF("y", "t")

  test("training is bit-identical across runs and partition layouts") {
    val a = LinearScorer.train(tiny, col("t"), col("y"), dim)
    val b = LinearScorer.train(tiny.repartition(7), col("t"), col("y"), dim)
    val c = LinearScorer.train(tiny.repartition(1), col("t"), col("y"), dim)
    assert(a.weights.toSeq === b.weights.toSeq)
    assert(a.weights.toSeq === c.weights.toSeq)
    assert(a.scorerId === b.scorerId)
  }

  test("closed-form weights match the hand formula; scorer discriminates") {
    val m = LinearScorer.train(tiny, col("t"), col("y"), dim)
    // n_pos = n_neg = 2. A token in BOTH positives and NO negative:
    // w = 3*1e6/4 - 1*1e6/4 = 500000. "good" appears in both positives.
    assert(m.weights(LinearScorer.bucket("good", dim)) === 500000L)
    // "bad" is the mirror image
    assert(m.weights(LinearScorer.bucket("bad", dim)) === -500000L)
    // a token in ONE positive only: w = 2*1e6/4 - 1*1e6/4 = 250000
    assert(m.weights(LinearScorer.bucket("here", dim)) === 250000L)
    // an unseen bucket carries only smoothing (here symmetric: 0)
    assert(m.weights(LinearScorer.bucket("zzzz-unseen", dim)) === 0L)
    val Array(p, n) = m.scoreBatch(Array("good prose", "bad junk"))
    assert(p > 500000L && n < 500000L, s"p=$p n=$n")
    assert(p <= 1000000L && n >= 0L)
  }

  test("null/empty score 0; feature-less text scores the 500000 center") {
    val m = LinearScorer.train(tiny, col("t"), col("y"), dim)
    assert(m.scoreBatch(Array(null, "", "!!! ???")).toSeq ===
      Seq(0L, 0L, 500000L))
  }

  test("flows through BatchScore plumbing batch-invariantly") {
    val m = LinearScorer.train(tiny, col("t"), col("y"), dim)
    val docs = (1L to 40L).map(i => (i, s"doc $i good prose" +
      (if (i % 3 == 0) " bad junk" else ""))).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame, bs: Int) =
      BatchScore.score(spark, d, col("doc_id"), col("text"),
          scorer = m, batchSize = bs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(docs, 7) === run(docs.repartition(5), 64))
  }

  test("training requires both classes and dense labels") {
    intercept[IllegalArgumentException] {
      LinearScorer.train(Seq((1, "only positive docs")).toDF("y", "t"),
        col("t"), col("y"), dim)
    }
  }
}
