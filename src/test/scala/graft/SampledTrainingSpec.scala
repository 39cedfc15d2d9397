package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Ann, Pq}

/** The sample-capped training path (cap < corpus) — which NO fixture
  * reaches: every testdata embeddings table is smaller than the default
  * cap, so without a corpus built here the hash-ordered sample is a
  * pass-through and a bug in it would ship silently. Asserts the
  * properties sampling must preserve: totality of the final full-corpus
  * assignment, run-to-run determinism, full-probe exactness (guaranteed
  * by the exact re-rank regardless of where centroids land), and PQ
  * code shape from a sample-trained codebook. */
class SampledTrainingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 600 synthetic 8-dim vectors from a fixed hash recurrence —
  // deterministic, no RNG, bigger than the caps used below
  private def corpus = {
    val rows = (1L to 600L).map { i =>
      (i, (0 until 8).map(d => ((i * 2654435761L + d * 40503L) % 1000L)
        .toDouble / 1000.0 + 0.001).toArray)
    }
    rows.toDF("cid", "cvec")
  }

  test("ivfIndex with cap < corpus: total, deterministic assignment") {
    def build() = {
      val (assign, cents) = Ann.ivfIndex(corpus, nClusters = 4, iters = 2,
        maxTrainRows = 64)
      (assign.orderBy("cid").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq,
       cents.orderBy("cluster").collect().map(_.getSeq[Double](1)).toSeq)
    }
    val (a1, c1) = build()
    val (a2, c2) = build()
    // every corpus row assigned exactly once, even the 536 rows the
    // training sample never saw
    assert(a1.map(_._1) === (1L to 600L))
    assert(a1.map(_._2).distinct.sorted === Seq(0, 1, 2, 3))
    // bit-identical across independent builds
    assert(a1 === a2)
    assert(c1 === c2)
  }

  test("full probe over sample-trained clusters still equals brute force") {
    val q = corpus.limit(3).select(col("cid").as("qid"), col("cvec").as("qvec"))
    val c = corpus.select(col("cid").as("cid"), col("cvec").as("cvec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "cid").collect().map(_.toSeq).toSeq
    val ivf = rows(Ann.ivfTopK(q, c, k = 5, nClusters = 4, nprobe = 4,
      maxTrainRows = 64))
    val brute = rows(Ann.bruteForceTopK(q, c, k = 5))
    assert(ivf.nonEmpty)
    assert(ivf === brute)
  }

  test("PQ codebook trained on a sample still encodes every row") {
    val mdl = Pq.train(corpus, col("cid"), col("cvec"), dim = 8, m = 2,
      k = 4, iters = 2, maxTrainRows = 64)
    assert(mdl.centroids.size === 2 && mdl.centroids.forall(_.size === 4))
    val codes = corpus.select(Pq.encode(col("cvec"), mdl).as("codes"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.length === 600)
    assert(codes.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 4)))
    // sample-trained codebook is itself deterministic
    val mdl2 = Pq.train(corpus, col("cid"), col("cvec"), dim = 8, m = 2,
      k = 4, iters = 2, maxTrainRows = 64)
    assert(mdl.centroids === mdl2.centroids)
  }
}
