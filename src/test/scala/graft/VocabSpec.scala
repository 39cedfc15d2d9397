package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** termStats: tf counts occurrences, df counts documents, minDf prunes,
  * tokenization matches the shared normalized stream. */
class VocabSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tf/df over the normalized token stream") {
    val docs = Seq(
      (1L, "Alpha beta alpha!"),   // normalization lowercases + strips punct
      (2L, "beta gamma"),
      (3L, "ALPHA")
    ).toDF("doc_id", "text")
    val stats = TextOps.termStats(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats("alpha") === ((3L, 2L))) // 2 in doc1 + 1 in doc3; 2 docs
    assert(stats("beta") === ((2L, 2L)))
    assert(stats("gamma") === ((1L, 1L)))
    assert(stats.size === 3)
  }

  test("topTerms ranks rarity-weighted frequency with lexicographic ties") {
    val docs = Seq(
      (1L, "rare common common"),  // tf(common)=2 · N/df=3/3=1 → 2M ppm
                                   // tf(rare)=1 · N/df=3/1=3   → 3M ppm
      (2L, "common alpha"),
      (3L, "common beta")
    ).toDF("doc_id", "text")
    val out = TextOps.topTerms(docs, col("doc_id"), col("text"), n = 3L,
        topK = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        ((r.getAs[String]("token"), r.getAs[Long]("score_ppm")))).toMap
    assert(out((1L, 1)) === (("rare", 3000000L)))
    assert(out((1L, 2)) === (("common", 2000000L)))
    // doc 2: alpha (3M) beats common (1M)
    assert(out((2L, 1)) === (("alpha", 3000000L)))
    assert(out((2L, 2)) === (("common", 1000000L)))
  }

  test("takePerGroup keeps exactly n per group, deterministically") {
    import graft.text.Sampling
    val docs = (1L to 100L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    def run() = Sampling.takePerGroup(docs, col("source"), col("doc_id"), n = 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val out = run()
    assert(out.groupBy(_._1).view.mapValues(_.size).toMap ===
      Map("src0" -> 5, "src1" -> 5, "src2" -> 5))
    assert(run() === out, "selection must be stable across runs")
    // a group smaller than n yields all its rows, no error
    val tiny = Seq((1L, "only")).toDF("doc_id", "source")
    assert(Sampling.takePerGroup(tiny, col("source"), col("doc_id"), 5)
      .count() === 1)
  }

  test("minDf prunes the hapax tail") {
    val docs = Seq(
      (1L, "common rare1"), (2L, "common rare2"), (3L, "common")
    ).toDF("doc_id", "text")
    val kept = TextOps.termStats(docs, col("doc_id"), col("text"), minDf = 2)
      .select("token").as[String].collect().toSet
    assert(kept === Set("common"))
  }
}
