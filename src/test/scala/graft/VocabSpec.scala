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

  test("minDf prunes the hapax tail") {
    val docs = Seq(
      (1L, "common rare1"), (2L, "common rare2"), (3L, "common")
    ).toDF("doc_id", "text")
    val kept = TextOps.termStats(docs, col("doc_id"), col("text"), minDf = 2)
      .select("token").as[String].collect().toSet
    assert(kept === Set("common"))
  }
}
