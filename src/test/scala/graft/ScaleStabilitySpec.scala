package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextOps

/** Scale-up stability: the bounded-sample knobs (simhash layout
  * selection, the LSH centering mean) must make the SAME decisions when
  * the corpus grows by exact replication. A bounded sample that degrades
  * as the corpus scales would flip plan shapes or recall characteristics
  * at production size in ways no single-size determinism test can catch
  * — so these cases compare decisions ACROSS sizes, not runs. */
class ScaleStabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    Tables(spark, dir, "documents").select(col("doc_id"), col("text"))

  /** times× corpus: the original plus (times-1) replicas under shifted
    * ids — exact duplication, the cleanest model of "same corpus, more
    * of it". */
  private def replicated(base: DataFrame, times: Int): DataFrame =
    (1 until times).foldLeft(base) { (acc, i) =>
      acc.unionByName(base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
    }

  test("simhash layout choice is invariant under 10x corpus replication") {
    def sigd(d: DataFrame): DataFrame =
      d.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
    val at1 = Dedup.chooseWideTables(sigd(docs))
    val at10 = Dedup.chooseWideTables(sigd(replicated(docs, 10)))
    // before the distinct-signature sample, the replicated corpus filled
    // the 1024 sample slots with ~10 copies each of the lowest-hashed
    // signatures and the a=1.0 self-copy pairs flipped the decision
    assert(at1 === at10,
      s"layout decision flipped under replication: 1x=$at1 10x=$at10")
  }

  test("sampled-mean recall decisions survive 10x corpus replication") {
    def embedded(d: DataFrame): DataFrame = d.select(
      col("doc_id").as("vec_id"),
      graft.ops.TextExprs.hashEmbed(
        TextOps.tokens(TextOps.normalized(col("text"))), 64).as("embedding"))

    def pairsAmongOriginals(corpus: DataFrame): Set[(Long, Long)] =
      Ann.cosineNearDupPairs(embedded(corpus).localCheckpoint(true),
          col("vec_id"), col("embedding"),
          threshold = 0.9, bands = 10, bandBits = 6, meanSampleMod = 16)
        .where(col("id_a") < 1000000L && col("id_b") < 1000000L)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val at1 = pairsAmongOriginals(docs)
    assert(at1.nonEmpty, "fixture should contain embedding near-dups")
    // 10x the corpus: the 1/16 id-hash mean sample now draws from the
    // replicated population — the estimate shifts within its variance,
    // and every original-vs-original near-dup decision must survive
    // (exact-cosine verify means false pairs cannot appear; only a
    // degraded sample dropping candidates could change this set)
    val at10 = pairsAmongOriginals(replicated(docs, 10))
    assert(at1 === at10,
      s"recall decisions shifted under replication: " +
        s"only-1x=${at1 -- at10} only-10x=${at10 -- at1}")
  }
}
