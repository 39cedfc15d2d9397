package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Sampling

/** Sampling-module edge contracts: the uniform null-key policy (one
  * deterministic bucket, never three different silent behaviors) and the
  * 60-bit shard hash (shard counts beyond 2¹⁶ must actually populate).
  * The mainline behavior is pinned by the corpus_sample / corpus_shuffle /
  * corpus_mix / stratified_take oracle gates. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withNulls = Seq(
    (java.lang.Long.valueOf(1L), "a"),
    (java.lang.Long.valueOf(2L), "b"),
    (null.asInstanceOf[java.lang.Long], "c"),
    (null.asInstanceOf[java.lang.Long], "d"))
    .toDF("doc_id", "payload")

  test("fraction 1 keeps null-key rows too") {
    // md5(null) is null and a bare `null < threshold` predicate would
    // silently drop the rows — the sentinel hash must keep them
    assert(Sampling.hashSample(withNulls, col("doc_id"), 1.0).count() === 4)
    assert(Sampling.hashSample(withNulls, col("doc_id"), 0.0).count() === 0)
  }

  test("null keys land in ONE deterministic split, the same as empty string") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val got = withNulls
      .select(col("payload"), Sampling.hashSplit(col("doc_id"), splits).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // both null-key rows take the same label...
    assert(got("c") === got("d"))
    // ...and it is the label a genuine "" key gets (the documented
    // sentinel), NOT automatically the last split
    val emptyKey = Seq(Tuple1("")).toDF("k")
      .select(Sampling.hashSplit(col("k"), splits)).head().getString(0)
    assert(got("c") === emptyKey)
  }

  test("takePerGroup stays deterministic with null keys present") {
    val df = Seq(
      (java.lang.Long.valueOf(10L), "g"),
      (java.lang.Long.valueOf(11L), "g"),
      (null.asInstanceOf[java.lang.Long], "g"))
      .toDF("doc_id", "source")
    def run() = Sampling.takePerGroup(df, col("source"), col("doc_id"), n = 2)
      .select("doc_id").collect().map(r =>
        if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    val first = run()
    assert(first.size === 2)
    assert(run() === first)
  }

  test("shard assignment populates shard ids beyond 65535") {
    // the old 4-hex-char (16-bit) hash could never reach shards >= 2^16,
    // silently capping the corpus-scaled shard counts the scaladoc
    // mandates; 60 bits must spread a few hundred keys well past it
    val docs = (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "p")
    val shards = Sampling.shuffleAssignment(docs, col("doc_id"), 1000000)
      .select("shard").as[Long].collect()
    assert(shards.forall(s => s >= 0 && s < 1000000))
    assert(shards.exists(_ > 65535L))
    // positions are dense 1..n within each shard
    val pos = Sampling.shuffleAssignment(docs, col("doc_id"), 4)
      .groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("mx"))
      .collect()
    assert(pos.forall(r => r.getLong(1) === r.getInt(2).toLong))
  }
}
