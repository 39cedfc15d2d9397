package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomOps
import graft.text.Decontaminate

/** Bloom build/probe semantics and the bloom-decontamination exactness
  * contract (flagBloom ≡ flag on any input). */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("no false negatives; false-positive rate near the target") {
    val members = (0 until 2000).map(i => s"member_$i")
    val bf = members.toDF("v")
      .agg(BloomOps.bloomAgg(col("v"), expectedItems = 2000, fpp = 0.01))
      .head().getAs[Array[Byte]](0)
    assert(bf != null)

    val probeIn = members.toDF("v")
      .where(BloomOps.mightContain(bf, col("v"))).count()
    assert(probeIn === 2000L, "bloom filters must never have false negatives")

    val outsiders = (0 until 10000).map(i => s"outsider_$i")
    val fp = outsiders.toDF("v")
      .where(BloomOps.mightContain(bf, col("v"))).count()
    // target 1%; allow generous slack for hash variance
    assert(fp < 500L, s"false-positive count $fp way above the 1% target")
  }

  test("null/empty build side matches nothing") {
    assert(BloomOps.mightContain(null, col("v")) != null)
    val kept = Seq("a", "b").toDF("v")
      .where(BloomOps.mightContain(null, col("v"))).count()
    assert(kept === 0L)
  }

  test("optimalNumBits grows with items and shrinks with fpp") {
    assert(BloomOps.optimalNumBits(1000, 0.01) > BloomOps.optimalNumBits(100, 0.01))
    assert(BloomOps.optimalNumBits(1000, 0.001) > BloomOps.optimalNumBits(1000, 0.1))
    intercept[IllegalArgumentException](BloomOps.optimalNumBits(0, 0.01))
    intercept[IllegalArgumentException](BloomOps.optimalNumBits(10, 1.0))
  }

  test("flagBloom output is identical to flag") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely original writing about distributed engines"),
      (3L, "short text"),                    // < n tokens → whole-text shingle
      (4L, "the quick brown fox jumps again and again and again")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "short text")
    ).toDF("doc_id", "text")

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq

    val exact = Decontaminate.flag(train, bench, col("doc_id"), col("text"))
    val bloom = Decontaminate.flagBloom(train, bench, col("doc_id"), col("text"),
      expectedBenchGrams = 1024, fpp = 0.01)
    assert(norm(bloom) === norm(exact))
    // sanity on content, not just agreement
    val flags = bloom.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("contaminated")).toMap
    assert(flags(1L) === 1)
    assert(flags(2L) === 0)
    assert(flags(3L) === 1)
  }

  test("exactAgainstExistingBloom is identical to the exact path") {
    import graft.dedup.Dedup
    val existing = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"), (5L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma"),   // dup of min-id 1
      (11L, "brand new content"),  // new
      (12L, "delta epsilon"))      // dup of 2
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val exact = Dedup.exactAgainstExisting(batch, existing,
      col("doc_id"), col("text"))
    val bloom = Dedup.exactAgainstExistingBloom(batch, existing,
      col("doc_id"), col("text"), expectedBatchDocs = 64)
    assert(norm(bloom) === norm(exact))
    val m = bloom.collect().map(r => r.getAs[Long]("doc_id") ->
      Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong)).toMap
    assert(m(10L) === Some(1L))
    assert(m(11L) === None)
    assert(m(12L) === Some(2L))
  }

  test("flagBloom with an empty benchmark flags nothing") {
    val train = Seq((1L, "some training text here")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Decontaminate.flagBloom(train, bench, col("doc_id"), col("text"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_hits") === 0L)
    assert(out.head.getAs[Int]("contaminated") === 0)
  }
}
