package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.Decontaminate

/** Benchmark decontamination + incremental cross-corpus dedup: the
  * pre-serialization guards of a training-data pipeline. */
class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("decontaminate flags docs sharing long n-grams with the benchmark") {
    val bench = mkDocs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "einstein field equations couple curvature to energy momentum")))
    val train = mkDocs(Seq(
      // contains a full benchmark sentence inside unrelated text
      (10L, "intro text the quick brown fox jumps over the lazy dog outro text"),
      // shares only a 3-gram, below the 5-gram window
      (11L, "the quick brown cat sleeps all day long in the sun"),
      // no overlap at all
      (12L, "completely unrelated content about cooking pasta with garlic")))
    val out = Decontaminate.flag(train, bench, col("doc_id"), col("text"), n = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Int]("contaminated"))).toMap
    assert(out(10L)._2 === 1)
    assert(out(10L)._1 >= 5) // sliding 5-grams of the embedded sentence
    assert(out(11L) === ((0L, 0)))
    assert(out(12L) === ((0L, 0)))

    val kept = Decontaminate.clean(train, bench, col("doc_id"), col("text"), n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L, 12L))
  }

  test("empty-normalizing benchmark rows contaminate nothing") {
    // "---" and "???" both normalize to zero tokens and shingle to the
    // degenerate "" gram (deliberate in Dedup.shingles so empty docs can
    // near-dup-match each other) — but sharing NO actual text must not
    // count as contamination, or clean() would silently drop every
    // pure-punctuation training doc
    val bench = mkDocs(Seq((1L, "---"), (2L, "N/A")))
    val train = mkDocs(Seq((10L, "???"), (11L, "real prose about real things")))
    for (flagged <- Seq(
        Decontaminate.flag(train, bench, col("doc_id"), col("text"), n = 5),
        Decontaminate.flagBloom(train, bench, col("doc_id"), col("text"),
          n = 5, expectedBenchGrams = 64))) {
      val out = flagged.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("contaminated")).toMap
      assert(out(10L) === 0)
      assert(out(11L) === 0)
    }
  }

  test("short exact copies of benchmark items are caught via whole-doc shingles") {
    val bench = mkDocs(Seq((1L, "two words")))
    val train = mkDocs(Seq((10L, "two words"), (11L, "other words")))
    val out = Decontaminate.flag(train, bench, col("doc_id"), col("text"), n = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("contaminated")).toMap
    assert(out(10L) === 1)
    assert(out(11L) === 0)
  }

  test("exact incremental dedup annotates batch docs against the standing corpus") {
    val existing = mkDocs(Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "alpha beta gamma"))) // internal dup: min id 1 wins
    val batch = mkDocs(Seq(
      (100L, "alpha beta gamma"),   // dup of existing 1
      (101L, "brand new content")))
    val out = Dedup.exactAgainstExisting(batch, existing, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Long]("dup_of")), r.getAs[Int]("is_new"))).toMap
    assert(out(100L) === ((Some(java.lang.Long.valueOf(1L)), 0)))
    assert(out(101L) === ((None, 1)))
  }

  test("cross-corpus minhash finds planted near-dups and only cross-side pairs") {
    val base = (1 to 60).map(j => s"token$j").mkString(" ")
    val existing = mkDocs(
      (0L, base) +: (1 to 20).map(i =>
        (i.toLong, (1 to 60).map(j => s"e${i}w$j").mkString(" "))))
    val batch = mkDocs(Seq(
      // near-dup of existing doc 0 (one token edited out of 60)
      (100L, base.replace("token7", "edited")),
      (101L, (1 to 60).map(j => s"b1w$j").mkString(" ")),
      // near-dup WITHIN the batch — must NOT be reported (cross-side only)
      (102L, (1 to 60).map(j => if (j == 3) "x" else s"b1w$j").mkString(" "))))
    val pairs = Dedup.minhashPairsAcross(batch, existing,
        col("doc_id"), col("text"), k = 24, bands = 8, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((100L, 0L)), s"planted cross pair missing: $pairs")
    assert(pairs.forall { case (a, b) => a >= 100L && b < 100L },
      s"only batch x existing pairs allowed: $pairs")
  }

  test("cross-corpus minhash survives a doc_id shared by both sides") {
    // nothing requires disjoint id spaces: batch doc 5 must verify with
    // ITS OWN shingles, not the existing doc 5's — the shared-payload
    // form attached both and emitted conflicting jaccard rows
    val base = (1 to 60).map(j => s"token$j").mkString(" ")
    val existing = mkDocs(Seq(
      (1L, base),
      (5L, (1 to 60).map(j => s"other$j").mkString(" "))))
    val batch = mkDocs(Seq((5L, base.replace("token7", "edited"))))
    val rows = Dedup.minhashPairsAcross(batch, existing,
        col("doc_id"), col("text"), k = 24, bands = 8, threshold = 0.8)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard")))
    // exactly one row: batch 5 ≈ existing 1; no duplicate/conflicting
    // rows, and no self-pair against existing doc 5
    assert(rows.map(_._1).toSeq === Seq((5L, 1L)), rows.mkString(", "))
    assert(rows.head._2 > 0.9)
  }

  test("null-text docs match null-text corpus docs (null-safe hash join)") {
    val existing = mkDocs(Seq((1L, "real text"),
      (3L, null.asInstanceOf[String])))
    val batch = mkDocs(Seq((100L, null.asInstanceOf[String]),
      (101L, "real text")))
    for (out <- Seq(
        Dedup.exactAgainstExisting(batch, existing, col("doc_id"), col("text")),
        Dedup.exactAgainstExistingBloom(batch, existing, col("doc_id"),
          col("text"), expectedBatchDocs = 64))) {
      val m = out.collect().map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Long]("dup_of")), r.getAs[Int]("is_new"))).toMap
      assert(m(100L) === ((Some(java.lang.Long.valueOf(3L)), 0)),
        "null text must dup against the standing null-text doc")
      assert(m(101L) === ((Some(java.lang.Long.valueOf(1L)), 0)))
    }
  }
}
