package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** BPE train + encode: the merge loop against hand-computed examples,
  * the encode kernel's greedy-lowest-rank semantics, code-point (not
  * UTF-16 unit) splitting, the megaword guard, and the invariants the
  * bpe_encode gate pins (lossless roundtrip, count bounds). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("training merges the most frequent pair and stops when none repeats") {
    val docs = Seq("ab ab ab", "abc").toDF("text")
    // word counts: ab->3, abc->1; pair (a,b) appears 4x, (b,c) 1x.
    // After merging (a,b), the only remaining pair (ab,c) has count 1 —
    // memorizing a singleton word teaches nothing, so training stops.
    val merges = TextOps.trainBpeMerges(docs, col("text"), numMerges = 10)
    assert(merges === Seq(("a", "b")))
  }

  test("training ties break on the lexicographically smallest pair") {
    val docs = Seq("xy xy za za").toDF("text")
    // (x,y) and (z,a) both count 2 — (x,y) < (z,a) lexicographically
    val merges = TextOps.trainBpeMerges(docs, col("text"), numMerges = 1)
    assert(merges === Seq(("x", "y")))
  }

  test("encode applies merges greedily by rank and is lossless") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val got = Seq("abc ab ba abab cab").toDF("text")
      .select(TextOps.bpeTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    // abc -> ab+c -> abc; ab -> ab; ba unmerged; abab -> ab,ab;
    // cab -> c,ab (the (a,b) merge applies anywhere in the word)
    assert(got === Seq("abc", "ab", "b", "a", "ab", "ab", "c", "ab"))
  }

  test("encode splits by code points, not UTF-16 units") {
    // U+1F600 is a surrogate pair in UTF-16 — two of them must yield
    // two tokens, not four broken halves. normalized() strips emoji,
    // so exercise the expression directly on a raw token array.
    val got = Seq(Seq("😀😀")).toDF("toks")
      .select(graft.ops.TextExprs.bpeEncode(col("toks"), Nil).as("t"))
      .head().getSeq[String](0)
    assert(got === Seq("😀", "😀"))
  }

  test("megawords skip the merge search but stay lossless") {
    val merges = Seq(("a", "a"))
    val mega = "a" * (graft.ops.TextKernels.MaxBpeWord + 1)
    val rows = Seq(("aa " + mega)).toDF("text")
      .select(TextOps.bpeTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    // the short word merges; the megaword stays bare code points
    assert(rows.head === "aa")
    assert(rows.drop(1).forall(_ === "a"))
    assert(rows.drop(1).length === mega.length)
  }

  test("zero merges equal the per-token character count") {
    val docs = Seq("hello world", "a bc def", "").toDF("text")
    val got = docs.select(
        TextOps.bpeTokenCount(col("text"), Nil).as("n"),
        size(TextOps.tokens(TextOps.normalized(col("text")))).as("w"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got === Array((10, 2), (6, 3), (0, 0)))
  }

  test("training is deterministic and encode respects duplicate ranks") {
    val docs = Seq("the quick brown fox", "the lazy dog", "the end")
      .toDF("text")
    val m1 = TextOps.trainBpeMerges(docs, col("text"), numMerges = 20)
    val m2 = TextOps.trainBpeMerges(docs, col("text"), numMerges = 20)
    assert(m1 === m2)
    assert(m1.nonEmpty)
    // a duplicated pair keeps its FIRST (lowest) rank — same output
    val dup = m1 ++ m1
    val a = docs.select(TextOps.bpeTokens(col("text"), m1).as("t"))
      .collect().map(_.getSeq[String](0))
    val b = docs.select(TextOps.bpeTokens(col("text"), dup).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(a === b)
  }

  test("persisted merge artifact: rank-exact roundtrip, retrain " +
      "commits the next generation, crashed writes stay invisible") {
    val docs = Seq("the quick brown fox", "the lazy dog", "the end")
      .toDF("text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_store").toString + "/bpe"
    val m1 = TextOps.trainBpeMerges(docs, col("text"), numMerges = 20)
    TextOps.saveBpeMerges(spark, m1, path)
    assert(TextOps.loadBpeMerges(spark, path) === m1)
    // retrain (different target vocab) replaces the CURRENT table via
    // a new generation; the previous stays on disk per GenState
    val m2 = TextOps.trainBpeMerges(docs, col("text"), numMerges = 5)
    TextOps.saveBpeMerges(spark, m2, path)
    assert(TextOps.loadBpeMerges(spark, path) === m2)
    assert(graft.core.GenState.health(spark, path).currentGen
      .exists(_ >= 2L))
    // a crashed write (generation dir without _SUCCESS) never shadows
    // the shipped artifact
    val (fs0, root) = graft.core.DeltaLog.fsRoot(spark, path)
    val orphan = new org.apache.hadoop.fs.Path(root,
      "gen-" + "%016d".format(99L))
    fs0.mkdirs(orphan)
    assert(TextOps.loadBpeMerges(spark, path) === m2)
    // invalid pairs are rejected before anything touches storage
    intercept[IllegalArgumentException] {
      TextOps.saveBpeMerges(spark, Seq(("a", "")), path)
    }
    assert(TextOps.loadBpeMerges(spark, path) === m2)
  }
}
