package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Binning, BudgetSelect}

/** Scale-proportionality stress for the refinement family (budget
  * state, curriculum bins, top-m, exact quantiles): replicate the
  * sf0.1 documents corpus R× with shifted unique ids — the same text
  * distribution, so quality LEVELS become R× hotter while the level
  * COUNT stays constant — and check that
  *
  *  1. outputs stay exact (each family has a replication-invariant
  *     property that needs no external oracle), and
  *  2. wall time grows ~linearly in R, never quadratically (the
  *     histogram/refinement state is corpus-size-independent, so the
  *     only R-proportional cost is the corpus passes themselves).
  *
  * OPT-IN like [[StressProportionalitySpec]]: heavy by design, runs
  * under `sbt -Dgraft.stress=1 test` / GRAFT_STRESS=1; prints its
  * timings so a probe run can be recorded in BASELINE.md.
  */
class StressRefinementSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def optedIn: Boolean =
    sys.props.get("graft.stress").contains("1") ||
      sys.env.get("GRAFT_STRESS").contains("1")

  private val sfDir = "/root/testdata/sf0.1"

  /** The scored frame every budget gate uses, replicated `r`× with
    * disjoint id ranges (ids stay unique; levels get r× hotter). */
  private def scoredTimes(r: Int) = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        round(graft.text.TextOps.qualityStruct(col("text"))
          .getField("alpha_ratio") * 1e6, 0).cast("long").as("q_ppm"),
        graft.text.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    (0 until r).map(i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
          col("q_ppm"), col("n_tokens")))
      .reduce(_.unionByName(_))
  }

  private def timed[T](what: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"[stress] $what: $sec%.2f s")
    println(f"[stress] $what: $sec%.2f s")
    (r, sec)
  }

  test("budget state fold + selection scale linearly and stay exact") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    def run(r: Int): Double = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_stress_bs$r")
      val path = dir.resolve("state").toString
      val df = scoredTimes(r).localCheckpoint(true) // isolate op cost from replication cost
      val (_, sec) = timed(s"budget_incremental x$r") {
        BudgetSelect.writeBudgetState(df.where(col("doc_id") % 3 =!= 0),
          col("doc_id"), col("q_ppm"), col("n_tokens"), path)
        BudgetSelect.appendBudgetState(df.where(col("doc_id") % 3 === 0),
          col("doc_id"), col("q_ppm"), col("n_tokens"), path)
        val total = BudgetSelect.readBudgetState(spark, path)
          .agg(sum(col("total_cost"))).head().getLong(0)
        // state totals must equal the corpus's own at every scale
        assert(total === df.agg(sum(col("n_tokens"))).head().getLong(0))
        val kept = BudgetSelect.budgetSelectFromState(df, col("doc_id"),
          col("q_ppm"), col("n_tokens"), total / 4, path)
        val kc = kept.agg(sum(col("n_tokens")).as("c"), count(lit(1))).head()
        assert(kc.getLong(0) <= total / 4, "cutoff must respect the budget")
        assert(kc.getLong(1) > 0)
      }
      df.unpersist()
      sec
    }
    val s1 = run(1)
    val s10 = run(10)
    // linear-ish: a quadratic fold/selection would be ~100×
    assert(s10 < s1 * 30,
      f"10x corpus took ${s10 / s1}%.1fx the 1x time — super-linear drift")
  }

  test("curriculum bins scale linearly with exact rank-proportional sizes") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    val k = 10
    def run(r: Int): Double = {
      val df = scoredTimes(r).localCheckpoint(true)
      val n = df.count()
      val (_, sec) = timed(s"curriculum_bins x$r") {
        // ids tie-break within hot levels, so boundaries land INSIDE
        // levels — the refinement-heavy shape
        val sizes = Binning.quantileBins(df, col("doc_id"), col("q_ppm"), k)
          .groupBy(col("bin")).count().collect()
          .map(row => row.getInt(0) -> row.getLong(1)).toMap
        // the floor map's exact property: every bin holds floor(n/k) or
        // ceil(n/k) rows and all k bins exist
        assert(sizes.keySet === (1 to k).toSet)
        assert(sizes.values.sum === n)
        val (lo, hi) = (n / k, n / k + (if (n % k == 0) 0 else 1))
        assert(sizes.values.forall(s => s == lo || s == hi),
          s"bin sizes $sizes not rank-proportional for n=$n k=$k")
      }
      df.unpersist()
      sec
    }
    val s1 = run(1)
    val s10 = run(10)
    assert(s10 < s1 * 30,
      f"10x corpus took ${s10 / s1}%.1fx the 1x time — super-linear drift")
  }

  test("top-m stays exact at scale: kept floor dominates dropped ceiling") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    def run(r: Int): Double = {
      val df = scoredTimes(r).localCheckpoint(true)
      val n = df.count()
      val m = (n * 37) / 100
      val (_, sec) = timed(s"corpus_top_m x$r") {
        val kept = BudgetSelect.takeTop(df, col("doc_id"), col("q_ppm"), m)
          .localCheckpoint(true)
        assert(kept.count() === m)
        // prefix coherence without an oracle: the worst kept (q, -id)
        // must outrank the best dropped (q, -id) in the selection order
        val worstKept = kept.orderBy(col("q_ppm").asc, col("doc_id").desc)
          .select(col("q_ppm"), col("doc_id")).head()
        val dropped = df.join(kept.select(col("doc_id")), Seq("doc_id"),
          "left_anti")
        val bestDropped = dropped.orderBy(col("q_ppm").desc, col("doc_id").asc)
          .select(col("q_ppm"), col("doc_id")).head()
        val ok = worstKept.getLong(0) > bestDropped.getLong(0) ||
          (worstKept.getLong(0) == bestDropped.getLong(0) &&
            worstKept.getLong(1) < bestDropped.getLong(1))
        assert(ok, s"kept/dropped boundary out of order: " +
          s"worstKept=$worstKept bestDropped=$bestDropped")
        kept.unpersist()
      }
      df.unpersist()
      sec
    }
    val s1 = run(1)
    val s10 = run(10)
    assert(s10 < s1 * 30,
      f"10x corpus took ${s10 / s1}%.1fx the 1x time — super-linear drift")
  }

  test("exact quantiles are replication-invariant and scale linearly") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    // dyadic ps: p*n is computed exactly in double at every scale, so
    // the replication-invariance check cannot trip on a ceil-boundary
    // rounding difference between n and 10n
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.875, 1.0)
    def run(r: Int): (Map[Double, Long], Double) = {
      val df = scoredTimes(r).localCheckpoint(true)
      val (q, sec) = timed(s"exact_quantiles x$r") {
        graft.meta.PipelineMetrics.exactQuantiles(df, col("n_tokens"), ps)
          .collect().map(row => row.getDouble(0) -> row.getLong(1)).toMap
      }
      df.unpersist()
      (q, sec)
    }
    val (q1, s1) = run(1)
    val (q10, s10) = run(10)
    // replicating every value 10x leaves every quantile level unchanged
    // (quantile_disc rank math maps r*ceil→ceil within the same level)
    assert(q1 === q10, "replication must not move discrete quantiles")
    assert(s10 < s1 * 30,
      f"10x corpus took ${s10 / s1}%.1fx the 1x time — super-linear drift")
  }
}
