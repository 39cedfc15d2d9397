package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators for crawl curation. PageRank-class centrality
  * is the classic page-quality PRIOR (harmonic/rank centralities ship
  * with Common Crawl's host graph); a curation pipeline uses it to
  * weight domains before sampling.
  *
  * The recurrence here is FIXED-POINT INTEGER PageRank: ranks are
  * parts-per-billion longs, every division floors, so the result is
  * bit-exact regardless of shuffle/summation order (long sums are
  * associative-commutative — no fp drift class at all) and a SQL
  * oracle can replay the exact recurrence:
  *
  *   r₀(v)  = R / N                         (R = 10⁹)
  *   rₖ₊₁(v) = (3·R)/(20·N) + (17·S(v))/20  (damping 17/20 = 0.85)
  *   S(v)   = Σ over in-edges (u,v) of  rₖ(u) / out(u)
  *
  * Floor-division discipline: mass lost to floors (and to dangling
  * nodes, whose rank simply doesn't redistribute) is NOT recycled —
  * this is a deterministic quality PRIOR, not a probability vector,
  * and the floors cost at most a few ppb per node per iteration.
  *
  * Scale shape: nodes/ranks/outdeg are slim (node, long) frames; each
  * iteration is one join on the edge list + one aggregation on dst
  * (map-side combined), localCheckpointed so iteration k+1 starts from
  * materialized ranks instead of replaying the whole lineage. Edge
  * multiplicity counts (parallel edges contribute twice) — dedup
  * upstream if that is not wanted.
  */
object GraphOps {

  val R: Long = 1000000000L // total initial mass, parts-per-billion

  /** One completed run: the final ranks, how many iterations actually
    * executed, and (when the convergence pass was enabled) the integer
    * L1 delta Σ|rₖ₊₁ − rₖ| after each executed iteration — the signal
    * that lets a caller stop a 30-iteration budget at iteration 9. */
  final case class PageRankRun(ranks: DataFrame, itersRun: Int,
                               l1DeltasPpb: Seq[Long])

  /** @param edges (src, dst) string keys — self-loops allowed
    * @return (node: string, rank_ppb: long) over every node that
    *         appears as a src or dst */
  def pageRankFixedPoint(edges: DataFrame, src: Column, dst: Column,
                         iters: Int = 3): DataFrame =
    pageRankRun(edges, src, dst, iters).ranks

  /** The full-control form: optional CONVERGENCE tracking and optional
    * RELIABLE persistence, both off by default (then this is exactly
    * the fixed-iteration recurrence [[pageRankFixedPoint]] exposes).
    *
    *  - `tolPpb >= 0` enables the integer L1-delta pass: after each
    *    iteration Σ|rₖ₊₁ − rₖ| is computed (one slim self-join + sum —
    *    an extra action per iteration, which is why it is opt-in) and
    *    the loop STOPS EARLY once delta ≤ tolPpb. tolPpb = 0 stops at
    *    an exact fixed point, which is result-identical to running the
    *    remaining iterations (the recurrence is deterministic).
    *  - `stateDir` switches iteration persistence from localCheckpoint
    *    (fast, but an executor loss restarts the whole operator —
    *    acceptable at 3 iterations, painful at 30) to PARQUET under
    *    `stateDir/iter-%04d`: each completed iteration commits with a
    *    `_SUCCESS` marker and the next reads from storage, so recovery
    *    and RESUME replay at most one iteration. A rerun over the same
    *    stateDir reuses every marked iteration (bit-exact — the
    *    recurrence is integer); an unmarked partial dir from a crashed
    *    write is overwritten. Callers own the dir lifecycle (pass a
    *    fresh dir for a fresh graph).
    */
  def pageRankRun(edges: DataFrame, src: Column, dst: Column,
                  iters: Int = 3, tolPpb: Long = -1L,
                  stateDir: Option[String] = None): PageRankRun = {
    require(iters >= 0 && iters <= 64, "iters in [0, 64]")
    val spark = edges.sparkSession
    val e = edges.select(src.cast("string").as("src"),
        dst.cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true) // consumed 2 + iters times below
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0)
      return PageRankRun(nodes.withColumn("rank_ppb", lit(0L)), 0, Nil)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("out"))
    val base = (3L * R) / (20L * n)

    val fs = stateDir.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    }
    def iterPath(k: Int) =
      new org.apache.hadoop.fs.Path(stateDir.get, f"iter-$k%04d")
    def committed(k: Int): Boolean = fs.exists { f =>
      val p = iterPath(k)
      f.exists(p) && f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    }
    /** Materialize an iteration's ranks: parquet generation in
      * reliable mode (read back so lineage roots in storage),
      * localCheckpoint otherwise. */
    def persist(df: DataFrame, k: Int): DataFrame = stateDir match {
      case None => df.localCheckpoint(true)
      case Some(_) =>
        val p = iterPath(k)
        // a dir without _SUCCESS is a crashed write — overwrite it
        df.write.mode("overwrite").parquet(p.toString)
        spark.read.parquet(p.toString)
    }

    var ranks = nodes.select(col("node"), lit(R / n).as("rank_ppb"))
    val deltas = Seq.newBuilder[Long]
    var itersRun = 0
    var k = 1
    var stop = iters == 0
    while (!stop) {
      val prev = ranks
      ranks =
        if (committed(k)) spark.read.parquet(iterPath(k).toString) // resume
        else {
          // `div`, never `/`: Spark's `/` is DOUBLE division even on
          // longs, and the whole point is an integer recurrence both
          // engines replay bit-exactly
          val contrib = e.join(prev, e("src") === prev("node"))
            .join(outdeg, "src")
            .select(col("dst").as("node"),
              expr("rank_ppb div out").as("c"))
            .groupBy(col("node")).agg(sum(col("c")).as("s"))
          persist(nodes.join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit(base) + expr("(17 * coalesce(s, 0L)) div 20"))
                .cast("long").as("rank_ppb")), k)
        }
      itersRun += 1
      if (tolPpb >= 0L) {
        val d = ranks.as("a").join(prev.as("b"), Seq("node"))
          .agg(sum(abs(col("a.rank_ppb") - col("b.rank_ppb"))).as("d"))
          .head().getLong(0)
        deltas += d
        if (d <= tolPpb) stop = true
      }
      k += 1
      if (k > iters) stop = true
    }
    PageRankRun(ranks, itersRun, deltas.result())
  }
}
