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

  /** @param edges (src, dst) string keys — self-loops allowed
    * @return (node: string, rank_ppb: long) over every node that
    *         appears as a src or dst */
  def pageRankFixedPoint(edges: DataFrame, src: Column, dst: Column,
                         iters: Int = 3): DataFrame = {
    require(iters >= 0 && iters <= 64, "iters in [0, 64]")
    val e = edges.select(src.cast("string").as("src"),
        dst.cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true) // consumed 2 + iters times below
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank_ppb", lit(0L))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("out"))
    var ranks = nodes.select(col("node"), lit(R / n).as("rank_ppb"))
    val base = (3L * R) / (20L * n)
    for (_ <- 0 until iters) {
      // `div`, never `/`: Spark's `/` is DOUBLE division even on longs,
      // and the whole point is an integer recurrence both engines
      // replay bit-exactly
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          expr("rank_ppb div out").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(17 * coalesce(s, 0L)) div 20"))
            .cast("long").as("rank_ppb"))
        .localCheckpoint(true)
    }
    ranks
  }
}
