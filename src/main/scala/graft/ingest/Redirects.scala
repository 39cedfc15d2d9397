package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.HtmlExprs

/** HTTP redirect-chain resolution — mapping every 3xx source URL to
  * the final URL a compliant client lands on, so crawl dedup and link
  * graphs key on the page that actually served content. Crawl corpora
  * are full of multi-hop chains (http→https→canonical-host→path) and
  * the occasional misconfigured LOOP; both must resolve bounded.
  *
  * Input: one row per redirect (source URL, target — the `Location`
  * [[Warc.recordTable]] surfaces, made absolute with
  * [[HtmlExprs.urlResolve]] against the record's own URI). Both sides
  * normalize through [[HtmlExprs.urlNormalize]] so chains connect
  * across spelling variants; self-loops after normalization drop (a
  * canonical-form "redirect" to itself is a no-op, not a hop). When a
  * source URL carries multiple targets (re-crawled with a changed
  * redirect), the minimum target wins — deterministic under any
  * shuffle order.
  *
  * Resolution is POINTER DOUBLING, not hop-at-a-time iteration: round
  * k composes the map with itself, so chains of length ≤ 2^k resolve
  * after k self-joins — ⌈log₂ maxHops⌉ shuffles total, the
  * large-star/small-star argument that keeps a deep chain from
  * costing a shuffle per hop at corpus scale. A source is DONE when
  * its current target has no outgoing edge (the target is a real
  * page). Cycles never finish and fall out of the hop bound — no
  * path-set bookkeeping, bounded state per row.
  *
  * @return one row per distinct redirect SOURCE:
  *         (url, final_url, hops, terminal) — `terminal=false` (null
  *         final/hops) for cycles and chains longer than `maxHops`. */
object Redirects {

  def resolveChains(redirects: DataFrame, src: Column, dst: Column,
                    maxHops: Int = 32): DataFrame = {
    require(maxHops >= 1 && maxHops <= 4096, "maxHops in [1, 4096]")
    var m = redirects
      .select(HtmlExprs.urlNormalize(src).as("u"),
        HtmlExprs.urlNormalize(dst).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .groupBy(col("u")).agg(min(col("v")).as("v"))
      .select(col("u"), col("v"), lit(1L).as("steps"), lit(false).as("done"))
      .localCheckpoint(true) // self-joined every round: root the lineage
    // after r rounds, chains of length ≤ 2^(r-1) are MARKED done (the
    // no-outgoing-edge discovery costs one extra composition beyond
    // reaching the end), so r = ceil(log₂ maxHops) + 1 rounds suffice
    val rounds = 1 + (if (maxHops <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(maxHops - 1L).toInt)
    var round = 0
    while (round < rounds) {
      // compose m with itself: a row's target becomes its target's
      // target (steps add) unless the row is already done or its
      // target has no entry (→ the target is terminal: done)
      val b = m.select(col("u").as("bu"), col("v").as("bv"),
        col("steps").as("bsteps"), col("done").as("bdone"))
      m = m.as("a")
        .join(b.hint("shuffle_hash"), col("a.v") === col("bu"), "left")
        .select(col("a.u").as("u"),
          when(col("a.done") || col("bu").isNull, col("a.v"))
            .otherwise(col("bv")).as("v"),
          when(col("a.done") || col("bu").isNull, col("a.steps"))
            .otherwise(col("a.steps") + col("bsteps")).as("steps"),
          (col("a.done") || col("bu").isNull || col("bdone")).as("done"))
        .localCheckpoint(true)
      round += 1
    }
    m.select(col("u").as("url"),
      when(col("done") && col("steps") <= maxHops, col("v")).as("final_url"),
      when(col("done") && col("steps") <= maxHops, col("steps")).as("hops"),
      (col("done") && col("steps") <= maxHops).as("terminal"))
  }
}
