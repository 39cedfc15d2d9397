package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-derived training signals. [[anchorsPerTarget]] builds the
  * query-document pair table retrieval training wants: for every
  * canonical TARGET URL, the sorted distinct anchor strings the web
  * uses to describe it, with occurrence counts — anchors are queries,
  * the target's document is the answer.
  *
  * Composition: [[HtmlKernels.hrefTexts]] (pairs out of the page
  * markup) × [[UrlKernels.resolveUrl]] (relative hrefs against the
  * linking page's URL) × [[UrlKernels.normalizeUrl]] (spelling
  * variants collapse onto one target key) × pack.
  *
  * Plan shape — ONE shuffle end to end (default): the exploded pair
  * stream repartitions by `target_url` once, and BOTH aggregations
  * (per (target, anchor) counts, then the per-target pack) reuse that
  * partitioning — HashPartitioning(target) satisfies the clustered
  * distribution of the refining (target, anchor) grouping, so
  * EnsureRequirements inserts no further exchange. Anchor text is
  * near-unique per (page, target), so on typical link graphs the
  * single shuffle wins.
  *
  * `singleShuffle = false` is the SKEW escape hatch: a viral target
  * (a homepage linked with the same anchor from everywhere) funnels
  * its whole stream into one task under the repartition form, with no
  * map-side combine to shrink it. The two-shuffle form groups by
  * (target, anchor) first — partial aggregation collapses the hot
  * (target, identical-anchor) mass BEFORE the wire — then re-shuffles
  * the already-tiny per-anchor counts by target. Output-identical
  * (spec-pinned); pick by corpus shape.
  *
  * Hrefless anchors and whitespace-only anchor texts drop; a target
  * that resolves to nothing (relative href on an unparseable page
  * URL) drops — it can never join back to a document. */
object LinkSignals {

  def anchorsPerTarget(pages: DataFrame, pageUrl: Column, html: Column,
                       singleShuffle: Boolean = true): DataFrame = {
    val pairs = pages
      .select(pageUrl.as("__page"),
        explode(HtmlExprs.hrefTexts(html)).as("p"))
      .select(
        HtmlExprs.urlNormalize(HtmlExprs.urlResolve(
          col("__page"), col("p.href"))).as("target_url"),
        col("p.anchor_text").as("anchor"))
      .where(col("target_url").isNotNull &&
        length(trim(col("anchor"))) > 0)
    val counted =
      if (singleShuffle)
        pairs.repartition(col("target_url"))
          .groupBy(col("target_url"), col("anchor"))
          .agg(count(lit(1)).as("n"))
      else
        pairs.groupBy(col("target_url"), col("anchor"))
          .agg(count(lit(1)).as("n"))
    counted
      .groupBy(col("target_url"))
      .agg(sum(col("n")).as("n_links"),
        count(lit(1)).as("n_anchors"),
        array_sort(collect_list(struct(col("anchor"), col("n"))))
          .as("anchors"))
  }
}
