package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TemporalOps.floorDivChunk

/** Token-budget corpus selection: keep the highest-quality documents
  * whose cumulative cost (tokens) fits a budget — the curation step that
  * turns "score every document" ([[TextOps]]) into "the best N tokens
  * for this training run".
  *
  * Semantics are the exact greedy prefix: order the corpus by
  * (quality DESC, id ASC) and keep every row whose INCLUSIVE running
  * cost sum is ≤ budget. Costs are non-negative, so the kept set is a
  * prefix of that order — the same answer as the obvious
  * `SUM(cost) OVER (ORDER BY quality DESC, id)` window, which is NOT how
  * it is computed:
  *
  * Scale shape (100 TB): a global running sum is a total-order sort plus
  * a single-task window — the canonical unscalable plan. Instead the
  * selection threshold is found by HISTOGRAM CUTOFF:
  *
  *  1. one aggregation keyed on the quality level (map-side combined;
  *     bounded by `maxQualityLevels` — the house ppm convention gives
  *     ≤ 1e6+1 levels) → the driver finds the boundary level q*: every
  *     level above it is kept whole, every level below dropped whole —
  *     a narrow filter, no sort;
  *  2. only the SINGLE boundary level needs row resolution. Its rows are
  *     id-chunked (floor-div on the id span, ≤ `fanout` occupied chunks),
  *     the per-chunk cost histogram picks the boundary CHUNK the same
  *     way, and the loop recurses into it — the span shrinks ×`fanout`
  *     per round, so ≤ ~6 rounds cover the full Long id range;
  *  3. when the unresolved remainder is ≤ `smallCap` rows it is resolved
  *     exactly with one running-sum window over that BOUNDED frame (the
  *     only window in the plan, single partition by construction ≤
  *     smallCap rows), and the kept ids come back as a broadcast-class
  *     semi-join side.
  *
  * Driver state is the level histogram (≤ maxQualityLevels slim rows —
  * manifest-class, tens of MB at the 1M-level worst case; quantize
  * coarser if that is too much) plus ≤ fanout chunk rows per round.
  * Nothing scales with corpus size.
  *
  * Preconditions (the [[Sampling.takePerGroup]] discipline):
  *  - `quality` is an INTEGRAL score (the ppm house convention —
  *    `round(x * 1e6)` a continuous score first); it is cast to long.
  *  - `cost` is integral and NON-NEGATIVE (token counts); negative costs
  *    break prefix monotonicity and throw.
  *  - `id` is integral and unique; ties on (quality, id) would make the
  *    boundary cut nondeterministic.
  *  - Rows with a null id, quality, or cost are DROPPED: a null has no
  *    place in a total order, and every engine orders/sums it
  *    differently — no coherent greedy semantics exists for them.
  *  - Computed quality/cost columns are re-evaluated by each of the
  *    (≤ ~8) passes here; materialize expensive scores first (the
  *    [[graft.similarity.Ann.cosineNearDupPairs]] note).
  */
object BudgetSelect {

  /** Keep the greedy quality-prefix of `df` whose cost sum fits
    * `budget`. Returns the kept rows with `df`'s columns unchanged (row
    * order unspecified, like any filter). */
  def budgetSelect(df: DataFrame, id: Column, quality: Column, cost: Column,
                   budget: Long, maxQualityLevels: Int = 1 << 20): DataFrame = {
    require(budget >= 0L, "budget must be >= 0")
    budgetSelectImpl(df, id, quality, cost, _ => budget, maxQualityLevels,
      fanout = 4096, smallCap = 1 << 16)
  }

  /** [[budgetSelect]] with the budget as a fraction of the corpus's own
    * total cost — "keep the best 25% of tokens". The budget is
    * `floor(fraction * total)` computed in double (exact below 2^53
    * total cost — every physical corpus; the DuckDB-oracle-portable
    * arithmetic), with the total read off the level histogram the
    * selection needs anyway — no extra corpus pass. */
  def budgetSelectFraction(df: DataFrame, id: Column, quality: Column,
                           cost: Column, fraction: Double,
                           maxQualityLevels: Int = 1 << 20): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    budgetSelectImpl(df, id, quality, cost,
      total => math.floor(fraction * total.toDouble).toLong,
      maxQualityLevels, fanout = 4096, smallCap = 1 << 16)
  }

  /** The null-drop contract, in one place for every pass. */
  private def liveRows(df: DataFrame, id: Column, quality: Column,
                       cost: Column): DataFrame =
    df.where(id.isNotNull && quality.isNotNull && cost.isNotNull)

  /** Test-seam form: `fanout` (id chunks per refinement round) and
    * `smallCap` (max rows the final window may see) shrink in the spec
    * to force deep refinement on a 200-row corpus. */
  private[graft] def budgetSelectImpl(df: DataFrame, id: Column,
                                      quality: Column, cost: Column,
                                      budget: Long, maxQualityLevels: Int,
                                      fanout: Int, smallCap: Int): DataFrame = {
    require(budget >= 0L, "budget must be >= 0")
    budgetSelectImpl(df, id, quality, cost, _ => budget, maxQualityLevels,
      fanout, smallCap)
  }

  /** Core: `budgetOfTotal` maps the corpus's total cost (read off the
    * level histogram — no extra pass) to the absolute budget, so the
    * fraction form shares every pass with the absolute form. */
  private def budgetSelectImpl(df: DataFrame, id: Column,
                               quality: Column, cost: Column,
                               budgetOfTotal: Long => Long,
                               maxQualityLevels: Int,
                               fanout: Int, smallCap: Int): DataFrame = {
    require(fanout >= 2, "fanout must be >= 2")
    require(smallCap >= 1, "smallCap must be >= 1")
    val idL = id.cast("long")
    val qL = quality.cast("long")
    val cL = cost.cast("long")
    val live = liveRows(df, id, quality, cost)

    // 1. quality-level histogram — the one corpus-wide aggregation. The
    // limit caps the COLLECT (and fails loudly past the cap) so a
    // continuous score passed by mistake cannot OOM the driver.
    val hist = live.groupBy(qL.as("__q"))
      .agg(sum(cL).as("__t"), min(cL).as("__mn"))
      .limit(maxQualityLevels + 1)
      .collect()
    require(hist.length <= maxQualityLevels,
      s"more than $maxQualityLevels distinct quality levels — quantize " +
        "the score (ppm convention) or raise maxQualityLevels")
    if (hist.isEmpty) return live // no selectable rows; empty result
    require(hist.forall(r => r.getLong(2) >= 0L),
      "negative cost values break greedy-prefix monotonicity")

    // 2. driver cutoff: levels sorted best-first (reverse Ordering, not
    // sortBy(-q) — negating Long.MinValue is itself); q* is the first
    // level the running total cannot swallow whole
    val levels = hist.map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)(Ordering[Long].reverse)
    val budget = budgetOfTotal(levels.map(_._2).sum)
    require(budget >= 0L, "budget must be >= 0")
    var acc = 0L
    var qStar = Option.empty[Long]
    var before = 0L
    levels.foreach { case (q, t) =>
      if (qStar.isEmpty && acc + t > budget) { qStar = Some(q); before = acc }
      acc += t
    }
    if (qStar.isEmpty) return live // the whole corpus fits the budget
    val qs = qStar.get

    // 3. refine the boundary level by id chunks until the remainder is
    // window-small. `kept` accumulates the fully-kept predicate;
    // `pending` pins the still-unresolved remainder. ONE driver action
    // per round: the chunk histogram carries (min, max, count) so the
    // chosen boundary chunk IS the next round's stats — only the first
    // round pays a separate stats pass.
    var kept: Column = qL > lit(qs)
    var pending: Column = qL === lit(qs)
    var remaining = budget - before
    var resolved = false
    var finalFrame: DataFrame = null
    var rounds = 0
    val stats0 = live.where(pending)
      .agg(min(idL).as("lo"), max(idL).as("hi"), count(lit(1)).as("n"))
      .head()
    var lo = if (stats0.isNullAt(0)) 0L else stats0.getLong(0)
    var hi = if (stats0.isNullAt(1)) 0L else stats0.getLong(1)
    var n = stats0.getLong(2)
    while (!resolved) {
      // unreachable with UNIQUE ids (spans shrink every round) — but a
      // violated precondition (e.g. fractional ids collapsing under the
      // long cast) parks >smallCap rows on ONE id, where width-1 chunks
      // stop shrinking; fail loudly instead of looping forever
      rounds += 1
      require(rounds <= 64, "refinement failed to converge — are the " +
        "ids unique? (duplicate or non-integral ids collapse chunks)")
      if (n <= smallCap) {
        // 4. exact running sum over the BOUNDED remainder — single
        // partition by construction (≤ smallCap rows), the only window
        // in the operator. (n == 0 cannot happen — q* guarantees
        // boundary rows — but falls through here harmlessly if it did.)
        val w = Window.orderBy(col("__bid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val keptIds = live.where(pending)
          .select(idL.as("__bid"), cL.as("__bc"))
          .withColumn("__cum", sum(col("__bc")).over(w))
          .where(col("__cum") <= lit(remaining))
          .select(col("__bid"))
        finalFrame = live.where(pending)
          .join(broadcast(keptIds), idL === col("__bid"), "left_semi")
        resolved = true
      } else {
        // chunk width from the BigInt span: ids may legitimately span
        // the full Long range, where hi - lo overflows. width < span
        // always (fanout ≥ 2, span ≥ n ≥ 2), and hi - lo ≥ width then
        // forces ≥ 2 occupied chunks — every round strictly shrinks the
        // pending span to ≤ width, so the loop provably terminates in
        // O(log_fanout(span)) rounds.
        val span = BigInt(hi) - BigInt(lo) + 1
        // the 2^62 clamp keeps width a positive Long even at the
        // full-2^64 span with a tiny fanout (ceil(2^64 / 2) overflows);
        // clamped rounds still cut the span ≥ 4× — the bound only
        // rises from log_fanout to log_4 for the first round or two
        val width = ((span + fanout - 1) / fanout).max(1)
          .min(BigInt(Long.MaxValue / 2)).toLong
        val chunk = floorDivChunk(idL, width)
        val chunks = live.where(pending)
          .groupBy(chunk.as("__c")).agg(sum(cL).as("__t"),
            min(idL).as("__lo"), max(idL).as("__hi"), count(lit(1)).as("__n"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4)))
          .sortBy(_._1)
        // the boundary chunk exists: the pending cost exceeds
        // `remaining` by the q*/c* invariant carried down the loop
        var cacc = 0L
        var cStar = Option.empty[(Long, Long, Long, Long)]
        var cbefore = 0L
        chunks.foreach { case (c, t, clo, chi, cn) =>
          if (cStar.isEmpty && cacc + t > remaining) {
            cStar = Some((c, clo, chi, cn)); cbefore = cacc
          }
          cacc += t
        }
        val (cs, clo, chi, cn) = cStar.get
        kept = kept || (pending && chunk < lit(cs))
        pending = pending && chunk === lit(cs)
        remaining -= cbefore
        lo = clo; hi = chi; n = cn
      }
    }
    live.where(kept).unionByName(finalFrame)
  }

  // ── Per-group budgets ──────────────────────────────────────────────

  /** [[budgetSelect]] with a SEPARATE budget per group — the
    * mixture-spec curation step ("web gets 500 B tokens, code 200 B,
    * …"): within every group, keep the greedy (quality DESC, id ASC)
    * prefix whose cost fits that group's budget. Rows whose group is
    * not in `budgets` are dropped (the [[Sampling.mixBySource]]
    * rate-0 default); the group column is compared as a string.
    *
    * Same histogram-cutoff scale shape as the ungrouped form, run for
    * ALL groups in parallel: ONE (group, level) histogram pass finds
    * every group's boundary level on the driver; the boundary rows of
    * every still-unresolved group then refine TOGETHER — each round is
    * one aggregation over the single slim pending frame, with
    * per-group chunk widths riding a broadcast choices frame, so the
    * round count is the WORST group's O(log_fanout(idspan)), not the
    * sum. Groups whose remainder fits `smallCap` rows drop out into
    * one final bounded per-group window. Driver state: the level
    * histogram (`maxHistRows` cap across all groups) + `fanout` rows
    * per group per round + the budget map itself — all independent of
    * corpus size. `budgets` must be driver-small (a mixture spec is
    * dozens of entries, not millions).
    *
    * Boundary rows carry their full row struct through the (≤ ~6)
    * refinement checkpoints, so kept slices return directly without a
    * corpus-scale join-back; the checkpoints stay referenced by the
    * result and are reclaimed when the caller drops it (the
    * [[graft.dedup.Dedup.canonicalFromPairs]] lifetime note).
    */
  def budgetSelectPerGroup(df: DataFrame, group: Column, id: Column,
                           quality: Column, cost: Column,
                           budgets: Map[String, Long],
                           maxHistRows: Int = 1 << 20): DataFrame =
    budgetSelectPerGroupImpl(df, group, id, quality, cost, budgets,
      maxHistRows, fanout = 4096, smallCap = 1 << 16)

  /** [[budgetSelectPerGroup]] with each group's budget as a fraction of
    * that group's OWN total cost — "keep the best 30% of every domain's
    * tokens". Per-group totals come off the (group, level) histogram
    * the selection collects anyway (no extra pass); each budget is
    * `floor(fraction_g * total_g)` in the same oracle-portable double
    * arithmetic as [[budgetSelectFraction]]. Groups absent from
    * `fractions` are dropped. */
  def budgetSelectPerGroupFraction(df: DataFrame, group: Column, id: Column,
                                   quality: Column, cost: Column,
                                   fractions: Map[String, Double],
                                   maxHistRows: Int = 1 << 20): DataFrame = {
    require(fractions.nonEmpty, "fractions must name at least one group")
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions in [0,1]")
    budgetSelectPerGroupCore(df, group, id, quality, cost,
      fractions.keySet,
      totals => totals.map { case (g, t) =>
        g -> math.floor(fractions(g) * t.toDouble).toLong
      },
      maxHistRows, fanout = 4096, smallCap = 1 << 16)
  }

  private[graft] def budgetSelectPerGroupImpl(
      df: DataFrame, group: Column, id: Column, quality: Column,
      cost: Column, budgets: Map[String, Long], maxHistRows: Int,
      fanout: Int, smallCap: Int): DataFrame = {
    require(budgets.nonEmpty, "budgets must name at least one group")
    require(budgets.values.forall(_ >= 0L), "budgets must be >= 0")
    budgetSelectPerGroupCore(df, group, id, quality, cost,
      budgets.keySet, _ => budgets, maxHistRows, fanout, smallCap)
  }

  /** Core: `groups` gates membership; `budgetsOfTotals` maps the
    * per-group totals (read off the level histogram) to absolute
    * budgets, so the fraction form shares every pass. */
  private def budgetSelectPerGroupCore(
      df: DataFrame, group: Column, id: Column, quality: Column,
      cost: Column, groups: Set[String],
      budgetsOfTotals: Map[String, Long] => Map[String, Long],
      maxHistRows: Int, fanout: Int, smallCap: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    require(fanout >= 2, "fanout must be >= 2")
    require(smallCap >= 1, "smallCap must be >= 1")
    val spark = df.sparkSession
    val gS = group.cast("string")
    val idL = id.cast("long")
    val qL = quality.cast("long")
    val cL = cost.cast("long")
    val outCols = df.columns.toSeq
    def frame(rows: Seq[Row], fields: (String, org.apache.spark.sql.types.DataType)*) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) }))
    val budgetGroups = frame(groups.toSeq.sorted.map(Row(_)),
      "__bsg" -> StringType)
    val live = df
      .where(id.isNotNull && quality.isNotNull && cost.isNotNull && gS.isNotNull)
      .withColumn("__bsg", gS)
      .join(broadcast(budgetGroups), Seq("__bsg"), "left_semi")

    // one corpus pass: the (group, level) histogram
    val hist = live.groupBy(col("__bsg"), qL.as("__bsq"))
      .agg(sum(cL).as("__bst"), min(cL).as("__bsm"))
      .limit(maxHistRows + 1)
      .collect()
    require(hist.length <= maxHistRows,
      s"more than $maxHistRows (group, quality-level) rows — quantize " +
        "the score (ppm convention) or raise maxHistRows")
    require(hist.forall(r => r.getLong(3) >= 0L),
      "negative cost values break greedy-prefix monotonicity")

    // driver cutoffs per group; budgets derive from the histogram's own
    // per-group totals (the fraction form's no-extra-pass contract)
    val byGroup = hist.groupBy(_.getString(0))
    val budgets = budgetsOfTotals(
      byGroup.map { case (g, rows) => g -> rows.map(_.getLong(2)).sum })
    require(budgets.values.forall(_ >= 0L), "budgets must be >= 0")
    var keepAll = List.empty[String]
    var cut = List.empty[(String, Long, Long)] // (group, q*, remaining)
    byGroup.foreach { case (g, rows) =>
      val levels = rows.map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1)(Ordering[Long].reverse)
      val budget = budgets(g)
      var acc = 0L
      var qStar = Option.empty[Long]
      var before = 0L
      levels.foreach { case (q, t) =>
        if (qStar.isEmpty && acc + t > budget) { qStar = Some(q); before = acc }
        acc += t
      }
      qStar match {
        case None     => keepAll ::= g
        case Some(qs) => cut ::= (g, qs, budget - before)
      }
    }

    val keepAllKept =
      if (keepAll.isEmpty) live.limit(0)
      else live.join(broadcast(frame(keepAll.sorted.map(Row(_)),
        "__bsg" -> StringType)), Seq("__bsg"), "left_semi")
    if (cut.isEmpty) return keepAllKept.drop("__bsg")

    val cutDf = frame(cut.sortBy(_._1).map { case (g, qs, _) => Row(g, qs) },
      "__bsg" -> StringType, "__bsqstar" -> LongType)
    val cutKept = live.withColumn("__bsq", qL)
      .join(broadcast(cutDf), Seq("__bsg"))
      .where(col("__bsq") > col("__bsqstar"))
      .drop("__bsq", "__bsqstar")

    // slim payload-carrying boundary frame: every cutoff group's q*
    // level, refined together round by round
    val pendCols = Seq(col("__bsg"), col("__bsid"), col("__bsc"), col("__bsrow"))
    var pending = live.withColumn("__bsq", qL)
      .join(broadcast(cutDf), Seq("__bsg"))
      .where(col("__bsq") === col("__bsqstar"))
      .select(col("__bsg"), idL.as("__bsid"), cL.as("__bsc"),
        struct(outCols.map(col): _*).as("__bsrow"))
      .localCheckpoint(false)
    val remaining = scala.collection.mutable.Map(
      cut.map { case (g, _, r) => g -> r }: _*)
    val finalRem = scala.collection.mutable.Map.empty[String, Long]
    var keptSlices = List.empty[DataFrame]
    var finals = pending.limit(0)
    // driver (lo, hi, n) per still-active group — ONE action per round
    // after this initial pass: the chunk histogram carries (min, max,
    // count), so each group's chosen boundary chunk IS its next stats
    var state: Map[String, (Long, Long, Long)] = pending
      .groupBy(col("__bsg"))
      .agg(min(col("__bsid")).as("lo"), max(col("__bsid")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    var rounds = 0
    while (state.nonEmpty) {
      rounds += 1
      require(rounds <= 64, "per-group refinement failed to converge " +
        "(unreachable: spans shrink every round)")
      val (small, big) = state.partition(_._2._3 <= smallCap)
      if (small.nonEmpty) {
        val gs = small.keys.toSeq.sorted
        gs.foreach(g => finalRem(g) = remaining(g))
        finals = finals.unionByName(
          pending.join(broadcast(frame(gs.map(Row(_)),
            "__bsg" -> StringType)), Seq("__bsg"), "left_semi"))
      }
      if (big.isEmpty) state = Map.empty
      else {
        val choices = big.toSeq.sortBy(_._1).map { case (g, (lo, hi, _)) =>
          val span = BigInt(hi) - BigInt(lo) + 1
          Row(g, ((span + fanout - 1) / fanout).max(1)
            .min(BigInt(Long.MaxValue / 2)).toLong)
        }
        val chunked = pending
          .join(broadcast(frame(choices,
            "__bsg" -> StringType, "__bsw" -> LongType)), Seq("__bsg"))
          .withColumn("__bschunk",
            graft.ops.TemporalOps.floorDivChunk(col("__bsid"), col("__bsw")))
        val chist = chunked.groupBy(col("__bsg"), col("__bschunk"))
          .agg(sum(col("__bsc")).as("__bst"), min(col("__bsid")).as("__bslo"),
            max(col("__bsid")).as("__bshi"), count(lit(1)).as("__bsn"))
          .collect()
        val nextState = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
        val stars = chist.groupBy(_.getString(0)).map { case (g, rows) =>
          val chunks = rows.map(r => (r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
          var cacc = 0L
          var cStar = Option.empty[(Long, Long, Long, Long)]
          var cbefore = 0L
          chunks.foreach { case (c, t, clo, chi, cn) =>
            if (cStar.isEmpty && cacc + t > remaining(g)) {
              cStar = Some((c, clo, chi, cn)); cbefore = cacc
            }
            cacc += t
          }
          // exists: pending cost > remaining invariant
          val (cs, clo, chi, cn) = cStar.get
          remaining(g) = remaining(g) - cbefore
          nextState(g) = (clo, chi, cn)
          Row(g, cs)
        }.toSeq
        val starsDf = broadcast(frame(stars.sortBy(_.getString(0)),
          "__bsg" -> StringType, "__bscstar" -> LongType))
        val joined = chunked.join(starsDf, Seq("__bsg"))
        keptSlices ::= joined.where(col("__bschunk") < col("__bscstar"))
          .select(pendCols: _*)
        pending = joined.where(col("__bschunk") === col("__bscstar"))
          .select(pendCols: _*)
          .localCheckpoint(false)
        state = nextState.toMap
      }
    }

    // one bounded window per exited group: ≤ smallCap rows per (group)
    // partition by construction
    val remDf = broadcast(frame(
      finalRem.toSeq.sortBy(_._1).map { case (g, r) => Row(g, r) },
      "__bsg" -> StringType, "__bsrem" -> LongType))
    val w = Window.partitionBy(col("__bsg")).orderBy(col("__bsid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val finalKept = finals.join(remDf, Seq("__bsg"))
      .withColumn("__bscum", sum(col("__bsc")).over(w))
      .where(col("__bscum") <= col("__bsrem"))
      .select(pendCols: _*)

    (keptSlices :+ finalKept)
      .map(_.select(col("__bsrow.*")))
      .foldLeft(keepAllKept.drop("__bsg").unionByName(cutKept.drop("__bsg")))(
        _.unionByName(_))
  }
}
