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
  *     exactly with one running-sum window over that BOUNDED frame — the
  *     only window in the plan, partitioned by the (constant) group key
  *     over ≤ smallCap rows by construction, so no unpartitioned-window
  *     plan ever appears.
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
  *  - Rows whose id, quality, or cost is null AFTER the long cast are
  *    DROPPED (raw nulls, and values that cannot cast — e.g. a string
  *    score under non-ANSI): a null has no place in a total order, and
  *    every engine orders/sums it differently — no coherent greedy
  *    semantics exists for them.
  *  - Computed quality/cost columns are evaluated a CONSTANT number of
  *    times (the histogram pass, the kept-slice filters, and the one
  *    boundary-frame build — ~4 corpus passes): refinement rounds run
  *    against a localCheckpointed slim boundary frame, never the raw
  *    corpus plan, so an expensive score is never re-paid per round.
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

  /** Keep EXACTLY the best `m` rows of `df` by (quality DESC, id ASC) —
    * exact global top-m selection at ANY m (billions included), where
    * `orderBy.limit(m)` stops being an option: Spark's global limit
    * materializes m rows through a single task, and a ranking window is
    * the single-task sort this module exists to avoid. Implemented as
    * [[budgetSelect]] with unit cost — a budget of m unit-cost rows IS
    * the m-row prefix — so it inherits the histogram-cutoff scale shape
    * and the checkpointed boundary refinement verbatim. */
  def takeTop(df: DataFrame, id: Column, quality: Column,
              m: Long, maxQualityLevels: Int = 1 << 20): DataFrame = {
    require(m >= 0L, "m must be >= 0")
    budgetSelect(df, id, quality, lit(1L), m, maxQualityLevels)
  }

  /** Exact global top-m for SMALL m over a HIGH-CARDINALITY quality
    * key — the complement of [[takeTop]]: takeTop resolves through the
    * quality-LEVEL histogram (`maxQualityLevels` driver rows), which
    * is the right plan when m is huge but quality sits on a bounded
    * grid (the house ppm convention). A composed sort key (e.g.
    * `score * 2e9 + rank` — every row distinct) makes that histogram
    * the full distinct key set: loud-fail at corpus scale. For small
    * m the size-m heap aggregate is the plan you want — O(m) per
    * partition partials, one merge, no driver state, no sort
    * ([[takeTopPerGroupUniform]] under one constant group). Same
    * (quality DESC, id ASC) greedy contract; `id` duplicate-free. */
  def takeTopSmall(df: DataFrame, id: Column, quality: Column, m: Long,
                   maxM: Int = 1 << 20): DataFrame =
    takeTopPerGroupUniform(df, lit("__all"), id, quality, m, maxM)

  /** [[takeTop]] computed SEPARATELY within every group — "the best
    * m_g documents per source" at any m, without the per-group ranking
    * window whose single hottest group would own the job's wall clock:
    * [[budgetSelectPerGroup]] with unit cost, so every group's m-row
    * prefix resolves through the shared histogram cutoff and all
    * groups' boundaries refine together. Groups absent from `ms` are
    * dropped (the mixture-spec rate-0 default). */
  def takeTopPerGroup(df: DataFrame, group: Column, id: Column,
                      quality: Column, ms: Map[String, Long],
                      maxHistRows: Int = 1 << 20): DataFrame = {
    require(ms.nonEmpty, "ms must name at least one group")
    require(ms.values.forall(_ >= 0L), "m must be >= 0")
    budgetSelectPerGroup(df, group, id, quality, lit(1L), ms, maxHistRows)
  }

  /** Uniform per-group top-m — "at most m best docs per DOMAIN", the
    * crawl diversity cap — with the groups DISCOVERED from the data
    * and NEVER enumerated anywhere: ONE groupBy whose aggregation
    * buffer is a size-m heap of (quality, id) keys
    * ([[graft.ops.BoundedTopMAgg]], the bounded_collect pattern), then
    * one semi-join back to `df`. O(m) memory per group per partial,
    * ZERO driver state — tens of millions of hosts cost the cluster
    * m keys each and the driver nothing (this replaced a
    * distinct-collect of the group keys that loud-failed at 2²⁰
    * groups, i.e. below real crawl host counts). Map-side partials
    * mean a hot host collapses to m entries before the shuffle.
    *
    * Keeps, per non-null group, the m best rows by (quality DESC,
    * id ASC); rows with a null quality or id drop (the family's
    * null-drop contract). `id` must be duplicate-free (it is the
    * tiebreak and the join-back key — the same assumption the
    * refinement family makes). TWO passes over `df` (aggregate +
    * join-back): persist an EXPENSIVE upstream (a parse/extract
    * chain, a join) before calling — re-scanning a parquet column is
    * fine, re-running an ingest pipeline twice is not (the
    * crawl_pipeline gate's 13s-vs-1s lesson).
    *
    * `maxPerGroup` bounds the heap a single group may hold (the
    * buffer IS per-group state); a uniform diversity cap is small by
    * construction — for corpus-scale per-group budgets use
    * [[takeTopPerGroup]]/[[budgetSelectPerGroup]], whose histogram
    * refinement never buffers a group. */
  def takeTopPerGroupUniform(df: DataFrame, group: Column, id: Column,
                             quality: Column, m: Long,
                             maxPerGroup: Int = 1 << 20): DataFrame = {
    require(m >= 0L, "m must be >= 0")
    require(m <= maxPerGroup,
      s"m=$m exceeds maxPerGroup=$maxPerGroup — the top-m heap is the " +
        "aggregation buffer; for large per-group quotas use " +
        "takeTopPerGroup, whose histogram refinement never buffers a group")
    if (m == 0L) return df.limit(0)
    val kept = df
      .where(group.isNotNull)
      .groupBy(group.cast("string").as("__tg"))
      .agg(graft.ops.BoundedTopM.topM(
        org.apache.spark.sql.functions.struct(
          quality.as("__q"), id.as("__id")),
        m.toInt, Seq(true, false)).as("__top"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("__top")).as("__k"))
      .select(org.apache.spark.sql.functions.col("__k.__id").as("__tid"))
    df.join(kept, id === kept("__tid"), "left_semi")
  }

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
    * fraction form shares every pass with the absolute form.
    *
    * Implemented as the per-group core with one constant group: the
    * per-group machinery localCheckpoints the slim boundary frame
    * (id, cost, row) ONCE, so every refinement round scans that
    * checkpointed frame — never the raw corpus plan. The corpus-plan
    * expressions (quality/cost kernels) are therefore evaluated a
    * CONSTANT number of times (histogram + kept-slice filters + the one
    * boundary-frame build), independent of the O(log_fanout(id-span))
    * round count; and the one exact window runs partitioned by the
    * constant group over the ≤ smallCap remainder. */
  private def budgetSelectImpl(df: DataFrame, id: Column,
                               quality: Column, cost: Column,
                               budgetOfTotal: Long => Long,
                               maxQualityLevels: Int,
                               fanout: Int, smallCap: Int): DataFrame =
    budgetSelectPerGroupCore(df, lit(allGroup), id, quality, cost,
      Set(allGroup),
      totals => totals.map { case (g, t) =>
        val b = budgetOfTotal(t)
        require(b >= 0L, "budget must be >= 0")
        g -> b
      },
      maxQualityLevels, fanout, smallCap)

  /** The constant group name the ungrouped form runs under. */
  private val allGroup = "__all"

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

  // ── Persisted budget state (rolling-corpus cutoffs) ────────────────

  /** Persist the quality-level histogram — the ONE corpus-wide
    * aggregation [[budgetSelect]] needs — as parquet state
    * `(q_level, total_cost, min_cost)`, so a rolling corpus can update
    * its budget cutoff incrementally: ingest appends fold each batch's
    * histogram into the state ([[appendBudgetState]]), and
    * [[budgetSelectFromState]] runs the selection WITHOUT re-scanning
    * the corpus for the histogram. State size is bounded by the ppm
    * level convention (≤ maxQualityLevels slim rows — manifest-class),
    * the same bucketBy-free pattern as the minhash index manifests.
    *
    * `id` is required even though the histogram doesn't store it: the
    * state must count EXACTLY the rows the selection can keep, and the
    * selection's null-drop contract excludes rows whose id try_casts to
    * null — a state built without that filter would carry cost the
    * selection can never spend and shift (or strand) the cutoff.
    *
    * The histogram is VALIDATED BEFORE the path is touched (collect +
    * cap require, then write): a continuous score passed by mistake
    * fails loudly while the previous valid state stays intact. */
  def writeBudgetState(df: DataFrame, id: Column, quality: Column,
                       cost: Column, path: String,
                       maxQualityLevels: Int = 1 << 20): Unit =
    writeBudgetStatePerGroup(df, lit(allGroup), id, quality, cost, path,
      maxQualityLevels)

  /** Fold a new batch's histogram into existing state: ONE aggregation
    * over the batch plus a merge of two manifest-class level tables —
    * the existing corpus is never re-scanned. The merged state is
    * collected (bounded by `maxQualityLevels`, loud-fail) BEFORE the
    * rewrite, so a bad batch cannot destroy the existing state. */
  def appendBudgetState(batch: DataFrame, id: Column, quality: Column,
                        cost: Column, path: String,
                        maxQualityLevels: Int = 1 << 20): Unit =
    appendBudgetStatePerGroup(batch, lit(allGroup), id, quality, cost, path,
      maxQualityLevels)

  /** [[budgetSelect]] whose histogram comes from persisted state
    * ([[writeBudgetState]] / [[appendBudgetState]]) instead of a corpus
    * scan: the cutoff level resolves from the state alone, so the
    * corpus-plan passes shrink to the kept-slice filters and the
    * boundary-frame build. The state MUST describe exactly `df`'s rows
    * (the rolling contract: state appended in lockstep with corpus
    * appends) — a stale histogram yields a stale cutoff, exactly as a
    * stale index yields stale lookups. */
  def budgetSelectFromState(df: DataFrame, id: Column, quality: Column,
                            cost: Column, budget: Long, path: String,
                            maxQualityLevels: Int = 1 << 20): DataFrame = {
    require(budget >= 0L, "budget must be >= 0")
    budgetSelectPerGroupFromState(df, lit(allGroup), id, quality, cost,
      Map(allGroup -> budget), path, maxQualityLevels)
  }

  /** The state's batch histogram: aggregated over EXACTLY the rows the
    * selection's null-drop contract can keep — including the id filter,
    * which the histogram doesn't store but whose cast-null rows the
    * selection drops (state counting them would carry cost the
    * selection can never spend). */
  private def stateHistogram(df: DataFrame, group: Column, id: Column,
                             quality: Column, cost: Column): DataFrame = {
    val gS = group.cast("string")
    val idL = id.try_cast("long")
    val qL = quality.try_cast("long")
    val cL = cost.try_cast("long")
    df.where(gS.isNotNull && idL.isNotNull && qL.isNotNull && cL.isNotNull)
      .groupBy(gS.as("group"), qL.as("q_level"))
      .agg(sum(cL).as("total_cost"), min(cL).as("min_cost"))
  }

  // State persistence rides the shared generation-versioned layout
  // ([[graft.core.GenState]]): crash-atomic commits, loud
  // concurrent-append collisions, previous-generation retention, and
  // batchId-stamped generations for streaming replay detection.

  /** Read the CURRENT budget state (latest valid generation; a legacy
    * bare-parquet root reads as-is). Public so rolling pipelines can
    * inspect totals/levels without knowing the layout — reading the
    * root path directly as parquet is NOT part of the contract. */
  def readBudgetState(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame =
    graft.core.GenState.read(spark, path)

  /** The highest streaming batchId folded into any surviving valid
    * generation — [[appendBudgetStateBatch]]'s replay guard. None when
    * the state holds no batch-stamped generations (fresh state, or only
    * plain writes/appends). */
  def stateBatchWatermark(spark: org.apache.spark.sql.SparkSession,
                          path: String): Option[Long] =
    graft.core.GenState.batchWatermark(spark, path)

  private val stateSchema = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    StructType(Seq(StructField("group", StringType, nullable = false),
      StructField("q_level", LongType, nullable = false),
      StructField("total_cost", LongType, nullable = false),
      StructField("min_cost", LongType, nullable = false)))
  }

  /** Cap-validate collected histogram rows, then commit them as the
    * NEXT state generation — validation strictly BEFORE the path is
    * touched, and the commit lands in a fresh generation dir
    * ([[graft.core.GenState.commit]]), so neither a bad batch nor a
    * crashed write can destroy the previous valid state. */
  private def writeStateRows(spark: org.apache.spark.sql.SparkSession,
                             rows: Array[org.apache.spark.sql.Row],
                             path: String, maxHistRows: Int,
                             batchId: Option[Long] = None): Unit = {
    require(rows.length <= maxHistRows,
      s"more than $maxHistRows (group, quality-level) rows — quantize " +
        "the score (ppm convention) or raise the cap")
    graft.core.GenState.commit(spark, rows.toSeq, stateSchema, path, batchId)
  }

  /** Per-group persisted state: the (group, level) histogram as parquet
    * `(group, q_level, total_cost, min_cost)` — the mixture-spec twin of
    * [[writeBudgetState]] (which IS this function with one constant
    * group). Same rolling contract and same validate-before-write
    * discipline. */
  def writeBudgetStatePerGroup(df: DataFrame, group: Column, id: Column,
                               quality: Column, cost: Column, path: String,
                               maxHistRows: Int = 1 << 20): Unit =
    writeStateRows(df.sparkSession,
      stateHistogram(df, group, id, quality, cost)
        .limit(maxHistRows + 1).collect(),
      path, maxHistRows)

  /** Fold a batch's (group, level) histogram into existing per-group
    * state — one batch-only aggregation, the existing corpus is never
    * re-scanned. The merge is collected (cap-checked) before any write,
    * and the result commits as a NEW state generation (see the layout
    * note above writeStateRows): a crash mid-write cannot lose the
    * prior state, and a concurrent second appender fails loudly on the
    * generation collision instead of silently dropping a fold. */
  def appendBudgetStatePerGroup(batch: DataFrame, group: Column, id: Column,
                                quality: Column, cost: Column, path: String,
                                maxHistRows: Int = 1 << 20): Unit =
    appendFold(batch, group, id, quality, cost, path, maxHistRows,
      batchId = None, allowInit = false)

  /** [[appendBudgetState]] made effectively-once for streaming
    * foreachBatch: foreachBatch is at-least-once, and a histogram fold
    * is not idempotent — a replayed micro-batch would double-count its
    * cost. Here the committing generation carries `batchId` in its
    * directory NAME (atomic with the parquet commit), and a batch at or
    * below the surviving watermark is skipped. Missing state
    * initializes from the first batch (the streaming cold-start), where
    * the plain append stays loud on a missing path. Returns true when
    * the fold was applied, false when skipped as a replay. */
  def appendBudgetStateBatch(batch: DataFrame, id: Column, quality: Column,
                             cost: Column, path: String, batchId: Long,
                             maxQualityLevels: Int = 1 << 20): Boolean =
    appendBudgetStatePerGroupBatch(batch, lit(allGroup), id, quality, cost,
      path, batchId, maxQualityLevels)

  /** The mixture-spec twin of [[appendBudgetStateBatch]]. */
  def appendBudgetStatePerGroupBatch(batch: DataFrame, group: Column,
                                     id: Column, quality: Column,
                                     cost: Column, path: String,
                                     batchId: Long,
                                     maxHistRows: Int = 1 << 20): Boolean = {
    val spark = batch.sparkSession
    if (stateBatchWatermark(spark, path).exists(batchId <= _)) false
    else {
      appendFold(batch, group, id, quality, cost, path, maxHistRows,
        batchId = Some(batchId), allowInit = true)
      true
    }
  }

  /** Shared fold: merge the batch histogram into the current state and
    * commit as the next generation. `allowInit` lets the streaming
    * cold-start create state from the first batch; the plain append
    * keeps a missing/unreadable path loud. */
  private def appendFold(batch: DataFrame, group: Column, id: Column,
                         quality: Column, cost: Column, path: String,
                         maxHistRows: Int, batchId: Option[Long],
                         allowInit: Boolean): Unit = {
    val spark = batch.sparkSession
    val existing =
      if (allowInit && graft.core.GenState.isUninitialized(spark, path))
        None // nothing committed yet and no legacy files: init from batch
      else Some(readBudgetState(spark, path))
    val batchHist = stateHistogram(batch, group, id, quality, cost)
    val merged = existing.fold(batchHist)(_.unionByName(batchHist))
      .groupBy(col("group"), col("q_level"))
      .agg(sum(col("total_cost")).as("total_cost"),
        min(col("min_cost")).as("min_cost"))
      .limit(maxHistRows + 1)
      .collect()
    writeStateRows(spark, merged, path, maxHistRows, batchId)
  }

  /** [[budgetSelectPerGroup]] with its (group, level) histogram read
    * from persisted state instead of a corpus scan — the mixture-spec
    * cutoffs resolve from state alone. Groups absent from `budgets` are
    * dropped, exactly as in the from-scratch form. */
  def budgetSelectPerGroupFromState(df: DataFrame, group: Column, id: Column,
                                    quality: Column, cost: Column,
                                    budgets: Map[String, Long], path: String,
                                    maxHistRows: Int = 1 << 20): DataFrame = {
    require(budgets.nonEmpty, "budgets must name at least one group")
    require(budgets.values.forall(_ >= 0L), "budgets must be >= 0")
    fromStateCore(df, group, id, quality, cost, budgets.keySet,
      _ => budgets, path, maxHistRows)
  }

  /** [[budgetSelectPerGroupFraction]] with each group's total read from
    * PERSISTED state instead of a corpus histogram pass — "keep the
    * best 30% of every domain's tokens, by what the rolling state says
    * the domains hold": the cutoffs AND the totals they derive from
    * both resolve from state alone. Same oracle-portable floor(f × t)
    * arithmetic as the from-scratch fraction form; groups absent from
    * `fractions` drop, and the stale/partial-state guard applies. */
  def budgetSelectPerGroupFractionFromState(
      df: DataFrame, group: Column, id: Column, quality: Column,
      cost: Column, fractions: Map[String, Double], path: String,
      maxHistRows: Int = 1 << 20): DataFrame = {
    require(fractions.nonEmpty, "fractions must name at least one group")
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions in [0,1]")
    fromStateCore(df, group, id, quality, cost, fractions.keySet,
      totals => totals.map { case (g, t) =>
        g -> math.floor(fractions(g) * t.toDouble).toLong
      }, path, maxHistRows)
  }

  /** Shared from-state front: read + cap-check the state histogram for
    * the named groups, run the stale/partial-state guard, then hand the
    * core the histogram override (no corpus histogram pass). */
  private def fromStateCore(df: DataFrame, group: Column, id: Column,
                            quality: Column, cost: Column,
                            groups: Set[String],
                            budgetsOfTotals: Map[String, Long] => Map[String, Long],
                            path: String, maxHistRows: Int): DataFrame = {
    val spark = df.sparkSession
    val hist = readBudgetState(spark, path)
      .select(col("group"), col("q_level"), col("total_cost"), col("min_cost"))
      .where(col("group").isin(groups.toSeq: _*))
      .limit(maxHistRows + 1)
      .collect()
    require(hist.length <= maxHistRows,
      s"budget state at $path exceeds $maxHistRows rows")
    // stale/partial-state guard: a named group with LIVE rows in the
    // input but no histogram in the state would land in neither the
    // keep-all nor the cutoff set — its rows would silently vanish. A
    // group genuinely absent from the input is fine (selects nothing,
    // same as from-scratch), so probe the input only for the missing
    // groups before failing.
    val missing = groups -- hist.map(_.getString(0)).toSet
    if (missing.nonEmpty) {
      val gS = group.cast("string")
      val present = !df.where(gS.isin(missing.toSeq: _*) &&
          id.try_cast("long").isNotNull && quality.try_cast("long").isNotNull &&
          cost.try_cast("long").isNotNull)
        .isEmpty
      require(!present,
        s"budget state at $path has no histogram for group(s) " +
          s"${missing.toSeq.sorted.mkString(", ")} present in the input — " +
          "stale or partial state; write/append the missing batches first")
    }
    budgetSelectPerGroupCore(df, group, id, quality, cost,
      groups, budgetsOfTotals,
      maxHistRows, fanout = 4096, smallCap = 1 << 16,
      histOverride = Some(hist.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))))
  }

  /** Core: `groups` gates membership; `budgetsOfTotals` maps the
    * per-group totals (read off the level histogram) to absolute
    * budgets, so the fraction form shares every pass. `histOverride`
    * supplies a precomputed (group, level, total, minCost) histogram —
    * the persisted-state path — skipping the one corpus-wide
    * aggregation. */
  private def budgetSelectPerGroupCore(
      df: DataFrame, group: Column, id: Column, quality: Column,
      cost: Column, groups: Set[String],
      budgetsOfTotals: Map[String, Long] => Map[String, Long],
      maxHistRows: Int, fanout: Int, smallCap: Int,
      histOverride: Option[Array[(String, Long, Long, Long)]] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    require(fanout >= 2, "fanout must be >= 2")
    require(smallCap >= 1, "smallCap must be >= 1")
    require(!df.columns.exists(_.startsWith("__bs")),
      "input columns must not start with the reserved __bs prefix: " +
        df.columns.filter(_.startsWith("__bs")).mkString(", "))
    val spark = df.sparkSession
    // try_cast, not cast: a value that cannot cast to long becomes null
    // (and is dropped by the live filter below) under BOTH ANSI and
    // legacy modes, instead of ANSI throwing mid-scan
    val gS = group.cast("string")
    val idL = id.try_cast("long")
    val qL = quality.try_cast("long")
    val cL = cost.try_cast("long")
    val outCols = df.columns.toSeq
    def frame(rows: Seq[Row], fields: (String, org.apache.spark.sql.types.DataType)*) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) }))
    val budgetGroups = frame(groups.toSeq.sorted.map(Row(_)),
      "__bsg" -> StringType)
    // the null-drop contract FILTERS ON THE CAST columns: a raw null
    // casts to null, and so does a value that cannot cast to long (a
    // string score under non-ANSI) — both have no place in a total
    // order, and the cast-form filter turns what would otherwise be an
    // opaque driver NPE at histogram time into the documented drop
    val live = df
      .where(idL.isNotNull && qL.isNotNull && cL.isNotNull && gS.isNotNull)
      .withColumn("__bsg", gS)
      .join(broadcast(budgetGroups), Seq("__bsg"), "left_semi")

    // one corpus pass: the (group, level) histogram — skipped entirely
    // when persisted state supplies it (budgetSelectFromState)
    val hist: Array[(String, Long, Long, Long)] = histOverride.getOrElse {
      live.groupBy(col("__bsg"), qL.as("__bsq"))
        .agg(sum(cL).as("__bst"), min(cL).as("__bsm"))
        .limit(maxHistRows + 1)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    require(hist.length <= maxHistRows,
      s"more than $maxHistRows (group, quality-level) rows — quantize " +
        "the score (ppm convention) or raise maxHistRows")
    require(hist.forall(_._4 >= 0L),
      "negative cost values break greedy-prefix monotonicity")

    // driver cutoffs per group; budgets derive from the histogram's own
    // per-group totals (the fraction form's no-extra-pass contract)
    val byGroup = hist.groupBy(_._1)
    val budgets = budgetsOfTotals(
      byGroup.map { case (g, rows) => g -> rows.map(_._3).sum })
    require(budgets.values.forall(_ >= 0L), "budgets must be >= 0")
    var keepAll = List.empty[String]
    var cut = List.empty[(String, Long, Long)] // (group, q*, remaining)
    byGroup.foreach { case (g, rows) =>
      val levels = rows.map(r => (r._2, r._3))
        .sortBy(_._1)(Ordering[Long].reverse)
      val budget = budgets(g)
      graft.core.Refine.boundary[(Long, Long)](levels.toSeq, _._2, budget) match {
        case None                 => keepAll ::= g
        case Some(((qs, _), before)) => cut ::= (g, qs, budget - before)
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
      // unreachable with UNIQUE ids (spans shrink every round) — but a
      // violated precondition (duplicate or non-integral ids collapsing
      // under the long cast) parks > smallCap rows on ONE id, where
      // width-1 chunks stop shrinking; fail loudly naming the cause
      // instead of looping forever
      rounds += 1
      require(rounds <= 64, "refinement failed to converge — are the " +
        "ids unique? (duplicate or non-integral ids collapse chunks)")
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
          Row(g, graft.core.Refine.chunkWidth(lo, hi, fanout))
        }
        val chunked = pending
          .join(broadcast(frame(choices,
            "__bsg" -> StringType, "__bsw" -> LongType)), Seq("__bsg"))
          .withColumn("__bschunk", floorDivChunk(col("__bsid"), col("__bsw")))
        val chist = chunked.groupBy(col("__bsg"), col("__bschunk"))
          .agg(sum(col("__bsc")).as("__bst"), min(col("__bsid")).as("__bslo"),
            max(col("__bsid")).as("__bshi"), count(lit(1)).as("__bsn"))
          .collect()
        val nextState = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
        val stars = chist.groupBy(_.getString(0)).map { case (g, rows) =>
          val chunks = rows.map(r => (r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
          // exists: pending cost > remaining invariant
          val ((cs, _, clo, chi, cn), cbefore) =
            graft.core.Refine.boundary[(Long, Long, Long, Long, Long)](
              chunks.toSeq, _._2, remaining(g)).get
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
