package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example shaping AFTER chunking: pack token chunks into
  * fixed-budget bins, and upweight sources by deterministic repetition.
  * Both are pure column plans (one keyed window / one generator), both
  * mirrored exactly by the DuckDB oracle.
  */
object Packing {

  /** Sequential token-budget packing: within each `key` group, rows are
    * taken in `order` and assigned `bin_id = floor(exclusiveCumSum /
    * budget)` — the streaming-friendly packing rule (a bin may overflow
    * by at most one row's tokens; rows are never reordered or split).
    * One shuffle on `key`; bins are contiguous runs, so downstream
    * per-bin aggregation needs no further shuffle when it groups by
    * (key, bin_id).
    *
    * Greedy close-on-overflow packing (reset the running sum at each
    * boundary) needs a recursive scan Spark's window algebra cannot
    * express — this fixed-boundary rule is the standard deterministic
    * approximation and what the oracle mirrors.
    *
    * Parallelism = key cardinality: the cumulative sum is sequential
    * WITHIN a key, so each key value runs as one window task. Pick a
    * key with enough distinct values for the cluster (e.g. lang ×
    * shard-of-doc_id, not lang alone) when the corpus is large.
    */
  def packBins(df: DataFrame, key: Column, order: Column, tokens: Column,
               budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(key).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bin_id",
      floor(coalesce(sum(tokens).over(w), lit(0L)) / budget))
  }

  /** Deterministic weighted repetition for corpus mixing with weights
    * above 1: each row appears floor(w) times, plus one more with
    * probability frac(w) decided by the row's md5 bucket (stable across
    * runs/partitioning). Weights below 1 degenerate to hash sampling
    * with the SAME rounded threshold as [[Sampling.hashSample]], so the
    * two operators select identical rows at equal fractions. Adds
    * `copy_idx` (0-based); rows with 0 copies drop out. */
  def repeatByWeight(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val whole = floor(weight).cast("int")
    val frac = weight - floor(weight)
    // same 16-bit hex-bucket trick as Sampling (round, not truncate —
    // Sampling.hexThreshold rounds); frac < 1 by construction, and the
    // 65535 cap guards the pathological frac→1 round-up, which would
    // otherwise lpad-TRUNCATE "10000" into a tiny threshold
    val bucket = substring(md5(key.cast("string")), 1, 4)
    val threshold =
      lpad(lower(hex(least(round(frac * 65536), lit(65535)).cast("int"))), 4, "0")
    val copies = whole + when(bucket < threshold, 1).otherwise(0)
    df.withColumn("copy_idx",
        explode(when(copies >= 1, sequence(lit(0), copies - 1))
          .otherwise(array().cast("array<int>"))))
  }
}
