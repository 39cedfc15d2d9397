package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys — the generalization of the
  * reference's write-side 24-bucket salt (Utils.scala:82-96) to joins and
  * aggregations. AQE's skew-join handling covers sort-merge joins at
  * runtime; these explicit forms cover the cases AQE can't re-plan (hash
  * aggregations over hot keys, broadcast-side replication) and make the
  * salting deterministic so results stay oracle-comparable.
  */
object SkewOps {

  /** Deterministic row salt in [0, buckets): hash of the given columns.
    * Unlike `rand()`-based salting, re-running the job reproduces the
    * same partitioning (idempotent retries, comparable diffs). */
  def rowSalt(cols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase aggregation for skewed groupBy keys: partial-aggregate on
    * (key, salt) — spreading a hot key over `buckets` reducers — then
    * final-aggregate on the key. Expressed for the additive aggregates
    * (count/sum); Catalyst's own partial aggregation handles the map
    * side, this handles reducer-side hot keys. Note the two-stage sum
    * widens decimal precision (and reorders fp accumulation for
    * doubles) relative to a single-stage sum — values agree for exact
    * types but the result TYPE differs; compare numerically, not
    * schema-byte-exactly. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltCols: Seq[Column], buckets: Int = 24): DataFrame =
    df.select(key.as("k"), value.as("v"),
        rowSalt(saltCols, buckets).as("__salt"))
      .groupBy(col("k"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("total"))

  /** Skewed equi-join: salt the big side's rows, replicate the small side
    * once per bucket, join on (key, salt). Use when the small side is too
    * big to broadcast but the key distribution is hot. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltCols: Seq[Column], buckets: Int = 24): DataFrame = {
    val bigSalted = big.withColumn("__salt", rowSalt(saltCols, buckets))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
