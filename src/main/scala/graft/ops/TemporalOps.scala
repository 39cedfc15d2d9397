package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks as built-ins, composed scalably:
  *
  *  - as-of join: for each left row, the latest right row with
  *    rightTs <= leftTs on the same key. Implemented as union + keyed
  *    window (one shuffle on the key, forward-fill of the right payload)
  *    — never the naive range join whose candidate space explodes.
  *  - sessionization: gap-based session ids per key via lag + running
  *    sum of gap-breaks — the standard two-window formulation.
  */
object TemporalOps {

  /** As-of join. `right` must be unique per (key, ts) — pre-aggregate it
    * if not, or ties make the filled value nondeterministic.
    * @return left rows + `payload` column holding the as-of right value
    *         (null when no right row precedes the left row)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTs: Column, rightTs: Column,
               payload: Column): DataFrame = {
    val l = left.select(leftKey.as("__k"), leftTs.as("__ts"),
      lit(1).as("__isLeft"), lit(null).cast("string").as("__p"),
      struct(col("*")).as("__row"))
    val r = right.select(rightKey.as("__k"), rightTs.as("__ts"),
      lit(0).as("__isLeft"), payload.cast("string").as("__p"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    // at equal ts the right row sorts first, so ts >= rightTs is inclusive
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("payload", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__isLeft") === 1)
      .select(col("__row.*"), col("payload"))
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event on the same key exceeds `gap` (in the ts unit).
    * Adds `session_id` (0-based per key, by time order). */
  def sessionize(events: DataFrame, key: Column, ts: Column,
                 gap: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(ts)
    events
      .withColumn("__prev", lag(ts, 1).over(byKey))
      .withColumn("__break",
        when(col("__prev").isNull || ts - col("__prev") > gap, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__break")).over(byKey.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - 1)
      .drop("__prev", "__break")
  }
}
