package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet corpus (TESTDATA.md).
  * One call per table; Catalyst prunes columns/predicates at the scan.
  */
object Tables {
  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every corpus table as a temp view so the whole §2 surface
    * is also reachable through `spark.sql` (the reference accepts SQL
    * fragments via expr/selectExpr — SURVEY.md §2.11; this is the
    * whole-query flavor). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
