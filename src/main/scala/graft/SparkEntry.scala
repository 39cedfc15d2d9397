package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtensionQueries, IngestQueries, ParityQueries, ScalarQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-operator registries (one entry per
  * implemented operator of SURVEY.md §2 plus the scale extensions);
  * `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full KV lifecycle —
    * long rows → pack into salted cells → unpack → long rows again
    * (SURVEY.md §7.2). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("unpack_cells")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ScalarQueries.queries ++
      ExtensionQueries.queries ++ IngestQueries.queries

  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ ScalarQueries.oracleSql ++
      ExtensionQueries.oracleSql ++ IngestQueries.oracleSql
}
