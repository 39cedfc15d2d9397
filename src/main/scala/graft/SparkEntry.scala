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

  /** Report-only environment probes: constant-input queries whose
    * DuckDB rendering is KNOWN to diverge on some driver envs
    * (HUGEINT/DECIMAL). Verify evaluates them into _env.json and dumps
    * the DuckDB side as _probe_sql.json — they are deliberately NOT in
    * `queries`/`oracleSql`, so they never count in the pass/fail
    * roll-up (VERDICT r14 ask #1). */
  def probes: Map[String, (SparkSession, String) => DataFrame] =
    ExtensionQueries.probes

  def probeSql: Map[String, String] = ExtensionQueries.probeSql
}
