package graft.ingest

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC pushdown scan (SURVEY.md §2 S4). The reference reads Teradata
  * with the dbtable-subquery pattern so the WHOLE query — filter, TOP-n,
  * joins — executes remotely and only the result crosses the wire
  * (Utils.scala:812-837; pushed `WHERE Lot=…` / `TOP 10000` examples at
  * :820-822). Same pattern here over Spark's JDBC source:
  *
  *  - [[readQuery]]: full-query pushdown — the remote engine runs `sql`
  *    verbatim (the `query` option wraps it as a derived table exactly
  *    like the reference's `(subquery) alias` dbtable).
  *  - [[readTable]]: table scan that leaves filter/projection pushdown
  *    to Catalyst — JDBCRelation pushes `WHERE`/column pruning into the
  *    generated remote SQL (`PushedFilters` in the physical plan).
  *
  * Scale note: a single JDBC connection is one stream; for a large
  * remote table pass `partitionColumn`/bounds via `options` so Spark
  * opens `numPartitions` parallel range-bounded connections — the JDBC
  * analogue of the salt spreading the KV write load.
  *
  * Parity tested against in-process Derby (JdbcSpec) — the sandbox has
  * no network, but the pushdown pattern is engine-agnostic.
  */
object JdbcSource {

  /** Full-query pushdown: `sql` executes on the remote engine. */
  def readQuery(spark: SparkSession, url: String, sql: String,
                options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jdbc").option("url", url).option("query", sql)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** Table scan with Catalyst-driven filter/projection pushdown. */
  def readTable(spark: SparkSession, url: String, table: String,
                options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** Driver-side DDL/DML helper for tests and one-off setup. */
  def execute(url: String, statements: Seq[String]): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, new Properties())
    try {
      val st = conn.createStatement()
      statements.foreach(st.execute)
      st.close()
    } finally conn.close()
  }
}
