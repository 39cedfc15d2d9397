package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.JdbcSource

/** S4 (JDBC pushdown scan) parity against in-process Derby — the
  * sandbox has no network, so the embedded engine stands in for
  * Teradata; the pushdown patterns (full-query dbtable subquery,
  * Catalyst filter pushdown into remote SQL) are engine-agnostic
  * (reference: Utils.scala:812-837).
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val url: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    // Derby refuses to create a database in an EXISTING directory
    val u = s"jdbc:derby:$dir/db;create=true"
    JdbcSource.execute(u, Seq(
      """CREATE TABLE orders_td (
        |  o_orderkey INT NOT NULL,
        |  o_lot VARCHAR(16) NOT NULL,
        |  o_totalprice DOUBLE NOT NULL)""".stripMargin) ++
      (1 to 50).map(i =>
        s"INSERT INTO orders_td VALUES ($i, 'LOT${i % 3}', ${i * 10.5})"))
    u
  }

  test("full-query pushdown: WHERE + TOP run remotely (Utils.scala:820-822)") {
    // the reference's pushed oracle slice: filter + bounded TOP; Derby's
    // TOP spelling is FETCH FIRST n ROWS ONLY
    val df = JdbcSource.readQuery(spark, url,
      """SELECT o_orderkey, o_totalprice FROM orders_td
        |WHERE o_lot = 'LOT1' ORDER BY o_orderkey
        |FETCH FIRST 5 ROWS ONLY""".stripMargin)
    val rows = df.orderBy("o_orderkey").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 4, 7, 10, 13))
    assert(rows.head.getDouble(1) === 10.5)
  }

  test("table scan pushes Catalyst filters into the remote SQL") {
    val df = JdbcSource.readTable(spark, url, "orders_td")
      .where(col("o_lot") === "LOT2")
      .select(col("o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    // Derby uppercases identifiers — match case-insensitively
    assert(plan.toLowerCase.contains("equalto(o_lot,lot2)"),
      s"filter should be pushed:\n$plan")
    assert(df.count() === 17) // i % 3 == 2 for i in 1..50
  }

  test("partitioned read opens range-bounded parallel scans") {
    val df = JdbcSource.readTable(spark, url, "orders_td", Map(
      "partitionColumn" -> "o_orderkey",
      "lowerBound" -> "1", "upperBound" -> "51", "numPartitions" -> "4"))
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 50)
    // no rows lost or duplicated at partition boundaries
    assert(df.agg(countDistinct(col("o_orderkey"))).head().getLong(0) === 50)
  }
}
