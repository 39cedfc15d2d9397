package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-verified checks for the approximate aggregates (their values
  * are approximate by construction, so the driver only rows-checks them):
  * HLL distinct within its standard-error envelope, approximate median
  * within rank tolerance of the exact median. */
class AggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within HLL error of exact") {
    val li = Tables(spark, dir, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    for (r <- rows) {
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"flag ${r.getString(0)}: $a vs $e")
    }
  }

  test("percentile_approx lands within rank tolerance of the exact median") {
    val li = Tables(spark, dir, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((flag, m) <- approx) {
      val e = exact(flag)
      assert(math.abs(m - e) / e < 0.05, s"flag $flag: $m vs $e")
    }
  }

  test("approx_metrics query is deterministic across runs") {
    val q = SparkEntry.queries("approx_metrics")
    val a = q(spark, dir).collect().map(_.toString)
    val b = q(spark, dir).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
