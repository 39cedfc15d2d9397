package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{KvOps, PackAggregate}

/** The native TypedImperativeAggregate pack must be value-identical to
  * the declarative expression fusion on real data. */
class PackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native pack aggregate ≡ declarative packAgg on lineitem") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey").cast("string").as("k"),
        col("l_returnflag").as("q"),
        concat_ws(",", col("l_linenumber"),
          col("l_quantity").cast("decimal(12,2)")).as("v"))
    val native = li.groupBy("k", "q")
      .agg(PackAggregate.packAggNative(col("v"), delim = "|").as("cell"))
    val declarative = li.groupBy("k", "q")
      .agg(KvOps.packAgg(col("v"), delim = "|").as("cell"))
    assert(native.except(declarative).count() === 0)
    assert(declarative.except(native).count() === 0)
    assert(native.count() === declarative.count())
  }

  test("native pack handles empty strings and single-row groups") {
    val df = Seq(("a", ""), ("a", "x"), ("b", "solo")).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(PackAggregate.packAggNative(col("v"), delim = "|").as("cell"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") === "2|\nx")
    assert(out("b") === "1|solo")
  }
}
