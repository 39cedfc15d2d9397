package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BucketedTables

/** Catalog plumbing for the persistent bucketed index tables: stale
  * registrations must be detected (a bucket-count mismatch misroutes
  * bucketed joins into wrong results), and params-table reads must
  * degrade to None on every half-written shape. */
class BucketedTablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a stale bucket-spec registration is dropped and re-registered") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bt").toString
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v")
      .repartition(4, col("doc_id"))
      .write.mode("overwrite")
      .bucketBy(4, "doc_id").saveAsTable("graft_bt_stale_build")
    val loc = spark.sql("DESCRIBE TABLE EXTENDED graft_bt_stale_build")
      .where(col("col_name") === "Location")
      .select(col("data_type")).head().getString(0)
    val name = "graft_bt_stale"
    // first registration: 4 buckets
    BucketedTables.table(spark, name, loc, buckets = 4, bucketCol = "doc_id")
    def numBuckets: Int = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
      .bucketSpec.map(_.numBuckets).getOrElse(-1)
    assert(numBuckets === 4)
    // the same name re-requested with a DIFFERENT spec (a rebuild
    // elsewhere changed the bucket count): must re-register, not
    // silently keep planning against 4
    BucketedTables.table(spark, name, loc, buckets = 8, bucketCol = "doc_id")
    assert(numBuckets === 8)
    // matching spec: stays registered (refresh path)
    BucketedTables.table(spark, name, loc, buckets = 8, bucketCol = "doc_id")
    assert(numBuckets === 8)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql("DROP TABLE IF EXISTS graft_bt_stale_build")
    val _ = dir
  }

  test("readBuckets degrades to None on missing, empty, and null params") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bt_params")
    // missing path
    assert(BucketedTables.readBuckets(spark,
      dir.resolve("nope").toString).isEmpty)
    // present but ZERO rows — the footprint of a writeIndex that died
    // between creating the params table and landing its single row
    val empty = dir.resolve("empty").toString
    Seq((1, 2)).toDF("buckets", "k").where(lit(false))
      .write.parquet(empty)
    assert(BucketedTables.readBuckets(spark, empty).isEmpty)
    // present with a null buckets cell
    val nul = dir.resolve("null").toString
    Seq((None: Option[Int], 2)).toDF("buckets", "k").write.parquet(nul)
    assert(BucketedTables.readBuckets(spark, nul).isEmpty)
    // healthy
    val ok = dir.resolve("ok").toString
    Seq((16, 2)).toDF("buckets", "k").write.parquet(ok)
    assert(BucketedTables.readBuckets(spark, ok).contains(16))
  }
}
