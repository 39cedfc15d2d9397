package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog plumbing for the persistent index tables
  * ([[graft.dedup.Dedup.writeMinhashIndex]],
  * [[graft.similarity.Ann.writeIvfIndex]]).
  *
  * `saveAsTable` registration lives in the SESSION catalog — in-memory
  * by default — so it dies with the application that built the index
  * while the bucketed files live on. [[table]] makes the index genuinely
  * persistent: a new application re-registers the external table from
  * the stored files with the original bucket spec (bucket ids are
  * encoded in the file names by Spark's bucketed writer), restoring the
  * shuffle-free join property across restarts.
  */
object BucketedTables {

  /** Stable catalog name for an index component at `path`: md5 of the
    * path string. (A 32-bit `hashCode` birthday-collides across
    * realistic path populations, and SaveMode.Overwrite on a collided
    * name would silently repoint one index at another's data.) */
  def tableName(prefix: String, path: String, part: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${prefix}_${md.take(16)}_$part"
  }

  /** The bucketed table `name` at `location`, re-registering it in this
    * session's catalog from the stored files if absent. `buckets` /
    * `bucketCol` / `sortCols` must match the build (the index params
    * table records them for exactly this reason) — registering a WRONG
    * bucket count would misroute bucketed joins into wrong results,
    * which is why unknown-bucket legacy indexes must go through
    * [[tableOrPlain]] instead. */
  def table(spark: SparkSession, name: String, location: String,
            buckets: Int, bucketCol: String,
            sortCols: Seq[String] = Nil): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      val schema = spark.read.parquet(location).schema.toDDL
      val sorted =
        if (sortCols.isEmpty) "" else s"SORTED BY (${sortCols.mkString(", ")}) "
      // single quotes in the path must escape or the DDL can't parse —
      // the builders accept any path the DataFrame writers accept;
      // IF NOT EXISTS: two racing first-queries both pass the exists
      // check above, and the loser must not crash on a table the winner
      // just registered identically
      val loc = location.replace("'", "''")
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $name ($schema) USING PARQUET
           |CLUSTERED BY ($bucketCol) ${sorted}INTO $buckets BUCKETS
           |LOCATION '$loc'""".stripMargin)
    } else {
      // the index tables are APPENDABLE (appendTo*Index), and appends
      // can run in OTHER sessions — e.g. foreachBatch micro-batch
      // clones, whose cache invalidation never reaches this session's
      // tableRelationCache. Refresh so a query against a just-grown
      // index sees the growth; the cost is one file listing, which a
      // mutable table owes per query anyway.
      spark.catalog.refreshTable(name)
    }
    spark.table(name)
  }

  /** [[table]] when the bucket count is known, a plain parquet read when
    * it is not (an index persisted before bucket counts were recorded):
    * results stay correct, only the shuffle-free join property is
    * lost. */
  def tableOrPlain(spark: SparkSession, name: String, location: String,
                   buckets: Option[Int], bucketCol: String,
                   sortCols: Seq[String] = Nil): DataFrame =
    buckets match {
      case Some(b) => table(spark, name, location, b, bucketCol, sortCols)
      case None => spark.read.parquet(location)
    }

  /** The recorded bucket count of an index params table, if present —
    * None for a missing params file or a pre-bucket-record schema. */
  def readBuckets(spark: SparkSession, paramsPath: String): Option[Int] =
    try {
      val df = spark.read.parquet(paramsPath)
      if (df.columns.contains("buckets"))
        Some(df.head().getAs[Int]("buckets"))
      else None
    } catch { case _: org.apache.spark.sql.AnalysisException => None }
}
