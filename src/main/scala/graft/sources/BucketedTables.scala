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
    * table records them for exactly this reason). */
  def table(spark: SparkSession, name: String, location: String,
            buckets: Int, bucketCol: String,
            sortCols: Seq[String] = Nil): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      val schema = spark.read.parquet(location).schema.toDDL
      val sorted =
        if (sortCols.isEmpty) "" else s"SORTED BY (${sortCols.mkString(", ")}) "
      spark.sql(
        s"""CREATE TABLE $name ($schema) USING PARQUET
           |CLUSTERED BY ($bucketCol) ${sorted}INTO $buckets BUCKETS
           |LOCATION '$location'""".stripMargin)
    }
    spark.table(name)
  }
}
