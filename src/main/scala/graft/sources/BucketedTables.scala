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
    // serialize the whole exists/compare/drop+recreate sequence per
    // table name (intern'd → one JVM-wide monitor per logical table):
    // the mismatch branch below DROPs before it re-registers, and a
    // concurrent table() call — another thread of this session, or a
    // foreachBatch session clone, all sharing this JVM's catalog —
    // could otherwise land in the drop window and fail transiently.
    // JVM scope is the full concurrency surface: the catalog these
    // registrations live in is itself in-memory per JVM.
    name.intern.synchronized {
    if (!spark.catalog.tableExists(name)) register(spark, name, location,
      buckets, bucketCol, sortCols)
    else {
      // a registration can go STALE: another application rebuilds or
      // compacts the index at the same path with a different bucket
      // count, updates params, and this session's next table() call
      // arrives with the new count while the catalog still holds the
      // old spec — planning bucketed joins against the wrong modulus is
      // wrong results, not an error. Compare and re-register on any
      // mismatch; on match, refresh (the index tables are APPENDABLE —
      // appendTo*Index — and appends can run in OTHER sessions, e.g.
      // foreachBatch micro-batch clones, whose cache invalidation never
      // reaches this session's tableRelationCache; one file listing is
      // what a mutable table owes per query anyway).
      val spec = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
        .bucketSpec
      val matches = spec.exists(bs => bs.numBuckets == buckets &&
        bs.bucketColumnNames == Seq(bucketCol) &&
        bs.sortColumnNames == sortCols)
      if (!matches) {
        spark.sql(s"DROP TABLE IF EXISTS $name")
        register(spark, name, location, buckets, bucketCol, sortCols)
      } else spark.catalog.refreshTable(name)
    }
    spark.table(name)
    } // name.intern.synchronized
  }

  private def register(spark: SparkSession, name: String, location: String,
                       buckets: Int, bucketCol: String,
                       sortCols: Seq[String]): Unit = {
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
    ()
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
      if (!df.columns.contains("buckets")) None
      else
        // take(1), not head(): a crashed writeIndex can leave a params
        // table that reads fine but holds zero rows (or a null cell) —
        // the contract is "None when unreadable as params", which must
        // cover half-written just like missing (callers then degrade to
        // the plain, bucketing-less read; correctness is unaffected)
        df.take(1).headOption
          .filter(r => !r.isNullAt(r.fieldIndex("buckets")))
          .map(_.getAs[Int]("buckets"))
    } catch { case scala.util.control.NonFatal(_) => None }
}
