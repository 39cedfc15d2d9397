package graft.meta

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** In-flight pipeline metrics via Spark's `observe` API — the
  * monitoring twin of the reference's MDS_METRIC status records
  * (MetricDetails.scala:99-145, per-load row/status counters), done the
  * Spark way: counters ride the pipeline's OWN pass as accumulators
  * (CollectMetrics), so a 100 TB curation run reports its row counts,
  * null rates and token totals without a second scan — where a separate
  * metrics query would re-read the corpus.
  *
  * Batch: [[observed]] + [[runAndCollect]] (or read
  * `queryExecution.observedMetrics` after any action on the same
  * QueryExecution). Streaming: the same `observe` column surfaces per
  * micro-batch in `StreamingQueryProgress.observedMetrics` — no extra
  * code path.
  *
  * Constraint (Spark's): observed aggregates cannot use DISTINCT or
  * grouping — count/sum/min/max/avg compositions only.
  */
object PipelineMetrics {

  /** Attach named counters to a frame without changing its rows. */
  def observed(df: DataFrame, name: String,
               metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "at least one metric")
    val cols = metrics.map { case (n, c) => c.as(n) }
    df.observe(name, cols.head, cols.tail: _*)
  }

  /** Standard corpus counters for a documents frame. */
  def corpusCounters(text: Column): Seq[(String, Column)] = Seq(
    "n_docs" -> count(lit(1)),
    "n_null_text" -> count(when(text.isNull, 1)),
    "total_chars" -> coalesce(sum(length(text)), lit(0L)).cast("long"))

  /** Execute the frame (no rows collected — the plan runs through a
    * foreach sink) and return every observation's metric row by name.
    * One action; the metrics are exact, not sampled. */
  def runAndCollect(df: DataFrame): Map[String, Row] = {
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ())
    qe.observedMetrics
  }

  /** Standing-index health after an append: the two signals that say
    * "this index needs a rebuild/compaction" —
    *
    *  - `skew` (max/avg list size): appends assign into lists trained
    *    at build time, so as the data distribution drifts the hot lists
    *    grow unboundedly while query cost is paced by the largest
    *    probed list;
    *  - `files` (parquet files under the table dir): every append adds
    *    one file per touched bucket, and Spark stops trusting per-bucket
    *    SORT once buckets hold multiple files — compaction restores the
    *    sorted-merge property.
    *
    * Grouped maxima are outside `observe`'s aggregate constraint (no
    * grouping allowed), so this is a dedicated probe rather than a
    * rider — but a slim one: it scans ONLY the index's key column
    * (column-pruned bucketed parquet), never signatures or vectors. */
  case class IndexHealth(rows: Long, keys: Long, maxList: Long,
                         avgList: Double, skew: Double, files: Int) {
    override def toString: String =
      f"rows=$rows keys=$keys maxList=$maxList avgList=$avgList%.1f " +
        f"skew=$skew%.1f files=$files"
  }

  /** Probe `index`'s per-`key` list-size distribution + the file count
    * under `dir` (both appended tables in this library keep their files
    * directly under the table directory). The listing goes through the
    * session's Hadoop FileSystem, not java.io.File — an HDFS/S3 index
    * path would otherwise silently report files = 0 forever and the
    * compaction signal would never fire. */
  def indexHealth(index: DataFrame, key: Column, dir: String): IndexHealth = {
    val r = index.groupBy(key).count()
      .agg(coalesce(sum(col("count")), lit(0L)).as("rows"),
        count(lit(1)).as("keys"),
        coalesce(max(col("count")), lit(0L)).as("max"),
        coalesce(avg(col("count")), lit(0.0)).as("avg"))
      .head()
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(
      index.sparkSession.sparkContext.hadoopConfiguration)
    val files =
      if (fs.exists(hp))
        fs.listStatus(hp).count(_.getPath.getName.endsWith(".parquet"))
      else 0
    val (rows, keys, mx, av) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    IndexHealth(rows, keys, mx, av, if (av == 0.0) 0.0 else mx / av, files)
  }
}
