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
}
