package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.PipelineMetrics

/** Observe-channel metrics: exact agreement with direct aggregation,
  * correct placement semantics (counters measure the frame at the
  * observe point, not the pipeline output). */
class PipelineMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("observed corpus counters equal direct aggregation") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, null.asInstanceOf[String]), (3L, "gamma"))
      .toDF("doc_id", "text")
    val m = PipelineMetrics.runAndCollect(
      PipelineMetrics.observed(docs, "c",
        PipelineMetrics.corpusCounters(col("text"))))("c")
    assert(m.getAs[Long]("n_docs") === 3L)
    assert(m.getAs[Long]("n_null_text") === 1L)
    assert(m.getAs[Long]("total_chars") === ("alpha beta".length + "gamma".length).toLong)
  }

  test("counters measure the observe point, not downstream filters") {
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val observedThenFiltered = PipelineMetrics.observed(docs, "pre",
        Seq("n" -> count(lit(1))))
      .where(col("doc_id") <= 3)
    val m = PipelineMetrics.runAndCollect(observedThenFiltered)
    assert(m("pre").getAs[Long]("n") === 10L,
      "pre-filter observation must count all rows")
  }
}
