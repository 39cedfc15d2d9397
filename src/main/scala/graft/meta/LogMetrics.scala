package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regex log analytics — the reference's driver-only `MetricDetails`
  * pipeline (MetricDetails.scala:21-64) as a distributed column plan:
  * filter significant lines, pull (job_seq_key, jobStatus, exitCode)
  * with the reference's three extraction regexes
  * (MetricDetails.scala:30, 38, 46).
  */
object LogMetrics {
  /** 6-12 digit job key (MetricDetails.scala:30). */
  final val JobRe = "([0-9]{6,12})"
  /** Five-word status phrase; the status word is token 5
    * (MetricDetails.scala:38-41). */
  final val StatusRe =
    "([a-zA-Z]{5,6} [a-zA-Z]{6,7} [a-zA-Z]{3,4} [a-zA-Z]{2,3} [a-zA-Z]{6,10})"
  /** `code <n>` tail (MetricDetails.scala:46-49). */
  final val ExitCodeRe = "([a-zA-Z]{4,5} [0-9]{1,3})"

  /** Missing-match fallbacks, verbatim from the reference
    * (MetricDetails.scala:33-35, 42-43, 50-51). Note: on the documented
    * log-line shape (`…job is <key> batch is successful…`) the status
    * regex cannot match — the interposed numeric key breaks the 5-word
    * alpha window — so the reference itself would return the status
    * fallback there; reproduced faithfully. */
  final val MissingJob = "Missing job_seq_key Number"
  final val MissingStatus = "Missing status metrics"
  final val MissingExit = "Missing Exit Code"

  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    def matched(re: String, pick: Column => Column, fallback: String) = {
      val m = regexp_extract(col(lineCol), re, 1)
      when(m =!= "", pick(m)).otherwise(lit(fallback))
    }
    lines
      .filter(col(lineCol).contains("spark submit job is "))
      .filter(col(lineCol).contains("successful") || col(lineCol).contains("failed"))
      .select(
        matched(JobRe, identity, MissingJob).as("job_seq_key"),
        matched(StatusRe, m => element_at(split(m, " "), 5), MissingStatus)
          .as("jobStatus"),
        matched(ExitCodeRe, m => element_at(split(m, " "), 2), MissingExit)
          .as("exitCode"))
  }

  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}
