package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines
      .filter(col(lineCol).contains("spark submit job is "))
      .filter(col(lineCol).contains("successful") || col(lineCol).contains("failed"))
      .select(
        regexp_extract(col(lineCol), JobRe, 1).as("job_seq_key"),
        element_at(split(regexp_extract(col(lineCol), StatusRe, 1), " "), 5)
          .as("jobStatus"),
        element_at(split(regexp_extract(col(lineCol), ExitCodeRe, 1), " "), 2)
          .as("exitCode"))

  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}
