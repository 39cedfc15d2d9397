package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary: every registered gate must still RESOLVE
  * against the current testdata. Building the DataFrame and forcing
  * analysis (no execution) catches a testdata regeneration that changes
  * a column's dtype — exactly the `ts: timestamp[us]` drift that broke
  * four temporal gates across rounds 7-8 while every other suite stayed
  * green, because nothing exercised the full registry against the live
  * fixture schemas. Seconds at sf0.001, and it fails the moment any
  * `SparkEntry.queries` entry stops analyzing. */
class FixtureCanarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("every registered query analyzes against the live fixture schemas") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          // analysis only — resolves columns and types against the real
          // parquet schemas without running the job. Builders with eager
          // model-fitting steps (index builds, k-means seeds) do run
          // those, but at sf0.001 that is cheap and itself canary-worthy.
          fn(spark, dir).queryExecution.analyzed
          None
        } catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} gate(s) no longer resolve against $dir:\n" +
        failures.mkString("\n"))
  }
}
