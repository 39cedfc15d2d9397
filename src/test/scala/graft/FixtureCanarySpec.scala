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

  test("table schemas agree across every scale factor") {
    // the analysis canary above runs at sf0.001 only; a regeneration
    // that drifts just sf0.01 (where the driver verifies) or sf0.1
    // (where the bench runs) would slip past it. Schema identity across
    // SFs makes one-SF analysis representative of all three.
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val drifted = tables.flatMap { t =>
      val schemas = sfs.map(sf =>
        sf -> spark.read.parquet(s"$sf/$t.parquet").schema)
      val distinct = schemas.map(_._2).distinct
      if (distinct.size == 1) None
      else Some(s"$t: " + schemas.map { case (sf, sc) =>
        s"$sf -> ${sc.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")}"
      }.mkString(" | "))
    }
    assert(drifted.isEmpty,
      s"fixture schema drift across scale factors:\n${drifted.mkString("\n")}")
  }
}
