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

  private val sfNames = Seq("sf0.001", "sf0.01", "sf0.1")

  /** Row-count-shape violations across SFs, parameterized on the path
    * resolver so the self-check below can aim it at a truncated copy.
    * Bands, not exact counts: a reseeded regeneration may legitimately
    * move counts, but a TRUNCATED one (the drift schema identity can't
    * see) collapses a scale step toward ratio 1 and must fail.
    * Current shape: region/nation are fixed-cardinality at every SF;
    * documents/embeddings share sf0.001/sf0.01 counts (500 rows) and
    * scale on the top step (10× / 4×); everything else steps ~10×. */
  private def countDrift(tables: Seq[String],
                         pathOf: (String, String) => String): Seq[String] = {
    val fixed = Set("region", "nation")
    val flatBottom = Set("documents", "embeddings")
    tables.flatMap { t =>
      val c = sfNames.map(sf => spark.read.parquet(pathOf(sf, t)).count())
      val issues = scala.collection.mutable.Buffer.empty[String]
      if (c.exists(_ == 0L)) issues += s"$t: empty fixture $c"
      else if (fixed(t)) {
        if (c.distinct.size != 1)
          issues += s"$t: fixed-cardinality table drifted across SFs $c"
      } else {
        val bottom = c(1).toDouble / c(0)
        val top = c(2).toDouble / c(1)
        val topLo = if (t == "embeddings") 2.0 else 5.0
        if (top < topLo || top > 40.0)
          issues += s"$t: sf0.1/sf0.01 step $top outside [$topLo, 40] $c"
        if (flatBottom(t)) {
          if (bottom < 1.0)
            issues += s"$t: sf0.01 smaller than sf0.001 $c"
        } else if (bottom < 5.0 || bottom > 40.0)
          issues += s"$t: sf0.01/sf0.001 step $bottom outside [5, 40] $c"
      }
      issues
    }
  }

  test("row counts keep their cross-SF scale shape") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val drifted = countDrift(tables,
      (sf, t) => s"/root/testdata/$sf/$t.parquet")
    assert(drifted.isEmpty,
      s"fixture row-count drift across scale factors:\n${drifted.mkString("\n")}")
  }

  test("the count canary actually fires on a truncated regeneration") {
    // self-check: a sf0.1 lineitem cut to sf0.01 size passes the schema
    // canary (identical columns) but must fail the count canary —
    // otherwise the canary is decoration
    val tmp = java.nio.file.Files.createTempDirectory("graft_canary")
      .resolve("lineitem.parquet").toString
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .write.mode("overwrite").parquet(tmp)
    val drifted = countDrift(Seq("lineitem"), {
      case ("sf0.1", _) => tmp
      case (sf, t) => s"/root/testdata/$sf/$t.parquet"
    })
    assert(drifted.nonEmpty,
      "a truncated sf0.1 lineitem slipped past the count canary")
    assert(drifted.head.contains("step"), drifted.head)
  }
}
