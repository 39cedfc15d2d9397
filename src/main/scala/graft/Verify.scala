package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter: SPARK_GRAFT_VERIFY_ONLY=a,b,c runs just
    // those queries (unset → all, which is what the driver does)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None => SparkEntry.queries
    }
    // failures must be LOUD: a deleted output makes the failed gate
    // vanish from the driver's CORRECTNESS compare entirely (a shrunken
    // all-green file reads as perfect), which is how a 4-operator
    // regression once survived two rounds unflagged. Record every
    // failure machine-readably and reconcile registry vs outputs at exit.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
        // a failure before the write starts leaves a PREVIOUS run's
        // output in place (mode=overwrite never ran) — delete it so the
        // compare can't silently pass on stale results
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        try {
          val d = new java.io.File(s"$outDir/$name")
          if (d.exists()) rm(d)
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] cleanup of $name failed: ${e2.getMessage}")
        }
      }
    }
    // shared escaper (graft.core.Json): a tab or CR in builder-authored
    // SQL would otherwise make the driver's json.load fail and silently
    // zero the round's correctness
    def q(s: String): String = graft.core.Json.str(s)
    // under VERIFY_ONLY the oracle dump must shrink with the selection:
    // a full oracle_sql.json makes the checker fail every unselected
    // query as "no output", burying the one result being iterated on
    val oracles = only match {
      case Some(names) => SparkEntry.oracleSql.filter(o => names(o._1))
      case None => SparkEntry.oracleSql
    }
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // failure artifact + reconciliation: _errors.json lists query →
    // exception for every gate that died, and the missing line compares
    // the selected registry against what actually landed on disk, so an
    // absent output can never masquerade as "not registered"
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    val produced = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    val missing = selected.keySet -- produced
    println(s"[verify] queries=${selected.size} produced=${produced.intersect(selected.keySet).size} " +
      s"failed=${errors.size} missing=${missing.toSeq.sorted.mkString(",")}")
    // exit 0 even on failures: the driver must still DuckDB-compare the
    // gates that did land; _errors.json + the line above carry the alarm

    // environment manifest: when a gate fails only in the driver's env
    // (it happened — 4 gates in round 12), the FIRST question is "what
    // versions ran there"; answer it from the artifact instead of
    // guessing (check_oracle.py prints its DuckDB version for the same
    // reason, and the env_canary gate localizes WHICH construct moved)
    // report-only probes (env_canary et al.): the Spark-computed values
    // land HERE — in _env.json and on stdout — instead of in the
    // counted gate set, because their uncast HUGEINT/DECIMAL columns
    // diverge in some checker envs BY DESIGN (that divergence is the
    // diagnostic). The DuckDB side goes to _probe_sql.json so a judge
    // can re-run the comparison by hand; a drifted construct shows as a
    // changed value in the artifact, not as a permanent red gate.
    val probeValues = SparkEntry.probes.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val rendered = try {
          val df = fn(spark, sfDir)
          val cols = df.columns
          df.collect().toSeq match {
            case Seq(row) =>
              cols.zipWithIndex.map { case (c, i) =>
                s"${q(c)}: ${q(String.valueOf(row.get(i)))}"
              }.mkString("{", ",", "}")
            case rows => s"${q("error")}: ${q(s"expected 1 row, got ${rows.size}")}"
          }
        } catch { case e: Throwable =>
          s"${q("error")}: ${q(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}")}"
        }
        s"${q(name)}: $rendered"
    }.mkString("{", ",", "}")
    val probeSqlJson = SparkEntry.probeSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_probe_sql.json"), probeSqlJson)
    val envJson = (Map(
      "java_version" -> System.getProperty("java.version"),
      "java_vendor" -> System.getProperty("java.vendor"),
      "spark_version" -> org.apache.spark.SPARK_VERSION,
      "scala_version" -> scala.util.Properties.versionNumberString,
      "os" -> (System.getProperty("os.name") + " " +
        System.getProperty("os.version")),
      "timezone" -> java.util.TimeZone.getDefault.getID)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" } ++
      Seq(s"${q("probes")}: $probeValues"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_env.json"), envJson)
    println(s"[verify] env $envJson")
    spark.stop()
  }
}
