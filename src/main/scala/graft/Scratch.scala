package graft

// TEMPORARY experiment main: time one registered gate with warm reps in
// a single JVM — the focused alternative to a full Bench sweep when
// deciding between two plan shapes for one operator.
// Usage: SPARK_GRAFT_QUERY=dedup_clusters SPARK_GRAFT_REPS=5 runMain graft.Scratch
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = sys.env.getOrElse("SPARK_GRAFT_QUERY", "dedup_clusters")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_CONF="k=v;k=v": session confs for A/B experiments
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })

    // SPARK_GRAFT_STAGES=1: per-stage wall breakdown (submission →
    // completion) with task counts — attributes a slow rep to its
    // stages without the UI. Lines are tagged with the rep index AT
    // ENQUEUE time: the listener bus is async, so a drain at rep end
    // would attribute late-completing stages to the next rep.
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var rep = 0
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = for {
              s <- si.submissionTime; c <- si.completionTime
            } yield (c - s) / 1e3
            val m = si.taskMetrics
            val g = si.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("Scratch"))
              .getOrElse("").trim.take(80)
            stages.add(f"[stage r$rep] ${si.stageId}%4d ${wall.getOrElse(-1.0)}%7.3f s " +
              f"tasks=${si.numTasks}%4d run=${m.executorRunTime / 1e3}%7.3f " +
              f"sr=${m.shuffleReadMetrics.totalBytesRead}%9d " +
              f"sw=${m.shuffleWriteMetrics.bytesWritten}%9d $g")
          }
        })

    for (i <- 1 to reps) {
      rep = i
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      stages.forEach(s => println(s)); stages.clear()
    }
    spark.stop()
  }
}
