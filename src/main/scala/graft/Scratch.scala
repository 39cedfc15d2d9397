package graft

// TEMPORARY experiment main: decompose dedup_ngram cost — the eager
// postings checkpoint splits plan-construction (kernel + groupBy(s))
// from the downstream pair/size tail.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup (codegen, parquet footers)
    SparkEntry.queries("dedup_ngram")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) {
      val df = t(s"construct (kernel+groupBy(s)+checkpoint) #$i") {
        SparkEntry.queries("dedup_ngram")(spark, dir)
      }
      t(s"tail (pairs+sizes+joins+noop) #$i") {
        df.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
