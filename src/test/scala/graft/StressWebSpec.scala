package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Warc

/** Scale-proportionality stress for the web-crawl family: replicate
  * the sf0.1 documents corpus R× with shifted unique ids, build REAL
  * WARC shards (gzip members for odd ids), and run the full
  * parse → HTTP split → charset decode → main-text extraction →
  * link-density chain. Checks:
  *
  *  1. outputs scale EXACTLY R× (record counts, per-replica content
  *     identical — replication invariance needs no external oracle);
  *  2. wall time grows ~linearly in R, never quadratically (the chain
  *     is one narrow pass; nothing holds corpus-proportional state).
  *
  * OPT-IN like the other Stress* suites: `sbt -Dgraft.stress=1 test`
  * or GRAFT_STRESS=1; prints timings for BASELINE.md probe records.
  */
class StressWebSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def optedIn: Boolean =
    sys.props.get("graft.stress").contains("1") ||
      sys.env.get("GRAFT_STRESS").contains("1")

  private val sfDir = "/root/testdata/sf0.1"

  private def shardsTimes(r: Int) = {
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    (0 until r).map(i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
          col("text"), col("source")))
      .reduce(_.unionByName(_))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, t0, src) =>
        val t = if (t0 == null) "" else t0
        val html = "<html><head><script>var x=1;</script></head><body>" +
          "<div><a href='/n1'>nav one</a> <a href='/n2'>nav two</a></div>" +
          "<h1>" + src + "</h1><p>" +
          t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;") +
          "</p></body></html>"
        val block = ("HTTP/1.1 200 OK\r\n" +
          "Content-Type: text/html; charset=utf-8\r\n\r\n" + html)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val rec = Warc.WarcSpecRec("response", s"<urn:uuid:r-$id>",
          Some(s"https://Stress.Example/$src/$id?utm_source=s&a=1"),
          "2026-04-01T00:00:00Z", "application/http; msgtype=response",
          block)
        (id, if (id % 2 == 0) Warc.buildWarc(Seq(rec))
             else Warc.buildWarcGz(Seq(rec)))
      }).toDF("doc_id", "payload")
  }

  private def timed[T](what: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"[stress] $what: $sec%.2f s")
    println(f"[stress] $what: $sec%.2f s")
    (r, sec)
  }

  test("warc→html→url chain scales linearly with exact R× outputs") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    def run(r: Int): (Long, Long, Double) = {
      val ((rows, hosts), sec) = timed(s"web chain R=$r") {
        val recs = Warc.recordTable(spark, shardsTimes(r),
          col("doc_id"), col("payload"))
        val out = recs.where(col("warc_type") === "response")
          .select(col("file_id"),
            graft.ops.HtmlExprs.urlHost(col("target_uri")).as("host"),
            graft.ops.HtmlExprs.htmlExtractStats(graft.ops.HtmlExprs
              .charsetDecode(col("http_content_type"), col("body")))
              .as("s"))
          .select(col("file_id"), col("host"),
            length(col("s.txt")).as("n"), col("s.link_ppm"))
        val agg = out.agg(count(lit(1)), countDistinct(col("host")),
          sum(col("n"))).head()
        (agg.getLong(0), agg.getLong(1))
      }
      (rows, hosts, sec)
    }
    run(1) // warmup: codegen + parquet footer caches, not timed against
    val (rows1, hosts1, sec1) = run(1)
    val (rows10, hosts10, sec10) = run(10)
    // exact replication invariance: 10× records, same host universe
    assert(rows10 === rows1 * 10)
    assert(hosts10 === hosts1)
    // ~linear: 10× data must stay well under a 30× wall-clock blowup
    assert(sec10 < sec1 * 30 + 5,
      f"web chain not linear: R=1 $sec1%.2f s vs R=10 $sec10%.2f s")
  }
}
