package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Delims
import graft.sinks.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("delimiter-rewrite export translates \\0 to commas with header row") {
    val dir = Files.createTempDirectory("graft_sinks")
    val lines = Seq(
      Seq("a", "b", "c").mkString(Delims.Delim),
      Seq("1", "2", "3").mkString(Delims.Delim)).toDF("line")
    val out = dir.resolve("export").toString
    Sinks.delimiterRewriteCsv(lines, "line", out,
      withNumericHeader = true, headerWidth = 5)
    val written = spark.read.text(out).as[String].collect().toSet
    assert(written.contains("a,b,c"))
    assert(written.contains("1,2,3"))
    assert(written.contains("0,1,2,3,4"))
  }

  test("delimiter-rewrite single-file guard rejects oversized frames") {
    val dir = Files.createTempDirectory("graft_sinks_guard")
    val lines = (1 to 10).map(i => s"r$i").toDF("line")
    val err = intercept[IllegalArgumentException] {
      Sinks.delimiterRewriteCsv(lines, "line", dir.resolve("one").toString,
        singleFileMaxRows = 5L)
    }
    assert(err.getMessage.contains("singleFile = false"))
    // the sharded escape hatch takes the same frame without the funnel
    val sharded = dir.resolve("sharded").toString
    Sinks.delimiterRewriteCsv(lines.repartition(4), "line", sharded,
      singleFile = false, singleFileMaxRows = 5L)
    assert(spark.read.text(sharded).count() === 10)
    // a cap beyond Int.MaxValue tightens to the enforceable bound instead
    // of silently disabling the guard; the probe arithmetic (cap+1 as an
    // Int) must not overflow on the way
    val big = dir.resolve("bigcap").toString
    Sinks.delimiterRewriteCsv(lines, "line", big,
      singleFileMaxRows = Long.MaxValue)
    assert(spark.read.text(big).count() === 10)
  }

  test("sharded export writes per-shard sorted files plus a manifest") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_sinks3").resolve("export").toString
    // shuffled input: the export must impose the (shard, pos) order itself
    val rows = (0 until 400).map(i => (i.toLong, i % 7, (997 - i * 13) % 400))
    val df = rows.toDF("doc_id", "shard", "pos").orderBy(rand(42))
    Sinks.shardedExport(df, "shard", "pos", dir)

    // partitioned layout + every shard's rows present
    val back = spark.read.parquet(dir)
    assert(back.count() === 400)
    assert(back.select("shard").distinct().count() === 7)

    // rows inside each written FILE are sorted by pos (the replay order)
    val files = back.select(col("shard"),
        org.apache.spark.sql.functions.input_file_name().as("f"), col("pos"))
      .collect().groupBy(r => (r.getInt(0), r.getString(1)))
    files.foreach { case ((shard, f), rs) =>
      val ps = rs.map(_.getInt(2)).toSeq
      assert(ps === ps.sorted, s"file $f of shard $shard is not pos-sorted")
    }

    // manifest counts match the data
    val manifest = spark.read.parquet(s"$dir/_manifest")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(manifest === expected)
  }

  test("jsonl export round-trips through a json reader") {
    val dir = Files.createTempDirectory("graft_sinks4").resolve("jl").toString
    val df = Seq((1L, "alpha", 0.5), (2L, "beta \"quoted\"", -1.25))
      .toDF("doc_id", "text", "score")
    Sinks.jsonlExport(df, dir)
    val back = spark.read.schema("doc_id LONG, text STRING, score DOUBLE")
      .json(dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back === Set((1L, "alpha", 0.5), (2L, "beta \"quoted\"", -1.25)))
  }

  test("jsonl export keeps null-valued keys (uniform object shape)") {
    val dir = Files.createTempDirectory("graft_sinks5").resolve("jl").toString
    Sinks.jsonlExport(
      Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("doc_id", "text"),
      dir)
    val lines = spark.read.text(dir).as[String].collect().sorted
    assert(lines.exists(_.contains("\"text\":null")),
      s"null field must be serialized, got: ${lines.mkString(" | ")}")
  }

  test("compaction merges small files into sorted range partitions") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_sinks6")
    val src = dir.resolve("src").toString
    // 20 tiny files, unsorted ids
    (0 until 20).foreach { i =>
      (0 until 50).map(j => (997L - (i * 50 + j) * 13 % 1000, s"v$i-$j"))
        .toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val before = spark.read.parquet(src)
    val beforeFiles = before.select(input_file_name()).distinct().count()
    assert(beforeFiles >= 20)

    val dest = dir.resolve("dest").toString
    Sinks.compactTo(spark, src, dest, Seq("k"), targetFileBytes = 1L << 40)
    val after = spark.read.parquet(dest)
    assert(after.count() === before.count())
    // content preserved exactly
    assert(after.orderBy("k", "v").collect().map(_.toSeq).toSeq ===
      before.orderBy("k", "v").collect().map(_.toSeq).toSeq)
    // one target-sized file, sorted within
    assert(after.select(input_file_name()).distinct().count() === 1)
    val ks = after.select("k").collect().map(_.getLong(0)).toSeq
    assert(ks === ks.sorted)
  }

  test("append text sink accumulates batches") {
    val dir = Files.createTempDirectory("graft_sinks2").resolve("t").toString
    Sinks.appendText(Seq("x").toDF("v"), dir)
    Sinks.appendText(Seq("y").toDF("v"), dir)
    assert(spark.read.text(dir).count() === 2)
  }
}
