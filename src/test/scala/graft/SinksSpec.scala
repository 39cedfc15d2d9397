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

  test("append text sink accumulates batches") {
    val dir = Files.createTempDirectory("graft_sinks2").resolve("t").toString
    Sinks.appendText(Seq("x").toDF("v"), dir)
    Sinks.appendText(Seq("y").toDF("v"), dir)
    assert(spark.read.text(dir).count() === 2)
  }
}
