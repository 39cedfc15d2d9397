package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{PipelineMetrics, ProfileState}
import graft.streaming.StreamingIngest

/** ProfileState: persisted histogram folds must answer EXACTLY the
  * quantiles a from-scratch corpus scan answers, across appends,
  * streaming folds (with replay), and both discrete and continuous
  * finishes — plus the loud-failure contract (fractional values,
  * missing path, cap). */
class ProfileStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, s"g${rng.nextInt(3)}",
      rng.nextInt(500).toLong - 100)).toDF("id", "g", "v")
  }

  private val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  test("write + append ≡ from-scratch exact quantiles (both forms)") {
    val df = corpus(600, seed = 11).cache()
    val path = Files.createTempDirectory("graft_ps").resolve("state").toString
    ProfileState.writeProfileStatePerGroup(df.where(col("id") % 3 =!= 0),
      col("g"), col("v"), path)
    ProfileState.appendProfileStatePerGroup(df.where(col("id") % 3 === 0),
      col("g"), col("v"), path)
    val fromState = ProfileState.exactQuantilesPerGroupFromState(spark,
        path, ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    val scratch = PipelineMetrics.exactQuantilesPerGroup(df, col("g"),
        col("v"), ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    assert(fromState === scratch)
    // counts come off the state too
    assert(ProfileState.readProfileState(spark, path)
      .agg(sum(col("n"))).head().getLong(0) === 600L)
    // continuous finish agrees with the from-scratch continuous twin
    val contState = ProfileState.exactQuantilesContPerGroupFromState(spark,
        path, Seq(0.25, 0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val contScratch = PipelineMetrics.exactQuantilesContPerGroup(df,
        col("g"), col("v"), Seq(0.25, 0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(contState === contScratch)
  }

  test("ungrouped form: state quantiles equal scratch quantiles") {
    val df = corpus(400, seed = 13).cache()
    val path = Files.createTempDirectory("graft_psu").resolve("state").toString
    ProfileState.writeProfileState(df.where(col("id") % 2 === 0), col("v"), path)
    ProfileState.appendProfileState(df.where(col("id") % 2 =!= 0), col("v"), path)
    val fromState = ProfileState.exactQuantilesFromState(spark, path, ps)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val scratch = PipelineMetrics.exactQuantiles(df, col("v"), ps)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(fromState === scratch)
  }

  test("streamed fold ≡ from-scratch, and a replayed batch is skipped") {
    val dir = Files.createTempDirectory("graft_ps_stream")
    val in = dir.resolve("in"); Files.createDirectory(in)
    val statePath = dir.resolve("state").toString
    val rng = new scala.util.Random(17)
    val rows = (0 until 150).map(i => (i.toLong, s"g${rng.nextInt(2)}",
      rng.nextInt(300).toLong))
    rows.grouped(50).zipWithIndex.foreach { case (chunk, b) =>
      Files.writeString(in.resolve(s"b$b.json"),
        chunk.map(r => s"""{"id":${r._1},"g":"${r._2}","v":${r._3}}""")
          .mkString("", "\n", "\n"))
    }
    val stream = spark.readStream.schema("id LONG, g STRING, v LONG")
      .option("maxFilesPerTrigger", 1).json(in.toString)
    val q = StreamingIngest.profileStateFold(stream, col("g"), col("v"),
        statePath)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val df = rows.toDF("id", "g", "v").cache()
    val fromState = ProfileState.exactQuantilesPerGroupFromState(spark,
        statePath, ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    val scratch = PipelineMetrics.exactQuantilesPerGroup(df, col("g"),
        col("v"), ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    assert(fromState === scratch)
    assert(ProfileState.stateBatchWatermark(spark, statePath).exists(_ >= 2))
    // manual replay of an already-folded batch must be a no-op
    assert(!ProfileState.appendProfileStatePerGroupBatch(
      df.limit(10), col("g"), col("v"), statePath, batchId = 1L))
    assert(ProfileState.readProfileState(spark, statePath)
      .agg(sum(col("n"))).head().getLong(0) === 150L)
  }

  test("fractional values fail the fold loudly with prior state intact") {
    val path = Files.createTempDirectory("graft_ps_bad")
      .resolve("state").toString
    val good = Seq(1.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    ProfileState.writeProfileState(good, col("v"), path)
    val bad = Seq(1.5, 2.0).map(Tuple1(_)).toDF("v")
    val e = intercept[IllegalArgumentException] {
      ProfileState.appendProfileState(bad, col("v"), path)
    }
    assert(e.getMessage.contains("TRUNCATED"))
    // the failed fold must not have touched the committed state
    assert(ProfileState.readProfileState(spark, path)
      .agg(sum(col("n"))).head().getLong(0) === 3L)
  }

  test("missing path: plain append is loud, batch fold cold-starts") {
    val dir = Files.createTempDirectory("graft_ps_missing")
    val df = Seq(1L, 2L).map(Tuple1(_)).toDF("v")
    intercept[Exception] {
      ProfileState.appendProfileState(df, col("v"),
        dir.resolve("nope").toString)
    }
    val cold = dir.resolve("cold").toString
    assert(ProfileState.appendProfileStateBatch(df, col("v"), cold,
      batchId = 0L))
    assert(ProfileState.readProfileState(spark, cold)
      .agg(sum(col("n"))).head().getLong(0) === 2L)
  }
}
