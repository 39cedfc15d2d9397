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

  test("weighted state fold ≡ weighted from-scratch quantiles; " +
      "negative weights loud with prior state intact") {
    val rng = new scala.util.Random(41)
    val rows = Seq.fill(300)((rng.nextInt(80).toLong, rng.nextInt(5).toLong))
    val df = rows.toDF("v", "w").cache()
    val path = Files.createTempDirectory("graft_psw").resolve("state").toString
    val half = rows.length / 2
    ProfileState.writeProfileState(rows.take(half).toDF("v", "w"),
      col("v"), path, weight = col("w"))
    ProfileState.appendProfileState(rows.drop(half).toDF("v", "w"),
      col("v"), path, weight = col("w"))
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val fromState = ProfileState.exactQuantilesFromState(spark, path, ps)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    val scratch = PipelineMetrics.exactQuantilesWeighted(df, col("v"),
        col("w"), ps)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromState === scratch)
    val total = ProfileState.readProfileState(spark, path)
      .agg(sum(col("n"))).head().getLong(0)
    assert(total === rows.map(_._2).sum)
    // a negative-weight batch must not touch the committed state
    intercept[IllegalArgumentException] {
      ProfileState.appendProfileState(Seq((1L, -2L)).toDF("v", "w"),
        col("v"), path, weight = col("w"))
    }
    assert(ProfileState.readProfileState(spark, path)
      .agg(sum(col("n"))).head().getLong(0) === total)
  }

  test("profileDrift reports per-cell shifts and nulls one-sided groups") {
    val dir = Files.createTempDirectory("graft_ps_drift")
    val pa = dir.resolve("a").toString
    val pb = dir.resolve("b").toString
    // v1: g0 only; v2: g0 shifted up + a NEW group g1
    val v1 = Seq(("g0", 10L), ("g0", 20L), ("g0", 30L)).toDF("g", "v")
    val v2 = Seq(("g0", 10L), ("g0", 20L), ("g0", 30L), ("g0", 100L),
      ("g1", 7L)).toDF("g", "v")
    ProfileState.writeProfileStatePerGroup(v1, col("g"), col("v"), pa)
    ProfileState.writeProfileStatePerGroup(v2, col("g"), col("v"), pb)
    val rows = ProfileState.profileDrift(spark, pa, pb, Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r).toMap
    // g0 p=1.0: max moves 30 -> 100, shift 70; counts 3 -> 4
    val g0max = rows(("g0", 1.0))
    assert(g0max.getLong(2) === 3L && g0max.getLong(4) === 4L)
    assert(g0max.getLong(3) === 30L && g0max.getLong(5) === 100L)
    assert(g0max.getLong(6) === 70L)
    // g0 p=0.5: quantile_disc median of {10,20,30} = 20, of
    // {10,20,30,100} = 20 — shift 0
    assert(rows(("g0", 0.5)).getLong(6) === 0L)
    // g1 exists only in v2: a-side columns and shift are null
    val g1 = rows(("g1", 0.5))
    assert(g1.isNullAt(2) && g1.isNullAt(3) && g1.isNullAt(6))
    assert(g1.getLong(4) === 1L && g1.getLong(5) === 7L)
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
