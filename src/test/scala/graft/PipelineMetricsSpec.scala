package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.PipelineMetrics

/** Observe-channel metrics: exact agreement with direct aggregation,
  * correct placement semantics (counters measure the frame at the
  * observe point, not the pipeline output). */
class PipelineMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("observed corpus counters equal direct aggregation") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, null.asInstanceOf[String]), (3L, "gamma"))
      .toDF("doc_id", "text")
    val m = PipelineMetrics.runAndCollect(
      PipelineMetrics.observed(docs, "c",
        PipelineMetrics.corpusCounters(col("text"))))("c")
    assert(m.getAs[Long]("n_docs") === 3L)
    assert(m.getAs[Long]("n_null_text") === 1L)
    assert(m.getAs[Long]("total_chars") === ("alpha beta".length + "gamma".length).toLong)
  }

  test("counters measure the observe point, not downstream filters") {
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val observedThenFiltered = PipelineMetrics.observed(docs, "pre",
        Seq("n" -> count(lit(1))))
      .where(col("doc_id") <= 3)
    val m = PipelineMetrics.runAndCollect(observedThenFiltered)
    assert(m("pre").getAs[Long]("n") === 10L,
      "pre-filter observation must count all rows")
  }

  test("index appends report growing health telemetry (skew + files)") {
    import graft.dedup.Dedup
    val path = java.nio.file.Files
      .createTempDirectory("graft_idx_health").toString + "/mh"
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    Dedup.writeMinhashIndex(docs.where(col("doc_id") < 300),
      col("doc_id"), col("text"), path, buckets = 4)
    val baseFiles = Option(new java.io.File(s"$path/bands").listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))

    val h1 = Dedup.appendToMinhashIndex(
      docs.where(col("doc_id") >= 300 && col("doc_id") < 400),
      col("doc_id"), col("text"), path).get
    val h2 = Dedup.appendToMinhashIndex(
      docs.where(col("doc_id") >= 400),
      col("doc_id"), col("text"), path).get

    // rows monotone across appends, and the numbers are REAL aggregates
    // (cross-check h2 against a direct recount of the stored table)
    assert(h1.rows > 0 && h2.rows > h1.rows)
    val stored = spark.read.parquet(s"$path/bands")
    assert(h2.rows === stored.count())
    assert(h2.keys === stored.select(col("bandKey")).distinct().count())
    // skew is max/avg of the band-list sizes — ≥ 1 whenever rows exist
    assert(h1.skew >= 1.0 && h2.skew >= 1.0)
    assert(h2.maxList >= h2.avgList && h2.avgList > 0.0)
    // every append adds one file per touched bucket: the fragmentation
    // counter must grow strictly with each append (the compaction signal)
    assert(h1.files > baseFiles, s"append 1: ${h1.files} vs base $baseFiles")
    assert(h2.files > h1.files, s"append 2: ${h2.files} vs ${h1.files}")
    // high-frequency ingestion opts out of the O(index) probe
    assert(Dedup.appendToMinhashIndex(
      docs.where(col("doc_id") < 10), col("doc_id"), col("text"), path,
      probeHealth = false).isEmpty)
  }

  test("exactQuantiles matches a driver-side sorted brute force") {
    import graft.meta.PipelineMetrics
    val rng = new scala.util.Random(17)
    val vals = Seq.fill(500)(rng.nextInt(40).toLong - 10)
    val df = vals.map(Tuple1(_)).toDF("v")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)
    val got = PipelineMetrics.exactQuantiles(df, col("v"), ps)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    val n = vals.length
    ps.foreach { p =>
      val rank = math.min(n - 1, math.max(0, math.ceil(p * n).toInt - 1))
      assert(got(p) === sorted(rank), s"p=$p")
    }
    // cast-null values are excluded, empty input yields no rows
    val mixed = Seq("3", "junk", "1", "2").map(Tuple1(_)).toDF("v")
    val m = PipelineMetrics.exactQuantiles(mixed, col("v"), Seq(0.5))
      .head()
    assert(m.getLong(1) === 2L && m.getLong(2) === 3L)
    assert(PipelineMetrics.exactQuantiles(df.limit(0), col("v"), Seq(0.5))
      .count() === 0L)
  }

  test("exactQuantilesCont matches the interpolated brute force") {
    import graft.meta.PipelineMetrics
    val rng = new scala.util.Random(19)
    val vals = Seq.fill(501)(rng.nextInt(1000).toLong - 300)
    val df = vals.map(Tuple1(_)).toDF("v")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)
    val got = PipelineMetrics.exactQuantilesCont(df, col("v"), ps)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    val n = vals.length
    ps.foreach { p =>
      val h = p * (n - 1).toDouble
      val lo = math.floor(h).toInt
      val frac = h - lo
      val want =
        if (frac == 0.0) sorted(lo).toDouble
        else sorted(lo) + frac * (sorted(math.min(lo + 1, n - 1)) - sorted(lo)).toDouble
      assert(got(p) === want, s"p=$p")
    }
    // degenerate single-value input: every p returns that value
    val one = Seq(7L).map(Tuple1(_)).toDF("v")
    assert(PipelineMetrics.exactQuantilesCont(one, col("v"), Seq(0.0, 0.5, 1.0))
      .collect().forall(_.getDouble(1) === 7.0))
    assert(PipelineMetrics.exactQuantilesCont(df.limit(0), col("v"), Seq(0.5))
      .count() === 0L)
  }

  test("exactQuantilesContPerGroup matches per-group interpolation") {
    import graft.meta.PipelineMetrics
    val rng = new scala.util.Random(29)
    val rows = Seq.fill(400)((s"g${rng.nextInt(3)}", rng.nextInt(200).toLong))
    val df = rows.toDF("g", "v")
    val ps = Seq(0.25, 0.5, 0.9)
    val got = PipelineMetrics.exactQuantilesContPerGroup(df, col("g"),
        col("v"), ps)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    rows.groupBy(_._1).foreach { case (g, grows) =>
      val sorted = grows.map(_._2).sorted
      val n = sorted.length
      ps.foreach { p =>
        val h = p * (n - 1).toDouble
        val lo = math.floor(h).toInt
        val frac = h - lo
        val want =
          if (frac == 0.0) sorted(lo).toDouble
          else sorted(lo) + frac * (sorted(math.min(lo + 1, n - 1)) - sorted(lo)).toDouble
        assert(got((g, p)) === want, s"g=$g p=$p")
      }
    }
  }

  test("exactQuantilesPerGroup matches per-group sorted brute force") {
    import graft.meta.PipelineMetrics
    val rng = new scala.util.Random(23)
    val rows = Seq.fill(400)((s"g${rng.nextInt(3)}", rng.nextInt(25).toLong))
    val df = rows.toDF("g", "v")
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    val got = PipelineMetrics.exactQuantilesPerGroup(df, col("g"), col("v"), ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    rows.groupBy(_._1).foreach { case (g, grows) =>
      val sorted = grows.map(_._2).sorted
      val n = sorted.length
      ps.foreach { p =>
        val rank = math.min(n - 1, math.max(0, math.ceil(p * n).toInt - 1))
        assert(got((g, p)) === sorted(rank), s"g=$g p=$p")
      }
    }
  }

  test("fractional values fail the quantile cast loudly, never truncate") {
    import graft.meta.PipelineMetrics
    val df = Seq(1.5, 2.0, 3.99).map(Tuple1(_)).toDF("v")
    val e = intercept[IllegalArgumentException] {
      PipelineMetrics.exactQuantiles(df, col("v"), Seq(0.5))
    }
    assert(e.getMessage.contains("TRUNCATED"))
    // integral doubles are NOT lossy and pass
    val ok = Seq(1.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    assert(PipelineMetrics.exactQuantiles(ok, col("v"), Seq(0.5))
      .head().getLong(1) === 2L)
  }

  test("exactQuantilesWeighted equals quantiles of the weight-expanded " +
      "multiset") {
    import graft.meta.PipelineMetrics
    val rng = new scala.util.Random(31)
    val rows = Seq.fill(300)((rng.nextInt(60).toLong - 20,
      rng.nextInt(5).toLong)) // weights 0..4, zeros excluded naturally
    val df = rows.toDF("v", "w")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)
    val got = PipelineMetrics.exactQuantilesWeighted(df, col("v"), col("w"), ps)
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    val n = expanded.length
    ps.foreach { p =>
      val rank = math.min(n - 1, math.max(0, math.ceil(p * n).toInt - 1))
      assert(got(p) === ((expanded(rank), n.toLong)), s"p=$p")
    }
    // weight 1 ≡ the unweighted form
    val w1 = PipelineMetrics.exactQuantilesWeighted(df, col("v"), lit(1L), ps)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val uw = PipelineMetrics.exactQuantiles(df, col("v"), ps)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(w1 === uw)
    // per-group form matches the per-group expansion
    val gdf = rows.zipWithIndex
      .map { case ((v, w), i) => (s"g${i % 2}", v, w) }.toDF("g", "v", "w")
    val gotG = PipelineMetrics.exactQuantilesWeightedPerGroup(gdf, col("g"),
        col("v"), col("w"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.zipWithIndex.groupBy(_._2 % 2).foreach { case (gi, grows) =>
      val exp = grows.flatMap { case ((v, w), _) => Seq.fill(w.toInt)(v) }.sorted
      val rank = math.min(exp.length - 1,
        math.max(0, math.ceil(0.5 * exp.length).toInt - 1))
      assert(gotG(s"g$gi") === exp(rank), s"g$gi")
    }
    // loud contracts: negative and fractional weights
    intercept[IllegalArgumentException] {
      PipelineMetrics.exactQuantilesWeighted(
        Seq((1L, -1L)).toDF("v", "w"), col("v"), col("w"), Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      PipelineMetrics.exactQuantilesWeighted(
        Seq((1L, 1.5)).toDF("v", "w"), col("v"), col("w"), Seq(0.5))
    }
  }

  test("ppm weighted quantiles: integer-exact ranks, agree with the " +
      "Double form, and survive weights beyond 2^53") {
    import graft.meta.PipelineMetrics
    val rng = new scala.util.Random(47)
    val rows = Seq.fill(200)((rng.nextInt(40).toLong, rng.nextInt(7).toLong))
    val df = rows.toDF("v", "w")
    val psPpm = Seq(0L, 100000L, 250000L, 500000L, 900000L, 999000L, 1000000L)
    val got = PipelineMetrics.exactQuantilesWeightedPpm(df, col("v"),
        col("w"), psPpm)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    val n = expanded.length.toLong
    psPpm.foreach { ppm =>
      val rank = ((BigInt(n) * ppm + 999999L) / 1000000L)
        .max(1).min(BigInt(n)).toInt
      assert(got(ppm) === ((expanded(rank - 1), n)), s"ppm=$ppm")
    }
    // the Double wrapper routes through the SAME integer arithmetic
    val viaDouble = PipelineMetrics.exactQuantilesWeighted(df, col("v"),
        col("w"), Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.999, 1.0))
      .collect()
      .map(r => math.round(r.getDouble(0) * 1e6) -> r.getLong(1)).toMap
    assert(viaDouble === got.view.mapValues(_._1).toMap)
    // a non-ppm-representable p fails loudly instead of answering a
    // nearby quantile
    val e = intercept[IllegalArgumentException] {
      PipelineMetrics.exactQuantilesWeighted(df, col("v"), col("w"),
        Seq(1.0 / 3.0))
    }
    assert(e.getMessage.contains("ppm"))
    // total weight beyond 2^53: a Double rank product would be wrong
    // here; the BigInt path is exact. W = 2^60 split over two levels.
    val big = (1L << 59)
    val levels = Seq((10L, big), (20L, big))
    val r = graft.core.Refine.quantileValuesPpm(levels,
      Seq(500000L, 500001L, 1000000L))
    assert(r === Seq((500000L, 10L, big * 2), (500001L, 20L, big * 2),
      (1000000L, 20L, big * 2)))
  }

  test("weighted Double-p API keeps one row per REQUESTED p, in caller " +
      "order, duplicates included") {
    import graft.meta.PipelineMetrics
    val df = Seq((1L, 2L), (2L, 3L), (3L, 5L)).toDF("v", "w")
    val ps = Seq(0.9, 0.25, 0.25, 0.5) // unsorted, with a duplicate
    val got = PipelineMetrics.exactQuantilesWeighted(df, col("v"), col("w"), ps)
      .collect().map(_.getDouble(0)).toSeq
    assert(got === ps, "row-per-p contract: caller order, dups preserved")
    val gotG = PipelineMetrics.exactQuantilesWeightedPerGroup(
        Seq(("a", 1L, 2L), ("b", 2L, 3L)).toDF("g", "v", "w"),
        col("g"), col("v"), col("w"), ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(gotG.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap ===
      Map("a" -> ps, "b" -> ps), "per-group: same contract per group")
  }

  test("invalid ps fail loudly even on an empty frame") {
    import graft.meta.PipelineMetrics
    val empty = Seq.empty[Long].map(Tuple1(_)).toDF("v")
    val e = intercept[IllegalArgumentException] {
      PipelineMetrics.exactQuantiles(empty, col("v"), Seq(1.5))
    }
    assert(e.getMessage.contains("[0,1]"))
    intercept[IllegalArgumentException] {
      PipelineMetrics.exactQuantiles(empty, col("v"), Seq.empty)
    }
  }
}
