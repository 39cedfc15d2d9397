package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.{ImageHash, Multimodal}
import graft.similarity.{Ann, Pq, Quantize, SemDedup}
import graft.text.TextOps

/** Training-data-pipeline extensions (BASELINE.json north star): dedup,
  * similarity search, text analysis, multimodal plumbing — first-class
  * operators alongside the SURVEY §2 parity surface.
  *
  * Oracle policy: SQL-expressible ops carry a DuckDB oracle; ops built on
  * 64-bit engine hashes (xxhash64 minhash/simhash/LSH) are engine-verified
  * by the scalatest suites (recall/agreement against exact algorithms)
  * and get the driver's rows-only check.
  */
object ExtensionQueries {

  /** Build-once-per-JVM cache for the persistent-index gate queries:
    * the index build is the amortized part of the feature, and repeated
    * query invocations (Verify + Bench + Explain in one session) must
    * not leak temp dirs or catalog tables. Race safety lives in the
    * shared [[Memo]]. */
  private class IndexCache(prefix: String, build: (SparkSession, String, String) => Unit) {
    private val cache = new Memo[String, String]
    def apply(s: SparkSession, dir: String): String = cache(dir) {
      val tmp = java.nio.file.Files.createTempDirectory(prefix)
      IndexCache.cleanupAtExit(tmp)
      build(s, dir, tmp.toString + "/idx")
      tmp.toString + "/idx"
    }
  }

  private[queries] object IndexCache {
    private val tmpDirs =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[java.nio.file.Path]())
    // one JVM hook deleting every gate-index temp dir — a Verify + Bench
    // + Explain session must not leak graft_gate_* dirs. The catalog
    // tables registered over these paths live in the in-memory session
    // catalog and die with the JVM; only the files need cleanup.
    private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
      new Thread(() => tmpDirs.forEach { p =>
        try {
          java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case _: Throwable => () } // best-effort at JVM exit
      }, "graft-index-cache-cleanup"))
    def cleanupAtExit(p: java.nio.file.Path): Unit = { hook; tmpDirs.add(p) }
  }

  /** Memoized row count per (data dir, table) — the corpus-size
    * constant gates feed into integer-exact scoring and fraction-scaled
    * overscans. One scan per JVM per (dir, table); in production this
    * is a manifest value. */
  private val tableCountFor = {
    val cache = new Memo[(String, String), Long]
    (s: SparkSession, dir: String, table: String) =>
      cache((dir, table))(Tables(s, dir, table).count())
  }

  /** Overscan for the `_full` ANN gates, sized so the ADC prefilter
    * keeps 64% of the corpus as candidates at ANY fixture SF —
    * `overscan·k = 0.64·N` — instead of a fixed count whose
    * equality-with-brute-force premise silently decays with scale (a
    * fixed overscan that kept 48% of the sf0.01 corpus keeps 12% at
    * sf0.1, and borderline true neighbors fall below the ADC line).
    * 64% is MEASURED, not guessed: on this near-uniform corpus a 48%
    * keep-rate drops 2 true neighbors at sf0.1 (ADC percentile
    * displacement grows as the similarity distribution densifies), 64%
    * drops none at any fixture SF. */
  private def fullProbeOverscan(s: SparkSession, dir: String, k: Int): Int =
    math.ceil(0.64 * tableCountFor(s, dir, "embeddings") / k).toInt

  /** Memoized PQ codebook per data dir: training is the one-time
    * amortized part of the PQ feature (the analogue of the persistent
    * indexes' build step), so repeated `ann_pq` invocations in one
    * session — and the bench's timed runs after its warmup — pay only
    * the encode/ADC query. Deterministic (decimal-exact Lloyd), so the
    * memoized model is identical to a fresh train. */
  private val pqModelFor = {
    val cache = new Memo[String, Pq.Model]
    (s: SparkSession, dir: String) => cache(dir)(Pq.train(
      Tables(s, dir, "embeddings")
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
      col("cid"), col("cvec"), dim = 64, m = 8, k = 16, iters = 2))
  }

  /** The per-query invariant frame behind the production-parameter ANN
    * gates (ann_lsh/ann_pq/ann_ivf/ann_index_query/ann_ivfpq): the
    * approximate result set itself is engine-specific (which neighbors
    * a probe/band/ADC pass surfaces is not SQL-recomputable — the
    * exhaustive `_full` twins pin equality with brute force), but two
    * facts about it ARE exact and oracle-checkable at any SF: every
    * query returns exactly k rows (candidates are abundant at every
    * fixture SF), and every returned `sim` equals the exact cosine of
    * its (query, candidate) pair within the output rounding — the
    * final re-rank is exact in all five variants. */
  private def annInvariant(result: DataFrame, e: DataFrame,
                           k: Int): DataFrame =
    // the RESULT side broadcasts (bounded at queries × k rows by
    // construction); unpinned, the static estimate broadcast the
    // EMBEDDINGS side instead — one row per corpus vector, a plan that
    // cannot survive production scale
    broadcast(broadcast(result)
      .join(e.select(col("vec_id").as("qid"), col("embedding").as("__qv")),
        Seq("qid")))
      .join(e.select(col("vec_id").as("cid"), col("embedding").as("__cv")),
        Seq("cid"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_returned"),
        sum((abs(col("sim") -
            graft.similarity.Ann.cosine(
              graft.similarity.Ann.asDouble(col("__qv")),
              graft.similarity.Ann.asDouble(col("__cv")))) <=
          1e-4).cast("int")).as("n_sim_exact"))
      .where(col("n_returned") === k) // belt: a short row errs as a
                                      // missing row, not a changed one
      .orderBy(col("qid"))

  private val mhIndexFor = new IndexCache("graft_gate_mhidx", (s, dir, path) =>
    Dedup.writeMinhashIndex(
      Tables(s, dir, "documents").where(col("doc_id") % 5 =!= 0),
      col("doc_id"), col("text"), path, buckets = 8))

  // the SAME standing corpus, indexed in two installments: build on the
  // even half, append the odd half — queries must be indistinguishable
  // from the one-shot build (same oracle as dedup_index_query)
  private val mhAppendIndexFor = new IndexCache("graft_gate_mhapp",
    (s, dir, path) => {
      val standing = Tables(s, dir, "documents").where(col("doc_id") % 5 =!= 0)
      Dedup.writeMinhashIndex(standing.where(col("doc_id") % 2 === 0),
        col("doc_id"), col("text"), path, buckets = 8)
      Dedup.appendToMinhashIndex(standing.where(col("doc_id") % 2 =!= 0),
        col("doc_id"), col("text"), path)
    })

  // the grown two-installment index, COMPACTED to a fresh path: one
  // index-sized pass over the stored shingles table (no corpus scan) —
  // queries must be indistinguishable from the grown index AND from the
  // from-scratch oracle (compacted ≡ grown ≡ rebuilt)
  private val mhCompactIndexFor = new IndexCache("graft_gate_mhcmp",
    (s, dir, path) =>
      Dedup.compactMinhashIndex(s, mhAppendIndexFor(s, dir), path))

  private val ivfIndexFor = new IndexCache("graft_gate_ivfidx", (s, dir, path) =>
    Ann.writeIvfIndex(
      Tables(s, dir, "embeddings")
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
      path, nClusters = 16, iters = 2, buckets = 8))

  // IVF index grown in two installments (build even cids, append odd) —
  // probing every cluster of the grown index must reproduce brute force,
  // whatever the centroids, so it shares the ann brute-force oracle
  private val ivfAppendIndexFor = new IndexCache("graft_gate_ivfapp",
    (s, dir, path) => {
      val c = Tables(s, dir, "embeddings")
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Ann.writeIvfIndex(c.where(col("cid") % 2 === 0), path,
        nClusters = 16, iters = 2, buckets = 8)
      Ann.appendToIvfIndex(c.where(col("cid") % 2 =!= 0), path)
    })

  private val ivfpqIndexFor = new IndexCache("graft_gate_ivfpq", (s, dir, path) =>
    Pq.writeIvfPqIndex(
      Tables(s, dir, "embeddings")
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
      path, dim = 64, m = 8, nCentroids = 16, nClusters = 16, buckets = 8))

  // ── Persisted-state caches for the state-lifecycle gates ───────────
  // Same build-once-per-JVM discipline as the index caches above: the
  // two-installment write+fold is the AMORTIZED part of these features
  // (it runs at ingest time, not per query), so repeated invocations
  // re-use the built state and time the READ path — the part that runs
  // at mix/selection time against 100 TB. Bench lists these gates in
  // its prebuilt set, paying (and reporting) the build separately as
  // build_sec; the FIRST invocation per JVM still exercises the full
  // write → fold → read lifecycle, which is what Verify records.

  private def dollarLineitem(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        round(col("l_extendedprice"), 0).as("usd"))

  private def budgetScored(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
          * 1e6, 0).cast("long").as("q_ppm"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))

  private val qstateFor = new IndexCache("graft_gate_pstate",
    (s, dir, path) => {
      val li = dollarLineitem(s, dir)
      graft.meta.ProfileState.writeProfileState(
        li.where(col("l_orderkey") % 3 =!= 0), col("usd"), path)
      graft.meta.ProfileState.appendProfileState(
        li.where(col("l_orderkey") % 3 === 0), col("usd"), path)
    })

  private val qstateGroupFor = new IndexCache("graft_gate_pstate_g",
    (s, dir, path) => {
      val li = dollarLineitem(s, dir)
      graft.meta.ProfileState.writeProfileStatePerGroup(
        li.where(col("l_orderkey") % 3 =!= 0), col("l_returnflag"),
        col("usd"), path)
      graft.meta.ProfileState.appendProfileStatePerGroup(
        li.where(col("l_orderkey") % 3 === 0), col("l_returnflag"),
        col("usd"), path)
    })

  private val wstateFor = new IndexCache("graft_gate_pstate_w",
    (s, dir, path) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"),
          col("n_chars"))
      graft.meta.ProfileState.writeProfileState(
        scored.where(col("doc_id") % 3 =!= 0), col("q_ppm"), path,
        weight = col("n_chars"))
      graft.meta.ProfileState.appendProfileState(
        scored.where(col("doc_id") % 3 === 0), col("q_ppm"), path,
        weight = col("n_chars"))
    })

  // drift compares two snapshots: both live under the one cached base
  private val driftStatesFor = new IndexCache("graft_gate_pdrift",
    (s, dir, path) => {
      val li = dollarLineitem(s, dir)
      graft.meta.ProfileState.writeProfileStatePerGroup(
        li.where(col("l_orderkey") % 3 =!= 0), col("l_returnflag"),
        col("usd"), path + "/v1")
      graft.meta.ProfileState.writeProfileStatePerGroup(
        li, col("l_returnflag"), col("usd"), path + "/v2")
    })

  private val bstateFor = new IndexCache("graft_gate_bstate",
    (s, dir, path) => {
      val scored = budgetScored(s, dir)
      graft.text.BudgetSelect.writeBudgetState(
        scored.where(col("doc_id") % 3 =!= 0),
        col("doc_id"), col("q_ppm"), col("n_tokens"), path)
      graft.text.BudgetSelect.appendBudgetState(
        scored.where(col("doc_id") % 3 === 0),
        col("doc_id"), col("q_ppm"), col("n_tokens"), path)
    })

  private val bstateGroupFor = new IndexCache("graft_gate_bstate_g",
    (s, dir, path) => {
      val scored = budgetScored(s, dir)
      graft.text.BudgetSelect.writeBudgetStatePerGroup(
        scored.where(col("doc_id") % 3 =!= 0), col("source"),
        col("doc_id"), col("q_ppm"), col("n_tokens"), path)
      graft.text.BudgetSelect.appendBudgetStatePerGroup(
        scored.where(col("doc_id") % 3 === 0), col("source"),
        col("doc_id"), col("q_ppm"), col("n_tokens"), path)
    })

  // one fold serves BOTH temperature-mixture incremental gates (capped
  // and epochs) — the state is the same per-source count fold
  private val mixStateFor = new IndexCache("graft_gate_mixstate",
    (s, dir, path) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      graft.meta.ProfileState.writeProfileStatePerGroup(
        d.where(col("doc_id") % 3 =!= 0), col("source"), lit(0L), path)
      graft.meta.ProfileState.appendProfileStatePerGroup(
        d.where(col("doc_id") % 3 === 0), col("source"), lit(0L), path)
    })

  // ── Environment canary (report-only probe, NOT a counted gate) ─────
  // One tiny data-independent query exercising the constructs that
  // have historically drifted BETWEEN ENGINE VERSIONS rather than
  // between plans: double rounding on a tie, double-product rounding
  // just below an integer, decimal-literal × integer ceil, regex and
  // length over astral-plane text, and the HUGEINT ceil-division the
  // weighted-quantile family rides. The last two columns are
  // DELIBERATE uncast probes: DuckDB types them HUGEINT and wide
  // DECIMAL respectively, the two rendering classes that cost data
  // gates in rounds 12 (×3) and 13 (×1); every data-gate oracle now
  // casts them away (oracle discipline), so the divergence is EXPECTED
  // here and must not sit in the pass/fail roll-up. Verify therefore
  // runs these via `probes` — values land in _env.json (and stdout)
  // for the driver artifact, with the DuckDB side in _probe_sql.json —
  // instead of via `queries`, so CORRECTNESS stays all-green when the
  // engine is healthy and a FUTURE genuine canary trip is visible as a
  // changed probe value rather than masked by a permanent red.
  val probes: Map[String, (SparkSession, String) => DataFrame] = Map(
    "env_canary" -> ((s, _) => {
      val astral = "a😀b👍cX" // a😀b👍cX
      val uncast = s.range(5).agg(
        sum(col("id") + lit(1000000000000L)).as("hugeint_sum"),
        sum(lit(new java.math.BigDecimal("1.1"))).as("dec_sum"))
      s.range(1).select(
        round(lit(2.5)).cast("long").as("round_tie_pos"),
        round(lit(-2.5)).cast("long").as("round_tie_neg"),
        round(lit(2.675) * 100).cast("long").as("round_dbl_product"),
        ceil(lit(0.9) * 61).cast("long").as("ceil_decimal_mul"),
        size(regexp_extract_all(lit(astral), lit("[A-Za-z]"), lit(0)))
          .cast("long").as("regex_astral"),
        length(lit(astral)).cast("long").as("len_astral"),
        expr("CAST((1234567890123L * 990000 + 999999) DIV 1000000 AS LONG)")
          .as("ceil_ppm_div"),
        (lit(0.1) + lit(0.2)).as("dbl_sum"))
        .crossJoin(broadcast(uncast))
    }))

  /** Stages A-E of the corpus capstone, shared by `corpus_build_pipeline`
    * and its incremental twin: crawl & select over `crawl` (a (doc_id,
    * payload) shard frame) -> span removal -> exact dedup +
    * decontamination -> content-keyed split -> chunk, pack, and JSONL
    * ship; returns the per-bin summary with the shipped-row total on
    * every row. All selection-relative arithmetic (per-host caps, span
    * df counts, bin packing) is computed WITHIN the given crawl subset. */
  private def corpusBuildSummary(s: SparkSession, dir: String,
      crawl: DataFrame): DataFrame =
    corpusBuildFromResponses(s, dir,
      graft.ingest.Warc.recordTable(s, crawl,
          col("doc_id"), col("payload"))
        .where(col("warc_type") === "response")
        .select(col("file_id").as("doc_id"),
          graft.ops.HtmlExprs.urlHost(col("target_uri")).as("host"),
          graft.ops.HtmlExprs.htmlMainText(graft.ops.HtmlExprs
            .charsetDecode(col("http_content_type"), col("body")))
            .as("main")))

  /** Stages A(gate)-E from an already-extracted (doc_id, host, main)
    * response frame — the seam the REBUILD-from-archive gate enters
    * through (its responses come from CDX point-reads, not a shard
    * scan), shared with the from-crawl form above. */
  private def corpusBuildFromResponses(s: SparkSession, dir: String,
      responses: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import graft.text.{Decontaminate, Packing}
      // A — select: one materialized ingest pass
      val gated = responses
        .select(col("doc_id"), col("host"), col("main"),
          graft.ops.TextExprs.gopherStats(col("main")).getField("pass")
            .cast("long").as("gopher_pass"))
        // LAZY: the first consumer materializes it inside its own job —
        // an eager checkpoint here was one more serial job in a gate
        // that is stage-count-bound (~50 sub-0.3 s stages)
        .localCheckpoint(false)
      val modeled = graft.text.BatchScore.score(s, gated, col("doc_id"),
          col("main"), batchSize = 53)
        .select(col("id").as("doc_id"), col("score_ppm").as("model_ppm"))
      val scored = gated.join(modeled, Seq("doc_id"))
        .select(col("doc_id"), col("host"), col("main"),
          (col("model_ppm") * col("gopher_pass")).as("q_ppm"))
      val capped = graft.text.BudgetSelect.takeTopPerGroupUniform(scored,
          col("host"), col("doc_id"), col("q_ppm"), m = 5L)
        .select(col("doc_id"),
          concat(col("main"), lit(" curated by graft pipeline for "),
            col("host")).as("framed"))
        .localCheckpoint(true)
      // B — cross-doc span removal over the SELECTED corpus (df counts
      // are selection-relative; the framing plants a same-host span)
      val cleaned = Dedup.removeDuplicatedSpans(capped, col("doc_id"),
          col("framed"), n = 5)
        .select(col("doc_id"), col("text_clean"))
        .localCheckpoint(true)
      // C — exact dedup + decontamination on the CLEANED text
      val docs = Tables(s, dir, "documents")
      val hits = Decontaminate.hitCounts(
        cleaned.select(col("doc_id"), col("text_clean").as("text")),
        docs.where(col("doc_id") % 17 === 0)
          .select(col("doc_id"), TextOps.nfcClean(col("text")).as("text")),
        col("doc_id"), col("text"), n = 5)
      val kept = cleaned
        .withColumn("__canon", min(col("doc_id"))
          .over(Window.partitionBy(md5(col("text_clean")))))
        .join(hits, Seq("doc_id"), "left")
        .where(col("doc_id") === col("__canon") && col("n_hits").isNull)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      // D — content-keyed leakage-safe split: identical cleaned text
      // can never straddle train/eval
      val split = kept.withColumn("split", graft.text.Sampling.hashSplit(
        concat(md5(col("text_clean")), lit(":split")),
        Seq("train" -> 0.9, "eval" -> 0.1)))
      // E — chunk, pack, ship
      val chunks = split.select(col("doc_id"), col("split"), col("lang"),
          posexplode(TextOps.tokenChunks(col("text_clean"),
            window = 64, stride = 64)))
        .select(col("doc_id"), col("split"), col("lang"),
          col("pos").cast("int").as("chunk_idx"),
          size(col("col")).as("n_tokens"))
      val packed = Packing.packBins(chunks,
          concat(col("split"), lit(":"), col("lang")),
          struct(col("doc_id"), col("chunk_idx")), col("n_tokens"),
          budget = 256)
        // consumed by the export AND the summary; LAZY — the export
        // action immediately below materializes it, the summary reads
        // the cache (one serial job fewer than an eager checkpoint)
        .localCheckpoint(false)
      val out = java.nio.file.Files
        .createTempDirectory("graft_corpus_gate").toString
      graft.ingest.Jsonl.export(s, packed,
        struct(col("split"), col("lang"), col("bin_id"), col("doc_id"),
          col("chunk_idx"), col("n_tokens")),
        out, maxRecordsPerFile = 200, gzip = true)
      val shipped = s.read.parquet(out + "/_manifest")
        .agg(sum(col("n_records")).cast("long").as("shipped_rows"))
      packed.groupBy(col("split"), col("lang"), col("bin_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .crossJoin(broadcast(shipped))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Deduplication ──────────────────────────────────────────────────
    "dedup_exact" -> ((s, dir) => {
      Dedup.exactCanonical(Tables(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // k = 36 / bands = 12 (r stays 3): the library default (24, 8)
    // carries a per-pair band-miss of (1−0.8³)⁸ ≈ 0.32% — ~1 expected
    // miss in sf0.1's 256-pair population, the standing matrix
    // exception since r10. Four more bands at the same row width cut
    // the miss to 0.488¹² ≈ 0.018% (~0.05 expected pairs corpus-wide),
    // clearing the exact oracle deterministically at every fixture SF
    // without changing band selectivity (candidate volume per band is
    // still the r = 3 collision curve).
    "dedup_minhash" -> ((s, dir) => {
      Dedup.minhashPairs(Tables(s, dir, "documents"), col("doc_id"), col("text"),
          k = 36, bands = 12, threshold = 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_ngram" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), col("doc_id"),
          col("text"), n = 3, maxDf = 100, threshold = 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the curation form of cluster dedup: keep each near-dup cluster's
    // BEST member by (quality DESC, id ASC) — not its min-id label —
    // via the zero-driver-state bounded top-1 per cluster
    // (Dedup.keepBestPerCluster). The oracle replays the recursive
    // closure, the alpha-ratio ppm, and the per-cluster argmax window.
    "dedup_keep_best" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, maxDf = 100, threshold = 0.8)
      val canon = Dedup.canonicalFromPairs(docs.select(col("doc_id")),
        col("doc_id"), pairs)
      val scored = docs.join(canon, Seq("doc_id"))
        .select(col("doc_id"), col("canonical_id"),
          round(TextOps.qualityStruct(coalesce(col("text"), lit("")))
            .getField("alpha_ratio") * 1e6, 0).cast("long").as("q_ppm"))
        .localCheckpoint(true) // keepBest scans twice (agg + semi-join)
      Dedup.keepBestPerCluster(scored, col("canonical_id"),
          col("doc_id"), col("q_ppm"))
        .orderBy(col("doc_id"))
    }),

    // pairwise near-dups → connected-component clusters: every doc gets
    // the min doc_id reachable through the ngram-Jaccard pair graph
    "dedup_clusters" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, maxDf = 100, threshold = 0.8)
      // large-star/small-star converges in O(log n) rounds regardless
      // of pair-chain diameter, matching the oracle's exact recursive
      // closure; the default maxIters is a safety valve, not a
      // diameter bound
      Dedup.canonicalFromPairs(docs.select(col("doc_id")), col("doc_id"),
          pairs)
        .orderBy(col("doc_id"))
    }),

    // incremental ingestion: today's batch judged against the standing
    // corpus — only the batch is annotated, the existing side reduces to
    // (hash, min id) and never rewrites. The corpus has no exact dups,
    // so the batch is new docs (doc_id % 3 == 0) PLUS re-keyed copies of
    // some existing docs (% 7 == 0, id + 100000) — the match path is
    // exercised, not vacuously green
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val batch = docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"))
        .unionByName(docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      Dedup.exactAgainstExisting(
          batch, docs.where(col("doc_id") % 3 =!= 0),
          col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // in-flight observe metrics: the counters ride the corpus pass as
    // accumulators (no second scan) and surface here as a one-row frame;
    // the oracle recomputes the same aggregates directly — proving the
    // observe channel reports exactly what a dedicated query would
    "pipeline_metrics" -> ((s, dir) => {
      import s.implicits._
      val observedDf = graft.meta.PipelineMetrics.observed(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextOps.tokenCount(col("text")).as("n_toks")),
        "corpus", Seq(
          "n_docs" -> count(lit(1)),
          "total_tokens" -> sum(col("n_toks")).cast("long"),
          "max_doc_id" -> max(col("doc_id"))))
      val m = graft.meta.PipelineMetrics.runAndCollect(observedDf)("corpus")
      Seq((m.getAs[Long]("n_docs"), m.getAs[Long]("total_tokens"),
          m.getAs[Long]("max_doc_id")))
        .toDF("n_docs", "total_tokens", "max_doc_id")
    }),

    // persistent-index near-dedup (rows-only: xxhash signatures aren't
    // DuckDB-expressible; equivalence to minhashPairsAcross is
    // spec-verified): build the standing corpus's LSH index ONCE PER
    // JVM+dir (memoized — repeated invocations in one session must not
    // leak temp dirs/catalog tables or re-pay the build), query the
    // arriving batch against the bucketed tables
    "dedup_index_query" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val path = mhIndexFor(s, dir)
      Dedup.queryMinhashIndex(docs.where(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), path, threshold = 0.8)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard") * 1e6, 0).cast("long").as("jacc_ppm"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the index-append lifecycle under the dedup_index_query oracle: an
    // index grown in two installments must answer the batch exactly like
    // the from-scratch DuckDB computation — cross-engine proof that
    // append ≡ rebuild
    "dedup_index_append" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.queryMinhashIndex(docs.where(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), mhAppendIndexFor(s, dir),
          threshold = 0.8)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard") * 1e6, 0).cast("long").as("jacc_ppm"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the index COMPACTION lifecycle under the same oracle: an index
    // grown in two installments then compacted (fresh path, no corpus
    // scan) must still answer the batch exactly like the from-scratch
    // DuckDB computation — closes the build → append → compact loop
    "dedup_index_compacted" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.queryMinhashIndex(docs.where(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), mhCompactIndexFor(s, dir),
          threshold = 0.8)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard") * 1e6, 0).cast("long").as("jacc_ppm"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the SAME incremental dedup with the batch-hash bloom prefiltering
    // the standing-corpus side map-side — identical output (no false
    // negatives; false positives die in the join), same oracle
    "dedup_incremental_bloom" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val batch = docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"))
        .unionByName(docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      Dedup.exactAgainstExistingBloom(
          batch, docs.where(col("doc_id") % 3 =!= 0),
          col("doc_id"), col("text"),
          expectedBatchDocs = 1L << 12, fpp = 0.01)
        .orderBy(col("doc_id"))
    }),

    // per-document keyword extraction: tf · N/df (linear idf — exact
    // integer ratio, bit-identical across engines) ranked per doc.
    // N comes from the memoized per-dir count: an inline docs.count()
    // would schedule a full corpus scan inside every (benched)
    // invocation — in production N is a manifest constant, not a
    // per-query recount
    "doc_keywords" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.text.TextOps.topTerms(docs, col("doc_id"), col("text"),
          n = tableCountFor(s, dir, "documents"), topK = 3)
        .select(col("doc_id"), col("rank").as("rnk"), col("token"),
          col("score_ppm"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // benchmark decontamination: training docs sharing any 5-gram with
    // the (broadcast) eval set are flagged before serialization
    "decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.text.Decontaminate.flag(
          docs.where(col("doc_id") % 17 =!= 0),
          docs.where(col("doc_id") % 17 === 0),
          col("doc_id"), col("text"), n = 5, minHits = 1)
        .orderBy(col("doc_id"))
    }),

    // the SAME decontamination through the bloom-filter prefilter —
    // identical output by construction (the bloom only ADMITS candidates,
    // the exact join removes its false positives), gated against the
    // same oracle SQL: the proof that the too-big-to-broadcast-benchmark
    // scale path stays exact
    "decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.text.Decontaminate.flagBloom(
          docs.where(col("doc_id") % 17 =!= 0),
          docs.where(col("doc_id") % 17 === 0),
          col("doc_id"), col("text"), n = 5, minHits = 1,
          expectedBenchGrams = 1L << 16, fpp = 0.01)
        .orderBy(col("doc_id"))
    }),

    // interval join via the binned bucket equi-join (TemporalOps
    // scaladoc): each event paired with the same user's events in the
    // PRECEDING hour. Self-joins events on purpose — the fixture's
    // orders live in a disjoint 1995-2001 era, so any events×orders
    // interval is empty at every SF and the r4/r5 form of this gate
    // passed vacuously on 0 == 0 rows; an events-to-events window
    // overlaps by construction. Oracle: DuckDB's native inequality
    // join over the same frames.
    "range_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val tsUs = graft.ops.TemporalOps.epochMicros(ev)
      val e = ev.select(col("event_id"), col("user_id"), tsUs.as("ts_us"))
      val p = ev.select(col("event_id").as("prior_id"), col("user_id"),
          tsUs.as("pts_us"))
      graft.ops.TemporalOps.rangeJoin(e, p,
          leftKey = col("user_id"), rightKey = col("user_id"),
          leftTs = col("ts_us"), rightTs = col("pts_us"),
          lower = -3600L * 1000000L, upper = -1L,
          rightCols = Seq(col("prior_id")))
        .orderBy(col("event_id"), col("prior_id"))
    }),

    // corpus vocabulary (tokenizer-training / idf table): top tokens by
    // total frequency with document frequency, via the two-stage
    // (token, doc) → token aggregation that never holds per-token sets
    "vocab_topk" -> ((s, dir) => {
      graft.text.TextOps.termStats(Tables(s, dir, "documents"),
          col("doc_id"), col("text"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100)
    }),

    // intra-document repetition: duplicate bigram/trigram fraction of
    // the normalized token stream (ppm) — the Gopher-style quality
    // threshold for boilerplate loops and degenerate text; per-row
    // kernel counts, no shuffle
    "text_repetition" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(TextOps.normalized(col("text")))).as("n_tokens"),
          TextOps.repetitionPpm(col("text"), 2).as("dup2_ppm"),
          TextOps.repetitionPpm(col("text"), 3).as("dup3_ppm"))
        .orderBy(col("doc_id"))
    }),

    // unicode hygiene before any hashing/dedup: NFC composition + strip
    // of control/zero-width chars over a checked-in fixture of NFD,
    // angstrom-sign, zero-width and control-char cases (native kernel —
    // composition differences must not survive to the dedup hashes)
    "text_nfc_clean" -> ((s, _) => {
      s.read
        .schema("id INT, text STRING")
        .option("sep", "|").option("header", "false")
        // the DuckDB oracle reads this fixture with quote='' — pin the
        // Spark parser to match, or a future fixture row containing a
        // double-quote would parse differently per engine and fail the
        // gate on a parser asymmetry instead of a kernel regression
        .option("quote", "\u0000")
        .csv(s"${graft.Fixtures.dir}/unicode.csv")
        .select(col("id"), TextOps.nfcClean(col("text")).as("clean"),
          length(col("text")).as("n_in"),
          length(TextOps.nfcClean(col("text"))).as("n_out"))
        .orderBy(col("id"))
    }),

    // balanced per-source subset: exactly 40 docs per source by smallest
    // content hash — the eval/ablation selector where fraction sampling
    // would track source size
    "stratified_take" -> ((s, dir) => {
      graft.text.Sampling.takePerGroup(
          Tables(s, dir, "documents").select(col("doc_id"), col("source")),
          col("source"), col("doc_id"), n = 40)
        .orderBy(col("source"), col("doc_id"))
    }),

    // one-pass column profiler over the biggest table: the null/distinct/
    // range audit a pipeline runs before trusting a new data drop.
    // approx_count_distinct stays OUT (approximate → not oracle-exact).
    // Plan note: two exact countDistincts make Catalyst EXPAND the scan
    // ×3 before the partial aggregation — one scan, 3× the agg input;
    // at 100 TB swap the distincts for approx_count_distinct (no Expand)
    // when ±2% is acceptable
    "profile_table" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("l_orderkey")).as("n_orderkey"),
          countDistinct(col("l_orderkey")).as("d_orderkey"),
          countDistinct(col("l_returnflag")).as("d_returnflag"),
          min(col("l_quantity").cast("decimal(12,2)")).cast("string")
            .as("min_qty"),
          max(col("l_quantity").cast("decimal(12,2)")).cast("string")
            .as("max_qty"),
          sum(col("l_linenumber")).as("sum_linenumber"))
    }),

    // deterministic training-order shuffle: content-keyed md5 assigns
    // every doc a shard and a stable position within it — the export
    // ordering a training run replays identically from any retry.
    // nShards = 8 fits the 500-row test corpus; at scale shard count
    // grows with the corpus (see Sampling.shuffleAssignment: size
    // shards, don't count them)
    "corpus_shuffle" -> ((s, dir) => {
      graft.text.Sampling
        .shuffleAssignment(Tables(s, dir, "documents"), col("doc_id"), nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    }),

    // the end-to-end training-data preparation flow as ONE declarative
    // plan: unicode hygiene → exact-dedup survivors → benchmark
    // decontamination → context-window chunking → token-budget packing.
    // Every stage is an operator gated above on its own; this proves the
    // composition stays a single Catalyst plan with no materialization
    // barriers between stages
    "training_pipeline" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.text.{Decontaminate, Packing}
      // composition discipline: ONE annotated corpus chain. Dedup is a
      // window annotation (not a semi-join back onto the corpus) and
      // decontamination left-joins the slim hit frame, so the 100 TB
      // corpus is scanned for the chain, the gram stream, and nothing
      // else — semi-join-per-stage composition re-expands the corpus
      // plan at every stage (measured 7 parquet scans vs 3 here)
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.nfcClean(col("text")).as("text"))
      val bench = docs.where(col("doc_id") % 17 === 0)
      val train = docs.where(col("doc_id") % 17 =!= 0)
      val hits = Decontaminate.hitCounts(train, bench,
        col("doc_id"), col("text"), n = 5)
      val kept = train
        .withColumn("__canon",
          min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .join(hits, Seq("doc_id"), "left")
        .where(col("doc_id") === col("__canon") && col("n_hits").isNull)
      val chunks = kept
        .select(col("doc_id"), col("lang"),
          posexplode(TextOps.tokenChunks(col("text"), window = 64, stride = 64)))
        .select(col("doc_id"), col("lang"),
          col("pos").cast("int").as("chunk_idx"),
          size(col("col")).as("n_tokens"))
      Packing.packBins(chunks, col("lang"),
          struct(col("doc_id"), col("chunk_idx")), col("n_tokens"),
          budget = 256)
        .groupBy(col("lang"), col("bin_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .orderBy(col("lang"), col("bin_id"))
    }),

    // deterministic hash sampling + stable split assignment — selection
    // is content-keyed (md5), so re-runs, retries and repartitioning
    // cannot change which documents land in which split
    // LEAKAGE-SAFE split: the split key is the near-dup CLUSTER id, so
    // borderline duplicate pairs can never straddle train/eval. The
    // oracle recomputes the clusters by recursive min-label closure and
    // re-applies the same md5 split arithmetic on canonical_id.
    "split_leakage_safe" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, maxDf = 100, threshold = 0.8)
      Dedup.canonicalFromPairs(docs.select(col("doc_id")), col("doc_id"),
          pairs)
        .select(col("doc_id"), col("canonical_id"),
          graft.text.Sampling.leakageSafeSplit(col("canonical_id"),
            Seq("train" -> 0.9, "eval" -> 0.1)).as("split"))
        .orderBy(col("doc_id"))
    }),

    "corpus_sample" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      graft.text.Sampling.hashSample(docs, col("doc_id"), 0.5)
        .withColumn("split", graft.text.Sampling.hashSplit(
          concat(col("doc_id"), lit(":split")),
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // PII scrub before serialization: md5 of the redacted text proves
    // the transform byte-identical against the oracle running the same
    // patterns; the count audits how much was scrubbed
    "text_redact" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          md5(TextOps.redact(col("text"))).as("redacted_md5"),
          TextOps.redactionCount(col("text")).as("n_redacted"))
        .orderBy(col("doc_id"))
    }),

    // chunk → fixed-token-budget bin assignment (sequential packing):
    // the example-shaping step between chunking and serialization
    "pack_examples" -> ((s, dir) => {
      import graft.text.{Packing, TextOps}
      val chunks = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          posexplode(TextOps.tokenChunks(col("text"), window = 64, stride = 64)))
        .select(col("doc_id"), col("lang"),
          col("pos").cast("int").as("chunk_idx"),
          size(col("col")).as("n_tokens"))
      Packing.packBins(chunks, col("lang"),
          struct(col("doc_id"), col("chunk_idx")), col("n_tokens"),
          budget = 256)
        .groupBy(col("lang"), col("bin_id"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("lang"), col("bin_id"))
    }),

    // weighted corpus mixing with repetition: sources upweighted by
    // deterministic repeat (weights > 1) or hash-sampled down (< 1).
    // Weights are exact 2^-16 fractions so engine and oracle agree.
    "corpus_mix" -> ((s, dir) => {
      import graft.text.Packing
      val docs = Tables(s, dir, "documents")
      val weight = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 2.5)
        .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 1.0)
        .otherwise(0.25)
      Packing.repeatByWeight(docs, concat(col("doc_id"), lit(":mix")), weight)
        .select(col("doc_id"), col("source"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // TEMPERATURE mixture (τ-sampling, qᵢ ∝ nᵢ^τ): τ = 0.5 — the one
    // exponent whose per-source weights (IEEE-exact sqrt) both engines
    // reproduce bit-for-bit — toward half the corpus. The oracle
    // recomputes per-source counts, the 2²⁰-scaled weights, and the
    // BigInt-mirroring 2¹⁶ thresholds from scratch, then re-applies the
    // keyed md5 keep predicate.
    "corpus_mix_temperature" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      val total = d.where(col("source").isNotNull).count()
      graft.text.Sampling.mixByTemperature(d, col("source"), col("doc_id"),
          tau = 0.5, targetRows = total / 2)
        .orderBy(col("doc_id"))
    }),

    // the ROLLING-CORPUS form: per-source counts folded into persisted
    // profile state in two increments, then the mixture rates derive
    // from the STATE alone (zero corpus-count passes at mix time) with
    // the target ALSO read off the state. Must equal the from-scratch
    // computation — the oracle recomputes counts directly.
    "corpus_mix_temperature_incremental" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      val statePath = mixStateFor(s, dir)
      val sizes = graft.text.Sampling.sourceSizesFromState(s, statePath)
      graft.text.Sampling.mixByTemperatureFromState(d, col("source"),
          col("doc_id"), tau = 0.5,
          targetRows = sizes.map(_._2).sum / 4, statePath = statePath)
        .orderBy(col("doc_id"))
    }),

    // the UPSAMPLING form: target 2× the corpus, so every source's rate
    // exceeds 1 and rows REPEAT (whole copies + 2¹⁶-grid fractional
    // hash keep) — the per-dataset-epochs shape of real training mixes
    "corpus_mix_temperature_epochs" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      val total = d.where(col("source").isNotNull).count()
      graft.text.Sampling.mixByTemperatureRepeat(d, col("source"),
          col("doc_id"), tau = 0.5, targetRows = total * 2)
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // the rolling-corpus UPSAMPLING form: per-source counts folded into
    // persisted state in two increments, then the epochs-per-dataset
    // repeat rates derive from the STATE alone (zero corpus-count
    // passes at mix time), target 2× the state's total. Must equal the
    // from-scratch epochs computation — the oracle recomputes counts
    // directly (same SQL as the corpus-counted epochs gate).
    "corpus_mix_temperature_epochs_incremental" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      val statePath = mixStateFor(s, dir)
      val sizes = graft.text.Sampling.sourceSizesFromState(s, statePath)
      graft.text.Sampling.mixByTemperatureRepeatFromState(d, col("source"),
          col("doc_id"), tau = 0.5,
          targetRows = sizes.map(_._2).sum * 2, statePath = statePath)
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // token-budget curation: keep the highest-alpha-ratio documents
    // until 25% of the corpus's tokens are spent — the exact greedy
    // prefix over (quality DESC, doc_id), computed by histogram cutoff
    // + boundary-level refinement instead of the global sort +
    // single-task running-sum window the semantics naively suggest
    // (BudgetSelect scaladoc has the 100 TB argument). The ppm quality
    // score keeps the levels discrete; the oracle recomputes the same
    // prefix with DuckDB's window form from scratch, so the cutoff
    // arithmetic has no self-confirmation anywhere.
    "corpus_budget_select" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.text.BudgetSelect.budgetSelectFraction(scored, col("doc_id"),
          col("q_ppm"), col("n_tokens"), fraction = 0.25)
        .orderBy(col("doc_id"))
    }),

    // exact global top-m: keep exactly the best 1234 documents by
    // (quality DESC, doc_id) — the "select the m best docs" step at a
    // size where orderBy.limit's single-task global limit and a ranking
    // window both stop scaling; the oracle is the from-scratch
    // row_number form. m = 1234 cuts INSIDE a quality level at every SF.
    "corpus_top_m" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"))
      graft.text.BudgetSelect.takeTop(scored, col("doc_id"), col("q_ppm"),
          m = 1234L)
        .orderBy(col("doc_id"))
    }),

    // per-source exact top-m (the mixture-spec "best m docs per
    // domain"): unit-cost per-group budget selection — no per-group
    // ranking window. m values span deep cut (src1), zero (src4),
    // keep-all (src2), and mid cuts; unnamed sources drop. Oracle is
    // the partitioned row_number prefix from scratch.
    "corpus_top_m_by_source" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"))
      graft.text.BudgetSelect.takeTopPerGroup(scored, col("source"),
          col("doc_id"), col("q_ppm"),
          ms = Map("src0" -> 40L, "src1" -> 3L, "src2" -> 1000000L,
            "src3" -> 17L, "src4" -> 0L))
        .orderBy(col("doc_id"))
    }),

    // curriculum binning: exact rank-proportional quantile bins over
    // (quality DESC, doc_id) WITHOUT a global sort or ranking window —
    // level histogram + driver boundary placement + within-level rank
    // refinement, with the final bin assignment a map-only literal
    // comparison (Binning scaladoc has the 100 TB argument). The oracle
    // recomputes the same floor map from a from-scratch row_number, so
    // a misplaced boundary, an off-by-one local rank, or a tie-order
    // slip cannot hide. k=7 lands boundaries both between and inside
    // quality levels at every SF.
    "curriculum_bins" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"))
      graft.text.Binning.quantileBins(scored, col("doc_id"), col("q_ppm"),
          k = 7)
        .orderBy(col("doc_id"))
    }),

    // per-domain curriculum bins (the mixture-spec twin): every source
    // bins into its own k stages over its own (quality DESC, doc_id)
    // order — computed without the per-group ranking window whose
    // hottest group would own the wall clock; the oracle IS that window
    // from scratch.
    "curriculum_bins_by_source" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"))
      graft.text.Binning.quantileBinsPerGroup(scored, col("source"),
          col("doc_id"), col("q_ppm"), k = 4)
        .orderBy(col("doc_id"))
    }),

    // equal-TOKEN-MASS curriculum: k stages of equal cumulative chars
    // over (quality DESC, doc_id) — the schedule you actually train
    // with, where equal-doc bins mislead (huge docs dominate a stage's
    // budget). Oracle is the running-cost window formula from scratch.
    "curriculum_bins_by_cost" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"),
          col("n_chars"))
      graft.text.Binning.quantileBinsByCost(scored, col("doc_id"),
          col("q_ppm"), col("n_chars"), k = 7)
        .select(col("doc_id"), col("bin"))
        .orderBy(col("doc_id"))
    }),

    // the per-domain twin: every source's own equal-mass stages
    "curriculum_bins_by_cost_by_source" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"),
          col("n_chars"))
      graft.text.Binning.quantileBinsByCostPerGroup(scored, col("source"),
          col("doc_id"), col("q_ppm"), col("n_chars"), k = 4)
        .select(col("doc_id"), col("source"), col("bin"))
        .orderBy(col("doc_id"))
    }),

    // rolling-corpus budget cutoff from PERSISTED state: the corpus
    // splits into an "existing" store and an ingest "batch"; the
    // quality-level histogram persists at write time, the batch FOLDS
    // into it (one batch-only aggregation — the existing corpus is
    // never re-scanned), and the selection then runs with its cutoff
    // resolved from state alone. The oracle recomputes the same greedy
    // prefix from scratch over the whole corpus, so a merge bug in the
    // state fold (lost level, double-counted total, wrong min) cannot
    // hide: it would move the cutoff.
    "corpus_budget_incremental" -> ((s, dir) => {
      val scored = budgetScored(s, dir).drop("source")
      val statePath = bstateFor(s, dir)
      val total = graft.text.BudgetSelect.readBudgetState(s, statePath)
        .agg(sum(col("total_cost"))).head().getLong(0)
      graft.text.BudgetSelect.budgetSelectFromState(scored, col("doc_id"),
          col("q_ppm"), col("n_tokens"),
          budget = math.floor(0.25 * total.toDouble).toLong, statePath)
        .orderBy(col("doc_id"))
    }),

    // per-domain token budgets (the mixture-spec step): six sources
    // with budgets spanning deep cutoff (src1: 50), mid cutoff (src0,
    // src3), zero (src4), keep-all (src2: 1M), and SCALE-VARYING src5
    // (2000 — keep-all at sf0.001/0.01 totals ~1.3k, cutoff at sf0.1's
    // ~14k), with the other 14 sources dropped by omission. The oracle
    // is the per-group window form from scratch.
    "corpus_budget_by_source" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.text.BudgetSelect.budgetSelectPerGroup(scored, col("source"),
          col("doc_id"), col("q_ppm"), col("n_tokens"),
          budgets = Map("src0" -> 800L, "src1" -> 50L, "src2" -> 1000000L,
            "src3" -> 400L, "src4" -> 0L, "src5" -> 2000L))
        .orderBy(col("doc_id"))
    }),

    // per-domain budgets resolved from PERSISTED per-group state — the
    // mixture-spec twin of corpus_budget_incremental: existing/batch
    // split, state written then batch-folded (one batch-only
    // aggregation), selection cutoffs from state alone. Identical
    // budgets and oracle as corpus_budget_by_source, so the state fold
    // must land on exactly the from-scratch cutoffs.
    "corpus_budget_incremental_by_source" -> ((s, dir) => {
      val scored = budgetScored(s, dir)
      graft.text.BudgetSelect.budgetSelectPerGroupFromState(scored,
          col("source"), col("doc_id"), col("q_ppm"), col("n_tokens"),
          budgets = Map("src0" -> 800L, "src1" -> 50L, "src2" -> 1000000L,
            "src3" -> 400L, "src4" -> 0L, "src5" -> 2000L),
          path = bstateGroupFor(s, dir))
        .orderBy(col("doc_id"))
    }),

    // C4-style line-level boilerplate filter: lines occurring more than
    // twice across the corpus are dropped, surviving lines keep order.
    // The synthetic docs are single-line, so the gate frames each with a
    // corpus-wide header and a per-source footer (the oracle builds the
    // same frame): the header repeats 500x, footers ~50x — both must be
    // stripped everywhere while each unique content line survives.
    "text_line_dedup" -> ((s, dir) => {
      val framed = Tables(s, dir, "documents").select(col("doc_id"),
        concat(lit("=== site header ===\n"), col("text"),
          lit("\nfooter for "), col("source")).as("t"))
      Dedup.dedupLines(framed, col("doc_id"), col("t"), maxOccurrences = 2)
        .select(col("doc_id"), md5(col("text")).as("kept_md5"),
          col("n_lines"), col("n_removed"))
        .orderBy(col("doc_id"))
    }),

    // PARAGRAPH-level boilerplate dedup (the Dolma policy): same
    // machinery as the C4 line filter, blocks split on blank lines.
    // The frame plants a corpus-wide boilerplate paragraph (500×) and
    // per-source footers (~50×) — both must drop everywhere while each
    // unique content paragraph survives in order.
    "text_paragraph_dedup" -> ((s, dir) => {
      val framed = Tables(s, dir, "documents").select(col("doc_id"),
        concat(lit("shared boilerplate paragraph here\n\n"), col("text"),
          lit("\n\nfooter for "), col("source")).as("t"))
      Dedup.dedupLines(framed, col("doc_id"), col("t"), maxOccurrences = 2,
          delimiter = "\n\n", joiner = "\n\n")
        .select(col("doc_id"), md5(col("text")).as("kept_md5"),
          col("n_lines").as("n_blocks"), col("n_removed"))
        .orderBy(col("doc_id"))
    }),

    // cross-doc duplicated-span audit: the exact-substring-dedup signal
    // (5-word spans shared with other documents, as ppm of the doc's
    // distinct spans)
    "text_dup_spans" -> ((s, dir) => {
      Dedup.duplicatedSpans(Tables(s, dir, "documents"), col("doc_id"),
          col("text"), n = 5)
        .orderBy(col("doc_id"))
    }),

    // WITHIN-document repeated-span removal — the self-dedup sibling
    // of text_dup_remove, pure narrow kernel (no shuffle at all): each
    // doc's later occurrences of an already-seen 5-token span drop by
    // position coverage; the frame plants a guaranteed within-doc
    // repeat in every row. The oracle replays first-occurrence-by-
    // position, coverage union, and the byte-exact retained text.
    "text_self_dedup" -> ((s, dir) => {
      val framed = concat(coalesce(col("text"), lit("")),
        lit(" intra1 intra2 intra3 intra4 intra5 mid" +
          " intra1 intra2 intra3 intra4 intra5"))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.TextExprs.dropRepeatedSpans(framed, 5).as("r"))
        .select(col("doc_id"), md5(col("r.text_clean")).as("clean_md5"),
          col("r.n_tokens").as("n_tokens"),
          col("r.n_removed").as("n_removed"))
        .orderBy(col("doc_id"))
    }),

    // the REWRITE half of the audit above: drop every cross-doc
    // duplicated 5-token span (keep-first), re-materializing the text.
    // The frame plants a guaranteed viral span (the boilerplate run,
    // 500×) and per-source spans (the "... of srcN" tails, ~50×) on top
    // of whatever natural dups the corpus has; the oracle recomputes the
    // whole rewrite from scratch — keeper choice, position-coverage
    // union, raw-token re-join — so clean_md5 pins byte-exact retained
    // text, not just counts.
    "text_dup_remove" -> ((s, dir) => {
      val framed = Tables(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" boilerplate navigation footer menu copyright of "),
          col("source")).as("t"))
      Dedup.removeDuplicatedSpans(framed, col("doc_id"), col("t"), n = 5)
        .select(col("doc_id"), md5(col("text_clean")).as("clean_md5"),
          col("n_tokens"), col("n_removed"))
        .orderBy(col("doc_id"))
    }),

    // asymmetric near-dup: a document quoted inside a larger one shows
    // high containment where Jaccard stays low — the dedup signal for
    // concatenated/wrapped training documents
    "dedup_containment" -> ((s, dir) => {
      Dedup.ngramContainmentPairs(Tables(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, maxDf = 100, threshold = 0.8)
        .withColumn("containment", round(col("containment"), 6))
        .orderBy(col("doc_id"), col("container_id"))
    }),

    "dedup_simhash" -> ((s, dir) => {
      // layout PINNED to single 8-bit chunks: this synthetic corpus is
      // mutually similar (p ≈ 0.85), where single chunks measured 4.7 s
      // vs 9.9 s at sf0.1 — and a pinned layout keeps the benched plan
      // identical run-to-run (the sampled auto-chooser sits near its
      // decision boundary on this corpus, and a layout flip between
      // bench runs reads as a 2× drift). Production default stays
      // auto-measured (wideTables = None); both layouts are exhaustive
      // at radius 7, so the pin can never change the rows.
      //
      // Output is the gate's INVARIANT SUMMARY (hash-class pair sets
      // aren't SQL-recomputable): the full production pair computation
      // runs — radius_ok aggregates over every pair — and the
      // cross-engine check is the text-equal pair count, guaranteed
      // found (identical text → identical signature → hamming 0,
      // pigeonhole exhaustive). Eight planted copies keep the count
      // non-vacuous at SFs whose corpus has no natural exact dups.
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      // spread BEFORE the simhash kernel: the union of two one-row-
      // group scans is 2 effective tasks, so the token-shingle kernel
      // pass ran as two ~0.5 s tasks (hammingPairs itself can't spread
      // — its generic input may carry media payloads that must never
      // cross an exchange; here the spread moves source TEXT)
      val planted = Dedup.spreadScan(
        docs.unionByName(docs.where(col("doc_id") < 8)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))),
        col("doc_id"))
      val pairs = Dedup.simhashPairs(planted, col("doc_id"), col("text"),
        maxHamming = 7, wideTables = Some(false))
      val keys = planted.select(col("doc_id"), md5(col("text")).as("__h"))
      // shuffle-hash-pinned: the key frame is one md5 row per DOCUMENT —
      // corpus-scale, never broadcast; hash-building the slim digests
      // avoids sorting the pair frame (the rareShingleCommonCounts
      // discipline)
      pairs
        .join(keys.select(col("doc_id").as("id_a"), col("__h").as("__ha"))
          .hint("shuffle_hash"), Seq("id_a"))
        .join(keys.select(col("doc_id").as("id_b"), col("__h").as("__hb"))
          .hint("shuffle_hash"), Seq("id_b"))
        .agg(
          sum((col("__ha") === col("__hb")).cast("int"))
            .as("n_exactdup_pairs"),
          coalesce(max(col("hamming")) <= 7, lit(false)).cast("int")
            .as("radius_ok"))
    }),

    "dedup_embedding" -> ((s, dir) => {
      // random synthetic embeddings are already balanced — uncentered
      // keeps full recall at the cluster core (see cosineNearDupPairs)
      Ann.cosineNearDupPairs(Tables(s, dir, "embeddings"),
          col("vec_id"), col("embedding"),
          threshold = 0.3, bands = 16, bandBits = 2, centered = false)
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))
        .limit(50)
    }),

    // ── SemDeDup (cluster-then-prune semantic dedup) ──────────────────
    // nClusters = 1 collapses k-means to one cluster, so within-cluster
    // pairs ≡ exact all-pairs cosine, recomputed from scratch by the
    // DuckDB oracle (the same brute-force SQL that pins the LSH front:
    // the two candidate fronts are interchangeable above a threshold,
    // and this gate proves it). A dropped or double-assigned vector in
    // the k-means plumbing would break equality.
    "semdedup_pairs" -> ((s, dir) => {
      SemDedup.semanticNearDupPairs(Tables(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), nClusters = 1, threshold = 0.3)
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))
        .limit(50)
    }),

    // the component-label tail over the SAME lossless front: min-id
    // canonical labels vs DuckDB's exact recursive closure
    "semdedup_canonical" -> ((s, dir) => {
      SemDedup.semanticDedup(Tables(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), nClusters = 1, threshold = 0.3,
          maxIters = 64)
        .orderBy(col("doc_id"))
    }),

    // production-parameter variant: 8 clusters — WHICH pairs k-means
    // separates is approximate by design (exactness twins:
    // semdedup_pairs/_canonical above, semdedup_exactdups below), but
    // the labeling CONTRACT is exact and oracle-checkable per document:
    // every input id comes back exactly once, labeled with a
    // min-reachable canonical that (a) never exceeds its own id and
    // (b) is itself a corpus id. One row per document — never vacuous.
    "semdedup" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      SemDedup.semanticDedup(e,
          col("vec_id"), col("embedding"), nClusters = 8, threshold = 0.3,
          maxIters = 64)
        // shuffle-hash-pinned: the id frame is one row per corpus
        // vector — never broadcast; the slim single-column side builds
        .join(e.select(col("vec_id").as("__v")).hint("shuffle_hash"),
          col("canonical_id") === col("__v"), "left")
        .select(col("doc_id"),
          (col("canonical_id") <= col("doc_id") && col("__v").isNotNull)
            .cast("int").as("ok"))
        .orderBy(col("doc_id"))
    }),

    // planted exact duplicates must survive ANY clustering: identical
    // vectors produce identical assignment argmaxes, so each planted
    // pair is always co-clustered and scores cosine 1.0 — the oracle
    // enumerates the plants directly. Non-vacuous by construction (8
    // planted pairs), and it runs at the PRODUCTION cluster count.
    "semdedup_exactdups" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val planted = e.select(col("vec_id"), col("embedding"))
        .unionByName(e.where(col("vec_id") < 8)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            col("embedding")))
      SemDedup.semanticNearDupPairs(planted, col("vec_id"), col("embedding"),
          nClusters = 8, threshold = 0.95)
        .where(col("id_b") === col("id_a") + lit(1000000L) &&
          col("id_a") < 8)
        .orderBy(col("id_a"))
    }),

    // int8 embedding quantization: scale surfaces as integer ppb and the
    // codes as ints, so the gate compare is dialect-neutral (round(x/scale)
    // is the same IEEE division and half-away rounding in both engines).
    // Codes are serialized to one CSV string per row — the gate comparer
    // sorts/hashes cells, and a raw array column is unhashable there.
    "embed_quantize" -> ((s, dir) => {
      val q = Quantize.quantize(col("embedding"))
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          round(q.getField("scale") * 1e9, 0).cast("long").as("scale_ppb"),
          array_join(transform(q.getField("q"), _.cast("string")), ",")
            .as("q_csv"))
        .orderBy(col("vec_id"))
    }),

    // ── Similarity search ──────────────────────────────────────────────
    "ann_topk" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Ann.bruteForceTopK(q, c, k = 10).orderBy(col("qid"), col("cid"))
    }),

    // production-parameter LSH, held to its exact per-query invariants
    // (annInvariant): exactly k rows per query, every sim an exact
    // cosine. The WHICH-neighbors question is pinned by ann_lsh_full.
    "ann_lsh" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      annInvariant(Ann.lshTopK(q, c, k = 10, bands = 8, bandBits = 4),
        e, k = 10)
    }),

    // PQ/ADC approximate top-k at production parameters, held to the
    // annInvariant contract (k-means codebooks aren't DuckDB-
    // expressible; WHICH-neighbors recall is pinned by ann_pq_full and
    // PqSpec — here the exact re-rank and the k-per-query shape are)
    "ann_pq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      annInvariant(Pq.adcTopK(q, c, k = 10, dim = 64, m = 8,
        nCentroids = 16, overscan = 8, model = Some(pqModelFor(s, dir))),
        e, k = 10)
    }),

    // persistent-IVF-index ANN at production nprobe, annInvariant-held
    // (equivalence to ivfTopK is spec-verified; full-probe equality
    // with brute force is ann_index_query_full): train + store the
    // inverted lists once per JVM+dir (memoized like dedup_index_query)
    "ann_index_query" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val path = ivfIndexFor(s, dir)
      annInvariant(Ann.queryIvfIndex(q, path, k = 10, nprobe = 4),
        e, k = 10)
    }),

    // composed IVF+PQ index at production parameters, annInvariant-held
    // (recall/catalog-portability spec-verified; full-probe equality is
    // ann_ivfpq_full): coarse clusters + PQ codes in the lists, floats
    // only at the final re-rank — which is exactly what the invariant's
    // exact-cosine column pins
    "ann_ivfpq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      annInvariant(Pq.queryIvfPqIndex(q, ivfpqIndexFor(s, dir), k = 10,
        nprobe = 4, overscan = 8), e, k = 10)
    }),

    // ── Windowed / approximate analytics ───────────────────────────────
    // top-N per group via ranking windows (the reference has no window
    // operators — declared extension), in the two-phase salted shape of
    // Sampling.takePerGroup: five segments would otherwise each sort a
    // fifth of the corpus in ONE window task; phase 1 ranks per
    // (segment, key-hash slice), phase 2 re-ranks at most 3·salts rows
    // per segment — identical rows, bounded tasks at any scale
    "window_topk_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rank = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
      val w1 = Window.partitionBy(col("c_mktsegment"), col("__salt"))
        .orderBy(rank: _*)
      val w2 = Window.partitionBy(col("c_mktsegment")).orderBy(rank: _*)
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .withColumn("__salt", pmod(xxhash64(col("o_orderkey")), lit(16)))
        .withColumn("__rk1", row_number().over(w1))
        .where(col("__rk1") <= 3)
        .withColumn("rn", row_number().over(w2))
        .where(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
          ParityQueries.cents(col("o_totalprice")).as("price_cents"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // as-of join (no built-in in Spark): latest order at-or-before each
    // event, union+window implementation — one key shuffle, no range
    // explosion. Oracle: DuckDB's native ASOF LEFT JOIN.
    "asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val e = ev.select(col("event_id"), col("user_id"),
          graft.ops.TemporalOps.epochMicros(ev).as("ts_us"))
      val o = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("ok"))
      graft.ops.TemporalOps.asofJoin(e, o,
          leftKey = col("user_id"), rightKey = col("o_custkey"),
          // o_orderdate is TIMESTAMP_NTZ; cast in the UTC session = same
          // wall time, so unix_micros aligns with DuckDB's epoch_us
          leftTs = col("ts_us"),
          rightTs = unix_micros(col("o_orderdate").cast("timestamp")),
          payload = col("ok"))
        .orderBy(col("event_id"))
    }),

    // the hot-key-safe as-of variant MUST land on the identical answer
    // (same DuckDB ASOF oracle): 2-hour chunks, so most events' as-of
    // order sits chunks away and the carry path is genuinely exercised
    "asof_join_chunked" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val e = ev.select(col("event_id"), col("user_id"),
          graft.ops.TemporalOps.epochMicros(ev).as("ts_us"))
      val o = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("ok"))
      graft.ops.TemporalOps.asofJoinChunked(e, o,
          leftKey = col("user_id"), rightKey = col("o_custkey"),
          leftTs = col("ts_us"),
          rightTs = unix_micros(col("o_orderdate").cast("timestamp")),
          payload = col("ok"), chunkWidth = 7200000000L)
        .orderBy(col("event_id"))
    }),

    // gap-based sessionization (30-minute gap) — lag + running break sum
    "sessionize" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val e = ev.select(col("user_id"),
          graft.ops.TemporalOps.epochMicros(ev).as("ts_us"))
      graft.ops.TemporalOps.sessionize(e, col("user_id"), col("ts_us"),
          gap = 1800000000L)
        .groupBy(col("user_id"))
        .agg((max(col("session_id")) + 1).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // the hot-key-safe variant MUST land on the identical answer (same
    // oracle SQL): 2-hour chunks against the 30-minute gap, so real
    // sessions regularly cross chunk boundaries and the boundary-merge
    // pass is genuinely exercised at fixture scale
    "sessionize_chunked" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val e = ev.select(col("user_id"),
          graft.ops.TemporalOps.epochMicros(ev).as("ts_us"))
      graft.ops.TemporalOps.sessionizeChunked(e, col("user_id"),
          col("ts_us"), gap = 1800000000L, chunkWidth = 7200000000L)
        .groupBy(col("user_id"))
        .agg((max(col("session_id")) + 1).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // exact corpus statistics incl. interpolated percentiles
    "corpus_stats" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("lang"), TextOps.tokenCount(col("text")).as("n_tokens"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          // interpolated percentiles are doubles — round to a fixed
          // precision so engine/oracle ULP-level drift can't flip the gate
          round(expr("percentile(n_tokens, 0.5)"), 4).as("median_tokens"),
          round(expr("percentile(n_tokens, 0.9)"), 4).as("p90_tokens"))
        .orderBy(col("lang"))
    }),

    // sketch aggregates: HLL distinct + approximate quantiles (values are
    // approximate by construction → engine-verified in AggSpec, rows-only
    // for the driver)
    // production-parameter sketches held to exact anchors in one pass:
    // the raw HLL/quantile-sketch values are engine-specific (the
    // _bounds twin carries the historical error-band pins), so the gate
    // emits the per-group row count (a genuinely exact cross-engine
    // value) plus in-bound flags computed against the exact aggregates
    // Spark derives alongside the sketches.
    "approx_metrics" -> ((s, dir) => {
      // the exact p45–p55 band comes from the library's own
      // histogram-cutoff quantiles (one map-side-combined pass +
      // bounded driver lookup), NEVER Spark's exact `percentile`
      // aggregate — that one funnels each group's full value stream
      // into a single buffer (measured 61 s at sf0.1 vs sub-second
      // here, and a non-starter at corpus scale). Prices travel as
      // integer cents on both sides, the house dialect convention.
      val li = Tables(s, dir, "lineitem")
      val cents = round(col("l_extendedprice") * 100, 0).cast("long")
      val bands = graft.meta.PipelineMetrics.exactQuantilesPerGroup(
          li, col("l_returnflag"), cents, ps = Seq(0.45, 0.55))
        .groupBy(col("group"))
        .agg(min(when(col("p") === 0.45, col("value"))).as("__lo"),
          min(when(col("p") === 0.55, col("value"))).as("__hi"))
      // the exact distinct anchor runs as its OWN two-level aggregate
      // (distinct → count, both map-side combinable): countDistinct
      // inside the sketch aggregation would Expand the row stream and
      // drag the percentile sketch buffers over 2× the rows (measured
      // 43 s at sf0.1 vs ~1 s split)
      val exactD = li.select(col("l_returnflag"), col("l_orderkey"))
        .distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("__ed"))
        .withColumnRenamed("l_returnflag", "__edf")
      li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("__ad"),
          percentile_approx(cents, lit(0.5), lit(1000)).as("__am"))
        .join(broadcast(exactD), col("l_returnflag") === col("__edf"))
        .join(broadcast(bands), col("l_returnflag") === col("group"))
        .select(col("l_returnflag"), col("n_rows"),
          (abs(col("__ad") - col("__ed")) <= col("__ed") * 0.05)
            .cast("int").as("ok_distinct"),
          (col("__am") >= col("__lo") && col("__am") <= col("__hi"))
            .cast("int").as("ok_median"))
        .orderBy(col("l_returnflag"))
    }),

    // EXACT distributed quantiles (the approx_metrics twin made exact):
    // value-histogram + driver cumulative lookup — no sort, no window,
    // no single-task percentile path; price travels as integer cents
    // (the house dialect-safety convention). The oracle is DuckDB's own
    // quantile_disc, a genuinely independent implementation of the same
    // discrete-quantile definition.
    "exact_quantiles" -> ((s, dir) => {
      graft.meta.PipelineMetrics.exactQuantiles(
          Tables(s, dir, "lineitem"),
          round(col("l_extendedprice") * 100, 0),
          ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0))
        .select(round(col("p") * 1e6).cast("long").as("p_ppm"),
          col("value").as("price_cents"), col("n"))
        .orderBy(col("p_ppm"))
    }),

    // the per-domain twin: every group's exact quantiles off ONE
    // (group, value) histogram pass
    "exact_quantiles_by_flag" -> ((s, dir) => {
      graft.meta.PipelineMetrics.exactQuantilesPerGroup(
          Tables(s, dir, "lineitem"), col("l_returnflag"),
          round(col("l_extendedprice") * 100, 0),
          ps = Seq(0.25, 0.5, 0.9, 0.99))
        .select(col("group").as("l_returnflag"),
          round(col("p") * 1e6).cast("long").as("p_ppm"),
          col("value").as("price_cents"), col("n"))
        .orderBy(col("l_returnflag"), col("p_ppm"))
    }),

    // continuous-interpolation twin (percentile_cont / quantile_cont
    // semantics): same single histogram pass, interpolated finish.
    // Quarter-fraction ps keep every interpolation term exactly
    // representable in double, so the DuckDB compare is bit-exact.
    "exact_quantiles_cont" -> ((s, dir) => {
      graft.meta.PipelineMetrics.exactQuantilesCont(
          Tables(s, dir, "lineitem"),
          round(col("l_extendedprice") * 100, 0),
          ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0))
        .select(round(col("p") * 1e6).cast("long").as("p_ppm"),
          col("value").as("price_cents"), col("n"))
        .orderBy(col("p_ppm"))
    }),

    "exact_quantiles_cont_by_flag" -> ((s, dir) => {
      graft.meta.PipelineMetrics.exactQuantilesContPerGroup(
          Tables(s, dir, "lineitem"), col("l_returnflag"),
          round(col("l_extendedprice") * 100, 0),
          ps = Seq(0.25, 0.5, 0.75))
        .select(col("group").as("l_returnflag"),
          round(col("p") * 1e6).cast("long").as("p_ppm"),
          col("value").as("price_cents"), col("n"))
        .orderBy(col("l_returnflag"), col("p_ppm"))
    }),

    // WEIGHTED exact quantiles: "the quality level below which p of the
    // corpus's CHARS sit" — each doc weighted by its n_chars, the
    // curation-report form where doc-count quantiles mislead (a few
    // huge docs dominate the token budget). The quantile itself rides
    // the house ppm convention (p_ppm BIGINT) so BOTH engines compute
    // the rank threshold in pure integer arithmetic — no
    // DOUBLE × weight product to drift across JVM or DuckDB versions.
    "weighted_quantiles" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"),
          col("n_chars"))
      graft.meta.PipelineMetrics.exactQuantilesWeightedPpm(scored,
          col("q_ppm"), col("n_chars"),
          psPpm = Seq(0L, 250000L, 500000L, 750000L, 900000L, 990000L,
            1000000L))
        .select(col("p_ppm"), col("value").as("q_ppm"),
          col("n").as("w_total"))
        .orderBy(col("p_ppm"))
    }),

    // the per-domain twin off ONE (group, value) weighted pass
    "weighted_quantiles_by_source" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("source"),
          round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
            * 1e6, 0).cast("long").as("q_ppm"),
          col("n_chars"))
      graft.meta.PipelineMetrics.exactQuantilesWeightedPerGroupPpm(scored,
          col("source"), col("q_ppm"), col("n_chars"),
          psPpm = Seq(250000L, 500000L, 900000L))
        .select(col("group").as("source"), col("p_ppm"),
          col("value").as("q_ppm"), col("n").as("w_total"))
        .orderBy(col("source"), col("p_ppm"))
    }),

    // WEIGHTED rolling profile: the token-mass quantiles of a growing
    // corpus from persisted weighted state — write + fold + read, zero
    // corpus passes at read time; the oracle is the from-scratch
    // cumulative-weight window over the whole corpus
    "weighted_quantiles_incremental" -> ((s, dir) => {
      graft.meta.ProfileState.exactQuantilesPpmFromState(s,
          wstateFor(s, dir),
          psPpm = Seq(0L, 250000L, 500000L, 750000L, 900000L, 990000L,
            1000000L))
        .select(col("p_ppm"), col("value").as("q_ppm"),
          col("n").as("w_total"))
        .orderBy(col("p_ppm"))
    }),

    // rolling-corpus profiling from PERSISTED state: the corpus splits
    // into an existing store and an ingest batch, the (value) histogram
    // persists at write time, the batch folds in (one batch-only
    // aggregation), and the quantiles answer from state ALONE — zero
    // corpus passes at read time. The oracle recomputes quantile_disc
    // over the whole corpus from scratch, so a fold bug (lost level,
    // double count) cannot hide: it moves a quantile.
    "exact_quantiles_incremental" -> ((s, dir) => {
      // DOLLAR quantization, not cents: persisted state must ride a
      // GRID-bounded histogram (the manifest-class convention — cents
      // on lineitem is ~row-cardinality, 583k distinct at sf0.1, which
      // is a fine one-shot collect but the wrong thing to persist).
      // State build memoized per JVM+dir (qstateFor) — see the
      // state-cache block above.
      graft.meta.ProfileState.exactQuantilesFromState(s, qstateFor(s, dir),
          ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0))
        .select(round(col("p") * 1e6).cast("long").as("p_ppm"),
          col("value").as("price_usd"), col("n"))
        .orderBy(col("p_ppm"))
    }),

    // the per-domain twin: per-group state fold, per-group quantiles
    // from state alone
    "exact_quantiles_incremental_by_flag" -> ((s, dir) => {
      graft.meta.ProfileState.exactQuantilesPerGroupFromState(s,
          qstateGroupFor(s, dir),
          ps = Seq(0.25, 0.5, 0.9, 0.99))
        .select(col("group").as("l_returnflag"),
          round(col("p") * 1e6).cast("long").as("p_ppm"),
          col("value").as("price_usd"), col("n"))
        .orderBy(col("l_returnflag"), col("p_ppm"))
    }),

    // distribution drift between two corpus versions answered from two
    // persisted profile states (driver-only read — no corpus pass at
    // diff time): v1 = the pre-ingest store, v2 = store + wave. The
    // oracle recomputes both sides' grouped quantiles from scratch and
    // full-outer-joins them.
    "profile_drift" -> ((s, dir) => {
      val base = driftStatesFor(s, dir)
      graft.meta.ProfileState.profileDrift(s, base + "/v1", base + "/v2",
          ps = Seq(0.25, 0.5, 0.9))
        .select(col("group").as("l_returnflag"),
          round(col("p") * 1e6).cast("long").as("p_ppm"),
          col("n_a"), col("value_a"), col("n_b"), col("value_b"),
          col("shift"))
        .orderBy(col("l_returnflag"), col("p_ppm"))
    }),

    // production-nprobe IVF, annInvariant-held (full-probe equality
    // with brute force is ann_ivf_full)
    "ann_ivf" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      annInvariant(Ann.ivfTopK(q, c, k = 10, nClusters = 16, nprobe = 4),
        e, k = 10)
    }),

    // ── Text analysis ──────────────────────────────────────────────────
    "text_tokens" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          size(TextOps.bpeishTokens(col("text"))).as("n_bpeish"))
        .orderBy(col("doc_id"))
    }),

    "text_quality" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityStruct(col("text")).as("q"))
        .select(col("doc_id"), col("q.stopword_ratio"), col("q.alpha_ratio"),
          col("q.mean_token_len"))
        .orderBy(col("doc_id"))
    }),

    "text_langid" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // context-window chunking (window 64, stride 64) — the shaping step
    // before training-example packing; one row per chunk
    "chunk_tokens" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.tokenChunks(col("text"), window = 64, stride = 64)))
        .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
          size(col("col")).as("chunk_len"),
          array_join(col("col"), " ").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // whole-doc + rolling fingerprints at production parameters, held
    // to the class invariant SQL can check: equal texts MUST
    // fingerprint equal under both families (the raw 64-bit values are
    // hash-class; the class STRUCTURE is text_fingerprint_classes).
    // Eight planted copies keep the checked class population non-empty
    // at every SF; violations are counted over the full corpus.
    "text_fingerprint" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      // spread the one-row-group union so the rolling-hash kernel pass
      // runs wide (the dedup_simhash discipline)
      val planted = Dedup.spreadScan(
        docs.unionByName(docs.where(col("doc_id") < 8)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))),
        col("doc_id"))
      // ONE kernel pass: the frame feeds the doc count and both sides
      // of the violation join — unmaterialized, the rolling-hash
      // kernel would run three times (measured +0.5 s at sf0.1)
      val fps = planted.select(col("doc_id"), md5(col("text")).as("__h"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.rollingFingerprint(col("text")).as("rolling_fp"))
        .localCheckpoint(true)
      // merge-pinned self-join: the fingerprint frame is one row per
      // DOCUMENT — corpus-scale, never broadcast; both sides reuse one
      // exchange
      val sameText = fps.select(col("__h"), col("doc_id").as("id_a"),
          col("fp").as("fp_a"), col("rolling_fp").as("rfp_a"))
        .hint("merge")
        .join(fps.select(col("__h"), col("doc_id").as("id_b"),
          col("fp").as("fp_b"), col("rolling_fp").as("rfp_b")), Seq("__h"))
        .where(col("id_a") < col("id_b"))
      fps.agg(count(lit(1)).as("n_docs")).crossJoin(
        sameText.agg(
          coalesce(sum((col("fp_a") =!= col("fp_b")).cast("int")), lit(0))
            .as("n_fp_violations"),
          coalesce(sum((col("rfp_a") =!= col("rfp_b")).cast("int")), lit(0))
            .as("n_rolling_violations")))
    }),

    // Composite curation pipeline: exact-dedup survivors → quality gate →
    // token statistics. The shape every training-data prep job takes;
    // one declarative plan, no materialization between stages.
    "curation_pipeline" -> ((s, dir) => {
      // canonical via aggregate+join, not a hash window — a viral exact
      // duplicate would funnel its whole copy set into one window task
      // (the Dedup.exactCanonical argument, inlined here to keep the
      // text column flowing through the one shuffle)
      val docs = Tables(s, dir, "documents")
      val h = docs.withColumn("__h", md5(col("text")))
      val canon = h.groupBy(col("__h"))
        .agg(min(col("doc_id")).as("canonical_id"))
        .withColumnRenamed("__h", "__gh")
      // null-safe join: null-text docs keep their (single) group instead
      // of silently dropping — Dedup.exactCanonical's contract
      h.join(canon.hint("merge"), col("__h") <=> col("__gh"))
        .drop("__h", "__gh")
        .where(col("doc_id") === col("canonical_id"))
        .select(col("doc_id"), col("text"),
          TextOps.qualityStruct(col("text")).as("q"),
          TextOps.tokenCount(col("text")).as("n_tokens"))
        .where(col("q.alpha_ratio") > 0.5 && col("n_tokens") >= 30)
        .select(col("doc_id"), col("n_tokens"),
          col("q.stopword_ratio").as("stopword_ratio"),
          col("q.mean_token_len").as("mean_token_len"))
        .orderBy(col("doc_id"))
    }),

    // Event-time windowed aggregation (batch twin of the streaming plan —
    // graft.streaming.StreamingIngest.windowedEventCounts)
    "events_window" -> ((s, dir) => {
      graft.streaming.StreamingIngest
        .windowedEventCounts(Tables(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // ── Multimodal ─────────────────────────────────────────────────────
    "multimodal_meta" -> ((s, dir) => {
      Multimodal.fromDocuments(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("modality"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("checksum"),
          element_at(col("meta"), "lang").as("meta_lang"))
        .orderBy(col("doc_id"))
    }),

    // text → hashed embedding → embedding near-dup (vector ops without
    // a model), reduced to the invariant SQL can check: identical
    // texts hash to identical vectors, center identically, band
    // identically, and verify at cosine exactly 1 ≥ 0.9 — so EVERY
    // text-equal pair must surface, at sim 1. Eight planted copies
    // keep that population non-empty at every SF; the full production
    // pair computation still runs (the flags aggregate over all pairs).
    "text_embed_dedup" -> ((s, dir) => {
      // the near-dup operator class-collapses and lazily checkpoints
      // its input internally (Ann.cosineNearDupPairs keyed frame), so
      // the computed hash-embed kernel column evaluates ONCE — the
      // caller no longer needs its own eager materialization (which
      // paid one extra full pass as its own job)
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      // spread the one-row-group union so the hash-embed kernel pass
      // runs wide (the dedup_simhash discipline)
      val planted = Dedup.spreadScan(
        docs.unionByName(docs.where(col("doc_id") < 8)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))),
        col("doc_id"))
      val embedded = planted
        .select(col("doc_id").as("vec_id"),
          graft.ops.TextExprs.hashEmbed(
            TextOps.tokens(TextOps.normalized(col("text"))), 64).as("embedding"))
      // meanSampleMod opts into the sampled centering mean — the 100 TB
      // path (a content-keyed 1/16 sample feeds the mean pass, stable
      // under corpus growth); the default is the exact mean so library
      // callers' recall characteristics never shift without asking
      val pairs = Ann.cosineNearDupPairs(embedded, col("vec_id"),
        col("embedding"), threshold = 0.9, bands = 10, bandBits = 6,
        meanSampleMod = 16)
      val keys = planted.select(col("doc_id"), md5(col("text")).as("__h"))
      // shuffle-hash-pinned: the key frame is one md5 row per DOCUMENT —
      // corpus-scale, never broadcast; hash-building the slim digests
      // avoids sorting the pair frame (the rareShingleCommonCounts
      // discipline)
      pairs
        .join(keys.select(col("doc_id").as("id_a"), col("__h").as("__ha"))
          .hint("shuffle_hash"), Seq("id_a"))
        .join(keys.select(col("doc_id").as("id_b"), col("__h").as("__hb"))
          .hint("shuffle_hash"), Seq("id_b"))
        .agg(
          sum((col("__ha") === col("__hb")).cast("int"))
            .as("n_exactdup_pairs"),
          coalesce(sum((col("__ha") === col("__hb") &&
              round(col("sim"), 6) =!= 1.0).cast("int")), lit(0))
            .as("n_sim_violations"))
    }),

    // ── Invariant gates for the hash-based approximate families ────────
    // Each xxhash/LSH-based operator whose output DuckDB cannot recompute
    // is held to a DuckDB-checkable EXACT invariant (VERDICT r4 item 3):
    // either an exhaustive-parameter variant whose output provably equals
    // an exact computation, or the operator's recall on a subpopulation
    // where recall 1.0 is guaranteed by construction (exact duplicates
    // collide on every hash). These run in Verify only — the bench keeps
    // the production-parameter twins.

    // simhash recall on exact token-set duplicates: identical distinct-
    // token sets → identical signatures → hamming 0, and the pigeonhole
    // tables are exhaustive at radius 7, so EVERY same-set pair must
    // surface. The oracle recomputes the same-set pairs from scratch.
    "dedup_simhash_recall" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // md5 of the canonical set rendering, not the raw string: the
      // equality join ships 16-byte digests instead of whole token lists
      val sets = docs.select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(
          TextOps.tokens(TextOps.normalized(col("text"))))), "|")).as("key"))
      Dedup.simhashPairs(docs, col("doc_id"), col("text"),
          maxHamming = 7, wideTables = Some(false))
        .join(sets.select(col("doc_id").as("id_a"), col("key").as("key_a")),
          Seq("id_a"))
        .join(sets.select(col("doc_id").as("id_b"), col("key").as("key_b")),
          Seq("id_b"))
        .where(col("key_a") === col("key_b"))
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ── Image perceptual near-dup (dHash + shared pigeonhole) ────────
    // rows-only hash-class gate: PNG population + the two plant
    // families (byte clones, unsampled-column perturbations). The
    // perturbed pairs prove PERCEPTUAL matching — different bytes,
    // identical 64-bit dHash. Layout pinned single-chunk for bench
    // stability (the dedup_simhash rationale); both layouts exhaustive
    // at the radius, so the pin can never change the rows.
    "image_dedup" -> ((s, dir) => {
      // invariant summary (hash-class pair sets aren't SQL-
      // recomputable): the full production pair computation runs —
      // radius_ok aggregates over every pair — and the cross-engine
      // check counts the planted +1000000-twin pairs (4 byte clones
      // under 8, 4 perceptual perturbation pairs under +2e6/+3e6),
      // every one guaranteed found. Row-granular plant recall stays in
      // image_dedup_recall.
      ImageHash.nearDupPairs(imageDedupPop(s, dir), col("doc_id"),
          col("payload"), maxHamming = 7, wideTables = Some(false))
        .agg(
          sum((col("id_b") === col("id_a") + lit(1000000L) &&
              (col("id_a") < lit(1000000L) ||
                col("id_a") >= lit(2000000L))).cast("int"))
            .as("n_planted_pairs"),
          coalesce(max(col("hamming")) <= 7, lit(false)).cast("int")
            .as("radius_ok"))
    }),

    // oracled recall twin (the dedup_simhash_recall pattern): even ids
    // < 8 re-enter byte-identical under +1000000 → identical dHash →
    // hamming 0, and the pigeonhole tables are exhaustive at the
    // radius, so EVERY planted pair must surface. The oracle restates
    // the planted pair set from the synthesis formula.
    "image_dedup_recall" -> ((s, dir) => {
      ImageHash.nearDupPairs(imageDedupPop(s, dir), col("doc_id"),
          col("payload"), maxHamming = 7, wideTables = Some(false))
        // id_a < 1e6 keeps exactly the (base, byte-clone) pairs — the
        // perturbed plant family (+2e6/+3e6) also differs by 1e6
        .where(col("id_b") === col("id_a") + lit(1000000L) &&
          col("id_a") < lit(1000000L))
        .orderBy(col("id_a"))
    }),

    // pHash (DCT spectral hash) dedup: gray plants where byte clones
    // AND exact-power-of-two contrast re-renders land at hamming
    // EXACTLY 0 — equal-channel pixels make integer luma the pixel
    // value itself, and a 2× rescale scales every DCT partial sum by
    // an exact power of two, leaving every median comparison
    // unchanged — so the oracle restates both planted pair families
    // from the synthesis arithmetic (the audio cross-codec
    // discipline, on the spectral-hash family dHash can't represent:
    // pHash thresholds GLOBAL spectral shape, robust to blur/resize
    // where dHash signs local gradients).
    "image_phash_dedup" -> ((s, dir) => {
      graft.dedup.Dedup.hammingPairs(phashDedupPop(s, dir),
          col("doc_id"), ImageHash.pHash(col("payload")),
          maxHamming = 7, wideTables = Some(false))
        .where(col("id_a") < lit(1000000L) &&
          (col("id_b") === col("id_a") + lit(1000000L) ||
            col("id_b") === col("id_a") + lit(2000000L)))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the spectral family composed with the ROLLING signature state:
    // batch 1 folds the gray plants' pHashes into a fresh SigSeen
    // index, batch 2 folds their exact-2× contrast re-renders under
    // new ids — every batch-2 item must come back `seen` at hamming 0
    // with first_doc = its base id (the contrast invariance is FP-
    // exact, so the signatures are EQUAL, and equal signatures hit the
    // state's exact-match path). The oracle restates the entire
    // annotation from the synthesis arithmetic.
    "image_phash_incremental" -> ((s, dir) => {
      graft.dedup.SigSeen.foldBatch(phashSeenBatch(s, dir, 2),
          col("doc_id"), ImageHash.pHash(col("payload")),
          phashSigStateFor(s, dir), 2L)
        .select(col("doc_id"), col("status"), col("first_doc"),
          col("hamming"))
        .orderBy(col("doc_id"))
    }),

    // Rolling-media perceptual dedup: batch 2 of the controllable-dHash
    // population REPLAYED against the standing SigSeen index (batches 1
    // and 2 already folded by sigStateFor) — the watermark guard makes
    // this invocation a no-op on the state, and its annotation must
    // equal the first run's. The oracle restates every status from the
    // fixture's doc-id arithmetic FROM SCRATCH, so a fold that rescans,
    // loses novelty, or annotates replays differently cannot match; a
    // radius/banding regression flips 'seen' rows to 'new' and a
    // determinism break scrambles first_doc.
    "image_dedup_incremental" -> ((s, dir) => {
      graft.dedup.SigSeen.foldBatch(sigSeenBatch(s, dir, 2),
          col("doc_id"), ImageHash.dHash(col("payload")),
          sigStateFor(s, dir), 2L)
        .select(col("doc_id"), col("status"), col("first_doc"),
          col("hamming"))
        .orderBy(col("doc_id"))
    }),

    // the rolling-media fold over ANIMATIONS — frames explode through
    // the multi-signature fold, so a future animation is `seen` if it
    // shares ANY frame (within the radius) with anything ever folded:
    // the two-frame docs' first frame is a class the state has never
    // seen, and they must still come back seen through their second
    // frame — the any-frame rule no single-signature fold can express
    "gif_dedup_incremental" -> ((s, dir) => {
      graft.dedup.SigSeen.foldBatchMulti(gifSeenBatch(s, dir, 2),
          col("doc_id"), ImageHash.frameDHash(col("payload")),
          gifSigStateFor(s, dir), 2L)
        .orderBy(col("doc_id"))
    }),

    // the rolling-media fold over AUDIO fingerprints — the same
    // two-batch population as image_dedup_incremental re-rendered as
    // signature-exact WAV clips (audioTargetClip realizes any 64-bit
    // fingerprint on the 65-window energy grid), folded into its own
    // standing SigSeen index; every media family the crawler ingests
    // now has persistent near-dup memory
    "audio_dedup_incremental" -> ((s, dir) => {
      graft.dedup.SigSeen.foldBatch(audioSeenBatch(s, dir, 2),
          col("doc_id"),
          graft.multimodal.AudioHash.fingerprint(col("payload")),
          audioSigStateFor(s, dir), 2L)
        .select(col("doc_id"), col("status"), col("first_doc"),
          col("hamming"))
        .orderBy(col("doc_id"))
    }),

    // ── Audio perceptual near-dup (energy-delta fingerprint) ─────────
    // rows-only hash-class gate over the WAV population + both plant
    // families; the oracled twin below pins recall on the planted
    // pairs. Layout pinned single-chunk (the image_dedup rationale).
    "audio_dedup" -> ((s, dir) => {
      // invariant summary (the image_dedup discipline): full production
      // pair computation, cross-engine check = the planted byte-clone
      // (+1e6) and 2×-amplitude (+2e6) twin counts, guaranteed found
      // at hamming 0. Row-granular recall stays in audio_dedup_recall.
      graft.multimodal.AudioHash.nearDupPairs(audioDedupPop(s, dir),
          col("doc_id"), col("payload"), maxHamming = 7,
          wideTables = Some(false))
        .agg(
          sum((col("id_a") < lit(1000000L) &&
              (col("id_b") === col("id_a") + lit(1000000L) ||
                col("id_b") === col("id_a") + lit(2000000L))).cast("int"))
            .as("n_planted_pairs"),
          coalesce(max(col("hamming")) <= 7, lit(false)).cast("int")
            .as("radius_ok"))
    }),

    // byte clones AND 2×-amplitude re-renders must surface at hamming
    // 0 (energy scales exactly 4×, every delta sign survives; the
    // pigeonhole is exhaustive at the radius) — the oracle restates
    // both planted pair families from the synthesis arithmetic
    "audio_dedup_recall" -> ((s, dir) => {
      graft.multimodal.AudioHash.nearDupPairs(audioDedupPop(s, dir),
          col("doc_id"), col("payload"), maxHamming = 7,
          wideTables = Some(false))
        .where(col("id_a") < lit(1000000L) &&
          (col("id_b") === col("id_a") + lit(1000000L) ||
            col("id_b") === col("id_a") + lit(2000000L)))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // a G.711 µ-law RE-ENCODE of a PCM clip (compressed-codec copy of
    // the same audio) must pair with its original at hamming exactly 0
    // — the two-level plant construction makes that provable (see
    // audioDedupPop), so the oracle restates the pair set from the
    // synthesis arithmetic
    "audio_dedup_crosscodec" -> ((s, dir) => {
      graft.multimodal.AudioHash.nearDupPairs(audioDedupPop(s, dir),
          col("doc_id"), col("payload"), maxHamming = 7,
          wideTables = Some(false))
        .where(col("id_a") >= lit(3000000L) &&
          col("id_a") < lit(4000000L) &&
          (col("id_b") === col("id_a") + lit(1000000L) ||
            col("id_b") === col("id_a") + lit(2000000L)))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // an IMA ADPCM RE-ENCODE (4:1 compression, the second real
    // compressed codec beside G.711) must pair with its PCM original
    // at hamming exactly 0: the plant waveform is generated BY the
    // decoder state machine, so the encode is sample-exact and the two
    // payloads fingerprint identically (adpcmPlantPair). Twin pairs
    // only — the restated set makes no claim about cross-id pairs.
    "audio_dedup_adpcm" -> ((s, dir) => {
      graft.multimodal.AudioHash.nearDupPairs(audioAdpcmPop(s, dir),
          col("doc_id"), col("payload"), maxHamming = 7,
          wideTables = Some(false))
        .where(col("id_b") === col("id_a") + lit(1000000L))
        .orderBy(col("id_a"))
    }),

    // ── Media-curation capstone ──────────────────────────────────────
    // the modality ROUTER a mixed media crawl runs: one frame of
    // video + image + audio + non-media payloads, classified by the
    // NARROW magic-byte router (Multimodal.withFormat — a projection,
    // never a join), then each modality routed into ITS near-dup
    // operator — any-frame AVI pairs, dHash image pairs, fingerprint
    // audio pairs; unknown payloads join no pair. Summary =
    // (format, n_docs, n_pairs), every number class arithmetic (the
    // fixture controls every signature), so DuckDB replays the whole
    // composition. ONE localCheckpoint where the classified frame
    // feeds both the count and the three routing consumers.
    "media_curation_pipeline" -> ((s, dir) => {
      // classification is a NARROW projection (withFormat), never a
      // join back on doc_id — that alternative ships every payload
      // byte through a shuffle, the one cost the media plumbing
      // exists to avoid. One checkpoint serves the count and the
      // three routing consumers.
      val routed = Multimodal.withFormat(s, mediaCurationPop(s, dir))
        .localCheckpoint(true)
      val counts = routed.groupBy(col("format"))
        .agg(count(lit(1)).as("n_docs"))
      def pairsOf(fmt: String, pairs: DataFrame): DataFrame =
        pairs.agg(count(lit(1)).as("n_pairs"))
          .select(lit(fmt).as("format"), col("n_pairs"))
      val byModality =
        pairsOf("avi", ImageHash.animationNearDupPairs(
            routed.where(col("format") === "avi"),
            col("doc_id"), col("payload"), maxHamming = 7, maxFrames = 4,
            wideTables = Some(false)))
          .unionByName(pairsOf("png", ImageHash.nearDupPairs(
            routed.where(col("format") === "png"),
            col("doc_id"), col("payload"), maxHamming = 7,
            wideTables = Some(false))))
          .unionByName(pairsOf("wav",
            graft.multimodal.AudioHash.nearDupPairs(
              routed.where(col("format") === "wav"),
              col("doc_id"), col("payload"), maxHamming = 7,
              wideTables = Some(false))))
      counts.join(byModality, Seq("format"), "left")
        .select(col("format"), col("n_docs"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
        .orderBy(col("format"))
    }),

    // the capstone's INCREMENTAL twin — one MIXED month-2 crawl frame
    // (image + audio + video batch 2, globally unique ids) classified
    // by the real container parsers and routed into THREE standing
    // SigSeen states under one batch stamp, the way corpus_build has
    // its standing-UrlSeen twin. The replay is idempotent per state
    // (watermark guard), and every status is the family arithmetic
    // shifted by the id offset — fully restatable.
    "media_curation_incremental" -> ((s, dir) => {
      val stateRoot = mediaIncStateFor(s, dir)
      val frame = shiftIds(sigSeenBatch(s, dir, 2), MediaIncImg)
        .unionByName(shiftIds(audioSeenBatch(s, dir, 2), MediaIncAud))
        .unionByName(shiftIds(videoSeenBatch(s, dir, 2), MediaIncVid))
      // narrow classification (no payload-shuffling join back), one
      // checkpoint for the three routing consumers
      // LAZY: the first routing leg's fold materializes it, the other
      // two read the cache (no dedicated checkpoint job)
      val routed = Multimodal.withFormat(s, frame).localCheckpoint(false)
      def leg(format: String, out: DataFrame): DataFrame =
        out.select(lit(format).as("modality"), col("doc_id"),
          col("status"), col("first_doc"),
          col("hamming").cast("long").as("hamming"))
      leg("png", graft.dedup.SigSeen.foldBatch(
          routed.where(col("format") === "png"),
          col("doc_id"), ImageHash.dHash(col("payload")),
          stateRoot + "/img", 2L))
        .unionByName(leg("wav", graft.dedup.SigSeen.foldBatch(
          routed.where(col("format") === "wav"),
          col("doc_id"),
          graft.multimodal.AudioHash.fingerprint(col("payload")),
          stateRoot + "/aud", 2L)))
        .unionByName(leg("avi", graft.dedup.SigSeen.foldBatchMulti(
          routed.where(col("format") === "avi"),
          col("doc_id"), ImageHash.frameDHash(col("payload")),
          stateRoot + "/vid", 2L)))
        .orderBy(col("doc_id"))
    }),

    // scene-CUT detection over the frame stream: consecutive frame
    // dHash hamming above the radius marks a cut (within-scene motion
    // moves a few gradient signs; a cut rewrites the frame). Purely
    // declarative over one decode pass (zip_with + bit_count inside
    // codegen). The fixture's scene structure makes is_cut pure doc-id
    // arithmetic: frames 0-2 one exact class, 3-5 another (≥ 24 bits
    // away), so the single cut sits at frame 3.
    "video_scenes" -> ((s, dir) => {
      videoScenePop(s, dir)
        .select(col("doc_id"),
          explode(ImageHash.frameCutSignal(col("payload"), 8)).as("c"))
        .select(col("doc_id"), col("c.frame_idx").as("frame_idx"),
          (col("c.hamming") > lit(7)).as("is_cut"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // energy-threshold audio SEGMENTATION (the VAD-ish silence-split a
    // speech pipeline runs between decode and filtering): per-window
    // integer energies from one codegen kernel pass, then the
    // declarative gaps-and-islands tail — threshold, per-DOCUMENT
    // window (bounded by clip length, never a corpus window),
    // consecutive-run grouping. The fixture's active/silent window
    // pattern is doc-id arithmetic, so DuckDB replays every segment.
    "audio_segments" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val exploded = audioSegPop(s, dir)
        .select(col("doc_id"), posexplode(
          graft.multimodal.AudioHash.windowEnergy(col("payload"), 8))
          .as(Seq("w", "energy")))
        .where(col("energy") > lit(10000L))
      val runs = Window.partitionBy(col("doc_id")).orderBy(col("w"))
      exploded
        .withColumn("grp", col("w") - row_number().over(runs))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("w")).cast("int").as("start_w"),
          max(col("w")).cast("int").as("end_w"),
          count(lit(1)).as("n_windows"),
          sum(col("energy")).as("energy_sum"))
        .select(col("doc_id"), col("start_w"), col("end_w"),
          col("n_windows"), col("energy_sum"))
        .orderBy(col("doc_id"), col("start_w"))
    }),

    // ── Animation perceptual near-dup (per-frame dHash) ──────────────
    // two animations pair when ANY frame pair lands within the radius
    // (hamming = best frame match, min-aggregated so multi-signature
    // ids stay deterministic). rows-only; the oracled twin below pins
    // recall on planted byte-identical clones. The fixture's 6-gray
    // fill arithmetic makes ids congruent mod 60 byte-identical, so
    // natural hamming-0 classes exist and the pair volume stays
    // class-bounded (population capped at doc_id < 200).
    "gif_dedup" -> ((s, dir) => {
      // invariant summary (the image_dedup discipline) with a NATURAL
      // class anchor: the 6-gray synthesis makes ids congruent mod 60
      // byte-identical (the shape params repeat at lcm(5,4,3) and the
      // fill at id % 6), so every mod-60 pair must surface at hamming
      // 0 — a from-scratch arithmetic count DuckDB restates. The full
      // production pair computation still runs under radius_ok.
      val pop = syntheticAnimations(s, dir).where(col("doc_id") < 200)
        .select(col("doc_id"), col("payload"))
      ImageHash.animationNearDupPairs(pop, col("doc_id"), col("payload"),
          maxHamming = 7, maxFrames = 8, wideTables = Some(false))
        .agg(
          sum((col("id_a") % 60 === col("id_b") % 60).cast("int"))
            .as("n_mod60_pairs"),
          coalesce(max(col("hamming")) <= 7, lit(false)).cast("int")
            .as("radius_ok"))
    }),

    // planted byte-identical animations MUST pair at hamming 0 (same
    // bytes → same frame hashes; pigeonhole exhaustive at the radius);
    // the oracle restates the planted pair set from the synthesis
    "gif_dedup_recall" -> ((s, dir) => {
      val base = syntheticAnimations(s, dir).where(col("doc_id") < 200)
        .select(col("doc_id"), col("payload"))
      val pop = base.unionByName(base.where(col("doc_id") < 8)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("payload")))
      ImageHash.animationNearDupPairs(pop, col("doc_id"), col("payload"),
          maxHamming = 7, maxFrames = 8, wideTables = Some(false))
        .where(col("id_b") === col("id_a") + lit(1000000L) &&
          col("id_a") < lit(1000000L))
        .orderBy(col("id_a"))
    }),

    // ── Video perceptual near-dup (uncompressed-DIB AVI frames) ──────
    // the VIDEO leg of the rolling-media surface: real RIFF frame
    // decode → per-frame dHash → any-frame pigeonhole pairing, the
    // same machinery the animation gates ride (ImageHash dispatches on
    // the container). FULLY oracled: the population's frame hashes are
    // exact by construction (videoDedupPop), so the pair set — share a
    // frame-0 class (d%10) or a frame-1 class (d%7), hamming 0 — is
    // pure doc-id arithmetic.
    "video_dedup" -> ((s, dir) => {
      ImageHash.animationNearDupPairs(videoDedupPop(s, dir),
          col("doc_id"), col("payload"), maxHamming = 7, maxFrames = 4,
          wideTables = Some(false))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // CROSS-CODEC video dedup: the same clip planted as uncompressed
    // DIB and as MJPEG (real per-frame JPEG decode through the movi
    // '##dc' route) must pair at hamming exactly 0 — the
    // audio_dedup_crosscodec discipline for video. The ±14 class-walk
    // gradients carry a sign margin far above q=0.95 quantization
    // noise, so the two containers' frame dHashes are equal by
    // construction (pinned in AviSpec); twin pairs only, restated by
    // the oracle from the plant arithmetic.
    "video_dedup_crosscodec" -> ((s, dir) => {
      import s.implicits._
      val pop = Tables(s, dir, "documents")
        .where(col("doc_id") < 60)
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.flatMap(d => Seq(
          (d, classAviPayload(d)),
          (d + 1000000L, classAviMjpegPayload(d)))))
        .toDF("doc_id", "payload")
      ImageHash.animationNearDupPairs(pop, col("doc_id"), col("payload"),
          maxHamming = 7, maxFrames = 4, wideTables = Some(false))
        .where(col("id_b") === col("id_a") + lit(1000000L) &&
          col("id_a") < lit(1000000L))
        .orderBy(col("id_a"))
    }),

    // the rolling-media fold over VIDEO frame signatures — the
    // gifSeenBatch population re-rendered as AVI clips folded into its
    // own standing SigSeen index (multi-signature fold: the two-frame
    // docs must come back seen through their SECOND frame). With this,
    // every media family the crawler ingests — image, animation,
    // audio, video — has persistent near-dup memory.
    "video_dedup_incremental" -> ((s, dir) => {
      graft.dedup.SigSeen.foldBatchMulti(videoSeenBatch(s, dir, 2),
          col("doc_id"), ImageHash.frameDHash(col("payload")),
          videoSigStateFor(s, dir), 2L)
        .orderBy(col("doc_id"))
    }),

    // the SPECTRAL animation family: per-frame pHash instead of
    // per-frame dHash (any-frame match, best hamming). Byte-identical
    // clones must still pair at 0 — identical bytes, identical frame
    // spectra — so the same synthesis-restated oracle applies; the
    // population is capped to ids whose frames all carry real spectral
    // structure (the degenerate-frame decline drops nothing here).
    "gif_phash_dedup" -> ((s, dir) => {
      val base = syntheticAnimations(s, dir).where(col("doc_id") < 200)
        .select(col("doc_id"), col("payload"))
      val pop = base.unionByName(base.where(col("doc_id") < 8)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("payload")))
      ImageHash.animationNearDupPairsSpectral(pop, col("doc_id"),
          col("payload"), maxHamming = 7, maxFrames = 8,
          wideTables = Some(false))
        .where(col("id_b") === col("id_a") + lit(1000000L) &&
          col("id_a") < lit(1000000L))
        .orderBy(col("id_a"))
    }),

    // fingerprint equality classes must match the normalized-text
    // equality classes (xxhash64 is injective on this corpus unless a
    // 64-bit collision appears — which this gate would catch)
    "text_fingerprint_classes" -> ((s, dir) => {
      val f = Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      val g = f.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_copies"))
        .withColumnRenamed("fp", "gfp")
      // null-safe for the same reason as curation_pipeline above
      f.join(g.hint("merge"), col("fp") <=> col("gfp"))
        .select(col("doc_id"), col("canonical_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),

    // hashed-embedding near-dup recall on exact normalized-token-stream
    // duplicates: identical streams → identical vectors → identical LSH
    // signatures (centered or not) → guaranteed candidates, and the
    // exact-cosine verify scores them 1.0. Empty streams are excluded
    // (zero vectors have no cosine).
    //
    // The natural fixture contains NO same-stream pair (it does contain
    // token-SET duplicates — that's dedup_simhash_recall's population),
    // so the r5 form of this gate passed vacuously on 0 == 0 rows. The
    // gate now PLANTS its population: the 8 lowest-id documents re-enter
    // the corpus under doc_id + 1000000, guaranteeing ≥8 same-stream
    // pairs the operator must surface (the oracle plants identically).
    "text_embed_dedup_exactdups" -> ((s, dir) => {
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val corpus = base.unionByName(base.where(col("doc_id") < 8)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
      val streams = corpus
        .select(col("doc_id"),
          TextOps.tokens(TextOps.normalized(col("text"))).as("toks"))
        .where(size(col("toks")) > 0)
        .select(col("doc_id"), md5(array_join(col("toks"), "|")).as("key"))
      // no caller-side materialization: the operator class-collapses
      // and checkpoints internally, evaluating the hash-embed kernel
      // once — same rationale as text_embed_dedup above
      val embedded = corpus
        .select(col("doc_id").as("vec_id"),
          graft.ops.TextExprs.hashEmbed(
            TextOps.tokens(TextOps.normalized(col("text"))), 64).as("embedding"))
      Ann.cosineNearDupPairs(embedded, col("vec_id"), col("embedding"),
          threshold = 0.9, bands = 10, bandBits = 6, meanSampleMod = 16)
        .join(streams.select(col("doc_id").as("id_a"), col("key").as("key_a")),
          Seq("id_a"))
        .join(streams.select(col("doc_id").as("id_b"), col("key").as("key_b")),
          Seq("id_b"))
        .where(col("key_a") === col("key_b"))
        .select(col("id_a"), col("id_b"), col("sim"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // centered-LSH recall across the DENSITY SPECTRUM: every 10th
    // embedding re-enters under vec_id + 1000000 — a uniform corpus
    // sample, so the planted copies sit at every distance from the
    // corpus mean, including the densest core where the centered
    // signature's documented soft spot lives (NEAR-dups at the mean
    // have tiny decorrelated residuals and can be missed — the
    // Ann.cosineNearDupPairs tradeoff note). IDENTICAL vectors,
    // however, center to IDENTICAL residuals at ANY density —
    // bit-for-bit equal signatures, guaranteed candidacy, exact cosine
    // 1.0 — so full recall on this population is a hard invariant the
    // oracle recomputes from scratch, not a tuning property.
    // AnnRecallSpec measures the soft near-dup spectrum this gate
    // deliberately excludes.
    "text_embed_dedup_recall" -> ((s, dir) => {
      val base = Tables(s, dir, "embeddings")
        .where(size(col("embedding")) > 0)
        .select(col("vec_id"), col("embedding"))
      val corpus = base.unionByName(
          base.where(col("vec_id") % 10 === 0)
            .select((col("vec_id") + lit(1000000L)).as("vec_id"),
              col("embedding")))
        .localCheckpoint(true)
      Ann.cosineNearDupPairs(corpus, col("vec_id"), col("embedding"),
          threshold = 0.9, bands = 10, bandBits = 6, meanSampleMod = 16)
        .join(corpus.select(col("vec_id").as("id_a"),
          col("embedding").as("va")), Seq("id_a"))
        .join(corpus.select(col("vec_id").as("id_b"),
          col("embedding").as("vb")), Seq("id_b"))
        .where(col("va") === col("vb"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // IVF probing every cluster ≡ brute force (same exact-cosine rank
    // tail) — the gate proves the coarse partitioning is LOSSLESS: a
    // vector dropped or double-assigned by the k-means assignment would
    // break equality with the DuckDB brute-force oracle
    "ann_ivf_full" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Ann.ivfTopK(q, c, k = 10, nClusters = 16, nprobe = 16)
        .orderBy(col("qid"), col("cid"))
    }),

    // the persistent-index twin of ann_ivf_full: probing all 16 stored
    // lists must reproduce brute force exactly — proves the bucketed
    // lists table holds every vector exactly once
    "ann_index_query_full" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.queryIvfIndex(q, ivfIndexFor(s, dir), k = 10, nprobe = 16)
        .orderBy(col("qid"), col("cid"))
    }),

    // the grown-index twin of ann_index_query_full: build + append must
    // be indistinguishable from brute force under full probing — the
    // cross-engine proof that appended vectors landed exactly once
    "ann_index_append" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.queryIvfIndex(q, ivfAppendIndexFor(s, dir), k = 10, nprobe = 16)
        .orderBy(col("qid"), col("cid"))
    }),

    // IVF+PQ probing every cluster with the fraction-scaled overscan
    // (fullProbeOverscan: 64% of the corpus kept at any SF) — equality
    // with brute force proves the lists are lossless AND the ADC
    // ranking never drops a true top-k below the overscan line at that
    // keep-rate
    "ann_ivfpq_full" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Pq.queryIvfPqIndex(q, ivfpqIndexFor(s, dir), k = 10, nprobe = 16,
          overscan = fullProbeOverscan(s, dir, k = 10))
        .orderBy(col("qid"), col("cid"))
    }),

    // single-bit bands probe the widest possible bucket set: a top-k
    // neighbor escapes only by disagreeing with the query on ALL 32
    // hyperplane signs — verified absent on this corpus, so the banded
    // candidate join + exact-cosine re-rank must reproduce brute force
    "ann_lsh_full" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Ann.lshTopK(q, c, k = 10, bands = 32, bandBits = 1)
        .orderBy(col("qid"), col("cid"))
    }),

    // wide-overscan PQ: the ADC prefilter must rank every true top-10
    // into the fraction-scaled overscan window (fullProbeOverscan: the
    // top-64% of the corpus at any SF) — equality with brute force
    // proves the encode → ADC-score → exact-re-rank pipeline end to
    // end.
    "ann_pq_full" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Pq.adcTopK(q, c, k = 10, dim = 64, m = 8, nCentroids = 16,
          overscan = fullProbeOverscan(s, dir, k = 10),
          model = Some(pqModelFor(s, dir)))
        .orderBy(col("qid"), col("cid"))
    }),

    // sketch aggregates held to their advertised error bounds against
    // the EXACT aggregates computed in the same pass: HLL(rsd 1%) within
    // 5%, approx median inside the exact p45–p55 value band. The oracle
    // asserts every group passes — a sketch drifting out of its bound
    // fails the gate.
    "approx_metrics_bounds" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_d"),
          countDistinct(col("l_orderkey")).as("exact_d"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("approx_med"),
          expr("percentile(l_extendedprice, 0.45)").as("lo"),
          expr("percentile(l_extendedprice, 0.55)").as("hi"))
        .select(col("l_returnflag"),
          (abs(col("approx_d") - col("exact_d")) <= col("exact_d") * 0.05)
            .cast("int").as("ok_distinct"),
          (col("approx_med") >= col("lo") && col("approx_med") <= col("hi"))
            .cast("int").as("ok_median"))
        .orderBy(col("l_returnflag"))
    }),

    "multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(Tables(s, dir, "documents"))
      Multimodal.sampleFrameTable(s, media, n = 4)
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL multi-frame decode: deterministic animated GIFs (2-4 frames,
    // 6-gray-step fill — the palette the JDK GIF writer round-trips
    // EXACTLY, pinned in ImagesSpec) sampled every 2nd frame through
    // javax.imageio, with integer-exact per-frame RGB statistics. The
    // oracle recomputes every sampled frame's stats from the fill
    // formula — a frame-indexing, palette, or stride bug cannot hide.
    "multimodal_gif_frames" -> ((s, dir) => {
      Multimodal.sampleGifFrameTable(s, syntheticAnimations(s, dir),
          stride = 2)
        .toDF().orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL VIDEO frame decode: deterministic uncompressed-DIB AVIs
    // (2-4 frames, the gif gate's 6-gray-step fill behind real RIFF
    // video bytes) sampled every 2nd frame through the in-repo chunk
    // walk — skipped frames cost only offset arithmetic — with
    // integer-exact per-frame RGB statistics. The oracle recomputes
    // every sampled frame's stats from the fill formula, so a stride-
    // padding, bottom-up-row, or BGR-order bug cannot hide.
    "multimodal_video_frames" -> ((s, dir) => {
      Multimodal.sampleVideoFrameTable(s, syntheticVideos(s, dir),
          stride = 2)
        .toDF().orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL AVI container-metadata parsing: the same synthetic clips
    // classified by the RIFF header walk — every emitted field (movi
    // bytes, header frame timing, dimensions, bit depth) is recomputed
    // by the oracle from the builder arithmetic, so a builder/parser
    // asymmetry in any header field cannot hide.
    "multimodal_video_containers" -> ((s, dir) => {
      Multimodal.containerMeta(s, syntheticVideos(s, dir))
        .toDF()
        .select(col("doc_id"), col("format"), col("data_bytes"),
          col("duration_ms"), col("width"), col("height"), col("bpp"))
        .orderBy(col("doc_id"))
    }),

    // CONSTANT-BYTES golden twin of multimodal_gif_frames: ONE fixed
    // fixture (doc_id=3's exact gate shape — the ImagesSpec golden,
    // md5-pinned) through the SAME javax.imageio decode path, stats
    // AND payload md5 as columns, oracled by closed-form constants.
    // Purpose: LOCALIZE a driver-side gif failure — md5 drift = encoder,
    // stats drift at equal md5 = ImageIO reader, golden green while the
    // data gate is red = checker-side normalization on the data gate.
    "multimodal_gif_golden" -> ((s, _) => {
      import s.implicits._
      import graft.multimodal.{Images, Multimodal => MM}
      val id = 3L // w = 4+id%5 = 7, h = 3+id%4 = 6, nf = 2+id%3 = 2
      val payload = Images.encodeAnimatedGifGray(7, 6, 2,
        (f, k) => (((id * 31 + f.toLong * 17 + k.toLong * 7) % 6) * 51).toInt)
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString
      val media = Seq((id, "image/gif", payload, Map.empty[String, String]))
        .toDF("doc_id", "modality", "payload", "meta")
      MM.sampleGifFrameTable(s, media, stride = 1)
        .toDF()
        .withColumn("payload_md5", lit(md5hex))
        .orderBy(col("frame_idx"))
    }),

    // REAL sample decode over REAL container bytes: the synthetic
    // WAV/BMP media (syntheticMedia) runs through the partition-batched
    // decode, whose features for decodable payloads are integer-exact
    // statistics of the ACTUAL decoded units — 16-bit LE PCM samples
    // for WAV, stride-aware pixel-array bytes (padding excluded) for
    // BMP. The oracle recomputes the same stats from the SOURCE columns
    // byte-for-byte (samples re-assembled from the text's UTF-8 hex
    // rendering; pixels from the fill pattern over (row, pos) with the
    // format's 4-byte-aligned stride), so a bug in sample assembly,
    // signedness, stride math, or padding handling cannot hide.
    "multimodal_features" -> ((s, dir) => {
      val media = syntheticMedia(s, dir)
      Multimodal.decodeFeatures(s, media)
        .toDF()
        .select(col("doc_id"), col("modality"), col("n_bytes"),
          element_at(col("features"), 1).cast("long").as("n_units"),
          element_at(col("features"), 2).cast("long").as("unit_sum"),
          element_at(col("features"), 3).cast("long").as("unit_min"),
          element_at(col("features"), 4).cast("long").as("unit_max"))
        .orderBy(col("doc_id"))
    }),

    // REAL MP3/MP4 container-metadata parsing: spec-valid MPEG Layer III
    // streams and ISO BMFF trees synthesized from table columns
    // (syntheticAv), parsed BACK by the pure-JVM frame/box walks. The
    // oracle recomputes every emitted field from the source arithmetic
    // (frame length 144·br·1000/rate, duration from samples/rate and
    // mvhd duration/timescale), so a frame-walk, syncsafe-skip,
    // box-size, or fixed-point bug cannot hide. Sample DECODE for these
    // codecs stays honestly stubbed (FakeCodec) — this gate is the
    // metadata step a 100 TB media crawl runs first.
    "multimodal_av_containers" -> ((s, dir) => {
      Multimodal.containerMeta(s, syntheticAv(s, dir))
        .toDF()
        .select(col("doc_id"), col("format"), col("channels"),
          col("sample_rate"), col("data_bytes"), col("duration_ms"),
          col("width"), col("height"), col("vbr"))
        .orderBy(col("doc_id"))
    }),

    // REAL container parsing (graft.multimodal.Containers): WAV/BMP
    // bytes are synthesized from table columns (even doc_id → PCM WAV
    // carrying the text bytes, odd → BI_RGB BMP sized by the doc), then
    // parsed BACK by the byte-level header parsers. The oracle
    // recomputes every parsed field from the SOURCE columns, so a
    // builder/parser asymmetry in any header field cannot hide.
    "multimodal_containers" -> ((s, dir) => {
      Multimodal.containerMeta(s, syntheticMedia(s, dir))
        .toDF().orderBy(col("doc_id"))
    }),

    // REAL compressed-image decode (graft.multimodal.Images, the JDK's
    // own javax.imageio readers): PNG/JPEG payloads synthesized from
    // table columns run through BOTH image entry points — containerMeta
    // (header-only format + dimensions) and decodeFeatures (full pixel
    // decode → integer-exact channel statistics). The oracle recomputes
    // everything from the SOURCE columns: PNG is lossless, so its
    // stats re-derive from the fill formula; a uniform even-gray JPEG
    // decodes exactly uniform at the encoded value (pure DC energy,
    // zero chroma — ImagesSpec pins the invariant), so its stats are
    // closed-form. A signedness, channel-order, row-order, or
    // alpha-handling bug in the decode cannot hide.
    "multimodal_image_decode" -> ((s, dir) => {
      val media = syntheticImages(s, dir)
      val meta = Multimodal.containerMeta(s, media).toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"))
      val feats = Multimodal.decodeFeatures(s, media).toDF()
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("n_units"),
          element_at(col("features"), 2).cast("long").as("unit_sum"),
          element_at(col("features"), 3).cast("long").as("unit_min"),
          element_at(col("features"), 4).cast("long").as("unit_max"))
      meta.join(feats, Seq("doc_id")).orderBy(col("doc_id"))
    }),

    // REAL audio features over REAL decoded PCM: energy (Σ v²),
    // zero-crossings (v ≥ 0 sign convention), and peak (max |v|) of the
    // 16-bit samples the WAV fixtures carry — the DSP step between
    // decode and filtering, all integer-exact. The oracle re-assembles
    // the same signed samples from the text's hex rendering and
    // recomputes each feature, so a signedness, ordering, or overflow
    // bug in the kernel cannot hide.
    "multimodal_audio_features" -> ((s, dir) => {
      Multimodal.audioFeatures(s,
          syntheticMedia(s, dir).where(col("doc_id") % 2 === 0))
        .toDF().orderBy(col("doc_id"))
    }),

    // REAL image resize (nearest-neighbor through javax.imageio): the
    // deterministic PNGs shrink to (1 + w/2, 1 + h/2), and the gate
    // emits statistics of the RESIZED-then-redecoded pixels. Nearest
    // sampling is integer-exact — output pixel (x,y) is input pixel
    // (floor(x*sw/dw), floor(y*sh/dh)) — so the oracle recomputes every
    // resized channel value from the source fill formula alone; an
    // off-by-one in the sampling grid, a channel swap, or a lossy
    // re-encode cannot hide.
    "multimodal_resize" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Images
      syntheticImages(s, dir).where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          // gate fixtures are valid by construction: a None here IS the
          // regression this gate exists to catch — fail loudly
          val info = Images.parseImage(p).get
          val dw = 1 + info.width / 2
          val dh = 1 + info.height / 2
          val px = Images.imagePixelValues(
            Images.resizeNearest(p, dw, dh).get).get
          (id, dw, dh, px.length.toLong, px.foldLeft(0L)(_ + _),
            px.min.toLong, px.max.toLong)
        })
        .toDF("doc_id", "width", "height", "n_units", "unit_sum",
          "unit_min", "unit_max")
        .orderBy(col("doc_id"))
    }),

    // corpus-LM typicality (integer-exact perplexity-filter stand-in):
    // unigram model trained on the corpus itself, add-one smoothed,
    // per-doc mean token ppm + rare-token count
    "text_lm_score" -> ((s, dir) => {
      TextOps.lmTypicality(Tables(s, dir, "documents"),
          col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // BPE merge-step statistics: top adjacent character pairs inside
    // normalized tokens — the first counting pass of tokenizer training
    "bpe_pairs" -> ((s, dir) => {
      TextOps.bpePairStats(Tables(s, dir, "documents"), col("text"))
    }),

    // BPE encode with ZERO merges degenerates to a code-point split —
    // per-doc token count must equal the summed character count of the
    // normalized tokens, which DuckDB computes exactly
    "bpe_encode_nomerge" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.bpeTokenCount(col("text"), Nil).cast("long").as("n_bpe"))
        .orderBy(col("doc_id"))
    }),

    // full train+encode at production parameters: 50 corpus-trained
    // merges applied to every document. The merge table is data-derived
    // (not SQL-recomputable), so the gate pins the machine-checkable
    // invariants instead — lossless roundtrip (concatenating a word's
    // subword tokens reproduces the word, for ANY table) and the count
    // bounds (merges only ever shrink, one-token-per-word floor) — plus
    // the word/char counts DuckDB verifies exactly. BpeSpec holds the
    // merge loop itself to hand-computed examples.
    // the TRAINING loop itself, at small vocab: four corpus-trained
    // merge rounds (top-200 word table), each replayed MOVE FOR MOVE
    // by the oracle — DuckDB recomputes the weighted pair counts,
    // takes the same (count desc, pair asc) argmax, applies the merge
    // with the same greedy leftmost non-overlap (even offsets within
    // runs of consecutive hit positions), and recounts — so a
    // tie-break, weighting, or merge-application divergence in the
    // trainer cannot hide. The retrain-in-SQL discipline of
    // model_score_trained, applied to the tokenizer.
    "bpe_train" -> ((s, dir) => {
      import s.implicits._
      TextOps.trainBpeMerges(Tables(s, dir, "documents"), col("text"),
          numMerges = 4, maxVocabWords = 200)
        .zipWithIndex
        .map { case ((a, b), r) => (r.toLong, a, b) }
        .toDF("merge_rank", "lhs", "rhs")
        .orderBy(col("merge_rank"))
    }),

    "bpe_encode" -> ((s, dir) => {
      val merges = bpeMergesFor(s, dir)
      val toks = TextOps.tokens(TextOps.normalized(col("text")))
      val bpe = TextOps.bpeTokens(col("text"), merges)
      // spread the under-split scan: the BPE kernel pass measured as
      // two 0.7 s single-task stages (the orderBy sampler re-executes
      // the narrow chain) — Dedup.spreadScan is a no-op at corpus scale
      Dedup.spreadScan(Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"),
          size(toks).cast("long").as("n_words"),
          TextOps.bpeTokenCount(col("text"), Nil).cast("long").as("n_chars"),
          when(array_join(bpe, "") === array_join(toks, ""), 1)
            .otherwise(0).as("ok_roundtrip"),
          when(size(bpe).between(size(toks),
            TextOps.bpeTokenCount(col("text"), Nil)), 1)
            .otherwise(0).as("ok_bounds"))
        .orderBy(col("doc_id"))
    }),

    // the tokenizer's operational seam: the trained table round-trips
    // through the generation-versioned artifact (GenState — train,
    // ship, load) and the loaded table must tokenize EVERY document
    // identically to the in-memory one, with the table itself
    // byte-identical in rank order. The oracle restates the exact word
    // counts and the two invariant flags.
    "bpe_encode_persisted" -> ((s, dir) => {
      val merges = bpeMergesFor(s, dir)
      val path = java.nio.file.Files
        .createTempDirectory("graft_bpe_artifact").toString
      TextOps.saveBpeMerges(s, merges, path)
      val loaded = TextOps.loadBpeMerges(s, path)
      val toks = TextOps.tokens(TextOps.normalized(col("text")))
      val a = TextOps.bpeTokens(col("text"), merges)
      val b = TextOps.bpeTokens(col("text"), loaded)
      // spread: the bpe_encode rationale (two tables' worth of BPE
      // kernel work on one task otherwise)
      Dedup.spreadScan(Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"),
          size(toks).cast("long").as("n_words"),
          when(a === b, 1).otherwise(0).as("ok_identical"),
          lit(if (loaded == merges) 1 else 0).as("ok_table"))
        .orderBy(col("doc_id"))
    }),

    // REAL WARC (ISO 28500) parsing: spec-valid crawl shards synthesized
    // from the documents columns — three records per doc (warcinfo +
    // an HTTP response carrying a deterministic HTML page + metadata),
    // HALF of them compressed as per-record gzip members (the Common
    // Crawl .warc.gz convention; the oracle is deliberately blind to
    // which, pinning compression-transparency). Parsed BACK by the
    // byte-level record walk; the oracle recomputes every header field,
    // content length, and body md5 from the synthesis formulas, so a
    // header-fold, Content-Length, separator, HTTP-split, or gzip
    //-member bug cannot hide.
    "warc_parse" -> ((s, dir) => {
      graft.ingest.Warc.recordTable(s, syntheticWarc(s, dir),
          col("doc_id"), col("payload"))
        .select(col("file_id").as("doc_id"), col("rec_idx"),
          col("warc_type"), col("record_id"), col("target_uri"),
          col("date_s"), col("content_type"), col("content_length"),
          col("http_status"), md5(col("body")).as("body_md5"))
        .orderBy(col("doc_id"), col("rec_idx"))
    }),

    // CDX byte-offset index + random-access retrieval — the web-archive
    // capability that turns a scan-only `.warc.gz` log into a
    // point-readable table: one index row per record carrying its gzip
    // MEMBER's byte span (record span for plain shards). The gate
    // indexes each synthesized shard, then retrieves EVERY record by
    // decoding ONLY its (offset, length) span — record_id, target_uri,
    // date and block md5 all come from the FETCHED record, so a span
    // that is off by one byte fails to parse (null id ≠ oracle) and a
    // span addressing the wrong member yields the wrong record's
    // fields. `spans_exact` pins the tiling invariant: spans start at
    // 0, chain end-to-start, and close at EOF — offsets and lengths
    // cannot drift even in ways that happen to stay parseable.
    "warc_cdx_fetch" -> ((s, dir) => {
      import s.implicits._
      syntheticWarc(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, payload) =>
          val es = graft.ingest.Warc.cdxEntries(payload)
          val spans = es.map(e => (e.offset, e.length)).distinct
          val tiled = spans.nonEmpty && spans.head._1 == 0L &&
            spans.sliding(2).forall {
              case Seq((o1, l1), (o2, _)) => o1 + l1 == o2
              case _                      => true
            } && spans.last._1 + spans.last._2 == payload.length
          es.map { e =>
            val r = graft.ingest.Warc.fetchRecord(
              payload, e.offset, e.length, e.memberOrdinal)
            (id, e.recIdx, e.warcType,
              r.map(_.recordId).orNull, r.flatMap(_.targetUri).orNull,
              r.map(_.date).orNull, r.map(_.block).orNull,
              if (tiled) 1L else 0L)
          }
        })
        .toDF("doc_id", "rec_idx", "warc_type", "record_id",
          "target_uri", "date_s", "block", "spans_exact")
        .select(col("doc_id"), col("rec_idx"), col("warc_type"),
          col("record_id"), col("target_uri"), col("date_s"),
          md5(col("block")).as("block_md5"), col("spans_exact"))
        .orderBy(col("doc_id"), col("rec_idx"))
    }),

    // the index USED as a bulk point-read: filter the CDX frame to a
    // sparse workload (every 7th doc's response record), hand the
    // spans to fetchSpans, and every requested record must come back
    // via its ranged read — request rows broadcast, shards never
    // shuffle, un-requested shards drop at the join undecoded
    "warc_cdx_lookup" -> ((s, dir) => {
      val crawl = syntheticWarc(s, dir)
      val idx = graft.ingest.Warc.cdxIndex(s, crawl,
        col("doc_id"), col("payload"))
      val want = idx.where(col("warc_type") === "response" &&
          col("file_id") % 7 === 0)
        .select(col("file_id"), col("offset"), col("length"),
          col("member_ord"))
      graft.ingest.Warc.fetchSpans(s, crawl, col("doc_id"),
          col("payload"), want)
        .select(col("file_id").as("doc_id"), col("found").cast("long")
            .as("found"), col("record_id"), col("target_uri"),
          md5(col("block")).as("block_md5"))
        .orderBy(col("doc_id"))
    }),

    // the ROLLING archive index: month 1's shards append under batch 0,
    // month 2's under batch 1, month 1 REPLAYS as a no-op (a double
    // append would double every span and therefore every fetched row),
    // and a sparse point-read through the STANDING log must retrieve
    // records from BOTH generations byte-exactly — the per-crawl CDX a
    // real web archive publishes cumulatively
    "warc_cdx_incremental" -> ((s, dir) => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_cdxlog_gate").toString
      val crawl = syntheticWarc(s, dir)
      val b0 = crawl.where(col("doc_id") % 2 === 0)
      val b1 = crawl.where(col("doc_id") % 2 === 1)
      graft.ingest.CdxLog.append(s, b0, col("doc_id"), col("payload"),
        path, 0L)
      graft.ingest.CdxLog.append(s, b1, col("doc_id"), col("payload"),
        path, 1L)
      graft.ingest.CdxLog.append(s, b0, col("doc_id"), col("payload"),
        path, 0L) // at-least-once replay: must write nothing
      val want = graft.ingest.CdxLog.read(s, path)
        .where(col("warc_type") === "response" &&
          col("file_id") % 9 === 0)
        .select(col("file_id"), col("offset"), col("length"),
          col("member_ord"))
      graft.ingest.Warc.fetchSpans(s, crawl, col("doc_id"),
          col("payload"), want)
        .select(col("file_id").as("doc_id"), col("record_id"),
          col("target_uri"), md5(col("block")).as("block_md5"))
        .orderBy(col("doc_id"))
    }),

    // ARCHIVE-AWARE recrawl: staleness judged against the standing
    // archive's OWN fetch dates (the CDX date_s column), not a fixed
    // calendar cut — a change-signal feed (url, lastmod) tiers as
    // 0 = never archived (must fetch), 1 = stale (lastmod strictly
    // after the newest archived fetch), 2 = fresh/unknown (defer).
    // URLs normalize on both sides before the match; colliding
    // spellings collapse to max-of-group on each side. The equal-date
    // boundary (lastmod == fetched) is planted and must land FRESH.
    "recrawl_archive" -> ((s, dir) => {
      val crawl = syntheticWarc(s, dir)
      val archived = graft.ingest.Warc.cdxIndex(s, crawl,
          col("doc_id"), col("payload"))
        .where(col("warc_type") === "response")
        .select(graft.ops.HtmlExprs.urlNormalize(col("target_uri"))
            .as("url_canon"),
          expr("try_cast(substring(date_s, 1, 10) AS DATE)")
            .as("fetched"))
        .groupBy(col("url_canon")).agg(max(col("fetched")).as("fetched"))
      val docs = Tables(s, dir, "documents")
      val v = col("doc_id") % 4
      val ownDate = concat(lit("2026-01-0"), col("doc_id") % 9 + 1)
      val feedUrls = {
        import s.implicits._
        docs.select(col("doc_id"), col("source")).as[(Long, String)]
          .mapPartitions(_.map { case (id, src) => (id, Web.url(id, src)) })
          .toDF("doc_id", "url")
      }
      val candidates = feedUrls.select(
          graft.ops.HtmlExprs.urlNormalize(col("url")).as("url_canon"),
          when(v === 0, lit("2026-06-01"))
            .when(v === 1, lit("2025-12-31"))
            .when(v === 3, ownDate)
            .otherwise(lit(null)).cast("date").as("lastmod"))
        .unionByName(docs.where(col("doc_id") % 5 === 0)
          .select(concat(lit("https://new.example/n/"), col("doc_id"))
              .as("url_canon"),
            lit("2026-06-01").cast("date").as("lastmod")))
        .groupBy(col("url_canon")).agg(max(col("lastmod")).as("lastmod"))
      candidates.join(archived.hint("shuffle_hash"),
          Seq("url_canon"), "left")
        .select(col("url_canon"),
          when(col("fetched").isNull, lit(0))
            .when(col("lastmod") > col("fetched"), lit(1))
            .otherwise(lit(2)).cast("int").as("tier"),
          col("lastmod").cast("string").as("lastmod"),
          col("fetched").cast("string").as("fetched"))
        .orderBy(col("url_canon"))
    }),

    // the index as a SECONDARY index for selective re-processing — the
    // real 100 TB win: re-run an extractor over one host's pages by
    // FILTERING THE INDEX METADATA (a host predicate on target_uri,
    // nothing id-shaped), fetching only those spans, and extracting
    // main text from the fetched bodies; the archive is never
    // re-scanned. The oracle restates host membership and the exact
    // main-text content from the synthesis formulas.
    "warc_cdx_reextract" -> ((s, dir) => {
      val crawl = syntheticWarc(s, dir)
      val idx = graft.ingest.Warc.cdxIndex(s, crawl,
        col("doc_id"), col("payload"))
      val want = idx.where(col("warc_type") === "response" &&
          graft.ops.HtmlExprs.urlHost(col("target_uri"))
            .like("www.example-%.com"))
        .select(col("file_id"), col("offset"), col("length"),
          col("member_ord"))
      val fetched = graft.ingest.Warc.fetchSpans(s, crawl,
        col("doc_id"), col("payload"), want)
      val blockStr = col("block").cast("string")
      val body = blockStr.substr(
        instr(blockStr, "\r\n\r\n") + lit(4), length(blockStr))
      fetched.select(col("file_id").as("doc_id"),
          graft.ops.HtmlExprs.urlHost(col("target_uri")).as("host"),
          graft.ops.HtmlExprs.htmlMainText(body).as("main"))
        .select(col("doc_id"), col("host"),
          md5(col("main")).as("main_md5"),
          length(col("main")).cast("long").as("main_chars"))
        .orderBy(col("doc_id"))
    }),

    // revisit records DEREFERENCED through the index — the serving
    // flow crawler-side dedup implies: a revisit carries no payload,
    // only a WARC-Refers-To pointer; the consumer resolves the pointer
    // against the CDX frame (refers_to = record_id), point-reads the
    // ORIGINAL via its span, and re-verifies the carried digest against
    // the actually-fetched bytes. Every column and the digest verdict
    // are restated by the oracle from the fixture formulas — a fetch
    // that dereferences the wrong record or the digest comparison
    // degenerating to always-true both fail.
    "warc_revisit_fetch" -> ((s, dir) => {
      val shards = syntheticRevisitWarc(s, dir)
        .localCheckpoint(true) // consumed by recordTable, index AND fetch
      val recs = graft.ingest.Warc.recordTable(s, shards,
        col("doc_id"), col("payload"))
      val idx = graft.ingest.Warc.cdxIndex(s, shards,
        col("doc_id"), col("payload"))
      val revs = recs.where(col("warc_type") === "revisit")
        .select(col("refers_to"), col("payload_digest"))
      val want = revs.join(idx.select(col("record_id").as("refers_to"),
          col("file_id"), col("offset"), col("length"),
          col("member_ord")), Seq("refers_to"))
      val fetched = graft.ingest.Warc.fetchSpans(s, shards,
        col("doc_id"), col("payload"),
        want.select(col("file_id"), col("offset"), col("length"),
          col("member_ord")))
      val blockStr = col("block").cast("string")
      val body = blockStr.substr(
        instr(blockStr, "\r\n\r\n") + lit(4), length(blockStr))
      fetched
        .join(want.select(col("file_id"), col("offset"),
          col("member_ord"), col("refers_to"), col("payload_digest")),
          Seq("file_id", "offset", "member_ord"))
        .select(col("file_id").as("doc_id"), col("refers_to"),
          col("target_uri"), md5(body).as("fetched_md5"),
          (concat(lit("md5:"), md5(body)) === col("payload_digest"))
            .cast("long").as("digest_ok"))
        .orderBy(col("doc_id"))
    }),

    // WARC quarantine — the dead-letter side of the crawl reader
    // (corrupt shards route to re-fetch, never silently vanish): every
    // 97th payload is corrupted at synthesis (garbage prefix — the
    // version line can never parse), and the quarantine pass must
    // yield exactly those ids from a FIRST-record parse attempt, one
    // narrow pass. Same discipline (and same %97 rotation) as
    // `jsonl_roundtrip`'s corrupted-line synthesis.
    "warc_quarantine" -> ((s, dir) => {
      import s.implicits._
      val files = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text0) =>
          val recs = Seq(graft.ingest.Warc.WarcSpecRec(
            "resource", s"<urn:uuid:q-$id>",
            None, Web.date(id), "text/plain",
            (if (text0 == null) "" else text0)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          val good =
            if (id % 3 == 0) graft.ingest.Warc.buildWarcGz(recs)
            else graft.ingest.Warc.buildWarc(recs)
          (id, if (id % 97 == 0) "XX".getBytes ++ good else good)
        }).toDF("doc_id", "payload")
      graft.ingest.Warc.quarantine(s, files, col("doc_id"), col("payload"))
        .select(col("file_id").as("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // WET export → file read-back round trip: real `.warc.gz` shards
    // written by wetExport (per-record gzip members + _manifest), read
    // back through binaryFile + the member-streaming recordTable; each
    // conversion record must carry its document's exact text bytes and
    // URI. Not in the bench headline (the gate writes a fresh corpus
    // export per run — a correctness loop, not a steady-state query).
    // CLEAN-THEN-SHIP capstone: the span-removed corpus (the
    // text_dup_remove rewrite, same framing) exports as real WET
    // shards and re-ingests through the WARC record walk; the re-read
    // body md5 must equal the byte-exact retained-text md5 the
    // text_dup_remove oracle states — proving the corpus
    // TRANSFORMATION survives the wire format, not just the audit.
    // Export memoized per JVM+dir (the state-gate discipline); null
    // documents ship as "" per the WET writer contract.
    "clean_ship_roundtrip" -> ((s, dir) => {
      val out = wetCleanFor(s, dir)
      val files = s.read.format("binaryFile").load(out + "/wet-*.warc.gz")
        .select(xxhash64(col("path")).as("fid"), col("content"))
      graft.ingest.Warc.recordTable(s, files, col("fid"), col("content"))
        .select(regexp_extract(col("record_id"), "conv-(\\d+)", 1)
            .cast("long").as("doc_id"),
          md5(col("body")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // JSONL export → re-ingest round trip beside wet_roundtrip: the
    // corpus ships as gzip JSONL shards (+ one-pass _manifest) and
    // reads back through the PERMISSIVE parser with an explicit
    // schema; every column must survive the wire byte-exactly (md5 on
    // text — JSON string escaping is lossless; null text is omitted on
    // write, null on read, null md5 on both sides). The manifest's
    // record total is cross-checked against the row count — a shard
    // writer that dropped or duplicated lines cannot balance both.
    "jsonl_export" -> ((s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_jsonl_gate").toString
      graft.ingest.Jsonl.export(s, Tables(s, dir, "documents"),
        struct(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")),
        out, maxRecordsPerFile = 100, gzip = true)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val back = graft.ingest.Jsonl.readClean(s, out + "/part-*.jsonl.gz",
        schema)
      val total = s.read.parquet(out + "/_manifest")
        .agg(sum(col("n_records")).cast("long").as("manifest_rows"))
      back.select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("source"), col("n_chars"))
        .crossJoin(broadcast(total))
        .orderBy(col("doc_id"))
    }),

    // the archive lifecycle closed over REAL files: the export SHIPS
    // its own index (writeCdx — the same task that wrote a file
    // indexed the bytes it wrote, the web-archive convention of
    // publishing the CDX with the crawl), and a sparse workload (every
    // 5th doc) point-reads back through the SHIPPED artifact — each
    // text must return byte-exact via its published span alone. This
    // is the steady state a 100 TB archive runs in: write once, ship
    // the index with the write, ranged-read forever.
    "warc_cdx_files" -> ((s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_cdxfiles_gate").toString
      graft.ingest.Warc.wetExport(s, Tables(s, dir, "documents"),
        col("doc_id"),
        concat(lit("https://w.example/"), col("doc_id")),
        lit("2026-01-01T00:00:00Z"),
        coalesce(col("text"), lit("")),
        out, maxRecordsPerFile = 100, gzip = true, writeCdx = true)
      val files = s.read.format("binaryFile").load(out + "/wet-*.warc.gz")
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          xxhash64(col("path")).as("fid"), col("content"))
        .localCheckpoint(true) // consumed by the name map AND the fetch
      val want = s.read.parquet(out + "/_cdx")
        .where(regexp_extract(col("record_id"),
          "conv-(\\d+)", 1).cast("long") % 5 === 0)
        .join(files.select(col("file"), col("fid")), Seq("file"))
        .select(col("fid").as("file_id"), col("offset"), col("length"),
          col("member_ord"))
      graft.ingest.Warc.fetchSpans(s, files, col("fid"), col("content"),
          want)
        .select(regexp_extract(col("record_id"), "conv-(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri"), md5(col("block")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    "wet_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_wet_gate").toString
      graft.ingest.Warc.wetExport(s, Tables(s, dir, "documents"),
        col("doc_id"),
        concat(lit("https://w.example/"), col("doc_id")),
        lit("2026-01-01T00:00:00Z"),
        coalesce(col("text"), lit("")),
        out, maxRecordsPerFile = 100, gzip = true)
      val files = s.read.format("binaryFile").load(out + "/wet-*.warc.gz")
        .select(xxhash64(col("path")).as("fid"), col("content"))
      graft.ingest.Warc.recordTable(s, files, col("fid"), col("content"))
        .select(regexp_extract(col("record_id"), "conv-(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri"), md5(col("body")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // WARC `revisit` consumption — the crawler-side dedup signal a
    // curation pipeline should USE rather than recompute: revisit
    // records join back to their originals on WARC-Refers-To, and the
    // gate re-verifies each carried WARC-Payload-Digest against the
    // original body's actual digest (the fixture plants stale digests
    // on every 4th doc, so a comparison that always agrees fails).
    // The original-side digest is recomputed by Spark's md5 over the
    // parsed HTTP body; the oracle recomputes it with DuckDB's md5
    // from the synthesis formula — two independent digest paths.
    "warc_revisit" -> ((s, dir) => {
      val recs = graft.ingest.Warc.recordTable(s,
        syntheticRevisitWarc(s, dir), col("doc_id"), col("payload"))
      val resp = recs.where(col("warc_type") === "response")
        .select(col("record_id").as("orig_id"),
          col("target_uri").as("orig_uri"),
          concat(lit("md5:"), md5(col("body"))).as("orig_digest"))
      val revs = recs.where(col("warc_type") === "revisit")
        .select(col("file_id").as("doc_id"), col("record_id").as("rev_id"),
          col("refers_to"), col("payload_digest"), col("profile"))
      revs.join(resp, revs("refers_to") === resp("orig_id"))
        .select(col("doc_id"), col("rev_id"), col("refers_to"),
          col("orig_uri"), col("payload_digest"), col("profile"),
          when(col("payload_digest") === col("orig_digest"), 1L)
            .otherwise(0L).as("digest_ok"))
        .orderBy(col("doc_id"))
    }),

    // HTML→text boilerplate extraction (codegen kernel): deterministic
    // pages wrap each doc's ESCAPED text in real page furniture
    // (title/script/style to drop, h1 + anchor blocks, a comment), and
    // the kernel must strip the furniture, decode the entities back to
    // the original text, collapse ASCII whitespace, and segment blocks.
    // The oracle rebuilds the expected extract from the source columns
    // alone — chars, md5, and the anchor-share link-density ppm.
    "html_extract" -> ((s, dir) => {
      import s.implicits._
      val pages = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, t, src) => (id, Web.html(t, src)) })
        .toDF("doc_id", "html")
      // the one-walk struct form: txt and link_ppm from a single page
      // pass (subexpression elimination reuses the struct)
      pages.select(col("doc_id"),
          graft.ops.HtmlExprs.htmlExtractStats(col("html")).as("s"))
        .select(col("doc_id"),
          length(col("s.txt")).cast("long").as("extract_chars"),
          md5(col("s.txt")).as("extract_md5"),
          col("s.link_ppm").as("link_ppm"))
        .orderBy(col("doc_id"))
    }),

    // Link extraction (the hrefs codegen kernel) — the link-graph
    // emitter feeding PageRank: document order, duplicates kept,
    // hrefless anchors skipped, and a SCRIPT DECOY
    // (document.write('<a href=…>')) that must stay content, not
    // markup. The oracle restates the expected href list (joined on
    // chr(1)) from the synthesis arithmetic alone.
    "html_links" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.map { case (id, src) =>
          (id, Web.linksHtml(id, src))
        })
        .toDF("doc_id", "html")
        .select(col("doc_id"),
          graft.ops.HtmlExprs.hrefs(col("html")).as("ls"))
        .select(col("doc_id"), size(col("ls")).cast("long").as("n_links"),
          md5(array_join(col("ls"), "\u0001")).as("links_md5"))
        .orderBy(col("doc_id"))
    }),

    // URL-LEVEL crawl dedup — the chain the normalizer exists for:
    // two differently-messy spellings per doc of the same logical page
    // (userinfo + default port + tracking params + fragment vs a bare
    // trailing-'?' form) collapse through urlNormalize into one
    // canonical key, cross-DOC collisions included (the key is
    // doc_id % 125), then one groupBy picks the canonical first doc
    // and counts spellings. The oracle restates the canonical form
    // and both aggregates from the synthesis arithmetic.
    "url_dedup" -> ((s, dir) => {
      urlSpellings(s, dir)
        .select(col("doc_id"),
          graft.ops.HtmlExprs.urlNormalize(col("url")).as("url_canon"))
        .groupBy(col("url_canon"))
        .agg(count(lit(1)).as("n_spellings"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("url_canon"))
    }),

    // Redirect-chain resolution over REAL WARC plumbing: 3xx records'
    // Location headers (relative AND absolute — urlResolve runs
    // against each record's own URI) become edges; pointer doubling
    // maps every redirect source to its final URL in ⌈log₂ 8⌉+1
    // self-joins. The loop plants must come back non-terminal. The
    // oracle restates every row from the synthesis arithmetic.
    "redirect_resolve" -> ((s, dir) => {
      resolvedRedirects(s, dir)
        .orderBy(col("url"))
    }),

    // …and the resolved final URL FEEDS URL dedup: chains collapse
    // onto their landing page — n_sources spellings per final target,
    // lexicographic-min first source (both UTF8-ordered on each side)
    "redirect_dedup" -> ((s, dir) => {
      resolvedRedirects(s, dir)
        .where(col("terminal"))
        .groupBy(col("final_url"))
        .agg(count(lit(1)).as("n_sources"), min(col("url")).as("first_url"))
        .orderBy(col("final_url"))
    }),

    // Per-TARGET anchor aggregation — the query-document pair table:
    // canonical target URL → sorted distinct anchor strings + counts,
    // joined back to the target's document row. Composes hrefTexts ×
    // urlResolve (one href is RELATIVE to the linking page) ×
    // urlNormalize (one href is a messy spelling that must collapse
    // onto the clean one) × pack; the aggregation chain runs on ONE
    // shuffle (PlanSpec pins it). The oracle replays the synthesis
    // links and the whole aggregation from scratch.
    "anchor_targets" -> ((s, dir) => {
      val i = col("doc_id")
      val k = (col("doc_id") + 1) % 125
      val pages = Tables(s, dir, "documents").select(
        concat(lit("https://h"), i % 10, lit(".example/page/"), i)
          .as("page_url"),
        concat(
          lit("<p>pre</p><a href='HTTPS://Site"), k % 25,
          lit(".EXAMPLE.:443/p/"), k, lit("?utm_source=l#x'>anchor "),
          i % 3, lit("</a>"),
          lit("<a href='https://site"), k % 25, lit(".example/p/"), k,
          lit("'>read more</a>"),
          lit("<a href='/local/"), i % 20, lit("'>local link</a>"),
          lit("<a>no href, no pair</a>")).as("html"))
      val agg = graft.ops.LinkSignals.anchorsPerTarget(
        pages, col("page_url"), col("html"))
      // join back to the target's document row: the url_dedup canonical
      // (first doc per canonical URL); /local/ targets are not documents
      // and stay null on both sides
      val canon = urlSpellings(s, dir)
        .select(graft.ops.HtmlExprs.urlNormalize(col("url")).as("cu"),
          col("doc_id"))
        .groupBy(col("cu")).agg(min(col("doc_id")).as("target_doc"))
      agg.join(canon.hint("merge"), col("target_url") === col("cu"), "left")
        .select(col("target_url"), col("target_doc"),
          col("n_links"), col("n_anchors"),
          md5(array_join(transform(col("anchors"),
            a => concat(a.getField("anchor"), lit(""),
              a.getField("n"))), "")).as("anchors_md5"))
        .orderBy(col("target_url"))
    }),

    // Crawl-frontier construction — the composed next-batch fetch
    // list: sitemap page entries (sitemap_entries kernel) ∪ link
    // targets (hrefs × urlResolve), normalized, folded against the
    // STANDING UrlSeen index (pre-seeded with the url_dedup canonical
    // set = what the crawl already fetched). Only status='new' rows
    // survive — link targets pointing at already-crawled pages must
    // drop as 'seen', sitemap discoveries must surface exactly once
    // (their batch-first doc). The oracle recomputes candidates, the
    // seen set, and the min-doc pick from scratch; the fold runs as a
    // batch-2 REPLAY on re-invocation, so repeated Verify/Bench calls
    // in one JVM must (and do) judge identically.
    "frontier_pipeline" -> ((s, dir) => {
      val statePath = frontierStateFor(s, dir)
      val docs = Tables(s, dir, "documents")
      val sm = docs.select(col("doc_id"),
          explode(graft.ops.SitemapExprs.sitemapEntries(concat(
            lit("<urlset><url><loc>https://f.example/page/"),
            col("doc_id") % 40, lit("</loc></url></urlset>")))).as("e"))
        .select(col("doc_id"), col("e.loc").as("url"))
      val k = (col("doc_id") + 1) % 125
      val links = docs.select(col("doc_id"),
          concat(lit("https://h"), col("doc_id") % 10,
            lit(".example/page/"), col("doc_id")).as("page"),
          explode(graft.ops.HtmlExprs.hrefs(concat(
            lit("<a href='https://site"), k % 25, lit(".example/p/"), k,
            lit("'>seen already</a>")))).as("href"))
        .select(col("doc_id"),
          graft.ops.HtmlExprs.urlResolve(col("page"), col("href"))
            .as("url"))
      graft.dedup.UrlSeen.foldBatch(sm.unionByName(links),
          col("doc_id"), col("url"), statePath, 2L)
        .where(col("status") === "new")
        .select(col("url_canon"), col("first_doc"))
        .orderBy(col("url_canon"))
    }),

    // Redirect-AWARE frontier judging — closes the loop between
    // resolveChains and UrlSeen: a discovered URL whose fetch
    // 3xx-redirects to an already-crawled final URL must come back
    // 'seen', not re-enter the frontier as 'new'. Candidates resolve
    // through the redirect map first (pointer doubling; the planted
    // 2-hop chains prove composition, not just single edges) and the
    // fold judges coalesce(final_url, url). The oracle replays chain
    // resolution AND the state arithmetic from scratch: even-k
    // redirect targets land on the batch-1 canonical set (seen, with
    // the STATE's first doc = k), odd-k targets and direct URLs are
    // novel and split new/dup_in_batch by batch-min doc.
    "frontier_redirect" -> ((s, dir) => {
      val statePath = frontierRedirectStateFor(s, dir)
      val docs = Tables(s, dir, "documents")
      val k = col("doc_id") % 80
      val edges = docs.select(
          concat(lit("https://r.example/go/"), k).as("src"),
          when(k % 2 === 0,
            concat(lit("https://site"), k % 25, lit(".example/p/"), k))
            .otherwise(concat(lit("https://new.example/land/"), k))
            .as("dst"))
        .unionByName(docs.select(
          concat(lit("https://r.example/hop/"), k).as("src"),
          concat(lit("https://r.example/go/"), k).as("dst")))
      val cand = docs.select(col("doc_id"),
          concat(lit("https://r.example/go/"), k).as("url"))
        .unionByName(docs.where(col("doc_id") % 5 === 0)
          .select(col("doc_id"),
            concat(lit("https://r.example/hop/"), k).as("url")))
        .unionByName(docs.select(col("doc_id"),
          concat(lit("https://direct.example/d/"), col("doc_id") % 30)
            .as("url")))
      val res = graft.ingest.Redirects.resolveChains(
        edges, col("src"), col("dst"))
      val judged = cand
        .select(col("doc_id"),
          graft.ops.HtmlExprs.urlNormalize(col("url")).as("u"))
        .join(res.hint("shuffle_hash"), col("u") === col("url"), "left")
        .select(col("doc_id"),
          coalesce(col("final_url"), col("u")).as("target"))
      graft.dedup.UrlSeen.foldBatch(judged, col("doc_id"),
          col("target"), statePath, 2L)
        .orderBy(col("doc_id"), col("url_canon"))
    }),

    // Frontier politeness SCHEDULE — the step after frontier
    // construction: per-host fetch plan under crawl-delay. Hosts keyed
    // by urlHost; the per-host cap rides the zero-driver-state
    // BoundedTopM heap (priority = earliest first_doc, url tiebreak);
    // within-host fetch ORDER uses the pack idiom (sorted per-host
    // list + posexplode — the list is ≤ m by the cap, so no window and
    // no unbounded group buffer anywhere); Crawl-delays join as a
    // broadcast per-host dim and planned_ms = seq × delay. The oracle
    // replays cap, order, and arithmetic with a ranked window.
    "frontier_schedule" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val urls = docs.select(
          concat(lit("https://f"), col("doc_id") % 7, lit(".example/page/"),
            col("doc_id") % 40).as("url"),
          col("doc_id"))
        .groupBy(col("url")).agg(min(col("doc_id")).as("first_doc"))
      val hosted = urls.withColumn("host",
        graft.ops.HtmlExprs.urlHost(col("url")))
      val capped = graft.text.BudgetSelect.takeTopPerGroupUniform(
        hosted, col("host"), col("url"), -col("first_doc"), m = 3)
      val robots = docs.select((col("doc_id") % 7).as("i")).distinct()
        .select(concat(lit("f"), col("i"), lit(".example")).as("host"),
          (lit(500) + col("i") * 100).cast("long").as("delay_ms"))
      capped.groupBy(col("host"))
        .agg(sort_array(collect_list(
          struct(col("first_doc"), col("url")))).as("q"))
        .select(col("host"), posexplode(col("q")))
        .select(col("host"), col("pos").as("seq"),
          col("col.url").as("url_canon"),
          col("col.first_doc").as("first_doc"))
        .join(broadcast(robots), Seq("host"))
        .withColumn("planned_ms", col("seq") * col("delay_ms"))
        .orderBy(col("host"), col("seq"))
    }),

    // Recrawl SCHEDULING from sitemap change signals — frontier_schedule
    // extended to consume <lastmod>: entries parse from real sitemap
    // XML (the kernel carries lastmod verbatim), the consumer applies
    // the typed cast the parser deliberately does not (try_cast to
    // DATE — malformed and missing lastmod land in the DEFAULT tier 1,
    // never drop), and the per-host politeness cap prioritizes
    // STALE-first: tier 0 = lastmod before the cutoff, 1 = unknown
    // (conservative middle), 2 = fresh. Within-host order rides the
    // pack idiom; delays join as a broadcast dim. The oracle replays
    // tier, cap, order, and delay arithmetic with a ranked window,
    // restating tiers from the synthesis arithmetic (not re-parsing).
    "recrawl_schedule" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val v = col("doc_id") % 4
      val xml = concat(
        lit("<urlset><url><loc>https://f"), col("doc_id") % 7,
        lit(".example/page/"), col("doc_id") % 40, lit("</loc>"),
        when(v === 0, lit("<lastmod>2025-06-15</lastmod>"))
          .when(v === 1, concat(lit("<lastmod>2026-02-0"),
            (col("doc_id") % 40) % 9 + 1, lit("</lastmod>")))
          .when(v === 2, lit("<lastmod>totally fresh!</lastmod>"))
          .otherwise(lit("")),
        lit("</url></urlset>"))
      val entries = docs.select(col("doc_id"),
          explode(graft.ops.SitemapExprs.sitemapEntries(xml)).as("e"))
        .select(col("doc_id"), col("e.loc").as("url"),
          expr("try_cast(e.lastmod AS DATE)").as("lm"))
      val urls = entries.groupBy(col("url"))
        .agg(min(col("doc_id")).as("first_doc"), max(col("lm")).as("lm"))
        .select(col("url"), col("first_doc"),
          when(col("lm").isNull, lit(1))
            .when(col("lm") < lit("2026-01-01").cast("date"), lit(0))
            .otherwise(lit(2)).cast("int").as("tier"),
          graft.ops.HtmlExprs.urlHost(col("url")).as("host"))
      val capped = graft.text.BudgetSelect.takeTopPerGroupUniform(
        urls, col("host"), col("url"),
        -(col("tier").cast("long") * 1000000L + col("first_doc")), m = 3)
      val robots = docs.select((col("doc_id") % 7).as("i")).distinct()
        .select(concat(lit("f"), col("i"), lit(".example")).as("host"),
          (lit(500) + col("i") * 100).cast("long").as("delay_ms"))
      capped.groupBy(col("host"))
        .agg(sort_array(collect_list(
          struct(col("tier"), col("first_doc"), col("url")))).as("q"))
        .select(col("host"), posexplode(col("q")))
        .select(col("host"), col("pos").cast("int").as("seq"),
          col("col.url").as("url_canon"), col("col.tier").as("tier"),
          col("col.first_doc").as("first_doc"))
        .join(broadcast(robots), Seq("host"))
        .withColumn("planned_ms", col("seq") * col("delay_ms"))
        .orderBy(col("host"), col("seq"))
    }),

    // Rolling-crawl URL dedup: the standing canonical-URL index after
    // three ordered batch folds PLUS a replayed fold of batch 2 (the
    // watermark guard makes it a no-op). Output = the index itself;
    // the oracle recomputes first-seen batch and first doc from
    // scratch over the synthesis arithmetic, so a fold that rescans,
    // double-counts, or is NOT replay-idempotent cannot match.
    "url_dedup_incremental" -> ((s, dir) => {
      graft.dedup.UrlSeen.read(s, urlStateFor(s, dir))
        .orderBy(col("url_canon"))
    }),

    // Anchor-text extraction — (href, anchor text) pairs, the linking
    // page's description of its target (query-document signal for
    // ranking/retrieval data). The fixture exercises nested markup
    // inside the anchor, entity decode, whitespace collapse, an
    // hrefless anchor, and a script decoy; the oracle restates the
    // pair list (href ⟂ text on chr(2), pairs on chr(1)) from the
    // synthesis arithmetic.
    "anchor_texts" -> ((s, dir) => {
      import s.implicits._
      val pages = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.map { case (id, src) =>
          (id, "<p>pre</p><a href='https://t.example/" + id +
            "'>click <b>here</b>&amp;now</a>" +
            "<script>var a = '<a href=/evil>no</a>';</script>" +
            "<a href='/rel/" + src + "'>  spaced   text </a>" +
            "<a>no href, no pair</a>")
        })
        .toDF("doc_id", "html")
      pages.select(col("doc_id"),
          graft.ops.HtmlExprs.hrefTexts(col("html")).as("ps"))
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_pairs"),
          md5(array_join(transform(col("ps"),
            p => concat(p.getField("href"), lit("\u0002"),
              p.getField("anchor_text"))), "\u0001")).as("pairs_md5"))
        .orderBy(col("doc_id"))
    }),

    // Canonical-URL normalization (codegen kernel) for URL-level crawl
    // dedup: three messy spellings per doc (uppercase host + userinfo +
    // default port + tracking params + fragment; portless-https with
    // duplicate param names; non-http scheme with unsorted params and
    // empty-param tail). The oracle states the expected canonical form
    // directly from the synthesis arithmetic — it does NOT re-implement
    // the normalizer, so a rule regression cannot self-confirm.
    "url_normalize" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.map { case (id, src) => (id, Web.url(id, src)) })
        .toDF("doc_id", "url")
        .select(col("doc_id"), col("url"),
          graft.ops.HtmlExprs.urlNormalize(col("url")).as("url_norm"),
          graft.ops.HtmlExprs.urlHost(col("url")).as("host"))
        .orderBy(col("doc_id"))
    }),

    // The composed Common Crawl ingest chain — WARC shard → record
    // explode → HTTP response bodies → HTML text extraction + URL
    // canonicalization — one narrow plan, no shuffle until a downstream
    // operator needs one. The oracle recomputes the end state from the
    // source columns, so a drift ANYWHERE in the chain (record walk,
    // HTTP split, charset decode, extraction, URL rules) surfaces here
    // even if each piece gate still passes its own.
    "web_pipeline" -> ((s, dir) => {
      graft.ingest.Warc.recordTable(s, syntheticWarc(s, dir),
          col("doc_id"), col("payload"))
        .where(col("warc_type") === "response")
        .select(col("file_id").as("doc_id"),
          graft.ops.HtmlExprs.urlNormalize(col("target_uri")).as("url_norm"),
          graft.ops.HtmlExprs.urlHost(col("target_uri")).as("host"),
          // charset-honoring decode from the HTTP header (here utf-8;
          // CharsetDecodeSpec legs cover latin-1 and garbage charsets)
          graft.ops.HtmlExprs.htmlExtractStats(graft.ops.HtmlExprs
            .charsetDecode(col("http_content_type"), col("body")))
            .as("s"))
        .select(col("doc_id"), col("url_norm"), col("host"),
          length(col("s.txt")).cast("long").as("extract_chars"),
          md5(col("s.txt")).as("extract_md5"),
          col("s.link_ppm").as("link_ppm"))
        .orderBy(col("doc_id"))
    }),

    // MAIN-content extraction (boilerplate REMOVAL, not just tag
    // stripping): pages wrap each doc's text in a nav bar and a
    // link-farm footer, both above the 50% link-density cut — the
    // kernel must drop those blocks whole and keep the h1 + article.
    // The full extract (kept for contrast) proves the dropped text WAS
    // in the page; the oracle recomputes both from the source columns.
    "html_main_text" -> ((s, dir) => {
      import s.implicits._
      val pages = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, t, src) =>
          (id, Web.htmlWithNav(t, src))
        })
        .toDF("doc_id", "html")
      pages.select(col("doc_id"),
          graft.ops.HtmlExprs.htmlMainText(col("html")).as("main"),
          graft.ops.HtmlExprs.htmlExtract(col("html")).as("full"))
        .select(col("doc_id"),
          length(col("main")).cast("long").as("main_chars"),
          md5(col("main")).as("main_md5"),
          length(col("full")).cast("long").as("full_chars"))
        .orderBy(col("doc_id"))
    }),

    // Per-DOMAIN cap — the crawl diversity step "keep the m best pages
    // per host": canonical host (url_host kernel) feeds the uniform
    // top-m-per-group selection, whose groups are DISCOVERED from the
    // data (a crawl cannot enumerate its hosts up front). No per-group
    // ranking window anywhere; the oracle IS that window.
    "domain_top" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, t, src) =>
          (id, Web.url(id, src), t)
        })
        .toDF("doc_id", "url", "text")
      val scored = docs.select(col("doc_id"),
        graft.ops.HtmlExprs.urlHost(col("url")).as("host"),
        round(TextOps.qualityStruct(coalesce(col("text"), lit("")))
          .getField("alpha_ratio") * 1e6, 0).cast("long").as("q_ppm"))
      graft.text.BudgetSelect.takeTopPerGroupUniform(scored, col("host"),
          col("doc_id"), col("q_ppm"), m = 3L)
        .orderBy(col("doc_id"))
    }),

    // Fixed-point integer PageRank over the synthesized host link
    // graph — the web-graph quality PRIOR (each doc's host links to a
    // rotated sibling and to one hub host that stays DANGLING, so rank
    // concentration and the dangling-mass contract both exercise). The
    // recurrence is integer-exact (ppb longs, floor divisions), so the
    // oracle replays all 3 iterations bit-for-bit in SQL.
    // the REAL chain into PageRank: page markup → hrefs → resolved +
    // normalized targets → host-level edges (intra-host links drop,
    // the standard host-graph rule — the relative link plants exactly
    // that decoy) → fixed-point integer PageRank. The oracle restates
    // the edge multiset from the synthesis arithmetic and replays all
    // three integer iterations.
    "link_graph_rank" -> ((s, dir) => {
      val pages = Tables(s, dir, "documents").select(
        concat(lit("https://h"), col("doc_id") % 12, lit(".example/p/"),
          col("doc_id")).as("page"),
        concat(lit("<a href='https://h"), (col("doc_id") + 5) % 12,
          lit(".example/x/"), col("doc_id") % 7, lit("'>out</a>"),
          lit("<a href='/local/"), col("doc_id") % 3,
          lit("'>intra-host decoy</a>")).as("html"))
      val links = pages
        .select(col("page"),
          explode(graft.ops.HtmlExprs.hrefs(col("html"))).as("href"))
        .select(graft.ops.HtmlExprs.urlHost(col("page")).as("src"),
          graft.ops.HtmlExprs.urlHost(graft.ops.HtmlExprs.urlResolve(
            col("page"), col("href"))).as("dst"))
        .where(col("src") =!= col("dst"))
      graft.ops.GraphOps.pageRankFixedPoint(links, col("src"), col("dst"),
          iters = 3)
        .orderBy(col("node"))
    }),

    "host_rank" -> ((s, dir) => {
      import s.implicits._
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, src) =>
          val from = Web.host(id, src)
          Seq((from, "www.example-" + ((id + 3) % 10) + ".com"),
            (from, "hub.example"))
        }).toDF("src", "dst")
      graft.ops.GraphOps.pageRankFixedPoint(edges, col("src"), col("dst"),
          iters = 3)
        .orderBy(col("node"))
    }),

    // Rule-based sentence segmentation — the chunk-boundary prior for
    // context packing, under a deterministic cross-engine contract
    // (boundary = [.!?]+ then ASCII ws; punctuation stays left; ws
    // drops; edges trim; empties vanish — abbreviation handling is
    // model territory, not claimed). The synthesis frames each doc
    // with known sentences plus a punctuation run and a mid-text
    // ellipsis; the oracle re-derives the segmentation with the
    // marker-insertion regex and compares counts + the joined md5.
    "text_sentences" -> ((s, dir) => {
      val framed = concat(lit("A one. B two!? "),
        coalesce(col("text"), lit("")), lit(" ... C three? D"))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.TextExprs.sentences(framed).as("ss"))
        .select(col("doc_id"),
          size(col("ss")).cast("long").as("n_sentences"),
          md5(array_join(col("ss"), "\u0001")).as("sents_md5"))
        .orderBy(col("doc_id"))
    }),

    // robots.txt compliance (RFC 9309): per-HOST robots files parse
    // ONCE on the dim side (robots_rules), broadcast, and every URL
    // row evaluates the longest-match allow/disallow decision in
    // codegen. The synthesis exercises the discriminating semantics —
    // a non-matching agent group that must be ignored, a comment to
    // strip, and a Disallow/Allow pair where ONLY longest-match wins
    // (a disallow-first evaluation flips every m2 host's answer). The
    // oracle states the expected flag from the synthesis arithmetic.
    "robots_filter" -> ((s, dir) => {
      import s.implicits._
      val pages = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.map { case (id, src) => (id, Web.url(id, src)) })
        .toDF("doc_id", "url")
        .select(col("doc_id"), col("url"),
          graft.ops.HtmlExprs.urlHost(col("url")).as("host"))
      val robots = pages.select(col("host")).distinct()
        .select(col("host"),
          when(col("host").startsWith("www."),
            lit("User-agent: evilbot\nDisallow: /\n\n" +
              "User-agent: *\nDisallow: /src1 # the only live rule"))
          .when(col("host").startsWith("api."),
            lit("User-agent: *\nDisallow: /private\nAllow: /"))
          .otherwise(
            lit("User-agent: *\nDisallow: /pub\nAllow: /pub/"))
          .as("txt"))
        .select(col("host"),
          graft.ops.HtmlExprs.robotsRules(col("txt")).as("rules"))
      pages.join(broadcast(robots), Seq("host"))
        .select(col("doc_id"), col("host"),
          graft.ops.HtmlExprs.robotsAllowed(col("url"), col("rules"))
            .cast("int").as("allowed"))
        .orderBy(col("doc_id"))
    }),

    // robots.txt politeness metadata — the de-facto extensions a
    // crawler consumes beyond allow/disallow: the applicable group's
    // Crawl-delay (floor milliseconds, fractional seconds supported;
    // NULL when unstated — distinct from an explicit 0) and the
    // file-global Sitemap URLs in document order. A decoy delay in a
    // non-matching agent group must never leak (group scoping), and
    // the delay line sits after the group's rules (rule-block
    // attachment). The oracle restates everything from the synthesis.
    "robots_meta" -> ((s, dir) => {
      val txt = concat(
        lit("User-agent: evilbot\nCrawl-delay: 99\nDisallow: /\n\n"),
        lit("Sitemap: https://s.example/"), col("source"), lit("/a.xml\n"),
        lit("User-agent: *\nDisallow: /x\n"),
        when(col("doc_id") % 3 === 0,
          concat(lit("Crawl-delay: "), col("doc_id") % 7, lit("."),
            col("doc_id") % 10, lit("\n")))
          .otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit("Sitemap: https://s.example/"), col("doc_id"),
            lit("/b.xml\n")))
          .otherwise(lit("")))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.HtmlExprs.robotsCrawlDelayMs(txt).as("delay_ms"),
          graft.ops.HtmlExprs.robotsSitemaps(txt).as("sm"))
        .select(col("doc_id"), col("delay_ms"),
          size(col("sm")).cast("long").as("n_sitemaps"),
          md5(array_join(col("sm"), "\u0001")).as("sitemaps_md5"))
        .orderBy(col("doc_id"))
    }),

    // Per-host politeness BUDGET — the crawl-planning artifact the
    // delay metadata exists for: URL counts per host joined with each
    // host's broadcast robots Crawl-delay (parsed ONCE on the dim
    // side), est. serial crawl time = n_urls × delay (stated delays
    // in www/api hosts, the 1 s politeness default elsewhere). The
    // oracle restates counts, delays, and the product from the
    // synthesis arithmetic.
    "crawl_budget" -> ((s, dir) => {
      import s.implicits._
      val pages = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.map { case (id, src) => (id, Web.url(id, src)) })
        .toDF("doc_id", "url")
        .select(col("doc_id"),
          graft.ops.HtmlExprs.urlHost(col("url")).as("host"))
      val robots = pages.select(col("host")).distinct()
        .select(col("host"),
          when(col("host").startsWith("www."),
            lit("User-agent: *\nDisallow: /private\nCrawl-delay: 2"))
          .when(col("host").startsWith("api."),
            lit("User-agent: *\nCrawl-delay: 0.5\nDisallow: /x"))
          .otherwise(lit("User-agent: *\nDisallow: /pub")) // no delay
          .as("txt"))
        .select(col("host"),
          graft.ops.HtmlExprs.robotsCrawlDelayMs(col("txt"))
            .as("delay_ms"))
      pages.groupBy(col("host"))
        .agg(count(lit(1)).as("n_urls"))
        .join(broadcast(robots), Seq("host"))
        .select(col("host"), col("n_urls"), col("delay_ms"),
          (col("n_urls") * coalesce(col("delay_ms"), lit(1000L)))
            .as("crawl_ms"))
        .orderBy(col("host"))
    }),

    // Sitemap XML parsing — the step after robots_meta's Sitemap URL
    // extraction: the documents themselves become crawl-frontier rows.
    // Synthesis: 4-in-5 docs get a <urlset> (an entity-encoded loc
    // with lastmod, a CDATA loc, a no-loc decoy, and an UNTERMINATED
    // final block that must still parse best-effort); every 5th doc a
    // <sitemapindex> (one well-formed child, a blank-loc decoy, an
    // unterminated child). The oracle restates every surviving entry
    // and position from the arithmetic — the decoys must vanish
    // WITHOUT shifting positions.
    "sitemap_parse" -> ((s, dir) => {
      val sid = concat(lit("https://s"), col("doc_id") % 20, lit(".example"))
      val xml = when(col("doc_id") % 5 =!= 0, concat(
          lit("<?xml version=\"1.0\"?><urlset><url><loc>"),
          sid, lit("/page/"), col("doc_id"), lit("?a=1&amp;b=2</loc>"),
          lit("<lastmod>2024-0"), col("doc_id") % 9 + 1,
          lit("-01</lastmod></url>"),
          lit("<url><loc><![CDATA["), sid, lit("/cdata/"), col("doc_id"),
          lit("]]></loc></url>"),
          lit("<url><lastmod>2024-01-01</lastmod></url>"),
          lit("<url><loc>https://tail.example/"), col("doc_id"),
          lit("</loc>")))
        .otherwise(concat(
          lit("<sitemapindex><sitemap><loc>"), sid, lit("/sm-"),
          col("doc_id"), lit(".xml</loc><lastmod>2024-02-02</lastmod>"),
          lit("</sitemap><sitemap><loc> </loc></sitemap>"),
          lit("<sitemap><loc>https://tail.example/idx-"), col("doc_id"),
          lit(".xml</loc>")))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.ops.SitemapExprs.sitemapEntries(xml)))
        .select(col("doc_id"), col("pos"), col("col.loc").as("loc"),
          col("col.lastmod").as("lastmod"),
          col("col.is_index").as("is_index"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // Gopher-rule quality statistics (Rae et al. 2021's published
    // filter set) as RAW INTEGER COUNTS — n_words, word code points,
    // symbols (#/…/...), lines, bullet-led and ellipsis-ended lines,
    // alpha words, stopword hits — plus the integer-exact pass flag.
    // The synthesis decorates each doc with a bullet line, a
    // dots-ended line, and (every 3rd doc) a symbol line, so every
    // counter moves; the oracle recomputes all of them from the same
    // framed text with DuckDB list ops.
    // the corpus DATASHEET — the one-call summary a dataset release
    // ships ("datasheets for datasets"): per-language doc counts,
    // within-language exact-dup count (normalized-text equality),
    // Gopher quality pass count, token totals, and the EXACT p50 of
    // document length (percentile_disc via the bounded-histogram
    // quantile op — no corpus sort, no window). Aggregation-shaped end
    // to end: one pass for the grouped sums (distinct-text count rides
    // the same aggregation), one slim histogram pass for the median.
    "corpus_datasheet" -> ((s, dir) => {
      val t = coalesce(col("text"), lit(""))
      val base = Tables(s, dir, "documents")
        .where(col("lang").isNotNull)
        .select(col("lang"), col("doc_id").cast("long").as("doc_id"),
          TextOps.normalized(t).as("nt"),
          size(TextOps.tokens(TextOps.normalized(t))).cast("long")
            .as("n_words"),
          graft.ops.TextExprs.gopherStats(t).getField("pass")
            .cast("long").as("gpass"))
        .localCheckpoint(true) // consumed by the agg AND the histogram
      val agg = base.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(col("nt"))).as("n_dup_docs"),
        sum(col("gpass")).as("n_gopher_pass"),
        sum(col("n_words")).as("total_words"))
      val p50 = graft.meta.PipelineMetrics.exactQuantilesPerGroup(
          base, col("lang"), col("n_words"), Seq(0.5))
        .select(col("group").as("lang"), col("value").as("p50_words"))
      agg.join(p50, Seq("lang")).orderBy(col("lang"))
    }),

    "gopher_stats" -> ((s, dir) => {
      val framed = concat(coalesce(col("text"), lit("")),
        lit("\n• item "), col("source"),
        lit("\ntrailing dots..."),
        when(col("doc_id") % 3 === 0, concat(lit("\n# tag …")))
          .otherwise(lit("")))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.TextExprs.gopherStats(framed).as("g"))
        .select(col("doc_id"), col("g.*"))
        .orderBy(col("doc_id"))
    }),

    // Batched MODEL-INFERENCE plumbing (BatchScore): the classifier
    // itself is the STUB HashScorer (the JVM ships no model runtime),
    // deliberately chosen oracle-expressible so the WHOLE plumbing —
    // batching, per-executor singleton, null/empty bypass, positional
    // re-zip — verifies end to end: a batch-boundary or zip bug would
    // shift scores off their documents. batchSize=37 never divides the
    // partition evenly, so ragged final batches are always exercised.
    "model_score" -> ((s, dir) => {
      graft.text.BatchScore.score(s, Tables(s, dir, "documents"),
          col("doc_id"), col("text"), batchSize = 37)
        .select(col("id").as("doc_id"), col("score_ppm"))
        .orderBy(col("doc_id"))
    }),

    // A REAL trained scorer through the SAME inference plumbing: a
    // hashing-trick linear model, closed-form integer-exact training
    // (smoothed presence-probability-difference weights) over
    // Gopher-pass labels, scoring as the mean present-bucket weight
    // centered at 500000. md5 bucketing keeps the whole pipeline
    // DuckDB-restatable: the oracle re-derives the labels, retrains
    // the weights, and re-scores every document from scratch — a
    // drifted weight, a tokenizer mismatch, or a trunc-vs-floor
    // division slip all surface as value mismatches.
    "model_score_trained" -> ((s, dir) => {
      graft.text.BatchScore.score(s, Tables(s, dir, "documents"),
          col("doc_id"), col("text"), scorer = linearModelFor(s, dir),
          batchSize = 37)
        .select(col("id").as("doc_id"), col("score_ppm"))
        .orderBy(col("doc_id"))
    }),

    // …and the trained score DRIVING a selection: per-domain top-3 by
    // learned quality through the zero-driver-state BoundedTopM heap —
    // the r15 per-domain-cap flagship re-keyed on a REAL model's
    // output instead of a heuristic. The oracle retrains, re-scores,
    // and replays the cap with a ranked window.
    "domain_top_trained" -> ((s, dir) => {
      val scored = graft.text.BatchScore.score(s,
          Tables(s, dir, "documents"), col("doc_id"), col("text"),
          scorer = linearModelFor(s, dir), batchSize = 37)
        .select(col("id").as("doc_id"), col("score_ppm"))
        .withColumn("host",
          concat(lit("site"), col("doc_id") % 25, lit(".example")))
      graft.text.BudgetSelect.takeTopPerGroupUniform(scored, col("host"),
          col("doc_id"), col("score_ppm"), m = 3)
        .select(col("host"), col("doc_id"), col("score_ppm"))
        .orderBy(col("host"), col("doc_id"))
    }),

    // TOKEN-budgeted inference batching (BatchScore.scoreByTokens):
    // batches flush at 97 total whitespace tokens (never divides the
    // corpus evenly → ragged batches throughout) and docs truncate to
    // an 11-token model context, so MOST documents exercise the
    // truncation path. The oracle recomputes the truncated text, its
    // md5 score, the clamped token count, and the truncation flag from
    // the raw text with DuckDB list ops — a packing bug that re-zips
    // scores off their documents, an off-by-one in the slice, or a
    // truncation that leaks past the context all surface as value
    // mismatches.
    "model_score_tokens" -> ((s, dir) => {
      graft.text.BatchScore.scoreByTokens(s, Tables(s, dir, "documents"),
          col("doc_id"), col("text"), TextOps.tokens(col("text")),
          maxBatchTokens = 97, maxDocTokens = 11)
        .select(col("id").as("doc_id"), col("score_ppm"),
          col("n_tokens"), col("truncated"))
        .orderBy(col("doc_id"))
    }),

    // JSONL ingest (the LLM dataset interchange format) with the CSV
    // path's quarantine discipline: every ~97th line is corrupted at
    // synthesis, and the reader must yield exactly the intact rows —
    // one PERMISSIVE parse, corrupt lines to the dead-letter frame
    // (JsonlSpec pins that side), never a task failure. The oracle is
    // the source table minus the corrupted ids.
    "jsonl_roundtrip" -> ((s, dir) => {
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string")
        .add("lang", "string").add("source", "string")
      val lines = Tables(s, dir, "documents")
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"))).as("line"))
        .select(when(col("doc_id") % 97 === 0,
            concat(lit("{corrupt "), col("line")))
          .otherwise(col("line")).as("value"))
      graft.ingest.Jsonl.cleanFrom(lines, schema)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // HTML document METADATA — the signals text extraction deliberately
    // drops but curation wants: title (entity-decoded, ws-normalized),
    // the html lang attribute (a language-id prior), the rel=canonical
    // href (the page's own dedup key), and the meta description. The
    // synthesis rotates each signal ABSENT (doc_id % 4) and mixes
    // quoting styles, so a presence/absence or attribute-parsing bug
    // cannot hide; the oracle restates each field from the columns.
    "html_meta" -> ((s, dir) => {
      import s.implicits._
      val pages = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, lang, src) =>
          val langAttr = if (id % 4 == 0) "" else " lang=\"" + lang + "\""
          val canon =
            if (id % 4 == 1) ""
            else "<link rel=canonical href='https://c.example/" + src +
              "/" + id + "'/>"
          val desc =
            if (id % 4 == 2) ""
            else "<meta name=\"description\" content=\"doc " + id +
              " of " + src + "\"/>"
          (id, "<html" + langAttr + "><head><title> " + src +
            "  page &amp; " + id + " </title>" + canon + desc +
            "</head><body><p>x</p></body></html>")
        })
        .toDF("doc_id", "html")
      pages.select(col("doc_id"),
          graft.ops.HtmlExprs.htmlMeta(col("html")).as("m"))
        .select(col("doc_id"), col("m.title").as("title"),
          col("m.lang_attr").as("lang_attr"),
          col("m.canonical").as("canonical"),
          col("m.description").as("description"))
        .orderBy(col("doc_id"))
    }),

    // The full crawl-curation capstone — one declarative chain of this
    // round's surface feeding the selection + dedup machinery:
    //   WARC shards → response records → charset-honoring decode →
    //   MAIN-content extraction → quality scoring → per-domain cap
    //   (best 5 per host) → exact dedup (canonical survivors).
    // The oracle recomputes the END STATE from the source columns
    // (expected main text, quality formula, per-host ranked window,
    // md5-group dedup), so a drift anywhere in the chain surfaces here
    // even if every piece gate stays green.
    "crawl_pipeline" -> ((s, dir) => {
      import s.implicits._
      val recs = graft.ingest.Warc.recordTable(s, syntheticWarc(s, dir),
          col("doc_id"), col("payload"))
        .where(col("warc_type") === "response")
      val pages = recs.select(col("file_id").as("doc_id"),
        graft.ops.HtmlExprs.urlHost(col("target_uri")).as("host"),
        graft.ops.HtmlExprs.htmlMainText(graft.ops.HtmlExprs
          .charsetDecode(col("http_content_type"), col("body")))
          .as("main"))
      // MATERIALIZE before the selections: the per-host cap and the
      // model join each scan their input more than once, and every
      // pass would otherwise re-run the whole WARC-parse + extraction
      // chain — at sf0.1 that read as a 13 s gate for ~1 s of actual
      // work, and at crawl scale it is the difference between one
      // ingest pass and several
      val gated = pages.select(col("doc_id"), col("host"), col("main"),
          graft.ops.TextExprs.gopherStats(col("main")).getField("pass")
            .cast("long").as("gopher_pass"))
        .localCheckpoint(true)
      // COMPOSED page quality, the way a real curation stacks its
      // signals: the classifier score (BatchScore, the stub md5 model)
      // GATED by the rule-based gopher pass — a page the rules reject
      // scores 0 no matter what the model says
      val modeled = graft.text.BatchScore.score(s, gated, col("doc_id"),
          col("main"), batchSize = 53)
        .select(col("id").as("doc_id"), col("score_ppm").as("model_ppm"))
      // host-graph PRIOR as the global tiebreak: the same PageRank the
      // host_rank gate pins, joined back by host
      val edges = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, src) =>
          val from = Web.host(id, src)
          Seq((from, "www.example-" + ((id + 3) % 10) + ".com"),
            (from, "hub.example"))
        }).toDF("src", "dst")
      val rank = graft.ops.GraphOps.pageRankFixedPoint(edges,
        col("src"), col("dst"), iters = 3)
      val scored = gated
        .join(modeled, Seq("doc_id"))
        .join(rank.withColumnRenamed("node", "host"), Seq("host"))
        .select(col("doc_id"), col("host"), col("main"),
          col("gopher_pass"), col("model_ppm"), col("rank_ppb"),
          (col("model_ppm") * col("gopher_pass")).as("q_ppm"))
        .localCheckpoint(true)
      val capped = graft.text.BudgetSelect.takeTopPerGroupUniform(scored,
          col("host"), col("doc_id"), col("q_ppm"), m = 5L)
        .localCheckpoint(true) // consumed twice by the dedup annotate+join
      val canon = Dedup.exactCanonical(capped, col("doc_id"), col("main"))
        .where(col("doc_id") === col("canonical_id"))
        .join(capped.select(col("doc_id"), col("host"), col("gopher_pass"),
          col("model_ppm"), col("rank_ppb"), col("q_ppm"),
          md5(col("main")).as("main_md5")), Seq("doc_id"))
      // final GLOBAL selection: top 40 by (gated score DESC, host rank
      // DESC, doc_id ASC) over a composed integer key (q_ppm ≤ 10⁶,
      // rank_ppb < 2×10⁹ — lossless packing). takeTopSmall, NOT
      // takeTop: the composed key is distinct per row, so the
      // histogram path's level table would be the full key set at
      // crawl scale; the size-40 heap aggregate costs O(40)/partition
      graft.text.BudgetSelect.takeTopSmall(canon, col("doc_id"),
          col("q_ppm") * lit(2000000000L) + col("rank_ppb"), m = 40L)
        .select(col("doc_id"), col("host"), col("gopher_pass"),
          col("model_ppm"), col("rank_ppb"), col("q_ppm"),
          col("main_md5"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),

    // ── THE END-TO-END CORPUS CAPSTONE ───────────────────────────────
    // The integration a real 100 TB run is: the crawl_pipeline half
    // (WARC → extract → gopher gate → model score → per-host caps)
    // chained INTO the training_pipeline half (cross-doc span removal
    // → exact dedup → decontamination → content-keyed leakage-safe
    // split → chunking → token packing), shipping the packed examples
    // as JSONL shards whose manifest total is cross-checked on every
    // output row. Materialization boundaries are explicit: the WARC
    // parse + extraction runs ONCE (localCheckpoint) and feeds the
    // gopher gate, the model, and the cap; the selected corpus
    // materializes before the span machinery scans it; the cleaned
    // corpus materializes before dedup + decontamination each scan it.
    // The oracle replays the ENTIRE composition from the synthesis
    // columns — crawl selection, span coverage, dedup, bench 5-grams,
    // split arithmetic, and running-sum bin packing.
    "corpus_build_pipeline" -> ((s, dir) =>
      corpusBuildSummary(s, dir, syntheticWarc(s, dir))
        .orderBy(col("split"), col("lang"), col("bin_id"))),

    // The capstone judged against STANDING crawl state — month 2 of a
    // rolling corpus build: batch 0 folds two thirds of the crawl's
    // URLs into a UrlSeen index; batch 1 re-fetches EVERYTHING, judges
    // each URL against the state, and runs the full build (select →
    // span-clean → dedup → decontaminate → split → pack → ship) over
    // ONLY the never-seen docs. The oracle replays the whole chain
    // from scratch on the novelty set (the shared corpusBuildOracle
    // template with the batch filter) plus both fold counts — a state
    // fold that leaks a seen doc into the build, or drops a novel one,
    // changes the per-bin packing arithmetic everywhere downstream.
    "corpus_build_incremental" -> ((s, dir) => {
      val state = java.nio.file.Files
        .createTempDirectory("graft_cbi_state").toString
      val crawl = syntheticWarc(s, dir)
      val uris = graft.ingest.Warc.recordTable(s, crawl,
          col("doc_id"), col("payload"))
        .where(col("warc_type") === "response")
        .select(col("file_id").as("doc_id"), col("target_uri"))
        // consumed by BOTH folds; LAZY — fold 0's delta write (the
        // first action) materializes it
        .localCheckpoint(false)
      // fold 0 is called for its STATE side effect (the delta write
      // runs eagerly inside foldBatch); its annotation frame is
      // discarded, so forcing it with a count() was a whole wasted job
      graft.dedup.UrlSeen.foldBatch(uris.where(col("doc_id") % 3 =!= 2),
        col("doc_id"), col("target_uri"), state, 0L)
      val ann = graft.dedup.UrlSeen.foldBatch(uris, col("doc_id"),
          col("target_uri"), state, 1L)
        // consumed by the counts AND the filter; LAZY — the gate's
        // single output action materializes it once, both consumers
        // read the cache
        .localCheckpoint(false)
      val counts = ann.agg(
        sum(when(col("status") === "seen", 1L).otherwise(0L))
          .cast("long").as("n_seen"),
        sum(when(col("status") === "new", 1L).otherwise(0L))
          .cast("long").as("n_new"))
      val novel = ann.where(col("status") === "new").select(col("doc_id"))
      corpusBuildSummary(s, dir, crawl.join(novel, Seq("doc_id"),
          "left_semi"))
        .crossJoin(broadcast(counts))
        .orderBy(col("split"), col("lang"), col("bin_id"))
    }),

    // REBUILD the training set from the STANDING archive without
    // re-crawling — the workload the rolling archive index exists for:
    // shards land once into CdxLog (batch 0), a later re-curation
    // selects a third of the archive's response records FROM THE INDEX
    // (never re-scanning un-selected shards — fetchSpans prunes the
    // scan to touched files and decodes only requested spans),
    // re-extracts their text, and runs the whole build chain (gate →
    // score → cap → span-removal → dedup → decontaminate → split →
    // chunk → pack → JSONL ship) over the fetched set. The oracle
    // replays the entire chain from the synthesis columns with the
    // selection filter — an index entry pointing at the wrong span, a
    // fetch decoding the wrong record, or any divergence between
    // fetched-text and crawled-text extraction changes the packing
    // arithmetic everywhere downstream.
    "corpus_rebuild_archive" -> ((s, dir) => {
      val state = java.nio.file.Files
        .createTempDirectory("graft_rebuild_state").toString
      // syntheticWarc is already a memoized localCheckpoint — the
      // index append and the fetch read that cache directly
      // (re-checkpointing it copied the whole fixture every run)
      val crawl = syntheticWarc(s, dir)
      graft.ingest.CdxLog.append(s, crawl, col("doc_id"), col("payload"),
        state, 0L)
      val want = graft.ingest.CdxLog.read(s, state)
        .where(col("warc_type") === "response" && col("file_id") % 3 === 1)
        .select(col("file_id"), col("offset"), col("length"),
          col("member_ord"))
      val fetched = graft.ingest.Warc.fetchSpans(s, crawl,
          col("doc_id"), col("payload"), want)
        .where(col("found"))
      val blockStr = col("block").cast("string")
      val body = blockStr.substr(
        instr(blockStr, "\r\n\r\n") + lit(4), length(blockStr))
      corpusBuildFromResponses(s, dir,
          fetched.select(col("file_id").as("doc_id"),
            graft.ops.HtmlExprs.urlHost(col("target_uri")).as("host"),
            graft.ops.HtmlExprs.htmlMainText(body).as("main")))
        .orderBy(col("split"), col("lang"), col("bin_id"))
    }),


    // Nearest-centroid hard assignment (Ann.assignToCentroids): every
    // embedding against a deterministic centroid set (the 8 lowest
    // vec_ids), argmax cosine as integer micro-units with
    // lowest-cluster tie-break. The oracle recomputes every assignment
    // by brute force (cross join + ranked window) — a broadcast,
    // struct-max packing, negation, or rounding bug cannot hide.
    "cluster_assign" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .where(size(col("embedding")) > 0)
      val cents = emb.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("centroid"))
      Ann.assignToCentroids(emb, col("vec_id"), col("embedding"), cents)
        .select(col("id").as("vec_id"), col("cluster"), col("sim_e6"))
        .orderBy(col("vec_id"))
    }),
  )

  /** Shared web-crawl synthesis formulas (Scala side of the
    * warc/html/url gates; the oracle CTE [[webCte]] restates the same
    * arithmetic in SQL — one place per engine, so the three gates
    * cannot drift from each other). */
  private[graft] object Web {
    def esc(t: String): String =
      t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def html(text: String, source: String): String =
      "<html><head><title>t</title><script>var x = 1 < 2;</script>" +
        "<style>p { }</style></head><body><h1>" + source + "</h1><p>" +
        esc(if (text == null) "" else text) + "</p>" +
        "<a href=\"https://link.example/\">link text</a>" +
        "<!-- boilerplate --></body></html>"

    def url(id: Long, source: String): String = (id % 3) match {
      case 0 => "HTTP://User@WWW.Example-" + (id % 10) + ".COM.:80/" +
        source + "/" + id + "?utm_source=w&b=" + (id % 7) + "&a=1#frag"
      case 1 => "https://API.Site" + (id % 5) + ".ORG:443?x=" + (id % 4) +
        "&x=0"
      case _ => "ftp://Files." + source + ".Example.com/pub/" + id +
        "?c=2&A=1&"
    }

    def date(id: Long): String =
      "2026-01-0" + (1 + id % 9) + "T00:00:0" + (id % 10) + "Z"

    /** The canonical host of [[url]] — the same arithmetic webCte's
      * `host` column states in SQL. */
    def host(id: Long, source: String): String = (id % 3) match {
      case 0 => "www.example-" + (id % 10) + ".com"
      case 1 => "api.site" + (id % 5) + ".org"
      case _ => "files." + source.toLowerCase(java.util.Locale.ROOT) +
        ".example.com"
    }

    /** The link-extraction gate's page: three real links (duplicates
      * kept — edge multiplicity is signal), a valueless-name anchor,
      * a SCRIPT DECOY (`document.write('<a href=…>')` — raw-text
      * content that must never become an edge), and a rotating fourth
      * link so counts vary. */
    def linksHtml(id: Long, source: String): String =
      "<html><body><a href=\"https://a.example/" + id + "\">one</a>" +
        "<script>document.write('<a href=\"https://evil.example/" + id +
        "\">x</a>');</script>" +
        "<p><a href='/rel/" + source + "'>two</a></p>" +
        "<a name=anchor>no href</a>" +
        "<a href=\"https://a.example/" + id + "\">dup</a>" +
        (if (id % 3 == 0)
          "<a href='https://b.example/?q=" + id + "'>extra</a>"
        else "") +
        "</body></html>"

    /** The main-text gate's page: real content wrapped in a nav bar
      * (14/15 anchor cps) and a link-farm footer (13/19) — both above
      * the 50% link-density cut, so main-content extraction must drop
      * them whole while keeping the h1 and the article text. */
    def htmlWithNav(text: String, source: String): String =
      "<html><body><div><a href=\"/a\">nav one</a> " +
        "<a href=\"/b\">nav two</a></div><h1>" + source + "</h1><p>" +
        esc(if (text == null) "" else text) + "</p>" +
        "<div><a href=\"/x\">more</a> | <a href=\"/y\">links</a> | " +
        "<a href=\"/z\">here</a></div></body></html>"
  }

  /** Memoized-per-dataset synthetic WARC shards: three gates consume
    * the same fixture, and Bench reps must time the PARSE chain (the
    * product), not re-synthesizing the crawl (the fixture) — the same
    * policy as the memoized index builds and BPE merges. */
  private val warcCache = new Memo[String, DataFrame]
  private def syntheticWarc(s: SparkSession, dir: String): DataFrame =
    warcCache(dir)(syntheticWarcBuild(s, dir).localCheckpoint(true))

  /** Synthetic WARC crawl shards for the warc/web gates: one file per
    * doc (warcinfo + HTTP response with the [[Web.html]] page +
    * metadata), even doc_id → plain, odd → per-record gzip members. */
  private def syntheticWarcBuild(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.ingest.Warc
    import graft.ingest.Warc.WarcSpecRec
    // spread the under-split scan BEFORE the shard synthesis: the
    // fixture checkpoint inherits this partitioning, so every warc/web
    // gate's byte-level record walk runs wide instead of as the
    // single task the one-row-group documents file would give it
    // (measured: warc_cdx_fetch spent 2×0.9 s in one task). Memoized —
    // the repartition is paid once per JVM+dir.
    Dedup.spreadScan(Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source")),
        col("doc_id"))
      .as[(Long, String, String, String)]
      .mapPartitions(_.map { case (id, text0, lang, source) =>
        val text = if (text0 == null) "" else text0
        val uri = Web.url(id, source)
        val date = Web.date(id)
        val http = "HTTP/1.1 200 OK\r\n" +
          "Content-Type: text/html; charset=utf-8\r\n\r\n" +
          Web.html(text, source)
        val recs = Seq(
          WarcSpecRec("warcinfo", s"<urn:uuid:warcinfo-$id>", None, date,
            "application/warc-fields",
            "software: graft/0.1\r\nformat: WARC file version 1.1"
              .getBytes(UTF_8)),
          WarcSpecRec("response", s"<urn:uuid:resp-$id>", Some(uri), date,
            "application/http; msgtype=response", http.getBytes(UTF_8)),
          WarcSpecRec("metadata", s"<urn:uuid:meta-$id>", Some(uri), date,
            "application/warc-fields",
            ("lang: " + lang + "\r\nsourceName: " + source).getBytes(UTF_8)))
        (id, if (id % 2 == 0) Warc.buildWarc(recs) else Warc.buildWarcGz(recs))
      }).toDF("doc_id", "payload")
  }

  /** Synthetic redirect shards for the redirect gates: per doc a 301
    * (RELATIVE Location — the urlResolve leg), a 302 (absolute), and
    * the terminal 200; every 10th doc adds a 2-node redirect LOOP.
    * Even ids plain, odd per-record gzip (compression-blind like the
    * main WARC fixture). */
  private def syntheticRedirectWarc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.ingest.Warc
    import graft.ingest.Warc.WarcSpecRec
    Dedup.spreadScan(Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id")), col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val date = Web.date(id)
        def http(status: Int, reason: String, loc: Option[String],
                 body: String): Array[Byte] =
          (s"HTTP/1.1 $status $reason\r\n" +
            loc.map(l => s"Location: $l\r\n").getOrElse("") +
            "Content-Type: text/html; charset=utf-8\r\n\r\n" + body)
            .getBytes(UTF_8)
        def resp(tag: String, uri: String, payload: Array[Byte]) =
          WarcSpecRec("response", s"<urn:uuid:$tag-$id>", Some(uri), date,
            "application/http; msgtype=response", payload)
        val recs = Seq(
          resp("r301", "https://r.example/a/" + id,
            http(301, "Moved Permanently", Some("/b/" + id), "moved")),
          resp("r302", "https://r.example/b/" + id,
            http(302, "Found",
              Some("https://final.example/p/" + (id % 50)), "found")),
          resp("r200", "https://final.example/p/" + (id % 50),
            http(200, "OK", None, "the page"))) ++
          (if (id % 10 == 0) Seq(
            resp("loopx", "https://loop.example/x/" + id,
              http(301, "Moved Permanently",
                Some("https://loop.example/y/" + id), "")),
            resp("loopy", "https://loop.example/y/" + id,
              http(302, "Found",
                Some("https://loop.example/x/" + id), "")))
          else Seq.empty)
        (id, if (id % 2 == 0) Warc.buildWarc(recs) else Warc.buildWarcGz(recs))
      }).toDF("doc_id", "payload")
  }

  /** Memoized resolved redirect chains — shared by the resolve gate
    * and the dedup composition (one parse + one doubling run per
    * JVM+dir). */
  private val redirectChainsCache = new Memo[String, DataFrame]
  private def resolvedRedirects(s: SparkSession, dir: String): DataFrame =
    redirectChainsCache(dir) {
      val recs = graft.ingest.Warc.recordTable(s,
        syntheticRedirectWarc(s, dir), col("doc_id"), col("payload"))
      val edges = recs
        .where(col("http_status").between(300, 399) &&
          col("location").isNotNull)
        .select(col("target_uri").as("u"),
          graft.ops.HtmlExprs.urlResolve(
            col("target_uri"), col("location")).as("v"))
      graft.ingest.Redirects.resolveChains(edges, col("u"), col("v"),
          maxHops = 8)
        .localCheckpoint(true)
    }

  /** Synthetic revisit shards for the `warc_revisit` gate: per doc a
    * `response` record (text/plain body `p<id>|<text>`), and for even
    * doc_id a `revisit` record carrying the crawler-side dedup headers
    * (WARC-Refers-To naming the original, WARC-Payload-Digest, and the
    * netpreserve identical-payload-digest profile). Every 4th doc's
    * revisit carries a deliberately STALE digest so the gate's
    * digest-match flag discriminates (a comparison that always says
    * "match" cannot pass). doc_id % 3 == 0 files are per-record gzip
    * members, the rest plain — compression-blind like the main WARC
    * fixture. */
  private def syntheticRevisitWarc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.ingest.Warc
    import graft.ingest.Warc.WarcSpecRec
    Dedup.spreadScan(Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")), col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(t: String): String = {
          md.reset()
          md.digest(t.getBytes(UTF_8)).map("%02x".format(_)).mkString
        }
        it.map { case (id, text0) =>
          val content = "p" + id + "|" + (if (text0 == null) "" else text0)
          val uri = "https://h" + (id % 7) + ".example/p/" + id
          val date = Web.date(id)
          val orig = WarcSpecRec("response", s"<urn:uuid:orig-$id>",
            Some(uri), date, "application/http; msgtype=response",
            ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8" +
              "\r\n\r\n" + content).getBytes(UTF_8),
            payloadDigest = Some("md5:" + hex(content)))
          val recs =
            if (id % 2 != 0) Seq(orig)
            else Seq(orig, WarcSpecRec("revisit", s"<urn:uuid:rev-$id>",
              Some(uri), date, "message/http", Array.empty[Byte],
              refersTo = Some(s"<urn:uuid:orig-$id>"),
              payloadDigest = Some("md5:" + hex(
                if (id % 4 == 0) content else content + "|stale")),
              profile = Some("http://netpreserve.org/warc/1.1/revisit/" +
                "identical-payload-digest")))
          (id, if (id % 3 == 0) Warc.buildWarcGz(recs) else Warc.buildWarc(recs))
        }
      }.toDF("doc_id", "payload")
  }

  /** Shared synthetic media table for the container/decode gates: REAL
    * WAV/BMP payloads built from the documents columns — even doc_id →
    * 16-bit PCM WAV carrying the text's UTF-8 bytes (channels/rate
    * varied by id), odd → 24bpp BI_RGB BMP sized by the doc whose
    * pixel-array bytes follow a deterministic linear fill (padding
    * positions included; the decoder must exclude them). Every header
    * field and every content byte is a pure function of the source
    * columns, which is what lets the DuckDB oracles recompute both the
    * parsed metadata AND the decoded sample statistics. */
  private def syntheticMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Containers
    Dedup.spreadScan(Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("text")), col("doc_id"))
      .as[(Long, Long, String)]
      .mapPartitions(_.map { case (id, nChars, text) =>
        val payload =
          if (id % 2 == 0)
            Containers.buildWav(
              channels = (1 + (id / 2) % 2).toInt,
              sampleRate = (8000 + (id % 5) * 1000).toInt,
              bitsPerSample = 16,
              data = Option(text).getOrElse("").getBytes("UTF-8"))
          else Containers.buildBmp(
            width = (1 + nChars % 64).toInt,
            height = (1 + id % 48).toInt,
            fill = i => ((i.toLong * 31 + id * 7) % 256).toByte)
        (id, if (id % 2 == 0) "audio/wav" else "image/bmp", payload,
          Map.empty[String, String])
      }).toDF("doc_id", "modality", "payload", "meta")
  }

  /** Shared synthetic compressed-image table for the image-decode gate:
    * REAL PNG/JPEG payloads encoded through javax.imageio from the
    * documents columns — even doc_id → RGB PNG whose channel value at
    * flat index k is (k*31 + id*7) % 256, odd → uniform even-gray JPEG
    * (gray = 28 + 2*((id*13) % 100) ∈ [28, 226]). Every dimension and
    * every decoded channel value is a pure function of the source
    * columns (PNG losslessly, JPEG via the exact uniform-gray
    * round-trip), which is what lets the DuckDB oracle recompute the
    * decoded statistics without decoding anything. */
  /** Deterministic animated-GIF media: per doc, (4 + id%5) × (3 + id%4)
    * pixels × (2 + id%3) frames of channel-equal gray
    * `((id*31 + f*17 + k*7) % 6) * 51` — six distinct grays per frame,
    * which the JDK GIF writer palettes exactly (ImagesSpec round-trip),
    * so the SQL oracle recomputes decoded statistics from this formula. */
  private def syntheticAnimations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Images
    Dedup.spreadScan(Tables(s, dir, "documents")
        .select(col("doc_id")), col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val nf = (2 + id % 3).toInt
        val payload = Images.encodeAnimatedGifGray(w, h, nf,
          (f, k) => (((id * 31 + f.toLong * 17 + k.toLong * 7) % 6) * 51).toInt)
        (id, "image/gif", payload, Map.empty[String, String])
      }).toDF("doc_id", "modality", "payload", "meta")
  }

  /** Deterministic REAL uncompressed-DIB AVI payloads from table
    * columns — the VIDEO sibling of [[syntheticAnimations]]: the same
    * 6-gray-step fill arithmetic behind spec-conforming RIFF video
    * bytes ([[graft.multimodal.Avi.encodeAviGray]]), dimensions offset
    * so the populations stay distinct. Frames are then decoded BACK by
    * the in-repo RIFF walk, so a builder/decoder asymmetry in stride
    * padding, bottom-up row order, or BGR channel order cannot hide. */
  private def syntheticVideos(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Avi
    Dedup.spreadScan(Tables(s, dir, "documents")
        .select(col("doc_id")), col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (6 + id % 5).toInt
        val h = (5 + id % 4).toInt
        val nf = (2 + id % 3).toInt
        val payload = Avi.encodeAviGray(w, h, nf,
          (f, k) => (((id * 31 + f.toLong * 17 + k.toLong * 7) % 6) * 51).toInt)
        (id, "video/avi", payload, Map.empty[String, String])
      }).toDF("doc_id", "modality", "payload", "meta")
  }

  /** Deterministic REAL MP3/MP4 payloads from table columns: even
    * doc_id → a fixed-bitrate MPEG-1 Layer III stream (spec-valid frame
    * headers, optional ID3v2 pad tag), odd → a conforming ISO BMFF
    * ftyp/moov/mdat tree. Container facts are then parsed BACK by the
    * byte-level walks ([[graft.multimodal.Containers.parseMp3]] /
    * `parseMp4`), so a builder/parser asymmetry in any header field
    * cannot hide — the same discipline as syntheticMedia's WAV/BMP. */
  private def syntheticAv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Containers
    val brs = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
      256, 320)
    val rates = Array(44100, 48000, 32000)
    Dedup.spreadScan(Tables(s, dir, "documents")
        .select(col("doc_id")), col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val payload =
          if (id % 2 == 0)
            Containers.buildMp3(version = 1,
              bitrateKbps = brs(((id / 2) % 14).toInt),
              sampleRate = rates((id % 3).toInt),
              channels = 1 + ((id / 2) % 2).toInt,
              nFrames = 2 + (id % 6).toInt,
              fill = i => ((i * 31 + id) % 251).toByte,
              id3Bytes = ((id % 3) * 7).toInt,
              // cycle Xing-tagged (VBR), Info-tagged (CBR header), and
              // untagged streams: the oracle subtracts the metadata
              // frame from the tagged docs' counts, so counting the
              // tag frame as music cannot hide
              tag = ((id / 2) % 3) match {
                case 0 => "Xing"; case 1 => "Info"; case _ => ""
              })
          else {
            val nT = 1 + (id % 3).toInt
            Containers.buildMp4(
              timescale = (600 * (1 + id % 5)).toInt,
              duration = (id * 137) % 100000,
              tracks = Seq.tabulate(nT)(t =>
                (16 + ((id + t) % 7).toInt, 9 + ((id + t) % 5).toInt)),
              mdatBytes = (id % 50).toInt,
              fill = i => ((i * 17 + id) % 253).toByte,
              // alternate tkhd v0/v1 (64-bit times) across docs: the
              // oracle's width/height arithmetic is version-blind, so
              // a v1 dimensions regression cannot hide
              tkhdVersion = ((id / 2) % 2).toInt)
          }
        (id, if (id % 2 == 0) "audio/mpeg" else "video/mp4", payload,
          Map.empty[String, String])
      }).toDF("doc_id", "modality", "payload", "meta")
  }

  private def syntheticImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Images
    Dedup.spreadScan(Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars")),
        col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val payload =
          if (id % 2 == 0)
            Images.encodePng((1 + nChars % 16).toInt, (1 + id % 12).toInt,
              k => ((k.toLong * 31 + id * 7) % 256).toInt)
          else
            Images.encodeJpegGray((1 + nChars % 24).toInt,
              (1 + id % 16).toInt, (28 + 2 * ((id * 13) % 100)).toInt)
        (id, if (id % 2 == 0) "image/png" else "image/jpeg", payload,
          Map.empty[String, String])
      }).toDF("doc_id", "modality", "payload", "meta")
  }

  /** Two differently-messy spellings per doc of the same logical page
    * (userinfo + default port + tracking params + fragment vs a bare
    * trailing-'?' form), both normalizing to
    * `https://site{id%25}.example/p/{id%125}` — the shared fixture of
    * the url_dedup gates. */
  private def urlSpellings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val k = id % 25
        val j = id % 125
        Seq(
          (id, "HTTPS://User@Site" + k + ".EXAMPLE.:443/p/" + j +
            "?utm_source=x&ref=y#frag"),
          (id, "https://site" + k + ".example/p/" + j + "?"))
      }).toDF("doc_id", "url")
  }

  /** Rolling-crawl URL-seen state for the incremental gate: three
    * batches folded in order (doc_id % 3 → batch 1/2/3), then batch 2
    * REPLAYED — the watermark guard must make the replay a no-op, so
    * the final state equals the clean three-fold state the oracle
    * recomputes from scratch. */
  private val urlStateFor = new IndexCache("graft_gate_urlstate",
    (s, dir, path) => {
      val u = urlSpellings(s, dir)
      for (b <- 1L to 3L)
        graft.dedup.UrlSeen.foldBatch(
          u.where(col("doc_id") % 3 === (b - 1)),
          col("doc_id"), col("url"), path, b)
      graft.dedup.UrlSeen.foldBatch( // replay: must not touch the state
        u.where(col("doc_id") % 3 === 1),
        col("doc_id"), col("url"), path, 2L)
      ()
    })

  /** Clean-then-ship export: span-removed corpus → WET shards, once
    * per JVM+dir. */
  private val wetCleanFor = new IndexCache("graft_gate_wetclean",
    (s, dir, path) => {
      val framed = Tables(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" boilerplate navigation footer menu copyright of "),
          col("source")).as("t"))
      val cleaned = Dedup.removeDuplicatedSpans(framed, col("doc_id"),
        col("t"), n = 5)
      graft.ingest.Warc.wetExport(s, cleaned, col("doc_id"),
        concat(lit("https://c.example/"), col("doc_id")),
        lit("2026-02-02T00:00:00Z"), col("text_clean"), path,
        maxRecordsPerFile = 100, gzip = true)
    })

  /** Frontier-pipeline standing state: batch 1 = the url_dedup
    * canonical set (what the crawl has already fetched). The frontier
    * gate folds its candidates as batch 2; re-invocations within one
    * JVM replay batch 2 idempotently — the fold contract makes the
    * memoized state safe to re-judge. */
  private val frontierStateFor = new IndexCache("graft_gate_frontier",
    (s, dir, path) => {
      graft.dedup.UrlSeen.foldBatch(urlSpellings(s, dir),
        col("doc_id"), col("url"), path, 1L)
      ()
    })

  /** Separate standing state for the redirect-aware frontier gate: it
    * folds its OWN batch 2, and two gates sharing one path would each
    * see the other's committed batch-2 delta as a replay of different
    * content. */
  private val frontierRedirectStateFor = new IndexCache(
    "graft_gate_frontier_redirect",
    (s, dir, path) => {
      graft.dedup.UrlSeen.foldBatch(urlSpellings(s, dir),
        col("doc_id"), col("url"), path, 1L)
      ()
    })

  /** Bounded PNG population for the image-dedup gates: even-id docs
    * (deterministic PNG payloads) with doc_id < 400, plus two plant
    * families — byte-identical clones of even ids < 8 under +1000000
    * (the oracled recall population) and a canonical/perturbed
    * re-render pair per even id < 8 under +2000000/+3000000. The
    * perturbation edits a pixel column the 9×8 dHash sampling grid
    * never reads (floor(16x/9) = {0,1,3,5,7,8,10,12,14} skips column
    * 2), so the pair lands at hamming 0 with DIFFERENT bytes —
    * perceptual dedup, not byte dedup. JPEGs are excluded: the
    * uniform-gray fixtures all dHash to 0 (no gradients anywhere) — a
    * true but degenerate corpus-wide equivalence class whose pair set
    * is quadratic in the fixture, the image analogue of stopword
    * shingles. */
  /** 20 sixteen-bit words with pairwise Hamming distance ≥ 6, greedily
    * chosen — repeated 4× into 64-bit signatures they give pairwise
    * distance ≥ 24, so one-bit variants (distance ≥ 22 cross-class)
    * can NEVER cross classes at radius 7. Indices 0-9 are the batch-1
    * "base" classes, 10-19 the batch-2 "new" classes. */
  private lazy val sigClassWords: IndexedSeq[Long] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    var v = 0
    // 30 classes: 0-9 base, 10-19 the batch-2 never-seen family, 20-29
    // the animation gate's novel-frame family. Greedy in ascending v,
    // so extending the count leaves the earlier indices IDENTICAL.
    while (kept.length < 30 && v < 65536) {
      if (kept.forall(w => Integer.bitCount(w ^ v) >= 6)) kept += v
      v += 1
    }
    require(kept.length == 30, "greedy 16-bit code came up short")
    kept.toIndexedSeq.map(w =>
      (0 until 4).map(i => w.toLong << (16 * i)).reduce(_ | _))
  }

  /** A 9×8 grayscale PNG whose dHash is EXACTLY `sig`: on a 9×8 image
    * the hash's nearest-neighbor grid IS the image and gray luma is
    * the pixel value, so choosing each row as a ±14 walk from 128
    * (down iff the bit is set) realizes any target signature —
    * dHash bit (y,x) = g(x,y) > g(x+1,y), MSB-first row-major
    * (ImageHash.scala golden-vector layout). Values stay in [16, 240]. */
  private def sigTargetImage(sig: Long): Array[Byte] = {
    val g = new Array[Int](72)
    var y = 0
    while (y < 8) {
      g(y * 9) = 128
      var x = 0
      while (x < 8) {
        val bit = (sig >>> (63 - (y * 8 + x))) & 1L
        g(y * 9 + x + 1) = g(y * 9 + x) + (if (bit == 1L) -14 else 14)
        x += 1
      }
      y += 1
    }
    graft.multimodal.Images.encodePng(9, 8, k => g(k / 3)) // gray: r=g=b
  }

  /** Two-batch rolling-media population over controllable-dHash PNGs:
    * batch 1 (even docs < 400) carries base class B_{(doc/2)%10};
    * batch 2 (odd docs < 400, k=(doc-1)/2) carries by role k%4 —
    * 0: exact B re-sight, 1: one-bit variant of B, 2/3: a class the
    * state has never seen. Statuses are therefore pure doc-id
    * arithmetic, which is what lets DuckDB oracle a perceptual-hash
    * operator it cannot compute. */
  private def sigSeenBatch(s: SparkSession, dir: String,
                           batch: Int): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where(col("doc_id") % 2 === (batch - 1) && col("doc_id") < 400)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { d =>
        val sig =
          if (batch == 1) sigClassWords(((d / 2) % 10).toInt)
          else {
            val k = (d - 1) / 2
            val c = (k % 10).toInt
            (k % 4) match {
              case 0 => sigClassWords(c)
              case 1 => sigClassWords(c) ^ 1L
              case _ => sigClassWords(10 + c)
            }
          }
        (d, sigTargetImage(sig))
      }).toDF("doc_id", "payload")
  }

  /** The incremental pHash gate's two-batch population: batch 1 = the
    * gray plants, batch 2 = their exact-2× contrast re-renders under
    * +100000 ids. */
  private def phashSeenBatch(s: SparkSession, dir: String,
                             batch: Int): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents").where(col("doc_id") < 24)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        if (batch == 1) (id, phashGrayPng(id, 1))
        else (id + 100000L, phashGrayPng(id, 2))))
      .toDF("doc_id", "payload")
  }

  /** Standing signature state for the incremental pHash gate — the
    * [[sigStateFor]] lifecycle over spectral image hashes: built once
    * per JVM+dir, the gate replays batch 2 per invocation. */
  private val phashSigStateFor = new IndexCache("graft_gate_phashstate",
    (s, dir, path) => {
      for (b <- 1 to 2)
        graft.dedup.SigSeen.foldBatch(phashSeenBatch(s, dir, b),
          col("doc_id"), ImageHash.pHash(col("payload")), path, b.toLong)
      ()
    })

  /** Standing perceptual-signature state for the incremental image
    * gate: batch 1 folded, then batch 2 — the gate itself REPLAYS
    * batch 2 per invocation (idempotent by the watermark guard). */
  private val sigStateFor = new IndexCache("graft_gate_sigstate",
    (s, dir, path) => {
      // foldBatch commits its delta EAGERLY; the lazy annotation frame
      // can be discarded here — the gate recomputes it as a replay
      for (b <- 1 to 2)
        graft.dedup.SigSeen.foldBatch(sigSeenBatch(s, dir, b),
          col("doc_id"), ImageHash.dHash(col("payload")), path, b.toLong)
      ()
    })

  /** A 130-sample 16-bit WAV whose audio fingerprint is EXACTLY `sig`
    * — the [[sigTargetImage]] trick on the energy grid: 65 two-sample
    * windows of constant positive value a_w (so E_w = 2·a_w²) with a_w
    * a ±1 walk from 100 (down iff the bit is set) realize any target,
    * since fingerprint bit (63−w) = E_w > E_{w+1} ⟺ a_w > a_{w+1}.
    * Values stay in [36, 164] — far from 16-bit clipping. */
  private def audioTargetClip(sig: Long): Array[Byte] = {
    val a = new Array[Int](65)
    a(0) = 100
    var w = 0
    while (w < 64) {
      val bit = (sig >>> (63 - w)) & 1L
      a(w + 1) = a(w) + (if (bit == 1L) -1 else 1)
      w += 1
    }
    val data = new Array[Byte](2 * 130)
    var i = 0
    while (i < 130) {
      val v = a(i / 2)
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    graft.multimodal.Containers.buildWav(1, 8000, 16, data)
  }

  /** The [[sigSeenBatch]] two-batch population re-rendered as WAV
    * clips: identical doc-id arithmetic, identical target signatures
    * ([[sigClassWords]]), so the incremental AUDIO gate shares the
    * image gate's from-scratch oracle shape. */
  private def audioSeenBatch(s: SparkSession, dir: String,
                             batch: Int): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where(col("doc_id") % 2 === (batch - 1) && col("doc_id") < 400)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { d =>
        val sig =
          if (batch == 1) sigClassWords(((d / 2) % 10).toInt)
          else {
            val k = (d - 1) / 2
            val c = (k % 10).toInt
            (k % 4) match {
              case 0 => sigClassWords(c)
              case 1 => sigClassWords(c) ^ 1L
              case _ => sigClassWords(10 + c)
            }
          }
        (d, audioTargetClip(sig))
      }).toDF("doc_id", "payload")
  }

  /** Standing signature state for the incremental AUDIO gate — the
    * [[sigStateFor]] lifecycle over audio fingerprints. */
  private val audioSigStateFor = new IndexCache("graft_gate_audiostate",
    (s, dir, path) => {
      for (b <- 1 to 2)
        graft.dedup.SigSeen.foldBatch(audioSeenBatch(s, dir, b),
          col("doc_id"),
          graft.multimodal.AudioHash.fingerprint(col("payload")), path,
          b.toLong)
      ()
    })

  /** Gray value at flat pixel k of the [[sigTargetImage]] ±14 walk for
    * `sig` — the same construction exposed as a (sig, k) function so
    * the ANIMATION fixture can realize a chosen dHash per FRAME.
    * `private[graft]` so test fixtures (StreamingSigSeenSpec's AVI
    * clips) build on the ONE walk convention instead of copying it. */
  private[graft] def dhashWalkGray(sig: Long, k: Int): Int = {
    val y = k / 9
    val x = k % 9
    var v = 128
    var i = 0
    while (i < x) {
      val bit = (sig >>> (63 - (y * 8 + i))) & 1L
      v += (if (bit == 1L) -14 else 14)
      i += 1
    }
    v
  }

  /** Two-batch rolling-ANIMATION population over frame-controllable
    * GIFs (9×8 frames whose per-frame dHash is exact by
    * [[dhashWalkGray]]): batch 1 (even docs < 400) single-frame class
    * B_{(d/2)%10}; batch 2 single-frame roles for odd docs < 400 (the
    * [[sigSeenBatch]] arithmetic verbatim) PLUS two-frame docs for odd
    * 401 ≤ d < 440 — frame 0 a never-seen class (20-29), frame 1 an
    * exact base-class re-sight — which must come back `seen` through
    * the ANY-frame rule even though their first frame is novel. */
  private def gifSeenBatch(s: SparkSession, dir: String,
                           batch: Int): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val selected =
      if (batch == 1) docs.where(col("doc_id") % 2 === 0 &&
        col("doc_id") < 400)
      else docs.where(col("doc_id") % 2 === 1 && (col("doc_id") < 400 ||
        (col("doc_id") >= 401 && col("doc_id") < 440)))
    selected.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { d =>
        val sigs: Seq[Long] =
          if (batch == 1) Seq(sigClassWords(((d / 2) % 10).toInt))
          else if (d < 400) {
            val k = (d - 1) / 2
            val c = (k % 10).toInt
            Seq((k % 4) match {
              case 0 => sigClassWords(c)
              case 1 => sigClassWords(c) ^ 1L
              case _ => sigClassWords(10 + c)
            })
          } else {
            val j = ((d - 401) / 2).toInt
            Seq(sigClassWords(20 + j % 10), sigClassWords(j % 10))
          }
        val payload = graft.multimodal.Images.encodeAnimatedGifGray(
          9, 8, sigs.length, (f, k) => dhashWalkGray(sigs(f), k))
        (d, payload)
      }).toDF("doc_id", "payload")
  }

  /** Standing signature state for the incremental ANIMATION gate —
    * the [[sigStateFor]] lifecycle over per-frame dHashes through the
    * multi-signature fold. */
  private val gifSigStateFor = new IndexCache("graft_gate_gifstate",
    (s, dir, path) => {
      for (b <- 1 to 2)
        graft.dedup.SigSeen.foldBatchMulti(gifSeenBatch(s, dir, b),
          col("doc_id"), ImageHash.frameDHash(col("payload")), path,
          b.toLong)
      ()
    })

  /** Frame-controlled AVI population for the FULLY-ORACLED video
    * near-dup gate: per doc < 60 a two-frame 9×8 clip whose frame
    * dHashes are EXACTLY `sigClassWords(d % 10)` (frame 0) and
    * `sigClassWords(10 + d % 7)` (frame 1) — [[dhashWalkGray]]
    * realizes any signature on the 9×8 grid, and an AVI gray pixel
    * (r=g=b) decodes to the walk value exactly. Same-class frames pair
    * at hamming 0, cross-class at ≥ 24, and frame-0 classes (0-9)
    * never meet frame-1 classes (10-16) — so the WHOLE pair set is
    * doc-id arithmetic, which is what lets DuckDB oracle a
    * video-perceptual operator it cannot compute (no rows-only twin
    * needed, unlike the natural-population gif_dedup). */
  private def videoDedupPop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where(col("doc_id") < 60)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(d => (d, classAviPayload(d))))
      .toDF("doc_id", "payload")
  }

  /** The ONE two-frame class-signature AVI construction both
    * [[videoDedupPop]] and [[mediaCurationPop]] plant — their oracles
    * assume the two populations stay structurally identical, so the
    * synthesis must have a single definition. */
  private def classAviPayload(d: Long): Array[Byte] = {
    val sigs = IndexedSeq(sigClassWords((d % 10).toInt),
      sigClassWords(10 + (d % 7).toInt))
    graft.multimodal.Avi.encodeAviGray(9, 8, 2,
      (f, k) => dhashWalkGray(sigs(f), k))
  }

  /** [[classAviPayload]] re-encoded as MJPEG — byte-different payload,
    * same class fill. The ±14 walk's gradient-sign margin dwarfs the
    * q=0.95 JPEG quantization noise, so the per-frame dHashes decode
    * IDENTICAL to the DIB original (pinned in AviSpec) and the
    * cross-codec gate can assert hamming exactly 0. */
  private def classAviMjpegPayload(d: Long): Array[Byte] = {
    val sigs = IndexedSeq(sigClassWords((d % 10).toInt),
      sigClassWords(10 + (d % 7).toInt))
    graft.multimodal.Avi.encodeAviMjpegGray(9, 8, 2,
      (f, k) => dhashWalkGray(sigs(f), k))
  }

  /** The MIXED-MODALITY population for the media-curation capstone:
    * one frame with every media family a crawler actually lands —
    * video (the [[videoDedupPop]] two-frame class AVIs, ids < 60),
    * images (dHash-exact class PNGs under +100000), audio
    * (fingerprint-exact class WAVs under +200000), and NON-media text
    * bytes under +300000 (ids < 20) that must classify `unknown` and
    * join no pair. Every family's pair set is class arithmetic, so the
    * whole capstone summary is restatable in SQL. */
  private def mediaCurationPop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val video = Tables(s, dir, "documents")
      .where(col("doc_id") < 60)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap { d =>
        Seq(
          (d, classAviPayload(d)),
          (d + 100000L, sigTargetImage(sigClassWords((d % 10).toInt))),
          (d + 200000L, audioTargetClip(sigClassWords((d % 10).toInt))))
      }).toDF("doc_id", "payload")
    val unknown = Tables(s, dir, "documents")
      .where(col("doc_id") < 20)
      .select((col("doc_id") + lit(300000L)).cast("long").as("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
    video.unionByName(unknown)
  }

  /** Scene-structured AVI clips for the cut-detection gate: six 9×8
    * frames, frames 0-2 realizing class `d % 10` exactly and frames
    * 3-5 class `10 + d % 7` — within-scene consecutive hamming is 0
    * (identical signatures) and the single cut at frame 3 crosses
    * classes ≥ 24 bits apart, so `is_cut` is pure doc-id arithmetic. */
  private def videoScenePop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where(col("doc_id") < 120)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { d =>
        val a = sigClassWords((d % 10).toInt)
        val b = sigClassWords(10 + (d % 7).toInt)
        (d, graft.multimodal.Avi.encodeAviGray(9, 8, 6,
          (f, k) => dhashWalkGray(if (f < 3) a else b, k)))
      }).toDF("doc_id", "payload")
  }

  /** Window-controllable WAV clips for the energy-segmentation gate:
    * 40 windows × 8 samples, window w carrying constant amplitude 1000
    * (energy 8·10⁶) when `(d·31 + w·7) % 5 < 2` and 10 (energy 800)
    * otherwise — the active/silent pattern, and therefore every
    * segment boundary, is pure doc-id arithmetic. */
  private def audioSegPop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where(col("doc_id") < 200)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { d =>
        val data = new Array[Byte](2 * 320)
        var i = 0
        while (i < 320) {
          val w = i / 8
          val v = if ((d * 31 + w * 7) % 5 < 2) 1000 else 10
          data(2 * i) = (v & 0xFF).toByte
          data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        (d, graft.multimodal.Containers.buildWav(1, 8000, 16, data))
      }).toDF("doc_id", "payload")
  }

  /** The [[gifSeenBatch]] two-batch population re-rendered as
    * uncompressed-DIB AVI VIDEO: identical doc-id arithmetic,
    * identical target signatures, so the incremental video gate shares
    * the animation gate's from-scratch oracle — including the
    * two-frame docs (odd 401 ≤ d < 440) that must come back `seen`
    * through their second frame under the any-frame rule. */
  private def videoSeenBatch(s: SparkSession, dir: String,
                             batch: Int): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val selected =
      if (batch == 1) docs.where(col("doc_id") % 2 === 0 &&
        col("doc_id") < 400)
      else docs.where(col("doc_id") % 2 === 1 && (col("doc_id") < 400 ||
        (col("doc_id") >= 401 && col("doc_id") < 440)))
    selected.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { d =>
        val sigs: IndexedSeq[Long] =
          if (batch == 1) IndexedSeq(sigClassWords(((d / 2) % 10).toInt))
          else if (d < 400) {
            val k = (d - 1) / 2
            val c = (k % 10).toInt
            IndexedSeq((k % 4) match {
              case 0 => sigClassWords(c)
              case 1 => sigClassWords(c) ^ 1L
              case _ => sigClassWords(10 + c)
            })
          } else {
            val j = ((d - 401) / 2).toInt
            IndexedSeq(sigClassWords(20 + j % 10), sigClassWords(j % 10))
          }
        val payload = graft.multimodal.Avi.encodeAviGray(
          9, 8, sigs.length, (f, k) => dhashWalkGray(sigs(f), k))
        (d, payload)
      }).toDF("doc_id", "payload")
  }

  /** Standing signature state for the incremental VIDEO gate — the
    * [[gifSigStateFor]] lifecycle over per-frame dHashes of AVI
    * payloads through the multi-signature fold. */
  private val videoSigStateFor = new IndexCache("graft_gate_videostate",
    (s, dir, path) => {
      for (b <- 1 to 2)
        graft.dedup.SigSeen.foldBatchMulti(videoSeenBatch(s, dir, b),
          col("doc_id"), ImageHash.frameDHash(col("payload")), path,
          b.toLong)
      ()
    })

  /** One family's batch with the doc ids shifted into its OWN range —
    * the mixed-modality frame needs globally unique ids, and a
    * constant offset keeps every status restatable (the in-batch
    * min-doc arithmetic shifts by the same constant). */
  private def shiftIds(batch: DataFrame, offset: Long): DataFrame =
    batch.select((col("doc_id") + lit(offset)).as("doc_id"),
      col("payload"))

  private val MediaIncImg = 1000000L
  private val MediaIncAud = 2000000L
  private val MediaIncVid = 3000000L

  /** THREE standing signature states — image dHash, audio fingerprint,
    * video multi-sig — under one root, each built from its family's
    * two-batch population with ids shifted into the family's range:
    * the rolling-media month-2 story where ONE mixed crawl frame
    * advances every modality's state. The gate replays batch 2
    * (idempotent by the watermark guard), exactly the single-family
    * incremental gates' discipline. */
  private val mediaIncStateFor = new IndexCache("graft_gate_mediainc",
    (s, dir, path) => {
      for (b <- 1 to 2) {
        graft.dedup.SigSeen.foldBatch(
          shiftIds(sigSeenBatch(s, dir, b), MediaIncImg),
          col("doc_id"), ImageHash.dHash(col("payload")),
          path + "/img", b.toLong)
        graft.dedup.SigSeen.foldBatch(
          shiftIds(audioSeenBatch(s, dir, b), MediaIncAud),
          col("doc_id"),
          graft.multimodal.AudioHash.fingerprint(col("payload")),
          path + "/aud", b.toLong)
        graft.dedup.SigSeen.foldBatchMulti(
          shiftIds(videoSeenBatch(s, dir, b), MediaIncVid),
          col("doc_id"), ImageHash.frameDHash(col("payload")),
          path + "/vid", b.toLong)
      }
      ()
    })

  /** Bounded WAV population for the audio-dedup gates: per doc < 300 a
    * 16-bit mono clip of 200 + id%50 pseudo-noise samples (id-seeded
    * stride, values in [-100, 100]), plus two plant families on ids
    * < 8 — byte-identical clones under +1000000 and 2×-amplitude
    * re-renders under +2000000. The scaled plants are the PERCEPTUAL
    * leg: different bytes, identical energy-delta signs (energy scales
    * by exactly 4), hamming 0. */
  private def audioDedupPop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Containers
    Tables(s, dir, "documents")
      .where(col("doc_id") < 300)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        def clip(scale: Int): Array[Byte] = {
          val n = (200 + id % 50).toInt
          val data = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val v = (((i * (7 + id % 13) + id * 3) % 201) - 100).toInt * scale
            data(2 * i) = (v & 0xFF).toByte
            data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
            i += 1
          }
          Containers.buildWav(1, 8000, 16, data)
        }
        // cross-codec plant: a PCM clip of per-window CONSTANT
        // amplitudes from two well-separated levels {500, 2000} and
        // its G.711 µ-law re-encode. Equal amplitudes quantize to
        // equal decoded values (ties stay exact ties) and the 16×
        // energy separation between levels swamps the compander's
        // ≤ ~12% relative error, so the re-encode lands at hamming
        // EXACTLY 0 — an oracle-restatable cross-codec recall pin.
        def twoLevelSamples: Array[Int] = Array.tabulate(130) { i =>
          val bit = ((id * 0x9E3779B97F4A7C15L) >>> ((i / 2) % 64)) & 1L
          if (bit == 1L) 2000 else 500
        }
        def twoLevelPcm: Array[Byte] = {
          val s0 = twoLevelSamples
          val data = new Array[Byte](2 * s0.length)
          var i = 0
          while (i < s0.length) {
            data(2 * i) = (s0(i) & 0xFF).toByte
            data(2 * i + 1) = ((s0(i) >> 8) & 0xFF).toByte
            i += 1
          }
          Containers.buildWav(1, 8000, 16, data)
        }
        def twoLevelUlaw: Array[Byte] =
          Containers.buildWav(1, 8000, 8,
            twoLevelSamples.map(v => Containers.linearToUlaw(v).toByte),
            Containers.FormatUlaw)
        def twoLevelAlaw: Array[Byte] =
          Containers.buildWav(1, 8000, 8,
            twoLevelSamples.map(v => Containers.linearToAlaw(v).toByte),
            Containers.FormatAlaw)
        val base = Seq((id, clip(1)))
        if (id < 8)
          base ++ Seq((id + 1000000L, clip(1)), (id + 2000000L, clip(2)),
            (id + 3000000L, twoLevelPcm), (id + 4000000L, twoLevelUlaw),
            (id + 5000000L, twoLevelAlaw))
        else base
      }).toDF("doc_id", "payload")
  }

  /** An IMA ADPCM cross-codec plant pair: a 260-sample waveform
    * GENERATED by the decoder state machine itself from id-seeded
    * codes (every diff exactly representable; the sign steers back
    * inside ±20000 so the int16 clamp never fires; magnitudes cool the
    * step index above 40; no negative-zero code), rendered both as
    * 16-bit PCM and as a single-block ADPCM encode. Because the
    * quantizer exactly inverts the state machine on representable
    * diffs, the ADPCM decode reproduces the waveform SAMPLE-FOR-SAMPLE
    * — identical decoded arrays, identical fingerprints, hamming
    * provably 0 (AdpcmSpec pins the identity). Returns (pcm, adpcm)
    * WAV payloads. */
  private def adpcmPlantPair(id: Long): (Array[Byte], Array[Byte]) = {
    import graft.multimodal.Containers
    val n = 260
    val samples = new Array[Int](n)
    var pred = (500 + (id * 137) % 900).toInt
    var idx = 0
    samples(0) = pred
    var seed = id * 0x9E3779B97F4A7C15L + 0x2545F491L
    var i = 1
    while (i < n) {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      val mag = (((seed >>> 3) & 0x7FFFFFFFL) %
        (if (idx > 40) 4 else 8)).toInt
      var neg = ((seed >>> 11) & 1L) == 1L
      if (pred > 20000) neg = true
      if (pred < -20000) neg = false
      if (mag == 0) neg = false
      val nib = mag | (if (neg) 8 else 0)
      val next = Containers.imaAdpcmAdvance(pred, idx, nib)
      pred = next._1
      idx = next._2
      samples(i) = pred
      i += 1
    }
    val data = new Array[Byte](2 * n)
    i = 0
    while (i < n) {
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    (Containers.buildWav(1, 8000, 16, data),
      Containers.buildWavImaAdpcm(8000, samples))
  }

  /** The ADPCM cross-codec population: 8 PCM/ADPCM twin pairs under
    * +6000000/+7000000 — its own population (not folded into
    * [[audioDedupPop]]) so the standing audio gates' row sets stay
    * bit-stable. */
  private def audioAdpcmPop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where(col("doc_id") < 8)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val (pcm, adp) = adpcmPlantPair(id)
        Seq((id + 6000000L, pcm), (id + 7000000L, adp))
      }).toDF("doc_id", "payload")
  }

  /** The shared gray-PNG synthesis of the pHash plants: equal-channel
    * pixel values ≤ 127·scale (integer luma is then the pixel value
    * itself), id-mixed so distinct docs land far apart; `scale = 2` is
    * the exact-contrast re-render. */
  private def phashGrayPng(id: Long, scale: Int): Array[Byte] = {
    def gv(p: Int): Int =
      (((p * 31 + p * p * 7) ^ (id * 131).toInt) % 120 + 120) % 120 + 4
    graft.multimodal.Images.encodePng(16, 12, k => gv(k / 3) * scale)
  }

  private def phashDedupPop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where(col("doc_id") < 8)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        Seq((id, phashGrayPng(id, 1)), (id + 1000000L, phashGrayPng(id, 1)),
          (id + 2000000L, phashGrayPng(id, 2)))
      }).toDF("doc_id", "payload")
  }

  private def imageDedupPop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.Images
    val base = syntheticImages(s, dir)
      .where(col("doc_id") % 2 === 0 && col("doc_id") < 400)
      .select(col("doc_id"), col("payload"))
    val clones = base.where(col("doc_id") < 8)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("payload"))
    val plants = Tables(s, dir, "documents")
      .where(col("doc_id") % 2 === 0 && col("doc_id") < 8)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        def fill(k: Int): Int = ((k.toLong * 31 + id * 7) % 256).toInt
        val clean = Images.encodePng(16, 12, fill)
        val pert = Images.encodePng(16, 12,
          k => if ((k / 3) % 16 == 2) (fill(k) + 97) % 256 else fill(k))
        Seq((id + 2000000L, clean), (id + 3000000L, pert))
      }).toDF("doc_id", "payload")
    base.unionByName(clones).unionByName(plants)
  }

  /** Memoized per-dataset trained linear scorer: closed-form training
    * is deterministic, so one train per JVM+dir serves Verify + Bench
    * + plan audits identically. Labels = Gopher pass on the raw text. */
  private val linearModelCache = new Memo[String, graft.text.LinearScorer.LinearModel]
  private def linearModelFor(s: SparkSession, dir: String) =
    linearModelCache(dir)(
      graft.text.LinearScorer.train(Tables(s, dir, "documents"),
        col("text"),
        graft.ops.TextExprs.gopherStats(coalesce(col("text"), lit("")))
          .getField("pass"),
        dim = 4096, version = "gopher"))

  /** Memoized per-dataset BPE merge table (driver-side training is
    * deterministic; Verify + Bench + plan audits in one session must not
    * retrain per invocation). */
  private val bpeMergeCache = new Memo[String, Seq[(String, String)]]
  private def bpeMergesFor(s: SparkSession, dir: String): Seq[(String, String)] =
    bpeMergeCache(dir)(
      TextOps.trainBpeMerges(Tables(s, dir, "documents"), col("text"),
        numMerges = 50, maxVocabWords = 5000))

  /** Shared CTE chain of the TRAINED linear scorer's oracle: labels
    * (Gopher pass on raw text), md5-bucketed distinct-token presence
    * features, smoothed probability-difference weights, and the
    * per-doc (sum, count) score inputs — reused by the scoring gate
    * and every composition that ranks by the trained score. */
  private val trainedScoreCtes: String =
    """w0 AS (
        |  SELECT doc_id, coalesce(text, '') AS t FROM documents),
        |wds AS (
        |  SELECT doc_id, t,
        |    list_filter(string_split_regex(t, '[ \t\n\x0b\f\r]+'),
        |      x -> len(x) > 0) AS ws,
        |    string_split(t, chr(10)) AS ls
        |  FROM w0),
        |c AS (
        |  SELECT doc_id,
        |    cast(len(ws) AS bigint) AS n_words,
        |    cast(coalesce(list_aggregate(list_transform(ws, x -> len(x)),
        |      'sum'), 0) AS bigint) AS word_cps,
        |    cast((len(t) - len(replace(t, '#', '')))
        |      + (len(t) - len(replace(t, '…', '')))
        |      + (len(t) - len(replace(t, '...', ''))) // 3
        |      AS bigint) AS n_symbols,
        |    cast(len(ls) AS bigint) AS n_lines,
        |    cast(len(list_filter(ls, l ->
        |      starts_with(ltrim(l, ' ' || chr(9)), '•') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '‣') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '-') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '*')))
        |      AS bigint) AS n_bullet_lines,
        |    cast(len(list_filter(ls, l ->
        |      ends_with(rtrim(l, ' ' || chr(9)), '…') OR
        |      ends_with(rtrim(l, ' ' || chr(9)), '...')))
        |      AS bigint) AS n_ellipsis_lines,
        |    cast(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS bigint) AS n_alpha_words,
        |    cast(len(list_filter(ws, x -> list_contains(
        |      ['the','be','to','of','and','that','have','with'],
        |      lower(x)))) AS bigint) AS n_stop_hits
        |  FROM wds),
        |lab AS (
        |  SELECT doc_id, CASE WHEN n_words >= 50 AND n_words <= 100000
        |    AND 3 * n_words <= word_cps AND word_cps <= 10 * n_words
        |    AND 10 * n_symbols <= n_words
        |    AND 10 * n_bullet_lines <= n_lines
        |    AND 10 * n_ellipsis_lines <= 3 * n_lines
        |    AND 5 * n_alpha_words >= 4 * n_words
        |    AND n_stop_hits >= 2 THEN 1 ELSE 0 END AS y
        |  FROM c),
        |tk AS (
        |  SELECT doc_id, list_distinct(list_filter(list_transform(
        |    string_split_regex(coalesce(text, ''), '[ \t\n\x0b\f\r]+'),
        |    x -> regexp_replace(lower(x), '[^a-z0-9]', '', 'g')),
        |    x -> len(x) > 0)) AS toks
        |  FROM documents),
        |fb AS (
        |  SELECT doc_id, list_distinct(list_transform(toks,
        |    x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 4096)) AS bs
        |  FROM tk),
        |e AS (SELECT doc_id, unnest(bs) AS b FROM fb),
        |n AS (SELECT sum(y) AS npos, count(*) AS ntot FROM lab),
        |bc AS (SELECT b, sum(y) AS pos, count(*) AS tot
        |       FROM e JOIN lab USING (doc_id) GROUP BY b),
        |wt AS (SELECT b,
        |    (pos + 1) * 1000000 // (SELECT npos + 2 FROM n)
        |  - (tot - pos + 1) * 1000000 // (SELECT ntot - npos + 2 FROM n)
        |    AS wgt
        |  FROM bc),
        |sc AS (SELECT e.doc_id, sum(wt.wgt) AS s, count(*) AS k
        |       FROM e JOIN wt USING (b) GROUP BY e.doc_id)""".stripMargin

  /** Normalize-and-tokenize CTE (mirrors TextOps.normalized + tokens) —
    * the shared front of every shingle-based oracle. */
  /** SQL restatement of the [[Web]] synthesis formulas — the oracle
    * side of the warc/html/url/web gates. Exposes per-doc: the built
    * `html` page and messy `url`, the EXPECTED canonical `url_norm` +
    * `host` (stated from the arithmetic, not a re-implemented
    * normalizer), and the EXPECTED `extract` (h1 block, entity
    * round-tripped text with ASCII-ws collapsed, anchor block). */
  // NOTE: this fragment is interpolated into oracle strings that call
  // .stripMargin AGAIN — no line here may begin with '|' (a leading
  // '||' concat would lose a pipe to the second strip)
  private val webCte: String =
    """d AS (
      |  SELECT doc_id, lang, source, coalesce(text, '') AS t
      |  FROM documents),
      |w AS (
      |  SELECT *,
      |    '<html><head><title>t</title><script>var x = 1 < 2;</script>' ||
      |      '<style>p { }</style></head><body><h1>' || source ||
      |      '</h1><p>' ||
      |      replace(replace(replace(t, '&', '&amp;'), '<', '&lt;'),
      |        '>', '&gt;') ||
      |      '</p><a href="https://link.example/">link text</a>' ||
      |      '<!-- boilerplate --></body></html>' AS html,
      |    CASE cast(doc_id % 3 AS int)
      |      WHEN 0 THEN 'HTTP://User@WWW.Example-' || (doc_id % 10) ||
      |        '.COM.:80/' || source || '/' || doc_id ||
      |        '?utm_source=w&b=' || (doc_id % 7) || '&a=1#frag'
      |      WHEN 1 THEN 'https://API.Site' || (doc_id % 5) ||
      |        '.ORG:443?x=' || (doc_id % 4) || '&x=0'
      |      ELSE 'ftp://Files.' || source || '.Example.com/pub/' ||
      |        doc_id || '?c=2&A=1&' END AS url,
      |    CASE cast(doc_id % 3 AS int)
      |      WHEN 0 THEN 'http://www.example-' || (doc_id % 10) ||
      |        '.com/' || source || '/' || doc_id || '?a=1&b=' ||
      |        (doc_id % 7)
      |      WHEN 1 THEN 'https://api.site' || (doc_id % 5) ||
      |        '.org/?x=0&x=' || (doc_id % 4)
      |      ELSE 'ftp://files.' || lower(source) || '.example.com/pub/' ||
      |        doc_id || '?A=1&c=2' END AS url_norm,
      |    CASE cast(doc_id % 3 AS int)
      |      WHEN 0 THEN 'www.example-' || (doc_id % 10) || '.com'
      |      WHEN 1 THEN 'api.site' || (doc_id % 5) || '.org'
      |      ELSE 'files.' || lower(source) || '.example.com' END AS host,
      |    trim(regexp_replace(t, '[ \t\n\r\f]+', ' ', 'g'), ' ') AS coll
      |  FROM d),
      |x AS (
      |  SELECT *,
      |    CASE WHEN coll = '' THEN source || chr(10) || 'link text'
      |         ELSE source || chr(10) || coll || chr(10) || 'link text'
      |    END AS extract
      |  FROM w)""".stripMargin

  private val toksCte: String =
    """toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(
      |      trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |                          '\s+', ' ', 'g')), '\s+'),
      |      w -> len(w) > 0) AS l
      |  FROM documents)""".stripMargin

  /** The bpe_train oracle: replay [[TextOps.trainBpeMerges]] round by
    * round in DuckDB SQL. Each round's CTE block recomputes the
    * weighted adjacent-pair counts over the current word
    * tokenizations, takes the (count desc, pair asc) argmax among
    * pairs with weighted count ≥ 2, and applies the merge with greedy
    * leftmost non-overlap — a hit position i conflicts only with i±1,
    * so the greedy picks are exactly the even offsets within each run
    * of consecutive hit positions (gaps-and-islands over i − rn). The
    * vocab cutoff mirrors the trainer's (count desc, word asc,
    * LIMIT maxVocabWords; words ≤ 1024 code points). */
  private def bpeTrainOracle(numMerges: Int, maxVocabWords: Int): String = {
    val rounds = (0 until numMerges).map { r =>
      s"""p$r AS (
         |  SELECT l[i] AS a, l[i+1] AS b, sum(n) AS c
         |  FROM (SELECT w, n, l, unnest(range(1, len(l))) AS i FROM s$r)
         |  GROUP BY a, b HAVING sum(n) >= 2),
         |b$r AS (SELECT a, b FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |h$r AS (
         |  SELECT q.w, q.n, q.i,
         |    CASE WHEN q.l[q.i] = (SELECT a FROM b$r)
         |      AND q.l[q.i+1] = (SELECT b FROM b$r) THEN 1 ELSE 0 END AS hit
         |  FROM (SELECT w, n, l, unnest(range(1, len(l)+1)) AS i
         |        FROM s$r) q),
         |sel$r AS (
         |  SELECT w, i FROM (
         |    SELECT w, i,
         |      row_number() OVER (PARTITION BY w, i - rn ORDER BY i) - 1
         |        AS off
         |    FROM (SELECT w, i,
         |            row_number() OVER (PARTITION BY w ORDER BY i) AS rn
         |          FROM h$r WHERE hit = 1))
         |  WHERE off % 2 = 0),
         |s${r + 1} AS (
         |  SELECT w, n, list(tok ORDER BY i) AS l FROM (
         |    SELECT q.w, q.n, q.i,
         |      CASE WHEN s1.i IS NOT NULL THEN q.l[q.i] || q.l[q.i + 1]
         |        ELSE q.l[q.i] END AS tok
         |    FROM (SELECT w, n, l, unnest(range(1, len(l)+1)) AS i
         |          FROM s$r) q
         |    LEFT JOIN sel$r s1 ON s1.w = q.w AND s1.i = q.i
         |    LEFT JOIN sel$r s2 ON s2.w = q.w AND s2.i = q.i - 1
         |    WHERE s2.i IS NULL)
         |  GROUP BY w, n)""".stripMargin
    }
    val out = (0 until numMerges).map(r =>
      s"SELECT cast($r AS bigint) AS merge_rank, " +
        s"(SELECT a FROM b$r) AS lhs, (SELECT b FROM b$r) AS rhs")
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY merge_rank")
    s"""WITH $toksCte,
       |wt AS (SELECT unnest(l) AS w FROM toks),
       |vocab AS (
       |  SELECT w, cast(count(*) AS bigint) AS n FROM wt
       |  WHERE len(w) <= 1024
       |  GROUP BY w ORDER BY n DESC, w LIMIT $maxVocabWords),
       |s0 AS (SELECT w, n, regexp_extract_all(w, '.') AS l FROM vocab),
       |${rounds.mkString(",\n")}$out""".stripMargin
  }

  /** Shared CTE chain computing the rare-shingle ngram-Jaccard pairs
    * (mirrors Dedup.ngramJaccardPairs; n=3, maxDf=100) — used by the
    * dedup_ngram oracle and as the edge set of the dedup_clusters
    * oracle. */
  private val ngramPairCtes: String =
    s"$toksCte,\n" +
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(CASE
      |    WHEN len(l) < 3 THEN [array_to_string(l, '_')]
      |    ELSE list_transform(range(1, len(l) - 1),
      |      i -> l[i] || '_' || l[i+1] || '_' || l[i+2]) END)) AS s
      |  FROM toks),
      |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
      |pruned AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM pruned GROUP BY doc_id),
      |common AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_common
      |  FROM pruned x JOIN pruned y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |njpairs AS (
      |  SELECT id_a, id_b,
      |    n_common / cast(ca.n_sh + cb.n_sh - n_common AS double) AS jac
      |  FROM common
      |  JOIN sizes ca ON ca.doc_id = id_a
      |  JOIN sizes cb ON cb.doc_id = id_b
      |  WHERE n_common / cast(ca.n_sh + cb.n_sh - n_common AS double) >= 0.8)""".stripMargin

  /** Shared tokenize-and-chunk CTEs (window 64, stride 64, partial tail
    * kept — mirrors TextOps.tokenChunks): used by the chunk_tokens and
    * pack_examples oracles so the chunking rule cannot drift between
    * them. */
  private val chunkCtes: String =
    """t AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
      |                w -> len(w) > 0) AS l
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang,
      |    unnest(range(1, 1 + 64 * cast(ceil(greatest(len(l) - 64, 0) / 64.0) AS int) + 1, 64)) AS s, l
      |  FROM t)""".stripMargin

  /** Exact brute-force cosine top-k (k=10, queries = vec_id < 8) — the
    * oracle for `ann_topk` AND for every exhaustive-parameter ANN
    * invariant gate (`ann_ivf_full`, `ann_index_query_full`,
    * `ann_ivfpq_full`): probing every cluster with the shared
    * exact-cosine rank tail must reproduce brute force bit-for-bit. */
  private val annBruteTopkSql: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, cast(embedding AS double[]) AS qvec
      |  FROM embeddings WHERE vec_id < 8),
      |s AS (
      |  SELECT qid, vec_id AS cid,
      |    round(list_cosine_similarity(qvec, cast(embedding AS double[])), 4) AS sim
      |  FROM q, embeddings WHERE vec_id <> qid),
      |r AS (
      |  SELECT qid, cid, sim,
      |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
      |  FROM s)
      |SELECT qid, cid, sim FROM r WHERE rn <= 10 ORDER BY qid, cid""".stripMargin

  /** The [[annInvariant]] expectation: every query returns exactly its
    * k = 10 rows, every sim exact — shared by all five
    * production-parameter approximate ANN gates. */
  private val annInvariantSql: String =
    """SELECT vec_id AS qid, cast(10 AS bigint) AS n_returned,
      |  cast(10 AS bigint) AS n_sim_exact
      |FROM embeddings WHERE vec_id < 8 ORDER BY qid""".stripMargin

  /** Distinct word 2-gram shingles + per-doc sizes (mirrors
    * Dedup.shingles' default n=2, incl. the short-doc whole-text
    * shingle) — the exact side of the MinHash invariant oracles. */
  private val sh2Ctes: String =
    s"$toksCte,\n" +
    """sh2 AS (
      |  SELECT doc_id, unnest(list_distinct(CASE
      |    WHEN len(l) < 2 THEN [array_to_string(l, '_')]
      |    ELSE list_transform(range(1, len(l)),
      |      i -> l[i] || '_' || l[i+1]) END)) AS s
      |  FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY doc_id)""".stripMargin

  /** Exact cross-side pairs (batch %5=0 × standing %5≠0) at 2-gram
    * Jaccard ≥ 0.8 — the oracle for every persistent-MinHash-index query
    * path, however the index was assembled. */
  private val crossIndexPairSql: String =
    s"""WITH $sh2Ctes,
       |common AS (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_common
       |  FROM sh2 x JOIN sh2 y ON x.s = y.s
       |  WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  cast(round(n_common / cast(ca.n_sh + cb.n_sh - n_common AS double)
       |    * 1000000) AS bigint) AS jacc_ppm
       |FROM common
       |JOIN sizes ca ON ca.doc_id = id_a
       |JOIN sizes cb ON cb.doc_id = id_b
       |WHERE n_common / cast(ca.n_sh + cb.n_sh - n_common AS double) >= 0.8
       |ORDER BY id_a, id_b""".stripMargin

  /** As-of join recomputed by DuckDB's native ASOF — shared by the keyed
    * and the chunked-carry plan, which must be indistinguishable in
    * output. */
  private val asofJoinSql: String =
    """WITH r AS (
      |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS ok
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
      |  cast(r.ok AS bigint) AS payload
      |FROM events e ASOF LEFT JOIN r
      |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
      |ORDER BY event_id""".stripMargin

  /** Gap-sessionization recomputed from scratch — shared by the keyed
    * and the chunked plan, which must be indistinguishable in output. */
  private val sessionizeSql: String =
    """WITH t AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
      |s AS (
      |  SELECT user_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |              OR ts_us - lag(ts_us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |x AS (
      |  SELECT user_id,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
      |                   ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      |  FROM s)
      |SELECT user_id, cast(max(session_id) + 1 AS bigint) AS n_sessions, count(*) AS n_events
      |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin

  // the env-drift diagnostic's DuckDB side: constant inputs, so a
  // mismatch names the drifted construct directly (see the probes-map
  // comment). Dumped to _probe_sql.json by Verify — deliberately NOT
  // in oracleSql, so the expected HUGEINT/DECIMAL rendering divergence
  // never shows as a red gate.
  val probeSql: Map[String, String] = Map(
    "env_canary" ->
      """SELECT
        |  cast(round(2.5) AS bigint) AS round_tie_pos,
        |  cast(round(-2.5) AS bigint) AS round_tie_neg,
        |  cast(round(2.675 * 100) AS bigint) AS round_dbl_product,
        |  cast(ceil(0.9 * 61) AS bigint) AS ceil_decimal_mul,
        |  cast(len(regexp_extract_all('a😀b👍cX', '[A-Za-z]'))
        |    AS bigint) AS regex_astral,
        |  cast(length('a😀b👍cX') AS bigint) AS len_astral,
        |  cast((1234567890123 * 990000 + 999999) // 1000000
        |    AS bigint) AS ceil_ppm_div,
        |  CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS dbl_sum,
        |  (SELECT sum(i + 1000000000000) FROM range(5) t(i))
        |    AS hugeint_sum,
        |  (SELECT sum(cast(1.1 AS decimal(2,1))) FROM range(5) t(i))
        |    AS dec_sum""".stripMargin)


  /** The corpus-build replay SQL shared by `corpus_build_pipeline` and
    * its incremental twin: `docWhere` filters the crawl frame (the
    * twin builds from only the batch's never-seen docs) and
    * `extraCols` appends the fold-annotation count columns the twin
    * cross-joins onto every summary row. */
  private def corpusBuildOracle(docWhere: String, extraCols: String)
      : String =
    (s"WITH $webCte,\n" +
      """mn AS (
         |  SELECT doc_id, host,
         |    CASE WHEN coll = '' THEN source
         |      ELSE source || chr(10) || coll END AS main
         |  FROM x <<DOCWHERE>>),
         |gw AS (
         |  SELECT doc_id, main,
         |    list_filter(string_split_regex(main, '[ \t\n\x0b\f\r]+'),
         |      w -> len(w) > 0) AS ws,
         |    string_split(main, chr(10)) AS ls
         |  FROM mn),
         |gc AS (
         |  SELECT doc_id,
         |    cast(len(ws) AS bigint) AS n_words,
         |    cast(coalesce(list_aggregate(list_transform(ws, w -> len(w)),
         |      'sum'), 0) AS bigint) AS word_cps,
         |    cast((len(main) - len(replace(main, '#', '')))
         |      + (len(main) - len(replace(main, '…', '')))
         |      + (len(main) - len(replace(main, '...', ''))) // 3
         |      AS bigint) AS n_symbols,
         |    cast(len(ls) AS bigint) AS n_lines,
         |    cast(len(list_filter(ls, l ->
         |      starts_with(ltrim(l, ' ' || chr(9)), '•') OR
         |      starts_with(ltrim(l, ' ' || chr(9)), '‣') OR
         |      starts_with(ltrim(l, ' ' || chr(9)), '-') OR
         |      starts_with(ltrim(l, ' ' || chr(9)), '*')))
         |      AS bigint) AS n_bullet_lines,
         |    cast(len(list_filter(ls, l ->
         |      ends_with(rtrim(l, ' ' || chr(9)), '…') OR
         |      ends_with(rtrim(l, ' ' || chr(9)), '...')))
         |      AS bigint) AS n_ellipsis_lines,
         |    cast(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
         |      AS bigint) AS n_alpha_words,
         |    cast(len(list_filter(ws, w -> list_contains(
         |      ['the','be','to','of','and','that','have','with'],
         |      lower(w)))) AS bigint) AS n_stop_hits
         |  FROM gw),
         |gp AS (
         |  SELECT doc_id,
         |    cast(CASE WHEN n_words >= 50 AND n_words <= 100000
         |      AND 3 * n_words <= word_cps AND word_cps <= 10 * n_words
         |      AND 10 * n_symbols <= n_words
         |      AND 10 * n_bullet_lines <= n_lines
         |      AND 10 * n_ellipsis_lines <= 3 * n_lines
         |      AND 5 * n_alpha_words >= 4 * n_words
         |      AND n_stop_hits >= 2
         |      THEN 1 ELSE 0 END AS bigint) AS gopher_pass
         |  FROM gc),
         |q AS (
         |  SELECT mn.doc_id, mn.host, mn.main,
         |    (('0x' || substr(md5(mn.main), 1, 6))::BIGINT % 1000000)
         |      * gp.gopher_pass AS q_ppm
         |  FROM mn JOIN gp USING (doc_id)),
         |rq AS (SELECT *, row_number() OVER (PARTITION BY host
         |  ORDER BY q_ppm DESC, doc_id) AS rn FROM q),
         |cap AS (
         |  SELECT doc_id,
         |    main || ' curated by graft pipeline for ' || host AS fr
         |  FROM rq WHERE rn <= 5),
         |nm AS (
         |  SELECT doc_id, fr AS t,
         |    list_filter(string_split_regex(fr, '[ \t\n\x0b\f\r]+'),
         |                w -> len(w) > 0) AS l
         |  FROM cap),
         |nm2 AS (
         |  SELECT doc_id, t, l,
         |    list_transform(l,
         |      w -> regexp_replace(lower(w), '[^a-z0-9]', '', 'g')) AS nl
         |  FROM nm),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(range(1, len(l) - 3)) AS pos,
         |    unnest(list_transform(range(1, len(l) - 3),
         |      i -> array_to_string(nl[i:i+4], chr(1)))) AS k
         |  FROM nm2 WHERE len(l) >= 5),
         |dup AS (
         |  SELECT k, min(doc_id) AS keeper
         |  FROM occ GROUP BY k HAVING count(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT DISTINCT doc_id, p FROM (
         |    SELECT o.doc_id, unnest(range(o.pos, o.pos + 5)) AS p
         |    FROM occ o JOIN dup d USING (k)
         |    WHERE o.doc_id <> d.keeper)),
         |covl AS (SELECT doc_id, list(p) AS ps FROM cov GROUP BY doc_id),
         |ret AS (
         |  SELECT n.doc_id, n.t, n.l, c2.ps,
         |    CASE WHEN c2.ps IS NULL THEN NULL
         |         ELSE list_filter(range(1, len(n.l) + 1),
         |                          q2 -> NOT list_contains(c2.ps, q2))
         |    END AS keep
         |  FROM nm2 n LEFT JOIN covl c2 USING (doc_id)),
         |cl AS (
         |  SELECT doc_id,
         |    CASE WHEN ps IS NULL THEN t
         |         ELSE coalesce(
         |           array_to_string(list_transform(keep, q2 -> l[q2]), ' '),
         |           '')
         |         END AS tc
         |  FROM ret),
         |dd AS (
         |  SELECT doc_id, tc,
         |    min(doc_id) OVER (PARTITION BY md5(tc)) AS canon
         |  FROM cl),
         |bd AS (
         |  SELECT doc_id, nfc_normalize(regexp_replace(text,
         |    '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}-\x{9F}\x{200B}-\x{200D}\x{FEFF}]',
         |    '', 'g')) AS bt
         |  FROM documents WHERE doc_id % 17 = 0),
         |btk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(
         |      trim(regexp_replace(regexp_replace(lower(bt), '[^a-z0-9\s]', ' ', 'g'),
         |                          '\s+', ' ', 'g')), '\s+'),
         |      w -> len(w) > 0) AS l
         |  FROM bd),
         |bg AS (
         |  SELECT DISTINCT unnest(list_distinct(CASE
         |    WHEN len(l) < 5 THEN [array_to_string(l, '_')]
         |    ELSE list_transform(range(1, len(l) - 3),
         |      i -> l[i] || '_' || l[i+1] || '_' || l[i+2] || '_' ||
         |           l[i+3] || '_' || l[i+4]) END)) AS g
         |  FROM btk),
         |ttk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(
         |      trim(regexp_replace(regexp_replace(lower(tc), '[^a-z0-9\s]', ' ', 'g'),
         |                          '\s+', ' ', 'g')), '\s+'),
         |      w -> len(w) > 0) AS l
         |  FROM cl),
         |tg AS (
         |  SELECT doc_id, unnest(list_distinct(CASE
         |    WHEN len(l) < 5 THEN [array_to_string(l, '_')]
         |    ELSE list_transform(range(1, len(l) - 3),
         |      i -> l[i] || '_' || l[i+1] || '_' || l[i+2] || '_' ||
         |           l[i+3] || '_' || l[i+4]) END)) AS g
         |  FROM ttk),
         |contaminated AS (
         |  SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g)),
         |kept AS (
         |  SELECT dd.doc_id, dd.tc, d0.lang,
         |    CASE WHEN substr(md5(md5(dd.tc) || ':split'), 1, 4) < 'e666'
         |      THEN 'train' ELSE 'eval' END AS split
         |  FROM dd JOIN documents d0 ON dd.doc_id = d0.doc_id
         |  WHERE dd.doc_id = dd.canon
         |    AND dd.doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |tct AS (
         |  SELECT doc_id, split, lang,
         |    list_filter(string_split_regex(tc, '[ \t\n\x0b\f\r]+'),
         |                w -> len(w) > 0) AS l
         |  FROM kept),
         |c3 AS (
         |  SELECT doc_id, split, lang,
         |    unnest(range(1, 1 + 64 * cast(ceil(greatest(len(l) - 64, 0) / 64.0) AS int) + 1, 64)) AS s2, l
         |  FROM tct),
         |ch AS (
         |  SELECT doc_id, split, lang,
         |    cast((s2 - 1) // 64 AS int) AS chunk_idx,
         |    len(l[s2:s2+63]) AS n_tokens
         |  FROM c3),
         |b AS (
         |  SELECT split, lang, n_tokens,
         |    cast(floor(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY split || ':' || lang
         |      ORDER BY doc_id, chunk_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256)
         |      AS bigint) AS bin_id
         |  FROM ch)
         |SELECT split, lang, bin_id, count(*) AS n_chunks,
         |  cast(sum(n_tokens) AS bigint) AS total_tokens,
         |  (SELECT cast(count(*) AS bigint) FROM ch) AS shipped_rows<<EXTRACOLS>>
         |FROM b GROUP BY split, lang, bin_id
         |ORDER BY split, lang, bin_id""".stripMargin)
      .replace("<<DOCWHERE>>", docWhere)
      .replace("<<EXTRACOLS>>", extraCols)

  val oracleSql: Map[String, String] = Map(
    // ── Invariant oracles for the approximate families ────────────────
    // MinHash banding at (k=36, b=12, J≥0.8) has verified full recall
    // at EVERY fixture SF (the exact-Jaccard tail then makes the output
    // EQUAL to the exact all-pairs computation, which DuckDB recomputes
    // from scratch here). Deterministic: fixed data + seedless xxhash.
    // The gate ran the library-default (24, 8) through r19, whose
    // (1−0.8³)⁸ ≈ 0.32% per-pair band-miss carried ~1 expected miss in
    // sf0.1's 256-pair population (the standing 254-of-256 matrix
    // exception); twelve r=3 bands cut that to 0.488¹² ≈ 0.018% — ~0.05
    // expected misses corpus-wide, measured 256/256. The
    // guaranteed-recall invariants live in the planted gates
    // (dedup_simhash_recall, text_embed_dedup_recall, *_exactdups).
    "dedup_minhash" ->
      s"""WITH $sh2Ctes,
         |common AS (
         |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_common
         |  FROM sh2 x JOIN sh2 y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(n_common / cast(ca.n_sh + cb.n_sh - n_common AS double), 6)
         |    AS jaccard
         |FROM common
         |JOIN sizes ca ON ca.doc_id = id_a
         |JOIN sizes cb ON cb.doc_id = id_b
         |WHERE n_common / cast(ca.n_sh + cb.n_sh - n_common AS double) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    // same exact side restricted to (batch %5=0) × (indexed %5<>0) —
    // the persistent-index query path held to the from-scratch answer,
    // and the two-installment (build + append) index held to the SAME
    // answer: cross-engine proof that append ≡ rebuild
    "dedup_index_query" -> crossIndexPairSql,
    "dedup_index_append" -> crossIndexPairSql,
    "dedup_index_compacted" -> crossIndexPairSql,

    // same normalized 5-gram space as the decontaminate oracles; df
    // counts documents (per-doc distinct spans)
    "text_dup_spans" ->
      s"""WITH $toksCte,
         |gl AS (
         |  SELECT doc_id, list_distinct(CASE
         |    WHEN len(l) < 5 THEN [array_to_string(l, '_')]
         |    ELSE list_transform(range(1, len(l) - 3),
         |      i -> l[i] || '_' || l[i+1] || '_' || l[i+2] || '_' ||
         |           l[i+3] || '_' || l[i+4]) END) AS gs
         |  FROM toks),
         |g5 AS (SELECT doc_id, unnest(gs) AS g FROM gl),
         |df AS (SELECT g, count(*) AS n FROM g5 GROUP BY g)
         |SELECT doc_id, count(*) AS n_spans,
         |  cast(sum(cast(df.n >= 2 AS int)) AS bigint) AS n_dup,
         |  cast(round(sum(cast(df.n >= 2 AS int))
         |    / cast(count(*) AS double) * 1000000) AS bigint) AS dup_ppm
         |FROM g5 JOIN df USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // full replay of the within-doc removal: per-position normalized
    // 5-gram keys, first occurrence by position keeps, later
    // occurrences cover out, byte-exact retained-text md5
    "text_self_dedup" ->
      """WITH f AS (
        |  SELECT doc_id, coalesce(text, '') ||
        |    ' intra1 intra2 intra3 intra4 intra5 mid' ||
        |    ' intra1 intra2 intra3 intra4 intra5' AS t
        |  FROM documents),
        |nm AS (
        |  SELECT doc_id, t,
        |    list_filter(string_split_regex(t, '[ \t\n\x0b\f\r]+'),
        |                x -> len(x) > 0) AS l
        |  FROM f),
        |n2 AS (
        |  SELECT doc_id, t, l,
        |    list_transform(l,
        |      x -> regexp_replace(lower(x), '[^a-z0-9]', '', 'g')) AS nl
        |  FROM nm),
        |occ AS (
        |  SELECT doc_id,
        |    unnest(range(1, len(l) - 3)) AS pos,
        |    unnest(list_transform(range(1, len(l) - 3),
        |      i -> array_to_string(nl[i:i+4], chr(1)))) AS k
        |  FROM n2 WHERE len(l) >= 5),
        |fo AS (SELECT doc_id, k, min(pos) AS fp FROM occ GROUP BY doc_id, k),
        |cov AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT o.doc_id, unnest(range(o.pos, o.pos + 5)) AS p
        |    FROM occ o JOIN fo USING (doc_id, k)
        |    WHERE o.pos > fo.fp)),
        |covl AS (SELECT doc_id, list(p) AS ps FROM cov GROUP BY doc_id),
        |ret AS (
        |  SELECT n2.doc_id, n2.t, n2.l, c.ps,
        |    CASE WHEN c.ps IS NULL THEN NULL
        |      ELSE list_filter(range(1, len(n2.l) + 1),
        |                       q -> NOT list_contains(c.ps, q)) END AS keep
        |  FROM n2 LEFT JOIN covl c USING (doc_id))
        |SELECT doc_id,
        |  md5(CASE WHEN ps IS NULL THEN t
        |       ELSE coalesce(
        |         array_to_string(list_transform(keep, q -> l[q]), ' '), '')
        |       END) AS clean_md5,
        |  cast(len(l) AS bigint) AS n_tokens,
        |  cast(CASE WHEN ps IS NULL THEN 0
        |            ELSE len(l) - len(keep) END AS bigint) AS n_removed
        |FROM ret ORDER BY doc_id""".stripMargin,

    // the text_dup_remove retained-text md5, restated over the WET
    // wire: a null document ships as "" (the writer's contract), so
    // the untouched branch coalesces
    "clean_ship_roundtrip" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    text || ' boilerplate navigation footer menu copyright of '
        |      || source AS t
        |  FROM documents),
        |nm AS (
        |  SELECT doc_id, t,
        |    list_filter(string_split_regex(t, '[ \t\n\x0b\f\r]+'),
        |                w -> len(w) > 0) AS l
        |  FROM f),
        |nm2 AS (
        |  SELECT doc_id, t, l,
        |    list_transform(l,
        |      w -> regexp_replace(lower(w), '[^a-z0-9]', '', 'g')) AS nl
        |  FROM nm),
        |occ AS (
        |  SELECT doc_id,
        |    unnest(range(1, len(l) - 3)) AS pos,
        |    unnest(list_transform(range(1, len(l) - 3),
        |      i -> array_to_string(nl[i:i+4], chr(1)))) AS k
        |  FROM nm2 WHERE len(l) >= 5),
        |dup AS (
        |  SELECT k, min(doc_id) AS keeper
        |  FROM occ GROUP BY k HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT o.doc_id, unnest(range(o.pos, o.pos + 5)) AS p
        |    FROM occ o JOIN dup d USING (k)
        |    WHERE o.doc_id <> d.keeper)),
        |covl AS (SELECT doc_id, list(p) AS ps FROM cov GROUP BY doc_id),
        |ret AS (
        |  SELECT n.doc_id, n.t, n.l, c.ps,
        |    CASE WHEN c.ps IS NULL THEN NULL
        |         ELSE list_filter(range(1, len(n.l) + 1),
        |                          q -> NOT list_contains(c.ps, q))
        |    END AS keep
        |  FROM nm2 n LEFT JOIN covl c USING (doc_id))
        |SELECT doc_id,
        |  md5(CASE WHEN ps IS NULL THEN coalesce(t, '')
        |       ELSE coalesce(
        |         array_to_string(list_transform(keep, q -> l[q]), ' '), '')
        |       END) AS clean_md5
        |FROM ret ORDER BY doc_id""".stripMargin,

    // full from-scratch recompute of the span-removal rewrite: same
    // framed text as the gate, per-token normalized 5-gram keys (chr(1)
    // joiner mirrors the engine's \u0001 — both alphabets are [a-z0-9]*
    // so the key spaces are bijective), document-frequency keeper, and
    // byte-exact retained-text md5 (untouched docs hash their ORIGINAL
    // framed text; touched docs hash the space-rejoined raw tokens)
    "text_dup_remove" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    text || ' boilerplate navigation footer menu copyright of '
        |      || source AS t
        |  FROM documents),
        |nm AS (
        |  SELECT doc_id, t,
        |    list_filter(string_split_regex(t, '[ \t\n\x0b\f\r]+'),
        |                w -> len(w) > 0) AS l
        |  FROM f),
        |nm2 AS (
        |  SELECT doc_id, t, l,
        |    list_transform(l,
        |      w -> regexp_replace(lower(w), '[^a-z0-9]', '', 'g')) AS nl
        |  FROM nm),
        |occ AS (
        |  SELECT doc_id,
        |    unnest(range(1, len(l) - 3)) AS pos,
        |    unnest(list_transform(range(1, len(l) - 3),
        |      i -> array_to_string(nl[i:i+4], chr(1)))) AS k
        |  FROM nm2 WHERE len(l) >= 5),
        |dup AS (
        |  SELECT k, min(doc_id) AS keeper
        |  FROM occ GROUP BY k HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, p FROM (
        |    SELECT o.doc_id, unnest(range(o.pos, o.pos + 5)) AS p
        |    FROM occ o JOIN dup d USING (k)
        |    WHERE o.doc_id <> d.keeper)),
        |covl AS (SELECT doc_id, list(p) AS ps FROM cov GROUP BY doc_id),
        |ret AS (
        |  SELECT n.doc_id, n.t, n.l, c.ps,
        |    CASE WHEN c.ps IS NULL THEN NULL
        |         ELSE list_filter(range(1, len(n.l) + 1),
        |                          q -> NOT list_contains(c.ps, q))
        |    END AS keep
        |  FROM nm2 n LEFT JOIN covl c USING (doc_id))
        |SELECT doc_id,
        |  md5(CASE WHEN ps IS NULL THEN t
        |       -- array_to_string([]) is NULL in DuckDB, '' in Spark
        |       ELSE coalesce(
        |         array_to_string(list_transform(keep, q -> l[q]), ' '), '')
        |       END) AS clean_md5,
        |  cast(coalesce(len(l), 0) AS bigint) AS n_tokens,
        |  cast(CASE WHEN ps IS NULL THEN 0
        |            ELSE len(l) - len(keep) END AS bigint) AS n_removed
        |FROM ret ORDER BY doc_id""".stripMargin,

    // the text_line_dedup contract over blank-line blocks: same null
    // coalescing, same count/md5 shape, separators chr(10)||chr(10)
    "text_paragraph_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(
        |    coalesce('shared boilerplate paragraph here' || chr(10) ||
        |      chr(10) || text || chr(10) || chr(10) || 'footer for ' ||
        |      source, ''), chr(10) || chr(10)) AS ls
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, ls FROM t),
        |l2 AS (SELECT doc_id, pos, ls[cast(pos AS int)] AS line FROM l),
        |c AS (SELECT line, count(*) AS n FROM l2 GROUP BY line)
        |SELECT l2.doc_id,
        |  -- coalesce AFTER array_to_string too: array_to_string([]) is
        |  -- NULL in DuckDB while the engine yields md5('')
        |  md5(coalesce(array_to_string(
        |    coalesce(list(l2.line ORDER BY l2.pos) FILTER (WHERE c.n <= 2), []),
        |    chr(10) || chr(10)), '')) AS kept_md5,
        |  count(*) AS n_blocks,
        |  cast(sum(cast(c.n > 2 AS int)) AS bigint) AS n_removed
        |FROM l2 JOIN c USING (line)
        |GROUP BY l2.doc_id
        |ORDER BY doc_id""".stripMargin,

    // coalesce mirrors the engine: dedupLines maps a NULL framed string
    // to one "" line (every document survives), and the gate's concat
    // nulls out whenever text/source is null — without the coalesce the
    // oracle's string_split(NULL) unnests to zero rows and the doc
    // vanishes from one side only
    "text_line_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(
        |    coalesce('=== site header ===' || chr(10) || text || chr(10) ||
        |      'footer for ' || source, ''), chr(10)) AS ls
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, ls FROM t),
        |l2 AS (SELECT doc_id, pos, ls[cast(pos AS int)] AS line FROM l),
        |c AS (SELECT line, count(*) AS n FROM l2 GROUP BY line)
        |SELECT l2.doc_id,
        |  md5(coalesce(array_to_string(
        |    coalesce(list(l2.line ORDER BY l2.pos) FILTER (WHERE c.n <= 2), []),
        |    chr(10)), '')) AS kept_md5,
        |  count(*) AS n_lines,
        |  cast(sum(cast(c.n > 2 AS int)) AS bigint) AS n_removed
        |FROM l2 JOIN c USING (line)
        |GROUP BY l2.doc_id
        |ORDER BY doc_id""".stripMargin,

    // exact containment over the rare 3-gram space: both orientations of
    // the pruned inverted-index common counts (mirrors ngramPairCtes'
    // shingle/rare/common semantics)
    "dedup_containment" ->
      s"""WITH $toksCte,
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(CASE
         |    WHEN len(l) < 3 THEN [array_to_string(l, '_')]
         |    ELSE list_transform(range(1, len(l) - 1),
         |      i -> l[i] || '_' || l[i+1] || '_' || l[i+2]) END)) AS s
         |  FROM toks),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
         |pruned AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM pruned GROUP BY doc_id),
         |common AS (
         |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_common
         |  FROM pruned x JOIN pruned y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |oriented AS (
         |  SELECT id_a AS doc_id, id_b AS container_id,
         |         n_common / cast(ca.n_sh AS double) AS c
         |  FROM common JOIN sizes ca ON ca.doc_id = id_a
         |  UNION ALL
         |  SELECT id_b, id_a, n_common / cast(cb.n_sh AS double)
         |  FROM common JOIN sizes cb ON cb.doc_id = id_b)
         |SELECT doc_id, container_id, round(c, 6) AS containment
         |FROM oriented WHERE c >= 0.8
         |ORDER BY doc_id, container_id""".stripMargin,

    "dedup_simhash_recall" ->
      s"""WITH $toksCte,
         |k AS (
         |  SELECT doc_id,
         |    array_to_string(list_sort(list_distinct(l)), '|') AS key
         |  FROM toks)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, cast(0 AS int) AS hamming
         |FROM k a JOIN k b ON a.key = b.key AND a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin,

    // planted byte-identical clones MUST surface at hamming 0 — the
    // pair set restates the synthesis formula (even ids < 8 cloned
    // under +1000000); no image decode happens oracle-side, identity
    // of bytes implies identity of any function of them
    "image_dedup_recall" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM documents WHERE doc_id < 8 AND doc_id % 2 = 0
        |ORDER BY id_a""".stripMargin,

    // the pHash plants: byte clones trivially, exact-2× contrast
    // because equal-channel luma is the pixel value and a power-of-two
    // rescale scales every DCT partial sum exactly, preserving every
    // median comparison — both families at hamming exactly 0
    "image_phash_dedup" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM documents WHERE doc_id < 8
        |UNION ALL
        |SELECT doc_id, doc_id + 2000000, cast(0 AS int)
        |FROM documents WHERE doc_id < 8
        |ORDER BY id_a, id_b""".stripMargin,

    // every contrast re-render is an exact signature match against the
    // standing state: seen, hamming 0, first_doc = the base id
    "image_phash_incremental" ->
      """SELECT doc_id + 100000 AS doc_id, 'seen' AS status,
        |  doc_id AS first_doc, cast(0 AS bigint) AS hamming
        |FROM documents WHERE doc_id < 24
        |ORDER BY doc_id""".stripMargin,

    // from-scratch restatement of the rolling-fold annotation from the
    // fixture's doc-id arithmetic: roles 0/1 are in-radius re-sights of
    // batch-1 class c (whose state first_doc is 2c — docs are
    // contiguous from 0), roles 2/3 share a never-seen class judged
    // within the batch by min doc
    "image_dedup_incremental" ->
      """WITH b2 AS (
        |  SELECT doc_id, (doc_id - 1) // 2 AS k FROM documents
        |  WHERE doc_id % 2 = 1 AND doc_id < 400),
        |r AS (SELECT doc_id, k % 4 AS role, k % 10 AS c FROM b2),
        |n AS (SELECT c, min(doc_id) AS nf FROM r WHERE role IN (2, 3)
        |  GROUP BY c)
        |SELECT r.doc_id,
        |  CASE WHEN r.role IN (0, 1) THEN 'seen'
        |       WHEN r.doc_id = n.nf THEN 'new'
        |       ELSE 'dup_in_batch' END AS status,
        |  cast(CASE WHEN r.role IN (0, 1) THEN 2 * r.c ELSE n.nf END
        |    AS bigint) AS first_doc,
        |  cast(CASE WHEN r.role = 0 THEN 0 WHEN r.role = 1 THEN 1
        |    ELSE NULL END AS bigint) AS hamming
        |FROM r LEFT JOIN n USING (c)
        |ORDER BY r.doc_id""".stripMargin,

    // single-frame docs restate the image arithmetic verbatim; the
    // two-frame docs (odd 401 ≤ d < 440) are 'seen' at hamming 0
    // through their SECOND frame — an exact re-sight of base class
    // j%10, whose state first_doc is 2*(j%10)
    "gif_dedup_incremental" ->
      """WITH b2 AS (
        |  SELECT doc_id, (doc_id - 1) // 2 AS k FROM documents
        |  WHERE doc_id % 2 = 1 AND doc_id < 400),
        |r AS (SELECT doc_id, k % 4 AS role, k % 10 AS c FROM b2),
        |n AS (SELECT c, min(doc_id) AS nf FROM r WHERE role IN (2, 3)
        |  GROUP BY c),
        |single AS (
        |  SELECT r.doc_id,
        |    CASE WHEN r.role IN (0, 1) THEN 'seen'
        |         WHEN r.doc_id = n.nf THEN 'new'
        |         ELSE 'dup_in_batch' END AS status,
        |    cast(CASE WHEN r.role IN (0, 1) THEN 2 * r.c ELSE n.nf END
        |      AS bigint) AS first_doc,
        |    cast(CASE WHEN r.role = 0 THEN 0 WHEN r.role = 1 THEN 1
        |      ELSE NULL END AS bigint) AS hamming
        |  FROM r LEFT JOIN n USING (c)),
        |dual AS (
        |  SELECT doc_id, 'seen' AS status,
        |    cast(2 * (((doc_id - 401) // 2) % 10) AS bigint) AS first_doc,
        |    cast(0 AS bigint) AS hamming
        |  FROM documents
        |  WHERE doc_id % 2 = 1 AND doc_id >= 401 AND doc_id < 440)
        |SELECT * FROM single UNION ALL SELECT * FROM dual
        |ORDER BY doc_id""".stripMargin,

    // identical arithmetic to image_dedup_incremental: the audio
    // population re-renders the same class signatures, so the same
    // from-scratch restatement judges the audio fold
    "audio_dedup_incremental" ->
      """WITH b2 AS (
        |  SELECT doc_id, (doc_id - 1) // 2 AS k FROM documents
        |  WHERE doc_id % 2 = 1 AND doc_id < 400),
        |r AS (SELECT doc_id, k % 4 AS role, k % 10 AS c FROM b2),
        |n AS (SELECT c, min(doc_id) AS nf FROM r WHERE role IN (2, 3)
        |  GROUP BY c)
        |SELECT r.doc_id,
        |  CASE WHEN r.role IN (0, 1) THEN 'seen'
        |       WHEN r.doc_id = n.nf THEN 'new'
        |       ELSE 'dup_in_batch' END AS status,
        |  cast(CASE WHEN r.role IN (0, 1) THEN 2 * r.c ELSE n.nf END
        |    AS bigint) AS first_doc,
        |  cast(CASE WHEN r.role = 0 THEN 0 WHEN r.role = 1 THEN 1
        |    ELSE NULL END AS bigint) AS hamming
        |FROM r LEFT JOIN n USING (c)
        |ORDER BY r.doc_id""".stripMargin,

    // both planted audio families land at hamming 0: byte clones
    // trivially, 2×-amplitude re-renders because energy scales by
    // exactly 4 and every delta sign (including ties, 0 > 0 stays
    // false) survives a positive scale
    "audio_dedup_recall" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM documents WHERE doc_id < 8
        |UNION ALL
        |SELECT doc_id, doc_id + 2000000, cast(0 AS int)
        |FROM documents WHERE doc_id < 8
        |ORDER BY id_a, id_b""".stripMargin,

    // the G.711 cross-codec plants: equal window amplitudes quantize
    // identically (ties exact) and the 16× two-level energy separation
    // swamps the ≤ ~12% compand error — hamming provably 0, pair set
    // restated from the synthesis
    "audio_dedup_crosscodec" ->
      """SELECT doc_id + 3000000 AS id_a, doc_id + 4000000 AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM documents WHERE doc_id < 8
        |UNION ALL
        |SELECT doc_id + 3000000, doc_id + 5000000, cast(0 AS int)
        |FROM documents WHERE doc_id < 8
        |ORDER BY id_a, id_b""".stripMargin,

    // the ADPCM cross-codec plants: identical decoded sample arrays
    // (the waveform is decoder-generated, so the encode is exact) →
    // identical fingerprints → hamming 0; the twin pair set restated
    // from the id arithmetic
    "audio_dedup_adpcm" ->
      """SELECT doc_id + 6000000 AS id_a, doc_id + 7000000 AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM documents WHERE doc_id < 8
        |ORDER BY id_a""".stripMargin,

    // the video pair set from the fixture's class arithmetic: docs
    // pair iff they share frame-0 class (d%10) or frame-1 class (d%7),
    // always at hamming 0 (exact class signatures; cross-class ≥ 24;
    // frame-0 and frame-1 class families are disjoint)
    "video_dedup" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 60)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |  AND (a.doc_id % 10 = b.doc_id % 10 OR
        |       a.doc_id % 7 = b.doc_id % 7)
        |ORDER BY id_a, id_b""".stripMargin,

    // cross-codec twins: every DIB clip pairs its MJPEG re-encode at
    // hamming 0 (equal frame dHashes by the sign-margin construction)
    "video_dedup_crosscodec" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM documents WHERE doc_id < 60
        |ORDER BY id_a""".stripMargin,

    // the whole router replayed from class arithmetic: video pairs
    // share a frame-0 class (d%10) or frame-1 class (d%7); image and
    // audio pairs share class d%10; non-media rows classify unknown
    // and pair with nothing
    "media_curation_pipeline" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 60),
        |vp AS (SELECT count(*) AS c FROM d a JOIN d b
        |         ON a.doc_id < b.doc_id
        |         AND (a.doc_id % 10 = b.doc_id % 10 OR
        |              a.doc_id % 7 = b.doc_id % 7)),
        |cp AS (SELECT count(*) AS c FROM d a JOIN d b
        |         ON a.doc_id < b.doc_id
        |         AND a.doc_id % 10 = b.doc_id % 10),
        |n AS (SELECT count(*) AS c FROM d),
        |u AS (SELECT count(*) AS c FROM documents WHERE doc_id < 20)
        |SELECT 'avi' AS format, cast(n.c AS bigint) AS n_docs,
        |  cast(vp.c AS bigint) AS n_pairs FROM n, vp
        |UNION ALL
        |SELECT 'png', cast(n.c AS bigint), cast(cp.c AS bigint) FROM n, cp
        |UNION ALL
        |SELECT 'wav', cast(n.c AS bigint), cast(cp.c AS bigint) FROM n, cp
        |UNION ALL
        |SELECT 'unknown', cast(u.c AS bigint), cast(0 AS bigint) FROM u
        |ORDER BY format""".stripMargin,

    // the three family restatements under their id offsets, one frame:
    // roles 0/1 re-sight batch-1 class c (state first_doc = offset +
    // 2c), roles 2/3 share a never-seen class judged within the batch,
    // video's two-frame docs are seen through their second frame
    "media_curation_incremental" ->
      """WITH b2 AS (
        |  SELECT doc_id, (doc_id - 1) // 2 AS k FROM documents
        |  WHERE doc_id % 2 = 1 AND doc_id < 400),
        |r AS (SELECT doc_id, k % 4 AS role, k % 10 AS c FROM b2),
        |n AS (SELECT c, min(doc_id) AS nf FROM r WHERE role IN (2, 3)
        |  GROUP BY c),
        |fam AS (
        |  SELECT r.doc_id,
        |    CASE WHEN r.role IN (0, 1) THEN 'seen'
        |         WHEN r.doc_id = n.nf THEN 'new'
        |         ELSE 'dup_in_batch' END AS status,
        |    CASE WHEN r.role IN (0, 1) THEN 2 * r.c ELSE n.nf END AS fd,
        |    cast(CASE WHEN r.role = 0 THEN 0 WHEN r.role = 1 THEN 1
        |      ELSE NULL END AS bigint) AS hamming
        |  FROM r LEFT JOIN n USING (c)),
        |dual AS (
        |  SELECT doc_id, 'seen' AS status,
        |    2 * (((doc_id - 401) // 2) % 10) AS fd,
        |    cast(0 AS bigint) AS hamming
        |  FROM documents
        |  WHERE doc_id % 2 = 1 AND doc_id >= 401 AND doc_id < 440)
        |SELECT 'png' AS modality, doc_id + 1000000 AS doc_id, status,
        |  cast(fd + 1000000 AS bigint) AS first_doc, hamming FROM fam
        |UNION ALL
        |SELECT 'wav', doc_id + 2000000, status,
        |  cast(fd + 2000000 AS bigint), hamming FROM fam
        |UNION ALL
        |SELECT 'avi', doc_id + 3000000, status,
        |  cast(fd + 3000000 AS bigint), hamming FROM fam
        |UNION ALL
        |SELECT 'avi', doc_id + 3000000, status,
        |  cast(fd + 3000000 AS bigint), hamming FROM dual
        |ORDER BY doc_id""".stripMargin,

    // the single cut sits at frame 3 by construction (frames 0-2 one
    // exact class, 3-5 another ≥ 24 bits away; within-scene hamming 0)
    "video_scenes" ->
      """SELECT doc_id, cast(i AS int) AS frame_idx, i = 3 AS is_cut
        |FROM documents, range(1, 6) t(i)
        |WHERE doc_id < 120
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // every segment replayed from the fixture arithmetic: window w is
    // active iff (d·31 + w·7) % 5 < 2 (energy 8·1000² vs 8·10²), runs
    // grouped by the same gaps-and-islands construction
    "audio_segments" ->
      """WITH w AS (
        |  SELECT doc_id, i AS w,
        |    CASE WHEN (doc_id * 31 + i * 7) % 5 < 2
        |      THEN 8 * 1000000 ELSE 8 * 100 END AS energy
        |  FROM documents, range(40) t(i) WHERE doc_id < 200),
        |a AS (SELECT doc_id, w, energy FROM w WHERE energy > 10000),
        |g AS (SELECT doc_id, w, energy,
        |        w - row_number() OVER (PARTITION BY doc_id ORDER BY w)
        |          AS grp
        |      FROM a)
        |SELECT doc_id, cast(min(w) AS int) AS start_w,
        |  cast(max(w) AS int) AS end_w,
        |  cast(count(*) AS bigint) AS n_windows,
        |  cast(sum(energy) AS bigint) AS energy_sum
        |FROM g GROUP BY doc_id, grp
        |ORDER BY doc_id, start_w""".stripMargin,

    // the gif_dedup_incremental restatement verbatim — the video
    // population re-renders the same class signatures as AVI frames,
    // so the same from-scratch arithmetic judges the video fold
    // (two-frame docs 'seen' at hamming 0 through their SECOND frame)
    "video_dedup_incremental" ->
      """WITH b2 AS (
        |  SELECT doc_id, (doc_id - 1) // 2 AS k FROM documents
        |  WHERE doc_id % 2 = 1 AND doc_id < 400),
        |r AS (SELECT doc_id, k % 4 AS role, k % 10 AS c FROM b2),
        |n AS (SELECT c, min(doc_id) AS nf FROM r WHERE role IN (2, 3)
        |  GROUP BY c),
        |single AS (
        |  SELECT r.doc_id,
        |    CASE WHEN r.role IN (0, 1) THEN 'seen'
        |         WHEN r.doc_id = n.nf THEN 'new'
        |         ELSE 'dup_in_batch' END AS status,
        |    cast(CASE WHEN r.role IN (0, 1) THEN 2 * r.c ELSE n.nf END
        |      AS bigint) AS first_doc,
        |    cast(CASE WHEN r.role = 0 THEN 0 WHEN r.role = 1 THEN 1
        |      ELSE NULL END AS bigint) AS hamming
        |  FROM r LEFT JOIN n USING (c)),
        |dual AS (
        |  SELECT doc_id, 'seen' AS status,
        |    cast(2 * (((doc_id - 401) // 2) % 10) AS bigint) AS first_doc,
        |    cast(0 AS bigint) AS hamming
        |  FROM documents
        |  WHERE doc_id % 2 = 1 AND doc_id >= 401 AND doc_id < 440)
        |SELECT * FROM single UNION ALL SELECT * FROM dual
        |ORDER BY doc_id""".stripMargin,

    // byte-identical clones of animations < 8 under +1000000: identity
    // of bytes implies identity of every frame hash → hamming 0
    "gif_dedup_recall" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM documents WHERE doc_id < 8
        |ORDER BY id_a""".stripMargin,

    // spectral frame hashes of identical bytes are identical — the
    // same clone plant pins the pHash animation family
    "gif_phash_dedup" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  cast(0 AS int) AS hamming
        |FROM documents WHERE doc_id < 8
        |ORDER BY id_a""".stripMargin,

    "text_fingerprint_classes" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |                        '\s+', ' ', 'g')) AS nt
        |  FROM documents)
        |SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY nt) AS canonical_id,
        |  count(*) OVER (PARTITION BY nt) AS n_copies
        |FROM n ORDER BY doc_id""".stripMargin,

    // identical normalized token STREAMS → identical hash-embeddings →
    // cosine exactly 1.0 after 6-decimal rounding, and identical LSH
    // signatures make the candidate guaranteed — so the approximate
    // near-dup operator must report every such pair at sim 1.0. The
    // corpus plants its duplicate population (docs 0-7 re-added under
    // doc_id + 1000000, mirroring the Spark side) — the natural fixture
    // has no same-stream pair and the unplanted gate proved nothing.
    "text_embed_dedup_exactdups" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 8),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(
        |      trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |                          '\s+', ' ', 'g')), '\s+'),
        |      w -> len(w) > 0) AS l
        |  FROM corpus),
        |k AS (
        |  SELECT doc_id, array_to_string(l, '|') AS key
        |  FROM toks WHERE len(l) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  cast(1.0 AS double) AS sim
        |FROM k a JOIN k b ON a.key = b.key AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,

    "ann_ivf_full" -> annBruteTopkSql,
    "ann_index_query_full" -> annBruteTopkSql,
    "ann_index_append" -> annBruteTopkSql,
    "ann_ivfpq_full" -> annBruteTopkSql,
    "ann_lsh_full" -> annBruteTopkSql,
    "ann_pq_full" -> annBruteTopkSql,

    // ── Invariant oracles for the production-parameter approximate
    //    gates (r19 ask #6: zero rows-only gates) ─────────────────────
    // Each production-parameter ANN gate returns exactly k rows per
    // query with exact-cosine sims (annInvariant); WHICH neighbors is
    // the _full twins' question.
    "ann_lsh" -> annInvariantSql,
    "ann_pq" -> annInvariantSql,
    "ann_ivf" -> annInvariantSql,
    "ann_index_query" -> annInvariantSql,
    "ann_ivfpq" -> annInvariantSql,

    // per-group exact row counts + sketch-in-bound flags
    "approx_metrics" ->
      """SELECT l_returnflag, cast(count(*) AS bigint) AS n_rows,
        |  1 AS ok_distinct, 1 AS ok_median
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // text-equal pairs (8 planted copies keep the population non-empty
    // at every SF) are guaranteed found by the simhash pigeonhole —
    // identical text, identical signature, hamming 0
    "dedup_simhash" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 8)
        |SELECT cast(count(*) AS bigint) AS n_exactdup_pairs,
        |  1 AS radius_ok
        |FROM d a JOIN d b ON a.text = b.text AND a.doc_id < b.doc_id"""
        .stripMargin,

    // the labeling contract at the production cluster count: every
    // document labeled once, canonical ≤ own id and itself a corpus id
    "semdedup" ->
      """SELECT vec_id AS doc_id, 1 AS ok FROM embeddings
        |ORDER BY doc_id""".stripMargin,

    // equal texts must fingerprint equal under both families
    "text_fingerprint" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 8)
        |SELECT cast(count(*) AS bigint) AS n_docs,
        |  cast(0 AS bigint) AS n_fp_violations,
        |  cast(0 AS bigint) AS n_rolling_violations
        |FROM d""".stripMargin,

    // identical texts embed identically, band identically, verify at
    // cosine exactly 1 — every text-equal pair surfaces, none off 1.0
    "text_embed_dedup" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 8)
        |SELECT cast(count(*) AS bigint) AS n_exactdup_pairs,
        |  cast(0 AS bigint) AS n_sim_violations
        |FROM d a JOIN d b ON a.text = b.text AND a.doc_id < b.doc_id"""
        .stripMargin,

    // 4 byte-clone twins (even ids < 8) + 4 perturbation twins — the
    // planted families of imageDedupPop, all guaranteed found
    "image_dedup" ->
      """SELECT cast(2 * count(*) AS bigint) AS n_planted_pairs,
        |  1 AS radius_ok
        |FROM documents WHERE doc_id % 2 = 0 AND doc_id < 8""".stripMargin,

    // byte clones (+1e6) and 2×-amplitude re-renders (+2e6) for ids < 8
    "audio_dedup" ->
      """SELECT cast(2 * count(*) AS bigint) AS n_planted_pairs,
        |  1 AS radius_ok
        |FROM documents WHERE doc_id < 8""".stripMargin,

    // the natural byte-identical classes of the 6-gray synthesis: ids
    // congruent mod 60 (shape params repeat at lcm(5,4,3), fill at
    // id % 6) — a from-scratch restatement of the class arithmetic
    "gif_dedup" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200)
        |SELECT cast(count(*) AS bigint) AS n_mod60_pairs, 1 AS radius_ok
        |FROM d a JOIN d b
        |  ON a.doc_id < b.doc_id AND a.doc_id % 60 = b.doc_id % 60"""
        .stripMargin,

    // exact all-pairs cosine ≥ 0.3, top-50 — the LSH-bucketed near-dup
    // pipeline has verified full recall on this corpus, so its
    // exact-cosine-verified output equals the from-scratch answer
    "dedup_embedding" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding AS double[]) AS e FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_cosine_similarity(a.e, b.e), 6) AS sim
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.3
        |ORDER BY sim DESC, id_a, id_b LIMIT 50""".stripMargin,

    // the identical-vector pair set over the planted corpus, from
    // scratch — list equality on the raw floats, no hashing involved
    "text_embed_dedup_recall" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE len(embedding) > 0),
        |corpus AS (
        |  SELECT vec_id, embedding FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, embedding FROM base
        |  WHERE vec_id % 10 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM corpus a JOIN corpus b
        |  ON a.vec_id < b.vec_id AND a.embedding = b.embedding
        |ORDER BY id_a, id_b""".stripMargin,

    // SemDeDup at nClusters=1 ≡ the same exact all-pairs computation
    // that pins the LSH front — deliberately the identical oracle
    "semdedup_pairs" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding AS double[]) AS e FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_cosine_similarity(a.e, b.e), 6) AS sim
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.3
        |ORDER BY sim DESC, id_a, id_b LIMIT 50""".stripMargin,

    // connected components over the full (no LIMIT) exact pair set —
    // same recursive min-label closure as the dedup_clusters oracle
    "semdedup_canonical" ->
      """WITH RECURSIVE v AS (
        |  SELECT vec_id, cast(embedding AS double[]) AS e FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |comp AS (
        |  SELECT vec_id AS doc_id, vec_id AS label FROM embeddings
        |  UNION
        |  SELECT e.dst AS doc_id, c.label
        |  FROM comp c JOIN edges e ON e.src = c.doc_id
        |  WHERE c.label < e.dst)
        |SELECT doc_id, cast(min(label) AS bigint) AS canonical_id
        |FROM comp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the plants are enumerable without running the operator: identical
    // vectors always co-cluster and score exactly 1.0 after rounding
    "semdedup_exactdups" ->
      """SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
        |  cast(1.0 AS double) AS sim
        |FROM embeddings WHERE vec_id < 8 ORDER BY id_a""".stripMargin,

    "approx_metrics_bounds" ->
      """SELECT l_returnflag, cast(1 AS int) AS ok_distinct,
        |  cast(1 AS int) AS ok_median
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // connected components by recursive min-label closure: a label only
    // propagates to larger-id nodes, and the component minimum is
    // smaller than every member, so min(label) per node is exact
    "dedup_clusters" ->
      s"""WITH RECURSIVE $ngramPairCtes,
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM njpairs
         |  UNION ALL SELECT id_b, id_a FROM njpairs),
         |comp AS (
         |  SELECT doc_id, doc_id AS label FROM documents
         |  UNION
         |  SELECT e.dst AS doc_id, c.label
         |  FROM comp c JOIN edges e ON e.src = c.doc_id
         |  WHERE c.label < e.dst)
         |SELECT doc_id, cast(min(label) AS bigint) AS canonical_id
         |FROM comp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the cluster closure again, then each cluster's argmax by
    // (alpha-ratio ppm DESC, doc_id) — the window the operator
    // deliberately avoids
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $ngramPairCtes,
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM njpairs
         |  UNION ALL SELECT id_b, id_a FROM njpairs),
         |comp AS (
         |  SELECT doc_id, doc_id AS label FROM documents
         |  UNION
         |  SELECT e.dst AS doc_id, c.label
         |  FROM comp c JOIN edges e ON e.src = c.doc_id
         |  WHERE c.label < e.dst),
         |canon AS (
         |  SELECT doc_id, cast(min(label) AS bigint) AS canonical_id
         |  FROM comp GROUP BY doc_id),
         |q AS (
         |  SELECT d.doc_id, c.canonical_id,
         |    cast(round(len(regexp_extract_all(coalesce(d.text, ''),
         |        '[A-Za-z]'))
         |      / greatest(length(coalesce(d.text, '')), 1) * 1000000)
         |      AS bigint) AS q_ppm
         |  FROM documents d JOIN canon c USING (doc_id)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY canonical_id
         |  ORDER BY q_ppm DESC, doc_id) AS rn FROM q)
         |SELECT doc_id, canonical_id, q_ppm FROM r WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,

    // the cluster closure again, then the corpus_sample split CASE
    // re-keyed on canonical_id — 'e666' is round(0.9 · 65536) in hex,
    // the engine's hexThreshold grid
    "split_leakage_safe" ->
      s"""WITH RECURSIVE $ngramPairCtes,
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM njpairs
         |  UNION ALL SELECT id_b, id_a FROM njpairs),
         |comp AS (
         |  SELECT doc_id, doc_id AS label FROM documents
         |  UNION
         |  SELECT e.dst AS doc_id, c.label
         |  FROM comp c JOIN edges e ON e.src = c.doc_id
         |  WHERE c.label < e.dst),
         |canon AS (
         |  SELECT doc_id, cast(min(label) AS bigint) AS canonical_id
         |  FROM comp GROUP BY doc_id)
         |SELECT doc_id, canonical_id,
         |  CASE WHEN substr(md5(cast(canonical_id AS varchar) || ':split'),
         |                   1, 4) < 'e666'
         |       THEN 'train' ELSE 'eval' END AS split
         |FROM canon ORDER BY doc_id""".stripMargin,

    "text_redact" ->
      """SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b', '<PHONE>', 'g')) AS redacted_md5,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
        |  + len(regexp_extract_all(text, '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b')) AS n_redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pack_examples" ->
      s"""WITH $chunkCtes,
        |ch AS (
        |  SELECT doc_id, lang, cast((s - 1) // 64 AS int) AS chunk_idx,
        |         len(l[s:s+63]) AS n_tokens
        |  FROM c),
        |b AS (
        |  SELECT lang, n_tokens,
        |    cast(floor(coalesce(sum(n_tokens) OVER (
        |      PARTITION BY lang ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256)
        |      AS bigint) AS bin_id
        |  FROM ch)
        |SELECT lang, bin_id, count(*) AS n_chunks,
        |       cast(sum(n_tokens) AS bigint) AS total_tokens
        |FROM b GROUP BY lang, bin_id ORDER BY lang, bin_id""".stripMargin,

    // τ-sampling recomputed from scratch: per-source n, weight
    // w = round(sqrt(n)·2²⁰) (sqrt is IEEE-exact in BOTH engines),
    // threshold round-half-up of 65536·T·w/(Σw·n) in pure integer
    // arithmetic (HUGEINT intermediates, BIGINT-free output), then the
    // same keyed md5 bucket predicate the engine applies
    "corpus_mix_temperature" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n FROM documents
        |  WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT cast(sum(n) // 2 AS bigint) AS tr FROM s),
        |w AS (SELECT source, n,
        |        cast(round(sqrt(cast(n AS double)) * 1048576) AS bigint)
        |          AS wi
        |      FROM s),
        |tot AS (SELECT cast(sum(wi) AS bigint) AS sw FROM w),
        |th AS (SELECT w.source,
        |         -- products ride HUGEINT: DuckDB BIGINT multiplication
        |         -- hard-errors on overflow, and 131072·T·w passes 2^63
        |         -- within one more order of magnitude of corpus
        |         least(65536,
        |           (2 * 65536 * cast(t.tr AS hugeint) * w.wi
        |              + cast(tot.sw AS hugeint) * w.n)
        |             // (2 * cast(tot.sw AS hugeint) * w.n)) AS th16
        |       FROM w, tot, t)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN th ON d.source = th.source
        |WHERE substr(md5(cast(d.doc_id AS varchar) || ':tmix'), 1, 4) <
        |  CASE WHEN th.th16 >= 65536 THEN 'g'
        |       ELSE lpad(lower(hex(th.th16)), 4, '0') END
        |ORDER BY d.doc_id""".stripMargin,

    // state-folded counts must equal from-scratch counts, so the
    // incremental gate's oracle IS the direct computation at tr = Σn/4
    "corpus_mix_temperature_incremental" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n FROM documents
        |  WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT cast(sum(n) // 4 AS bigint) AS tr FROM s),
        |w AS (SELECT source, n,
        |        cast(round(sqrt(cast(n AS double)) * 1048576) AS bigint)
        |          AS wi
        |      FROM s),
        |tot AS (SELECT cast(sum(wi) AS bigint) AS sw FROM w),
        |th AS (SELECT w.source,
        |         least(65536,
        |           (2 * 65536 * cast(t.tr AS hugeint) * w.wi
        |              + cast(tot.sw AS hugeint) * w.n)
        |             // (2 * cast(tot.sw AS hugeint) * w.n)) AS th16
        |       FROM w, tot, t)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN th ON d.source = th.source
        |WHERE substr(md5(cast(d.doc_id AS varchar) || ':tmix'), 1, 4) <
        |  CASE WHEN th.th16 >= 65536 THEN 'g'
        |       ELSE lpad(lower(hex(th.th16)), 4, '0') END
        |ORDER BY d.doc_id""".stripMargin,

    // the upsampling twin: same integer th16, split as whole copies
    // (th16 // 65536) + fractional keep (th16 % 65536 on the hex grid)
    "corpus_mix_temperature_epochs" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n FROM documents
        |  WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT cast(sum(n) * 2 AS bigint) AS tr FROM s),
        |w AS (SELECT source, n,
        |        cast(round(sqrt(cast(n AS double)) * 1048576) AS bigint)
        |          AS wi
        |      FROM s),
        |tot AS (SELECT cast(sum(wi) AS bigint) AS sw FROM w),
        |th AS (SELECT w.source,
        |         -- HUGEINT products for the same overflow reason as the
        |         -- downsampling twin; th16 itself fits BIGINT (rate is
        |         -- maxCopies-bounded on the engine side)
        |         cast((2 * 65536 * cast(t.tr AS hugeint) * w.wi
        |             + cast(tot.sw AS hugeint) * w.n)
        |           // (2 * cast(tot.sw AS hugeint) * w.n) AS bigint)
        |           AS th16
        |       FROM w, tot, t),
        |c AS (SELECT d.doc_id, d.source,
        |        cast(th.th16 // 65536 AS int) +
        |        CASE WHEN substr(md5(cast(d.doc_id AS varchar) || ':tmixr'),
        |                         1, 4)
        |                  < lpad(lower(hex(th.th16 % 65536)), 4, '0')
        |             THEN 1 ELSE 0 END AS nc
        |      FROM documents d JOIN th ON d.source = th.source)
        |SELECT doc_id, source, unnest(range(0, nc)) AS copy_idx
        |FROM c ORDER BY doc_id, copy_idx""".stripMargin,

    // state-folded counts must equal from-scratch counts, so the
    // incremental epochs gate's oracle IS the direct epochs
    // computation at tr = Σn·2
    "corpus_mix_temperature_epochs_incremental" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n FROM documents
        |  WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT cast(sum(n) * 2 AS bigint) AS tr FROM s),
        |w AS (SELECT source, n,
        |        cast(round(sqrt(cast(n AS double)) * 1048576) AS bigint)
        |          AS wi
        |      FROM s),
        |tot AS (SELECT cast(sum(wi) AS bigint) AS sw FROM w),
        |th AS (SELECT w.source,
        |         cast((2 * 65536 * cast(t.tr AS hugeint) * w.wi
        |             + cast(tot.sw AS hugeint) * w.n)
        |           // (2 * cast(tot.sw AS hugeint) * w.n) AS bigint)
        |           AS th16
        |       FROM w, tot, t),
        |c AS (SELECT d.doc_id, d.source,
        |        cast(th.th16 // 65536 AS int) +
        |        CASE WHEN substr(md5(cast(d.doc_id AS varchar) || ':tmixr'),
        |                         1, 4)
        |                  < lpad(lower(hex(th.th16 % 65536)), 4, '0')
        |             THEN 1 ELSE 0 END AS nc
        |      FROM documents d JOIN th ON d.source = th.source)
        |SELECT doc_id, source, unnest(range(0, nc)) AS copy_idx
        |FROM c ORDER BY doc_id, copy_idx""".stripMargin,

    "corpus_mix" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 2.5
        |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 1.0
        |         ELSE 0.25 END AS wt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |    -- DuckDB cast(double AS int) ROUNDS, matching the engine's
        |    -- round(frac * 65536); the 65535 cap mirrors the engine too
        |    cast(floor(wt) AS int) +
        |    CASE WHEN substr(md5(cast(doc_id AS varchar) || ':mix'), 1, 4)
        |              < lpad(lower(hex(least(cast((wt - floor(wt)) * 65536 AS int), 65535))), 4, '0')
        |         THEN 1 ELSE 0 END AS n
        |  FROM w)
        |SELECT doc_id, source, unnest(range(0, n)) AS copy_idx
        |FROM c
        |ORDER BY doc_id, copy_idx""".stripMargin,

    // the oracle IS the naive plan the engine refuses to run: a global
    // running-sum window over (quality DESC, doc_id) — fine at oracle
    // scale, single-task at corpus scale
    "corpus_budget_select" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm,
        |    cast(len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
        |      w -> len(w) > 0)) AS bigint) AS n_tokens
        |  FROM documents),
        |-- the engine's null-drop contract: rows with a null score or
        |-- cost have no place in the greedy order (a null text would
        |-- yield both). Latent here (the fixture has no null text), but
        |-- the oracle must encode the CONTRACT, not the fixture
        |t2 AS (SELECT * FROM t
        |       WHERE doc_id IS NOT NULL AND q_ppm IS NOT NULL
        |         AND n_tokens IS NOT NULL),
        |b AS (SELECT cast(floor(0.25 * sum(n_tokens)) AS bigint) AS budget FROM t2),
        |r AS (SELECT doc_id, q_ppm, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY q_ppm DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t2)
        |SELECT r.doc_id, r.q_ppm, r.n_tokens FROM r, b
        |WHERE r.cum <= b.budget ORDER BY r.doc_id""".stripMargin,

    // DuckDB's own discrete-quantile aggregate over the same cents
    "exact_quantiles" ->
      """WITH v AS (
        |  SELECT cast(round(l_extendedprice * 100) AS bigint) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |q AS (SELECT quantile_disc(c,
        |        [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]) AS vs,
        |      count(*) AS n FROM v)
        |SELECT unnest(cast([0, 250000, 500000, 750000, 900000, 990000,
        |    1000000] AS bigint[])) AS p_ppm,
        |  unnest(vs) AS price_cents, n
        |FROM q ORDER BY p_ppm""".stripMargin,

    // per-group quantile_disc over the same cents
    "exact_quantiles_by_flag" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    cast(round(l_extendedprice * 100) AS bigint) AS c
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
        |q AS (SELECT l_returnflag,
        |        quantile_disc(c, [0.25, 0.5, 0.9, 0.99]) AS vs,
        |        count(*) AS n
        |      FROM v GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  unnest(cast([250000, 500000, 900000, 990000] AS bigint[]))
        |    AS p_ppm,
        |  unnest(vs) AS price_cents, n
        |FROM q ORDER BY l_returnflag, p_ppm""".stripMargin,

    // continuous interpolation at quarter-fraction ps: both engines'
    // interpolation terms are exactly representable, so the doubles
    // hash-compare bit-for-bit
    "exact_quantiles_cont" ->
      """WITH v AS (
        |  SELECT cast(round(l_extendedprice * 100) AS bigint) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |q AS (SELECT quantile_cont(c,
        |        [0.0, 0.25, 0.5, 0.75, 1.0]) AS vs,
        |      count(*) AS n FROM v)
        |SELECT unnest(cast([0, 250000, 500000, 750000, 1000000]
        |    AS bigint[])) AS p_ppm,
        |  unnest(vs) AS price_cents, n
        |FROM q ORDER BY p_ppm""".stripMargin,

    "exact_quantiles_cont_by_flag" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    cast(round(l_extendedprice * 100) AS bigint) AS c
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
        |q AS (SELECT l_returnflag,
        |        quantile_cont(c, [0.25, 0.5, 0.75]) AS vs,
        |        count(*) AS n
        |      FROM v GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  unnest(cast([250000, 500000, 750000] AS bigint[])) AS p_ppm,
        |  unnest(vs) AS price_cents, n
        |FROM q ORDER BY l_returnflag, p_ppm""".stripMargin,

    // the state-folded weighted quantiles must equal the from-scratch
    // cumulative-weight walk over the WHOLE corpus. Oracle-authoring
    // rule (API.md "Oracle discipline"): the rank threshold is PURE
    // INTEGER arithmetic — p as a ppm BIGINT, ceil as (+999999)//1e6
    // over HUGEINT — and the per-p lookup is a range JOIN + min, not a
    // correlated scalar subquery; both choices are what keeps the gate
    // stable across DuckDB versions.
    "weighted_quantiles_incremental" ->
      """WITH t AS (
        |  SELECT cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q,
        |    n_chars AS w
        |  FROM documents),
        |t2 AS (SELECT q, w FROM t WHERE q IS NOT NULL AND w IS NOT NULL),
        |lv AS (SELECT q, sum(w) AS w FROM t2 GROUP BY q HAVING sum(w) > 0),
        |cum AS (SELECT q, sum(w) OVER (ORDER BY q) AS cw FROM lv),
        |tot AS (SELECT cast(sum(w) AS bigint) AS tw FROM lv),
        |ps AS (SELECT cast(unnest([0, 250000, 500000, 750000, 900000,
        |         990000, 1000000]) AS bigint) AS p_ppm),
        |rk AS (SELECT p_ppm, tw,
        |         least(tw, greatest(1, cast(
        |           (cast(tw AS hugeint) * p_ppm + 999999) // 1000000
        |           AS bigint))) AS r
        |       FROM ps CROSS JOIN tot)
        |SELECT rk.p_ppm, min(cum.q) AS q_ppm,
        |  cast(min(rk.tw) AS bigint) AS w_total
        |FROM rk JOIN cum ON cum.cw >= rk.r
        |GROUP BY rk.p_ppm ORDER BY rk.p_ppm""".stripMargin,

    // weighted rank from a cumulative-weight walk: smallest value whose
    // cumulative weight reaches clamp(ceil(W * p_ppm / 1e6), 1, W) —
    // integer-exact on both sides (Refine.quantileValuesPpm mirrors
    // this formula in BigInt)
    "weighted_quantiles" ->
      """WITH t AS (
        |  SELECT cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q,
        |    n_chars AS w
        |  FROM documents),
        |t2 AS (SELECT q, w FROM t WHERE q IS NOT NULL AND w IS NOT NULL),
        |lv AS (SELECT q, sum(w) AS w FROM t2 GROUP BY q HAVING sum(w) > 0),
        |cum AS (SELECT q, sum(w) OVER (ORDER BY q) AS cw FROM lv),
        |tot AS (SELECT cast(sum(w) AS bigint) AS tw FROM lv),
        |ps AS (SELECT cast(unnest([0, 250000, 500000, 750000, 900000,
        |         990000, 1000000]) AS bigint) AS p_ppm),
        |rk AS (SELECT p_ppm, tw,
        |         least(tw, greatest(1, cast(
        |           (cast(tw AS hugeint) * p_ppm + 999999) // 1000000
        |           AS bigint))) AS r
        |       FROM ps CROSS JOIN tot)
        |SELECT rk.p_ppm, min(cum.q) AS q_ppm,
        |  cast(min(rk.tw) AS bigint) AS w_total
        |FROM rk JOIN cum ON cum.cw >= rk.r
        |GROUP BY rk.p_ppm ORDER BY rk.p_ppm""".stripMargin,

    "weighted_quantiles_by_source" ->
      """WITH t AS (
        |  SELECT source,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q,
        |    n_chars AS w
        |  FROM documents),
        |t2 AS (SELECT source, q, w FROM t
        |       WHERE source IS NOT NULL AND q IS NOT NULL AND w IS NOT NULL),
        |lv AS (SELECT source, q, sum(w) AS w FROM t2 GROUP BY source, q
        |       HAVING sum(w) > 0),
        |cum AS (SELECT source, q,
        |          sum(w) OVER (PARTITION BY source ORDER BY q) AS cw
        |        FROM lv),
        |tot AS (SELECT source, cast(sum(w) AS bigint) AS tw FROM lv
        |        GROUP BY source),
        |ps AS (SELECT cast(unnest([250000, 500000, 900000])
        |         AS bigint) AS p_ppm),
        |rk AS (SELECT source, p_ppm, tw,
        |         least(tw, greatest(1, cast(
        |           (cast(tw AS hugeint) * p_ppm + 999999) // 1000000
        |           AS bigint))) AS r
        |       FROM tot CROSS JOIN ps)
        |SELECT rk.source, rk.p_ppm, min(cum.q) AS q_ppm,
        |  cast(min(rk.tw) AS bigint) AS w_total
        |FROM rk JOIN cum ON cum.source = rk.source AND cum.cw >= rk.r
        |GROUP BY rk.source, rk.p_ppm
        |ORDER BY rk.source, rk.p_ppm""".stripMargin,

    // state-folded quantiles must equal the from-scratch scan over the
    // WHOLE corpus (dollar grid — the state convention)
    "exact_quantiles_incremental" ->
      """WITH v AS (
        |  SELECT cast(round(l_extendedprice) AS bigint) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |q AS (SELECT quantile_disc(c,
        |        [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]) AS vs,
        |      count(*) AS n FROM v)
        |SELECT unnest(cast([0, 250000, 500000, 750000, 900000, 990000,
        |    1000000] AS bigint[])) AS p_ppm,
        |  unnest(vs) AS price_usd, n
        |FROM q ORDER BY p_ppm""".stripMargin,

    "exact_quantiles_incremental_by_flag" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    cast(round(l_extendedprice) AS bigint) AS c
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
        |q AS (SELECT l_returnflag,
        |        quantile_disc(c, [0.25, 0.5, 0.9, 0.99]) AS vs,
        |        count(*) AS n
        |      FROM v GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  unnest(cast([250000, 500000, 900000, 990000] AS bigint[]))
        |    AS p_ppm,
        |  unnest(vs) AS price_usd, n
        |FROM q ORDER BY l_returnflag, p_ppm""".stripMargin,

    // both corpus versions' grouped quantiles recomputed from scratch,
    // full-outer-joined on (group, p) — the drift must match per cell
    "profile_drift" ->
      """WITH va AS (
        |  SELECT l_returnflag AS g,
        |    cast(round(l_extendedprice) AS bigint) AS c
        |  FROM lineitem
        |  WHERE l_orderkey % 3 <> 0
        |    AND l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
        |vb AS (
        |  SELECT l_returnflag AS g,
        |    cast(round(l_extendedprice) AS bigint) AS c
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
        |qa AS (SELECT g, quantile_disc(c, [0.25, 0.5, 0.9]) AS vs,
        |         count(*) AS n FROM va GROUP BY g),
        |qb AS (SELECT g, quantile_disc(c, [0.25, 0.5, 0.9]) AS vs,
        |         count(*) AS n FROM vb GROUP BY g),
        |ua AS (SELECT g,
        |         unnest(cast([250000, 500000, 900000] AS bigint[])) AS p,
        |         unnest(vs) AS v, n
        |       FROM qa),
        |ub AS (SELECT g,
        |         unnest(cast([250000, 500000, 900000] AS bigint[])) AS p,
        |         unnest(vs) AS v, n
        |       FROM qb)
        |SELECT coalesce(ua.g, ub.g) AS l_returnflag,
        |  coalesce(ua.p, ub.p) AS p_ppm,
        |  ua.n AS n_a, ua.v AS value_a, ub.n AS n_b, ub.v AS value_b,
        |  ub.v - ua.v AS shift
        |FROM ua FULL OUTER JOIN ub ON ua.g = ub.g AND ua.p = ub.p
        |ORDER BY l_returnflag, p_ppm""".stripMargin,

    // the m-row prefix recomputed from a from-scratch ranking window
    "corpus_top_m" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm
        |  FROM documents),
        |t2 AS (SELECT * FROM t
        |       WHERE doc_id IS NOT NULL AND q_ppm IS NOT NULL),
        |r AS (SELECT doc_id, q_ppm,
        |        row_number() OVER (ORDER BY q_ppm DESC, doc_id) AS rn
        |      FROM t2)
        |SELECT doc_id, q_ppm FROM r WHERE rn <= 1234
        |ORDER BY doc_id""".stripMargin,

    // per-source m-row prefixes from a from-scratch partitioned window
    "corpus_top_m_by_source" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm
        |  FROM documents),
        |t2 AS (SELECT * FROM t
        |       WHERE doc_id IS NOT NULL AND q_ppm IS NOT NULL
        |         AND source IS NOT NULL),
        |m AS (SELECT * FROM (VALUES ('src0', 40), ('src1', 3),
        |        ('src2', 1000000), ('src3', 17), ('src4', 0)) AS v(g, m)),
        |r AS (SELECT doc_id, source, q_ppm,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY q_ppm DESC, doc_id) AS rn
        |      FROM t2)
        |SELECT r.doc_id, r.source, r.q_ppm
        |FROM r JOIN m ON r.source = m.g
        |WHERE r.rn <= m.m
        |ORDER BY r.doc_id""".stripMargin,

    // the same floor map recomputed from a from-scratch global ranking
    // window — integer arithmetic end to end
    "curriculum_bins" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm
        |  FROM documents),
        |-- the engine's null-drop contract: a null id or score has no
        |-- rank (latent in this fixture, but the oracle must encode the
        |-- CONTRACT, not the fixture)
        |t AS (SELECT * FROM t0
        |      WHERE doc_id IS NOT NULL AND q_ppm IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM t),
        |r AS (SELECT doc_id, q_ppm,
        |        row_number() OVER (ORDER BY q_ppm DESC, doc_id) AS rn
        |      FROM t)
        |SELECT r.doc_id, r.q_ppm,
        |  cast((r.rn - 1) * 7 // n.n + 1 AS int) AS bin
        |FROM r, n ORDER BY r.doc_id""".stripMargin,

    // the equal-mass map from a from-scratch running-cost window
    "curriculum_bins_by_cost" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm,
        |    n_chars AS c
        |  FROM documents),
        |t AS (SELECT * FROM t0
        |      WHERE doc_id IS NOT NULL AND q_ppm IS NOT NULL
        |        AND c IS NOT NULL),
        |w AS (SELECT sum(c) AS tw FROM t),
        |r AS (SELECT doc_id,
        |        sum(c) OVER (ORDER BY q_ppm DESC, doc_id) AS cum
        |      FROM t)
        |SELECT r.doc_id,
        |  cast((greatest(r.cum, 1) - 1) * 7 // w.tw + 1 AS int) AS bin
        |FROM r, w ORDER BY r.doc_id""".stripMargin,

    "curriculum_bins_by_cost_by_source" ->
      """WITH t0 AS (
        |  SELECT doc_id, source,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm,
        |    n_chars AS c
        |  FROM documents),
        |t AS (SELECT * FROM t0
        |      WHERE doc_id IS NOT NULL AND source IS NOT NULL
        |        AND q_ppm IS NOT NULL AND c IS NOT NULL),
        |r AS (SELECT doc_id, source,
        |        sum(c) OVER (PARTITION BY source
        |          ORDER BY q_ppm DESC, doc_id) AS cum,
        |        sum(c) OVER (PARTITION BY source) AS tw
        |      FROM t)
        |SELECT doc_id, source,
        |  cast((greatest(cum, 1) - 1) * 4 // tw + 1 AS int) AS bin
        |FROM r ORDER BY doc_id""".stripMargin,

    // the same per-group floor map from a from-scratch partitioned
    // ranking window
    "curriculum_bins_by_source" ->
      """WITH t0 AS (
        |  SELECT doc_id, source,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm
        |  FROM documents),
        |-- null-drop contract, as in curriculum_bins's oracle
        |t AS (SELECT * FROM t0
        |      WHERE doc_id IS NOT NULL AND source IS NOT NULL
        |        AND q_ppm IS NOT NULL),
        |n AS (SELECT source, count(*) AS n FROM t GROUP BY source),
        |r AS (SELECT doc_id, source, q_ppm,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY q_ppm DESC, doc_id) AS rn
        |      FROM t)
        |SELECT r.doc_id, r.source, r.q_ppm,
        |  cast((r.rn - 1) * 4 // n.n + 1 AS int) AS bin
        |FROM r JOIN n USING (source) ORDER BY r.doc_id""".stripMargin,

    // identical greedy prefix recomputed FROM SCRATCH over the whole
    // corpus — the persisted-state fold on the Spark side must land on
    // the same cutoff or the compare fails
    "corpus_budget_incremental" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm,
        |    cast(len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
        |      w -> len(w) > 0)) AS bigint) AS n_tokens
        |  FROM documents),
        |t2 AS (SELECT * FROM t
        |       WHERE doc_id IS NOT NULL AND q_ppm IS NOT NULL
        |         AND n_tokens IS NOT NULL),
        |b AS (SELECT cast(floor(0.25 * sum(n_tokens)) AS bigint) AS budget FROM t2),
        |r AS (SELECT doc_id, q_ppm, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY q_ppm DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t2)
        |SELECT r.doc_id, r.q_ppm, r.n_tokens FROM r, b
        |WHERE r.cum <= b.budget ORDER BY r.doc_id""".stripMargin,

    "corpus_budget_by_source" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm,
        |    cast(len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
        |      w -> len(w) > 0)) AS bigint) AS n_tokens
        |  FROM documents),
        |-- null-drop contract, as in corpus_budget_select's oracle
        |t2 AS (SELECT * FROM t
        |       WHERE doc_id IS NOT NULL AND source IS NOT NULL
        |         AND q_ppm IS NOT NULL AND n_tokens IS NOT NULL),
        |b(source, budget) AS (VALUES ('src0', 800), ('src1', 50),
        |  ('src2', 1000000), ('src3', 400), ('src4', 0), ('src5', 2000)),
        |r AS (SELECT t2.doc_id, t2.source, t2.q_ppm, t2.n_tokens, b.budget,
        |        sum(t2.n_tokens) OVER (PARTITION BY t2.source
        |          ORDER BY t2.q_ppm DESC, t2.doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t2 JOIN b ON t2.source = b.source)
        |SELECT doc_id, source, q_ppm, n_tokens FROM r
        |WHERE cum <= budget ORDER BY doc_id""".stripMargin,

    // identical from-scratch per-group window — the persisted-state
    // fold must land on the same per-domain cutoffs
    "corpus_budget_incremental_by_source" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    cast(round(len(regexp_extract_all(text, '[A-Za-z]'))
        |      / greatest(length(text), 1) * 1000000) AS bigint) AS q_ppm,
        |    cast(len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
        |      w -> len(w) > 0)) AS bigint) AS n_tokens
        |  FROM documents),
        |t2 AS (SELECT * FROM t
        |       WHERE doc_id IS NOT NULL AND source IS NOT NULL
        |         AND q_ppm IS NOT NULL AND n_tokens IS NOT NULL),
        |b(source, budget) AS (VALUES ('src0', 800), ('src1', 50),
        |  ('src2', 1000000), ('src3', 400), ('src4', 0), ('src5', 2000)),
        |r AS (SELECT t2.doc_id, t2.source, t2.q_ppm, t2.n_tokens, b.budget,
        |        sum(t2.n_tokens) OVER (PARTITION BY t2.source
        |          ORDER BY t2.q_ppm DESC, t2.doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t2 JOIN b ON t2.source = b.source)
        |SELECT doc_id, source, q_ppm, n_tokens FROM r
        |WHERE cum <= budget ORDER BY doc_id""".stripMargin,

    "stratified_take" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(cast(doc_id AS varchar)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rk <= 40
        |ORDER BY source, doc_id""".stripMargin,

    // l_quantity is integral in this data, so the double->decimal cast
    // cannot hit the binary-expansion rounding drift (memory: cents rule)
    "profile_table" ->
      """SELECT cast(count(*) AS bigint) AS n_rows,
        |  cast(count(l_orderkey) AS bigint) AS n_orderkey,
        |  cast(count(DISTINCT l_orderkey) AS bigint) AS d_orderkey,
        |  cast(count(DISTINCT l_returnflag) AS bigint) AS d_returnflag,
        |  cast(min(cast(l_quantity AS decimal(12,2))) AS varchar) AS min_qty,
        |  cast(max(cast(l_quantity AS decimal(12,2))) AS varchar) AS max_qty,
        |  cast(sum(l_linenumber) AS bigint) AS sum_linenumber
        |FROM lineitem""".stripMargin,

    "corpus_sample" ->
      """SELECT doc_id, source,
        |  CASE WHEN substr(md5(cast(doc_id AS varchar) || ':split'), 1, 4) < 'e666' THEN 'train'
        |       WHEN substr(md5(cast(doc_id AS varchar) || ':split'), 1, 4) < 'f333' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents
        |WHERE substr(md5(cast(doc_id AS varchar)), 1, 4) < '8000'
        |ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |  count(*) OVER (PARTITION BY md5(text)) AS n_copies
        |FROM documents ORDER BY doc_id""".stripMargin,

    "embed_quantize" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> cast(x AS double)) AS e
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, e,
        |    list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0
        |      AS scale
        |  FROM v)
        |SELECT vec_id,
        |  cast(round(coalesce(scale, 0) * 1000000000) AS bigint) AS scale_ppb,
        |  array_to_string(CASE WHEN scale IS NULL OR scale = 0
        |       THEN list_transform(e, x -> 0)
        |       ELSE list_transform(e, x ->
        |         cast(least(127.0, greatest(-127.0, round(x / scale))) AS int))
        |  END, ',') AS q_csv
        |FROM s ORDER BY vec_id""".stripMargin,

    "dedup_incremental" ->
      """WITH b AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents
        |  WHERE doc_id % 7 = 0),
        |e AS (
        |  SELECT md5(text) AS h, min(doc_id) AS dup_of FROM documents
        |  WHERE doc_id % 3 <> 0 GROUP BY 1)
        |SELECT b.doc_id, e.dup_of,
        |  cast(e.dup_of IS NULL AS int) AS is_new
        |FROM b LEFT JOIN e ON md5(b.text) IS NOT DISTINCT FROM e.h
        |ORDER BY b.doc_id""".stripMargin,

    // raw-whitespace tokenization (NOT the normalized stream): mirrors
    // TextOps.tokens(text) = split on \s+, empties dropped
    "pipeline_metrics" ->
      """SELECT cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(len(list_filter(string_split_regex(text, '\s+'),
        |    w -> len(w) > 0))) AS bigint) AS total_tokens,
        |  max(doc_id) AS max_doc_id
        |FROM documents""".stripMargin,

    // bloom prefilter + exact join ≡ exact incremental dedup
    "dedup_incremental_bloom" ->
      """WITH b AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents
        |  WHERE doc_id % 7 = 0),
        |e AS (
        |  SELECT md5(text) AS h, min(doc_id) AS dup_of FROM documents
        |  WHERE doc_id % 3 <> 0 GROUP BY 1)
        |SELECT b.doc_id, e.dup_of,
        |  cast(e.dup_of IS NULL AS int) AS is_new
        |FROM b LEFT JOIN e ON md5(b.text) IS NOT DISTINCT FROM e.h
        |ORDER BY b.doc_id""".stripMargin,

    // linear-idf keyword extraction: the score is two correctly-rounded
    // IEEE ops over exact integers — reproduces bit-identically here
    "doc_keywords" ->
      s"""WITH $toksCte,
         |t AS (SELECT doc_id, unnest(l) AS token FROM toks),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |s AS (
         |  SELECT tf.doc_id, tf.token,
         |    cast(round(tf.tf * n.n / df.df * 1000000) AS bigint) AS score_ppm
         |  FROM tf JOIN df USING (token) CROSS JOIN n),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score_ppm DESC, token) AS rnk
         |  FROM s)
         |SELECT doc_id, rnk, token, score_ppm FROM r
         |WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin,

    // 5-gram benchmark-overlap check over the same normalized token
    // stream as the dedup oracles; docs shorter than the window shingle
    // to their whole text, so short exact copies are still caught
    "decontaminate" ->
      s"""WITH $toksCte,
         |gl AS (
         |  SELECT doc_id, list_distinct(CASE
         |    WHEN len(l) < 5 THEN [array_to_string(l, '_')]
         |    ELSE list_transform(range(1, len(l) - 3),
         |      i -> l[i] || '_' || l[i+1] || '_' || l[i+2] || '_' ||
         |           l[i+3] || '_' || l[i+4]) END) AS gs
         |  FROM toks),
         |g5 AS (SELECT doc_id, unnest(gs) AS g FROM gl),
         |bench AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 17 = 0),
         |hits AS (
         |  SELECT doc_id, count(*) AS n_hits FROM g5 JOIN bench USING (g)
         |  WHERE doc_id % 17 <> 0 GROUP BY doc_id)
         |SELECT gl.doc_id, len(gs) AS n_grams,
         |  coalesce(h.n_hits, 0) AS n_hits,
         |  cast(coalesce(h.n_hits, 0) >= 1 AS int) AS contaminated
         |FROM gl LEFT JOIN hits h USING (doc_id)
         |WHERE gl.doc_id % 17 <> 0
         |ORDER BY gl.doc_id""".stripMargin,

    // bloom prefilter + exact verify ≡ exact decontamination, so the
    // bloom path is held to the SAME oracle
    "decontaminate_bloom" ->
      s"""WITH $toksCte,
         |gl AS (
         |  SELECT doc_id, list_distinct(CASE
         |    WHEN len(l) < 5 THEN [array_to_string(l, '_')]
         |    ELSE list_transform(range(1, len(l) - 3),
         |      i -> l[i] || '_' || l[i+1] || '_' || l[i+2] || '_' ||
         |           l[i+3] || '_' || l[i+4]) END) AS gs
         |  FROM toks),
         |g5 AS (SELECT doc_id, unnest(gs) AS g FROM gl),
         |bench AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 17 = 0),
         |hits AS (
         |  SELECT doc_id, count(*) AS n_hits FROM g5 JOIN bench USING (g)
         |  WHERE doc_id % 17 <> 0 GROUP BY doc_id)
         |SELECT gl.doc_id, len(gs) AS n_grams,
         |  coalesce(h.n_hits, 0) AS n_hits,
         |  cast(coalesce(h.n_hits, 0) >= 1 AS int) AS contaminated
         |FROM gl LEFT JOIN hits h USING (doc_id)
         |WHERE gl.doc_id % 17 <> 0
         |ORDER BY gl.doc_id""".stripMargin,

    "range_join" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  p.event_id AS prior_id
        |FROM events e JOIN events p
        |  ON e.user_id = p.user_id
        | AND epoch_us(p.ts)
        |     BETWEEN epoch_us(e.ts) - 3600000000 AND epoch_us(e.ts) - 1
        |ORDER BY e.event_id, prior_id""".stripMargin,

    "vocab_topk" ->
      s"""WITH $toksCte,
         |t AS (SELECT doc_id, unnest(l) AS token FROM toks),
         |g AS (SELECT token, doc_id, count(*) AS c FROM t GROUP BY 1, 2),
         |v AS (SELECT token, cast(sum(c) AS bigint) AS tf,
         |        count(*) AS df FROM g GROUP BY 1)
         |SELECT token, tf, df FROM v
         |ORDER BY tf DESC, token LIMIT 100""".stripMargin,

    "text_repetition" ->
      s"""WITH $toksCte,
         |r AS (
         |  SELECT doc_id, len(l) AS n_tokens,
         |    CASE WHEN len(l) < 2 THEN 1 ELSE len(l) - 1 END AS t2,
         |    len(list_distinct(CASE
         |      WHEN len(l) < 2 THEN [array_to_string(l, '_')]
         |      ELSE list_transform(range(1, len(l)),
         |        i -> l[i] || '_' || l[i+1]) END)) AS d2,
         |    CASE WHEN len(l) < 3 THEN 1 ELSE len(l) - 2 END AS t3,
         |    len(list_distinct(CASE
         |      WHEN len(l) < 3 THEN [array_to_string(l, '_')]
         |      ELSE list_transform(range(1, len(l) - 1),
         |        i -> l[i] || '_' || l[i+1] || '_' || l[i+2]) END)) AS d3
         |  FROM toks)
         |SELECT doc_id, n_tokens,
         |  cast(round((1 - d2 / cast(t2 AS double)) * 1000000) AS bigint) AS dup2_ppm,
         |  cast(round((1 - d3 / cast(t3 AS double)) * 1000000) AS bigint) AS dup3_ppm
         |FROM r ORDER BY doc_id""".stripMargin,

    // strip Cc (except tab/newline/cr) and zero-width code points, THEN
    // NFC-compose — mirrors TextKernels.nfcClean exactly (strip-first is
    // what makes the kernel idempotent; see its scaladoc)
    "text_nfc_clean" ->
      s"""WITH src AS (
        |  SELECT id, text, regexp_replace(text,
        |    '[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}-\\x{9F}\\x{200B}-\\x{200D}\\x{FEFF}]',
        |    '', 'g') AS st
        |  FROM read_csv('${graft.Fixtures.dir}/unicode.csv', delim='|',
        |    header=false, quote='',
        |    columns={'id':'INTEGER','text':'VARCHAR'})),
        |cleaned AS (
        |  SELECT id, text, nfc_normalize(st) AS clean
        |  FROM src)
        |SELECT id, clean, length(text) AS n_in, length(clean) AS n_out
        |FROM cleaned ORDER BY id""".stripMargin,

    // self-contained mirror of the composed stages (the per-stage CTEs
    // above run over `documents` directly, so they are restated here over
    // the NFC-cleaned, filtered frames; formulas identical to the
    // text_nfc_clean / dedup_exact / decontaminate / chunk_tokens /
    // pack_examples oracles)
    "training_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id, lang, nfc_normalize(regexp_replace(text,
        |    '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}-\x{9F}\x{200B}-\x{200D}\x{FEFF}]',
        |    '', 'g')) AS text
        |  FROM documents),
        |tr AS (SELECT * FROM d WHERE doc_id % 17 <> 0),
        |surv AS (
        |  SELECT doc_id, lang, text FROM (
        |    SELECT doc_id, lang, text,
        |      min(doc_id) OVER (PARTITION BY md5(text)) AS canon
        |    FROM tr) WHERE doc_id = canon),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(
        |      trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
        |                          '\s+', ' ', 'g')), '\s+'),
        |      w -> len(w) > 0) AS l
        |  FROM d),
        |gl AS (
        |  SELECT doc_id, list_distinct(CASE
        |    WHEN len(l) < 5 THEN [array_to_string(l, '_')]
        |    ELSE list_transform(range(1, len(l) - 3),
        |      i -> l[i] || '_' || l[i+1] || '_' || l[i+2] || '_' ||
        |           l[i+3] || '_' || l[i+4]) END) AS gs
        |  FROM toks),
        |g5 AS (SELECT doc_id, unnest(gs) AS g FROM gl),
        |bench AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 17 = 0),
        |contaminated AS (
        |  SELECT DISTINCT g5.doc_id FROM g5 JOIN bench USING (g)
        |  WHERE g5.doc_id % 17 <> 0),
        |kept AS (
        |  SELECT s.doc_id, s.lang, s.text FROM surv s
        |  WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |t AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
        |                w -> len(w) > 0) AS l
        |  FROM kept),
        |c AS (
        |  SELECT doc_id, lang,
        |    unnest(range(1, 1 + 64 * cast(ceil(greatest(len(l) - 64, 0) / 64.0) AS int) + 1, 64)) AS s, l
        |  FROM t),
        |ch AS (
        |  SELECT doc_id, lang, cast((s - 1) // 64 AS int) AS chunk_idx,
        |         len(l[s:s+63]) AS n_tokens
        |  FROM c),
        |b AS (
        |  SELECT lang, n_tokens,
        |    cast(floor(coalesce(sum(n_tokens) OVER (
        |      PARTITION BY lang ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256)
        |      AS bigint) AS bin_id
        |  FROM ch)
        |SELECT lang, bin_id, count(*) AS n_chunks,
        |       cast(sum(n_tokens) AS bigint) AS total_tokens
        |FROM b GROUP BY lang, bin_id ORDER BY lang, bin_id""".stripMargin,

    // the full-composition replay: crawl selection (mn → gopher →
    // md5-model → per-host cap), span coverage over the SELECTED
    // corpus, exact dedup, bench 5-gram decontamination, content-keyed
    // split, and running-sum bin packing — each block verbatim from
    // the single-stage oracle it chains (crawl_pipeline /
    // text_dup_remove / training_pipeline / corpus_sample)
    "corpus_build_pipeline" -> corpusBuildOracle("", ""),

    // the same replay over ONLY the never-before-seen docs of the
    // second crawl batch (month 2's novelty = the ftp third, restated
    // arithmetically: batch 0 folded every %3!=2 URL, and the fixture
    // URL formulas make each %3==2 URL distinct from everything in
    // state), plus the two fold-annotation counts the gate cross-joins
    "corpus_build_incremental" -> corpusBuildOracle(
      "WHERE doc_id % 3 = 2",
      "," +
        " (SELECT cast(count(*) AS bigint) FROM documents" +
        " WHERE doc_id % 3 <> 2) AS n_seen," +
        " (SELECT cast(count(*) AS bigint) FROM documents" +
        " WHERE doc_id % 3 = 2) AS n_new"),

    // the rebuild-from-archive chain replayed from synthesis: the same
    // build template over exactly the re-curated third — index
    // selection + span fetch + re-extraction must be invisible next to
    // building from the equivalent crawl subset
    "corpus_rebuild_archive" -> corpusBuildOracle(
      "WHERE doc_id % 3 = 1", ""),

    "corpus_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, md5(cast(doc_id AS varchar) || ':shuffle') AS key
        |  FROM documents)
        |SELECT doc_id,
        |  cast(('0x' || substr(key, 1, 15)) AS bigint) % 8 AS shard,
        |  row_number() OVER (
        |    PARTITION BY cast(('0x' || substr(key, 1, 15)) AS bigint) % 8
        |    ORDER BY key, doc_id) AS pos
        |FROM k ORDER BY doc_id""".stripMargin,

    // inverted-index n-gram Jaccard over the RARE-shingle space (shingles
    // hotter than maxDf are dropped from intersection AND union) —
    // mirrors the engine algorithm; CTE chain shared with dedup_clusters
    "dedup_ngram" ->
      s"""WITH $ngramPairCtes
         |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM njpairs
         |ORDER BY id_a, id_b""".stripMargin,

    "window_topk_group" ->
      """SELECT c_mktsegment, rn, o_orderkey,
        |  cast(round(o_totalprice * 100) AS bigint) AS price_cents
        |FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "asof_join" -> asofJoinSql,
    // identical answer demanded of the chunked carry plan
    "asof_join_chunked" -> asofJoinSql,

    "sessionize" -> sessionizeSql,
    // identical answer demanded of the chunked plan — the whole point
    // of the variant is that chunking is invisible in the output
    "sessionize_chunked" -> sessionizeSql,

    "corpus_stats" ->
      """WITH t AS (
        |  SELECT lang,
        |    len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> len(w) > 0)) AS n_tokens
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, cast(sum(n_tokens) AS bigint) AS total_tokens,
        |  round(quantile_cont(n_tokens, 0.5), 4) AS median_tokens,
        |  round(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "ann_topk" -> annBruteTopkSql,

    "text_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> len(w) > 0)) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]')) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'), w -> len(w) > 0) AS lt,
        |    list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> len(w) > 0) AS ot,
        |    text FROM documents)
        |SELECT doc_id,
        |  len(list_filter(lt, w -> list_contains(
        |    ['the','a','of','and','to','in','is','that','it','for',
        |     'on','was','as','with','be','by','at','this','are','or'], w)))
        |    / greatest(len(lt), 1) AS stopword_ratio,
        |  len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) AS alpha_ratio,
        |  list_sum(list_transform(ot, w -> cast(len(w) AS bigint)))
        |    / cast(greatest(len(ot), 1) AS double) AS mean_token_len
        |FROM t ORDER BY doc_id""".stripMargin,

    // mirrors TextOps.langId exactly: per-language stopword hit counts,
    // argmax with lexicographically-last tie-break, CJK ratio override
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'), w -> len(w) > 0) AS lt
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, u.lang AS lang,
        |    len(list_filter(lt, w -> list_contains(u.words, w))) AS score
        |  FROM t, unnest([
        |    {'lang': 'en', 'words': ['the','a','of','and','to','in','is','that','it','for','on','was','as','with','be','by','at','this','are','or']},
        |    {'lang': 'de', 'words': ['der','die','das','und','ist','nicht','ein','zu','mit','den','von','für','auf','im','sich']},
        |    {'lang': 'es', 'words': ['el','la','de','que','y','en','un','ser','se','no','por','con','para','los','una']},
        |    {'lang': 'fr', 'words': ['le','la','de','et','un','que','pour','dans','ce','pas','au','sur','les','des','est']}
        |  ]) AS x(u)),
        |best AS (
        |  SELECT doc_id, lang, score FROM scored
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) = 1),
        |cjk AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]'))
        |      / greatest(length(text), 1) AS r
        |  FROM documents)
        |SELECT b.doc_id,
        |  CASE WHEN c.r > 0.2 THEN 'cjk'
        |       WHEN b.score > 0 THEN b.lang
        |       ELSE 'und' END AS lang_pred
        |FROM best b JOIN cjk c ON b.doc_id = c.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "events_window" ->
      """SELECT date_trunc('hour', cast(ts AS timestamp)) AS window_start,
        |  event_type, count(*) AS n,
        |  cast(sum(cast(value AS decimal(18,4))) AS double) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "curation_pipeline" ->
      """WITH survivors AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |      min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
        |    FROM documents)
        |  WHERE doc_id = canonical_id),
        |stats AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> len(w) > 0)) AS n_tokens,
        |    len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'), w -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for',
        |       'on','was','as','with','be','by','at','this','are','or'], w)))
        |      / greatest(len(list_filter(string_split_regex(lower(text), '[ \t\n\x0b\f\r]+'),
        |                                 w -> len(w) > 0)), 1) AS stopword_ratio,
        |    len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) AS alpha_ratio,
        |    list_sum(list_transform(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
        |                                        w -> len(w) > 0),
        |                            w -> cast(len(w) AS bigint)))
        |      / cast(greatest(len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
        |                                      w -> len(w) > 0)), 1) AS double)
        |      AS mean_token_len
        |  FROM survivors)
        |SELECT doc_id, n_tokens, stopword_ratio, mean_token_len
        |FROM stats WHERE alpha_ratio > 0.5 AND n_tokens >= 30
        |ORDER BY doc_id""".stripMargin,

    "chunk_tokens" ->
      s"""WITH $chunkCtes
        |SELECT doc_id, cast((s - 1) // 64 AS int) AS chunk_idx,
        |  len(l[s:s+63]) AS chunk_len,
        |  array_to_string(l[s:s+63], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, 'image/' || source AS modality,
        |  octet_length(cast(text AS blob)) AS n_bytes,
        |  md5(text) AS checksum,
        |  lang AS meta_lang
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the decoded units are re-assembled from the SOURCE columns: WAV
    // 16-bit LE signed samples from consecutive hex-pair bytes of the
    // text blob (lo byte first; a trailing odd byte is ignored, and the
    // RIFF pad byte is outside the data chunk); BMP pixel bytes from
    // the builder's linear fill over (row, pos) with the 4-byte-aligned
    // stride — padding positions excluded, exactly what the decoder
    // must skip. All stats integer-exact, so the hash compare is free
    // of fp concerns.
    "multimodal_features" ->
      """WITH wav AS (
        |  SELECT doc_id, lower(hex(cast(text AS blob))) AS hx,
        |    coalesce(octet_length(cast(text AS blob)), 0) AS nb
        |  FROM documents WHERE doc_id % 2 = 0),
        |ws AS (SELECT doc_id, hx, unnest(range(nb // 2)) AS i FROM wav),
        |wv AS (
        |  SELECT doc_id,
        |    (16 * (instr('0123456789abcdef',
        |             substr(hx, cast(4*i+1 AS int), 1)) - 1)
        |       + instr('0123456789abcdef',
        |             substr(hx, cast(4*i+2 AS int), 1)) - 1)
        |    + 256 * (16 * (instr('0123456789abcdef',
        |             substr(hx, cast(4*i+3 AS int), 1)) - 1)
        |       + instr('0123456789abcdef',
        |             substr(hx, cast(4*i+4 AS int), 1)) - 1) AS u
        |  FROM ws),
        |wsv AS (SELECT doc_id,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v FROM wv),
        |wagg AS (SELECT doc_id, count(*) AS n, sum(v) AS s,
        |    min(v) AS mn, max(v) AS mx FROM wsv GROUP BY doc_id),
        |wout AS (
        |  SELECT w.doc_id, 'audio/wav' AS modality,
        |    cast(44 + nb + nb % 2 AS bigint) AS n_bytes,
        |    cast(coalesce(a.n, 0) AS bigint) AS n_units,
        |    cast(coalesce(a.s, 0) AS bigint) AS unit_sum,
        |    cast(coalesce(a.mn, 0) AS bigint) AS unit_min,
        |    cast(coalesce(a.mx, 0) AS bigint) AS unit_max
        |  FROM wav w LEFT JOIN wagg a USING (doc_id)),
        |bmp AS (
        |  SELECT doc_id, 1 + n_chars % 64 AS w, 1 + doc_id % 48 AS h
        |  FROM documents WHERE doc_id % 2 = 1),
        |b1 AS (SELECT doc_id, w, h, ((3 * w + 3) // 4) * 4 AS stride
        |  FROM bmp),
        |br AS (SELECT doc_id, w, h, stride, unnest(range(h)) AS r FROM b1),
        |bp AS (SELECT doc_id, h, stride, r, unnest(range(3 * w)) AS p
        |  FROM br),
        |bv AS (SELECT doc_id, h, stride,
        |    ((r * stride + p) * 31 + doc_id * 7) % 256 AS v FROM bp),
        |bout AS (
        |  SELECT doc_id, 'image/bmp' AS modality,
        |    cast(54 + stride * h AS bigint) AS n_bytes,
        |    cast(count(*) AS bigint) AS n_units,
        |    cast(sum(v) AS bigint) AS unit_sum,
        |    cast(min(v) AS bigint) AS unit_min,
        |    cast(max(v) AS bigint) AS unit_max
        |  FROM bv GROUP BY doc_id, stride, h)
        |SELECT * FROM wout UNION ALL SELECT * FROM bout
        |ORDER BY doc_id""".stripMargin,

    // frame checksums hash the lowercase-hex rendering of the byte slice
    // (arbitrary slices aren't valid UTF-8, so hex is the string-safe
    // injective encoding both engines can md5 — Multimodal.md5OfHex)
    // every sampled frame's decoded RGB statistics recomputed from the
    // gray fill formula: n_units = 3*w*h (three channels), sums/extrema
    // over ((id*31 + f*17 + k*7) % 6) * 51 tripled per pixel
    "multimodal_gif_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents),
        |fr AS (SELECT doc_id, w, h, nf, unnest(range(0, nf, 2)) AS f
        |       FROM g),
        |px AS (SELECT doc_id, f, nf, w, h, unnest(range(w * h)) AS k
        |       FROM fr),
        |v AS (SELECT doc_id, f, nf,
        |        ((doc_id * 31 + f * 17 + k * 7) % 6) * 51 AS v
        |      FROM px)
        |SELECT doc_id, cast(f AS int) AS frame_idx,
        |  cast(nf AS int) AS n_frames,
        |  cast(count(*) * 3 AS bigint) AS n_units,
        |  cast(sum(v) * 3 AS bigint) AS unit_sum,
        |  cast(min(v) AS int) AS unit_min, cast(max(v) AS int) AS unit_max
        |FROM v GROUP BY doc_id, f, nf
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // the video sibling: identical fill arithmetic over the AVI
    // dimensions (w = 6+id%5, h = 5+id%4), every sampled frame's stats
    // from the formula — RGB units are 3× the gray pixel count
    "multimodal_video_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 6 + doc_id % 5 AS w, 5 + doc_id % 4 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents),
        |fr AS (SELECT doc_id, w, h, nf, unnest(range(0, nf, 2)) AS f
        |       FROM g),
        |px AS (SELECT doc_id, f, nf, w, h, unnest(range(w * h)) AS k
        |       FROM fr),
        |v AS (SELECT doc_id, f, nf,
        |        ((doc_id * 31 + f * 17 + k * 7) % 6) * 51 AS v
        |      FROM px)
        |SELECT doc_id, cast(f AS int) AS frame_idx,
        |  cast(nf AS int) AS n_frames,
        |  cast(count(*) * 3 AS bigint) AS n_units,
        |  cast(sum(v) * 3 AS bigint) AS unit_sum,
        |  cast(min(v) AS int) AS unit_min, cast(max(v) AS int) AS unit_max
        |FROM v GROUP BY doc_id, f, nf
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // every field the RIFF walk parses, recomputed from the builder
    // arithmetic: movi bytes = frames × (8-byte chunk header + 4-byte-
    // aligned stride × height), duration = 40000 µs/frame → 40·nf ms
    "multimodal_video_containers" ->
      """WITH g AS (
        |  SELECT doc_id, 6 + doc_id % 5 AS w, 5 + doc_id % 4 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents)
        |SELECT doc_id, 'avi' AS format,
        |  cast(nf * (8 + ((3 * w + 3) // 4) * 4 * h) AS bigint)
        |    AS data_bytes,
        |  cast(40 * nf AS bigint) AS duration_ms,
        |  cast(w AS int) AS width, cast(h AS int) AS height,
        |  cast(24 AS int) AS bpp
        |FROM g ORDER BY doc_id""".stripMargin,

    // the golden twin's closed form: doc_id=3's 7x6 2-frame fill
    // recomputed from the formula, plus the encoder's pinned md5 (the
    // same constant ImagesSpec pins as GOLDEN_GIF_MD5)
    "multimodal_gif_golden" ->
      """WITH fr AS (SELECT unnest(range(2)) AS f),
        |px AS (SELECT f, unnest(range(42)) AS k FROM fr),
        |v AS (SELECT f, ((93 + f * 17 + k * 7) % 6) * 51 AS v FROM px)
        |SELECT cast(3 AS bigint) AS doc_id, cast(f AS int) AS frame_idx,
        |  cast(2 AS int) AS n_frames,
        |  cast(count(*) * 3 AS bigint) AS n_units,
        |  cast(sum(v) * 3 AS bigint) AS unit_sum,
        |  cast(min(v) AS int) AS unit_min, cast(max(v) AS int) AS unit_max,
        |  '9b064859bab041e8ffad796eaa8fb1b5' AS payload_md5
        |FROM v GROUP BY f ORDER BY frame_idx""".stripMargin,

    "multimodal_frames" ->
      """WITH h AS (
        |  SELECT doc_id, octet_length(cast(text AS blob)) AS n_b,
        |    lower(hex(cast(text AS blob))) AS hx
        |  FROM documents
        |  WHERE octet_length(cast(text AS blob)) > 0)
        |SELECT doc_id, cast(i AS int) AS frame_idx,
        |  cast(least(16, n_b - (i * n_b) // 4) AS int) AS n_bytes,
        |  md5(substr(hx, cast((i * n_b) // 4 * 2 + 1 AS int),
        |    cast(least(16, n_b - (i * n_b) // 4) * 2 AS int))) AS checksum
        |FROM h, range(4) t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // every field the Spark side PARSES out of real WAV/BMP header
    // bytes, recomputed from the source columns the builder encoded
    // them from (wav data bytes = UTF-8 text bytes; bmp pixel bytes =
    // 4-byte-aligned stride × height; duration = bytes*1000 / byteRate,
    // both engines on integer floor division)
    // MP3/MP4 facts recomputed from the synthesis arithmetic: Layer III
    // frame length 144·br·1000//rate (no padding), duration from
    // frames·1152 samples at the frame rate; BMFF duration from
    // mvhd duration·1000//timescale, first-track 16.16 dimensions
    "multimodal_av_containers" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    ([44100, 48000, 32000])[cast(doc_id % 3 AS int) + 1] AS rate,
        |    ([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        |      320])[cast((doc_id // 2) % 14 AS int) + 1] AS br,
        |    -- Xing/Info-tagged docs (tagmod 0/1) spend frame 0 on the
        |    -- metadata header: one fewer MUSIC frame than built
        |    2 + doc_id % 6
        |      - CASE WHEN (doc_id // 2) % 3 <= 1 THEN 1 ELSE 0 END
        |      AS frames,
        |    (doc_id // 2) % 3 = 0 AS is_vbr,
        |    1 + (doc_id // 2) % 2 AS ch,
        |    600 * (1 + doc_id % 5) AS ts,
        |    (doc_id * 137) % 100000 AS dur
        |  FROM documents)
        |SELECT doc_id, 'mp3' AS format,
        |  cast(ch AS int) AS channels,
        |  cast(rate AS int) AS sample_rate,
        |  cast(frames * ((144 * br * 1000) // rate) AS bigint) AS data_bytes,
        |  cast((frames * 1152 * 1000) // rate AS bigint) AS duration_ms,
        |  cast(NULL AS int) AS width, cast(NULL AS int) AS height,
        |  is_vbr AS vbr
        |FROM p WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, 'mp4', NULL, NULL,
        |  cast(doc_id % 50 AS bigint),
        |  cast((dur * 1000) // ts AS bigint),
        |  cast(16 + doc_id % 7 AS int), cast(9 + doc_id % 5 AS int),
        |  cast(NULL AS boolean)
        |FROM p WHERE doc_id % 2 = 1
        |ORDER BY doc_id""".stripMargin,

    "multimodal_containers" ->
      """SELECT doc_id, 'wav' AS format,
        |  cast(1 + (doc_id // 2) % 2 AS int) AS channels,
        |  cast(8000 + (doc_id % 5) * 1000 AS int) AS sample_rate,
        |  cast(16 AS int) AS bits,
        |  cast(coalesce(strlen(text), 0) AS bigint) AS data_bytes,
        |  cast(coalesce(strlen(text), 0) * 1000 //
        |    ((8000 + (doc_id % 5) * 1000) * (1 + (doc_id // 2) % 2) * 2)
        |    AS bigint) AS duration_ms,
        |  cast(NULL AS int) AS width, cast(NULL AS int) AS height,
        |  cast(NULL AS int) AS bpp, cast(NULL AS boolean) AS vbr
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, 'bmp', NULL, NULL, NULL,
        |  cast((((24 * (1 + n_chars % 64)) + 31) // 32) * 4
        |    * (1 + doc_id % 48) AS bigint),
        |  NULL,
        |  cast(1 + n_chars % 64 AS int), cast(1 + doc_id % 48 AS int),
        |  cast(24 AS int), cast(NULL AS boolean)
        |FROM documents WHERE doc_id % 2 = 1
        |ORDER BY doc_id""".stripMargin,

    // decoded compressed-image stats recomputed WITHOUT decoding: PNG
    // stats from the lossless fill formula over the flat channel index,
    // JPEG stats closed-form from the exact uniform-even-gray
    // round-trip (ImagesSpec pins that decode invariant)
    "multimodal_image_decode" ->
      """WITH png AS (
        |  SELECT doc_id, 1 + n_chars % 16 AS w, 1 + doc_id % 12 AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |pv AS (SELECT doc_id, w, h, unnest(range(3 * w * h)) AS k FROM png),
        |pa AS (SELECT doc_id, count(*) AS n,
        |    sum((k * 31 + doc_id * 7) % 256) AS s,
        |    min((k * 31 + doc_id * 7) % 256) AS mn,
        |    max((k * 31 + doc_id * 7) % 256) AS mx
        |  FROM pv GROUP BY doc_id),
        |pout AS (
        |  SELECT p.doc_id, 'png' AS format,
        |    cast(w AS int) AS width, cast(h AS int) AS height,
        |    cast(a.n AS bigint) AS n_units,
        |    cast(a.s AS bigint) AS unit_sum,
        |    cast(a.mn AS bigint) AS unit_min,
        |    cast(a.mx AS bigint) AS unit_max
        |  FROM png p JOIN pa a USING (doc_id)),
        |jp AS (
        |  SELECT doc_id, 1 + n_chars % 24 AS w, 1 + doc_id % 16 AS h,
        |    28 + 2 * ((doc_id * 13) % 100) AS g
        |  FROM documents WHERE doc_id % 2 = 1),
        |jout AS (
        |  SELECT doc_id, 'jpeg' AS format,
        |    cast(w AS int) AS width, cast(h AS int) AS height,
        |    cast(3 * w * h AS bigint) AS n_units,
        |    cast(3 * w * h * g AS bigint) AS unit_sum,
        |    cast(g AS bigint) AS unit_min, cast(g AS bigint) AS unit_max
        |  FROM jp)
        |SELECT * FROM pout UNION ALL SELECT * FROM jout
        |ORDER BY doc_id""".stripMargin,

    // PCM features recomputed from the text's hex bytes: the same
    // signed-sample re-assembly as multimodal_features, then Σ v²,
    // lag-window sign-change count, and max |v|
    "multimodal_audio_features" ->
      """WITH wav AS (
        |  SELECT doc_id, lower(hex(cast(text AS blob))) AS hx,
        |    coalesce(octet_length(cast(text AS blob)), 0) AS nb
        |  FROM documents WHERE doc_id % 2 = 0),
        |ws AS (SELECT doc_id, hx, unnest(range(nb // 2)) AS i FROM wav),
        |wv AS (
        |  SELECT doc_id, i,
        |    (16 * (instr('0123456789abcdef',
        |             substr(hx, cast(4*i+1 AS int), 1)) - 1)
        |       + instr('0123456789abcdef',
        |             substr(hx, cast(4*i+2 AS int), 1)) - 1)
        |    + 256 * (16 * (instr('0123456789abcdef',
        |             substr(hx, cast(4*i+3 AS int), 1)) - 1)
        |       + instr('0123456789abcdef',
        |             substr(hx, cast(4*i+4 AS int), 1)) - 1) AS u
        |  FROM ws),
        |wsv AS (SELECT doc_id, i,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v FROM wv),
        |wz AS (SELECT doc_id, i, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM wsv),
        |agg AS (
        |  SELECT doc_id, count(*) AS n, sum(v * v) AS e,
        |    sum(CASE WHEN pv IS NOT NULL
        |        AND (v >= 0) != (pv >= 0) THEN 1 ELSE 0 END) AS z,
        |    max(abs(v)) AS p
        |  FROM wz GROUP BY doc_id)
        |SELECT w.doc_id,
        |  cast(coalesce(a.n, 0) AS bigint) AS n_samples,
        |  cast(coalesce(a.e, 0) AS bigint) AS energy,
        |  cast(coalesce(a.z, 0) AS bigint) AS zero_crossings,
        |  cast(coalesce(a.p, 0) AS bigint) AS peak
        |FROM wav w LEFT JOIN agg a USING (doc_id)
        |ORDER BY w.doc_id""".stripMargin,

    // nearest-neighbor resize recomputed from the source fill formula:
    // output channel k of the (dw, dh) image maps to source pixel
    // (floor(x*w/dw), floor(y*h/dh)) — all integer math
    "multimodal_resize" ->
      """WITH png AS (
        |  SELECT doc_id, 1 + n_chars % 16 AS w, 1 + doc_id % 12 AS h,
        |    1 + (1 + n_chars % 16) // 2 AS dw,
        |    1 + (1 + doc_id % 12) // 2 AS dh
        |  FROM documents WHERE doc_id % 2 = 0),
        |k AS (SELECT doc_id, w, h, dw, dh,
        |    unnest(range(3 * dw * dh)) AS k FROM png),
        |v AS (SELECT doc_id, dw, dh,
        |    ((3 * (((k // (3 * dw)) * h // dh) * w
        |        + (((k // 3) % dw) * w // dw)) + k % 3) * 31
        |      + doc_id * 7) % 256 AS v
        |  FROM k),
        |a AS (SELECT doc_id, count(*) AS n, sum(v) AS s,
        |    min(v) AS mn, max(v) AS mx FROM v GROUP BY doc_id)
        |SELECT p.doc_id, cast(p.dw AS int) AS width,
        |  cast(p.dh AS int) AS height,
        |  cast(a.n AS bigint) AS n_units, cast(a.s AS bigint) AS unit_sum,
        |  cast(a.mn AS bigint) AS unit_min, cast(a.mx AS bigint) AS unit_max
        |FROM png p JOIN a USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,

    // unigram LM with add-one smoothing, all-integer arithmetic (the
    // scaled division and the sums are exact, so the hash compare is
    // immune to libm and reduction-order differences)
    "text_lm_score" ->
      s"""WITH $toksCte,
         |t AS (SELECT doc_id, unnest(l) AS token FROM toks),
         |c AS (SELECT token, count(*) AS c FROM t GROUP BY token),
         |nv AS (SELECT sum(c) AS n_corpus, count(*) AS v_size FROM c),
         |sc AS (
         |  SELECT t.doc_id,
         |    (c.c + 1) * 1000000 // (nv.n_corpus + nv.v_size) AS tok_ppm,
         |    CASE WHEN c.c < 2 THEN 1 ELSE 0 END AS is_rare
         |  FROM t JOIN c USING (token), nv)
         |SELECT doc_id, cast(count(*) AS bigint) AS n_tokens,
         |  cast(sum(is_rare) AS bigint) AS rare_tokens,
         |  cast(sum(tok_ppm) // count(*) AS bigint) AS mean_tok_ppm
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "bpe_pairs" ->
      s"""WITH $toksCte,
         |wt AS (SELECT unnest(l) AS w FROM toks),
         |p AS (
         |  SELECT substr(w, cast(i AS int), 2) AS pair
         |  FROM (SELECT w, unnest(range(1, len(w))) AS i
         |        FROM wt WHERE len(w) >= 2))
         |SELECT pair, cast(count(*) AS bigint) AS n
         |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 100""".stripMargin,

    // zero merges = code-point split: count parity is exact (normalized
    // tokens are pure [a-z0-9], so code points = DuckDB len characters)
    "bpe_encode_nomerge" ->
      s"""WITH $toksCte
         |SELECT doc_id,
         |  cast(coalesce(list_aggregate(list_transform(l, w -> len(w)),
         |    'sum'), 0) AS bigint) AS n_bpe
         |FROM toks ORDER BY doc_id""".stripMargin,

    // full merge-round replay: the same vocab cutoff, the same
    // weighted pair counts, the same argmax tie-break, the same greedy
    // leftmost merge application, four rounds chained as CTEs
    "bpe_train" -> bpeTrainOracle(numMerges = 4, maxVocabWords = 200),

    // the merge table is data-derived, so DuckDB verifies the exact
    // word/char counts and the engine-computed invariant flags must be
    // all-ones (roundtrip losslessness + count bounds hold for ANY
    // merge table — a kernel bug, not a table choice, breaks them)
    "bpe_encode" ->
      s"""WITH $toksCte
         |SELECT doc_id,
         |  cast(len(l) AS bigint) AS n_words,
         |  cast(coalesce(list_aggregate(list_transform(l, w -> len(w)),
         |    'sum'), 0) AS bigint) AS n_chars,
         |  cast(1 AS int) AS ok_roundtrip,
         |  cast(1 AS int) AS ok_bounds
         |FROM toks ORDER BY doc_id""".stripMargin,

    // persisted-artifact roundtrip: exact word counts plus the two
    // engine-computed identity flags, which must be all-ones for ANY
    // trained table (a storage or rank-order bug breaks them)
    "bpe_encode_persisted" ->
      s"""WITH $toksCte
         |SELECT doc_id,
         |  cast(len(l) AS bigint) AS n_words,
         |  cast(1 AS int) AS ok_identical,
         |  cast(1 AS int) AS ok_table
         |FROM toks ORDER BY doc_id""".stripMargin,

    // every WARC header field, content length, and body md5 recomputed
    // from the synthesis formulas (webCte); 3 rows per doc via range(3).
    // Deliberately blind to plain-vs-gzip — the parse must be identical.
    "warc_parse" ->
      s"""WITH $webCte,
         |r AS (SELECT *, unnest(range(3)) AS i FROM x)
         |SELECT doc_id, cast(i AS int) AS rec_idx,
         |  CASE i WHEN 0 THEN 'warcinfo' WHEN 1 THEN 'response'
         |    ELSE 'metadata' END AS warc_type,
         |  CASE i WHEN 0 THEN '<urn:uuid:warcinfo-' || doc_id || '>'
         |    WHEN 1 THEN '<urn:uuid:resp-' || doc_id || '>'
         |    ELSE '<urn:uuid:meta-' || doc_id || '>' END AS record_id,
         |  CASE WHEN i = 0 THEN NULL ELSE url END AS target_uri,
         |  '2026-01-0' || (1 + doc_id % 9) || 'T00:00:0' || (doc_id % 10)
         |    || 'Z' AS date_s,
         |  CASE i WHEN 1 THEN 'application/http; msgtype=response'
         |    ELSE 'application/warc-fields' END AS content_type,
         |  cast(CASE i
         |    WHEN 0 THEN strlen('software: graft/0.1' || chr(13) ||
         |      chr(10) || 'format: WARC file version 1.1')
         |    WHEN 1 THEN strlen('HTTP/1.1 200 OK' || chr(13) ||
         |      chr(10) || 'Content-Type: text/html; charset=utf-8' ||
         |      chr(13) || chr(10) || chr(13) || chr(10) || html)
         |    ELSE strlen('lang: ' || lang || chr(13) || chr(10) ||
         |      'sourceName: ' || source)
         |    END AS bigint) AS content_length,
         |  cast(CASE WHEN i = 1 THEN 200 ELSE NULL END AS int)
         |    AS http_status,
         |  CASE i
         |    WHEN 0 THEN md5('software: graft/0.1' || chr(13) || chr(10) ||
         |      'format: WARC file version 1.1')
         |    WHEN 1 THEN md5(html)
         |    ELSE md5('lang: ' || lang || chr(13) || chr(10) ||
         |      'sourceName: ' || source)
         |    END AS body_md5
         |FROM r ORDER BY doc_id, rec_idx""".stripMargin,

    // every field restated from the synthesis formulas — but here they
    // pin the RANDOM-ACCESS read (each record fetched via its index
    // span alone), and the tiling invariant is a literal 1
    "warc_cdx_fetch" ->
      s"""WITH $webCte,
         |r AS (SELECT *, unnest(range(3)) AS i FROM x)
         |SELECT doc_id, cast(i AS int) AS rec_idx,
         |  CASE i WHEN 0 THEN 'warcinfo' WHEN 1 THEN 'response'
         |    ELSE 'metadata' END AS warc_type,
         |  CASE i WHEN 0 THEN '<urn:uuid:warcinfo-' || doc_id || '>'
         |    WHEN 1 THEN '<urn:uuid:resp-' || doc_id || '>'
         |    ELSE '<urn:uuid:meta-' || doc_id || '>' END AS record_id,
         |  CASE WHEN i = 0 THEN NULL ELSE url END AS target_uri,
         |  '2026-01-0' || (1 + doc_id % 9) || 'T00:00:0' || (doc_id % 10)
         |    || 'Z' AS date_s,
         |  CASE i
         |    WHEN 0 THEN md5('software: graft/0.1' || chr(13) || chr(10) ||
         |      'format: WARC file version 1.1')
         |    WHEN 1 THEN md5('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
         |      'Content-Type: text/html; charset=utf-8' || chr(13) ||
         |      chr(10) || chr(13) || chr(10) || html)
         |    ELSE md5('lang: ' || lang || chr(13) || chr(10) ||
         |      'sourceName: ' || source)
         |    END AS block_md5,
         |  cast(1 AS bigint) AS spans_exact
         |FROM r ORDER BY doc_id, rec_idx""".stripMargin,

    // candidate and archive sides both restated from the synthesis
    // formulas (url_norm + the %4 lastmod rotation + Web.date), with
    // max-of-group collapsing colliding spellings on each side before
    // the tier comparison — including the planted equal-date boundary
    "recrawl_archive" ->
      (s"WITH $webCte,\n" +
      """cand0 AS (
         |  SELECT url_norm AS u,
         |    CASE cast(doc_id % 4 AS int)
         |      WHEN 0 THEN DATE '2026-06-01'
         |      WHEN 1 THEN DATE '2025-12-31'
         |      WHEN 3 THEN cast('2026-01-0' || (doc_id % 9 + 1) AS DATE)
         |      ELSE NULL END AS lm
         |  FROM x
         |  UNION ALL
         |  SELECT 'https://new.example/n/' || doc_id, DATE '2026-06-01'
         |  FROM documents WHERE doc_id % 5 = 0),
         |cand AS (SELECT u, max(lm) AS lastmod FROM cand0 GROUP BY u),
         |arch AS (
         |  SELECT url_norm AS u,
         |    max(cast('2026-01-0' || (1 + doc_id % 9) AS DATE)) AS fetched
         |  FROM x GROUP BY u)
         |SELECT c.u AS url_canon,
         |  cast(CASE WHEN a.fetched IS NULL THEN 0
         |    WHEN c.lastmod > a.fetched THEN 1 ELSE 2 END AS int) AS tier,
         |  cast(c.lastmod AS varchar) AS lastmod,
         |  cast(a.fetched AS varchar) AS fetched
         |FROM cand c LEFT JOIN arch a ON c.u = a.u
         |ORDER BY url_canon""".stripMargin),

    // host membership (doc_id%3=0 are the www.example-*.com pages) and
    // the exact re-extracted main text, both from the synthesis
    // formulas — an index predicate that leaks other hosts' pages or a
    // fetch that mangles a body cannot match
    "warc_cdx_reextract" ->
      s"""WITH $webCte
         |SELECT doc_id, host,
         |  md5(CASE WHEN coll = '' THEN source
         |    ELSE source || chr(10) || coll END) AS main_md5,
         |  cast(length(CASE WHEN coll = '' THEN source
         |    ELSE source || chr(10) || coll END) AS bigint) AS main_chars
         |FROM x WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin,

    // the cross-generation point-read restated (every 9th doc spans
    // both batches since ids alternate): one row per requested doc —
    // a replayed append that double-indexed would double them
    "warc_cdx_incremental" ->
      s"""WITH $webCte
         |SELECT doc_id, '<urn:uuid:resp-' || doc_id || '>' AS record_id,
         |  url AS target_uri,
         |  md5('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
         |    'Content-Type: text/html; charset=utf-8' || chr(13) ||
         |    chr(10) || chr(13) || chr(10) || html) AS block_md5
         |FROM x WHERE doc_id % 9 = 0 ORDER BY doc_id""".stripMargin,

    // the dereference restated: for every doc that carries a revisit
    // (even ids), the original's id, URI, its content md5 from the
    // synthesis formula, and the digest verdict (the fixture plants
    // stale digests off the %4 grid)
    "warc_revisit_fetch" ->
      """SELECT doc_id,
        |  '<urn:uuid:orig-' || doc_id || '>' AS refers_to,
        |  'https://h' || (doc_id % 7) || '.example/p/' || doc_id
        |    AS target_uri,
        |  md5('p' || doc_id || '|' || coalesce(text, ''))
        |    AS fetched_md5,
        |  cast(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS bigint)
        |    AS digest_ok
        |FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""".stripMargin,

    // the sparse point-read workload restated: the requested docs, each
    // found, with the response record's fields from the synthesis
    // formulas — a fetch that misses (found=0, null md5) or retrieves
    // the wrong record cannot match
    "warc_cdx_lookup" ->
      s"""WITH $webCte
         |SELECT doc_id, cast(1 AS bigint) AS found,
         |  '<urn:uuid:resp-' || doc_id || '>' AS record_id,
         |  url AS target_uri,
         |  md5('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
         |    'Content-Type: text/html; charset=utf-8' || chr(13) ||
         |    chr(10) || chr(13) || chr(10) || html) AS block_md5
         |FROM x WHERE doc_id % 7 = 0 ORDER BY doc_id""".stripMargin,

    // the corrupted-shard rotation restated directly
    "warc_quarantine" ->
      """SELECT doc_id FROM documents WHERE doc_id % 97 = 0
        |ORDER BY doc_id""".stripMargin,

    // the sparse point-read back from the written shards: URI from the
    // export formula, text md5 from the source column, filtered to the
    // requested workload
    "warc_cdx_files" ->
      """SELECT doc_id,
        |  'https://w.example/' || doc_id AS target_uri,
        |  md5(coalesce(text, '')) AS text_md5
        |FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin,

    // every document back from the exported shards: URI from the
    // export call's formula, text md5 from the source column
    "wet_roundtrip" ->
      """SELECT doc_id,
        |  'https://w.example/' || doc_id AS target_uri,
        |  md5(coalesce(text, '')) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // every column restated from the source table (null text → null
    // md5, matching JSON null-field omission), and the manifest total
    // must equal the corpus row count on every output row
    "jsonl_export" ->
      """SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars,
        |  (SELECT cast(count(*) AS bigint) FROM documents)
        |    AS manifest_rows
        |FROM documents ORDER BY doc_id""".stripMargin,

    // every revisit column and the digest verdict restated from the
    // fixture arithmetic alone; the original's digest recomputed with
    // DuckDB's md5 (independent of the Spark-side md5 the gate runs)
    "warc_revisit" ->
      """SELECT doc_id,
        |  '<urn:uuid:rev-' || doc_id || '>' AS rev_id,
        |  '<urn:uuid:orig-' || doc_id || '>' AS refers_to,
        |  'https://h' || (doc_id % 7) || '.example/p/' || doc_id
        |    AS orig_uri,
        |  'md5:' || md5('p' || doc_id || '|' || coalesce(text, '') ||
        |    CASE WHEN doc_id % 4 = 0 THEN '' ELSE '|stale' END)
        |    AS payload_digest,
        |  'http://netpreserve.org/warc/1.1/revisit/identical-payload-digest'
        |    AS profile,
        |  cast(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS bigint)
        |    AS digest_ok
        |FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""".stripMargin,

    // expected extract restated from the source columns (block
    // segmentation + entity round-trip + ASCII-ws collapse), never by
    // re-running an extractor
    "html_extract" ->
      s"""WITH $webCte
         |SELECT doc_id,
         |  cast(length(extract) AS bigint) AS extract_chars,
         |  md5(extract) AS extract_md5,
         |  9 * 1000000 // length(extract) AS link_ppm
         |FROM x ORDER BY doc_id""".stripMargin,

    // main = h1 + article only; full additionally carries the nav bar
    // and link-farm blocks the kernel must have dropped
    "html_main_text" ->
      s"""WITH $webCte
         |SELECT doc_id,
         |  cast(length(CASE WHEN coll = '' THEN source
         |    ELSE source || chr(10) || coll END) AS bigint) AS main_chars,
         |  md5(CASE WHEN coll = '' THEN source
         |    ELSE source || chr(10) || coll END) AS main_md5,
         |  cast(length('nav one nav two' || chr(10) ||
         |    CASE WHEN coll = '' THEN source
         |      ELSE source || chr(10) || coll END || chr(10) ||
         |    'more | links | here') AS bigint) AS full_chars
         |FROM x ORDER BY doc_id""".stripMargin,

    // the integer recurrence replayed bit-for-bit: r0 = R//N, then 3
    // unrolled iterations of base + (17*S)//20 with S = Σ r//outdeg
    // over in-edges (dangling mass drops, per the operator contract)
    // same three-iteration integer replay as host_rank, over the edge
    // multiset the markup implies (absolute cross-host links only; the
    // intra-host decoy self-filters)
    "link_graph_rank" ->
      """WITH ed AS (
        |  SELECT 'h' || (doc_id % 12) || '.example' AS src,
        |    'h' || ((doc_id + 5) % 12) || '.example' AS dst
        |  FROM documents),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
        |par AS (SELECT count(*)::BIGINT AS n FROM nodes),
        |od AS (SELECT src, count(*)::BIGINT AS outd FROM ed GROUP BY src),
        |r0 AS (SELECT node, 1000000000::BIGINT // n AS r
        |  FROM nodes CROSS JOIN par),
        |i1 AS (
        |  SELECT nodes.node,
        |    (3::BIGINT * 1000000000) // (20 * n)
        |      + (17 * coalesce(s.s, 0)) // 20 AS r
        |  FROM nodes CROSS JOIN par
        |  LEFT JOIN (SELECT ed.dst AS node, sum(r0.r // od.outd) AS s
        |             FROM ed JOIN r0 ON ed.src = r0.node
        |             JOIN od ON ed.src = od.src
        |             GROUP BY ed.dst) s ON nodes.node = s.node),
        |i2 AS (
        |  SELECT nodes.node,
        |    (3::BIGINT * 1000000000) // (20 * n)
        |      + (17 * coalesce(s.s, 0)) // 20 AS r
        |  FROM nodes CROSS JOIN par
        |  LEFT JOIN (SELECT ed.dst AS node, sum(i1.r // od.outd) AS s
        |             FROM ed JOIN i1 ON ed.src = i1.node
        |             JOIN od ON ed.src = od.src
        |             GROUP BY ed.dst) s ON nodes.node = s.node),
        |i3 AS (
        |  SELECT nodes.node,
        |    (3::BIGINT * 1000000000) // (20 * n)
        |      + (17 * coalesce(s.s, 0)) // 20 AS r
        |  FROM nodes CROSS JOIN par
        |  LEFT JOIN (SELECT ed.dst AS node, sum(i2.r // od.outd) AS s
        |             FROM ed JOIN i2 ON ed.src = i2.node
        |             JOIN od ON ed.src = od.src
        |             GROUP BY ed.dst) s ON nodes.node = s.node)
        |SELECT node, cast(r AS bigint) AS rank_ppb FROM i3
        |ORDER BY node""".stripMargin,

    "host_rank" ->
      s"""WITH $webCte,
         |ed AS (
         |  SELECT host AS src,
         |    'www.example-' || ((doc_id + 3) % 10) || '.com' AS dst
         |  FROM x
         |  UNION ALL SELECT host, 'hub.example' FROM x),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
         |par AS (SELECT count(*)::BIGINT AS n FROM nodes),
         |od AS (SELECT src, count(*)::BIGINT AS outd FROM ed GROUP BY src),
         |r0 AS (SELECT node, 1000000000::BIGINT // n AS r
         |  FROM nodes CROSS JOIN par),
         |i1 AS (
         |  SELECT nodes.node,
         |    (3::BIGINT * 1000000000) // (20 * n)
         |      + (17 * coalesce(s.s, 0)) // 20 AS r
         |  FROM nodes CROSS JOIN par
         |  LEFT JOIN (SELECT ed.dst AS node, sum(r0.r // od.outd) AS s
         |             FROM ed JOIN r0 ON ed.src = r0.node
         |             JOIN od ON ed.src = od.src
         |             GROUP BY ed.dst) s ON nodes.node = s.node),
         |i2 AS (
         |  SELECT nodes.node,
         |    (3::BIGINT * 1000000000) // (20 * n)
         |      + (17 * coalesce(s.s, 0)) // 20 AS r
         |  FROM nodes CROSS JOIN par
         |  LEFT JOIN (SELECT ed.dst AS node, sum(i1.r // od.outd) AS s
         |             FROM ed JOIN i1 ON ed.src = i1.node
         |             JOIN od ON ed.src = od.src
         |             GROUP BY ed.dst) s ON nodes.node = s.node),
         |i3 AS (
         |  SELECT nodes.node,
         |    (3::BIGINT * 1000000000) // (20 * n)
         |      + (17 * coalesce(s.s, 0)) // 20 AS r
         |  FROM nodes CROSS JOIN par
         |  LEFT JOIN (SELECT ed.dst AS node, sum(i2.r // od.outd) AS s
         |             FROM ed JOIN i2 ON ed.src = i2.node
         |             JOIN od ON ed.src = od.src
         |             GROUP BY ed.dst) s ON nodes.node = s.node)
         |SELECT node, cast(r AS bigint) AS rank_ppb FROM i3
         |ORDER BY node""".stripMargin,

    // the same segmentation re-derived with the marker-insertion regex
    // (punct-run + ASCII-ws → punct + marker; split; trim; drop empty)
    "text_sentences" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    'A one. B two!? ' || coalesce(text, '') || ' ... C three? D'
        |      AS t
        |  FROM documents),
        |sp AS (
        |  SELECT doc_id, list_filter(list_transform(
        |    string_split(regexp_replace(t,
        |      '([.!?]+)[ \t\n\x0b\f\r]+', '\1' || chr(1), 'g'), chr(1)),
        |    x -> trim(x, ' ' || chr(9) || chr(10) || chr(11) || chr(12)
        |      || chr(13))), x -> len(x) > 0) AS ss
        |  FROM f)
        |SELECT doc_id, cast(len(ss) AS bigint) AS n_sentences,
        |  md5(array_to_string(ss, chr(1))) AS sents_md5
        |FROM sp ORDER BY doc_id""".stripMargin,

    // the expected decision from the synthesis arithmetic: only the
    // www hosts' /src1-prefixed paths are disallowed (the api hosts'
    // Allow / and the files hosts' longest-match Allow /pub/ win)
    "robots_filter" ->
      s"""WITH $webCte
         |SELECT doc_id, host,
         |  cast(CASE WHEN doc_id % 3 = 0 AND source LIKE 'src1%'
         |    THEN 0 ELSE 1 END AS int) AS allowed
         |FROM x ORDER BY doc_id""".stripMargin,

    // host URL counts from the webCte host formula; stated delays and
    // the n_urls × delay product restated (1000 ms default elsewhere)
    "crawl_budget" ->
      s"""WITH $webCte,
         |h AS (SELECT host, count(*)::BIGINT AS n_urls
         |  FROM x GROUP BY host)
         |SELECT host, n_urls,
         |  CASE WHEN host LIKE 'www.%' THEN cast(2000 AS bigint)
         |       WHEN host LIKE 'api.%' THEN cast(500 AS bigint)
         |       ELSE NULL END AS delay_ms,
         |  cast(n_urls * CASE WHEN host LIKE 'www.%' THEN 2000
         |       WHEN host LIKE 'api.%' THEN 500 ELSE 1000 END
         |    AS bigint) AS crawl_ms
         |FROM h ORDER BY host""".stripMargin,

    // delay (group-scoped, floor ms), sitemap count, and the
    // document-order sitemap list all restated from the synthesis;
    // NULL delay where the * group states none (the evilbot 99 decoy
    // must never leak through)
    "robots_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN cast((doc_id % 7) * 1000 + (doc_id % 10) * 100 AS bigint)
        |    ELSE NULL END AS delay_ms,
        |  cast(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS bigint)
        |    AS n_sitemaps,
        |  md5('https://s.example/' || source || '/a.xml' ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN chr(1) || 'https://s.example/' || doc_id || '/b.xml'
        |      ELSE '' END) AS sitemaps_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // every surviving sitemap entry and its POSITION restated from the
    // synthesis arithmetic (entity decode and CDATA unwrap included);
    // the no-loc / blank-loc decoys and the unterminated-block grace
    // are all pinned by the position sequence
    "sitemap_parse" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |r AS (
        |  SELECT doc_id, 0 AS pos,
        |    'https://s' || (doc_id % 20) || '.example/page/' || doc_id ||
        |      '?a=1&b=2' AS loc,
        |    '2024-0' || (doc_id % 9 + 1) || '-01' AS lastmod,
        |    false AS is_index
        |  FROM d WHERE doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id, 1,
        |    'https://s' || (doc_id % 20) || '.example/cdata/' || doc_id,
        |    NULL, false FROM d WHERE doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id, 2, 'https://tail.example/' || doc_id, NULL, false
        |  FROM d WHERE doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id, 0,
        |    'https://s' || (doc_id % 20) || '.example/sm-' || doc_id ||
        |      '.xml', '2024-02-02', true FROM d WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, 1, 'https://tail.example/idx-' || doc_id || '.xml',
        |    NULL, true FROM d WHERE doc_id % 5 = 0)
        |SELECT doc_id, cast(pos AS int) AS pos, loc, lastmod, is_index
        |FROM r ORDER BY doc_id, pos""".stripMargin,

    // every Gopher counter recomputed from the framed text with list
    // ops, and the pass flag from the same integer threshold arithmetic
    // the datasheet replayed from scratch: normalized-text token
    // counts, the gopher arithmetic over the raw text, distinct-text
    // dup counting, and percentile_disc(0.5) — the quantile op's exact
    // definition
    "corpus_datasheet" ->
      """WITH b AS (
        |  SELECT lang, doc_id, coalesce(text, '') AS t,
        |    trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
        |      '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
        |  FROM documents WHERE lang IS NOT NULL),
        |w AS (
        |  SELECT lang, doc_id, t, nt,
        |    cast(len(list_filter(string_split_regex(nt, '\s+'),
        |      x -> len(x) > 0)) AS bigint) AS n_words,
        |    list_filter(string_split_regex(t, '[ \t\n\x0b\f\r]+'),
        |      x -> len(x) > 0) AS ws,
        |    string_split(t, chr(10)) AS ls
        |  FROM b),
        |c AS (
        |  SELECT lang, doc_id, nt, n_words,
        |    cast(len(ws) AS bigint) AS g_words,
        |    cast(coalesce(list_aggregate(list_transform(ws, x -> len(x)),
        |      'sum'), 0) AS bigint) AS word_cps,
        |    cast((len(t) - len(replace(t, '#', '')))
        |      + (len(t) - len(replace(t, '…', '')))
        |      + (len(t) - len(replace(t, '...', ''))) // 3
        |      AS bigint) AS n_symbols,
        |    cast(len(ls) AS bigint) AS n_lines,
        |    cast(len(list_filter(ls, l ->
        |      starts_with(ltrim(l, ' ' || chr(9)), '•') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '‣') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '-') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '*')))
        |      AS bigint) AS n_bullet_lines,
        |    cast(len(list_filter(ls, l ->
        |      ends_with(rtrim(l, ' ' || chr(9)), '…') OR
        |      ends_with(rtrim(l, ' ' || chr(9)), '...')))
        |      AS bigint) AS n_ellipsis_lines,
        |    cast(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS bigint) AS n_alpha_words,
        |    cast(len(list_filter(ws, x -> list_contains(
        |      ['the','be','to','of','and','that','have','with'],
        |      lower(x)))) AS bigint) AS n_stop_hits
        |  FROM w),
        |gp AS (
        |  SELECT lang, doc_id, nt, n_words,
        |    cast(CASE WHEN g_words >= 50 AND g_words <= 100000
        |      AND 3 * g_words <= word_cps AND word_cps <= 10 * g_words
        |      AND 10 * n_symbols <= g_words
        |      AND 10 * n_bullet_lines <= n_lines
        |      AND 10 * n_ellipsis_lines <= 3 * n_lines
        |      AND 5 * n_alpha_words >= 4 * g_words
        |      AND n_stop_hits >= 2
        |      THEN 1 ELSE 0 END AS bigint) AS gpass
        |  FROM c)
        |SELECT lang,
        |  cast(count(*) AS bigint) AS n_docs,
        |  cast(count(*) - count(DISTINCT nt) AS bigint) AS n_dup_docs,
        |  cast(sum(gpass) AS bigint) AS n_gopher_pass,
        |  cast(sum(n_words) AS bigint) AS total_words,
        |  cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_words)
        |    AS bigint) AS p50_words
        |FROM gp GROUP BY lang ORDER BY lang""".stripMargin,

    "gopher_stats" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || chr(10) || '• item ' || source ||
        |    chr(10) || 'trailing dots...' ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || '# tag …'
        |      ELSE '' END AS t
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, t,
        |    list_filter(string_split_regex(t, '[ \t\n\x0b\f\r]+'),
        |      x -> len(x) > 0) AS ws,
        |    string_split(t, chr(10)) AS ls
        |  FROM f),
        |c AS (
        |  SELECT doc_id,
        |    cast(len(ws) AS bigint) AS n_words,
        |    cast(coalesce(list_aggregate(list_transform(ws, x -> len(x)),
        |      'sum'), 0) AS bigint) AS word_cps,
        |    cast((len(t) - len(replace(t, '#', '')))
        |      + (len(t) - len(replace(t, '…', '')))
        |      + (len(t) - len(replace(t, '...', ''))) // 3
        |      AS bigint) AS n_symbols,
        |    cast(len(ls) AS bigint) AS n_lines,
        |    cast(len(list_filter(ls, l ->
        |      starts_with(ltrim(l, ' ' || chr(9)), '•') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '‣') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '-') OR
        |      starts_with(ltrim(l, ' ' || chr(9)), '*')))
        |      AS bigint) AS n_bullet_lines,
        |    cast(len(list_filter(ls, l ->
        |      ends_with(rtrim(l, ' ' || chr(9)), '…') OR
        |      ends_with(rtrim(l, ' ' || chr(9)), '...')))
        |      AS bigint) AS n_ellipsis_lines,
        |    cast(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS bigint) AS n_alpha_words,
        |    cast(len(list_filter(ws, x -> list_contains(
        |      ['the','be','to','of','and','that','have','with'],
        |      lower(x)))) AS bigint) AS n_stop_hits
        |  FROM w)
        |SELECT *,
        |  cast(CASE WHEN n_words >= 50 AND n_words <= 100000
        |    AND 3 * n_words <= word_cps AND word_cps <= 10 * n_words
        |    AND 10 * n_symbols <= n_words
        |    AND 10 * n_bullet_lines <= n_lines
        |    AND 10 * n_ellipsis_lines <= 3 * n_lines
        |    AND 5 * n_alpha_words >= 4 * n_words
        |    AND n_stop_hits >= 2
        |    THEN 1 ELSE 0 END AS int) AS pass
        |FROM c ORDER BY doc_id""".stripMargin,

    // the stub scorer's exact arithmetic per document, independent of
    // any batching: first 6 md5 hex digits mod 1e6, 0 for null/empty
    "model_score" ->
      """SELECT doc_id,
        |  CASE WHEN text IS NULL OR text = '' THEN cast(0 AS bigint)
        |    ELSE ('0x' || substr(md5(text), 1, 6))::BIGINT % 1000000
        |    END AS score_ppm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the ENTIRE train-then-score pipeline replayed from scratch:
    // Gopher-pass labels over the raw text (the gopher_stats
    // arithmetic, unframed), md5-bucketed distinct-token presence
    // features, smoothed probability-difference weights, mean-weight
    // scoring. All divisions are nonneg-trunc or flooring `//`,
    // matching the engine's Math.floorDiv
    "model_score_trained" ->
      s"""WITH $trainedScoreCtes
        |SELECT d.doc_id,
        |  cast(CASE WHEN d.text IS NULL OR d.text = '' THEN 0
        |       WHEN sc.k IS NULL THEN 500000
        |       ELSE greatest(0, least(1000000, 500000 + sc.s // sc.k))
        |       END AS bigint) AS score_ppm
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // retrain + re-score + ranked-window replay of the learned-quality
    // domain cap (score DESC, doc_id ASC — BoundedTopM's tie rule)
    "domain_top_trained" ->
      s"""WITH $trainedScoreCtes,
        |sc2 AS (
        |  SELECT d.doc_id,
        |    cast(CASE WHEN d.text IS NULL OR d.text = '' THEN 0
        |         WHEN sc.k IS NULL THEN 500000
        |         ELSE greatest(0, least(1000000, 500000 + sc.s // sc.k))
        |         END AS bigint) AS score_ppm,
        |    'site' || (d.doc_id % 25) || '.example' AS host
        |  FROM documents d LEFT JOIN sc USING (doc_id)),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY host ORDER BY score_ppm DESC, doc_id) AS rn
        |  FROM sc2)
        |SELECT host, doc_id, score_ppm FROM r WHERE rn <= 3
        |ORDER BY host, doc_id""".stripMargin,

    // the token-budget batching contract restated from the raw text:
    // same whitespace split as the Spark tokenizer, truncation = the
    // single-space re-join of the first 11 tokens, score = the stub
    // md5 arithmetic over the text the model actually saw
    "model_score_tokens" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
        |      w -> len(w) > 0) AS l
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN text IS NULL OR text = '' THEN cast(0 AS bigint)
        |    WHEN len(l) > 11 THEN ('0x' || substr(md5(
        |      array_to_string(l[1:11], ' ')), 1, 6))::BIGINT % 1000000
        |    ELSE ('0x' || substr(md5(text), 1, 6))::BIGINT % 1000000
        |    END AS score_ppm,
        |  cast(CASE WHEN text IS NULL THEN 0
        |    ELSE least(len(l), 11) END AS bigint) AS n_tokens,
        |  cast(CASE WHEN text IS NOT NULL AND len(l) > 11 THEN 1 ELSE 0
        |    END AS bigint) AS truncated
        |FROM tk ORDER BY doc_id""".stripMargin,

    // the intact rows of the corrupted-line synthesis — the reader's
    // clean side must be exactly the source minus every 97th doc
    "jsonl_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5, lang, source
        |FROM documents WHERE doc_id % 97 <> 0
        |ORDER BY doc_id""".stripMargin,

    // each metadata field restated from the synthesis columns, with
    // the % 4 absence rotation
    "html_meta" ->
      """SELECT doc_id,
        |  source || ' page & ' || doc_id AS title,
        |  CASE WHEN doc_id % 4 = 0 THEN NULL ELSE lang END AS lang_attr,
        |  CASE WHEN doc_id % 4 = 1 THEN NULL
        |    ELSE 'https://c.example/' || source || '/' || doc_id
        |    END AS canonical,
        |  CASE WHEN doc_id % 4 = 2 THEN NULL
        |    ELSE 'doc ' || doc_id || ' of ' || source END AS description
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the end state of the whole curation chain, recomputed from the
    // source columns: expected main text, quality formula, per-host
    // ranked window (the cap), md5-group min-id dedup (the canon)
    // the whole composed curation replayed from the source columns:
    // main text, gopher counters → pass, the stub model's md5 ppm,
    // the 3-iteration integer PageRank (same replay as host_rank),
    // gate × score composition, per-host cap, md5 dedup, and the
    // final global top-40 by (score, host rank, id)
    // (concatenated, not one interpolated literal: the gopher regex's
    // \x0b is not a valid Scala escape inside an s-string)
    "crawl_pipeline" ->
      (s"WITH $webCte,\n" +
      """mn AS (
         |  SELECT doc_id, host,
         |    CASE WHEN coll = '' THEN source
         |      ELSE source || chr(10) || coll END AS main
         |  FROM x),
         |gw AS (
         |  SELECT doc_id, main,
         |    list_filter(string_split_regex(main, '[ \t\n\x0b\f\r]+'),
         |      w -> len(w) > 0) AS ws,
         |    string_split(main, chr(10)) AS ls
         |  FROM mn),
         |gc AS (
         |  SELECT doc_id,
         |    cast(len(ws) AS bigint) AS n_words,
         |    cast(coalesce(list_aggregate(list_transform(ws, w -> len(w)),
         |      'sum'), 0) AS bigint) AS word_cps,
         |    cast((len(main) - len(replace(main, '#', '')))
         |      + (len(main) - len(replace(main, '…', '')))
         |      + (len(main) - len(replace(main, '...', ''))) // 3
         |      AS bigint) AS n_symbols,
         |    cast(len(ls) AS bigint) AS n_lines,
         |    cast(len(list_filter(ls, l ->
         |      starts_with(ltrim(l, ' ' || chr(9)), '•') OR
         |      starts_with(ltrim(l, ' ' || chr(9)), '‣') OR
         |      starts_with(ltrim(l, ' ' || chr(9)), '-') OR
         |      starts_with(ltrim(l, ' ' || chr(9)), '*')))
         |      AS bigint) AS n_bullet_lines,
         |    cast(len(list_filter(ls, l ->
         |      ends_with(rtrim(l, ' ' || chr(9)), '…') OR
         |      ends_with(rtrim(l, ' ' || chr(9)), '...')))
         |      AS bigint) AS n_ellipsis_lines,
         |    cast(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
         |      AS bigint) AS n_alpha_words,
         |    cast(len(list_filter(ws, w -> list_contains(
         |      ['the','be','to','of','and','that','have','with'],
         |      lower(w)))) AS bigint) AS n_stop_hits
         |  FROM gw),
         |gp AS (
         |  SELECT doc_id,
         |    cast(CASE WHEN n_words >= 50 AND n_words <= 100000
         |      AND 3 * n_words <= word_cps AND word_cps <= 10 * n_words
         |      AND 10 * n_symbols <= n_words
         |      AND 10 * n_bullet_lines <= n_lines
         |      AND 10 * n_ellipsis_lines <= 3 * n_lines
         |      AND 5 * n_alpha_words >= 4 * n_words
         |      AND n_stop_hits >= 2
         |      THEN 1 ELSE 0 END AS bigint) AS gopher_pass
         |  FROM gc),
         |ed AS (
         |  SELECT host AS src,
         |    'www.example-' || ((doc_id + 3) % 10) || '.com' AS dst
         |  FROM x
         |  UNION ALL SELECT host, 'hub.example' FROM x),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
         |par AS (SELECT count(*)::BIGINT AS n FROM nodes),
         |od AS (SELECT src, count(*)::BIGINT AS outd FROM ed GROUP BY src),
         |r0 AS (SELECT node, 1000000000::BIGINT // n AS r
         |  FROM nodes CROSS JOIN par),
         |i1 AS (
         |  SELECT nodes.node,
         |    (3::BIGINT * 1000000000) // (20 * n)
         |      + (17 * coalesce(s.s, 0)) // 20 AS r
         |  FROM nodes CROSS JOIN par
         |  LEFT JOIN (SELECT ed.dst AS node, sum(r0.r // od.outd) AS s
         |             FROM ed JOIN r0 ON ed.src = r0.node
         |             JOIN od ON ed.src = od.src
         |             GROUP BY ed.dst) s ON nodes.node = s.node),
         |i2 AS (
         |  SELECT nodes.node,
         |    (3::BIGINT * 1000000000) // (20 * n)
         |      + (17 * coalesce(s.s, 0)) // 20 AS r
         |  FROM nodes CROSS JOIN par
         |  LEFT JOIN (SELECT ed.dst AS node, sum(i1.r // od.outd) AS s
         |             FROM ed JOIN i1 ON ed.src = i1.node
         |             JOIN od ON ed.src = od.src
         |             GROUP BY ed.dst) s ON nodes.node = s.node),
         |i3 AS (
         |  SELECT nodes.node,
         |    (3::BIGINT * 1000000000) // (20 * n)
         |      + (17 * coalesce(s.s, 0)) // 20 AS r
         |  FROM nodes CROSS JOIN par
         |  LEFT JOIN (SELECT ed.dst AS node, sum(i2.r // od.outd) AS s
         |             FROM ed JOIN i2 ON ed.src = i2.node
         |             JOIN od ON ed.src = od.src
         |             GROUP BY ed.dst) s ON nodes.node = s.node),
         |q AS (
         |  SELECT mn.doc_id, mn.host, mn.main, gp.gopher_pass,
         |    ('0x' || substr(md5(mn.main), 1, 6))::BIGINT % 1000000
         |      AS model_ppm,
         |    cast(i3.r AS bigint) AS rank_ppb,
         |    (('0x' || substr(md5(mn.main), 1, 6))::BIGINT % 1000000)
         |      * gp.gopher_pass AS q_ppm
         |  FROM mn JOIN gp USING (doc_id)
         |  JOIN i3 ON mn.host = i3.node),
         |r AS (SELECT *, row_number() OVER (PARTITION BY host
         |  ORDER BY q_ppm DESC, doc_id) AS rn FROM q),
         |cap AS (SELECT doc_id, host, main, gopher_pass, model_ppm,
         |  rank_ppb, q_ppm FROM r WHERE rn <= 5),
         |dd AS (
         |  SELECT *,
         |    min(doc_id) OVER (PARTITION BY md5(main)) AS canonical_id,
         |    count(*) OVER (PARTITION BY md5(main)) AS n_copies
         |  FROM cap),
         |canon AS (SELECT * FROM dd WHERE doc_id = canonical_id),
         |fin AS (SELECT *, row_number() OVER (
         |  ORDER BY q_ppm * 2000000000 + rank_ppb DESC, doc_id) AS gn
         |  FROM canon)
         |SELECT doc_id, host, gopher_pass, model_ppm, rank_ppb, q_ppm,
         |  md5(main) AS main_md5, cast(n_copies AS bigint) AS n_copies
         |FROM fin WHERE gn <= 40
         |ORDER BY doc_id""".stripMargin),

    // the per-host ranked window the operator deliberately avoids,
    // over the same synthesized hosts (webCte) and quality formula
    "domain_top" ->
      s"""WITH $webCte,
         |t AS (
         |  SELECT doc_id, host,
         |    cast(round(len(regexp_extract_all(t, '[A-Za-z]'))
         |      / greatest(length(t), 1) * 1000000) AS bigint) AS q_ppm
         |  FROM x),
         |r AS (SELECT *, row_number() OVER (PARTITION BY host
         |  ORDER BY q_ppm DESC, doc_id) AS rn FROM t)
         |SELECT doc_id, host, q_ppm FROM r WHERE rn <= 3
         |ORDER BY doc_id""".stripMargin,

    // the expected (href, anchor text) pair list restated from the
    // synthesis arithmetic: inline markup stripped, the entity decoded,
    // whitespace collapsed, the hrefless anchor and script decoy absent
    "anchor_texts" ->
      """SELECT doc_id,
        |  cast(2 AS bigint) AS n_pairs,
        |  md5('https://t.example/' || doc_id || chr(2) ||
        |      'click here&now' || chr(1) ||
        |      '/rel/' || source || chr(2) || 'spaced text')
        |    AS pairs_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the expected href list (document order, duplicate kept, script
    // decoy and hrefless anchor absent) restated from the synthesis
    // arithmetic and joined on chr(1)
    "html_links" ->
      """SELECT doc_id,
        |  cast(CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END AS bigint)
        |    AS n_links,
        |  md5('https://a.example/' || doc_id || chr(1) ||
        |      '/rel/' || source || chr(1) ||
        |      'https://a.example/' || doc_id ||
        |      CASE WHEN doc_id % 3 = 0
        |        THEN chr(1) || 'https://b.example/?q=' || doc_id
        |        ELSE '' END) AS links_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // canonical key, spelling count, and first-doc pick all restated
    // from the synthesis arithmetic (2 spellings per doc; the key
    // collapses to doc_id % 125)
    "url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://site' || (doc_id % 25) || '.example/p/' ||
        |      (doc_id % 125) AS url_canon
        |  FROM documents)
        |SELECT url_canon,
        |  cast(2 * count(*) AS bigint) AS n_spellings,
        |  cast(min(doc_id) AS bigint) AS first_doc
        |FROM u GROUP BY url_canon ORDER BY url_canon""".stripMargin,

    // full from-scratch replay: the synthesis links (messy + clean
    // absolute spellings of the same target, a page-relative local
    // link), the per-(target, anchor) counts, the sorted pack, and the
    // canonical-document join-back
    "anchor_targets" ->
      """WITH d AS (SELECT doc_id, (doc_id + 1) % 125 AS k FROM documents),
        |links AS (
        |  SELECT 'https://site' || (k % 25) || '.example/p/' || k
        |    AS target_url, 'anchor ' || (doc_id % 3) AS anchor FROM d
        |  UNION ALL
        |  SELECT 'https://site' || (k % 25) || '.example/p/' || k,
        |    'read more' FROM d
        |  UNION ALL
        |  SELECT 'https://h' || (doc_id % 10) || '.example/local/' ||
        |    (doc_id % 20), 'local link' FROM d),
        |pa AS (SELECT target_url, anchor, count(*) AS n
        |  FROM links GROUP BY 1, 2),
        |agg AS (
        |  SELECT target_url, cast(sum(n) AS bigint) AS n_links,
        |    cast(count(*) AS bigint) AS n_anchors,
        |    md5(array_to_string(
        |      list(anchor || chr(2) || n ORDER BY anchor), chr(1)))
        |      AS anchors_md5
        |  FROM pa GROUP BY target_url),
        |canon AS (
        |  SELECT 'https://site' || (doc_id % 25) || '.example/p/' ||
        |    (doc_id % 125) AS cu, min(doc_id) AS first_doc
        |  FROM documents GROUP BY 1)
        |SELECT a.target_url, cast(c.first_doc AS bigint) AS target_doc,
        |  a.n_links, a.n_anchors, a.anchors_md5
        |FROM agg a LEFT JOIN canon c ON c.cu = a.target_url
        |ORDER BY a.target_url""".stripMargin,

    // every resolution row restated from the synthesis arithmetic: the
    // 301 source lands 2 hops out, the 302 source 1 hop, loop members
    // are non-terminal with null final/hops
    "redirect_resolve" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |r AS (
        |  SELECT 'https://r.example/a/' || doc_id AS url,
        |    'https://final.example/p/' || (doc_id % 50) AS final_url,
        |    2 AS hops, true AS terminal FROM d
        |  UNION ALL
        |  SELECT 'https://r.example/b/' || doc_id,
        |    'https://final.example/p/' || (doc_id % 50), 1, true FROM d
        |  UNION ALL
        |  SELECT 'https://loop.example/x/' || doc_id, NULL, NULL, false
        |  FROM d WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT 'https://loop.example/y/' || doc_id, NULL, NULL, false
        |  FROM d WHERE doc_id % 10 = 0)
        |SELECT url, final_url, cast(hops AS bigint) AS hops, terminal
        |FROM r ORDER BY url""".stripMargin,

    // per landing page: 2 sources per doc in its %50 class; the min
    // source is the lexicographic-min 'a/'-spelling (both engines
    // compare the same UTF-8 strings)
    "redirect_dedup" ->
      """SELECT 'https://final.example/p/' || (doc_id % 50) AS final_url,
        |  cast(2 * count(*) AS bigint) AS n_sources,
        |  min('https://r.example/a/' || doc_id) AS first_url
        |FROM documents
        |GROUP BY doc_id % 50
        |ORDER BY final_url""".stripMargin,

    // cap, within-host order, and delay arithmetic replayed with a
    // ranked window over the restated URL set
    "frontier_schedule" ->
      """WITH u AS (
        |  SELECT 'https://f' || (doc_id % 7) || '.example/page/' ||
        |      (doc_id % 40) AS url,
        |    'f' || (doc_id % 7) || '.example' AS host,
        |    doc_id % 7 AS i,
        |    min(doc_id) AS first_doc
        |  FROM documents GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY host ORDER BY first_doc, url) AS rn FROM u)
        |SELECT host, cast(rn - 1 AS int) AS seq, url AS url_canon,
        |  cast(first_doc AS bigint) AS first_doc,
        |  cast(500 + i * 100 AS bigint) AS delay_ms,
        |  cast((rn - 1) * (500 + i * 100) AS bigint) AS planned_ms
        |FROM r WHERE rn <= 3 ORDER BY host, seq""".stripMargin,

    // from-scratch recompute of the frontier: candidates (sitemap locs
    // + link targets), the already-fetched canonical set, the not-seen
    // filter, and the min-doc first-occurrence pick
    "frontier_pipeline" ->
      """WITH cand AS (
        |  SELECT doc_id, 'https://f.example/page/' || (doc_id % 40) AS u
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |    'https://site' || (((doc_id + 1) % 125) % 25) ||
        |      '.example/p/' || ((doc_id + 1) % 125)
        |  FROM documents),
        |seen AS (
        |  SELECT DISTINCT 'https://site' || (doc_id % 25) ||
        |    '.example/p/' || (doc_id % 125) AS u
        |  FROM documents)
        |SELECT u AS url_canon, cast(min(doc_id) AS bigint) AS first_doc
        |FROM cand WHERE u NOT IN (SELECT u FROM seen)
        |GROUP BY u ORDER BY u""".stripMargin,

    // from-scratch replay of redirect resolution + state judging: the
    // go/hop candidates of even k chain (1 and 2 hops) onto the
    // batch-1 canonical URL site(k%25)/p/k, whose state first_doc is
    // min{d : d%125 = k} = k (docs are contiguous from 0); odd-k
    // chains land on never-seen land/k, and direct candidates never
    // resolve — both judged within the batch by min doc
    "frontier_redirect" ->
      """WITH c AS (
        |  SELECT doc_id, doc_id % 80 AS k, 'go' AS kind FROM documents
        |  UNION ALL
        |  SELECT doc_id, doc_id % 80, 'hop' FROM documents
        |  WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, doc_id % 30, 'direct' FROM documents),
        |t AS (
        |  SELECT doc_id, kind, k,
        |    CASE WHEN kind = 'direct'
        |           THEN 'https://direct.example/d/' || k
        |         WHEN k % 2 = 0
        |           THEN 'https://site' || (k % 25) || '.example/p/' || k
        |         ELSE 'https://new.example/land/' || k END AS url_canon
        |  FROM c),
        |f AS (SELECT url_canon, min(doc_id) AS bf FROM t GROUP BY url_canon)
        |SELECT t.doc_id, t.url_canon,
        |  CASE WHEN t.kind <> 'direct' AND t.k % 2 = 0 THEN 'seen'
        |       WHEN t.doc_id = f.bf THEN 'new'
        |       ELSE 'dup_in_batch' END AS status,
        |  cast(CASE WHEN t.kind <> 'direct' AND t.k % 2 = 0 THEN t.k
        |       ELSE f.bf END AS bigint) AS first_doc
        |FROM t JOIN f USING (url_canon)
        |ORDER BY t.doc_id, t.url_canon""".stripMargin,

    // tier, cap, order, and delay replayed with a ranked window; the
    // URL is keyed by doc_id % 280 (CRT over %7 host and %40 page) and
    // the tier restated from the synthesis arithmetic — stale for
    // u%4=0, fresh for u%4=1, DEFAULT tier for the malformed (u%4=2)
    // and missing (u%4=3) lastmod variants
    "recrawl_schedule" ->
      """WITH u0 AS (
        |  SELECT doc_id % 280 AS u, min(doc_id) AS first_doc
        |  FROM documents GROUP BY 1),
        |e AS (
        |  SELECT u, first_doc,
        |    'https://f' || (u % 7) || '.example/page/' || (u % 40)
        |      AS url_canon,
        |    'f' || (u % 7) || '.example' AS host,
        |    u % 7 AS i,
        |    CASE WHEN u % 4 = 0 THEN 0 WHEN u % 4 = 1 THEN 2
        |         ELSE 1 END AS tier
        |  FROM u0),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY host ORDER BY tier, first_doc) AS rn FROM e)
        |SELECT host, cast(rn - 1 AS int) AS seq, url_canon,
        |  cast(tier AS int) AS tier,
        |  cast(first_doc AS bigint) AS first_doc,
        |  cast(500 + i * 100 AS bigint) AS delay_ms,
        |  cast((rn - 1) * (500 + i * 100) AS bigint) AS planned_ms
        |FROM r WHERE rn <= 3 ORDER BY host, seq""".stripMargin,

    // from-scratch recompute of the standing index: first_seen_batch =
    // the earliest batch (doc_id % 3 + 1) containing the canonical
    // URL; first_doc = the smallest doc_id within that batch. The
    // replayed fold the gate performs must leave no trace.
    "url_dedup_incremental" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://site' || (doc_id % 25) || '.example/p/' ||
        |      (doc_id % 125) AS url_canon,
        |    doc_id % 3 + 1 AS b
        |  FROM documents),
        |f AS (SELECT url_canon, min(b) AS fb FROM u GROUP BY url_canon)
        |SELECT f.url_canon,
        |  cast(f.fb AS bigint) AS first_seen_batch,
        |  cast(min(u.doc_id) AS bigint) AS first_doc
        |FROM f JOIN u ON u.url_canon = f.url_canon AND u.b = f.fb
        |GROUP BY f.url_canon, f.fb
        |ORDER BY f.url_canon""".stripMargin,

    // expected canonical form stated directly from the synthesis
    // arithmetic — the oracle does NOT re-implement the normalizer
    "url_normalize" ->
      s"""WITH $webCte
         |SELECT doc_id, url, url_norm, host FROM x
         |ORDER BY doc_id""".stripMargin,

    // end state of the composed WARC → HTTP → HTML → URL chain
    "web_pipeline" ->
      s"""WITH $webCte
         |SELECT doc_id, url_norm, host,
         |  cast(length(extract) AS bigint) AS extract_chars,
         |  md5(extract) AS extract_md5,
         |  9 * 1000000 // length(extract) AS link_ppm
         |FROM x ORDER BY doc_id""".stripMargin,

    // brute-force argmax assignment: cross join to the same 8 lowest-id
    // centroids, ranked window (sim desc, cluster asc), row 1 per vec
    "cluster_assign" ->
      """WITH v AS (
        |  SELECT vec_id, cast(embedding AS double[]) AS e
        |  FROM embeddings WHERE len(embedding) > 0),
        |c AS (SELECT vec_id AS cluster, e AS ce FROM v
        |  ORDER BY vec_id LIMIT 8),
        |s AS (
        |  SELECT v.vec_id, c.cluster,
        |    cast(round(list_cosine_similarity(v.e, c.ce) * 1000000)
        |      AS bigint) AS sim_e6
        |  FROM v CROSS JOIN c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
        |  ORDER BY sim_e6 DESC, cluster) AS rn FROM s)
        |SELECT vec_id, cluster, sim_e6 FROM r WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,
  )
}
