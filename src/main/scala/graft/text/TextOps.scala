package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextExprs

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * column expressions (whole-stage codegen, no UDFs) so they run at
  * full scan speed over a 100 TB documents table.
  */
object TextOps {

  /** Whitespace tokenizer. `split` with a regex; empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword-boundary token count: words, numbers, and single
    * punctuation marks each count — the usual pre-tokenizer regex family
    * (letters | digits | non-space symbol). */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  // ── Quality scoring ──────────────────────────────────────────────────

  val enStopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "that", "it", "for",
    "on", "was", "as", "with", "be", "by", "at", "this", "are", "or")

  /** Fraction of tokens that are (English) stopwords — high for natural
    * prose, near 0 for boilerplate/code/gibberish. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(enStopwords: _*))) /
      greatest(size(toks), lit(1))
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))) /
      greatest(length(text), lit(1))

  /** Fraction of characters that are alphabetic. */
  def alphaRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0))) /
      greatest(length(text), lit(1))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _) /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** All three quality ratios in ONE pass over the text (native kernel —
    * [[graft.ops.TextKernels.qualityStats]]): returns a struct
    * (stopword_ratio, alpha_ratio, mean_token_len) with semantics
    * identical to the per-ratio columns above. */
  def qualityStruct(text: Column): Column =
    graft.ops.TextExprs.qualityStats(text, enStopwords)

  // ── Language ID (n-gram/stopword heuristic) ──────────────────────────

  /** Tiny public stopword profiles; scored by hit count per language.
    * CJK is detected by character class before the stopword vote. */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> enStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu",
      "mit", "den", "von", "für", "auf", "im", "sich"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se",
      "no", "por", "con", "para", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans",
      "ce", "pas", "au", "sur", "les", "des", "est"))

  /** Heuristic language ID: argmax of per-language stopword hits
    * (deterministic tie-break: lexicographically last language wins the
    * tie via struct ordering), with a CJK character-ratio override.
    * Returns a language code string.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = array(profiles.map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words: _*))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    val cjkRatio = size(regexp_extract_all(text,
      lit("[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]"),
      lit(0))) / greatest(length(text), lit(1))
    when(cjkRatio > 0.2, lit("cjk"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  // ── Vocabulary ───────────────────────────────────────────────────────

  /** Corpus vocabulary: one row per token of the normalized stream with
    * total term frequency (`tf`) and document frequency (`df`) — the
    * tokenizer-training / idf-weighting / stopword-discovery table.
    *
    * Scale shape: two-stage aggregation. Stage 1 reduces the exploded
    * token stream to (token, doc) with map-side partial counts, so the
    * shuffle carries per-task-distinct pairs, not raw occurrences; stage
    * 2 folds those into per-token (tf, df). A single-stage
    * `countDistinct(doc)` would hold per-token doc-id sets in the
    * aggregation buffers — unbounded state on a 100 TB corpus, where
    * this shape's buffers stay scalar. `minDf` prunes the hapax tail
    * (typically most of the vocabulary) before any top-k consumer. */
  def termStats(docs: DataFrame, id: Column, text: Column,
                minDf: Long = 1L): DataFrame =
    docs.select(id.as("doc_id"), explode(tokens(normalized(text))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("__tf"))
      .groupBy(col("token"))
      .agg(sum(col("__tf")).as("tf"), count(lit(1)).as("df"))
      .where(col("df") >= minDf)

  /** Per-document top keywords by rarity-weighted frequency: score =
    * tf · N / df — tf-idf with a LINEAR idf. The linear form is chosen
    * deliberately: tf, N and df are exact integers, so the score is two
    * correctly-rounded IEEE operations that reproduce bit-identically in
    * any engine (a log-idf would hang the correctness gate on libm
    * last-ulp differences). Emitted as integer ppm for the same reason.
    *
    * Scale shape: df is a map-side-combined `groupBy(token)` aggregate
    * over the tf frame, joined back on token. The r4 form computed df as
    * a count-over-token WINDOW to guarantee a single tokenize pass (an
    * aggregation branch canonicalizes differently after column pruning,
    * so Catalyst re-tokenizes the corpus for it) — but a window
    * partitioned by token funnels EVERY (doc, "the") row into one task:
    * on a natural corpus the hottest token appears in nearly every
    * document, so that partition scales with the corpus and the window
    * buffers it whole. r6 takes the same trade mandated for the shingle
    * family ([[graft.dedup.Dedup.ngramJaccardPairs]]): tokenize runs
    * twice (cheap, embarrassingly parallel), hot tokens collapse in
    * aggregate partials before any shuffle, and the join back is
    * AQE-skew-split eligible. `n` is the corpus document count, passed
    * in (the caller usually knows it from a manifest; computing it here
    * would force an extra action).
    *
    * The remaining window partitions by doc_id — bounded by one
    * document's distinct tokens, never by corpus size.
    *
    * @return (doc_id, rank, token, score_ppm), `topK` rows per doc with
    *         at least one token whose df clears `minDf`; ties break
    *         lexicographically. NOTE: with `minDf > 1` a document whose
    *         EVERY token is corpus-rare (df < minDf) has no qualifying
    *         terms and is absent from the output entirely — left-join
    *         the result when downstream needs every doc represented. */
  def topTerms(docs: DataFrame, id: Column, text: Column, n: Long,
               topK: Int = 3, minDf: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(id.as("doc_id"), explode(tokens(normalized(text))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfByToken = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("token"))
    // merge-pinned: the df frame is the corpus VOCABULARY — the static
    // post-aggregate estimate broadcasts it at small SF, a plan that
    // cannot survive corpus scale (and denies tf its reusable exchange)
    tf.join(dfByToken.hint("merge"), Seq("token"))
      .withColumn("score_ppm",
        round(col("tf") * lit(n) / col("df") * 1e6, 0).cast("long"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("token"), col("score_ppm"))
  }

  /** Corpus-LM typicality score — the integer-exact stand-in for
    * perplexity filtering (CCNet-style: score each document under a
    * language model trained on the corpus itself; gibberish, boilerplate
    * and wrong-language text score low). The "LM" is the corpus unigram
    * model with add-one smoothing; each token scores its probability in
    * parts-per-million-scaled integer form:
    *
    *   tok_ppm(t) = (count(t) + 1) * 1_000_000 div (N + V)
    *
    * and a document reports the integer mean over its tokens plus its
    * rare-token count. All arithmetic is exact integer (counts, one
    * scaled division, long sums): a true log-probability would hang the
    * correctness gate on libm last-ulp differences (see [[topTerms]]),
    * and double sums are reduction-order-dependent — integer sums
    * commute, so the score is bit-stable across engines AND runs. The
    * ppm scale floors extremely rare tokens to 0 on very large corpora;
    * `rare_tokens` (count with corpus frequency < `rareBelow`) carries
    * that tail's signal undiminished.
    *
    * Scale shape: token counts reduce by one map-side-combined
    * aggregation; the token stream joins the slim (token, c) frame
    * hash-keyed — hot tokens are AQE-skew-split eligible in the join,
    * never funnel into a window task — and (N, V) ride a broadcast
    * one-row cross join. The tokenize kernel runs twice (count branch +
    * probe branch), the same deliberate trade as
    * [[graft.dedup.Dedup.ngramJaccardPairs]].
    *
    * @return (doc_id, n_tokens, rare_tokens, mean_tok_ppm) — documents
    *         with at least one token */
  def lmTypicality(docs: DataFrame, id: Column, text: Column,
                   rareBelow: Long = 2L): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(tokens(normalized(text))).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val nv = counts.agg(
      coalesce(sum(col("c")), lit(0L)).as("n_corpus"),
      count(lit(1)).as("v_size"))
    // merge-pinned: the count frame is the corpus vocabulary (see the
    // topTerms note); only the one-row (N, V) frame broadcasts
    toks.join(counts.hint("merge"), Seq("token"))
      .crossJoin(broadcast(nv))
      .select(col("doc_id"),
        // the multiply runs in decimal(38,0), not long: at ~100 TB of
        // text the hottest token's count is ~1e12, so (c+1)*1e6 ~ 1e18
        // sits within 10× of Long.Max — a few-hundred-TB corpus (or a
        // degenerate one-token corpus) would overflow: ANSI kills the
        // job, non-ANSI silently corrupts the filter with negative ppm.
        // div on decimals still returns an exact integral long, and
        // tok_ppm ≤ 1e6 so everything downstream stays long-sized.
        call_function("div",
          (col("c") + 1).cast("decimal(38,0)") * lit(1000000L),
          (col("n_corpus") + col("v_size")).cast("decimal(38,0)"))
          .as("tok_ppm"),
        (col("c") < rareBelow).cast("long").as("is_rare"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("is_rare")).as("rare_tokens"),
        call_function("div", sum(col("tok_ppm")), count(lit(1)))
          .as("mean_tok_ppm"))
  }

  /** Corpus-wide BPE merge-step statistics: the frequency of every
    * adjacent CHARACTER pair inside the normalized tokens — exactly the
    * count a byte-pair-encoding trainer maximizes at its first merge.
    * Feeding a tokenizer trainer from a 100 TB corpus is a counting
    * problem, and this is its one-pass distributed form: tokens explode
    * to (len-1) two-char slices, and the pair counts collapse by
    * map-side-combined aggregation (hot pairs like "th" combine inside
    * every input partition before the one slim shuffle).
    *
    * @return (pair, n) — the `topK` most frequent pairs, count-desc,
    *         ties lexicographic */
  def bpePairStats(docs: DataFrame, text: Column, topK: Int = 100): DataFrame =
    docs.select(explode(tokens(normalized(text))).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)

  /** Train a BPE merge table: the corpus reduces to (word, count) by one
    * map-side-combined aggregation — the only distributed pass — and the
    * classic merge loop (count adjacent pairs weighted by word frequency,
    * merge the argmax, repeat) runs driver-side over the top
    * `maxVocabWords` words. Same sample-train/full-apply split as the PQ
    * codebooks: training state is a bounded driver materialization
    * (top-N word list), while [[bpeTokens]] applies the table at full
    * corpus scale as a codegen kernel. Deterministic: ties break on the
    * lexicographically smallest pair, and the word-frequency cutoff
    * breaks count ties by word.
    *
    * Words longer than [[graft.ops.TextKernels.MaxBpeWord]] code points
    * are excluded (the encode kernel won't merge them either — see its
    * scaladoc), and merges stop early when no pair repeats.
    *
    * @return merge pairs in rank order (rank 0 = first/highest-priority)
    */
  def trainBpeMerges(docs: DataFrame, text: Column, numMerges: Int = 100,
                     maxVocabWords: Int = 10000): Seq[(String, String)] = {
    val top = docs.select(explode(tokens(normalized(text))).as("w"))
      .where(length(col("w")) <= graft.ops.TextKernels.MaxBpeWord)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // driver-side merge loop over the bounded word-frequency table;
    // the split is the kernel's own (train/encode must never diverge)
    var words: Array[(Array[String], Long)] = top.map { case (w, n) =>
      (graft.ops.TextKernels.splitCodePoints(w).toArray, n)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (parts, n) =>
        var i = 0
        while (i < parts.length - 1) {
          val k = (parts(i), parts(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      // a merge must REDUCE tokens somewhere more than once, or the
      // table is pure memorization of singleton words — stop
      val candidates = counts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (parts, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < parts.length) {
            if (i < parts.length - 1 && parts(i) == best._1 &&
                parts(i + 1) == best._2) {
              out += parts(i) + parts(i + 1); i += 2
            } else { out += parts(i); i += 1 }
          }
          (out.toArray, n)
        }
      }
    }
    merges.toSeq
  }

  /** Persist a trained merge table as generation-versioned snapshot
    * state ([[graft.core.GenState]] — the budget-histogram discipline):
    * a retrain commits the NEXT generation and becomes current with
    * its `_SUCCESS` marker, a crashed write is an invisible orphan,
    * and readers always resolve a complete table. This is the
    * tokenizer's operational seam: train on the curated corpus, ship
    * the artifact, and every later encode (packing, chunking, budget
    * counting) loads the exact table — merge RANK ORDER is the
    * tokenizer, so it rides an explicit column. Driver-bounded by
    * construction (a merge table is vocab-sized). */
  def saveBpeMerges(spark: org.apache.spark.sql.SparkSession,
                    merges: Seq[(String, String)], path: String,
                    batchId: Option[Long] = None): Unit = {
    merges.foreach { case (a, b) =>
      require(a != null && b != null && a.nonEmpty && b.nonEmpty,
        "merge pairs must be non-empty strings")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("merge_rank",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("lhs",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("rhs",
        org.apache.spark.sql.types.StringType, nullable = false)))
    val rows = merges.zipWithIndex.map { case ((a, b), r) =>
      org.apache.spark.sql.Row(r, a, b)
    }
    graft.core.GenState.commit(spark, rows, schema, path, batchId)
  }

  /** Load the CURRENT generation's merge table, in rank order — the
    * exact sequence [[saveBpeMerges]] persisted. */
  def loadBpeMerges(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[(String, String)] =
    graft.core.GenState.read(spark, path).collect()
      .sortBy(_.getAs[Int]("merge_rank"))
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq

  /** Encode text with a trained BPE merge table: whitespace-split words
    * each become one or more subword tokens (native codegen kernel —
    * [[graft.ops.TextExprs.bpeEncode]]). Concatenating the tokens of a
    * word reproduces the word exactly, for ANY merge table — the
    * invariant the gate pins. An empty table degenerates to a
    * code-point split. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    TextExprs.bpeEncode(tokens(normalized(text)), merges)

  /** Per-document BPE token count under a trained merge table — the
    * budget metric token-aware pipelines (packing, chunking, pricing)
    * key on. Bounded by chars-per-doc above and words-per-doc below. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeTokens(text, merges))

  // ── Context-window chunking ──────────────────────────────────────────

  /** Chunk a document's tokens into fixed-size context windows with
    * optional overlap (stride < window) — the standard shaping step
    * before training-example packing. One output row per chunk via
    * posexplode; embarrassingly parallel, no shuffle.
    *
    * Tail handling: the last chunk is the first stride-aligned window
    * that reaches the document's end, so it may be PARTIAL — trailing
    * tokens are never dropped (dropping the tail would silently lose
    * training text from every long document), and a document shorter
    * than `window` yields exactly one partial chunk. */
  def tokenChunks(text: Column, window: Int, stride: Int): Column = {
    require(stride > 0 && stride <= window, "0 < stride <= window")
    val toks = tokens(text)
    val n = size(toks)
    // last start = smallest 1 + k·stride with start + window - 1 >= n
    val lastStart = lit(1) + lit(stride) *
      ceil(greatest(n - window, lit(0)).cast("double") / stride).cast("int")
    val starts = sequence(lit(1), lastStart, lit(stride))
    transform(starts, s => slice(toks, s, lit(window)))
  }

  // ── PII redaction ────────────────────────────────────────────────────

  /** Redaction patterns, applied IN ORDER (order matters: an email must
    * be consumed before its digits could half-match the phone pattern).
    * Regex subset common to Java and RE2 — no backrefs, no lookaround —
    * so the DuckDB oracle runs the same patterns verbatim. */
  val redactions: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b" -> "<PHONE>")

  /** Scrub emails / IPv4s / phone-shaped numbers from text — the
    * compliance pass before training-data serialization. Pure sequential
    * regexp_replace column expressions; scan-speed, no shuffle. */
  def redact(text: Column): Column =
    redactions.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }

  /** Count of redactable spans (for corpus audit dashboards). */
  def redactionCount(text: Column): Column =
    redactions.map { case (re, _) => size(regexp_extract_all(text, lit(re), lit(0))) }
      .reduce(_ + _)

  // ── Fingerprinting ───────────────────────────────────────────────────

  /** Unicode hygiene at ingest: NFC-compose and strip control/zero-width
    * characters, so visually-identical docs with different compositions
    * hash identically through every downstream dedup. Native kernel —
    * [[graft.ops.TextKernels.nfcClean]]; run this BEFORE [[normalized]]
    * (which is the lossy shingling normalization, not a hygiene pass). */
  def nfcClean(text: Column): Column = graft.ops.TextExprs.nfcClean(text)

  /** Duplicate-n-gram fraction of the normalized token stream, in parts
    * per million: `1 - distinct/total` over the doc's n-gram windows —
    * the intra-document repetition signal (boilerplate loops, keyword
    * stuffing, degenerate generations) the standard quality filters
    * threshold on. Pure per-row columns (the distinct count rides the
    * [[graft.ops.TextKernels.wordNgrams]] kernel, which dedups while
    * shingling); no shuffle. Docs shorter than `n` tokens report 0. */
  def repetitionPpm(text: Column, n: Int): Column = {
    val toks = tokens(normalized(text))
    val total = when(size(toks) < n, 1).otherwise(size(toks) - (n - 1))
    val distinctN = size(graft.ops.TextExprs.wordNgrams(toks, n))
    round((lit(1.0) - distinctN / total.cast("double")) * 1e6, 0).cast("long")
  }

  /** Canonical normalization before fingerprinting: lowercase, strip
    * non-alphanumerics, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** Whole-document fingerprint: 64-bit hash of the normalized text. */
  def fingerprint(text: Column): Column = xxhash64(normalized(text))

  /** Rolling (shingle-min) fingerprint: minimum 64-bit hash over the
    * rolling word-window shingles of the normalized text — robust to
    * local edits, unlike the whole-document hash. This is a 1-hash
    * MinHash; [[graft.dedup.Dedup]] generalizes it to k hashes. Native
    * kernel — [[graft.ops.TextKernels.rollingMin]].
    */
  def rollingFingerprint(text: Column, window: Int = 4): Column =
    graft.ops.TextExprs.rollingMin(tokens(normalized(text)), window)
}
