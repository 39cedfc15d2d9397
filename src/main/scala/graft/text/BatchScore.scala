package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Partition-batched MODEL-INFERENCE plumbing — the curation step that
  * scores documents with a learned classifier (fastText-style quality,
  * toxicity, educational-value — the DCLM/FineWeb-Edu filters). The
  * JVM here ships no model runtime, so the MODEL is a STUB behind one
  * small trait; everything Spark-side is real and tested:
  *
  *  - batching: texts feed the scorer in `batchSize` arrays (real
  *    runtimes amortize per-call overhead / saturate an accelerator);
  *  - one scorer instance per executor JVM (lazy singleton per scorer
  *    id — loading a model per TASK, let alone per row, is the classic
  *    inference-pipeline regression; the spec counts instantiations);
  *  - scores must be BATCH-INVARIANT: the same document scores the
  *    same in any batch/partition layout (the gate re-scores under a
  *    different batch size and the repartitioned layout);
  *  - null/empty texts score without reaching the model (no poison
  *    pills at 100 TB).
  *
  * Swapping in a real model (ONNX runtime, JNI fastText, an RPC
  * endpoint) changes ONLY the [[DocScorer]] binding — the plan shape,
  * batching, and singleton lifecycle stay as tested. STUB MARKER: the
  * default [[HashScorer]] is a deterministic stand-in (md5-derived
  * ppm), not a learned model.
  */
object BatchScore {

  /** The model boundary: score a batch of texts to [0, 1e6] ppm
    * integers (the repo's no-doubles-across-gates discipline). MUST be
    * deterministic per text — batching is an execution detail. */
  trait DocScorer extends Serializable {
    def scoreBatch(texts: Array[String]): Array[Long]
    /** Identity for the per-executor singleton cache. */
    def scorerId: String
  }

  /** STUB model: deterministic md5-derived score — stands in for a
    * learned quality/toxicity classifier the JVM can't ship. Chosen to
    * be ORACLE-EXPRESSIBLE (DuckDB recomputes it from the text), so
    * the gate can verify the whole plumbing end to end. */
  class HashScorer extends DocScorer {
    override def scorerId: String = "hash-v1"
    override def scoreBatch(texts: Array[String]): Array[Long] =
      texts.map { t =>
        // first 6 md5 hex digits mod 1e6 — same arithmetic as the
        // oracle's substr(md5(text), 1, 6) parse (pure JDK digest)
        val md = java.security.MessageDigest.getInstance("MD5")
        val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex6 = f"${(d(0) & 0xFF)}%02x${(d(1) & 0xFF)}%02x${(d(2) & 0xFF)}%02x"
        java.lang.Long.parseLong(hex6, 16) % 1000000L
      }
  }

  /** Per-executor scorer singletons: a model loads once per JVM, not
    * per task. Keyed by scorerId so distinct models coexist. */
  private object ScorerCache {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, DocScorer]()
    // spec seam: total instantiations in this JVM (must stay ~1 per
    // scorer id, never ~1 per task)
    val instantiations = new java.util.concurrent.atomic.AtomicInteger(0)
    def get(proto: DocScorer): DocScorer =
      cache.computeIfAbsent(proto.scorerId, _ => {
        instantiations.incrementAndGet(); proto
      })
  }
  private[graft] def instantiationCount: Int =
    ScorerCache.instantiations.get()

  /** Score every document: (id, score_ppm). Narrow (mapPartitions, no
    * shuffle); null/empty texts score 0 without reaching the model. */
  def score(spark: SparkSession, docs: DataFrame, id: Column, text: Column,
            scorer: DocScorer = new HashScorer, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    require(batchSize >= 1, "batchSize must be >= 1")
    docs.select(id.cast("long").as("i"), text.cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val model = ScorerCache.get(scorer)
        it.grouped(batchSize).flatMap { chunk =>
          val live = chunk.filter { case (_, t) => t != null && t.nonEmpty }
          val scores =
            if (live.isEmpty) Array.empty[Long]
            else model.scoreBatch(live.map(_._2).toArray)
          // positional re-zip (never id-keyed: ids may repeat)
          var k = 0
          chunk.map { case (i, t) =>
            if (t != null && t.nonEmpty) { val s = scores(k); k += 1; (i, s) }
            else (i, 0L)
          }
        }
      }
      .toDF("id", "score_ppm")
  }

  /** TOKEN-budgeted batching — how real classifier runtimes batch: a
    * batch of 64 ten-page documents OOMs an accelerator that 64 tweets
    * would not, so batches flush at `maxBatchTokens` TOTAL tokens
    * (each batch still holds ≥ 1 document), and any document longer
    * than `maxDocTokens` is truncated to the model context first.
    *
    * `tokens` is the document's token ARRAY column (caller's
    * tokenizer: [[TextOps.tokens]], [[TextOps.bpeishTokens]], a BPE
    * encode — anything array<string>), so counting AND truncation run
    * in the plan as codegen expressions; the imperative boundary only
    * packs pre-counted rows. Truncation contract: a too-long document
    * scores on the single-space re-join of its first `maxDocTokens`
    * tokens (whitespace normalizes at the context boundary — the
    * standard tokenizer-feed shape) and reports `truncated = 1`.
    *
    * Same guarantees as [[score]]: per-executor singleton, positional
    * re-zip (ids may repeat), null/empty bypass (cost 0 — they ride
    * any batch without reaching the model), batch-layout-invariant
    * scores. Output: (id, score_ppm, n_tokens, truncated) with
    * n_tokens = the token count the model actually saw. */
  def scoreByTokens(spark: SparkSession, docs: DataFrame, id: Column,
                    text: Column, tokens: Column,
                    scorer: DocScorer = new HashScorer,
                    maxBatchTokens: Int = 8192,
                    maxDocTokens: Int = 2048): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    require(maxBatchTokens >= 1, "maxBatchTokens must be >= 1")
    require(maxDocTokens >= 1, "maxDocTokens must be >= 1")
    require(maxDocTokens <= maxBatchTokens,
      "maxDocTokens must fit maxBatchTokens — a truncated document " +
        "must still fit one batch")
    val prep = docs
      .select(id.cast("long").as("i"), text.cast("string").as("t"),
        tokens.as("tk"))
      .select(col("i"),
        when(size(col("tk")) > maxDocTokens,
          array_join(slice(col("tk"), 1, maxDocTokens), " "))
          .otherwise(col("t")).as("t"),
        when(col("t").isNull, lit(0))
          .otherwise(least(coalesce(size(col("tk")), lit(0)),
            lit(maxDocTokens))).cast("int").as("n"),
        when(col("t").isNotNull && size(col("tk")) > maxDocTokens, 1L)
          .otherwise(0L).as("trunc"))
      .as[(Long, String, Int, Long)]
    prep.mapPartitions { it =>
      val model = ScorerCache.get(scorer)
      // greedy token packing: flush when the next document would push
      // the batch past maxBatchTokens; a batch always takes at least
      // one document, so progress is unconditional
      val batches = new Iterator[Vector[(Long, String, Int, Long)]] {
        private var pending: (Long, String, Int, Long) = null
        override def hasNext: Boolean = pending != null || it.hasNext
        override def next(): Vector[(Long, String, Int, Long)] = {
          val out = Vector.newBuilder[(Long, String, Int, Long)]
          var tok = 0
          var first = true
          var open = true
          while (open && (pending != null || it.hasNext)) {
            val row = if (pending != null) pending else it.next()
            pending = null
            if (first || tok + row._3 <= maxBatchTokens) {
              out += row; tok += row._3; first = false
            } else { pending = row; open = false }
          }
          out.result()
        }
      }
      batches.flatMap { chunk =>
        val live = chunk.filter { case (_, t, _, _) => t != null && t.nonEmpty }
        val scores =
          if (live.isEmpty) Array.empty[Long]
          else model.scoreBatch(live.map(_._2).toArray)
        var k = 0
        chunk.map { case (i, t, n, tr) =>
          if (t != null && t.nonEmpty) { val s = scores(k); k += 1; (i, s, n.toLong, tr) }
          else (i, 0L, n.toLong, tr)
        }
      }
    }.toDF("id", "score_ppm", "n_tokens", "truncated")
  }
}
