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
}
