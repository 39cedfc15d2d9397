package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination: flag training documents that share long
  * word n-grams with an evaluation/benchmark set — the standard guard
  * against test-set leakage before a training run (the GPT-3/PaLM-style
  * "13-gram collision" check, window length configurable).
  *
  * Scale shape (100 TB corpus, benchmark ≪ corpus): the benchmark side
  * collapses to its DISTINCT n-gram set — a few million short strings
  * for a realistic eval suite — and is broadcast, so the corpus-side
  * n-gram stream is filtered map-side and never shuffles. Only the rare
  * matching (doc_id, gram) hits reach the counting aggregation; the
  * per-document gram totals come from `size(...)` computed in place, not
  * from the exploded stream. Pass `broadcastBench = false` when the
  * benchmark set is too large to broadcast — the join then degrades to a
  * hash-partitioned semi-join instead of failing at the driver.
  */
object Decontaminate {

  /** Annotate every training document with its benchmark-overlap stats.
    *
    * @param train    training corpus (id + text)
    * @param bench    benchmark/eval corpus (text; ids not needed — any
    *                 overlap contaminates, whoever it is with)
    * @param n        n-gram window (tokens); longer = stricter evidence
    * @param minHits  distinct shared n-grams needed to set the flag
    * @return one row per training doc: (doc_id, n_grams, n_hits,
    *         contaminated ∈ {0,1}); docs shorter than `n` tokens shingle
    *         to their whole text (see [[Dedup.shingles]]), so short exact
    *         copies of benchmark items are still caught
    */
  def flag(train: DataFrame, bench: DataFrame, id: Column, text: Column,
           n: Int = 5, minHits: Int = 1,
           broadcastBench: Boolean = true): DataFrame =
    annotate(train, hitCounts(train, bench, id, text, n, broadcastBench),
      id, text, n, minHits)

  private def annotate(train: DataFrame, hits: DataFrame, id: Column,
                       text: Column, n: Int, minHits: Int): DataFrame = {
    // spread an under-split corpus scan before the shingle kernel (a
    // no-op at corpus scale — Dedup.spreadScan scaladoc); the identical
    // projection in hitCounts canonicalizes to the SAME exchange, so
    // the text shuffles once for both kernel passes
    Dedup.spreadScan(train.select(id.as("doc_id"), text.as("__t")),
        col("doc_id"))
      .select(col("doc_id"), size(Dedup.shingles(col("__t"), n)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", (col("n_hits") >= minHits).cast("int"))
  }

  /** The slim core: (doc_id, n_hits) for training docs with ≥ 1 shared
    * benchmark n-gram — docs with zero hits are ABSENT (left-join this).
    * Exposed separately so multi-stage pipelines can annotate one
    * already-loaded corpus frame instead of re-joining against `train` a
    * second time (every extra reference to the corpus frame is another
    * full scan at 100 TB — see the training_pipeline gate query). */
  def hitCounts(train: DataFrame, bench: DataFrame, id: Column, text: Column,
                n: Int = 5, broadcastBench: Boolean = true): DataFrame = {
    val trainGrams =
      Dedup.spreadScan(train.select(id.as("doc_id"), text.as("__t")),
          col("doc_id"))
        .select(col("doc_id"), explode(Dedup.shingles(col("__t"), n)).as("g"))
    val benchGrams0 = benchGramSet(bench, text, n)
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    // shingles are distinct per doc, so count(*) counts DISTINCT shared grams
    trainGrams.join(benchGrams, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Bloom-prefiltered [[flag]] — same output, different scale regime.
    * [[hitCounts]] assumes the benchmark's distinct-gram set fits a
    * broadcast join table; for a very large eval suite (hundreds of
    * millions of grams = tens of GB of strings) that stops being true.
    * Here the benchmark grams aggregate into a bloom filter binary —
    * O(bits) however many grams, ~1.2 GB at 10⁹ grams/1% fpp — which
    * rides the task closure; the corpus gram stream is probed MAP-SIDE
    * and only the survivors (true hits + fpp of the stream) reach the
    * exact verification join, now a shuffled semi-join whose corpus side
    * is tiny. Exactness is preserved: the bloom can only admit extra
    * candidates, and the verify join removes them. */
  def flagBloom(train: DataFrame, bench: DataFrame, id: Column, text: Column,
                n: Int = 5, minHits: Int = 1,
                expectedBenchGrams: Long = 1L << 22,
                fpp: Double = 0.01): DataFrame =
    annotate(train,
      hitCountsBloom(train, bench, id, text, n, expectedBenchGrams, fpp),
      id, text, n, minHits)

  /** The distinct benchmark-gram bloom bitmap — built ONCE per
    * benchmark version and reusable across queries and micro-batches
    * (rebuilding it inside a per-batch loop would re-scan the benchmark
    * every batch). A deliberate driver materialization of the
    * serialized bitmap, the same class as a broadcast. */
  def benchBloom(bench: DataFrame, text: Column, n: Int = 5,
                 expectedBenchGrams: Long = 1L << 22,
                 fpp: Double = 0.01): Array[Byte] =
    graft.ops.BloomOps.build(benchGramSet(bench, text, n),
      col("g"), expectedBenchGrams, fpp)

  /** The DISTINCT benchmark gram frame the exact-verify join runs
    * against — like [[benchBloom]], prepare it ONCE per benchmark
    * version for repeated use (persist it, or materialize to parquet
    * for a very large benchmark: an unprepared frame re-scans and
    * re-distincts the benchmark on EVERY consuming action).
    *
    * The DEGENERATE empty shingle is excluded: [[Dedup.shingles]]
    * deliberately emits one "" shingle for a zero-token text (dedup
    * wants empty docs to match each other), but a benchmark row that
    * normalizes to nothing — "---", "N/A" — shares no actual text with
    * anything, and keeping its "" gram would flag EVERY pure-punctuation
    * training doc as contaminated and silently drop them all in
    * [[clean]]. Contamination requires a real shared n-gram. */
  def benchGramSet(bench: DataFrame, text: Column, n: Int = 5): DataFrame =
    bench.select(explode(Dedup.shingles(text, n)).as("g"))
      .where(col("g") =!= "").distinct()

  /** [[hitCounts]] through the bloom prefilter (see [[flagBloom]]). */
  def hitCountsBloom(train: DataFrame, bench: DataFrame, id: Column,
                     text: Column, n: Int = 5,
                     expectedBenchGrams: Long = 1L << 22,
                     fpp: Double = 0.01): DataFrame =
    hitCountsPrebuiltBloom(train, benchGramSet(bench, text, n),
      benchBloom(bench, text, n, expectedBenchGrams, fpp), id, text, n)

  /** [[hitCountsBloom]] with the [[benchBloom]] bitmap AND the
    * [[benchGramSet]] frame prepared elsewhere — the repeated-use form
    * (streams, many corpora vs one benchmark), where neither benchmark
    * artifact is rebuilt per call. */
  def hitCountsPrebuiltBloom(train: DataFrame, benchGrams: DataFrame,
                             bloom: Array[Byte], id: Column, text: Column,
                             n: Int = 5): DataFrame = {
    import graft.ops.BloomOps
    val trainGrams =
      Dedup.spreadScan(train.select(id.as("doc_id"), text.as("__t")),
          col("doc_id"))
        .select(col("doc_id"), explode(Dedup.shingles(col("__t"), n)).as("g"))
      .where(BloomOps.mightContain(bloom, col("g")))
    // exact verify over the survivors — NOT broadcast: this path exists
    // precisely because the bench gram set is too big for that
    trainGrams.join(benchGrams, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[flagBloom]] with the benchmark artifacts ([[benchBloom]] bitmap
    * + [[benchGramSet]] frame) prepared elsewhere. */
  def flagPrebuiltBloom(train: DataFrame, benchGrams: DataFrame,
                        bloom: Array[Byte], id: Column, text: Column,
                        n: Int = 5, minHits: Int = 1): DataFrame =
    annotate(train,
      hitCountsPrebuiltBloom(train, benchGrams, bloom, id, text, n),
      id, text, n, minHits)

  /** The filtering form: training docs with NO disqualifying benchmark
    * overlap — the frame you feed to the serialization step. Anti-joins
    * the slim [[hitCounts]] frame directly (one corpus reference, plus
    * the gram stream), instead of semi-joining through [[flag]], which
    * would re-expand the corpus plan two more times. */
  def clean(train: DataFrame, bench: DataFrame, id: Column, text: Column,
            n: Int = 5, minHits: Int = 1,
            broadcastBench: Boolean = true): DataFrame = {
    val bad = hitCounts(train, bench, id, text, n, broadcastBench)
      .where(col("n_hits") >= minHits)
      .withColumnRenamed("doc_id", "__bad")
    train.join(bad, id === col("__bad"), "left_anti")
  }
}
