package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling, splitting and mixing — the selection
  * operators a training-data pipeline runs after curation. Everything is
  * keyed on a content/id hash, never on RNG state, so results are stable
  * across re-runs, retries, partitioning changes and cluster sizes, and
  * every operator is a pure narrow column predicate: zero shuffles, full
  * scan speed, trivially correct under AQE re-planning.
  *
  * Mechanism: the first 4 hex chars of md5(key) are uniform over 2¹⁶
  * values, and LOWERCASE HEX compares lexicographically exactly like the
  * number it encodes — so `substr(md5(k), 1, 4) < toHex4(p·2¹⁶)` keeps a
  * p-fraction deterministically, portably across engines (the DuckDB
  * oracle runs the same expression verbatim).
  */
object Sampling {

  /** 4-hex-digit threshold for a fraction of the 2¹⁶ hash space.
    * fraction = 1 returns "g", which sorts above every hex bucket, so
    * `bucket < threshold` keeps everything (a 5-digit "10000" would
    * compare LEXICOGRAPHICALLY and drop most buckets). */
  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    val n = math.round(fraction * 65536.0)
    if (n >= 65536L) "g" else f"$n%04x"
  }

  /** Stringified sampling key: a NULL key hashes as the empty string,
    * so every operator in this module gives null-key rows ONE
    * deterministic bucket. Bare md5(null)=null would instead produce
    * three different silent behaviors — [[hashSample]] dropping the
    * rows even at fraction 1, [[hashSplit]] routing them all into the
    * last (eval!) split, and [[takePerGroup]]'s nulls-first rank letting
    * them beat every real key nondeterministically. Colliding with a
    * genuine "" key is deliberate: both are degenerate keys and land in
    * the same deterministic bucket. */
  private def keyStr(key: Column): Column =
    coalesce(key.cast("string"), lit(""))

  private def bucket(key: Column): Column = substring(md5(keyStr(key)), 1, 4)

  /** Keep a deterministic `fraction` of rows, keyed on `key`. Sampling
    * by document id keeps or drops WHOLE documents — the property
    * train/eval hygiene needs (row-level rand() samples can split a
    * document across sets on retry). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(bucket(key) < lit(hexThreshold(fraction)))

  /** Assign a stable split label from cumulative fractions, e.g.
    * `splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)`.
    * Fractions must sum to 1 (±1 hash step). */
  def hashSplit(key: Column, splits: Seq[(String, Double)]): Column = {
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions sum to $total, not 1")
    val b = bucket(key)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    // the last split is the catch-all (its cut is 1.0 by the require),
    // so fold over init only — no dead when-branch
    splits.map(_._1).zip(cuts).init.foldRight(lit(splits.last._1): Column) {
      case ((name, cut), rest) =>
        when(b < lit(hexThreshold(cut)), lit(name)).otherwise(rest)
    }
  }

  /** Deterministic training-order shuffle: assign every row a
    * content-keyed shard and a stable position within it, so a training
    * run replays the identical order from any retry (and
    * [[graft.sinks.Sinks.shardedExport]] can lay the files out in it).
    *
    * SIZE SHARDS, DON'T COUNT THEM: the per-shard position is a
    * row_number window — one sort task per shard — so `nShards` must
    * scale with the corpus (fixed shard SIZE, e.g. corpus_rows /
    * rows_per_shard), never stay a small constant. With thousands of
    * shards each holding a bounded row count, the window sort is
    * embarrassingly parallel; with 8 shards over 100 TB it would funnel
    * the corpus through 8 sort tasks. The gate query uses 8 only because
    * the test corpus is 500 rows. */
  def shuffleAssignment(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, "nShards must be positive")
    val k = md5(concat(keyStr(key), lit(":shuffle")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), key)
    df.withColumn("__key", k)
      // 15 hex chars = 60 hash bits, NOT the 4 the fraction samplers use:
      // the doc above mandates nShards that scale with the corpus, and a
      // 16-bit value caps effective shards at 65536 with heavy modulo
      // bias well below that (at nShards=40000, shards 0..25535 would
      // get 2 hash values each vs 1 — 2× window-sort skew; above 65536
      // every extra shard would stay permanently empty). 60 bits keeps
      // the modulo near-uniform at any plausible shard count and still
      // fits both engines' signed 64-bit ints (the DuckDB oracle runs
      // the same substr(md5, 1, 15) expression).
      .withColumn("shard",
        conv(substring(col("__key"), 1, 15), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(w))
      .drop("__key")
  }

  /** Exact-N-per-group deterministic sample: within each group, keep
    * the `n` rows with the smallest md5(key) — the balanced-subset
    * selector (equal docs per source for evals/ablations) where
    * [[hashSample]]'s fraction form would track group SIZE. Stable
    * across re-runs and partitioning like every selector here.
    *
    * Two-phase salted top-N: a single-window form sorts each group in
    * ONE task, so a giant group (half the corpus from "common-crawl")
    * becomes a straggler sort at scale. Phase 1 splits every group
    * across `salts` deterministic key-hash slices and takes each
    * slice's top n — window partitions bounded by groupsize/salts;
    * phase 2 re-ranks the survivors, at most salts·n rows per group.
    * Any global top-n row is its slice's top-n too, so the result is
    * IDENTICAL to the single-window form, at two bounded windows
    * instead of one unbounded one.
    *
    * PRECONDITION: `key` must be unique within each group (document ids
    * are). Duplicate keys tie on both md5(key) and the key tie-break,
    * and which of the tied ROWS survives the cut then follows
    * partition-dependent arrival order — determinism holds at the key
    * level only. */
  def takePerGroup(df: DataFrame, group: Column, key: Column,
                   n: Int, salts: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "n must be positive")
    require(salts > 0, "salts must be positive")
    val rank = Seq(md5(keyStr(key)), key)
    val w1 = Window.partitionBy(group, col("__salt")).orderBy(rank: _*)
    val w2 = Window.partitionBy(group).orderBy(rank: _*)
    df.withColumn("__salt", pmod(xxhash64(keyStr(key)), lit(salts)))
      .withColumn("__rk1", row_number().over(w1))
      .where(col("__rk1") <= n)
      .withColumn("__rk", row_number().over(w2))
      .where(col("__rk") <= n)
      .drop("__salt", "__rk1", "__rk")
  }

  /** Mix a corpus by per-source sampling rates (upweighting by repeat
    * is a separate explode step): keep each row with its source's rate,
    * defaulting to `defaultRate` for unlisted sources. One narrow pass. */
  def mixBySource(df: DataFrame, source: Column, key: Column,
                  rates: Map[String, Double],
                  defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldRight(lit(hexThreshold(defaultRate))) {
      case ((src, f), rest) =>
        when(source === lit(src), lit(hexThreshold(f))).otherwise(rest)
    }
    df.where(bucket(key) < rate)
  }

  /** The UNCAPPED 2¹⁶-grid rate behind both temperature forms:
    * th16ᵢ = round(65536 · T · wᵢ / (Σw · nᵢ)) — th16/65536 IS the
    * source's target rate, which [[mixByTemperature]] clamps to keep-at-
    * most-once and [[mixByTemperatureRepeat]] splits into whole copies
    * plus a fractional hash keep. */
  private def temperatureTh16(sizes: Seq[(String, Long)], tau: Double,
                              targetRows: Long): Seq[(String, Long, BigInt)] = {
    require(tau > 0.0 && tau <= 1.0, "tau in (0, 1]")
    require(targetRows >= 0L, "targetRows must be >= 0")
    require(sizes.forall(_._2 >= 0L), "source sizes must be >= 0")
    val ws = sizes.map { case (s, n) =>
      val p = if (tau == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, tau)
      (s, n, BigInt(math.round(p * (1L << 20))))
    }
    val sw = ws.map(_._3).sum
    ws.map { case (s, n, w) =>
      val den = sw * n * 2
      val th16 =
        if (den.signum == 0) BigInt(0) // empty source (or corpus): keep none
        else (BigInt(2) * 65536 * targetRows * w + sw * n) / den
      (s, n, th16)
    }
  }

  /** Per-source 4-hex keep thresholds for TEMPERATURE-scaled mixture
    * sampling (the multilingual "τ-sampling" recipe: sampling mass
    * qᵢ ∝ nᵢ^τ, so τ = 1 keeps natural proportions and τ → 0
    * flattens toward uniform): source i keeps
    * rateᵢ = min(1, T·qᵢ / nᵢ) of its rows toward a `targetRows`
    * total of T.
    *
    * Exactness contract: the weight wᵢ = round(nᵢ^τ · 2²⁰) and the
    * 2¹⁶-grid threshold round(65536 · T · wᵢ / (Σw · nᵢ)) are computed
    * in BigInt (no Long overflow at 100 TB source sizes, where
    * T·wᵢ·65536 exceeds 2⁶³), and at τ = 0.5 the weight rides
    * `math.sqrt` — the one power IEEE 754 rounds EXACTLY, so any
    * engine reproduces every threshold bit-for-bit (the gate's DuckDB
    * oracle recomputes them from scratch). Other τ go through
    * `math.pow`, whose final-ulp rounding is libm-specific — fine for
    * production sampling, not for a cross-engine hash compare. */
  private[graft] def temperatureThresholds(sizes: Seq[(String, Long)],
                                           tau: Double,
                                           targetRows: Long): Map[String, String] =
    temperatureTh16(sizes, tau, targetRows).map { case (s, _, th) =>
      val capped = th.min(65536)
      s -> (if (capped >= 65536) "g" else f"${capped.toInt}%04x")
    }.toMap

  /** The shared bounded per-source count behind both mixture forms:
    * ONE aggregation, collected to the driver at one row per distinct
    * source, `maxSources` loud-fail (the collect itself is
    * limit-capped, so an unexpectedly high-cardinality source column
    * cannot flood the driver before the check fires). */
  private def sourceSizes(df: DataFrame, source: Column,
                          maxSources: Int): Seq[(String, Long)] = {
    val rows = df.where(source.isNotNull)
      .groupBy(source.cast("string").as("__src")).count()
      .limit(maxSources + 1).collect()
    require(rows.length <= maxSources,
      s"more than $maxSources sources — raise maxSources explicitly " +
        "if the mixture really has that many components")
    rows.toSeq.map(r => (r.getString(0), r.getLong(1)))
  }

  /** Leakage-safe split column: assign train/eval by the DUP-CLUSTER id
    * (e.g. [[graft.dedup.Dedup.canonicalFromPairs]]' `canonical_id`)
    * instead of the raw document id, so every near-duplicate cluster
    * lands WHOLLY in one split. Splitting on doc_id lets one copy of a
    * duplicated document train while its twin evaluates — the classic
    * eval-contamination path a dedup pass alone doesn't close when
    * borderline pairs survive. Same cumulative-fraction contract and
    * `:split` hash domain as [[hashSplit]]. */
  def leakageSafeSplit(canonical: Column,
                       splits: Seq[(String, Double)]): Column =
    hashSplit(concat(keyStr(canonical), lit(":split")), splits)

  /** Temperature-mix a corpus toward `targetRows` total rows: ONE
    * bounded per-source count (driver rows = distinct sources,
    * `maxSources` loud-fail), thresholds via
    * [[temperatureThresholds]], then one narrow broadcast-joined
    * hash-filter pass — no per-source scan, no rate column wider than
    * a 4-char string crosses the exchange. Null-source rows drop (no
    * qᵢ to sample them under — [[mixBySource]]'s defaultRate = 0
    * convention). Whole-key determinism as everywhere in this module:
    * the md5 bucket is keyed, so retries and SF changes keep the same
    * documents. */
  def mixByTemperature(df: DataFrame, source: Column, key: Column,
                       tau: Double, targetRows: Long,
                       // 1<<16 (was 1<<20 through r13): a temperature
                       // mixture is over CORPUS components (tens to
                       // thousands), and the driver holds one (string,
                       // long) per source plus a broadcast threshold
                       // table of the same width — 65k already implies
                       // a mis-keyed source column (e.g. doc_id), which
                       // should fail loudly, not broadcast a million-row
                       // threshold table. Deliberate; raise per call
                       // for genuinely wide mixtures.
                       maxSources: Int = 1 << 16): DataFrame =
    applyMixThresholds(df, source, key,
      temperatureThresholds(sourceSizes(df, source, maxSources),
        tau, targetRows))

  /** The shared keep pass behind the capped mixture forms: broadcast
    * the (source → 4-hex threshold) table, keep rows whose keyed md5
    * bucket clears their source's threshold. With `failOnUnknown`
    * (the FromState forms, whose thresholds derive from a table the
    * input didn't produce), a non-null source absent from the
    * threshold table raises in the executor instead of silently
    * vanishing from the mixture — same loud-fail discipline as
    * `maxSources`; null-source rows still drop (no qᵢ). */
  private def applyMixThresholds(df: DataFrame, source: Column,
                                 key: Column,
                                 th: Map[String, String],
                                 failOnUnknown: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rates = th.toSeq.toDF("__src", "__th16")
    val keep = substring(md5(concat(keyStr(key), lit(":tmix"))), 1, 4)
      .<(col("__th16"))
    if (!failOnUnknown)
      df.join(broadcast(rates), source.cast("string") === col("__src"))
        .where(keep)
        .drop("__src", "__th16")
    else
      df.where(source.isNotNull)
        .join(broadcast(rates), source.cast("string") === col("__src"), "left")
        .where(when(col("__th16").isNull,
          raise_error(concat(lit("source '"), source.cast("string"),
            lit("' has no persisted state count — fold it into the " +
              "state before mixing from state"))).cast("boolean"))
          .otherwise(keep))
        .drop("__src", "__th16")
  }

  /** Per-source row counts answered from persisted profile state ALONE
    * (a [[graft.meta.ProfileState]] per-group state written with a
    * constant value column — its `n` IS the source's row count): the
    * rolling-corpus path where mixture rates derive from the
    * state-folded counts of everything ingested so far, with ZERO
    * corpus passes at mix time. Bounded driver read (`maxSources`
    * loud-fail), same shape as every FromState read in this library. */
  def sourceSizesFromState(spark: SparkSession, statePath: String,
                           maxSources: Int = 1 << 16): Seq[(String, Long)] = {
    val rows = graft.core.GenState.read(spark, statePath)
      .groupBy(col("group")).agg(sum(col("n")).as("n"))
      .limit(maxSources + 1).collect()
    require(rows.length <= maxSources,
      s"more than $maxSources sources in state — raise maxSources " +
        "explicitly if the mixture really has that many components")
    rows.toSeq.map(r => (r.getString(0), r.getLong(1)))
  }

  /** [[mixByTemperature]] with the rates derived from persisted
    * state counts ([[sourceSizesFromState]]) instead of a corpus
    * count pass — identical keep semantics and hash domain on the
    * state-covered sources, so a state that folded the same corpus
    * produces the identical mixture (the
    * `corpus_mix_temperature_incremental` gate's invariant). A
    * non-null source present in `df` but ABSENT from the state (rows
    * ingested after the last fold) raises loudly in the keep pass
    * rather than silently vanishing — fold the new source's counts
    * first. */
  def mixByTemperatureFromState(df: DataFrame, source: Column, key: Column,
                                tau: Double, targetRows: Long,
                                statePath: String,
                                maxSources: Int = 1 << 16): DataFrame =
    applyMixThresholds(df, source, key,
      temperatureThresholds(
        sourceSizesFromState(df.sparkSession, statePath, maxSources),
        tau, targetRows),
      failOnUnknown = true)

  /** [[mixByTemperature]] WITHOUT the keep-at-most-once clamp: a source
    * whose target rate exceeds 1 REPEATS (the "epochs per dataset" that
    * real training mixtures give their small high-value components) —
    * every row yields `floor(rate)` copies plus one more when its keyed
    * hash clears the fractional remainder, exactly
    * [[Packing.repeatByWeight]]'s convention but with the rate split
    * integer-exactly on the 2¹⁶ grid (no Double weight column, so the
    * whole/frac split cannot round differently across engines). Output
    * gains `copy_idx` (0-based). `maxCopies` is the runaway guard: a
    * mis-set target against a 1-row source would otherwise explode a
    * quadrillion rows — fail loudly instead. */
  def mixByTemperatureRepeat(df: DataFrame, source: Column, key: Column,
                             tau: Double, targetRows: Long,
                             maxCopies: Long = 1000L,
                             maxSources: Int = 1 << 16): DataFrame =
    applyRepeatThresholds(df, source, key, maxCopies,
      temperatureTh16(sourceSizes(df, source, maxSources),
        tau, targetRows))

  /** [[mixByTemperatureRepeat]] with the rates derived from persisted
    * state counts ([[sourceSizesFromState]]) — the rolling-corpus
    * UPSAMPLING path: a small high-value source's epochs-per-dataset
    * rate derives from the state-folded counts of everything ingested
    * so far, zero corpus-count passes at mix time. Identical copy
    * semantics and `:tmixr` hash domain as the corpus-counted form
    * (the `corpus_mix_temperature_epochs_incremental` gate's
    * invariant); a non-null source absent from the state raises
    * loudly, same as [[mixByTemperatureFromState]]. */
  def mixByTemperatureRepeatFromState(df: DataFrame, source: Column,
                                      key: Column, tau: Double,
                                      targetRows: Long, statePath: String,
                                      maxCopies: Long = 1000L,
                                      maxSources: Int = 1 << 16): DataFrame =
    applyRepeatThresholds(df, source, key, maxCopies,
      temperatureTh16(
        sourceSizesFromState(df.sparkSession, statePath, maxSources),
        tau, targetRows),
      failOnUnknown = true)

  /** The shared repeat pass behind both epochs forms: whole copies
    * (th16 / 65536) + one fractional-keep copy on the 2¹⁶ grid, with
    * the `maxCopies` runaway guard checked against every threshold
    * BEFORE the explode. `failOnUnknown` as in [[applyMixThresholds]]:
    * thresholds that didn't come from the input itself raise on a
    * source they don't cover instead of dropping it. */
  private def applyRepeatThresholds(df: DataFrame, source: Column,
                                    key: Column, maxCopies: Long,
                                    th16: Seq[(String, Long, BigInt)],
                                    failOnUnknown: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the whole-copy count becomes an Int column below: a maxCopies
    // past Int range would let `(th / 65536).toInt` wrap negative and
    // silently DROP the source instead of repeating it
    require(maxCopies >= 0L && maxCopies < Int.MaxValue.toLong,
      "maxCopies must fit an Int (a 2^31-copy explode is never intended)")
    th16.foreach { case (s, _, th) =>
      require(th / 65536 <= maxCopies,
        s"source '$s' would repeat ${th / 65536}x (> maxCopies=" +
          s"$maxCopies) — check targetRows, or raise maxCopies " +
          "explicitly for a genuinely tiny high-value source")
    }
    val rates = th16.map { case (s, _, th) =>
      (s, (th / 65536).toInt, f"${(th % 65536).toInt}%04x")
    }.toDF("__src", "__whole", "__rem")
    val copies = col("__whole") +
      when(substring(md5(concat(keyStr(key), lit(":tmixr"))), 1, 4)
        < col("__rem"), 1).otherwise(0)
    val joined =
      if (!failOnUnknown)
        df.join(broadcast(rates), source.cast("string") === col("__src"))
      else
        df.where(source.isNotNull)
          .join(broadcast(rates), source.cast("string") === col("__src"),
            "left")
          .where(when(col("__whole").isNull,
            raise_error(concat(lit("source '"), source.cast("string"),
              lit("' has no persisted state count — fold it into the " +
                "state before mixing from state"))).cast("boolean"))
            .otherwise(lit(true)))
    joined
      .withColumn("copy_idx",
        explode(when(copies >= 1, sequence(lit(0), copies - 1))
          .otherwise(array().cast("array<int>"))))
      .drop("__src", "__whole", "__rem")
  }
}
