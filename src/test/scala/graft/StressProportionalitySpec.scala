package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** The duplication-squared stress invariant, regression-proofed: on a
  * clique-replicated corpus (every base doc becomes an R-clique of
  * near-dups — the duplicate-rich crawl shape), the banded-LSH CANDIDATE
  * volume must stay proportional to the TRUE near-dup pair volume, never
  * drifting toward the all-pairs quadratic. This is the "no all-pairs"
  * design promise BASELINE.md's round-10 probe verified by hand; here it
  * is a machine check.
  *
  * OPT-IN: heavy-ish and probabilistic by nature, so it runs only under
  * `sbt -Dgraft.stress=1 test` (or GRAFT_STRESS=1) — skipped (canceled)
  * by default. See API.md "Stress checks".
  */
class StressProportionalitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def optedIn: Boolean =
    sys.props.get("graft.stress").contains("1") ||
      sys.env.get("GRAFT_STRESS").contains("1")

  /** N base docs of distinct pseudo-random token text, each replicated
    * R times with a tiny per-replica perturbation: within-clique shingle
    * Jaccard ≈ 0.9, cross-clique ≈ 0. True near-dup pairs = N * C(R,2). */
  private def cliqueCorpus(n: Int, r: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).flatMap { d =>
      val toks = Array.fill(30)(java.lang.Long.toString(rnd.nextLong().abs, 36))
      (0 until r).map { rep =>
        // perturb by APPENDING one short replica token: within-clique
        // char-shingle Jaccard stays ≳ 0.9 (above the 0.8 verify
        // threshold), every replica still distinct (exact dedup finds
        // nothing), cross-clique similarity stays ≈ 0
        val suffix = java.lang.Long.toString((d.toLong * 31 + rep).abs % 1296, 36) + rep
        (d.toLong * r + rep, (toks :+ suffix).mkString(" "))
      }
    }
    rows.toDF("doc_id", "text")
  }

  test("banded minhash candidates stay proportional to true pair volume") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    val n = 400
    val r = 5
    val docs = cliqueCorpus(n, r, seed = 0xA11CE).cache()
    val truePairs = n.toLong * (r * (r - 1) / 2) // 400 * 10 = 4000
    val allPairs = {
      val m = n.toLong * r
      m * (m - 1) / 2 // 1,999,000 — what an all-pairs drift looks like
    }

    // replicate minhashPairs' banding stage (same bandKeys seam, same
    // k/bands defaults) to count CANDIDATES before verification
    val k = 24; val bands = 8
    val sigd = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), k))
    val banded = sigd.select(col("doc_id"),
        posexplode(Dedup.bandKeys(col("sig"), bands, k / bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandKey")
    val candidates = banded.select(col("band"), col("bandKey"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("bandKey"), col("doc_id").as("id_b")),
        Seq("band", "bandKey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .count()

    // proportionality: candidates track the true pair volume (≤ 4× slack
    // for band-hash coincidences), nowhere near the all-pairs quadratic
    assert(candidates <= 4L * truePairs,
      s"$candidates candidates for $truePairs true pairs — banding is " +
        s"drifting toward all-pairs ($allPairs)")
    assert(candidates >= truePairs / 2,
      s"only $candidates candidates for $truePairs true pairs — banding " +
        "is dropping the clique structure it exists to find")

    // end-to-end recall/precision through the verified operator: exact
    // Jaccard kills cross-clique coincidences (≤ true), band-miss loses
    // only the documented small tail (≥ 80%)
    val verified = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      k = k, bands = bands, threshold = 0.8).count()
    assert(verified <= truePairs,
      s"$verified verified pairs exceed the $truePairs planted ones")
    assert(verified >= (truePairs * 0.8).toLong,
      s"$verified verified of $truePairs planted — recall collapsed")
    docs.unpersist()
    ()
  }

  test("exact-duplicate floods collapse before banding: band input is " +
      "O(distinct classes), the viral clique comes back whole") {
    // always-on (cheap and fully deterministic, unlike the probabilistic
    // clique legs): one doc replicated 1,000x — the 40%-boilerplate
    // crawl shape — plus 50 distinct docs. Banding raw documents would
    // feed 1050 x 8 rows into the band self-join and emit ~500k
    // candidate pairs from ONE bucket before any verify; the collapse
    // bands one representative per content class.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def freshText() =
      Array.fill(30)(java.lang.Long.toString(rnd.nextLong().abs, 36))
        .mkString(" ")
    val viral = freshText()
    val docs = ((0 until 1000).map(i => (i.toLong, viral)) ++
      (0 until 50).map(d => (1000L + d, freshText()))).toDF("doc_id", "text")
    // the exact frame minhashPairs self-joins (bandedClasses seam):
    // one row per (content class, band) — 51 x 8, NOT 1050 x 8
    val keyed = docs.select(col("doc_id"),
        Dedup.shingles(col("text")).as("sh"))
      .withColumn("cls", Dedup.shingleClassKey(col("sh")))
    val classes = keyed.groupBy(col("cls")).agg(first(col("sh")).as("sh"))
    assert(Dedup.bandedClasses(classes, k = 24, bands = 8).count() ===
      51L * 8, "band-join input must be one row per class per band")
    // the verified operator still returns the FULL viral clique, all
    // at Jaccard exactly 1.0 — collapse changes cost, never rows
    val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"))
      .where(col("id_a") < 1000 && col("id_b") < 1000)
    assert(pairs.where(col("jaccard") === 1.0).count() === 1000L * 999 / 2)
  }

  test("signature floods collapse before chunking: chunk input is " +
      "O(distinct signatures), Hamming-0 cliques come back whole") {
    // always-on, deterministic: the hammingPairs twin of the leg above
    // (the media dedup family — image/GIF/audio/video — all ride this
    // front, so a re-encoded viral meme is exactly this shape)
    import spark.implicits._
    val sigs = ((0 until 1000).map(i => (i.toLong, 0x1234L)) ++
      (0 until 50).map(d => (1000L + d, 0x7ABCD0000L + d.toLong * 1024)))
      .toDF("doc_id", "sig")
    val chunked = Dedup.simhashKeys(
      sigs.select(col("sig")).distinct(), maxHamming = 7,
      wideTables = false)
    assert(chunked.count() === 51L * 8,
      "chunk-join input must be one row per distinct signature per table")
    val pairs = Dedup.hammingPairs(sigs, col("doc_id"), col("sig"),
        maxHamming = 7, wideTables = Some(false))
      .where(col("id_a") < 1000 && col("id_b") < 1000)
    assert(pairs.where(col("hamming") === 0).count() === 1000L * 999 / 2)
  }

  test("embedding-vector floods collapse before banding: band input is " +
      "O(distinct vectors), the identical-vector clique comes back whole") {
    // always-on, deterministic: the cosineNearDupPairs twin of the
    // minhash/Hamming flood legs — the LAST raw-banding front closed.
    // One vector replicated 1,000x (the re-embedded boilerplate shape)
    // plus 50 distinct vectors: banding raw rows would feed 1050 x bands
    // rows into the band self-join and emit ~500k candidates from ONE
    // bucket (the Hamming prefilter cannot help — identical vectors
    // have identical signatures); the collapse bands one representative
    // per distinct vector.
    import spark.implicits._
    import graft.similarity.Ann
    val rnd = new scala.util.Random(13)
    def freshVec() = Array.fill(16)(rnd.nextDouble() * 2 - 1)
    val viral = freshVec()
    val rows = ((0 until 1000).map(i => (i.toLong, viral)) ++
      (0 until 50).map(d => (1000L + d, freshVec()))).toDF("vec_id", "vec")
    // the exact frame cosineNearDupPairs self-joins (bandedVectorClasses
    // seam): one row per (vector class, band) — 51 x 8, NOT 1050 x 8
    val classes = rows
      .select(col("vec_id"), col("vec").cast("array<double>").as("v0"))
      .withColumn("cls", Ann.vecClassKey(col("v0")))
      .groupBy(col("cls")).agg(first(col("v0")).as("v0"))
    assert(Ann.bandedVectorClasses(classes, bands = 8, bandBits = 4,
      centered = false, center = Array.empty).count() === 51L * 8,
      "band-join input must be one row per distinct vector per band")
    // the verified operator still returns the FULL viral clique, all at
    // the exact self-cosine (1.0 for a real vector) — collapse changes
    // cost, never rows; run BOTH signature modes (they band differently
    // but the within-class path is mode-independent)
    for (centered <- Seq(true, false)) {
      val pairs = Ann.cosineNearDupPairs(rows, col("vec_id"), col("vec"),
          threshold = 0.95, centered = centered)
        .where(col("id_a") < 1000 && col("id_b") < 1000)
      assert(pairs.where(col("sim") === 1.0).count() === 1000L * 999 / 2,
        s"centered=$centered: the viral clique must come back whole")
    }
  }

  test("cross-corpus floods collapse: an exact re-crawl batch pairs " +
      "through its content class, full recall at Jaccard 1.0") {
    // always-on, deterministic: the minhashPairsAcross twin of the
    // self-pair flood leg — a batch that is mostly byte-identical
    // re-fetches of one stored page (the dominant rolling-crawl shape)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def freshText() =
      Array.fill(30)(java.lang.Long.toString(rnd.nextLong().abs, 36))
        .mkString(" ")
    val texts = Vector.fill(40)(freshText())
    val existing = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val batch = ((0 until 500).map(i => (1000L + i, texts(0))) ++
      (0 until 10).map(i => (2000L + i, freshText())))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsAcross(batch, existing,
      col("doc_id"), col("text"))
    // every replicated fetch pairs with stored doc 0, all at exactly
    // 1.0 — through the shared content class, no banding involved
    assert(pairs.where(col("id_b") === 0 && col("jaccard") === 1.0)
      .count() === 500)
    // and the fresh docs pair with nothing (distinct random token sets)
    assert(pairs.where(col("id_a") >= 2000L).count() === 0)
  }

  test("simhash block candidates stay proportional on the clique corpus") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    val n = 300
    val r = 4
    val docs = cliqueCorpus(n, r, seed = 0xB0B).cache()
    val truePairs = n.toLong * (r * (r - 1) / 2)
    // simhashPairs output rows are (id_a, id_b, hamming ≤ maxHamming)
    // candidates post-verification; near-identical replicas land within
    // 3 bits of each other virtually always, cross-clique 64-bit
    // signatures agree within 3 bits with probability ~binom(64,≤3)/2^64
    val out = Dedup.simhashPairs(docs, col("doc_id"), col("text"),
      maxHamming = 3).count()
    assert(out <= 2L * truePairs,
      s"$out simhash pairs for $truePairs planted — block tables are " +
        "emitting far beyond the clique structure")
    docs.unpersist()
    ()
  }

  test("UrlSeen: 50-batch delta log reads exactly, compaction preserves it") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    import spark.implicits._
    import graft.dedup.UrlSeen
    val dir = java.nio.file.Files.createTempDirectory("graft_urlstress")
    val path = dir.toString + "/idx"
    // 50 folds: each batch re-crawls HALF its predecessor's URLs and
    // adds new ones — the delta log must accumulate only first sights
    for (b <- 1L to 50L) {
      val rows = (0L until 40L).map { j =>
        val u = (b - 1) * 20 + j // overlap: urls [20(b-1), 20(b-1)+39]
        (b * 1000 + j, s"https://s.example/p/$u")
      }
      UrlSeen.foldBatch(rows.toDF("doc_id", "url"),
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("url"), path, b)
    }
    val got = UrlSeen.read(spark, path).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // from-scratch expectation: url u's first sight is the EARLIEST
    // batch whose [20(b-1), 20(b-1)+39] window covers it
    assert(got.size === 20 * 49 + 40)
    for (u <- Seq(0L, 19L, 20L, 500L, 999L, 20L * 49 + 39)) {
      val b = (1L to 50L)
        .find(b => u >= 20 * (b - 1) && u <= 20 * (b - 1) + 39).get
      val doc = b * 1000 + (u - 20 * (b - 1))
      assert(got(s"https://s.example/p/$u") === ((b, doc)),
        s"u=$u expected first batch $b doc $doc")
    }
    assert(UrlSeen.watermark(spark, path) === Some(50L))
    val dest = dir.toString + "/compacted"
    UrlSeen.compact(spark, path, dest)
    val cg = UrlSeen.read(spark, dest).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cg === got, "compaction must preserve the state exactly")
    ()
  }

  test("span removal stays exact under a corpus-wide viral span") {
    assume(optedIn, "stress checks run under -Dgraft.stress=1")
    // the hot-span shape: ONE boilerplate 5-gram in EVERY document
    // (df = n). The df aggregate must collapse it to one build row —
    // structurally there is no pair join here, so the check is
    // exactness at 20× fixture scale: the min-id doc keeps its text
    // byte-identical, every other doc loses exactly the span's 5
    // positions, unique tails survive untouched.
    import spark.implicits._
    val n = 3000
    val boiler = "all rights reserved terms apply"
    val rows = (0L until n.toLong).map { i =>
      (i, s"u${i}a u${i}b $boiler u${i}c u${i}d u${i}e")
    }
    val out = Dedup.removeDuplicatedSpans(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3))))
      .toMap
    assert(out(0L) === ((s"u0a u0b $boiler u0c u0d u0e", 0L)))
    (1L until n.toLong).foreach { i =>
      assert(out(i) === ((s"u${i}a u${i}b u${i}c u${i}d u${i}e", 5L)))
    }
    ()
  }
}
