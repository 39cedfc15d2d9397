package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Ann
import graft.text.TextOps

/** Engine-verified checks for the extension operators whose hashes are
  * not expressible in the DuckDB oracle: MinHash/SimHash/LSH are compared
  * against the exact algorithms on sf0.001 (fixed data → deterministic
  * recall), fingerprints and the multimodal stubs against their
  * contracts. */
class ExtensionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables(spark, dir, "documents")
  private def embeddings = Tables(spark, dir, "embeddings")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exactPairs: Set[(Long, Long)] = pairSet(
    Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 2, maxDf = 100, threshold = 0.8))

  test("minhash pairs: exact precision, high recall vs exact jaccard") {
    val mh = pairSet(Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      k = 24, bands = 8, threshold = 0.8))
    assert(exactPairs.nonEmpty, "fixture should contain planted near-dups")
    // post-verification makes every reported pair exactly-correct
    assert(mh.subsetOf(exactPairs))
    // banded LSH at s>=0.8, r=3,b=8: expected recall >~ 1-(1-0.8^3)^8 ≈ 0.995
    val recall = mh.size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"recall $recall (found ${mh.size}/${exactPairs.size})")
  }

  test("salted takePerGroup equals the single-window form on a skewed frame") {
    import graft.text.Sampling
    // one giant group (the scale hazard) + small groups + a group
    // smaller than n
    val rows = (1L to 5000L).map(i => ("giant", i)) ++
      (1L to 40L).map(i => ("small", 100000L + i)) ++
      Seq(("tiny", 999999L))
    val df = rows.toDF("src", "id")
    val got = Sampling.takePerGroup(df, col("src"), col("id"), n = 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // expected: per group, the 7 smallest (md5(id), id) keys — computed
    // independently of any window machinery
    val md5hex = (l: Long) => java.security.MessageDigest.getInstance("MD5")
      .digest(l.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (_, i) => (md5hex(i), i) }.take(7)
    }.toSet
    assert(got === expected)
    assert(got.count(_._1 == "giant") === 7)
    assert(got.count(_._1 == "small") === 7)
    assert(got.count(_._1 == "tiny") === 1)
    // and the salt count must not change the answer
    val withFewSalts = Sampling.takePerGroup(df, col("src"), col("id"),
        n = 7, salts = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(withFewSalts === expected)
  }

  test("paragraph-granularity dedupLines drops repeated multi-line blocks") {
    val block = "about us\ncontact\nlegal"
    val d = Seq(
      (1L, s"$block\n\nreal paragraph one"),
      (2L, s"$block\n\nreal paragraph two"),
      (3L, s"$block\n\nanother body")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, col("doc_id"), col("text"),
        maxOccurrences = 2, delimiter = "\\n{2,}", joiner = "\n\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the 3-line nav block repeats 3x ACROSS docs — line mode would see
    // its lines; paragraph mode drops the block as one unit
    assert(out(1L) === "real paragraph one")
    assert(out(2L) === "real paragraph two")
    assert(out(3L) === "another body")
  }

  test("lmTypicality scores by hand-checkable integer unigram math") {
    // corpus: "a a a b" and "a c" → counts a=4, b=1, c=1; N=6, V=3
    val d = Seq((1L, "a a a b"), (2L, "a c"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextOps.lmTypicality(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val pA = (4L + 1) * 1000000L / 9   // (c+1)*1e6 / (N+V) = 555555
    val p1 = (1L + 1) * 1000000L / 9   // 222222 for b and c
    assert(out(1L) === ((4L, 1L, (3 * pA + p1) / 4)))
    assert(out(2L) === ((2L, 1L, (pA + p1) / 2)))
    assert(!out.contains(3L), "token-less docs are not scored")
  }

  test("bpePairStats counts the BPE first-merge pair frequencies") {
    // "hello hello help" → pairs: he x3, el x3, ll x2, lo x2, lp x1
    val d = Seq((1L, "hello hello"), (2L, "help!")).toDF("doc_id", "text")
    val out = TextOps.bpePairStats(d, col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out === List("el" -> 3L, "he" -> 3L, "ll" -> 2L, "lo" -> 2L,
      "lp" -> 1L))
  }

  test("line dedup strips corpus-repeated lines, keeps order, keeps empty docs") {
    val boiler = "accept our cookies"
    val d = Seq(
      (1L, s"$boiler\nunique alpha\nmiddle one\n$boiler"),
      (2L, s"$boiler\nunique beta"),
      (3L, s"$boiler"), // all-boilerplate doc must survive as empty text
      (4L, "unique gamma\nunique delta")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, col("doc_id"), col("text"),
        maxOccurrences = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // boiler occurs 4x > 2 → dropped everywhere; survivors keep order
    assert(out(1L) === (("unique alpha\nmiddle one", 4L, 2L)))
    assert(out(2L) === (("unique beta", 2L, 1L)))
    assert(out(3L) === (("", 1L, 1L)))
    assert(out(4L) === (("unique gamma\nunique delta", 2L, 0L)))
  }

  test("duplicated-span stats count cross-doc spans, not within-doc repeats") {
    val d = Seq(
      (1L, "one two three four five six"),      // shares 5-spans with doc 2
      (2L, "one two three four five seven"),
      (3L, "a b c d e a b c d e a b c d e"),    // only WITHIN-doc repetition
      (4L, "totally different words here now")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(d, col("doc_id"), col("text"), n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1/2: spans = 2 distinct 5-grams each, exactly one shared
    assert(out(1L) === ((2L, 1L)) && out(2L) === ((2L, 1L)))
    // doc 3's spans repeat internally but appear in no OTHER doc
    assert(out(3L)._2 === 0L)
    assert(out(4L)._2 === 0L)
  }

  test("containment catches a quoted document that Jaccard misses") {
    // B embeds A verbatim inside much more text: containment(A in B) = 1
    // while jaccard(A, B) is far below any dedup threshold
    val a = (1 to 30).map(i => s"tok$i").mkString(" ")
    val b = a + " " + (100 to 220).map(i => s"pad$i").mkString(" ")
    val two = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(two, col("doc_id"), col("text"),
        n = 3, maxDf = 100, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq === Seq((1L, 2L, 1.0)), s"got ${cont.toSeq}")
    val jac = Dedup.ngramJaccardPairs(two, col("doc_id"), col("text"),
      n = 3, maxDf = 100, threshold = 0.5)
    assert(jac.count() === 0, "jaccard should miss the asymmetric pair")
  }

  test("simhash finds the planted high-similarity pairs") {
    val sh = pairSet(Dedup.simhashPairs(docs, col("doc_id"), col("text"),
      maxHamming = 7))
    assert(sh.nonEmpty)
    val strong = pairSet(Dedup.ngramJaccardPairs(docs, col("doc_id"),
      col("text"), n = 2, maxDf = 100, threshold = 0.95))
    if (strong.nonEmpty) {
      val recall = strong.count(sh.contains).toDouble / strong.size
      assert(recall >= 0.6, s"simhash recall on >=0.95-jaccard pairs: $recall")
    }
  }

  test("simhash wide tables: identical pairs, candidates shrink at the bucket floor") {
    // the 100 TB hazard the block-pair tables fix: with n diverse docs
    // (≈uniform signatures), 8×8-bit chunk tables floor at ~n²·8/2⁸
    // accidental bucket collisions; 36 ~14-bit block-pair tables floor
    // ~16× lower (n²·36/2¹⁴). Unique-token docs give the uniform regime;
    // 10 planted near-dups must still surface identically in both.
    // NOTE tokens must survive normalization intact (no '_' — the
    // normalizer splits on it) or every doc shares the numeric tokens
    // and the signatures correlate
    val docs = ((0 until 500).map { i =>
      (i.toLong, (1 to 40).map(j => s"u${i}x$j").mkString(" "))
    } ++ (0 until 10).map { i =>
      (1000L + i, (1 to 40).map(j =>
        if (j == 7) s"edited$i" else s"u${i}x$j").mkString(" "))
    }).toDF("doc_id", "text")
    val sigd = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
    def candidates(wide: Boolean): Long = {
      val k = Dedup.simhashKeys(sigd, maxHamming = 7, wideTables = wide)
      k.select(col("chunk"), col("ckey"), col("doc_id").as("id_a"))
        .join(k.select(col("chunk"), col("ckey"), col("doc_id").as("id_b")),
          Seq("chunk", "ckey"))
        .where(col("id_a") < col("id_b"))
        .count()
    }
    val narrow = candidates(wide = false)
    val wide = candidates(wide = true)
    assert(wide < narrow / 4,
      s"block-pair tables should collapse the candidate flood: wide=$wide narrow=$narrow")
    // both schemes are exhaustive at radius 7 → identical verified pairs
    val pw = pairSet(Dedup.simhashPairs(docs, col("doc_id"), col("text"),
      maxHamming = 7, wideTables = Some(true)))
    val pn = pairSet(Dedup.simhashPairs(docs, col("doc_id"), col("text"),
      maxHamming = 7, wideTables = Some(false)))
    assert(pw === pn)
    assert(pw.nonEmpty, "planted near-dups should be within radius 7")
    // auto-selection measures the corpus: uniform sigs → wide tables;
    // a null-text (null-signature) row must not crash the sampler
    val withNull = sigd.unionByName(
      Seq(Tuple1(9999L)).toDF("doc_id").select(col("doc_id"),
        lit(null).cast("long").as("sig")))
    assert(Dedup.chooseWideTables(withNull))
    // a strongly-correlated corpus (one base doc, small edits) → narrow
    val hotSigs = ((0 until 100).map { i =>
      (i.toLong, (1 to 40).map(j =>
        if (j == (i % 5) + 1) s"edit$i" else s"base$j").mkString(" "))
    }).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
    assert(!Dedup.chooseWideTables(hotSigs))
  }

  test("quantized brute-force top-k attains high recall vs exact") {
    import graft.similarity.Ann
    val q = embeddings.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = embeddings.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = resultSet(Ann.bruteForceTopK(q, c, k = 10))
    val quant = resultSet(Ann.bruteForceTopKQuantized(q, c, k = 10, overscan = 4))
    val recall = exact.count(quant.contains).toDouble / exact.size
    assert(recall >= 0.9, s"int8-prefilter recall $recall")
  }

  test("lsh ann attains reasonable recall against brute force") {
    val q = embeddings.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = embeddings.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = resultSet(Ann.bruteForceTopK(q, c, k = 10))
    val approx = resultSet(Ann.lshTopK(q, c, k = 10, bands = 8, bandBits = 4))
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.3, s"lsh recall $recall") // 32 planes on 64-dim noise
  }

  test("ivf ann attains reasonable recall against brute force") {
    val q = embeddings.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = embeddings.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = resultSet(Ann.bruteForceTopK(q, c, k = 10))
    val approx = resultSet(Ann.ivfTopK(q, c, k = 10, nClusters = 16, nprobe = 4))
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.3, s"ivf recall $recall") // noise embeddings, 4/16 probes
  }

  test("canonicalFromPairs collapses transitive chains to the component min") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, singleton 20
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.canonicalFromPairs(ids, col("doc_id"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("hash sampling/splitting is deterministic, disjoint, and near-rate") {
    import graft.text.Sampling
    val ids = spark.range(0, 2000).toDF("id")
    val kept = Sampling.hashSample(ids, col("id"), 0.5)
    val n = kept.count()
    assert(math.abs(n - 1000L) < 120, s"$n not near 1000") // ±3.5σ
    // deterministic: same rows every run
    assert(kept.collect().map(_.getLong(0)).toSet ===
      Sampling.hashSample(ids, col("id"), 0.5).collect().map(_.getLong(0)).toSet)
    // nested fractions: the 0.25 sample is a subset of the 0.5 sample
    val small = Sampling.hashSample(ids, col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(kept.collect().map(_.getLong(0)).toSet))
    // splits: total partition, stable, roughly proportioned
    val split = ids.withColumn("split", Sampling.hashSplit(col("id"),
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1700 && counts("val") > 50 && counts("test") > 50)
    // mix: unlisted sources drop by default
    val mixed = graft.text.Sampling.mixBySource(
      ids.withColumn("src", when(col("id") % 2 === 0, "a").otherwise("b")),
      col("src"), col("id"), Map("a" -> 1.0))
    assert(mixed.where(col("src") === "b").count() === 0)
    assert(mixed.where(col("src") === "a").count() === 1000)
  }

  test("packBins assigns contiguous budget bins; repeatByWeight hits exact counts") {
    import graft.text.Packing
    // 5 chunks of 100 tokens, budget 250: exclusive cumsums 0,100,200,
    // 300,400 → bins 0,0,0,1,1 (overflow by at most one row's tokens)
    val chunks = (1 to 5).map(i => ("k", i, 100)).toDF("k", "ord", "n")
    val bins = Packing.packBins(chunks, col("k"), col("ord"), col("n"), 250)
      .orderBy(col("ord")).collect().map(_.getAs[Long]("bin_id")).toSeq
    assert(bins === Seq(0L, 0L, 0L, 1L, 1L))
    // integer weights repeat exactly; fractional weights match the hash
    // rate in aggregate and are deterministic per key
    val ids = spark.range(0, 1000).toDF("id")
    val doubled = Packing.repeatByWeight(ids, col("id"), lit(2.0))
    assert(doubled.count() === 2000)
    assert(doubled.groupBy("id").count().where(col("count") =!= 2).count() === 0)
    val some = Packing.repeatByWeight(ids, col("id"), lit(1.5))
    val n = some.count()
    assert(n > 1400 && n < 1600, s"$n not near 1500")
    assert(some.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ===
      Packing.repeatByWeight(ids, col("id"), lit(1.5))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("redaction scrubs emails, IPs, and phone-shaped numbers") {
    val out = Seq(
      "contact bob.smith+spam@example.co.uk or 192.168.1.254 now",
      "call 555-123-4567 about a@b.io",
      "clean text with version 1.2 and year 2024"
    ).toDF("text")
      .select(TextOps.redact(col("text")).as("r"),
        TextOps.redactionCount(col("text")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out(0) === ("contact <EMAIL> or <IP> now", 2))
    assert(out(1) === ("call <PHONE> about <EMAIL>", 2))
    assert(out(2) === ("clean text with version 1.2 and year 2024", 0))
  }

  test("langId is deterministic and in-domain") {
    val preds = docs.select(TextOps.langId(col("text"))).as[String].collect()
    val allowed = Set("en", "de", "es", "fr", "cjk", "und")
    assert(preds.forall(allowed.contains))
    val again = docs.select(TextOps.langId(col("text"))).as[String].collect()
    assert(preds.toSeq === again.toSeq)
  }

  test("fingerprints: identical normalized text → identical fp; edits change fp") {
    val df = Seq(
      ("a", "The quick brown fox jumps over the lazy dog"),
      ("b", "the quick  brown fox jumps over the lazy dog!"), // normalizes equal
      ("c", "an entirely different document about spark engines")
    ).toDF("id", "text")
      .select(col("id"), TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("a") === df("b"))
    assert(df("a") !== df("c"))
  }

  test("exact dedup canonical: duplicates map to min doc_id") {
    val withDup = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") === 7)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val out = Dedup.exactCanonical(withDup, col("doc_id"), col("text"))
    val dup = out.where(col("doc_id") === 10007).head()
    assert(dup.getAs[Long]("canonical_id") === 7L)
    assert(dup.getAs[Long]("n_copies") === 2L)
  }

  test("int8 quantization preserves cosine geometry and round-trips zeros") {
    import graft.similarity.Quantize
    val qs = Quantize.quantize(col("embedding"))
    val back = embeddings
      .select(col("vec_id"), col("embedding"),
        Quantize.dequantize(qs).as("deq"),
        qs.getField("q").as("q"))
    // codes stay in range, dequantized cosine vs original >= 0.995
    val rows = back.select(col("vec_id"),
        graft.ops.TextExprs.vecDot(
          graft.ops.TextExprs.l2normalize(col("embedding").cast("array<double>")),
          graft.ops.TextExprs.l2normalize(col("deq"))).as("cos"),
        array_max(col("q")).as("qmax"), array_min(col("q")).as("qmin"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("qmax") <= 127 && r.getAs[Int]("qmin") >= -127)
      assert(r.getAs[Double]("cos") >= 0.995,
        s"vec ${r.getAs[Long]("vec_id")} cos ${r.getAs[Double]("cos")}")
    }
    // zero vector → scale 0, all-zero codes, zero reconstruction
    val z = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(Quantize.quantize(col("embedding")).as("s"))
      .select(col("s.scale"), col("s.q")).head()
    assert(z.getDouble(0) === 0.0)
    assert(z.getSeq[Int](1).forall(_ == 0))
  }

  test("multimodal stub codec honors its contracts") {
    val payload = "hello multimodal world".getBytes("UTF-8")
    val f = Multimodal.FakeCodec.decodeFeatures(payload)
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0) < 1e-9) // normalized histogram
    assert(Multimodal.FakeCodec.resize(payload, 8).length === 8)
    assert(Multimodal.FakeCodec.sampleFrames(payload, 4).size === 4)

    val media = Multimodal.fromDocuments(docs.limit(20))
    val feats = Multimodal.decodeFeatures(spark, media, batchSize = 8).collect()
    assert(feats.length === 20)
    assert(feats.forall(_.features.length === 16))
    // checksum must equal md5 of the original text bytes
    val one = feats.minBy(_.doc_id)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(docs.orderBy("doc_id").limit(1).select("text").as[String].head()
        .getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(one.checksum === expected)
  }

  test("null payloads degrade to empty/unknown instead of NPEing the task") {
    // payload is a nullable binary column; the module's contract is that
    // malformed input degrades — a null row must not kill the stage
    val media = Seq(
      (1L, "text", "real".getBytes("UTF-8"), Map("k" -> "v")),
      (2L, "text", null.asInstanceOf[Array[Byte]], Map.empty[String, String]))
      .toDF("doc_id", "modality", "payload", "meta")
    val feats = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(2L).n_bytes === 0L)
    assert(feats(2L).features.length === 16)
    val metaRows = Multimodal.containerMeta(spark, media).collect()
      .map(c => c.doc_id -> c.format).toMap
    assert(metaRows(2L) === "unknown")
    val frames = Multimodal.sampleFrameTable(spark, media, n = 2)
    assert(frames.where(col("doc_id") === 2L).count() >= 0) // no NPE
  }

  test("hashed text embeddings surface the planted near-duplicate pairs") {
    import graft.ops.TextExprs
    import graft.text.TextOps
    val embedded = docs.select(col("doc_id").as("vec_id"),
      TextExprs.hashEmbed(TextOps.tokens(TextOps.normalized(col("text"))), 64)
        .as("embedding"))
    val pairs = Ann.cosineNearDupPairs(embedded, col("vec_id"), col("embedding"),
        threshold = 0.9, bands = 10, bandBits = 6)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty)
    val recall = exactPairs.count(pairs.contains).toDouble / exactPairs.size
    assert(recall >= 0.6, s"text-embed recall on exact near-dups: $recall")
  }

  test("frame sampling emits n deterministic frames per document") {
    val media = Multimodal.fromDocuments(docs.limit(10))
    val frames = Multimodal.sampleFrameTable(spark, media, n = 4).collect()
    assert(frames.length === 40)
    assert(frames.groupBy(_.doc_id).forall(_._2.map(_.frame_idx).sorted.toSeq
      === Seq(0, 1, 2, 3)))
    val again = Multimodal.sampleFrameTable(spark, media, n = 4).collect()
    assert(frames.map(f => (f.doc_id, f.frame_idx, f.checksum)).sorted.toSeq
      === again.map(f => (f.doc_id, f.frame_idx, f.checksum)).sorted.toSeq)
  }

  test("cosine matches a hand computation") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)))
      .toDF("a", "b")
      .select(Ann.cosine(Ann.asDouble(col("a")), Ann.asDouble(col("b"))).as("c"))
    val c = df.as[Double].head()
    assert(math.abs(c - 8.0 / 9.0) < 1e-12)
  }
}
