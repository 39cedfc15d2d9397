package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Delims
import graft.dedup.Dedup
import graft.ingest.KvStore
import graft.ops.KvOps
import graft.text.TextOps

/** Adversarial-input net: operators must not throw (and should do
  * something sensible) on empty text, exotic whitespace, unicode, nulls,
  * and delimiter-bearing payload values. */
class HostileDataSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val hostile = Seq(
    (1L, ""),
    (2L, "   \t  "),
    (3L, "a\u000Bb vertical tab"),
    (4L, "ünïcödé Ω≈ç √∫ emoji 🎉🎊 text"),
    (5L, "x" * 5000),
    (6L, "normal words in a normal document the end"),
    (7L, "normal words in a normal document the end")
  ).toDF("doc_id", "text")

  test("text operators survive hostile documents") {
    val out = hostile.select(
      col("doc_id"),
      TextOps.tokenCount(col("text")).as("n"),
      TextOps.qualityStruct(col("text")).as("q"),
      TextOps.langId(col("text")).as("lang"),
      TextOps.fingerprint(col("text")).as("fp"),
      TextOps.rollingFingerprint(col("text")).as("rfp"),
      Dedup.shingles(col("text")).as("sh")).collect()
    assert(out.length === 7)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("n") === 0)
    assert(byId(2L).getAs[Int]("n") === 0)
    // identical docs fingerprint identically
    assert(byId(6L).getAs[Long]("fp") === byId(7L).getAs[Long]("fp"))
  }

  test("dedup pipelines survive hostile documents and pair the dupes") {
    val pairs = Dedup.minhashPairs(hostile, col("doc_id"), col("text"),
        k = 24, bands = 8, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((6L, 7L)))
    // empty/whitespace docs normalize identically → they may pair too; no throw
    Dedup.simhashPairs(hostile, col("doc_id"), col("text")).collect()
    Dedup.ngramJaccardPairs(hostile, col("doc_id"), col("text")).collect()
    Dedup.ngramContainmentPairs(hostile, col("doc_id"), col("text")).collect()
  }

  test("lone surrogates survive every byte-level kernel deterministically") {
    // malformed UTF-16 — unpaired high/low surrogates and an inverted
    // pair — exercises the String→UTF8String conversion boundary under
    // every codegen kernel: the kernels must neither throw nor produce
    // run-dependent bytes (Spark substitutes the replacement char at
    // conversion, so two evaluations of the same row must agree)
    val weird = Seq(
      (1L, "\uD83C incomplete high surrogate"),
      (2L, "trailing lone low \uDC00"),
      (3L, "inverted \uDC00\uD800 pair"),
      (4L, "🎉 proper astral pair"))
      .toDF("doc_id", "text")
    def pass() = weird.select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n"),
        TextOps.qualityStruct(col("text")).as("q"),
        TextOps.langId(col("text")).as("lang"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.nfcClean(col("text")).as("clean"),
        Dedup.simhash64(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Int]("n"), r.getAs[String]("lang"),
          r.getAs[Long]("fp"), r.getAs[Long]("sig"))))
      .toMap
    val a = pass()
    assert(a.size === 4)
    assert(a.values.forall(_._1 > 0), "surrogate docs still carry tokens")
    assert(pass() === a, "malformed input must evaluate deterministically")
  }

  test("exactCanonical annotates null-text documents instead of dropping them") {
    // md5(null) is null, and a plain equi-join back would silently drop
    // every null-text row — the null-safe join keeps them as one group
    val d = Seq((1L, "same"), (2L, "same"),
      (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.exactCanonical(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L), "every input id annotated")
    assert(out(1L) === ((1L, 2L)) && out(2L) === ((1L, 2L)))
    assert(out(3L) === ((3L, 2L)) && out(4L) === ((3L, 2L)))
  }

  test("LM scoring and BPE stats survive hostile documents") {
    val lm = TextOps.lmTypicality(hostile, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // token-less docs (empty, whitespace) are unscored, not crashed
    assert(!lm.contains(1L) && !lm.contains(2L))
    // identical docs score identically; every score is a valid ppm
    assert(lm(6L) === lm(7L))
    assert(lm.values.forall(v => v >= 0L && v <= 1000000L))
    val bp = TextOps.bpePairStats(hostile, col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(bp.nonEmpty)
    assert(bp.forall(_._1.length == 2))
    // the 5000-char "xxxx…" doc dominates the pair counts
    assert(bp.head._1 === "xx")
  }

  test("BPE train and encode survive hostile documents") {
    val withNull = hostile.unionByName(
      Seq((8L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val merges = TextOps.trainBpeMerges(withNull, col("text"),
      numMerges = 10, maxVocabWords = 100)
    // the duplicated normal docs guarantee at least one repeated pair
    assert(merges.nonEmpty)
    val out = withNull.select(col("doc_id"),
        TextOps.bpeTokens(col("text"), merges).as("t"),
        TextOps.bpeTokenCount(col("text"), merges).as("n"),
        concat_ws("", TextOps.tokens(TextOps.normalized(col("text"))))
          .as("joined_words"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getSeq[String](1)), if (r.isNullAt(2)) -1 else r.getInt(2)),
          r.getString(3)))
      .toMap
    assert(out.size === 8)
    assert(out(1L)._1._2 === 0)               // empty text: zero tokens
    assert(out(8L)._1._1.isEmpty && out(8L)._1._2 === -1) // null stays null
    // lossless on EVERY doc: concatenated subword tokens rebuild the
    // concatenated normalized words exactly ("unicode-hostile" chars are
    // normalized away, which is the tokenize contract, not a BPE
    // property) — the invariant the bpe_encode gate pins
    (1L to 7L).foreach { d =>
      assert(out(d)._1._1.get.mkString("") === out(d)._2,
        s"doc $d: BPE roundtrip lost or mangled content")
    }
    assert(out(4L)._1._1.get.mkString("").nonEmpty,
      "unicode doc must survive with content, not normalize to nothing")
    assert(out(6L)._1 === out(7L)._1, "identical docs must encode identically")
  }

  test("semantic dedup survives null, empty, and zero embeddings") {
    import graft.similarity.SemDedup
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),          // exact dup of 1
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),          // zero vector
      (4L, Array.empty[Float]),                      // empty vector
      (5L, null.asInstanceOf[Array[Float]]),         // null vector
      (6L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = SemDedup.semanticNearDupPairs(vecs, col("vec_id"),
        col("embedding"), nClusters = 2, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the exact dup surfaces; no degenerate vector ever pairs (a zero
    // or missing vector has no cosine) and nothing throws
    assert(pairs.contains((1L, 2L)))
    assert(pairs.forall { case (a, b) => a < b && a <= 2L && b <= 2L })
    val labels = SemDedup.semanticDedup(vecs, col("vec_id"),
        col("embedding"), nClusters = 2, threshold = 0.95, maxIters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 6)
    assert(labels(2L) === 1L)                 // dup collapses to min id
    assert(Seq(3L, 4L, 5L, 6L).forall(i => labels(i) === i))
  }

  test("rolling-ingestion and PQ surfaces tolerate empty vectors") {
    // the ingest face of the empty-vector contract: a missing embedding
    // in an APPEND batch (or an inline-trained corpus) is the same
    // routine dirty data the query surfaces already exclude — it must
    // be skipped, never indexed, and never crash the job via the
    // dot/encode kernels' 0-vs-dim throw
    import java.nio.file.Files
    import graft.similarity.{Ann, Pq}
    val clean = (1L to 12L).map(i => (i,
      Array.tabulate(8)(d => if (d == (i % 8).toInt) 1.0f else 0.01f * i)))
      .toDF("cid", "cvec")
    val dirty = Seq(
      (13L, Array.tabulate(8)(_ => 0.5f)),
      (14L, Array.empty[Float])).toDF("cid", "cvec")
    val q = Seq(
      (1L, Array.tabulate(8)(d => if (d == 1) 1.0f else 0.0f)),
      (2L, Array.empty[Float])).toDF("qid", "qvec")

    val ivfPath = Files.createTempDirectory("graft_dirty_ivf").toString + "/i"
    Ann.writeIvfIndex(clean, ivfPath, nClusters = 4, iters = 1, buckets = 2)
    Ann.appendToIvfIndex(dirty, ivfPath)
    val grown = Ann.queryIvfIndex(q, ivfPath, k = 3, nprobe = 4).collect()
    assert(grown.nonEmpty)
    assert(grown.forall(_.getLong(0) == 1L), "empty-qvec query excluded")
    assert(grown.forall(_.getLong(1) != 14L), "empty vector never indexed")

    val pqPath = Files.createTempDirectory("graft_dirty_ivfpq").toString + "/i"
    Pq.writeIvfPqIndex(clean.unionByName(dirty), pqPath, dim = 8, m = 4,
      nCentroids = 4, nClusters = 4, iters = 1, buckets = 2)
    Pq.appendToIvfPqIndex(dirty, pqPath)
    val pq = Pq.queryIvfPqIndex(q, pqPath, k = 3, nprobe = 4).collect()
    assert(pq.nonEmpty)
    assert(pq.forall(r => r.getLong(0) == 1L && r.getLong(1) != 14L))

    // in-line train + encode over the dirty corpus (adcTopK trains its
    // own codebook here — the path that walks every kernel)
    val adc = Pq.adcTopK(q, clean.unionByName(dirty), k = 3, dim = 8,
      m = 4, nCentroids = 4, iters = 1).collect()
    assert(adc.nonEmpty)
    assert(adc.forall(r => r.getLong(0) == 1L && r.getLong(1) != 14L))
  }

  test("dedupLines bounds a pathological million-line document") {
    // one document whose line count dwarfs the corpus — the per-doc
    // reassembly buffer must stay bounded by maxLinesPerDoc, and the
    // default cap must let a full million lines through intact
    val monster = (0 until 1000000).map(i => s"line $i").mkString("\n")
    val docs = Seq((1L, monster), (2L, "a\nb"), (3L, "a\nb")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, col("doc_id"), col("text"),
        maxOccurrences = 2)
      .select(col("doc_id"), col("n_lines")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1000000L) // default cap (2^20) admits all of it
    assert(out(2L) === 2L)

    // a tighter cap truncates the monster to its first N lines, counts
    // included — and the truncation is uniform, so surviving text is
    // exactly the first-N reassembly
    val capped = Dedup.dedupLines(docs, col("doc_id"), col("text"),
        maxOccurrences = 2, maxLinesPerDoc = 1000)
      .where(col("doc_id") === 1L)
      .select(col("n_lines"), col("text")).head()
    assert(capped.getLong(0) === 1000L)
    assert(capped.getString(1) ===
      (0 until 1000).map(i => s"line $i").mkString("\n"))
  }

  test("dedupLines keeps null-text documents as empty docs") {
    // split(null) is null and posexplode of null emits no rows — a
    // null-text doc would silently vanish, breaking the documented
    // every-document-survives contract; it must read as an empty doc
    val docs = Seq((1L, "a\nb"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text")).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(2L) === "")
  }

  test("delimiter-bearing values round-trip with escaping on") {
    val D = Delims.Delim
    val src = Seq(
      ("k1", "q", s"value${D}with delim", "second"),
      ("k1", "q", "value\nwith newline", s"also${D}delim"),
      ("k1", "q", s"token ${Delims.NullByteReplace} inside", "x"),
      ("k1", "q", "plain", "y")
    ).toDF("k", "q", "v1", "v2")
    // per-part escaping: structural separators stay raw, so each FIELD
    // decodes unambiguously even when parts contain the delimiter
    val kv = KvStore.pack(src, Seq(col("k")), col("q"),
      Seq(col("v1"), col("v2")), escapeValues = true)
    val back = KvStore.unpack(kv, unescapeValues = true)
      .select(element_at(col("fields"), 1).as("v1"),
        element_at(col("fields"), 2).as("v2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = src.select("v1", "v2")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === expected)
    // without escaping these values corrupt the field layout
    val kvRaw = KvStore.pack(src, Seq(col("k")), col("q"),
      Seq(col("v1"), col("v2")))
    val backRaw = KvStore.unpack(kvRaw)
      .select("packedValue").as[String].collect()
    assert(backRaw.exists(v =>
      graft.core.Splits.keepTrailing(v, D).length != 2))
  }

  test("escaped NUL-bearing values survive the FULL store lifecycle") {
    // the parquet leg the in-memory round-trip above cannot cover: raw
    // NUL payload bytes (the DEFAULT field delimiter) through
    // pack(escape) → salted store WRITE → READ → unpack(unescape). The
    // oracle gate pack_escaped_roundtrip drives the same lifecycle with
    // '|' because DuckDB varchars cannot carry NUL — this test is the
    // NUL leg of that pair.
    val D = Delims.Delim
    val src = Seq(
      ("k1", "q", s"value${D}with delim", "second"),
      ("k2", "q", "value\nwith newline", s"also${D}delim"),
      ("k3", "q", s"token ${Delims.NullByteReplace} inside", D + D))
      .toDF("k", "q", "v1", "v2")
    val kv = KvStore.pack(src, Seq(col("k")), col("q"),
      Seq(col("v1"), col("v2")), escapeValues = true)
    val store = java.nio.file.Files.createTempDirectory("graft_esc_store")
      .resolve("store").toString
    KvStore.write(kv, store)
    val back = KvStore.unpack(KvStore.read(spark, store),
        unescapeValues = true)
      .select(element_at(col("fields"), 1).as("v1"),
        element_at(col("fields"), 2).as("v2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = src.select("v1", "v2")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === expected)
  }

  test("escape/unescape is a lossless prefix code") {
    val tricky = Seq(
      Delims.NullByteReplace,                       // the token itself
      Delims.NullByteReplace + "n",                 // token + tag char
      Delims.NullByteReplace + Delims.NullByteReplace,
      Delims.Delim + "\n" + Delims.NullByteReplace + "0",
      "").toDF("v")
    val out = tricky
      .select(col("v"), KvOps.unescapeValue(KvOps.escapeValue(col("v"))).as("r"))
      .collect()
    for (r <- out) assert(r.getString(1) === r.getString(0), s"for ${r.getString(0)}")
  }

  test("quality/token formulas agree with the oracle's unicode semantics") {
    // The q_ppm/n_tokens gate oracles (corpus_budget_*, corpus_top_m*,
    // curriculum_bins, weighted_quantiles*) assume the two engines agree
    // on three unicode contracts over arbitrary corpus text:
    //   1. length() counts Unicode CODE POINTS (so an NFD combining mark
    //      or an astral emoji counts once, never by UTF-16 units/bytes);
    //   2. the alpha class [A-Za-z] is ASCII-only;
    //   3. the tokenizer whitespace class is the ASCII
    //      [ \t\n\x0b\f\r] — Java's default (non-UNICODE_CHARACTER_CLASS)
    //      \s, which the oracle spells explicitly — so NBSP/U+2028/
    //      ideographic space DO NOT split.
    // This leg pins the SPARK side of each contract to a JVM
    // codepoint-exact reference of the DuckDB formula, over the
    // parquet-round-tripped strings both engines actually read. Lone
    // surrogates are UTF-8-unencodable: the round trip normalizes them
    // to '?' on BOTH sides (asserted below), so post-parquet agreement
    // is structural.
    val nfc = "caf\u00e9" // precomposed: 4 cps
    val nfd = "cafe\u0301" // e + combining acute: 5 cps
    val cases = Seq(
      (1L, nfc), (2L, nfd),
      (3L, "\ud835\udd4f\ud83d\ude00 ab"), // astral (non-ASCII), 2 letters
      (4L, "\ud800x"), (5L, "x\udc00"), // lone surrogates
      (6L, "\udc00\ud800"), // inverted surrogate pair
      (7L, "a\u00a0b\u2028c\u3000d"), // unicode spaces: 1 token
      (8L, "a\u200bb\ufeffc"), // zero-width space, BOM
      (9L, "a\u0301\u0302\u0303"), // combining stack: 4 cps, 1 letter
      (10L, ""), (11L, "a\u000bb\r\nc")) // ASCII VT + CRLF: 3 tokens
    val dir = java.nio.file.Files.createTempDirectory("graft_hostile_uni")
    dir.toFile.deleteOnExit()
    val pq = dir.resolve("docs").toString
    cases.toDF("doc_id", "text").write.parquet(pq)
    val back = spark.read.parquet(pq)

    // the DuckDB formulas, codepoint-exact on the JVM
    def cps(s: String): Int = s.codePointCount(0, s.length)
    def letters(s: String): Int =
      s.codePoints().toArray.count(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
    def qRef(s: String): Long =
      math.round(letters(s).toDouble / math.max(cps(s), 1) * 1e6)
    def tokRef(s: String): Long = {
      var n = 0L; var in = false
      s.foreach { c =>
        val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r'
        if (ws) in = false else if (!in) { n += 1; in = true }
      }
      n
    }

    val got = back.select(col("doc_id"),
        round(TextOps.qualityStruct(col("text")).getField("alpha_ratio")
          * 1e6, 0).cast("long").as("q_ppm"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    cases.foreach { case (id, orig) =>
      val (q, t, s) = got(id)
      // both engines read the SAME post-parquet bytes: the UTF-8
      // encode/decode of the original (lone surrogates → '?')
      val roundTripped = new String(
        orig.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(s === roundTripped, s"doc $id parquet round-trip")
      assert(q === qRef(s), s"doc $id q_ppm vs codepoint reference")
      assert(t === tokRef(s), s"doc $id n_tokens vs ASCII-\\s reference")
    }
    // pinned absolutes: a silent both-sides drift (e.g. a length()
    // that starts counting UTF-16 units) cannot pass these
    assert(got(1L)._1 === 750000L, "NFC café: 3 letters / 4 cps")
    assert(got(2L)._1 === 800000L,
      "NFD: 4 ASCII letters / 5 cps — the combining mark counts once")
    assert(got(3L)._1 === 400000L, "astral: 2 letters / 5 cps")
    assert(got(7L)._2 === 1L, "unicode whitespace must NOT tokenize")
    assert(got(11L)._2 === 3L, "ASCII \\v \\r\\n must tokenize")
  }

  test("escape pair protects a CUSTOM delimiter end to end") {
    // pack with '|' and values CONTAINING '|' — the escape pair must
    // shield the custom delimiter, not the default NUL
    val df = Seq(("k1", "q", "a|b", "c"), ("k1", "q", "plain", "d|e"))
      .toDF("k", "q", "v1", "v2")
    val kv = KvStore.pack(df, Seq(col("k")), col("q"),
      Seq(col("v1"), col("v2")), escapeValues = true, delim = "|")
    val back = KvStore.unpack(kv, unescapeValues = true, delim = "|")
      .select(col("fields")).collect()
      .map(_.getSeq[String](0).toList).sortBy(_.mkString)
    assert(back.toList === List(List("a|b", "c"), List("plain", "d|e")))
  }
}
