package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.DeltaLog
import graft.dedup.{Dedup, SigSeen, UrlSeen}
import graft.ingest.CdxLog

/** The atomic generation cutover shared by every rolling index:
  * in-place compaction lands as the first delta of generation N+1 and
  * becomes current the instant its `_SUCCESS` marker lands — readers
  * see exactly the old OR the new state (never neither, never both), a
  * crash mid-cutover leaves an invisible orphan the retry overwrites,
  * post-cutover folds land in the new generation, and pruning keeps
  * the previous state. Proven on all three DeltaLog families plus the
  * bucketed minhash store. */
class DeltaGenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_gen_$tag")
    p.toFile.deleteOnExit()
    p.toString + "/idx"
  }

  private def fold(path: String, b: Long, rows: (Long, String)*) =
    UrlSeen.foldBatch(rows.toDF("doc_id", "url"),
      col("doc_id"), col("url"), path, b).collect()

  private def urlState(path: String): Set[(String, Long, Long)] =
    UrlSeen.read(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def fs(path: String) = DeltaLog.fsRoot(spark, path)._1

  test("UrlSeen compactInPlace: state preserved, folds land in the " +
      "new generation, watermark/replay semantics survive") {
    val path = tmp("url")
    fold(path, 1L, 1L -> "https://a.example/x", 2L -> "https://b.example/y")
    fold(path, 2L, 3L -> "https://c.example/z")
    val before = urlState(path)
    assert(DeltaLog.generation(spark, path) === 0L)

    val gen = UrlSeen.compactInPlace(spark, path)
    assert(gen === 1L)
    assert(DeltaLog.generation(spark, path) === 1L)
    assert(urlState(path) === before)
    assert(UrlSeen.watermark(spark, path) === Some(2L))
    // one delta, min-folded, under the generation dir
    assert(DeltaLog.committedDeltas(spark, path).map(_._1) === Seq(2L))
    assert(DeltaLog.committedDeltas(spark, path).head._2
      .contains(DeltaLog.genDir(path, 1L)))

    // a post-cutover fold lands IN the new generation
    fold(path, 3L, 9L -> "https://d.example/w")
    assert(fs(path).exists(new org.apache.hadoop.fs.Path(
      DeltaLog.deltaDir(DeltaLog.genDir(path, 1L), 3L), "_SUCCESS")))
    assert(urlState(path).size === 4)

    // the watermark batch stays replayable; an older id fails loudly
    val st = urlState(path)
    fold(path, 3L, 9L -> "https://d.example/w") // replay: no-op
    assert(urlState(path) === st)
    val err = intercept[IllegalArgumentException] {
      fold(path, 1L, 99L -> "https://e.example/v")
    }
    assert(err.getMessage.contains("out-of-order"))

    // health reports the generation
    assert(UrlSeen.health(spark, path).generation === 1L)
  }

  test("crashed cutover is invisible: readers stay on the old state " +
      "until _SUCCESS lands, and the retry overwrites the orphan") {
    val path = tmp("crash")
    fold(path, 1L, 1L -> "https://a.example/x")
    fold(path, 2L, 2L -> "https://b.example/y")
    val before = urlState(path)

    // simulate a compaction killed between data write and commit: the
    // gen-1 delta exists with parquet but NO _SUCCESS marker
    val genDelta = DeltaLog.deltaDir(DeltaLog.genDir(path, 1L), 2L)
    UrlSeen.read(spark, path).write.mode("overwrite").parquet(genDelta)
    val success = new org.apache.hadoop.fs.Path(genDelta, "_SUCCESS")
    fs(path).delete(success, false)

    // old state stays current: never neither, never both
    assert(DeltaLog.generation(spark, path) === 0L)
    assert(urlState(path) === before)
    assert(UrlSeen.watermark(spark, path) === Some(2L))

    // the single create that IS the pointer flip: marker lands → new
    fs(path).create(success).close()
    assert(DeltaLog.generation(spark, path) === 1L)
    assert(urlState(path) === before)

    // and a retry over a crashed orphan overwrites it cleanly
    fs(path).delete(new org.apache.hadoop.fs.Path(
      DeltaLog.genDir(path, 1L)), true)
    assert(DeltaLog.generation(spark, path) === 0L)
    assert(UrlSeen.compactInPlace(spark, path) === 1L)
    assert(urlState(path) === before)
  }

  test("pruneGenerations keeps current + previous, retires the rest") {
    val path = tmp("prune")
    fold(path, 1L, 1L -> "https://a.example/x")
    assert(UrlSeen.compactInPlace(spark, path) === 1L)
    fold(path, 2L, 2L -> "https://b.example/y")
    assert(UrlSeen.compactInPlace(spark, path) === 2L)
    val state = urlState(path)

    // legacy root deltas + gen-1 + gen-2 all on disk pre-prune
    val rootP = new org.apache.hadoop.fs.Path(path)
    def names() = fs(path).listStatus(rootP).map(_.getPath.getName).toSet
    assert(names().exists(_.startsWith(DeltaLog.deltaPrefix)))

    val deleted1 = DeltaLog.pruneGenerations(spark, path)
    // keep = {gen-2, gen-1}; the legacy root delta retires
    assert(deleted1.nonEmpty)
    assert(!names().exists(_.startsWith(DeltaLog.deltaPrefix)))
    assert(names().contains("gen-" + "%016d".format(1L)))
    assert(urlState(path) === state)

    // idempotent: nothing left to prune
    assert(DeltaLog.pruneGenerations(spark, path).isEmpty)

    // third cutover retires gen-1 on the next prune
    fold(path, 3L, 3L -> "https://c.example/z")
    assert(UrlSeen.compactInPlace(spark, path) === 3L)
    val deleted2 = DeltaLog.pruneGenerations(spark, path)
    assert(deleted2.exists(_.contains("%016d".format(1L))))
    assert(names().contains("gen-" + "%016d".format(2L)))
    assert(DeltaLog.generation(spark, path) === 3L)
    assert(urlState(path).size === 3)
  }

  test("compactIfFragmented: a long fold loop self-maintains to a " +
      "bounded file count with the lifecycle contract intact") {
    val path = tmp("loop")
    var cutovers = 0
    for (b <- 1 to 12) {
      fold(path, b.toLong, (100L + b) -> s"https://h$b.example/p")
      if (UrlSeen.compactIfFragmented(spark, path, maxFiles = 3)
          .isDefined) cutovers += 1
    }
    // maintenance actually ran, repeatedly, and kept reads bounded
    assert(cutovers >= 2)
    val l = DeltaLog.listing(spark, path)
    assert(l.deltas.map(_.parquetFiles).sum <= 3 + 32,
      s"unbounded file count: $l") // one fold's worth above the trigger
    assert(DeltaLog.generation(spark, path).toInt === cutovers)
    // state is exactly the 12 folded URLs at their true first batches
    assert(urlState(path) ===
      (1 to 12).map(b => (s"https://h$b.example/p", b.toLong, 100L + b))
        .toSet)
    // watermark survived every cutover; replay + monotone guard intact
    assert(UrlSeen.watermark(spark, path) === Some(12L))
    val st = urlState(path)
    fold(path, 12L, 112L -> "https://h12.example/p") // replay: no-op
    assert(urlState(path) === st)
    intercept[IllegalArgumentException] {
      fold(path, 5L, 999L -> "https://new.example/q")
    }
    // prune kept at most current + previous generations on disk
    val gens = fs(path)
      .listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith(DeltaLog.genPrefix))
    assert(gens.length <= 2, gens.mkString(","))

    // convergence: once the state is a SINGLE compacted delta, the
    // maintenance call is a no-op even when that delta alone exceeds
    // the threshold — no rewrite-forever loop
    UrlSeen.compactIfFragmented(spark, path, maxFiles = 1) // settle
    val genAfter = DeltaLog.generation(spark, path)
    assert(DeltaLog.listing(spark, path).deltas.size === 1)
    assert(UrlSeen.compactIfFragmented(spark, path, maxFiles = 1).isEmpty)
    assert(DeltaLog.generation(spark, path) === genAfter)
  }

  test("hostile generation names are ignored: junk dirs, overflow " +
      "numbers, and plain files never shadow the real state") {
    val path = tmp("hostile")
    fold(path, 1L, 1L -> "https://a.example/x")
    val before = urlState(path)
    val f = fs(path)
    val root = new org.apache.hadoop.fs.Path(path)
    f.mkdirs(new org.apache.hadoop.fs.Path(root, "gen-xyz"))
    f.mkdirs(new org.apache.hadoop.fs.Path(root, "gen-"))
    f.mkdirs(new org.apache.hadoop.fs.Path(root,
      "gen-99999999999999999999")) // > Long.Max: parse fails, ignored
    f.create(new org.apache.hadoop.fs.Path(root,
      "gen-0000000000000005")).close() // a FILE, not a dir
    assert(DeltaLog.generation(spark, path) === 0L)
    assert(urlState(path) === before)
    assert(UrlSeen.compactInPlace(spark, path) === 1L)
    assert(urlState(path) === before)
  }

  test("SigSeen and CdxLog ride the same cutover") {
    // SigSeen
    val sp = tmp("sig")
    def sigFold(b: Long, rows: (Long, Long)*) =
      SigSeen.foldBatch(rows.toDF("doc_id", "sig"),
        col("doc_id"), col("sig"), sp, b).collect()
    sigFold(1L, 1L -> 0x00L, 2L -> 0xFF00FF00FF00FF00L)
    sigFold(2L, 3L -> 0x0F0F0F0F0F0F0F0FL)
    val sigBefore = SigSeen.read(spark, sp).collect().map(_.toSeq).toSet
    assert(SigSeen.compactInPlace(spark, sp) === 1L)
    assert(SigSeen.read(spark, sp).collect().map(_.toSeq).toSet === sigBefore)
    assert(SigSeen.health(spark, sp).generation === 1L)
    sigFold(3L, 9L -> 0x01L) // within radius of 0x00 → seen; lands in gen 1
    assert(SigSeen.watermark(spark, sp) === Some(3L))
    assert(fs(sp).exists(new org.apache.hadoop.fs.Path(
      DeltaLog.deltaDir(DeltaLog.genDir(sp, 1L), 3L), "_SUCCESS")))

    // CdxLog
    val cp = tmp("cdx")
    val shard = graft.ingest.Warc.buildWarcGz(Seq(
      graft.ingest.Warc.WarcSpecRec("resource", "<urn:uuid:r-1>",
        Some("https://a.example/"), "2026-01-02T03:04:05Z",
        "text/plain", "hello".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))))
    val files = Seq((1L, shard)).toDF("file_id", "payload")
    CdxLog.append(spark, files, col("file_id"), col("payload"), cp, 1L)
    val cdxBefore = CdxLog.read(spark, cp).drop("batch_id")
      .collect().map(_.toSeq).toSet
    assert(CdxLog.compactInPlace(spark, cp) === 1L)
    assert(CdxLog.read(spark, cp).drop("batch_id")
      .collect().map(_.toSeq).toSet === cdxBefore)
    assert(CdxLog.health(spark, cp).generation === 1L)
    CdxLog.append(spark, Seq((2L, shard)).toDF("file_id", "payload"),
      col("file_id"), col("payload"), cp, 2L)
    assert(CdxLog.read(spark, cp).count() === cdxBefore.size * 2L)
  }

  test("minhash store: in-place compaction cuts over atomically and " +
      "queries/appends resolve the new generation") {
    val path = tmp("mh")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "entirely different content with no overlap at all"))
      .toDF("id", "text")
    Dedup.writeMinhashIndex(docs, col("id"), col("text"), path,
      k = 8, bands = 4, buckets = 2)
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val before = Dedup.queryMinhashIndex(batch, col("id"), col("text"),
      path, 0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.contains((10L, 1L)))

    assert(Dedup.minhashIndexGeneration(spark, path) === 0L)
    assert(Dedup.compactMinhashIndexInPlace(spark, path) === 1L)
    assert(Dedup.minhashIndexGeneration(spark, path) === 1L)
    assert(Dedup.minhashIndexRoot(spark, path)
      .endsWith(DeltaLog.genDir(path, 1L)))
    val after = Dedup.queryMinhashIndex(batch, col("id"), col("text"),
      path, 0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before)

    // a crashed cutover (no params/_SUCCESS) is invisible
    val orphan = DeltaLog.genDir(path, 2L)
    fs(path).mkdirs(new org.apache.hadoop.fs.Path(orphan, "shingles"))
    assert(Dedup.minhashIndexGeneration(spark, path) === 1L)
    fs(path).delete(new org.apache.hadoop.fs.Path(orphan), true)

    // appends land in the current generation and remain queryable
    Dedup.appendToMinhashIndex(
      Seq((20L, "entirely different content with no overlap at all"))
        .toDF("id", "text"),
      col("id"), col("text"), path, probeHealth = false)
    val q2 = Dedup.queryMinhashIndex(
      Seq((30L, "entirely different content with no overlap at all"))
        .toDF("id", "text"),
      col("id"), col("text"), path, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q2.contains((30L, 3L)) && q2.contains((30L, 20L)))

    // second cutover + prune retires the legacy flat tables and keeps
    // current + previous generation dirs
    assert(Dedup.compactMinhashIndexInPlace(spark, path) === 2L)
    val deleted = Dedup.pruneMinhashGenerations(spark, path)
    assert(deleted.exists(_.endsWith("shingles")))
    val top = fs(path).listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).toSet
    assert(!top.contains("shingles") && !top.contains("params"))
    assert(top.contains("gen-" + "%016d".format(1L)))
    val q3 = Dedup.queryMinhashIndex(batch, col("id"), col("text"),
      path, 0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q3.contains((10L, 1L)))
  }
}
