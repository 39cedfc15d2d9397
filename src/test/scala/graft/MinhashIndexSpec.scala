package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Persistent MinHash index: query-vs-index output must equal the
  * unindexed cross-corpus operator, the query must read the build's own
  * parameters, and the index side of the candidate join must come from
  * bucketed scans (the amortization property). */
class MinhashIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables(spark, dir, "documents")

  private def batchAndExisting = (
    docs.where(col("doc_id") % 5 === 0),
    docs.where(col("doc_id") % 5 =!= 0))

  test("indexed query equals minhashPairsAcross") {
    val (batch, existing) = batchAndExisting
    val path = Files.createTempDirectory("graft_mhidx").toString + "/idx"
    Dedup.writeMinhashIndex(existing, col("doc_id"), col("text"), path,
      k = 24, bands = 8, buckets = 4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = pairs(Dedup.queryMinhashIndex(batch, col("doc_id"),
      col("text"), path, threshold = 0.8))
    val direct = pairs(Dedup.minhashPairsAcross(batch, existing,
      col("doc_id"), col("text"), k = 24, bands = 8, threshold = 0.8))
    assert(direct.nonEmpty, "fixture should contain cross-side near-dups")
    assert(indexed === direct)
  }

  test("append ≡ rebuild: a grown index answers like one built whole") {
    // standing corpus A, later arrival B: build(A) + append(B) must
    // answer queries exactly like build(A ∪ B) — banding is param-frozen
    // and deterministic, so the appended tables are row-identical
    val a = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val grown = Files.createTempDirectory("graft_mhidx_g").toString + "/idx"
    val whole = Files.createTempDirectory("graft_mhidx_w").toString + "/idx"
    Dedup.writeMinhashIndex(a, col("doc_id"), col("text"), grown, buckets = 4)
    Dedup.appendToMinhashIndex(b, col("doc_id"), col("text"), grown)
    Dedup.writeMinhashIndex(a.unionByName(b), col("doc_id"), col("text"),
      whole, buckets = 4)
    def pairs(path: String) =
      Dedup.queryMinhashIndex(batch, col("doc_id"), col("text"), path,
          threshold = 0.8)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g = pairs(grown)
    assert(g.nonEmpty, "fixture should contain cross-side near-dups")
    assert(g === pairs(whole))
  }

  test("compaction rebuilds from the stored tables: same answers, one file per bucket") {
    val a = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val root = Files.createTempDirectory("graft_mhidx_c").toString
    val (src, dst) = (s"$root/idx", s"$root/compact")
    Dedup.writeMinhashIndex(a, col("doc_id"), col("text"), src, buckets = 4)
    Dedup.appendToMinhashIndex(b, col("doc_id"), col("text"), src)
    Dedup.compactMinhashIndex(spark, src, dst)
    def pairs(path: String) =
      Dedup.queryMinhashIndex(batch, col("doc_id"), col("text"), path,
          threshold = 0.8)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val compacted = pairs(dst)
    assert(compacted.nonEmpty && compacted === pairs(src))
    // fragmentation healed: exactly one file per bucket again (the
    // appended source holds strictly more)
    def files(p: String) = Option(new java.io.File(p).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(files(s"$dst/bands") === 4, s"got ${files(s"$dst/bands")}")
    assert(files(s"$dst/shingles") === 4)
    assert(files(s"$src/bands") > 4)
  }

  test("a replayed append leaves query results correct; compaction heals the store") {
    // appends are not atomic/idempotent (two sequential table writes) —
    // an orchestrator retry duplicates the batch's stored rows. The
    // query's output dedup must keep results identical, and compaction's
    // full-row dropDuplicates must restore a clean store.
    val a = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val root = Files.createTempDirectory("graft_mhidx_r").toString
    val (src, clean, dst) = (s"$root/idx", s"$root/clean", s"$root/compact")
    Dedup.writeMinhashIndex(a, col("doc_id"), col("text"), src, buckets = 4)
    Dedup.appendToMinhashIndex(b, col("doc_id"), col("text"), src)
    Dedup.appendToMinhashIndex(b, col("doc_id"), col("text"), src) // replay
    Dedup.writeMinhashIndex(a.unionByName(b), col("doc_id"), col("text"),
      clean, buckets = 4)
    def rows(path: String) =
      Dedup.queryMinhashIndex(batch, col("doc_id"), col("text"), path,
          threshold = 0.8)
        .select(col("id_a").cast("long"), col("id_b").cast("long"),
          col("jaccard"))
        .collect().map(_.toSeq).sortBy(_.toString)
    val expected = rows(clean)
    assert(expected.nonEmpty)
    assert(rows(src) === expected, "duplicated store rows must not leak " +
      "into duplicate output pairs")
    Dedup.compactMinhashIndex(spark, src, dst)
    assert(rows(dst) === expected)
    // the healed shingles table holds each doc once
    val sh = spark.read.parquet(s"$dst/shingles")
    assert(sh.count() === sh.select("doc_id").distinct().count())
  }

  test("streaming batches GROW the persistent index (foreachBatch append)") {
    import org.apache.spark.sql.streaming.Trigger
    // standing index over the odd half; the even half arrives as a
    // stream and each micro-batch APPENDS — afterwards a query must see
    // near-dups against streamed docs exactly as if they were built in
    val a = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 =!= 0)
    val b = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val idx = Files.createTempDirectory("graft_mhidx_sg").toString + "/idx"
    Dedup.writeMinhashIndex(a, col("doc_id"), col("text"), idx, buckets = 4)
    val dir = Files.createTempDirectory("graft_mhidx_sgs")
    val in = dir.resolve("in").toString
    b.select(col("doc_id"), col("text")).coalesce(2).write.json(in)
    val q = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).json(in)
      .writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-micro-batch appends skip the O(index) health probe — the
        // operator paces its own indexHealth calls (see the scaladoc)
        Dedup.appendToMinhashIndex(mb, col("doc_id"), col("text"), idx,
          probeHealth = false)
        ()
      }
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def pairs(path: String) =
      Dedup.queryMinhashIndex(batch, col("doc_id"), col("text"), path,
          threshold = 0.8)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val whole = Files.createTempDirectory("graft_mhidx_sgw").toString + "/idx"
    Dedup.writeMinhashIndex(a.unionByName(b), col("doc_id"), col("text"),
      whole, buckets = 4)
    assert(pairs(idx) === pairs(whole))
  }

  test("streaming batches query the persistent index") {
    import org.apache.spark.sql.streaming.Trigger
    val (batch, existing) = batchAndExisting
    val idx = Files.createTempDirectory("graft_mhidx3").toString + "/idx"
    Dedup.writeMinhashIndex(existing, col("doc_id"), col("text"), idx,
      buckets = 4)
    // the expected pairs: the same batch queried in batch mode
    val expected = Dedup.queryMinhashIndex(batch, col("doc_id"), col("text"),
        idx, threshold = 0.8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture should contain cross-side near-dups")

    val dir = Files.createTempDirectory("graft_mhidx_stream")
    val in = dir.resolve("in").toString
    // Spark's own JSON writer: hand-rolled escaping would NPE on null
    // text and break on control characters
    batch.select(col("doc_id"), col("text"))
      .coalesce(1).write.json(in)

    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .json(in)
    val seen = scala.collection.concurrent.TrieMap[(Long, Long), Unit]()
    val q = graft.streaming.StreamingIngest.indexNearDupBatches(stream, idx,
        (pairs, _) => pairs.select("id_a", "id_b").collect()
          .foreach(r => seen.put((r.getLong(0), r.getLong(1)), ())))
      .option("checkpointLocation", Files.createTempDirectory("graft_mhidx_ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(seen.keySet.toSet === expected)
  }

  test("the index survives losing the session catalog (new application)") {
    val (batch, existing) = batchAndExisting
    val path = Files.createTempDirectory("graft_mhidx4").toString + "/idx"
    Dedup.writeMinhashIndex(existing, col("doc_id"), col("text"), path,
      buckets = 4)
    def pairs() = Dedup.queryMinhashIndex(batch, col("doc_id"), col("text"),
        path, threshold = 0.8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = pairs()
    // simulate a fresh application: drop the (in-memory) registrations;
    // the stored files under `path` are untouched
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_mhidx_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val after = pairs()
    assert(after === before)
    // and the re-registered table is still bucketed
    val plan = Dedup.queryMinhashIndex(batch, col("doc_id"), col("text"),
        path, threshold = 0.8)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("Bucketed: true"))
  }

  test("query reads the build parameters and the index scans are bucketed") {
    val (batch, existing) = batchAndExisting
    val path = Files.createTempDirectory("graft_mhidx2").toString + "/idx"
    // NON-default parameters at build time; the query takes none
    Dedup.writeMinhashIndex(existing, col("doc_id"), col("text"), path,
      k = 12, bands = 6, n = 3, buckets = 4)
    val q = Dedup.queryMinhashIndex(batch, col("doc_id"), col("text"), path,
      threshold = 0.6)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("Bucketed: true"),
      s"index side should scan bucketed tables:\n${plan.take(3000)}")
    // and it still produces verified pairs under the build's n=3 shingles
    val rows = q.collect()
    assert(rows.forall(_.getDouble(2) >= 0.6))
  }
}
