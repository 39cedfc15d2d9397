package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SaltExpr

/** Plan-shape guards: the properties that make these operators scale are
  * asserted on the optimized physical plan, so a refactor that silently
  * drops a pushdown or flips a broadcast to a shuffle join fails CI, not
  * a 100 TB run. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("prefix scan pushes StartsWith to the parquet source") {
    val p = plan(SparkEntry.queries("prefix_scan")(spark, dir))
    assert(p.contains("StringStartsWith"), p.linesIterator.take(30).mkString("\n"))
  }

  test("equality filter pushes to the parquet source") {
    val p = plan(SparkEntry.queries("filter_eq")(spark, dir))
    assert(p.contains("EqualTo(o_orderstatus,F)"))
  }

  test("projection prunes the parquet read schema") {
    val p = plan(SparkEntry.queries("project_alias")(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"))
  }

  test("metadata joins broadcast the small side") {
    assert(plan(SparkEntry.queries("broadcast_join")(spark, dir))
      .contains("BroadcastHashJoin"))
    assert(plan(SparkEntry.queries("lookup_join")(spark, dir))
      .contains("BroadcastHashJoin"))
  }

  test("temperature mixing broadcasts the per-source rate table") {
    // the rates frame is one row per source — it must pin to a
    // broadcast join, never shuffle the corpus on the source key
    for (q <- Seq("corpus_mix_temperature", "corpus_mix_temperature_epochs")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(p.contains("BroadcastHashJoin"),
        s"$q shuffles for its rate lookup:\n" +
          p.linesIterator.take(40).mkString("\n"))
      assert(!p.contains("SortMergeJoin"),
        s"$q grew a sort-merge join:\n" +
          p.linesIterator.take(40).mkString("\n"))
    }
  }

  test("decontamination broadcasts the benchmark n-gram set") {
    // the corpus-side gram stream must be filtered map-side: the bench
    // grams are pinned to a broadcast so no corpus payload ever shuffles
    // through the overlap join
    val p = plan(SparkEntry.queries("decontaminate")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(40).mkString("\n"))
  }

  test("pack aggregation runs map-side partial aggregation") {
    val p = plan(SparkEntry.queries("q1_agg")(spark, dir))
    // two HashAggregates (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("salt expression does not block filter pushdown through projection") {
    val li = Tables(spark, dir, "lineitem")
      .withColumn("salt", SaltExpr.saltCol(col("l_returnflag")))
      .where(col("l_orderkey") === 42L)
    val p = plan(li)
    assert(p.contains("EqualTo(l_orderkey,42)"), "filter should reach the scan")
  }

  test("bucketed KV tables join on rowKey without a shuffle") {
    import graft.ingest.KvStore
    import spark.implicits._
    val src = Seq(("k1", "q1", "a"), ("k2", "q1", "b"), ("k3", "q2", "c"))
      .toDF("k", "q", "v")
    val kv = KvStore.pack(src, Seq(col("k")), col("q"), Seq(col("v")))
    KvStore.writeBucketed(kv, "kv_bucketed_a", buckets = 4)
    KvStore.writeBucketed(kv, "kv_bucketed_b", buckets = 4)
    // force the merge path: a broadcast join would trivially avoid the
    // shuffle for tables this small, proving nothing about bucketing
    val joined = spark.table("kv_bucketed_a").hint("merge")
      .join(spark.table("kv_bucketed_b"), Seq("rowKey"))
    val p = plan(joined)
    assert(!p.contains("Exchange"),
      s"bucketed join must be shuffle-free:\n$p")
    assert(joined.count() === 3)
  }

  test("KV write exchange ranges over (salt, rowKey), not hash-on-salt") {
    import graft.ingest.KvStore
    val li = Tables(spark, dir, "lineitem")
    val kv = KvStore.pack(li, Seq(col("l_orderkey")), col("l_returnflag"),
      Seq(col("l_linenumber")))
    val p = plan(KvStore.writeLayout(kv))
    // hash-on-salt funnels the whole store through ≤24 write tasks at any
    // cluster size; the exchange must RANGE over (salt, rowKey) so task
    // count scales with spark.sql.shuffle.partitions
    assert(p.contains("rangepartitioning(salt"), s"expected range exchange:\n$p")
    assert(p.contains("rowKey"), "range keys must include rowKey")
    assert(!p.contains("hashpartitioning(salt#"),
      "write exchange must not hash on the 24-value salt column")
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(p.contains(s", $n)") || p.contains(s", $n,"),
      s"range exchange should target $n partitions:\n$p")
  }

  /** Simple (non-formatted) physical plan string: join KEYS render
    * inline here (`SortMergeJoin [band#85, ...]`), where formatted
    * explain puts them on detached "Left keys" detail lines — a
    * formatted-output grep for `BroadcastHashJoin [band#` can never
    * match, making the guard vacuous. */
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The key-specific join-shape guard: `key` must appear in a
    * SortMergeJoin's key list (POSITIVE control — if Spark's plan
    * rendering changes, this fails loudly instead of silently blinding
    * the negative check) and in no BroadcastHashJoin's. The key is
    * matched anywhere inside the bracket list: pushed-down predicates
    * can rewrite a key to an expression (`[(id_a#4L + 1000000),
    * cluster#43]`), so anchoring to the first position under-matches. */
  private def assertKeyedJoinStaysSortMerge(q: String, key: String): Unit =
    assertPlanKeyedSortMerge(q, key,
      physical(SparkEntry.queries(q)(spark, dir)))

  /** Same guard over an ALREADY-rendered plan string — for tests that
    * make further assertions on the same plan, so a query whose
    * construction is expensive (e.g. semdedup's k-means training runs
    * real driver jobs at plan-build time) renders once, not per check. */
  private def assertPlanKeyedSortMerge(q: String, key: String,
                                       p: String): Unit = {
    val smj = ("""SortMergeJoin \[[^\]]*\b""" + key + "#").r
    val bhj = ("""BroadcastHashJoin \[[^\]]*\b""" + key + "#").r
    assert(smj.findFirstIn(p).isDefined,
      s"$q: no sort-merge join keyed on $key (lost the pin, or the " +
        s"rendering this guard greps changed):\n${p.take(2000)}")
    assert(bhj.findFirstIn(p).isEmpty,
      s"$q broadcasts its $key frame:\n${p.take(2000)}")
  }

  test("collapsed dedup class frames never broadcast (verify joins stay " +
      "sort-merge on cls)") {
    // the content-class frame is one row per DISTINCT document —
    // corpus-scale — and the static post-checkpoint estimate would
    // happily broadcast it at small SF; the merge pin keeps the benched
    // plan the production plan
    assertKeyedJoinStaysSortMerge("dedup_minhash", "cls")
  }

  test("LSH-family self-joins stay sort-merge (never broadcast the band frame)") {
    // the static size estimate would happily broadcast the exploded
    // band/chunk frames at small SF — a plan that recomputes the
    // signature kernels per side and cannot survive corpus scale; the
    // merge pin keeps both sides on one reusable exchange. (dedup_ngram
    // left this guard when its front became posting-list pair
    // generation — it no longer joins on the shingle at all; its shape
    // is pinned by the no-window and merge-pin tests below.)
    assertKeyedJoinStaysSortMerge("dedup_minhash", "band")
    assertKeyedJoinStaysSortMerge("dedup_simhash", "chunk")
    assertKeyedJoinStaysSortMerge("text_embed_dedup", "band")
  }

  test("semdedup candidate join stays sort-merge on the cluster key") {
    // the (cluster, id) assignment is one row per corpus document; the
    // static post-aggregate estimate would broadcast it at small SF — a
    // plan that cannot survive corpus scale. Centroids, by contrast,
    // ride the assignment as the ivf_assign kernel's driver-held
    // reference arrays (round 22 — previously a broadcast cross join):
    // the corpus-side assignment is a pure projection, no exchange, no
    // join. Asserted on the pairs front (semdedup_exactdups runs it at
    // the production cluster count): the canonical variant checkpoints
    // eagerly, so its final plan is a leaf with the joins already run.
    val p = physical(SparkEntry.queries("semdedup_exactdups")(spark, dir))
    assertPlanKeyedSortMerge("semdedup_exactdups", "cluster", p)
    assert(p.contains("ivf_assign"),
      "centroid assignment should be the no-exchange argmax kernel")
  }

  test("containment derives both orientations from one common-counts pass") {
    // a union of two oriented selections would plan the inverted-index
    // subtree TWICE (measured 2x the scans and self-joins). The pair
    // self-join is the subtree's signature node; containment must plan
    // exactly as many as its Jaccard twin, not double.
    def joins(q: String): Int = {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      "ShuffledHashJoin".r.findAllIn(p).size
    }
    val ngramJoins = joins("dedup_ngram")
    // non-vacuous: the two size-attach joins of the shared front must
    // be present (and be hash, not sort-merge — the merge form sorted
    // the pair-count frame twice)
    assert(ngramJoins === 2,
      s"expected the front's two shuffle-hash size joins, got $ngramJoins")
    assert(joins("dedup_containment") === ngramJoins,
      "containment re-plans its inverted-index subtree vs the Jaccard twin")
  }

  test("shingle document frequency is an aggregate+join, never a window") {
    // count(*) OVER (PARTITION BY shingle) gets no map-side partial
    // aggregation and no AQE skew mitigation: every occurrence of a hot
    // shingle ("terms of service") lands on ONE window task — invisible
    // at test SF, a straggler/OOM at corpus scale. The df front must be
    // groupBy(s).count() (partials collapse hot keys before the shuffle)
    // joined back onto the stream (AQE-skew-split eligible).
    // the ngram/containment front materializes early (eager checkpoint),
    // so its df subtree is asserted directly on the un-materialized
    // posting frame; text_dup_spans keeps its whole plan inspectable
    val docs = graft.Tables(spark, dir, "documents")
    val front = plan(graft.dedup.Dedup.shinglePostings(
      docs, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"), 2, 100))
    assert(!front.contains("Window"),
      s"shingle posting front routes df through WindowExec:\n${front.take(2000)}")
    assert("Aggregate".r.findAllIn(front).size >= 2,
      s"shingle posting front lost its map-side partial:\n${front.take(2000)}")
    for (q <- Seq("dedup_ngram", "dedup_containment", "text_dup_spans",
        "text_dup_remove")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("Window"),
        s"$q routes its shingle-df through WindowExec:\n${p.take(2000)}")
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q df aggregate lost its map-side partial:\n${p.take(2000)}")
    }
  }

  test("corpus-scale aggregate frames never broadcast (merge-pinned joins)") {
    // the static post-aggregate estimate looks tiny at test SF, but
    // these frames are the corpus vocabulary / one-row-per-document at
    // production scale — a broadcast both ships them to every executor
    // and denies the probe side its reusable exchange (the kernel then
    // re-runs per consumer)
    for (q <- Seq("dedup_ngram", "dedup_containment", "text_dup_spans",
        "text_dup_remove",
        "dedup_exact", "text_line_dedup", "text_lm_score", "doc_keywords",
        "curation_pipeline", "text_fingerprint_classes")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("BroadcastHashJoin") || q == "text_lm_score",
        s"$q broadcasts a corpus-scale frame:\n${p.take(2000)}")
      if (q == "text_lm_score")
        // the one legitimate broadcast is the ONE-ROW (N, V) frame; the
        // vocabulary join must stay sort-merge
        assert(p.contains("SortMergeJoin"), s"$q lost its merge pin")
    }
  }

  test("doc_keywords: no token-partitioned window, bounded scan count") {
    // r4 pinned ONE scan by computing df as a count-over-token window —
    // but that window funnels every (doc, hot-token) row into one task,
    // a partition that scales with the corpus. r6 trades a second
    // tokenize pass (cheap, parallel) for an aggregate+join df front;
    // the only window left partitions by doc_id (bounded by one doc's
    // distinct tokens). Guard BOTH properties.
    val q = SparkEntry.queries("doc_keywords")(spark, dir)
    val exec = q.queryExecution.executedPlan.toString
    assert(!exec.contains("windowspecdefinition(token#"),
      s"df must not come from a token window:\n${exec.take(2000)}")
    assert(exec.contains("windowspecdefinition(doc_id#"),
      "the per-doc rank window should remain")
    val p = plan(q)
    val scans = "Scan parquet".r.findAllIn(p).size / 2
    assert(scans <= 2, s"expected at most two corpus scans, got $scans")
  }

  test("exact dedup annotates via aggregate+join, never a hash window") {
    // a viral exact duplicate has corpus-scale copy counts; a window
    // over the content hash would buffer that whole partition in one
    // task (same argument as the shingle df front)
    val p = plan(SparkEntry.queries("dedup_exact")(spark, dir))
    assert(!p.contains("Window"),
      s"dedup_exact routes copies through WindowExec:\n${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "canonical/copy aggregate lost its map-side partial")
  }

  test("ANN top-k tails keep the WindowGroupLimit pushdown") {
    // rankTopK filters row_number() <= k, which InferWindowGroupLimit
    // rewrites into a WindowGroupLimit pair: a PARTIAL node that
    // truncates each map task's candidates to top-k BEFORE the qid
    // shuffle, and a FINAL node after it. At corpus scale the partial
    // is the difference between shuffling every candidate pair and
    // shuffling k rows per query per task — losing it (e.g. by breaking
    // the filter's rank-predicate shape, or raising k past
    // spark.sql.window.group.limit.threshold) silently re-inflates the
    // exchange. Asserted >= 2 occurrences: the partial is the one that
    // matters and it only ever appears alongside the final.
    for (q <- Seq("ann_topk", "ann_lsh", "ann_ivf")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
        s"$q lost the partial WindowGroupLimit pushdown:\n${p.take(2000)}")
    }
  }

  test("range join is a bucketed equi-join, never a cross product") {
    val p = plan(SparkEntry.queries("range_join")(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join on (key, bucket):\n${p.take(1500)}")
  }

  test("as-of join is union+window — no join operator in the plan at all") {
    // the scale property of the union+window formulation: ONE key shuffle
    // feeds a window forward-fill, so no join node (and hence no range
    // candidate explosion) can appear. A refactor that reintroduces a
    // join — even an equi-join — silently re-opens the per-key blowup.
    val p = plan(SparkEntry.queries("asof_join")(spark, dir))
    assert(!p.contains("Join"),
      s"as-of must stay join-free (union + keyed window):\n${p.take(1500)}")
    assert(p.contains("Window"), p.take(1500))
  }

  test("sessionize is pure windows — no join, no cross product") {
    val p = plan(SparkEntry.queries("sessionize")(spark, dir))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"sessionize must stay lag + running-sum windows:\n${p.take(1500)}")
  }

  test("bloom decontamination probes map-side, under the exact verify join") {
    val p = plan(SparkEntry.queries("decontaminate_bloom")(spark, dir))
    assert(p.contains("might_contain"),
      s"bloom probe must appear as a filter expression:\n${p.take(1500)}")
  }

  test("pipeline metrics ride the plan as CollectMetrics (no extra scan)") {
    val observed = graft.meta.PipelineMetrics.observed(
      Tables(spark, dir, "documents"), "c",
      graft.meta.PipelineMetrics.corpusCounters(
        org.apache.spark.sql.functions.col("text")))
    val p = plan(observed)
    assert(p.contains("CollectMetrics"), p.take(1500))
    val scans = "Scan parquet".r.findAllIn(p).size / 2
    assert(scans === 1)
  }

  test("the KV lifecycle plans a single shuffle for the pack aggregation") {
    val p = plan(SparkEntry.queries("pack_concat")(spark, dir))
    // one exchange for the groupBy, one for the final orderBy — no more
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 4, s"unexpected exchange count:\n$p")
  }

  test("web pipeline is one narrow chain — no exchange before the display sort") {
    // WARC explode → HTTP bodies → HTML extraction → URL kernels must
    // all run inside the scan's partitions: the ONLY exchange in the
    // gate plan is the final orderBy (which exists for the oracle, not
    // the operator). At 100 TB this is the difference between a
    // map-only ingest and shuffling the raw crawl bytes.
    val p = plan(SparkEntry.queries("web_pipeline")(spark, dir))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"web pipeline should not shuffle:\n$p")
    // one source at most: the memoized WARC fixture enters as a
    // checkpoint scan (no parquet read in the gate plan at all)
    assert("Scan parquet".r.findAllIn(p).size / 2 <= 1)
  }

  test("within-doc self-dedup is a pure narrow map (display sort only)") {
    // the operator's whole value is riding the corpus scan: the ONLY
    // exchange in the gate plan is the oracle's display orderBy
    val p = plan(SparkEntry.queries("text_self_dedup")(spark, dir))
    val exchanges = "Exchange".r.findAllIn(p).size / 2
    assert(exchanges <= 1, s"text_self_dedup must not shuffle:\n${p.take(2000)}")
    // (codegen spans are not visible in an unexecuted AdaptiveSparkPlan's
    // formatted string; the kernel rides the same KernelUnaryExpression
    // machinery the html/url codegen test below exercises at runtime)
  }

  test("frontier_schedule: windowless, robots dim broadcasts") {
    // per-host ordering rides the pack idiom (sorted bounded list +
    // posexplode), never a host-partitioned window; the Crawl-delay
    // dim must broadcast, not shuffle the capped frontier
    val p = plan(SparkEntry.queries("frontier_schedule")(spark, dir))
    assert(!p.contains("Window"),
      s"frontier_schedule routes host order through WindowExec:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"frontier_schedule lost the robots-dim broadcast:\n${p.take(2000)}")
  }

  test("anchorsPerTarget aggregates on exactly one shuffle") {
    // the repartition(target_url) exchange must be the ONLY one: both
    // the (target, anchor) count and the per-target pack reuse it —
    // HashPartitioning(target) satisfies the refining grouping's
    // clustered distribution. A second exchange means the partitioning
    // reuse broke and a viral target pays twice.
    import org.apache.spark.sql.functions.{col, concat, lit}
    val pages = graft.Tables(spark, dir, "documents").select(
      concat(lit("https://h"), col("doc_id") % 3, lit(".example/p/"),
        col("doc_id")).as("u"),
      concat(lit("<a href='/t/"), col("doc_id") % 5, lit("'>go</a>"))
        .as("h"))
    val p = plan(graft.ops.LinkSignals.anchorsPerTarget(
      pages, col("u"), col("h")))
    // formatted explain names each node twice (tree + detail section)
    val exchanges = "Exchange".r.findAllIn(p).size / 2
    assert(exchanges === 1, s"anchorsPerTarget must shuffle once:\n$p")
    // the skew escape hatch is output-identical on the same frame
    val one = graft.ops.LinkSignals.anchorsPerTarget(pages, col("u"), col("h"))
      .collect().map(_.toString).sorted.toSeq
    val two = graft.ops.LinkSignals.anchorsPerTarget(pages, col("u"), col("h"),
        singleShuffle = false)
      .collect().map(_.toString).sorted.toSeq
    assert(one === two, "two-shuffle form diverged from the repartition form")
  }

  test("media payloads never cross an exchange (video dedup + curation router)") {
    // the media scale contract: payload bytes decode where they rest;
    // only ids + signatures/formats shuffle. In formatted mode every
    // Exchange detail block lists its input attributes — none may
    // carry the payload column.
    for (gate <- Seq("video_dedup", "media_curation_pipeline")) {
      val p = plan(SparkEntry.queries(gate)(spark, dir))
      val blocks = p.split("\n\n")
      val exchanges = blocks.filter(b =>
        b.linesIterator.nextOption().exists(l =>
          l.startsWith("(") &&
            (l.contains(") Exchange") || l.contains(") BroadcastExchange"))))
      assert(exchanges.nonEmpty,
        s"$gate: expected exchange blocks\n" + p.take(800))
      for (b <- exchanges)
        assert(!b.contains("payload"),
          s"$gate: an exchange ships payload bytes:\n$b")
    }
  }

  test("html/url kernels evaluate inside WholeStageCodegen") {
    val df = Tables(spark, dir, "documents")
      .select(graft.ops.HtmlExprs.htmlExtract(col("text")).as("t"),
        graft.ops.HtmlExprs.urlNormalize(col("text")).as("u"),
        graft.ops.HtmlExprs.htmlLinkPpm(col("text")).as("p"))
    val p = plan(df)
    // formatted mode marks whole-stage membership as "[codegen id : N]"
    // on the Project hosting the kernels
    val proj = p.linesIterator.find(_.trim.startsWith("(3) Project"))
      .orElse(p.linesIterator.find(_.contains("Project"))).get
    assert(proj.contains("codegen id"), p.take(1200))
  }
}
