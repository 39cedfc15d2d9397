package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.similarity.{Ann, SemDedup}

/** SemDeDup (cluster-then-prune semantic dedup): the nClusters=1
  * degenerate case must equal exact all-pairs cosine, planted identical
  * vectors must survive any cluster count, and the canonical tail must
  * collapse components. Plus the high-diameter regression guard for the
  * connected-components loop these operators exposed. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic synthetic corpus: hash-derived pseudo-random 8-dim
  // vectors — no RNG state, same rows every run
  private def corpus(n: Int) = {
    val dims = (0 until 8).map(d =>
      (pmod(xxhash64(col("vec_id"), lit(d)), lit(1000)) / lit(500.0) - lit(1.0))
        .cast("float"))
    spark.range(n).select(col("id").as("vec_id"),
      array(dims: _*).as("embedding"))
  }

  test("nClusters=1 reproduces exact brute-force all-pairs cosine") {
    val c = corpus(60).localCheckpoint(true)
    val got = SemDedup.semanticNearDupPairs(c, col("vec_id"), col("embedding"),
        nClusters = 1, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact reference: normalized dot over the full cross, same rounding
    val v = c.select(col("vec_id"),
      Ann.normalize(Ann.asDouble(col("embedding"))).as("v"))
    val want = v.select(col("vec_id").as("id_a"), col("v").as("v_a"))
      .crossJoin(v.select(col("vec_id").as("id_b"), col("v").as("v_b")))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", round(Ann.dot(col("v_a"), col("v_b")), 6))
      .where(col("sim") >= 0.6)
      .select(col("id_a"), col("id_b"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "degenerate fixture: no pairs at the threshold")
    assert(got === want)
  }

  test("planted identical vectors pair up under every cluster count") {
    val base = corpus(60)
    val planted = base.unionByName(base.where(col("vec_id") < 5)
      .select((col("vec_id") + lit(1000L)).as("vec_id"), col("embedding")))
      .localCheckpoint(true)
    for (k <- Seq(1, 4, 16)) {
      val plantPairs = SemDedup.semanticNearDupPairs(planted,
          col("vec_id"), col("embedding"), nClusters = k, threshold = 0.95)
        .where(col("id_b") === col("id_a") + 1000L && col("id_a") < 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(plantPairs.map(_._1).toSet === Set(0L, 1L, 2L, 3L, 4L),
        s"nClusters=$k lost a planted identical pair")
      assert(plantPairs.forall(_._2 === 1.0),
        s"nClusters=$k: identical vectors must score cosine 1.0")
    }
  }

  test("semanticDedup collapses components and is deterministic") {
    val base = corpus(60)
    val planted = base.unionByName(base.where(col("vec_id") < 5)
      .select((col("vec_id") + lit(1000L)).as("vec_id"), col("embedding")))
      .localCheckpoint(true)
    def run() = SemDedup.semanticDedup(planted, col("vec_id"),
        col("embedding"), nClusters = 4, threshold = 0.95, maxIters = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = run()
    assert(labels.size === 65)
    // each planted copy joins its original's component (sim 1.0 edge)
    for (i <- 0L until 5L)
      assert(labels(i + 1000L) === labels(i),
        s"planted copy of $i not in its original's component")
    assert(labels === run(), "labels drifted between identical runs")
  }

  test("connected components collapse a 10k-hop path graph at default maxIters") {
    // a 10,000-node duplicate CHAIN (each doc near-dup only to its
    // neighbors) has pair-graph diameter 9,999: the old min-label
    // propagation needed one round per hop, so any default-bounded run
    // provably split it behind a log warning. Large-star/small-star
    // contracts it in O(log n) rounds — this asserts full collapse at
    // the DEFAULT maxIters, plus the per-round plan truncation
    // (geometric plan growth without checkpointing dies in driver
    // analysis long before data moves) and the explicit block release
    // of superseded rounds. REGRESSION GUARD for all three properties.
    val n = 10000
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val chain = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val before = spark.sparkContext.getPersistentRDDs.size
    // smallGraphMax = 0: this test exists to pin the DISTRIBUTED loop —
    // the default small-graph fast path would union-find a 10k-edge
    // chain on the driver and never enter it
    val out = Dedup.canonicalFromPairs(ids, col("doc_id"), chain,
      smallGraphMax = 0)
    assert(out.count() === n.toLong)
    assert(out.where(col("canonical_id") =!= 0L).count() === 0L,
      "path graph did not collapse to the component min")
    // superseded rounds release their checkpoint blocks EXPLICITLY —
    // only the final edge-star checkpoint may remain, not one RDD per
    // round waiting on a driver GC
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 2,
      s"$leaked checkpoint RDDs left behind by the CC loop")
  }

  test("superseded-round release is silent: no locally-checkpointed " +
      "unpersist WARN from the CC loop") {
    // CheckpointBridge releases dead rounds through the private[spark]
    // SparkContext.unpersistRDD seam precisely so Spark's unconditional
    // "lineage … cannot be recomputed after unpersisting" WARN (which
    // fired once per CC loop in every BENCH run) stays out of the logs
    // — that alarm is for releases that might still be read, and the
    // loop releases strictly after the successor round materialized.
    // Capture WARNs via a log4j2 appender at the spark.rdd logger.
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender("graft-warn-capture", null, null,
        false, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        captured.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    // resolve the LoggerContext through SPARK's classloader: under
    // sbt's layered classloaders, getContext(false) from test code can
    // return a different log4j2 context than the one Spark's slf4j
    // binding logs into, and the appender would silently miss every
    // event (this test was born vacuous that way — verified by running
    // it against the old RDD.unpersist release, which must FAIL it)
    val ctx = LogManager.getContext(
      classOf[org.apache.spark.rdd.RDD[_]].getClassLoader, false)
      .asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    try {
      val n = 4000
      val ids = spark.range(n).select(col("id").as("doc_id"))
      val chain = spark.range(n - 1)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val out = Dedup.canonicalFromPairs(ids, col("doc_id"), chain,
        smallGraphMax = 0)
      assert(out.where(col("canonical_id") =!= 0L).count() === 0L)
      // wiring proof through the SAME slf4j→log4j2 stack Spark logs
      // into: a silent pass with a broken appender must be impossible
      org.slf4j.LoggerFactory
        .getLogger("org.apache.spark.rdd.GraftCaptureProbe")
        .warn("graft-capture-probe")
    } finally {
      cfg.getRootLogger.removeAppender("graft-warn-capture")
      ctx.updateLoggers()
      appender.stop()
    }
    assert(captured.toArray.exists(_.toString.contains("graft-capture-probe")),
      "appender captured nothing — the capture wiring is broken; " +
        "fix the test, do not trust a silent pass")
    val warned = captured.toArray.map(_.toString)
      .filter(_.contains("cannot be recomputed after unpersisting"))
    assert(warned.isEmpty,
      s"CC loop release still alarms: ${warned.take(2).mkString(" | ")}")
  }

  test("small-graph fast path releases its edge checkpoint") {
    // the fast path collects the checkpointed edge frame and must
    // release its blocks immediately (the labels are driver state — the
    // checkpoint has no further consumer, unlike the loop's final star)
    val n = 500
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val chain = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Dedup.canonicalFromPairs(ids, col("doc_id"), chain)
    assert(out.where(col("canonical_id") =!= 0L).count() === 0L,
      "fast path must produce the same component-min labels")
    // <= not ===: earlier tests' dropped frames may be ContextCleaner-
    // reclaimed concurrently, so the count can DECREASE during this
    // test; the fast path itself must just not add a registration
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "fast path left its edge checkpoint registered")
  }

  test("non-convergence keeps one labeled row per id (split, never duplicated)") {
    // force the maxIters exit: a 200-hop path cannot star-contract in
    // one round. Mid-algorithm edge sets hold SEVERAL edges per node,
    // so the final labeling must still aggregate to the one-row-per-id
    // contract — split labels are the documented degradation, duplicate
    // rows would silently inflate every downstream count
    val n = 200
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val chain = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    // smallGraphMax = 0: the driver fast path has no iteration bound to
    // exhaust — only the distributed loop can exit unconverged
    val out = Dedup.canonicalFromPairs(ids, col("doc_id"), chain,
        maxIters = 1, smallGraphMax = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === n, "one row per input id, even unconverged")
    assert(out.map(_._1).distinct.length === n, "no duplicated doc_id")
    // every label must still be a valid reachable minimum candidate
    assert(out.forall { case (d, c) => c <= d })
  }

  test("random graphs match a union-find oracle across topologies") {
    // the chain tests pin the worst-case DIAMETER; this pins arbitrary
    // TOPOLOGY — sparse forests, dense blobs, self-loop-adjacent
    // duplicate edges — against a local union-find computing the exact
    // same min-reachable-id labeling. Seeded RNG: same graphs every run.
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(150)
      val m = rnd.nextInt(3 * n)
      val edgeList = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find with path compression — the sequential oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => (i.toLong, find(i).toLong)).toSet

      val ids = spark.range(n).select(col("id").as("doc_id"))
      val pairs = edgeList.toDF("id_a", "id_b")
      // BOTH paths must match the oracle: the distributed star loop
      // (smallGraphMax = 0) and the default driver union-find fast path
      // these graphs are small enough to take
      val loop = Dedup.canonicalFromPairs(ids, col("doc_id"), pairs,
          smallGraphMax = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(loop === want, s"trial $trial: n=$n m=$m star loop vs oracle")
      val fast = Dedup.canonicalFromPairs(ids, col("doc_id"), pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast === want, s"trial $trial: n=$n m=$m fast path vs oracle")
    }
  }
}
