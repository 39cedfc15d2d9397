package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps

/** Fixed-point integer PageRank: hand-computed recurrences, dangling
  * behavior, layout invariance (integer sums cannot drift), and the
  * degenerate shapes. */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int,
                    parts: Int = 1): Map[String, Long] =
    GraphOps.pageRankFixedPoint(
        edges.toDF("s", "d").repartition(parts), col("s"), col("d"),
        iters = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("2-cycle is the stable fixed point") {
    // A↔B: r0 = 5e8 each; every iteration 75e6 + (17·5e8)/20 = 5e8
    for (k <- Seq(0, 1, 3))
      assert(ranks(Seq("A" -> "B", "B" -> "A"), k) ===
        Map("A" -> 500000000L, "B" -> 500000000L), s"iters=$k")
  }

  test("dangling sink: hand-computed 3-iteration trace") {
    // A→B only. base = 3e9/40 = 75e6.
    // r1: A = 75e6, B = 75e6 + (17·5e8)/20 = 5e8
    // r2: A = 75e6, B = 75e6 + (17·75e6)/20 = 138750000
    // r3: same as r2 (A's rank is constant from iter 1)
    val e = Seq("A" -> "B")
    assert(ranks(e, 1) === Map("A" -> 75000000L, "B" -> 500000000L))
    assert(ranks(e, 2) === Map("A" -> 75000000L, "B" -> 138750000L))
    assert(ranks(e, 3) === Map("A" -> 75000000L, "B" -> 138750000L))
  }

  test("hub concentration; parallel edges count; layout invariance") {
    // spokes s0..s3 all link the hub; hub links s0; one DOUBLED edge
    val e = Seq("s0" -> "h", "s1" -> "h", "s2" -> "h", "s3" -> "h",
      "h" -> "s0", "s1" -> "h") // s1→h twice: out(s1)=2, both arrive
    val one = ranks(e, 3, parts = 1)
    assert(one("h") > one("s1") && one("s1") >= one("s2"))
    // bit-identical across partition layouts (integer sums)
    assert(ranks(e, 3, parts = 7) === one)
    // parallel edges: s1 contributes 2 × (r/2) = r — same as s2's r;
    // AND s0 gets the hub's mass, so it outranks s2/s3
    assert(one("s0") > one("s2"))
    assert(one("s2") === one("s3"))
  }

  test("degenerate shapes: empty, self-loop, zero iterations") {
    assert(ranks(Seq.empty, 3) === Map.empty)
    // one node, self-loop: r0 = 1e9; iteration: 15e7 + (17·1e9)/20
    //   = 150000000 + 850000000 = 1e9 — stable
    assert(ranks(Seq("A" -> "A"), 3) === Map("A" -> 1000000000L))
    assert(ranks(Seq("A" -> "B"), 0) ===
      Map("A" -> 500000000L, "B" -> 500000000L))
  }

  test("L1-delta convergence: exact fixed point stops a 30-iter budget") {
    // the 2-cycle is an exact fixed point (see above): delta after
    // iteration 1 is 0, so tolPpb = 0 must stop there — and stopping
    // early is result-identical to burning the remaining budget
    val cyc = Seq("A" -> "B", "B" -> "A").toDF("s", "d")
    val run = GraphOps.pageRankRun(cyc, col("s"), col("d"),
      iters = 30, tolPpb = 0L)
    assert(run.itersRun === 1)
    assert(run.l1DeltasPpb === Seq(0L))
    assert(run.ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("A" -> 500000000L, "B" -> 500000000L))
    // A→B settles at iteration 2 (trace in the dangling-sink leg):
    // deltas are recorded per executed iteration and shrink to 0
    val run2 = GraphOps.pageRankRun(Seq("A" -> "B").toDF("s", "d"),
      col("s"), col("d"), iters = 10, tolPpb = 0L)
    assert(run2.itersRun === 3) // iter 3 proves delta 0 vs iter 2
    assert(run2.l1DeltasPpb.length === 3)
    assert(run2.l1DeltasPpb.last === 0L)
    assert(run2.l1DeltasPpb.head > 0L)
    // tol disabled (default): fixed budget, no delta actions recorded
    val fixed = GraphOps.pageRankRun(cyc, col("s"), col("d"), iters = 3)
    assert(fixed.itersRun === 3 && fixed.l1DeltasPpb.isEmpty)
  }

  test("reliable mode: parquet per iteration, bit-equal, resumes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pr_state").toString
    val e = Seq("s0" -> "h", "s1" -> "h", "s2" -> "h", "h" -> "s0")
      .toDF("s", "d")
    val mem = GraphOps.pageRankFixedPoint(e, col("s"), col("d"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rel = GraphOps.pageRankRun(e, col("s"), col("d"), iters = 4,
      stateDir = Some(dir))
    assert(rel.itersRun === 4)
    assert(rel.ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === mem)
    // every iteration committed with its _SUCCESS marker
    for (k <- 1 to 4)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, f"iter-$k%04d", "_SUCCESS")), s"k=$k")
    // RESUME: a rerun over the same dir reuses every committed
    // iteration (bit-exact integer recurrence) and extends past it
    val more = GraphOps.pageRankRun(e, col("s"), col("d"), iters = 6,
      stateDir = Some(dir))
    assert(more.itersRun === 6)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "iter-0006", "_SUCCESS")))
    assert(more.ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === GraphOps.pageRankFixedPoint(e, col("s"), col("d"), iters = 6)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    // a crashed write (dir without _SUCCESS) is recomputed, not trusted
    val p7 = java.nio.file.Paths.get(dir, "iter-0007")
    java.nio.file.Files.createDirectories(p7)
    java.nio.file.Files.write(p7.resolve("garbage"), Array[Byte](1, 2, 3))
    val seven = GraphOps.pageRankRun(e, col("s"), col("d"), iters = 7,
      stateDir = Some(dir))
    assert(seven.itersRun === 7)
    assert(seven.ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === GraphOps.pageRankFixedPoint(e, col("s"), col("d"), iters = 7)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }
}
