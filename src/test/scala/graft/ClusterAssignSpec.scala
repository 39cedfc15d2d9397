package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

/** Nearest-centroid assignment: brute-force equivalence on hand data,
  * deterministic tie-break, empty-vector exclusion, and the broadcast
  * plan shape (no shuffle of vector payloads into the argmax). */
class ClusterAssignSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def centsOf(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("cluster", "centroid")

  test("assignment matches hand-computed nearest centroid") {
    // axis-aligned centroids make cosine argmax readable by eye
    val cents = centsOf(Seq(
      0L -> Seq(1.0, 0.0, 0.0),
      1L -> Seq(0.0, 1.0, 0.0),
      2L -> Seq(0.0, 0.0, 1.0)))
    val rows = Seq(
      (10L, Seq(0.9f, 0.1f, 0.0f)),  // → 0
      (11L, Seq(0.1f, 0.9f, 0.1f)),  // → 1
      (12L, Seq(0.0f, 0.2f, 0.9f)),  // → 2
      (13L, Seq(-1.0f, -0.1f, 0.0f)) // anti-aligned: best is still the
                                     // LEAST negative → 1 beats 0 and 2?
    ).toDF("vid", "vec")
    val got = Ann.assignToCentroids(rows, col("vid"), col("vec"), cents)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // row 13: sims are (-0.995, -0.0995, 0.0) → cluster 2 wins
    assert(got == Seq((10L, 0L), (11L, 1L), (12L, 2L), (13L, 2L)))
  }

  test("exact cosine ties break to the LOWEST cluster id") {
    val cents = centsOf(Seq(
      5L -> Seq(1.0, 0.0),
      3L -> Seq(1.0, 0.0),  // identical centroid, lower id
      7L -> Seq(0.0, 1.0)))
    val rows = Seq((1L, Seq(1.0f, 0.0f))).toDF("vid", "vec")
    val got = Ann.assignToCentroids(rows, col("vid"), col("vec"), cents)
      .collect().head
    assert(got.getLong(1) == 3L)
    assert(got.getLong(2) == 1000000L) // sim_e6 of a perfect match
  }

  test("empty vectors are excluded; ids and sims are exact micro-units") {
    val cents = centsOf(Seq(0L -> Seq(3.0, 4.0)))
    val rows = Seq(
      (1L, Seq(3.0f, 4.0f)), (2L, Seq.empty[Float])).toDF("vid", "vec")
    val got = Ann.assignToCentroids(rows, col("vid"), col("vec"), cents)
      .collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
    assert(got.head.getLong(2) == 1000000L)
  }

  test("plan: centroids broadcast, argmax is a partial aggregate") {
    val cents = centsOf(Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0)))
    val rows = spark.range(100)
      .select(col("id").as("vid"),
        array(rand(7), rand(8)).cast("array<float>").as("vec"))
    val plan = Ann.assignToCentroids(rows, col("vid"), col("vec"), cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // partial_max before the exchange = map-side combine is in place
    assert(plan.contains("partial_max"), plan)
  }
}
