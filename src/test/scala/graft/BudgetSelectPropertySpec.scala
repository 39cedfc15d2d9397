package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.BudgetSelect

/** Seeded randomized properties for budget selection, against a PURE
  * driver-side sequential reference (no Spark window — fully
  * independent of the engine's own machinery, the TemporalPropertySpec
  * discipline). Small domains force the adversarial structure: heavy
  * quality ties, frequent zero costs, ~4% null ids/qualities/costs,
  * and fanout/smallCap shrunk so every round exercises the multi-level
  * refinement path a 100 TB boundary level would take. */
class BudgetSelectPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(987)

  // (id, group, quality, cost): q in [0,5) → heavy ties; c in [0,4) →
  // frequent zeros; each field independently null ~4% of the time
  private def randomRows(n: Int, idBase: Long) =
    (0 until n).map { i =>
      val g = if (rnd.nextInt(25) == 0) null else s"g${rnd.nextInt(3)}"
      val q = if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(5).toLong)
      val c = if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(4).toLong)
      (idBase + i, g, q, c)
    }

  private type Row4 = (Long, String, Option[Long], Option[Long])

  /** The sequential greedy prefix over (q DESC, id ASC), null rows
    * dropped — the contract, computed with a sort and a running sum. */
  private def reference(rows: Seq[Row4], budget: Long): Set[Long] = {
    val live = rows.collect { case (id, _, Some(q), Some(c)) => (id, q, c) }
      .sortBy { case (id, q, _) => (-q, id) } // q in [0,5): negation safe
    var cum = 0L
    live.flatMap { case (id, _, c) =>
      cum += c; if (cum <= budget) Some(id) else None
    }.toSet
  }

  test("budgetSelect matches the sequential reference on adversarial data") {
    for (round <- 0 until 5) {
      val rows = randomRows(100, 1000L * round)
      val df = rows.map { case (id, g, q, c) =>
        (id, g, q.map(java.lang.Long.valueOf).orNull,
          c.map(java.lang.Long.valueOf).orNull)
      }.toDF("id", "g", "q", "c")
      val total = rows.flatMap(_._4).sum
      for (budget <- Seq(0L, rnd.nextInt(1 + total.toInt / 2).toLong, total)) {
        val got = BudgetSelect.budgetSelectImpl(df, col("id"), col("q"),
            col("c"), budget, maxQualityLevels = 1 << 20,
            fanout = 3, smallCap = 4)
          .select(col("id")).collect().map(_.getLong(0))
        assert(got.length === got.toSet.size,
          s"round $round budget $budget: duplicated kept row")
        assert(got.toSet === reference(rows, budget),
          s"round $round budget $budget diverged from the reference")
      }
    }
  }

  test("budgetSelectPerGroup matches the per-group reference") {
    for (round <- 0 until 5) {
      val rows = randomRows(120, 100000L + 1000L * round)
      val df = rows.map { case (id, g, q, c) =>
        (id, g, q.map(java.lang.Long.valueOf).orNull,
          c.map(java.lang.Long.valueOf).orNull)
      }.toDF("id", "g", "q", "c")
      // g2 omitted every round → dropped; budgets vary per round
      val budgets = Map(
        "g0" -> rnd.nextInt(40).toLong,
        "g1" -> rnd.nextInt(200).toLong)
      val want = budgets.keys.flatMap { g =>
        reference(rows.filter(_._2 == g), budgets(g))
      }.toSet
      val got = BudgetSelect.budgetSelectPerGroupImpl(df, col("g"),
          col("id"), col("q"), col("c"), budgets,
          maxHistRows = 1 << 20, fanout = 3, smallCap = 4)
        .select(col("id")).collect().map(_.getLong(0))
      assert(got.length === got.toSet.size,
        s"round $round: duplicated kept row")
      assert(got.toSet === want, s"round $round diverged from the reference")
    }
  }
}
