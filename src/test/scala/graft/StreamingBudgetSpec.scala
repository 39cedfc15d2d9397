package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest
import graft.text.BudgetSelect

/** Streaming budget-state fold: micro-batches arriving through
  * [[StreamingIngest.budgetStateFold]] must leave persisted state whose
  * cutoff EQUALS the from-scratch selection over everything ingested —
  * the rolling-corpus story end-to-end — and a replayed batchId must be
  * skipped, not double-counted. */
class StreamingBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docLine(id: Long, q: Long, c: Long): String =
    s"""{"doc_id":$id,"q":$q,"c":$c}"""

  test("streamed state fold ≡ from-scratch selection over the corpus-so-far") {
    val dir = Files.createTempDirectory("graft_sbudget")
    val in = dir.resolve("in"); Files.createDirectory(in)
    val statePath = dir.resolve("state").toString
    val rng = new scala.util.Random(73)
    val rows = (0 until 180).map(i =>
      (i.toLong, rng.nextInt(9).toLong, 1L + rng.nextInt(7)))
    // three micro-batch files, one per trigger
    rows.grouped(60).zipWithIndex.foreach { case (chunk, b) =>
      Files.writeString(in.resolve(s"b$b.json"),
        chunk.map(r => docLine(r._1, r._2, r._3)).mkString("", "\n", "\n"))
    }

    val schema = "doc_id LONG, q LONG, c LONG"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.toString)
    val q = StreamingIngest.budgetStateFold(stream, lit("__all"),
        col("doc_id"), col("q"), col("c"), statePath)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val df = rows.toDF("doc_id", "q", "c").cache()
    val total = rows.map(_._3).sum
    // state totals equal the ingested corpus's own
    assert(BudgetSelect.readBudgetState(spark, statePath)
      .agg(sum(col("total_cost"))).head().getLong(0) === total)
    assert(BudgetSelect.stateBatchWatermark(spark, statePath).exists(_ >= 2),
      "three triggers must advance the batch watermark")
    // cutoff from streamed state ≡ from-scratch cutoff, across budgets
    for (budget <- Seq(0L, total / 4, total / 2, total)) {
      val fromState = BudgetSelect.budgetSelectFromState(df, col("doc_id"),
          col("q"), col("c"), budget, statePath)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val scratch = BudgetSelect.budgetSelect(df, col("doc_id"), col("q"),
          col("c"), budget)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(fromState === scratch, s"budget=$budget")
    }
  }

  test("a replayed batchId is skipped, never double-counted") {
    val dir = Files.createTempDirectory("graft_sbudget_replay")
    val statePath = dir.resolve("state").toString
    val b0 = Seq((1L, 5L, 10L), (2L, 3L, 20L)).toDF("doc_id", "q", "c")
    val b1 = Seq((3L, 7L, 5L)).toDF("doc_id", "q", "c")
    assert(BudgetSelect.appendBudgetStateBatch(b0, col("doc_id"), col("q"),
      col("c"), statePath, batchId = 0L))
    assert(BudgetSelect.appendBudgetStateBatch(b1, col("doc_id"), col("q"),
      col("c"), statePath, batchId = 1L))
    // the at-least-once replay: same batchId arrives again
    assert(!BudgetSelect.appendBudgetStateBatch(b1, col("doc_id"), col("q"),
      col("c"), statePath, batchId = 1L), "replay must be skipped")
    assert(BudgetSelect.readBudgetState(spark, statePath)
      .agg(sum(col("total_cost"))).head().getLong(0) === 35L,
      "totals must count each batch exactly once")
    assert(BudgetSelect.stateBatchWatermark(spark, statePath) === Some(1L))
    // and a NEW batch after the replay still folds
    assert(BudgetSelect.appendBudgetStateBatch(
      Seq((4L, 2L, 7L)).toDF("doc_id", "q", "c"),
      col("doc_id"), col("q"), col("c"), statePath, batchId = 2L))
    assert(BudgetSelect.readBudgetState(spark, statePath)
      .agg(sum(col("total_cost"))).head().getLong(0) === 42L)
  }

  test("per-group streamed fold matches per-group from-scratch cutoffs") {
    val dir = Files.createTempDirectory("graft_sbudget_g")
    val in = dir.resolve("in"); Files.createDirectory(in)
    val statePath = dir.resolve("state").toString
    val rng = new scala.util.Random(79)
    val rows = (0 until 120).map(i =>
      (i.toLong, s"g${rng.nextInt(3)}", rng.nextInt(6).toLong,
        1L + rng.nextInt(5)))
    rows.grouped(40).zipWithIndex.foreach { case (chunk, b) =>
      Files.writeString(in.resolve(s"b$b.json"),
        chunk.map(r =>
          s"""{"doc_id":${r._1},"g":"${r._2}","q":${r._3},"c":${r._4}}""")
          .mkString("", "\n", "\n"))
    }
    val schema = "doc_id LONG, g STRING, q LONG, c LONG"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.toString)
    val q = StreamingIngest.budgetStateFold(stream, col("g"),
        col("doc_id"), col("q"), col("c"), statePath)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val df = rows.toDF("doc_id", "g", "q", "c").cache()
    val budgets = Map("g0" -> 15L, "g1" -> 0L, "g2" -> 100000L)
    val fromState = BudgetSelect.budgetSelectPerGroupFromState(df, col("g"),
        col("doc_id"), col("q"), col("c"), budgets, statePath)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val scratch = BudgetSelect.budgetSelectPerGroup(df, col("g"),
        col("doc_id"), col("q"), col("c"), budgets)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(fromState === scratch)
  }
}
