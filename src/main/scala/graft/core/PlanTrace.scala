package graft.core

import org.apache.spark.sql.DataFrame

/** Plan-review seam for mid-query localCheckpoints: a checkpoint
  * truncates the visible plan, so an `explain` of the final frame
  * under-counts the exchanges the query actually runs (the round-21
  * verdict's exact_quantiles caveat — its "2 Exchange" after-plan hid
  * the window chain behind the checkpoint). Operators route their
  * mid-query checkpoints through [[checkpoint]]; when
  * `-Dgraft.explain.checkpoints=1` is set (graft.Explain's `-ckpt`
  * flag), the PRE-checkpoint formatted plan prints labeled to stdout,
  * so a plan dump covers the full chain end-to-end. Zero cost when
  * the property is unset. */
object PlanTrace {
  private def enabled: Boolean =
    sys.props.get("graft.explain.checkpoints").contains("1")

  def checkpoint(df: DataFrame, eager: Boolean, label: String): DataFrame = {
    if (enabled) {
      val formatted = org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
      println(s"---------- pre-checkpoint plan [$label] ----------")
      println(df.queryExecution.explainString(formatted))
    }
    df.localCheckpoint(eager)
  }
}
