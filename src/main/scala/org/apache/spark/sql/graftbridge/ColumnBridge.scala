package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (Spark 4.x moved Column onto ColumnNode; classic conversions live in
  * `org.apache.spark.sql.classic.ExpressionUtils`). Lives under the
  * `org.apache.spark.sql` package solely to satisfy the `private[sql]`
  * qualifier — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
