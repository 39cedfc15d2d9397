package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Salt

/** Salt-bucket as a native Catalyst expression with whole-stage codegen.
  *
  * Semantics: Java-String-hash-with-seed-1 over the UTF-8 bytes of the
  * input, 32-bit overflow arithmetic, `abs(hash % buckets)` — the
  * reference's `getSaltValue` (Utils.scala:82-96, bucket count 24 at :93).
  *
  * A plain Scala UDF variant exists in [[KvOps.saltUdf]] for parity with
  * the reference's `udf` registration (Utils.scala:158, 495); this
  * expression is the performance path: it stays inside WholeStageCodegen
  * (no ser/de, no closure dispatch) and, unlike a black-box UDF, does not
  * make surrounding projections opaque to Catalyst.
  */
case class SaltBucket(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "salt_bucket"

  // Total function: null keys salt to bucket 0 (same as the empty
  // string), matching Salt.bucket and the parity UDF — a null must not
  // produce a null salt that writes a salt=null partition directory.
  // Hashes the RAW UTF8String bytes, same as the codegen path — a
  // String round-trip would smear invalid byte sequences into U+FFFD
  // and the two paths would disagree on hostile keys.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else Salt.bucket(v.asInstanceOf[UTF8String].getBytes, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bytes = ctx.freshName("bytes")
    val i = ctx.freshName("i")
    val h = ctx.freshName("h")
    val code =
      code"""
         |${childGen.code}
         |int ${ev.value} = 0;
         |if (!${childGen.isNull}) {
         |  byte[] $bytes = ${childGen.value}.getBytes();
         |  int $h = 1;
         |  for (int $i = 0; $i < $bytes.length; $i++) {
         |    $h = 31 * $h + (int) $bytes[$i];
         |  }
         |  ${ev.value} = $bytes.length == 0 ? 0 : java.lang.Math.abs($h % $buckets);
         |}
       """.stripMargin
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SaltBucket =
    copy(child = newChild)
}

object SaltExpr {
  /** Column wrapper: `salt_bucket(keyCol)` ∈ [0, buckets). */
  def saltCol(c: Column, buckets: Int = Salt.Buckets): Column =
    ColumnBridge.column(SaltBucket(ColumnBridge.expression(c), buckets))
}
