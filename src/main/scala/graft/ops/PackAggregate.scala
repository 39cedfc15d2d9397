package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Delims

/** The pack aggregation (A1+A2+A4 — the engine's signature operator) as a
  * native Catalyst aggregate: buffer the group's values, then at eval
  * sort and emit `<n><delim><v1>\n…\n<vn>` directly — one pass, no
  * intermediate Spark array, no separate sort_array/array_join
  * expressions. Supports partial aggregation (buffers merge by
  * concatenation; the sort happens once at final eval), so map-side
  * combine still applies.
  *
  * Equivalent by construction to
  * `concat(count(*), delim, array_join(sort_array(collect_list(v)), "\n"))`
  * (KvOps.packAgg) — PackSpec asserts equality; KvStore uses this form.
  */
case class PackAggregate(
    child: Expression,
    delim: String = Delims.Delim,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[UTF8String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "pack_agg"

  override def createAggregationBuffer(): ArrayBuffer[UTF8String] =
    ArrayBuffer.empty[UTF8String]

  override def update(buf: ArrayBuffer[UTF8String], input: InternalRow): ArrayBuffer[UTF8String] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[UTF8String].clone()
    buf
  }

  override def merge(buf: ArrayBuffer[UTF8String], other: ArrayBuffer[UTF8String]): ArrayBuffer[UTF8String] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[UTF8String]): Any = {
    val sorted = buf.sorted
    val sep = UTF8String.fromString("\n")
    val body = UTF8String.concatWs(sep, sorted.toSeq: _*)
    UTF8String.concat(
      UTF8String.fromString(buf.length.toString),
      UTF8String.fromString(delim),
      body)
  }

  override def serialize(buf: ArrayBuffer[UTF8String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(buf.length)
    buf.foreach { s =>
      val b = s.getBytes
      d.writeInt(b.length)
      d.write(b)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UTF8String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += UTF8String.fromBytes(b)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PackAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PackAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): PackAggregate =
    copy(child = newChildren.head)
}

object PackAggregate {
  /** Column form: native pack aggregate. */
  def packAggNative(value: Column, delim: String = Delims.Delim): Column =
    ColumnBridge.column(
      PackAggregate(ColumnBridge.expression(value), delim).toAggregateExpression())
}
