package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a PROVABLE memory bound: the aggregation buffer
  * holds at most `cap + 1` elements, and a group that exceeds `cap`
  * evaluates to NULL (the overflow sentinel) instead of a list.
  *
  * Why this exists: the inverted-index dedup family wants, per shingle,
  * the posting list of documents containing it — but only for RARE
  * shingles (document frequency ≤ maxDf). A plain
  * `collect_list(...).where(df <= maxDf)` filters AFTER aggregation, so
  * a viral shingle ("terms of service" in 10⁸ documents at corpus
  * scale) would still materialize its entire posting list inside one
  * aggregation buffer before the filter ever sees it — exactly the
  * hot-key OOM the df cutoff is meant to prevent. This aggregate caps
  * the buffer at the source: once a partial has seen `cap + 1` values
  * it stops accumulating (the sentinel state is already decided), so a
  * hot key costs O(cap) memory per partial, not O(df).
  *
  * Correctness of the bound: every partial buffer holds a SUBSET of the
  * group's values, so a group with total count ≤ cap can never reach
  * `cap + 1` in any partial or merged buffer — its final list is
  * complete and sorted (ascending, the type's natural ordering). A
  * group over `cap` is guaranteed to evaluate to null: its total count
  * means the merged buffer must exceed `cap` regardless of how values
  * were split across partials. Callers therefore pair this with a
  * `count(*)`-based `df <= cap` filter; the `isNotNull` guard is
  * belt-and-braces (the two conditions are equivalent when the child is
  * non-null; they differ only when null values — which this aggregate
  * skips, like `collect_list` — contribute to the row count).
  *
  * Supports partial aggregation (plans as ObjectHashAggregate with
  * map-side partials), so hot keys also collapse before the shuffle.
  */
case class BoundedCollectAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] {

  require(cap > 0, s"bounded_collect cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_collect"

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty[Any]

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    // stop at cap + 1: the overflow verdict is already decided, and the
    // bound is the whole point
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    val room = (cap + 1) - buf.length
    if (room >= other.length) buf ++= other
    else if (room > 0) buf ++= other.take(room)
    buf
  }

  private lazy val ordering = TypeUtils.getInterpretedOrdering(child.dataType)

  override def eval(buf: ArrayBuffer[Any]): Any =
    if (buf.length > cap) null
    else new GenericArrayData(buf.sorted(ordering).toArray)

  // serialize through a single-column UnsafeRow so any atomic child type
  // round-trips without a per-type switch
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val row = new UnsafeRow(1)

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(buf.length)
    val holder = InternalRow(null)
    buf.foreach { v =>
      holder.update(0, v)
      val b = proj(holder).getBytes
      d.writeInt(b.length)
      d.write(b)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      buf += InternalRow.copyValue(row.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedCollectAgg =
    copy(child = newChildren.head)
}

object BoundedCollect {
  /** Column form: sorted list of the group's non-null values, or NULL if
    * the group holds more than `cap` of them — with the aggregation
    * buffer itself bounded at `cap + 1` elements. */
  def boundedCollect(value: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedCollectAgg(ColumnBridge.expression(value), cap).toAggregateExpression())
}
