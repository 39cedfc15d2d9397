package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Per-group top-m selection with a PROVABLE memory bound: the
  * aggregation buffer is a size-m heap of struct keys, so "the best m
  * rows of every group" costs O(m) memory per group per partial — with
  * NO driver state and NO enumeration of the groups anywhere.
  *
  * Why this exists: the per-domain diversity cap ("at most m best pages
  * per host") is the first selection a crawl curation runs, and a real
  * crawl has tens of millions of hosts. A ranking window serializes
  * each host's rows through one task; the named-quota selection forms
  * need the group list up front; and discovering the groups with a
  * `distinct().collect()` puts one string per host on the driver —
  * exactly the bounded-loud-fail shape this aggregate replaces
  * (the former `takeTopPerGroupUniform` group enumeration). As a plain
  * `TypedImperativeAggregate` it plans as ObjectHashAggregate with
  * map-side partials: hot hosts collapse to m entries before the
  * shuffle, and the group cardinality only ever lives spread across
  * the cluster, never in one place.
  *
  * Semantics: `child` must be a non-null struct; rows where ANY struct
  * field is null are skipped (the selection family's null-drop
  * contract). Ranking is lexicographic over the struct fields, each
  * ascending unless its `desc` flag is set; "top" means the m FIRST
  * keys under that order. Eval returns the kept keys best-first — a
  * complete, deterministic result whenever the full key (e.g. a
  * (quality, unique id) pair) is duplicate-free within the group.
  * Groups with ≤ m rows keep everything.
  */
case class BoundedTopMAgg(
    child: Expression,
    m: Int,
    desc: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(m >= 0, s"bounded_top_m m must be >= 0, got $m")

  // the child is unresolved at construction — type checks defer to
  // analysis (checkInputDataTypes), like every Catalyst expression
  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.length == desc.length =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case s: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_top_m needs one desc flag per struct field " +
            s"(${s.length}), got ${desc.length}")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_top_m key must be a struct, got ${other.catalogString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "bounded_top_m"

  @transient private lazy val fieldTypes = structType.fields.map(_.dataType)
  @transient private lazy val fieldOrds =
    fieldTypes.map(TypeUtils.getInterpretedOrdering)

  /** compare(a, b) < 0 ⇔ a ranks BEFORE b (a is better). */
  @transient private lazy val bestFirst: Ordering[InternalRow] =
    new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < fieldTypes.length) {
          val c = fieldOrds(i).compare(
            a.get(i, fieldTypes(i)), b.get(i, fieldTypes(i)))
          if (c != 0)
            return if (desc(i)) { if (c < 0) 1 else -1 } else c
          i += 1
        }
        0
      }
    }

  // the PQ dequeues its MAX = the worst kept key, so a better arrival
  // evicts it in O(log m)
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty(bestFirst)

  /** Admit an OWNED (already-copied or deserialized) key. */
  private def offer(buf: mutable.PriorityQueue[InternalRow],
                    key: InternalRow): Unit =
    if (m > 0) {
      if (buf.size < m) buf += key
      else if (bestFirst.compare(key, buf.head) < 0) {
        buf.dequeue(); buf += key
      }
    }

  override def update(buf: mutable.PriorityQueue[InternalRow],
                      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      var i = 0
      var ok = true
      while (ok && i < fieldTypes.length) {
        if (r.isNullAt(i)) ok = false
        i += 1
      }
      // admission test BEFORE the copy: every corpus row passes through
      // here and a full group rejects almost all of them — the eval'd
      // row is valid for the duration of this call, so compare first
      // and copy only winners (the buffer must own its rows; the
      // projection reuses the backing buffer on the next eval)
      if (ok && m > 0) {
        if (buf.size < m) buf += r.copy()
        else if (bestFirst.compare(r, buf.head) < 0) {
          buf.dequeue(); buf += r.copy()
        }
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
                     other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(offer(buf, _)) // already copied at update/deserialize
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(
      buf.toArray.sorted(bestFirst).asInstanceOf[Array[Any]])

  // serialize through a single-column UnsafeRow holding the struct, the
  // BoundedCollectAgg round-trip pattern
  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](structType))
  @transient private lazy val row = new UnsafeRow(1)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(buf.size)
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

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      buf += row.getStruct(0, fieldTypes.length).copy()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopMAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopMAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopMAgg =
    copy(child = newChildren.head)
}

object BoundedTopM {
  /** Column form: the group's m first `key` structs under the
    * lexicographic (per-field `desc`-flagged) order, returned
    * best-first; rows with any null key field skip. The aggregation
    * buffer holds at most m keys. */
  def topM(key: Column, m: Int, desc: Seq[Boolean]): Column =
    ColumnBridge.column(
      BoundedTopMAgg(ColumnBridge.expression(key), m, desc)
        .toAggregateExpression())
}
