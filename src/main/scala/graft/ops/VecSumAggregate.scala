package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of an `array<double>` column as a native aggregate:
  * one accumulator array per partial-agg buffer, merged pairwise — the
  * whole corpus reduces to `dim` doubles through map-side combine.
  *
  * This replaces the posexplode-then-groupBy(pos) corpus-mean plan
  * (n×dim rows through a shuffle); here nothing but k×dim-double
  * buffers ever leave the executors. Dimension mismatches throw, same
  * contract as [[TextKernels.vecDot]] — schema drift must surface.
  */
case class VecSumAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sum"

  // zero-length marks "no input yet" — real zero-dim vectors cannot occur
  // as array<double> embeddings worth summing
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], v: Array[Double]): Array[Double] =
    if (buf.length == 0) v.clone()
    else {
      require(buf.length == v.length,
        s"vector dimension mismatch: ${buf.length} vs ${v.length}")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      // empty arrays contribute nothing (like posexplode of an empty
      // array) rather than tripping the dimension-mismatch contract;
      // callers averaging must count only non-empty vectors
      if (arr.numElements() == 0) buf
      else {
        // toDoubleArray reads a NULL slot as 0.0 (the raw region copy
        // ignores the null bitmap) — a null element would silently bend
        // the corpus mean. Same surface-the-drift contract as the
        // dimension check.
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (arr.isNullAt(i))
            throw new IllegalArgumentException(
              s"vec_sum: null element at index $i of a ${n}-dim vector — " +
                "filter or repair null slots before aggregating")
          i += 1
        }
        add(buf, arr.toDoubleArray())
      }
    }
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    if (other.length == 0) buf else add(buf, other)

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSumAggregate =
    copy(child = newChildren.head)
}

object VecSumAggregate {
  /** Column form: element-wise sum of an array&lt;double&gt; column. */
  def vecSum(vec: Column): Column =
    ColumnBridge.column(
      VecSumAggregate(ColumnBridge.expression(vec)).toAggregateExpression())
}
