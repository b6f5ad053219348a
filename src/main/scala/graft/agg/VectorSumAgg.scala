package graft.agg

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Elementwise fixed-point sum buffer. `sums` stays null until the first
  * vector fixes the dimensionality (merge/serialize treat null as "no
  * input seen yet").
  */
final class VecSumBuffer {
  var sums: Array[Long] = null
}

/** `vec_sum_fixed(vec, scale)`: elementwise sum of a numeric-array column
  * in fixed point — each element is truncated to `(x * scale).toLong`
  * before accumulating, so the per-dimension totals are EXACT integers and
  * the result is identical under any partitioning, merge order, or
  * executor count (float addition is not associative; long addition is).
  * This is the embedding analog of the fixed-point money sums used in the
  * grid aggregations.
  *
  * Scale shape: classic mergeable summary — each map task forwards ONE
  * `dims x 8 B` buffer per group, so a billion-vector per-label centroid
  * question shuffles `groups x partitions x dims` longs instead of
  * exploding to `rows x dims` (the `posexplode + groupBy(label, dim)`
  * formulation, which the DuckDB oracle uses independently).
  *
  * Truncation (not rounding) is deliberate: `double.toLong` toward-zero is
  * bit-defined on every engine (`trunc` in ANSI SQL), while round-half
  * conventions differ subtly across libms/engines. Quantization scale is
  * arbitrary, so the cheapest exactly-portable map wins.
  *
  * Headroom: elements |x| <= 2000 at scale 1e6 give |fixed| <= 2^41, so
  * overflow needs > 2^22 (~4M) same-sign max-magnitude rows per dimension
  * per group TIMES 2^21 more — i.e. ~2^43 rows; far beyond any real group.
  */
case class FixedPointVecSumAgg(
    child: Expression,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[VecSumBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_sum_fixed needs ARRAY<FLOAT|DOUBLE>, got $other")
  }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (buf.sums == null) buf.sums = new Array[Long](n)
      require(buf.sums.length == n,
        s"vec_sum_fixed: ragged input (${buf.sums.length} vs $n dims)")
      var i = 0
      while (i < n) {
        val x = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        buf.sums(i) += (x * scale).toLong
        i += 1
      }
    }
    buf
  }

  override def merge(b1: VecSumBuffer, b2: VecSumBuffer): VecSumBuffer = {
    if (b2.sums != null) {
      if (b1.sums == null) b1.sums = new Array[Long](b2.sums.length)
      require(b1.sums.length == b2.sums.length, "vec_sum_fixed: ragged merge")
      var i = 0
      while (i < b1.sums.length) { b1.sums(i) += b2.sums(i); i += 1 }
    }
    b1
  }

  override def eval(buf: VecSumBuffer): Any =
    new GenericArrayData(
      if (buf.sums == null) Array.emptyLongArray else buf.sums)

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new VecSumBuffer
    if (n > 0) {
      buf.sums = new Array[Long](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FixedPointVecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FixedPointVecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FixedPointVecSumAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "vec_sum_fixed"
}

object VecSumFunctions {
  /** `ARRAY<BIGINT>` of elementwise `(x * scale).toLong` sums. */
  def vecSumFixed(vec: Column, scale: Double): Column =
    Bridge.aggColumn(FixedPointVecSumAgg(Bridge.expression(vec), scale))
}
