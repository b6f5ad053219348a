package graft.agg

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `bitmap_distinct(id, maxId)`: EXACT distinct count of a bounded
  * non-negative BIGINT id domain via a fixed bitmap — the exact
  * complement of `approx_count_distinct`'s HLL:
  *
  *  - HLL: any domain, ~2% relative error, KB-sized buffer;
  *  - bitmap: ids in `[0, maxId)`, exact, `maxId/8` bytes per group.
  *
  * Scale shape: the shuffle carries `partitions x groups x maxId/8`
  * bytes no matter how many input ROWS exist — a trillion-row "distinct
  * users per segment" question moves only bitmap buffers, where
  * `count(DISTINCT id)` re-shuffles every distinct id. Merge is a
  * word-wise OR — associative, commutative, idempotent — so the count is
  * layout-invariant by construction (the bitmap IS the set; there is no
  * split-order dependence to reason about). The domain contract is
  * explicit: an id outside `[0, maxId)` throws (the spanDedup posCap
  * discipline) — use HLL when the domain is unbounded.
  */
case class BitmapDistinctAgg(
    child: Expression,
    maxId: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(maxId >= 1 && maxId <= (1L << 32),
    s"bitmap_distinct needs maxId in [1, 2^32], got $maxId " +
      "(the buffer is maxId/8 bytes per group — use HLL beyond that)")

  private val nWords = ((maxId + 63) / 64).toInt

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0 || id >= maxId)
        throw new IllegalArgumentException(
          s"bitmap_distinct: id $id outside [0, $maxId) — widen maxId or " +
            "use approx_count_distinct for unbounded domains")
      buf((id >> 6).toInt) |= 1L << (id & 63)
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < nWords) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nWords)
    var i = 0
    while (i < nWords) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](nWords)
    var i = 0
    while (i < nWords) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinctAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_distinct"
}

object BitmapDistinct {
  /** Exact bitmap distinct count of a bounded BIGINT id column. */
  def bitmapDistinct(id: Column, maxId: Long): Column =
    Bridge.aggColumn(BitmapDistinctAgg(Bridge.expression(id), maxId))
}
