package graft.agg

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs under the
  * ordering (score DESC, id ASC). Backed by a TreeSet whose FIRST element
  * is the current worst, so insert/evict is O(log k).
  */
final class TopKBuffer(val k: Int) {
  // worst-first comparator: lower score first; on score ties the HIGHER id
  // is worse (rank tie-break is id ascending)
  val set = new java.util.TreeSet[(Double, Long)](new Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  })
  def add(score: Double, id: Long): Unit = {
    set.add((score, id))
    if (set.size > k) set.pollFirst()
  }
}

/** Partial top-k aggregation: per group, the k best (score, id) pairs by
  * (score DESC, id ASC), as `ARRAY<STRUCT<score, id>>` in rank order.
  *
  * This replaces the global-window top-k pattern
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC)` + filter):
  * the window shuffles and sorts EVERY scored row, while this aggregate
  * rides standard two-phase hash aggregation — each map task forwards at
  * most k pairs per group, so the shuffle carries <= groups x k x
  * partitions rows no matter how many candidates were scored. At
  * 100 TB corpus x broadcast queries, the full-score Exchange is the
  * difference between shuffling the corpus and shuffling kilobytes.
  */
case class TopKByScoreAgg(
    scoreChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"topk needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(scoreChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreChild.eval(input)
    val i = idChild.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    val it = b2.set.iterator()
    while (it.hasNext) { val (s, i) = it.next(); b1.add(s, i) }
    b1
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.descendingIterator() // best-first = rank order
    var j = 0
    while (it.hasNext) {
      val (s, i) = it.next()
      out(j) = new GenericInternalRow(Array[Any](s, i))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.set.size)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.add(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(scoreChild = newChildren(0), idChild = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

object TopKFunctions {
  /** `ARRAY<STRUCT<score DOUBLE, id BIGINT>>` of the group's k best pairs
    * by (score DESC, id ASC), already in rank order.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Bridge.aggColumn(TopKByScoreAgg(
      Bridge.expression(score), Bridge.expression(id), k))
}
