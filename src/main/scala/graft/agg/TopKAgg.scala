package graft.agg

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs under the
  * ordering (score DESC, id ASC). Backed by a TreeSet whose FIRST element
  * is the current worst, so insert/evict is O(log k). Ids are Catalyst
  * internal values of any orderable type; `idOrd` supplies their ordering.
  */
final class TopKBuffer(val k: Int, idOrd: Ordering[Any]) {
  // worst-first comparator: lower score first; on score ties the HIGHER id
  // is worse (rank tie-break is id ascending)
  val set = new java.util.TreeSet[(Double, Any)](new Comparator[(Double, Any)] {
    override def compare(a: (Double, Any), b: (Double, Any)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else idOrd.compare(b._2, a._2)
    }
  })
  def add(score: Double, id: Any): Unit = {
    set.add((score, id))
    if (set.size > k) set.pollFirst()
  }
}

/** Partial top-k aggregation: per group, the k best (score, id) pairs by
  * (score DESC, id ASC), as `ARRAY<STRUCT<score, id>>` in rank order. The
  * id keeps its input type — any orderable atomic type works (long ids,
  * string doc keys, dates, …), with ties broken by the type's own order.
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

  private def idType: DataType = idChild.dataType
  @transient private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idType)
  // (score, id) rows serialize as UnsafeRow bytes — type-agnostic, no
  // reflection, and the same layout Spark itself spills
  @transient private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](DoubleType, idType))

  override def children: Seq[Expression] = Seq(scoreChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", idType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(idType, prettyName)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, idOrdering)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreChild.eval(input)
    val i = idChild.eval(input)
    // copy: non-primitive values (UTF8String &c) may alias a reused row
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], InternalRow.copyValue(i))
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
    val rows = new Array[Array[Byte]](buf.set.size)
    var total = 4
    val it = buf.set.iterator()
    var j = 0
    while (it.hasNext) {
      val (s, i) = it.next()
      // UnsafeProjection reuses one result row; for exactly-sized buffers
      // getBytes ALIASES it, so each projection would overwrite the last —
      // copy() snapshots to a fresh exact-size array
      rows(j) = serProj(new GenericInternalRow(Array[Any](s, i))).copy().getBytes
      total += 4 + rows(j).length
      j += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, idOrdering)
    val row = new UnsafeRow(2)
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val off = bb.position()
      row.pointTo(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off.toLong, len)
      buf.add(row.getDouble(0), InternalRow.copyValue(row.get(1, idType)))
      bb.position(off + len)
      j += 1
    }
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
  /** `ARRAY<STRUCT<score DOUBLE, id <idType>>>` of the group's k best pairs
    * by (score DESC, id ASC), already in rank order.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Bridge.aggColumn(TopKByScoreAgg(
      Bridge.expression(score), Bridge.expression(id), k))
}
