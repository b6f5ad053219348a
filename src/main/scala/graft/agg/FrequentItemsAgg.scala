package graft.agg

import java.nio.ByteBuffer
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Misra-Gries frequent-items summary over 64-bit keys: at most `capacity`
  * counters; any key whose true frequency exceeds N/(capacity+1) is
  * GUARANTEED to be present (estimates may undercount by at most
  * N/(capacity+1)). Merging follows the mergeable-summaries construction
  * (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries",
  * PODS 2012): sum counters, then subtract the (capacity+1)-th largest
  * count and drop non-positive counters — the guarantee survives any merge
  * tree, so the sketch rides Spark's standard partial/final aggregation.
  */
final class FreqSketch(val capacity: Int) {
  val counts = new JHashMap[Long, Long]()

  def add(x: Long): Unit = {
    val existing = counts.getOrDefault(x, 0L)
    if (existing > 0L) counts.put(x, existing + 1L)
    else if (counts.size < capacity) counts.put(x, 1L)
    else decrementAll()
  }

  /** Classic MG decrement: every counter -1, zeros evicted. O(capacity) per
    * call but amortized O(1) per update — each round cancels capacity+1
    * prior increments (the incoming item pays for itself).
    */
  private def decrementAll(): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
    }
  }

  /** Mergeable-summaries combine: pairwise-sum, then reduce back to
    * `capacity` counters by subtracting the (capacity+1)-th largest count.
    */
  def mergeIn(other: FreqSketch): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** `freq_sketch(key, capacity)` aggregate: ARRAY<STRUCT<key BIGINT,
  * est BIGINT>> of the surviving counters, ordered (est DESC, key ASC).
  *
  * Scale shape: each map task forwards ONE buffer of <= capacity counters
  * regardless of input rows or key cardinality — the shuffle for a
  * billion-key frequency question is `partitions x capacity x 16 B`,
  * where a full `groupBy(key).count` would shuffle every distinct key.
  * The intended 100 TB pattern is two passes: sketch for a guaranteed
  * candidate superset, then an exact count restricted to the (broadcast)
  * candidates — see `q_heavy_hitters`.
  *
  * The surviving-counter SET depends on input split order (any valid MG
  * summary does); only the guarantee above is contractual. Downstream
  * exact verification makes the composed query deterministic.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch] {

  require(capacity >= 1, s"freq_sketch needs capacity >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(capacity)

  override def update(buf: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: FreqSketch, b2: FreqSketch): FreqSketch = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buf: FreqSketch): Any = {
    val entries = new Array[(Long, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortBy { case (k, est) => (-est, k) }
    new GenericArrayData(sorted.map { case (k, est) =>
      new GenericInternalRow(Array[Any](k, est))
    })
  }

  override def serialize(buf: FreqSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.counts.size)
    bb.putInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqSketch(capacity)
    var i = 0
    while (i < n) { buf.counts.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "freq_sketch"
}

object FrequentItems {
  /** Misra-Gries summary of a BIGINT key column: ARRAY<STRUCT<key, est>>
    * with the [[MisraGriesAgg]] guarantee (every key with true count
    * > N/(capacity+1) present), ordered (est DESC, key ASC).
    */
  def freqSketch(key: Column, capacity: Int): Column =
    Bridge.aggColumn(MisraGriesAgg(Bridge.expression(key), capacity))
}
