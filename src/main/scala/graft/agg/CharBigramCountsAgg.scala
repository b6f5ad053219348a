package graft.agg

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact character-bigram counts of a STRING column as ONE aggregation
  * buffer — the training pass of the char-n-gram LM
  * ([[graft.ops.LmOps]]) without materializing a bigram row per
  * character: `explode(bigrams) + groupBy` shuffles a row per corpus
  * CHARACTER (72M rows on the 200k-doc scale bench), while this
  * aggregate walks each document in place and forwards one
  * charset²-bounded map per task — the shuffle is `tasks x |bigrams|`
  * entries regardless of corpus size. Counts are exact integers, so the
  * result is identical under any partitioning or merge order.
  */
final class BigramCounts {
  // Open-addressed (linear probe) long -> long map, bigram keyed by its
  // two code points packed `(cp1 << 32) | cp2` — a String-keyed HashMap
  // costs a String + a boxed Long PER CORPUS CHARACTER (~100M allocations
  // on the 200k-doc scale bench); this walk allocates nothing per bigram.
  private var cap = 1 << 10
  private var keys = new Array[Long](cap)
  private var live = new Array[Boolean](cap)
  private var vals = new Array[Long](cap)
  var size = 0

  def add(key: Long, inc: Long): Unit = {
    if (size * 4 >= cap * 3) grow()
    var i = (scala.util.hashing.byteswap64(key) & (cap - 1)).toInt
    while (live(i) && keys(i) != key) i = (i + 1) & (cap - 1)
    if (!live(i)) { live(i) = true; keys(i) = key; vals(i) = inc; size += 1 }
    else vals(i) += inc
  }

  def addBigramsOf(s: UTF8String): Unit = {
    val str = s.toString // ONE allocation per row
    var i = 0
    var prev = -1
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (prev >= 0) add((prev.toLong << 32) | cp, 1L)
      prev = cp
      i += Character.charCount(cp)
    }
  }

  private def grow(): Unit = {
    val ok = keys; val ol = live; val ov = vals
    cap <<= 1
    keys = new Array[Long](cap); live = new Array[Boolean](cap); vals = new Array[Long](cap)
    size = 0
    var i = 0
    while (i < ok.length) {
      if (ol(i)) add(ok(i), ov(i))
      i += 1
    }
  }

  def foreachEntry(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (live(i)) f(keys(i), vals(i))
      i += 1
    }
  }

  def mergeIn(other: BigramCounts): Unit =
    other.foreachEntry((k, v) => add(k, v))

  /** Packed key back to the 2-character bigram string. */
  def keyString(key: Long): String = {
    val sb = new java.lang.StringBuilder(4)
    sb.appendCodePoint((key >>> 32).toInt)
    sb.appendCodePoint((key & 0xffffffffL).toInt)
    sb.toString
  }
}

/** `char_bigram_counts(s)` aggregate: ARRAY<STRUCT<b STRING, cnt BIGINT>>
  * of exact bigram counts over every input row, ordered by bigram.
  */
case class CharBigramCountsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BigramCounts] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("b", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): BigramCounts = new BigramCounts

  override def update(buf: BigramCounts, input: InternalRow): BigramCounts = {
    val v = child.eval(input)
    if (v != null) buf.addBigramsOf(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: BigramCounts, b2: BigramCounts): BigramCounts = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buf: BigramCounts): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    buf.foreachEntry { (k, v) =>
      entries(i) = (buf.keyString(k), v)
      i += 1
    }
    val sorted = entries.sortBy(_._1)
    new GenericArrayData(sorted.map { case (b, cnt) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(b), cnt))
    })
  }

  override def serialize(buf: BigramCounts): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BigramCounts = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BigramCounts
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CharBigramCountsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CharBigramCountsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharBigramCountsAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "char_bigram_counts"
}

object BigramFunctions {
  /** Exact bigram-count summary of a STRING column (one buffer per task;
    * see [[CharBigramCountsAgg]]).
    */
  def charBigramCounts(s: Column): Column =
    Bridge.aggColumn(CharBigramCountsAgg(Bridge.expression(s)))
}
