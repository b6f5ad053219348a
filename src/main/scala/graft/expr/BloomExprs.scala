package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter sketch.
  *
  * The sketch rides into the generated class via `addReferenceObj` (it is
  * `java.io.Serializable`, so it ships to executors inside the serialized
  * plan exactly like a broadcast literal — built once, probed per row with
  * two hash mixes; no per-row deserialization).
  *
  * FALSE means the key is DEFINITELY absent from the filtered set; TRUE
  * means "maybe present" at the sketch's false-positive rate. NULL in →
  * NULL out (compose with `coalesce` for join semantics at the call site).
  * Keys are BIGINT — cast narrower integrals at the call site; the probe
  * matches `DataFrameStatFunctions.bloomFilter`'s `putLong` insertions.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs BIGINT key, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

/** Bit position `j` of a key in an `mBits`-wide Bloom bitset:
  * `(splitmix64(key * 2654435761 + salt) >>> 1) % mBits`.
  *
  * The hash family is the same splitmix64 avalanche the synthetic granule
  * decode uses (`sources/GranuleSource.scala` `mix`), so the whole chain
  * replays bit-for-bit in DuckDB HUGEINT SQL via `RefQueries.mixSql` —
  * wrapping multiplies split into 32-bit halves, logical shifts as integer
  * division (the q_granule_source discipline). That makes a Bloom INDEX
  * oracle-able: the gate checks the pruning DECISIONS, not just row parity.
  *
  * Wrapping arithmetic happens inside generated Java (long overflow wraps
  * mod 2^64 there), deliberately outside Spark's ANSI-checked operators;
  * the oracle's `% 2^64` on the non-wrapping HUGEINT product agrees for
  * every non-negative key. `>>> 1` keeps the dividend non-negative so `%`
  * is a true mod.
  */
case class BloomBitPos(child: Expression, salt: Int, mBits: Int)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_bit_pos needs BIGINT key, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    var z = v.asInstanceOf[Long] * 2654435761L + salt + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    ((z >>> 1) % mBits).toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""long $z = $c * 2654435761L + $salt + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |$z ^= ($z >>> 31);
         |${ev.value} = (int) (($z >>> 1) % $mBits);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomBitPos =
    copy(child = newChild)
  override def prettyName: String = "bloom_bit_pos"
}

/** The raw 64-bit member of the same family: `splitmix64(key * 2654435761
  * + salt)` with no truncation — the full-width hash behind the KMV
  * distinct sketch (order statistics need all 63 bits after the sign
  * shift, so [[BloomBitPos]]'s modular cut is the wrong shape there).
  * Same wrapping-in-generated-Java / HUGEINT-mod-2^64 replay contract.
  */
case class SplitmixHash(child: Expression, salt: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"splitmix_hash needs BIGINT key, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    var z = v.asInstanceOf[Long] * 2654435761L + salt + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""long $z = $c * 2654435761L + $salt + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $z ^ ($z >>> 31);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SplitmixHash =
    copy(child = newChild)
  override def prettyName: String = "splitmix_hash"
}

object BloomExprs {
  /** Membership-probe column against `bloom` (codegen'd, row-local). */
  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(key), bloom))

  /** Full-width hash `salt` of `key` (see [[SplitmixHash]]). */
  def splitmixHash(key: Column, salt: Int): Column =
    Bridge.column(SplitmixHash(Bridge.expression(key), salt))

  /** Hash `salt` of `key` into a bit position in `[0, mBits)` — the
    * oracle-replayable Bloom hash family (see [[BloomBitPos]]).
    */
  def bitPos(key: Column, salt: Int, mBits: Int): Column =
    Bridge.column(BloomBitPos(Bridge.expression(key), salt, mBits))
}
