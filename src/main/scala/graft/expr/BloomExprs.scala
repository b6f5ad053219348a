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

object BloomExprs {
  /** Membership-probe column against `bloom` (codegen'd, row-local). */
  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(key), bloom))
}
