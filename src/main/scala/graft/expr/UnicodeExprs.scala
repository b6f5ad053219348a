package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the text-dedup
  * prerequisite Spark has no built-in for: "café" typed with a combining
  * acute (`e` + U+0301) and precomposed "café" (U+00E9) are different
  * byte strings, so every hash-keyed dedup, fingerprint, join key and
  * group-by treats them as distinct documents until normalization
  * collapses them. NFC is pinned by the Unicode conformance tests, so
  * `java.text.Normalizer` here and an independent engine's native
  * normalizer (DuckDB `nfc_normalize` in the oracle) produce identical
  * bytes — the rare case where two engines' INDEPENDENT implementations
  * of a text transform can be hash-compared directly.
  *
  * Row-local and codegen'd (one library call per row inside whole-stage
  * codegen); ASCII-only strings pass through untouched (the normalizer
  * short-circuits on `Normalizer.isNormalized`-cheap inputs).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs STRING, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object UnicodeExprs {
  /** NFC-normalized form of `s` (see [[NfcNormalize]]). */
  def nfcNormalize(s: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(s)))
}
