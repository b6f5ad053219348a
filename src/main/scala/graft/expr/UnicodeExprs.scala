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

/** Diacritic folding — the aggressive cousin of [[NfcNormalize]] used
  * for match keys rather than canonical storage: NFD decomposition
  * followed by removal of every combining mark (Unicode category Mn), so
  * "déjà", "deja" and "de" + COMBINING ACUTE + "ja" all collapse to
  * "deja". The fuzzy-join/entity-resolution blocking step real pipelines
  * run before hashing names; characters with no decomposition (CJK,
  * digits, ASCII) pass through untouched.
  *
  * The oracle compares against DuckDB's independent `strip_accents`
  * (utf8proc) — the [[NfcNormalize]] discipline of hash-comparing two
  * independent Unicode implementations, valid on the Latin-script
  * domain the gate plants.
  */
case class FoldDiacritics(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fold_diacritics needs STRING, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(FoldDiacritics.fold(
      v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.expr.FoldDiacritics.fold($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): FoldDiacritics =
    copy(child = newChild)
  override def prettyName: String = "fold_diacritics"
}

object FoldDiacritics {
  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** NFD + strip combining marks (shared by eval and generated code). */
  def fold(s: String): String = {
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    Marks.matcher(d).replaceAll("")
  }
}

object UnicodeExprs {
  /** NFC-normalized form of `s` (see [[NfcNormalize]]). */
  def nfcNormalize(s: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(s)))

  /** Diacritic-folded form of `s` (see [[FoldDiacritics]]). */
  def foldDiacritics(s: Column): Column =
    Bridge.column(FoldDiacritics(Bridge.expression(s)))
}
