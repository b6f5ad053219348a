package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rolling polynomial fingerprint over a string's code points:
  * `h = fold(codepoints, 0, (acc, c) => (acc * 31 + c) mod 1e9+7)`.
  *
  * Replaces the `transform(split(s, "")) + aggregate` higher-order-function
  * formulation, whose lambda runs INTERPRETED per character — this loop is
  * a tight generated-Java walk, so document fingerprinting stays inside
  * whole-stage codegen on a corpus scan (the 4-8x HOF-vs-codegen gap
  * measured on the MinHash path applies per character here).
  *
  * Semantics are bit-identical to the HOF form and to the DuckDB oracle
  * (`TextOps.Sql.fingerprint`): iteration is by Unicode code point (the
  * regex split never cuts a surrogate pair) and the 1e9+7 modulus keeps
  * every intermediate exactly representable in any engine's integers.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint needs STRING, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("fpStr")
      val i = ctx.freshName("fpI")
      val cp = ctx.freshName("fpCp")
      val acc = ctx.freshName("fpAcc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
  override def prettyName: String = "rolling_fingerprint"
}

object TextFingerprintExprs {
  /** Codegen'd rolling code-point fingerprint of `s`. */
  def rollingFingerprint(s: Column): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(s)))
}
