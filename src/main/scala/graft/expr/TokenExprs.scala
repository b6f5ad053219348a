package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-token folds over an `ARRAY<STRING>` token column.
  *
  * Both replace higher-order-function formulations (`filter` +
  * `array_contains`, `aggregate` + `ceil`) whose lambdas evaluate
  * INTERPRETED per token — on a 100 TB text scan the per-element lambda
  * dispatch dominates; these loops stay inside whole-stage codegen.
  * Compile-gated in CodegenCompileSpec (generated == interpreted pinned).
  */

/** Count of tokens contained in the literal `words` set (with
  * multiplicity — each matching occurrence counts, exactly like
  * `size(filter(toks, array_contains(words, _)))`).
  */
case class TokenSetHits(child: Expression, words: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_set_hits needs ARRAY<STRING>, got $t")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val len = a.numElements()
    var n = 0
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      s"""
         |int $n = 0;
         |int $len = $c.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$c.isNullAt($i) && $ref.contains($c.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
  override def prettyName: String = "token_set_hits"
}

/** BPE-ish subword estimate: `Σ ceil(numChars(token) / 4)` — identical to
  * the `aggregate(toks, 0, acc + ceil(len/4))` spec (`(n + 3) / 4` in
  * integers; tokens are never empty so the forms agree).
  */
case class SubwordEstimate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"subword_estimate needs ARRAY<STRING>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val len = a.numElements()
    var sum = 0L
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i)) sum += (a.getUTF8String(i).numChars() + 3) / 4
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val len = ctx.freshName("len")
      s"""
         |long $sum = 0L;
         |int $len = $c.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$c.isNullAt($i)) $sum += ($c.getUTF8String($i).numChars() + 3) / 4;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SubwordEstimate =
    copy(child = newChild)
  override def prettyName: String = "subword_estimate"
}

/** Total character count across tokens: `Σ numChars(token)` — identical
  * to the `aggregate(toks, 0L, (a, t) -> a + length(t))` spec form whose
  * lambda would run interpreted per token.
  */
case class TokenLengthSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_length_sum needs ARRAY<STRING>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val len = a.numElements()
    var sum = 0L
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i)) sum += a.getUTF8String(i).numChars()
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val len = ctx.freshName("len")
      s"""
         |long $sum = 0L;
         |int $len = $c.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$c.isNullAt($i)) $sum += $c.getUTF8String($i).numChars();
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenLengthSum =
    copy(child = newChild)
  override def prettyName: String = "token_length_sum"
}

object TokenExprs {
  /** Codegen'd stopword-hit count over a token array. */
  def tokenSetHits(toks: Column, words: Seq[String]): Column =
    Bridge.column(TokenSetHits(Bridge.expression(toks), words))

  /** Codegen'd subword-count estimate over a token array. */
  def subwordEstimate(toks: Column): Column =
    Bridge.column(SubwordEstimate(Bridge.expression(toks)))

  /** Codegen'd total token-character count over a token array. */
  def tokenLengthSum(toks: Column): Column =
    Bridge.column(TokenLengthSum(Bridge.expression(toks)))
}
