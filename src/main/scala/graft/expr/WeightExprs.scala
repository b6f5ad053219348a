package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd literal-weight-table folds: apply a small trained model
  * (linear classifier lexicon, char-n-gram LM probabilities) to every row
  * as a pure map — the model ships as a plan-time literal (the IVF-centroid
  * pattern), so a 100 TB scoring pass has zero joins and zero shuffles.
  *
  * A `transform` + `element_at(map_literal, k)` formulation evaluates its
  * lambda interpreted per element AND scans the literal map linearly per
  * lookup; these loops probe a prebuilt hash table inside whole-stage
  * codegen. Compile-gated in CodegenCompileSpec.
  */
private[expr] object WeightTable {
  def build(keys: Seq[String], weights: Seq[Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](keys.size * 2)
    keys.iterator.zip(weights.iterator).foreach { case (k, w) =>
      m.put(UTF8String.fromString(k), java.lang.Long.valueOf(w))
    }
    m
  }
}

/** Σ weight(token) over an `ARRAY<STRING>` token column (with multiplicity;
  * tokens absent from the table contribute 0) — the scoring step of a
  * fastText-style linear text classifier with a fixed vocabulary.
  */
case class TokenWeightSum(child: Expression, keys: Seq[String], weights: Seq[Long])
  extends UnaryExpression {

  require(keys.length == weights.length, "keys and weights must align")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_weight_sum needs ARRAY<STRING>, got $t")
  }

  @transient private lazy val table = WeightTable.build(keys, weights)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val len = a.numElements()
    var sum = 0L
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i)) {
        val w = table.get(a.getUTF8String(i))
        if (w != null) sum += w.longValue()
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weightTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val len = ctx.freshName("len")
      val w = ctx.freshName("w")
      s"""
         |long $sum = 0L;
         |int $len = $c.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    java.lang.Long $w = (java.lang.Long) $ref.get($c.getUTF8String($i));
         |    if ($w != null) $sum += $w.longValue();
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWeightSum =
    copy(child = newChild)
  override def prettyName: String = "token_weight_sum"
}

/** Σ weight(bigram) over every character bigram of a STRING (positions
  * i..i+1 for i in 1..numChars-1; absent bigrams contribute 0) — the
  * scoring step of a character-n-gram language model, walked directly on
  * the string so no bigram array is ever materialized.
  */
case class CharBigramWeightSum(child: Expression, keys: Seq[String], weights: Seq[Long])
  extends UnaryExpression {

  require(keys.length == weights.length, "keys and weights must align")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_bigram_weight_sum needs STRING, got $t")
  }

  @transient private lazy val table = WeightTable.build(keys, weights)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val n = s.numChars()
    var sum = 0L
    var i = 1
    while (i < n) {
      val w = table.get(s.substringSQL(i, 2))
      if (w != null) sum += w.longValue()
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weightTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      s"""
         |long $sum = 0L;
         |int $n = $c.numChars();
         |for (int $i = 1; $i < $n; $i++) {
         |  java.lang.Long $w = (java.lang.Long) $ref.get($c.substringSQL($i, 2));
         |  if ($w != null) $sum += $w.longValue();
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CharBigramWeightSum =
    copy(child = newChild)
  override def prettyName: String = "char_bigram_weight_sum"
}

/** All character bigrams of a STRING as `ARRAY<STRING>` (positions i..i+1
  * for i in 1..numChars−1) — the training-side twin of
  * [[CharBigramWeightSum]]. A `transform(sequence(...), i -> substr(...))`
  * formulation evaluates its lambda interpreted per character; this loop
  * stays inside whole-stage codegen (measured 2.4x on the LM training
  * pass at sf0.1).
  */
case class CharBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_bigrams needs STRING, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val n = s.numChars()
    val m = if (n > 1) n - 1 else 0
    val out = new Array[Any](m)
    var i = 1
    while (i < n) {
      out(i - 1) = s.substringSQL(i, 2)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $c.numChars();
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  new org.apache.spark.unsafe.types.UTF8String[$n > 1 ? $n - 1 : 0];
         |for (int $i = 1; $i < $n; $i++) {
         |  $arr[$i - 1] = $c.substringSQL($i, 2);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
  override def prettyName: String = "char_bigrams"
}

object WeightExprs {
  private def sorted(weights: Map[String, Long]): (Seq[String], Seq[Long]) = {
    val s = weights.toSeq.sortBy(_._1)
    (s.map(_._1), s.map(_._2))
  }

  /** Codegen'd Σ weight(token) over a token array (missing -> 0). */
  def tokenWeightSum(toks: Column, weights: Map[String, Long]): Column = {
    val (k, w) = sorted(weights)
    Bridge.column(TokenWeightSum(Bridge.expression(toks), k, w))
  }

  /** Codegen'd Σ weight(char bigram) over a string (missing -> 0). */
  def charBigramWeightSum(text: Column, weights: Map[String, Long]): Column = {
    val (k, w) = sorted(weights)
    Bridge.column(CharBigramWeightSum(Bridge.expression(text), k, w))
  }

  /** Codegen'd char-bigram array of a string. */
  def charBigrams(text: Column): Column =
    Bridge.column(CharBigrams(Bridge.expression(text)))
}
