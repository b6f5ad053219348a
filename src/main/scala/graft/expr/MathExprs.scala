package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Integer fixed-point base-2 logarithm, `floor-ish(log2(v) * 2^20)`:
  * msb via Long.numberOfLeadingZeros, then 20 mantissa-squaring rounds
  * (mantissa normalized into [2^30, 2^31), every square inside int64) —
  * the same pure-integer recurrence as
  * [[graft.ops.SelectionOps.log2Fixed]] (differential-pinned in
  * MathExprsSpec) and as the DuckDB oracle's unrolled SQL replay.
  *
  * Exists because entropy/KL/importance scores need a logarithm in the
  * HOT PATH without tying results to an engine's libm: float `ln`
  * differs in last ulps across implementations, which breaks hash
  * oracles and cross-cluster reproducibility; this is exact integer
  * in/out. Accuracy ~2^-20 relative — far below any data-quality
  * threshold. Input must be >= 1; v < 1 yields NULL (so accidental
  * zero counts surface as NULLs, not garbage logs).
  */
case class Log2Fixed(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"log2_fixed needs BIGINT, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    if (x < 1) null else Log2Fixed.eval(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("lfM")
      val msb = ctx.freshName("lfMsb")
      val frac = ctx.freshName("lfFrac")
      val i = ctx.freshName("lfI")
      s"""
         |if ($c < 1L) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $msb = 63 - java.lang.Long.numberOfLeadingZeros($c);
         |  long $m = $msb >= 30 ? ($c >> ($msb - 30)) : ($c << (30 - $msb));
         |  long $frac = 0L;
         |  for (int $i = 0; $i < 20; $i++) {
         |    $m = ($m * $m) >> 30;
         |    if ($m >= (1L << 31)) { $frac |= 1L << (19 - $i); $m >>= 1; }
         |  }
         |  ${ev.value} = (((long) $msb) << 20) | $frac;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Log2Fixed =
    copy(child = newChild)
  override def prettyName: String = "log2_fixed"
}

object Log2Fixed {
  /** Shared scalar kernel (the expression and the driver-side
    * [[graft.ops.SelectionOps.log2Fixed]] both bottom out here). */
  def eval(v: Long): Long = {
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
    var m = if (msb >= 30) v >> (msb - 30) else v << (30 - msb)
    var frac = 0L
    var i = 0
    while (i < 20) {
      m = (m * m) >> 30
      if (m >= (1L << 31)) { frac |= 1L << (19 - i); m >>= 1 }
      i += 1
    }
    (msb.toLong << 20) | frac
  }
}

object MathExprs {
  /** Fixed-point log2 (2^-20 units) of a BIGINT column; NULL below 1. */
  def log2Fixed(v: Column): Column =
    Bridge.column(Log2Fixed(Bridge.expression(v)))
}
