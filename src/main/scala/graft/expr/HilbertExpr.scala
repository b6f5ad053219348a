package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D grid cell (the classic xy->d walk,
  * Wikipedia "Hilbert curve" convert-xy-to-d): inputs masked to
  * `[0, 2^order)`, output in `[0, 4^order)`.
  *
  * Why it exists next to the Morton key ([[graft.ops.PrepOps.zorderKey]]):
  * both map 2-D locality to 1-D key ranges for file skipping, but the
  * Hilbert walk never takes the Morton key's diagonal jumps (consecutive
  * curve positions are always grid neighbors — pinned in PrepOpsSpec),
  * so 2-D boxes decompose into fewer contiguous key runs in aggregate —
  * fewer files touched for the same box predicates (PrepOpsSpec
  * measures total runs across a box sweep: Hilbert < Morton). The
  * price is that the index is a stateful per-bit walk (rotate/flip
  * carries across levels), which is why this is a codegen'd expression
  * with a tight two-register loop rather than the mask-parallel spread
  * Morton gets away with; the DuckDB twin unrolls the same walk as a
  * lateral-alias chain ([[graft.ops.PrepOps.hilbertKeySql]]).
  *
  * Pure integer arithmetic — bit-identical on every engine; NULL in,
  * NULL out.
  */
case class HilbertIndex(
    left: Expression,
    right: Expression,
    order: Int) extends BinaryExpression {

  require(order >= 1 && order <= 31, s"order must be in [1,31], got $order")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs integral inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(order, asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mask = (1L << order) - 1
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      s"""
        long $x = ((long) $xv) & ${mask}L;
        long $y = ((long) $yv) & ${mask}L;
        long $d = 0L;
        for (long $s = ${1L << (order - 1)}L; $s > 0L; $s >>= 1) {
          long $rx = (($x & $s) != 0L) ? 1L : 0L;
          long $ry = (($y & $s) != 0L) ? 1L : 0L;
          $d += $s * $s * ((3L * $rx) ^ $ry);
          if ($ry == 0L) {
            if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
            long $t = $x; $x = $y; $y = $t;
          }
        }
        ${ev.value} = $d;
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {
  /** Reference walk (shared by eval, specs, and test oracles). */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    val mask = (1L << order) - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertIndex(x: Column, y: Column, order: Int): Column =
    Bridge.column(HilbertIndex(
      Bridge.expression(x), Bridge.expression(y), order))
}
