package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Catalyst optimizer rule that makes plain-SQL range joins scale.
  *
  * Spark plans a non-equi join condition like
  * `p.ts >= r.s AND p.ts < r.e` as BroadcastNestedLoopJoin (or a
  * cartesian product) — O(|P|·|R|) comparisons, the classic 100 TB
  * cliff. [[graft.ops.JoinOps.rangeJoin]] expresses the scalable domain-
  * bucketing shape through the DataFrame API; this rule produces the SAME
  * rewrite for queries written as ordinary SQL/DataFrame inequality
  * joins, so users don't have to know the trick:
  *
  *   - the range side is exploded to one row per covered bucket
  *     (`sequence(floor(s/W), floor((e-1)/W))`),
  *   - the point side computes its single bucket `floor(p/W)`,
  *   - the join becomes an EQUI-join on the bucket (hash-partitionable)
  *     with the ORIGINAL predicate kept as the residual — semantics are
  *     exactly the naive join's (each matching pair meets in exactly one
  *     bucket: the point's), differential-tested in RangeJoinRuleSpec.
  *
  * Fires only when `spark.graft.rangeJoin.bucketWidth` is set to a
  * positive long (bucket width is a domain decision — tune it to the
  * typical range span; it is in the point column's native unit: micros
  * for timestamps). Guards: inner joins; both bound conjuncts on the
  * same integral-or-timestamp point expression from one side, bounds
  * from the other;
  * no existing cross-side equi-conjunct (then the join is already
  * hash-plannable — and the conjunct this rule ADDS is precisely that,
  * which is also the rewrite's fixpoint guard).
  */
object RangeJoinBucketRule extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def widthConf(): Long =
    try SQLConf.get.getConfString(WidthKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case TimestampType => true // exact micros via UnixMicros (no Cast loss)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = widthConf()
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, width).getOrElse(j)
    }
  }

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conj = conjuncts(cond)

    def crossSideEqui(e: Expression): Boolean = {
      // EqualNullSafe (<=>) also yields hash-join keys via
      // ExtractEquiJoinKeys — such a join is already hash-plannable
      def sides(a: Expression, b: Expression): Boolean =
        (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
          (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet))
      e match {
        case EqualTo(a, b) => sides(a, b)
        case EqualNullSafe(a, b) => sides(a, b)
        case _ => false
      }
    }
    // already hash-plannable (also: our own rewrites carry one) -> leave it
    if (conj.exists(crossSideEqui)) return None

    // normalized bound forms: lower (p >= s), upper (p < e | p <= e)
    def lowerOf(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case LessThanOrEqual(s, p) => Some((p, s))
      case _ => None
    }
    def upperOf(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
      case LessThan(p, ub) => Some((p, ub, false))
      case GreaterThan(ub, p) => Some((p, ub, false))
      case LessThanOrEqual(p, ub) => Some((p, ub, true))
      case GreaterThanOrEqual(ub, p) => Some((p, ub, true))
      case _ => None
    }

    val candidates = for {
      lc <- conj; (p1, s) <- lowerOf(lc).toSeq
      uc <- conj if uc ne lc
      (p2, ub, incl) <- upperOf(uc).toSeq
      if p1.semanticEquals(p2)
      if Seq(p1, s, ub).forall(x => x.deterministic && integral(x))
      pointOnLeft <- {
        val pl = p1.references.nonEmpty && p1.references.subsetOf(j.left.outputSet) &&
          (s.references ++ ub.references).subsetOf(j.right.outputSet)
        val pr = p1.references.nonEmpty && p1.references.subsetOf(j.right.outputSet) &&
          (s.references ++ ub.references).subsetOf(j.left.outputSet)
        if (pl) Seq(true) else if (pr) Seq(false) else Seq.empty
      }
    } yield (p1, s, ub, incl, pointOnLeft)

    candidates.headOption.map { case (p, s, ub, incl, pointOnLeft) =>
      val w = Literal(width)
      // timestamps convert via UnixMicros — EXACT micros, unlike
      // Cast(ts, long) which truncates to seconds and would make the
      // exclusive-upper bucket arithmetic drop sub-second matches; the
      // width config is therefore in the point column's native unit
      // (micros for timestamps)
      def asLong(x: Expression) = x.dataType match {
        case LongType => x
        case TimestampType => UnixMicros(x)
        case _ => Cast(x, LongType)
      }
      // exact floor division for any sign and positive w, overflow-safe
      // under ANSI: truncating divide, minus 1 when the remainder is
      // negative. (The tempting `(a - pmod(a, w)) / w` underflows for a
      // near Long.MinValue — pmod is positive there — and ANSI mode would
      // turn a no-match row into a query-killing exception.) Remainder
      // keeps the dividend's sign and |rem| < w, so neither branch can
      // overflow for w >= 1: the -1 branch requires w >= 2, where
      // |a / w| <= Long.MaxValue / 2.
      def bucketOf(x: Expression): Expression = {
        val a = asLong(x)
        val div = new IntegralDivide(a, w)
        If(LessThan(Remainder(a, w), Literal(0L)),
          Subtract(div, Literal(1L)), div)
      }
      val sL = asLong(s)
      val uL = asLong(ub)
      val lastCovered = if (incl) uL else new Subtract(uL, Literal(1L))
      val nonEmpty = if (incl) GreaterThanOrEqual(uL, sL) else GreaterThan(uL, sL)

      val rangeSide = if (pointOnLeft) j.right else j.left
      val bkAttr = AttributeReference("__graft_bk", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: post-analysis it must carry
      // an explicit zone or the plan validator flags it unresolved
      val gen = Generate(
        Explode(Sequence(bucketOf(sL), bucketOf(lastCovered), None,
          Some(SQLConf.get.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(bkAttr),
        child = Filter(nonEmpty, rangeSide))

      val newCond = And(EqualTo(bucketOf(p), bkAttr), cond)
      val newJoin =
        if (pointOnLeft) Join(j.left, gen, Inner, Some(newCond), j.hint)
        else Join(gen, j.right, Inner, Some(newCond), j.hint)
      Project(j.output, newJoin)
    }
  }
}
