package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** A NATIVE as-of join — the whole-operator extension point the engine's
  * other custom pieces don't exercise (expressions: `graft.expr`;
  * aggregates: `graft.agg`; optimizer rule: [[RangeJoinBucketRule]]; DSv2
  * source: `graft.sources.GranuleSource`): a custom `LogicalPlan` node
  * planned by a `SparkStrategy` into a custom `SparkPlan`.
  *
  * Semantics (matches [[graft.ops.JoinOps.asofJoin]] and DuckDB's
  * `ASOF LEFT JOIN`): for every left row, attach the LATEST right row
  * with equal keys and `rightTime <= leftTime` (within `toleranceUs`
  * when given); unmatched left rows keep NULL right columns.
  *
  * Why a physical operator: the composition expresses as-of as
  * union → window(last ignore-nulls) → filter, which carries BOTH
  * tables' payloads through one unioned sort. This node instead declares
  * `ClusteredDistribution` on each side's keys and per-partition
  * `(keys, time)` ordering — `EnsureRequirements` co-partitions the two
  * children exactly as it does for a sort-merge join — and then streams
  * ONE forward merge pass per partition with O(1) state (the single
  * held candidate row). Neither input is ever materialized, widened, or
  * re-sorted together; at 100 TB the cost is the same two keyed
  * shuffles a plain join pays, plus a linear scan.
  *
  * Determinism: ties (several right rows at the same (key, time)) keep
  * the last one in sort order — callers wanting full determinism dedup
  * the right side first, same contract as the composed operator.
  *
  * NULL keys GROUP (a null-key left row can match a null-key right row)
  * — window-partition semantics, identical to the composed
  * union→window operator, and unlike SQL equi-join NULLs. NULL times
  * never match (left keeps NULL right columns; right rows are skipped).
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    toleranceUs: Option[Long]) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs matching non-empty key lists")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] into [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the same requirement shape as SortMergeJoin: EnsureRequirements
  // co-partitions both children on the keys and sorts each partition by
  // (keys, time) — the merge below then needs no buffering at all
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val tol = toleranceUs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      // codegen'd comparator — the interpreted natural ordering boxes on
      // every compare, and the merge compares ~2x per left row
      val keyOrd = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.create(
          org.apache.spark.sql.types.StructType(
            keyTypes.zipWithIndex.map { case (t, i) =>
              org.apache.spark.sql.types.StructField(s"k$i", t)
            }))
      // bind against nullability-FORCED right attrs: binding to the
      // original non-null attributes elides the null check and reads 0s
      // out of the all-null miss row (the classic outer-join trap)
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      // O(1) merge state: the latest right row not past the current left
      var heldRow: InternalRow = null
      var heldKey: InternalRow = null
      var heldTime = 0L

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lt = lTimeProj(lRow)
        val lTimeNull = lt.isNullAt(0)
        val lTime = if (lTimeNull) 0L else lt.getLong(0)
        if (!lTimeNull) {
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) { // right keys the left has moved past
              rBuf.next(); heldRow = null; heldKey = null
            } else if (cmp == 0) {
              val rt = rTimeProj(rBuf.head)
              if (rt.isNullAt(0)) rBuf.next() // null time: never matches
              else if (rt.getLong(0) <= lTime) {
                heldTime = rt.getLong(0)
                heldRow = rBuf.next().copy()
                heldKey = rKey.copy()
              } else advancing = false
            } else advancing = false
          }
        }
        val matched = heldRow != null && !lTimeNull &&
          keyOrd.compare(heldKey, lKey) == 0 &&
          tol.forall(t => lTime - heldTime <= t)
        outProj(joined(lRow, if (matched) heldRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing builder: resolves key/time columns on the analyzed frames,
  * self-registers [[AsofJoinStrategy]] in the session, and returns the
  * joined frame (`left.*` then `right.*`, right nullable). Key columns
  * must be equality-comparable; time columns must be long-backed
  * (timestamp, timestamp_ntz, or bigint — `toleranceUs` is in the
  * column's own units: microseconds for timestamps). Right-side column
  * names must not collide with the left (rename before joining).
  */
object AsofJoinPlan {
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    Bridge.injectStrategy(spark, AsofJoinStrategy)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(right)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    Seq(lt, rt).foreach { a =>
      require(
        a.dataType == TimestampType || a.dataType == TimestampNTZType ||
          a.dataType == LongType,
        s"as-of time column ${a.name} must be long-backed, got ${a.dataType}")
    }
    // Floating-point KEYS are rejected: real joins get Catalyst's
    // NormalizeFloatingNumbers rule so -0.0/0.0 and NaN hash-partition
    // together, but a custom node never does — float keys could land
    // -0.0 and 0.0 in different partitions and silently miss matches.
    (leftKeys.map(attr(lPlan, _)) ++ rightKeys.map(attr(rPlan, _))).foreach { a =>
      require(
        a.dataType != org.apache.spark.sql.types.FloatType &&
          a.dataType != org.apache.spark.sql.types.DoubleType,
        s"as-of join key ${a.name} is ${a.dataType}: floating-point keys " +
          "are not supported (-0.0/0.0 and NaN would hash-partition " +
          "inconsistently without NormalizeFloatingNumbers); cast the key " +
          "to an integral, decimal, or string type first")
    }
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"right columns collide with left: $clash")
    Bridge.ofRows(spark, AsofJoinNode(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      lt, rt, toleranceUs))
  }
}
