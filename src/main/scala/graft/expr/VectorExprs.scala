package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd sequential dot product over two numeric array columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, (acc, v) => acc + v)`
  * — accumulation strictly in index order, so results are bit-identical to
  * the fold (and to the engine's SQL oracle) — but compiled to a tight Java
  * loop by `doGenCode` instead of per-element interpreted lambda dispatch.
  * On the all-pairs cosine workload this is the difference between the scan
  * dominating and the join dominating.
  *
  * NULL result when: either array is NULL, lengths differ, or any element
  * is NULL (matching `zip_with`+`aggregate` null propagation).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lt = elemType(left)
    val rt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGet =
      if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rightGet =
      if (elemType(right) == FloatType) "getFloat" else "getDouble"
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val anyNull = ctx.freshName("anyNull")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        int $n = ${leftGen.value}.numElements();
        if (${rightGen.value}.numElements() == $n) {
          double $acc = 0.0;
          boolean $anyNull = false;
          for (int $i = 0; $i < $n; $i++) {
            if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
              $anyNull = true; break;
            }
            $acc += (double) ${leftGen.value}.$leftGet($i)
                  * (double) ${rightGen.value}.$rightGet($i);
          }
          if (!$anyNull) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** All `planes` random-hyperplane sign bits of one vector, packed into a
  * long, in ONE pass over the vector.
  *
  * Semantically identical to OR-ing `planes` separate
  * `VecDot(vec, literal weights_j) >= 0` bits (each plane's projection
  * accumulates in index order, so every per-plane sum is bit-identical to
  * its VecDot), but generated as a single tight two-level loop with the
  * weight matrix attached as ONE reference object. The unfused form emitted
  * `planes × tables` independent VecDot loops each dragging a 64-literal
  * array expression — at 16 OR-amplification tables that is 128 generated
  * loops whose Janino compile time dominated small benches and whose 128
  * passes re-read the vector from row storage every time.
  *
  * Decision parity with the unfused form: a NULL vector, a length
  * mismatch, or any NULL element makes every projection NULL, and
  * `NULL >= 0` is false — all bits 0. Output is therefore never NULL.
  */
case class LshPlanesBucket(
    child: Expression,
    planeOffset: Int,
    planes: Int,
    dims: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 64, s"planes must be in [1,64], got $planes")
  require(dims >= 1, s"dims must be >= 1, got $dims")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_planes_bucket needs ARRAY<FLOAT|DOUBLE>, got $t")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(planes, dims)((j, d) =>
      VectorExprs.planeWeight(planeOffset + j, d).toDouble)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return 0L
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dims) return 0L
    val isFloat = elemIsFloat
    val acc = new Array[Double](planes)
    var d = 0
    while (d < dims) {
      if (arr.isNullAt(d)) return 0L
      val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      var j = 0
      while (j < planes) { acc(j) += v * weights(j)(d); j += 1 }
      d += 1
    }
    var bits = 0L
    var j = 0
    while (j < planes) { if (acc(j) >= 0) bits |= 1L << j; j += 1 }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val w = ctx.addReferenceObj("lshWeights", weights, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    val d = ctx.freshName("d")
    val v = ctx.freshName("v")
    val j = ctx.freshName("j")
    val j2 = ctx.freshName("j2")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      long ${ev.value} = 0L;
      if (!${childGen.isNull} && ${childGen.value}.numElements() == $dims) {
        double[] $acc = new double[$planes];
        boolean $ok = true;
        for (int $d = 0; $d < $dims; $d++) {
          if (${childGen.value}.isNullAt($d)) { $ok = false; break; }
          double $v = (double) ${childGen.value}.$get($d);
          for (int $j = 0; $j < $planes; $j++) {
            $acc[$j] += $v * $w[$j][$d];
          }
        }
        if ($ok) {
          for (int $j2 = 0; $j2 < $planes; $j2++) {
            if ($acc[$j2] >= 0) ${ev.value} |= (1L << $j2);
          }
        }
      }
    """)
  }

  override protected def withNewChildInternal(c: Expression): LshPlanesBucket =
    copy(child = c)
  override def prettyName: String = "lsh_planes_bucket"
}

/** ALL `tables` OR-amplification bucket assignments of one vector in ONE
  * pass: element `t` of the result equals
  * `LshPlanesBucket(vec, t * planes, planes, dims)` bit for bit (same
  * weight schedule, same index-order accumulation, same all-bits-0
  * degenerate-input parity), but the whole family compiles to a single
  * two-level loop with ONE `(tables*planes) x dims` reference-object
  * weight matrix.
  *
  * This is the [[LatticeArgmin]]/[[LshPlanesBucket]] fusion discipline
  * applied ACROSS tables: the per-table form emitted `tables` independent
  * generated loops (16 at the measured operating point) whose Janino
  * compile time dominated sf0.1 benches and whose 16 passes re-read the
  * vector from row storage every time. Callers `posexplode` the result to
  * recover the (t, b) stream the bucket join keys on.
  *
  * Output is never NULL (arity = `tables` always); a NULL vector, length
  * mismatch, or NULL element yields all-zero buckets — identical to the
  * per-table expressions on the same input.
  */
case class LshAllBuckets(
    child: Expression,
    planes: Int,
    dims: Int,
    tables: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 64, s"planes must be in [1,64], got $planes")
  require(dims >= 1, s"dims must be >= 1, got $dims")
  require(tables >= 1 && tables <= 1024, s"tables must be in [1,1024], got $tables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_all_buckets needs ARRAY<FLOAT|DOUBLE>, got $t")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def total: Int = tables * planes

  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(total, dims)((j, d) =>
      VectorExprs.planeWeight(j, d).toDouble)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val zeros = () => new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Long](tables))
    val a = child.eval(input)
    if (a == null) return zeros()
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dims) return zeros()
    val isFloat = elemIsFloat
    val acc = new Array[Double](total)
    var d = 0
    while (d < dims) {
      if (arr.isNullAt(d)) return zeros()
      val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      var j = 0
      while (j < total) { acc(j) += v * weights(j)(d); j += 1 }
      d += 1
    }
    val out = new Array[Long](tables)
    var j = 0
    while (j < total) {
      if (acc(j) >= 0) out(j / planes) |= 1L << (j % planes)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val w = ctx.addReferenceObj("lshAllWeights", weights, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val acc = ctx.freshName("acc")
    val out = ctx.freshName("out")
    val ok = ctx.freshName("ok")
    val d = ctx.freshName("d")
    val v = ctx.freshName("v")
    val j = ctx.freshName("j")
    val j2 = ctx.freshName("j2")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      long[] $out = new long[$tables];
      if (!${childGen.isNull} && ${childGen.value}.numElements() == $dims) {
        double[] $acc = new double[$total];
        boolean $ok = true;
        for (int $d = 0; $d < $dims; $d++) {
          if (${childGen.value}.isNullAt($d)) { $ok = false; break; }
          double $v = (double) ${childGen.value}.$get($d);
          for (int $j = 0; $j < $total; $j++) {
            $acc[$j] += $v * $w[$j][$d];
          }
        }
        if ($ok) {
          for (int $j2 = 0; $j2 < $total; $j2++) {
            if ($acc[$j2] >= 0) $out[$j2 / $planes] |= (1L << ($j2 % $planes));
          }
        }
      }
      ArrayData ${ev.value} =
        new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
    """)
  }

  override protected def withNewChildInternal(c: Expression): LshAllBuckets =
    copy(child = c)
  override def prettyName: String = "lsh_all_buckets"
}

/** Fused nearest-centroid search on the INTEGER lattice: for a quantized
  * `ARRAY<BIGINT>` vector, the squared L2 distance to each of `k`
  * centroid rows of `cents` and the argmin, in ONE codegen'd two-level
  * loop with the centroid matrix attached as a single reference object
  * (the [[LshPlanesBucket]] fusion pattern — k separate distance
  * expressions would each drag a dims-literal array through Janino).
  *
  * Returns `dist2 * 256 + j` packed in one long (so one pass yields
  * both outputs): `j` = lowest index among minimal distances (strict
  * `<` keeps the first minimum — tie order is deterministic and matches
  * the oracle's `ORDER BY dist2, j`), `dist2` exact in integer
  * arithmetic. Callers unpack with `& 255` / `>> 8`. Bounds: k <= 256
  * (the packing width — chosen so the SemDeDup/IVF cluster count can
  * scale the Sigma|cluster|^2 candidate bound down at corpus scale) and
  * dist2 < 2^55, comfortably above any sane quantization
  * (|elem| <= 2^22, dims <= 2^6 gives dist2 <= 2^50).
  *
  * NULL when: the vector is NULL, its length differs from the centroid
  * dims, or any element is NULL.
  */
case class LatticeArgmin(
    child: Expression,
    cents: Seq[Seq[Long]]) extends UnaryExpression {

  require(cents.nonEmpty && cents.size <= 256,
    s"lattice_argmin needs 1..256 centroids, got ${cents.size}")
  require(cents.forall(_.size == cents.head.size),
    "lattice_argmin centroids must share one dimensionality")

  private def k: Int = cents.size
  private def dims: Int = cents.head.size

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lattice_argmin needs ARRAY<BIGINT>, got $t")
    }

  @transient private lazy val matrix: Array[Array[Long]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dims) return null
    var best = Long.MaxValue
    var bj = -1
    var j = 0
    while (j < k) {
      val c = matrix(j)
      var acc = 0L
      var d = 0
      while (d < dims) {
        if (arr.isNullAt(d)) return null
        val diff = arr.getLong(d) - c(d)
        acc += diff * diff
        d += 1
      }
      if (acc < best) { best = acc; bj = j }
      j += 1
    }
    best * 256L + bj
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val m = ctx.addReferenceObj("latticeCents", matrix, "long[][]")
    val best = ctx.freshName("best")
    val bj = ctx.freshName("bj")
    val ok = ctx.freshName("ok")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc")
    val diff = ctx.freshName("diff")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${childGen.isNull} && ${childGen.value}.numElements() == $dims) {
        long $best = Long.MAX_VALUE;
        int $bj = -1;
        boolean $ok = true;
        for (int $j = 0; $j < $k && $ok; $j++) {
          long $acc = 0L;
          for (int $d = 0; $d < $dims; $d++) {
            if (${childGen.value}.isNullAt($d)) { $ok = false; break; }
            long $diff = ${childGen.value}.getLong($d) - $m[$j][$d];
            $acc += $diff * $diff;
          }
          if ($ok && $acc < $best) { $best = $acc; $bj = $j; }
        }
        if ($ok) { ${ev.isNull} = false; ${ev.value} = $best * 256L + $bj; }
      }
    """)
  }

  override protected def withNewChildInternal(c: Expression): LatticeArgmin =
    copy(child = c)
  override def prettyName: String = "lattice_argmin"
}

object VectorExprs {
  /** Sequential-order dot product (codegen'd). */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Packed nearest-centroid (dist2*256 + cluster) on the integer
    * lattice (codegen'd single pass over the vector).
    */
  def latticeArgmin(qv: Column, cents: Seq[Seq[Long]]): Column =
    Bridge.column(LatticeArgmin(Bridge.expression(qv), cents))

  /** Deterministic hyperplane weight schedule shared by every LSH caller
    * (and the DuckDB oracle builder): an avalanche mix of (plane, dim) into
    * a small integer weight in [-3, 3]. Mixing BOTH coordinates keeps
    * planes mutually independent — a per-plane-only seed made OR-amplified
    * tables correlated (fixed in e342056).
    */
  def planeWeight(j: Int, d: Int): Int = {
    var x = j * 0x9e3779b9 + d * 0x85ebca6b + 0x27d4eb2f
    x ^= x >>> 15; x *= 0x2c1b3c6d
    x ^= x >>> 12; x *= 0x297a2d39
    x ^= x >>> 15
    math.floorMod(x, 7) - 3
  }

  /** Packed sign bits of planes `planeOffset .. planeOffset+planes-1`
    * (single fused pass — see [[LshPlanesBucket]]).
    */
  def lshPlanesBucket(vec: Column, planeOffset: Int, planes: Int, dims: Int): Column =
    Bridge.column(LshPlanesBucket(Bridge.expression(vec), planeOffset, planes, dims))

  /** All `tables` OR-amplification buckets in one fused pass
    * (element t == `lshPlanesBucket(vec, t*planes, planes, dims)`).
    */
  def lshAllBuckets(vec: Column, planes: Int, dims: Int, tables: Int): Column =
    Bridge.column(LshAllBuckets(Bridge.expression(vec), planes, dims, tables))
}
