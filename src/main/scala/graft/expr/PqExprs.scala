package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Fused product-quantization expressions (Jégou PQ, TPAMI 2011).
  *
  * The composed forms in [[graft.ops.PqOps]] unrolled the codebook into
  * `m x ksub x dsub` LITERAL subtract-square terms (1024 for the gated
  * 4x16x16 configuration) — bit-exact and whole-stage-codegen'd, but the
  * generated source scales with codebook size, and Janino compile time
  * (~2 s per plan at the gated size) dominated both PQ catalog queries at
  * sf0.1. These expressions generate a LOOP over the codebook attached as
  * ONE reference object instead ([[LshPlanesBucket]] precedent): compile
  * cost is constant in codebook size, runtime is the same tight
  * multiply-add sequence, and the arithmetic ORDER is identical to the
  * unrolled form — distances accumulate (x-w)^2 in dimension order,
  * ADC sums lookup values in subspace order — so every produced double
  * is bit-identical to the composed form and to the SQL oracle
  * (the [[graft.ops.SimilarityOps.planeWeight]] exactness discipline).
  *
  * Null semantics (shared): NULL input array, wrong length, or any NULL
  * element yields NULL — the literal-codebook catalog never produces
  * these (embeddings are dense), and the nulled-input robustness sweeps
  * only require totality, which NULL provides.
  */
object PqExprs {

  /** PQ codes of `vec`: for each subspace j, the id of the nearest
    * centroid (squared L2 over the subspace slice; first minimum on ties
    * — the lowest centroid id, matching `array_position(ds, array_min(ds))`).
    */
  def pqEncode(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), cb))

  /** ADC lookup table of `vec`: lut[j][c] = squared L2 distance from the
    * j-th subspace slice to centroid c.
    */
  def pqLut(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqLut(Bridge.expression(vec), cb))

  /** Asymmetric distance: sum over subspaces j of lut[j][codes[j]],
    * accumulated in subspace order (bit-identical to the
    * `aggregate(zip_with(...))` fold).
    */
  def pqAdc(codes: Column, lut: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(lut)))

  /** `vec - centroids[cid]` as array<double> (elements widened
    * float->double before the subtraction).
    */
  def vecResidual(vec: Column, cid: Column, cents: Array[Array[Double]]): Column =
    Bridge.column(VecResidual(
      Bridge.expression(vec), Bridge.expression(cid), cents))

  /** Nearest-centroid id by dot product (argmax; ties -> lowest id),
    * bit-identical to the struct-argmax composed form
    * ([[graft.ops.IvfOps.assignmentCol]] semantics).
    */
  def vecNearestCentroid(vec: Column, cents: Array[Array[Double]]): Column =
    Bridge.column(VecNearestCentroid(Bridge.expression(vec), cents))

  private[expr] def arrayOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private[expr] def typeCheck(name: String, t: DataType) =
    if (arrayOk(t)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$name needs ARRAY<FLOAT|DOUBLE>, got $t")
}

/** Codes array (int) of one vector against a frozen codebook — see
  * [[PqExprs.pqEncode]].
  */
case class PqEncode(
    child: Expression,
    codebook: Array[Array[Array[Double]]]) extends UnaryExpression {

  private val m = codebook.length
  private val ksub = codebook.head.length
  private val dsub = codebook.head.head.length
  require(m >= 1 && ksub >= 1 && dsub >= 1, "empty codebook")
  require(codebook.forall(s => s.length == ksub && s.forall(_.length == dsub)),
    "ragged codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes() = PqExprs.typeCheck(prettyName, child.dataType)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val isFloat = elemIsFloat
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val w = codebook(j)(c)
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val i = j * dsub + d
          if (v.isNullAt(i)) return null
          val x = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) - w(d)
          acc += x * x
          d += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val codes = ctx.freshName("codes")
    val ok = ctx.freshName("ok")
    val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
    val i = ctx.freshName("i"); val x = ctx.freshName("x"); val acc = ctx.freshName("acc")
    val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
    val w = ctx.freshName("w")
    ev.copy(code = code"""
      ${cg.code}
      boolean ${ev.isNull} = true;
      ArrayData ${ev.value} = null;
      if (!${cg.isNull} && ${cg.value}.numElements() == ${m * dsub}) {
        int[] $codes = new int[$m];
        boolean $ok = true;
        for (int $j = 0; $j < $m && $ok; $j++) {
          double $best = Double.POSITIVE_INFINITY;
          int $bestC = 0;
          for (int $c = 0; $c < $ksub && $ok; $c++) {
            double[] $w = $cb[$j][$c];
            double $acc = 0.0;
            for (int $d = 0; $d < $dsub; $d++) {
              int $i = $j * $dsub + $d;
              if (${cg.value}.isNullAt($i)) { $ok = false; break; }
              double $x = (double) ${cg.value}.$get($i) - $w[$d];
              $acc += $x * $x;
            }
            if ($ok && $acc < $best) { $best = $acc; $bestC = $c; }
          }
          $codes[$j] = $bestC;
        }
        if ($ok) {
          ${ev.isNull} = false;
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
        }
      }
    """)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** Per-subspace centroid-distance lookup table of one (query) vector —
  * see [[PqExprs.pqLut]].
  */
case class PqLut(
    child: Expression,
    codebook: Array[Array[Array[Double]]]) extends UnaryExpression {

  private val m = codebook.length
  private val ksub = codebook.head.length
  private val dsub = codebook.head.head.length
  require(m >= 1 && ksub >= 1 && dsub >= 1, "empty codebook")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes() = PqExprs.typeCheck(prettyName, child.dataType)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) return null
    val isFloat = elemIsFloat
    val rows = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val ds = new Array[Double](ksub)
      var c = 0
      while (c < ksub) {
        val w = codebook(j)(c)
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val i = j * dsub + d
          if (v.isNullAt(i)) return null
          val x = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) - w(d)
          acc += x * x
          d += 1
        }
        ds(c) = acc
        c += 1
      }
      rows(j) = new GenericArrayData(ds)
      j += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val rows = ctx.freshName("rows")
    val ds = ctx.freshName("ds")
    val ok = ctx.freshName("ok")
    val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
    val i = ctx.freshName("i"); val x = ctx.freshName("x"); val acc = ctx.freshName("acc")
    val w = ctx.freshName("w")
    ev.copy(code = code"""
      ${cg.code}
      boolean ${ev.isNull} = true;
      ArrayData ${ev.value} = null;
      if (!${cg.isNull} && ${cg.value}.numElements() == ${m * dsub}) {
        ArrayData[] $rows = new ArrayData[$m];
        boolean $ok = true;
        for (int $j = 0; $j < $m && $ok; $j++) {
          double[] $ds = new double[$ksub];
          for (int $c = 0; $c < $ksub && $ok; $c++) {
            double[] $w = $cb[$j][$c];
            double $acc = 0.0;
            for (int $d = 0; $d < $dsub; $d++) {
              int $i = $j * $dsub + $d;
              if (${cg.value}.isNullAt($i)) { $ok = false; break; }
              double $x = (double) ${cg.value}.$get($i) - $w[$d];
              $acc += $x * $x;
            }
            $ds[$c] = $acc;
          }
          $rows[$j] = new org.apache.spark.sql.catalyst.util.GenericArrayData($ds);
        }
        if ($ok) {
          ${ev.isNull} = false;
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $rows);
        }
      }
    """)
  }

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
  override def prettyName: String = "pq_lut"
}

/** Asymmetric PQ distance from a codes array and a per-query lookup
  * table — see [[PqExprs.pqAdc]]. NULL on length mismatch or an
  * out-of-range code (composed `element_at` would raise under ANSI; by
  * construction [[PqEncode]] codes are always in range).
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && lutOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs (ARRAY<INT>, ARRAY<ARRAY<DOUBLE>>), " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || lut.isNullAt(j)) return null
      val row = lut.getArray(j)
      val cd = codes.getInt(j)
      if (cd < 0 || cd >= row.numElements() || row.isNullAt(cd)) return null
      acc += row.getDouble(cd)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val mN = ctx.freshName("m")
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    val j = ctx.freshName("j")
    val row = ctx.freshName("row")
    val cd = ctx.freshName("cd")
    ev.copy(code = code"""
      ${lg.code}
      ${rg.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${lg.isNull} && !${rg.isNull}) {
        int $mN = ${lg.value}.numElements();
        if (${rg.value}.numElements() == $mN) {
          double $acc = 0.0;
          boolean $ok = true;
          for (int $j = 0; $j < $mN; $j++) {
            if (${lg.value}.isNullAt($j) || ${rg.value}.isNullAt($j)) { $ok = false; break; }
            ArrayData $row = ${rg.value}.getArray($j);
            int $cd = ${lg.value}.getInt($j);
            if ($cd < 0 || $cd >= $row.numElements() || $row.isNullAt($cd)) { $ok = false; break; }
            $acc += $row.getDouble($cd);
          }
          if ($ok) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

/** `vec - centroids[cid]` with float->double element widening — see
  * [[PqExprs.vecResidual]]. NULL when cid is out of range or the vector
  * length differs from the centroid dimensionality.
  */
case class VecResidual(
    left: Expression,
    right: Expression,
    centroids: Array[Array[Double]]) extends BinaryExpression {

  private val k = centroids.length
  private val dims = centroids.head.length
  require(k >= 1 && dims >= 1, "empty centroid table")
  require(centroids.forall(_.length == dims), "ragged centroid table")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    val cidOk = right.dataType == IntegerType
    if (PqExprs.arrayOk(left.dataType) && cidOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_residual needs (ARRAY<FLOAT|DOUBLE>, INT), " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cid = b.asInstanceOf[Int]
    if (cid < 0 || cid >= k || v.numElements() != dims) return null
    val isFloat = elemIsFloat
    val cent = centroids(cid)
    val out = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      if (v.isNullAt(d)) return null
      out(d) = (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)) - cent(d)
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val out = ctx.freshName("out")
    val cent = ctx.freshName("cent")
    val ok = ctx.freshName("ok")
    val d = ctx.freshName("d")
    ev.copy(code = code"""
      ${lg.code}
      ${rg.code}
      boolean ${ev.isNull} = true;
      ArrayData ${ev.value} = null;
      if (!${lg.isNull} && !${rg.isNull} && ${rg.value} >= 0 && ${rg.value} < $k
          && ${lg.value}.numElements() == $dims) {
        double[] $cent = $cents[${rg.value}];
        double[] $out = new double[$dims];
        boolean $ok = true;
        for (int $d = 0; $d < $dims; $d++) {
          if (${lg.value}.isNullAt($d)) { $ok = false; break; }
          $out[$d] = (double) ${lg.value}.$get($d) - $cent[$d];
        }
        if ($ok) {
          ${ev.isNull} = false;
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecResidual =
    copy(left = l, right = r)
  override def prettyName: String = "vec_residual"
}

/** Argmax-dot coarse assignment (ties -> lowest centroid id) — see
  * [[PqExprs.vecNearestCentroid]]. Dots accumulate in index order, so
  * scores are bit-identical to per-centroid [[VecDot]] and the SQL
  * oracle's fold.
  */
case class VecNearestCentroid(
    child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {

  private val k = centroids.length
  private val dims = centroids.head.length
  require(k >= 1 && dims >= 1, "empty centroid table")
  require(centroids.forall(_.length == dims), "ragged centroid table")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = PqExprs.typeCheck(prettyName, child.dataType)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dims) return null
    val isFloat = elemIsFloat
    val acc = new Array[Double](k)
    var d = 0
    while (d < dims) {
      if (v.isNullAt(d)) return null
      val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      var c = 0
      while (c < k) { acc(c) += x * centroids(c)(d); c += 1 }
      d += 1
    }
    var best = acc(0)
    var bestC = 0
    var c = 1
    while (c < k) { if (acc(c) > best) { best = acc(c); bestC = c }; c += 1 }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    val d = ctx.freshName("d"); val c = ctx.freshName("c"); val c2 = ctx.freshName("c2")
    val x = ctx.freshName("x")
    val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
    ev.copy(code = code"""
      ${cg.code}
      boolean ${ev.isNull} = true;
      int ${ev.value} = 0;
      if (!${cg.isNull} && ${cg.value}.numElements() == $dims) {
        double[] $acc = new double[$k];
        boolean $ok = true;
        for (int $d = 0; $d < $dims; $d++) {
          if (${cg.value}.isNullAt($d)) { $ok = false; break; }
          double $x = (double) ${cg.value}.$get($d);
          for (int $c = 0; $c < $k; $c++) {
            $acc[$c] += $x * $cents[$c][$d];
          }
        }
        if ($ok) {
          double $best = $acc[0];
          int $bestC = 0;
          for (int $c2 = 1; $c2 < $k; $c2++) {
            if ($acc[$c2] > $best) { $best = $acc[$c2]; $bestC = $c2; }
          }
          ${ev.isNull} = false;
          ${ev.value} = $bestC;
        }
      }
    """)
  }

  override protected def withNewChildInternal(c: Expression): VecNearestCentroid =
    copy(child = c)
  override def prettyName: String = "vec_nearest_centroid"
}
