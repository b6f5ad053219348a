package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.VecSumFunctions
import graft.expr.VectorExprs

/** Principal component analysis, Spark-shaped for 100 TB: the ENTIRE
  * corpus contribution is ONE aggregation pass producing the
  * (dims + dims^2)-sized moment statistics — mean vector and Gram matrix
  * Σ x xᵀ — accumulated in fixed point
  * ([[graft.agg.FixedPointVecSumAgg]], scale 1e9 on unit-scale
  * embeddings), so the moments are integer-exact and LAYOUT-INVARIANT:
  * the same corpus produces bit-identical moments under any
  * partitioning, executor count, or merge order. The covariance
  * (C = G/n − μμᵀ), the cyclic-Jacobi eigendecomposition, and the
  * component sign/ordering conventions then run on the driver over the
  * dims x dims matrix — constant-sized work, the same split as IVF
  * training (corpus-sized pass distributed, model-sized solve local).
  *
  * Projection is row-local: score_j = dot(x, e_j) − dot(μ, e_j) with
  * the components inlined as plan literals through the codegen'd
  * [[VectorExprs.vecDot]] sequential fold — one corpus scan, zero
  * shuffles, and (because the fold order is pinned) bit-reproducible,
  * which is what lets the DuckDB oracle gate everything downstream of
  * the decomposition via the TrainedExport literal mechanism.
  *
  * Determinism contract: moments are layout-invariant integers; the
  * driver-side Jacobi runs a fixed cyclic sweep schedule on those
  * deterministic doubles; eigenpairs order by (eigenvalue DESC, index)
  * and each component's sign is normalized so its largest-magnitude
  * coefficient is positive (first index on ties) — the full model is a
  * pure function of the input table.
  */
object PcaOps {

  /** Fixed-point moment scale (the [[IvfOps]] discipline: |x| <= 1
    * element products at 1e9 keep cluster sums exact past 2^33 rows). */
  private val MomentScale = 1e9

  final case class PcaModel(
      n: Long,
      mean: Array[Double],
      components: Array[Array[Double]], // m rows of dims coefficients
      eigenvalues: Array[Double],       // matching variances, desc
      offsets: Array[Double])           // dot(mean, e_j) per component

  /** One corpus pass: (row count, Σx, Σ x xᵀ flattened row-major) in
    * exact fixed point. Rows with NULL or wrong-dimension vectors are
    * excluded (the [[LatticeKmeans]] convention). */
  def moments(
      vecs: DataFrame,
      dims: Int,
      vecCol: String = "embedding"): (Long, Array[Long], Array[Long]) = {
    val v = col(vecCol).cast("array<double>")
    val outer = flatten(transform(v, x => transform(v, y => x * y)))
    val r = vecs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .agg(count(lit(1)).as("n"),
        VecSumFunctions.vecSumFixed(v, MomentScale).as("s"),
        VecSumFunctions.vecSumFixed(outer, MomentScale).as("g"))
      .head()
    if (r.getLong(0) == 0L) (0L, Array.empty, Array.empty)
    else (r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (driver-side,
    * dims x dims). Returns (eigenvalues, eigenvectors as rows), unsorted.
    */
  private def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)),
      Array.tabulate(n, n)((j, i) => v(i)(j))) // row j = eigenvector j
  }

  /** Fit the top-`m` principal components of the vector column. */
  def fit(
      vecs: DataFrame,
      m: Int,
      dims: Int,
      vecCol: String = "embedding"): PcaModel =
    fitOption(vecs, m, dims, vecCol).getOrElse(
      throw new IllegalArgumentException(
        "PCA needs at least one non-null vector"))

  /** [[fit]] that degrades to None on an empty/all-null corpus (total
    * pipelines — an upstream filter matching nothing is routine). */
  def fitOption(
      vecs: DataFrame,
      m: Int,
      dims: Int,
      vecCol: String = "embedding"): Option[PcaModel] = {
    require(m >= 1 && m <= dims, s"need 1 <= m <= dims, got $m/$dims")
    val (n, s, g) = moments(vecs, dims, vecCol)
    if (n == 0) return None
    val mean = s.map(_ / MomentScale / n)
    val cov = Array.tabulate(dims, dims)((i, j) =>
      g(i * dims + j) / MomentScale / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEigen(cov)
    val order = (0 until dims).sortBy(j => (-evals(j), j)).take(m)
    val comps = order.map { j =>
      val e = evecs(j)
      // sign convention: largest-|coefficient| positive, first on ties
      val kMax = e.indices.maxBy(i => (math.abs(e(i)), -i))
      if (e(kMax) < 0) e.map(x => -x) else e.clone()
    }.toArray
    val offs = comps.map(e => e.zip(mean).map { case (a, b) => a * b }.sum)
    Some(PcaModel(n, mean, comps, order.map(evals(_)).toArray, offs))
  }

  /** Row-local projection onto the fitted components: one corpus scan,
    * components as plan literals, the pinned-order [[VectorExprs.vecDot]]
    * fold — scores replay bit-for-bit in SQL given the exported model.
    * Output: (id, pc1 .. pcm). */
  def project(
      vecs: DataFrame,
      model: PcaModel,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val cols: Seq[Column] = model.components.zipWithIndex.toSeq.map {
      case (e, j) =>
        (VectorExprs.vecDot(v, typedLit(e.toSeq)) - lit(model.offsets(j)))
          .as(s"pc${j + 1}")
    }
    vecs.filter(col(vecCol).isNotNull && size(col(vecCol)) === model.mean.length)
      .select(col(idCol) +: cols: _*)
  }
}
