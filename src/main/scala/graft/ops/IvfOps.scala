package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps.{dot, norm2}

/** IVF (inverted-file) approximate nearest neighbour — the data-adaptive
  * coarse quantizer that complements [[SimilarityOps]]' data-oblivious
  * LSH: spherical k-means centroids partition the corpus into K lists;
  * a query probes only its `nprobe` nearest lists.
  *
  * Scale shape (the industrial-standard ANN layout at 100 TB):
  *
  *   - TRAINING touches the corpus `iters` times with ROW-LOCAL centroid
  *     assignment (the K centroids are inlined as plan literals — no join,
  *     no shuffle for assignment) plus one (cid, dim)-keyed aggregation per
  *     iteration whose shuffle carries at most K x dims partial sums per
  *     map task. K and dims are constants — centroids always fit on the
  *     driver (that is what makes IVF IVF).
  *   - SEARCH scans the corpus once, assigns each vector row-locally, and
  *     joins against the BROADCAST probe set; candidate cost is the size
  *     of the probed lists (nprobe/K of the corpus for balanced lists),
  *     and the per-query top-k is the partial aggregate — no full-score
  *     shuffle.
  *
  * On clustered corpora (real embedding workloads) recall stays high while
  * candidate cost drops toward nprobe/K; on an unclustered corpus IVF
  * degrades gracefully toward brute force — measured both in IvfOpsSpec.
  *
  * Determinism: seeding is by `xxhash64(id)` order (reproducible), and
  * Lloyd updates accumulate in fixed point ([[graft.agg.FixedPointVecSumAgg]],
  * scale 1e9 on unit-norm vectors) — integer sums are associative-exact, so
  * the trained centroids are IDENTICAL under any partitioning, executor
  * count, or merge order. Distributed k-means is usually layout-dependent
  * through float-sum reduction order; here a re-run on different hardware
  * reproduces the index bit-for-bit.
  */
object IvfOps {

  /** Scored (dot, centroid) structs for `vec` against every centroid —
    * row-local, centroids inlined as literals. Struct ordering gives
    * deterministic argmax with lower-cid tie-break (nc = -cid).
    */
  private def scoredCentroids(vec: Column, cents: Array[Array[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        dot(vec, array(c.map(lit).toIndexedSeq: _*)).as("s"),
        lit(-i).as("nc"))
    }.toIndexedSeq: _*)

  /** Nearest-centroid id (by dot product; cosine argmax because centroids
    * are L2-normalized at the driver and the row norm is a constant
    * factor). Row-local, codegen'd. ZERO centroids (a quantizer trained
    * on an empty corpus — routine when an upstream filter matches
    * nothing) degrades to a single implicit cluster 0 instead of
    * building the untyped `array_max(array())` that fails analysis.
    */
  def assignmentCol(vec: Column, cents: Array[Array[Double]]): Column =
    if (cents.isEmpty) lit(0).cast("int")
    // fused argmax loop (centroids as ONE reference object): same dots in
    // the same accumulation order as the struct-argmax composed form
    // (IvfOpsSpec pins the differential), constant plan-compile cost
    else graft.expr.PqExprs.vecNearestCentroid(vec, cents)

  /** COMPOSED REFERENCE assignment (differential-test twin of
    * [[graft.expr.PqExprs.vecNearestCentroid]]).
    */
  private[graft] def assignmentColComposed(vec: Column, cents: Array[Array[Double]]): Column =
    if (cents.isEmpty) lit(0).cast("int")
    else (-array_max(scoredCentroids(vec, cents)).getField("nc")).cast("int")

  /** The query's `nprobe` nearest centroid ids, best first. Zero trained
    * centroids probe the single implicit cluster (see [[assignmentCol]]).
    */
  def probesCol(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    if (cents.isEmpty) array(lit(0).cast("int"))
    else transform(
      slice(reverse(array_sort(scoredCentroids(vec, cents))), 1, nprobe),
      x => (-x.getField("nc")).cast("int"))

  /** Deterministic integer-valued centroids from the shared plane-weight
    * schedule — for gating the SEARCH path against a SQL oracle with the
    * centroids inlined as literals on both sides (training itself cannot
    * be static SQL; see q_sim_ivf_topk). Integer-valued doubles embed
    * exactly in SQL text, so assignment/probe argmax compares are
    * bit-identical across engines.
    */
  def literalCentroids(k: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(k, dims)((j, d) => SimilarityOps.planeWeight(j, d).toDouble)

  private def normalized(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Spherical k-means: `k` centroids over the L2-normalized corpus,
    * seeded by the `k` smallest `xxhash64(id)` rows, `iters` Lloyd rounds.
    * Empty clusters keep their previous centroid.
    */
  def trainCentroids(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got k=$k iters=$iters")
    val seeds = vecs
      .select(col(vecCol).cast("array<double>").as("v"),
        xxhash64(col(idCol)).as("h"), col(idCol).as("id"))
      .orderBy(col("h"), col("id"))
      .limit(k)
      .collect()
      .map(r => normalized(r.getSeq[Double](0).toArray))
    var cents = seeds
    for (_ <- 1 to iters) {
      // sum of v/||v|| per cluster via the mergeable fixed-point vector
      // sum: each map task forwards ONE dims x 8 B buffer per cluster
      // (the earlier posexplode + groupBy(cid, dim) form shuffled
      // rows x dims cells), and integer accumulation makes the round
      // layout-invariant. Scale 1e9 on unit vectors: |elem| <= 2^30, so
      // a cluster overflows only past ~2^33 rows.
      val sums = vecs
        .select(
          assignmentCol(col(vecCol), cents).as("cid"),
          sqrt(norm2(col(vecCol))).as("nrm"),
          col(vecCol).cast("array<double>").as("v"))
        .filter(col("nrm") > 0)
        .select(col("cid"), transform(col("v"), x => x / col("nrm")).as("u"))
        .groupBy(col("cid"))
        .agg(graft.agg.VecSumFunctions.vecSumFixed(col("u"), 1e9).as("s"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val cid = r.getInt(0)
        next(cid) = r.getSeq[Long](1).toArray.map(_.toDouble / 1e9)
      }
      cents = next.map(normalized)
    }
    cents
  }

  /** IVF cosine top-k, same output contract as
    * [[SimilarityOps.bruteForceTopK]] (rank gaps possible when the probed
    * lists hold < k vectors). Queries broadcast with their probe lists;
    * candidates = corpus rows whose list any probe hits; exact cosine +
    * partial top-k.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      cents: Array[Array[Double]],
      nprobe: Int,
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"), col(vecCol).as("cv"),
      sqrt(norm2(col(vecCol))).as("cn"),
      assignmentCol(col(vecCol), cents).as("cid"))
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qv"),
      sqrt(norm2(col(vecCol))).as("qn"),
      explode(probesCol(col(vecCol), cents, nprobe)).as("cid"))
    val scored = c.join(broadcast(q), "cid")
      .withColumn("cosine",
        dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)))
      .filter(col("cosine").isNotNull)
    SimilarityOps.rankTopK(scored, k)
  }
}
