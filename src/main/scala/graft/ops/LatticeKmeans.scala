package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.VecSumFunctions
import graft.expr.VectorExprs

/** K-means whose TRAINING is engine-exact: embeddings quantized to the
  * integer lattice (`round(x * 2^20)` per dimension — row-local,
  * correctly-rounded, identical on every engine), Lloyd rounds whose
  * assignment (integer squared L2 argmin) and centroid update (integer
  * elementwise sums, toward-zero division by the cluster count) are
  * EXACT integer arithmetic end to end.
  *
  * Why this exists: float k-means training is summation-order-dependent
  * — the reason `q_semdedup`/`q_sim_ivf_topk` are rows-only checks with
  * literal-centroid twins. On the lattice, every reduction is an
  * associative integer sum and every division is toward-zero integer
  * division, so the WHOLE
  * training loop (not just the apply) replays bit-for-bit in DuckDB SQL
  * with the rounds unrolled as CTEs — in-query clustering with a full
  * content oracle. The quantization (20 fractional bits on unit-scale
  * embeddings) costs ~1e-6 relative precision per dimension; for
  * dedup/sharding/curation clustering that error is irrelevant, and
  * determinism under ANY partitioning is what production needs.
  *
  * Scale shape (the [[IvfOps.trainCentroids]] discipline):
  *   - assignment is one fused codegen pass per row
  *     ([[graft.expr.LatticeArgmin]] — centroid matrix attached as one
  *     reference object, dist2+argmin in a single loop);
  *   - the update is ONE map-side-combining aggregate per round whose
  *     groups are the k clusters; each map task forwards k dims x 8 B
  *     buffers ([[VecSumFunctions.vecSumFixed]]), never rows x dims
  *     cells;
  *   - only k centroid rows ever reach the driver (the k-bounded
  *     centroid-frame collect already established for IVF training).
  *
  * Seeding is the lowest-k ids' vectors (portable ORDER BY id LIMIT k —
  * not a hash order, so the oracle's seeding is the same three tokens).
  */
object LatticeKmeans {

  /** Fixed-point scale: 20 fractional bits. */
  val Scale: Long = 1L << 20

  /** Quantize a float/double vector column to the lattice:
    * `floor(x * 2^20 + 0.5)` per element (round-half-UP). Every step is
    * an exact dyadic operation — power-of-two product, exact +0.5 (the
    * float mantissa's lowest bit after scaling sits above 2^-2, well
    * inside double), binary floor — so the lattice point is
    * bit-identical on every engine. (Spark's `round()` is NOT portable
    * here: on doubles it routes through BigDecimal.valueOf's
    * shortest-decimal-string, which can round differently than an
    * engine operating on the exact binary value.)
    */
  def quantize(vec: Column): Column =
    transform(vec.cast("array<double>"), x => floor(x * Scale + 0.5))

  /** Packed nearest-centroid column: `dist2 * 256 + cluster`. */
  def packed(qv: Column, cents: Array[Array[Long]]): Column =
    VectorExprs.latticeArgmin(qv, cents.map(_.toSeq).toSeq)

  /** `iters` Lloyd rounds on the lattice. Empty clusters keep their
    * previous centroid. Returns the final k x dims centroid matrix
    * (empty when the corpus has no non-null vectors).
    */
  def train(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Long]] =
    trainRounds(vecs, k, iters, idCol, vecCol)
      .lastOption.getOrElse(Array.empty)

  /** [[train]] with every intermediate exposed: element r of the result
    * is the centroid matrix AFTER round r (element 0 = the seeds = the
    * oracle's `c0` CTE, element `iters` = what [[train]] returns).
    * Exists for the round-8 driver-side bisection of the
    * `q_kmeans_lattice` hash-fail: the gated `q_kmeans_lattice_c{1,2}`
    * debug queries export these matrices row-exploded so the driver's
    * DuckDB localizes a divergence to quantization, a specific Lloyd
    * round, or the final assignment. Same cost shape as [[train]] —
    * one k-group aggregate per round, k-bounded collects only.
    */
  def trainRounds(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Array[Array[Long]]] = {
    require(k >= 1 && k <= 256, s"need 1 <= k <= 256, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val q = vecs.select(
      col(idCol).cast("long").as("id"), quantize(col(vecCol)).as("qv"))
      .filter(col("qv").isNotNull)
    val seeds = q.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    if (seeds.isEmpty) return Seq.empty
    val snapshots = Seq.newBuilder[Array[Array[Long]]]
    snapshots += seeds
    var cents = seeds
    for (_ <- 1 to iters) {
      // one aggregate per round: k groups, map-side combined; the sum
      // rides the fixed-point vector-sum buffer (scale 1.0 over integral
      // doubles |q| < 2^21 — the truncation is exact)
      val sums = q
        .select(
          (packed(col("qv"), cents) % 256).cast("int").as("cid"),
          col("qv").cast("array<double>").as("v"))
        .filter(col("cid").isNotNull)
        .groupBy(col("cid"))
        .agg(VecSumFunctions.vecSumFixed(col("v"), 1.0).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val cid = r.getInt(0)
        val s = r.getSeq[Long](1).toArray
        val n = r.getLong(2)
        if (cid < next.length)
          // toward-zero division: Java's Long `/` == DuckDB's integer
          // `//` (measured: -7//2 = -3 there) — floorDiv would be off
          // by one on negative sums
          next(cid) = s.map(x => x / n)
      }
      cents = next
      snapshots += cents
    }
    snapshots.result()
  }

  /** Pair-test scale: 10 fractional bits. Coarser than [[Scale]] on
    * purpose — with |x| <= 1 every SemDeDup intermediate stays inside
    * int64 (|q| <= 2^10, dot <= 64*2^20 = 2^26, den^2*dot^2 <= 2^60 for
    * den <= 20); a larger element or scale overflows LOUDLY on both
    * engines (Spark ANSI / DuckDB BIGINT both raise).
    */
  val PairScale: Long = 1L << 10

  /** Quantize at [[PairScale]] (same exact dyadic rounding). */
  def quantizePair(vec: Column): Column =
    transform(vec.cast("array<double>"), x => floor(x * PairScale + 0.5))

  /** SemDeDup with the ENTIRE pipeline engine-exact — training included.
    * Clusters via [[train]] (lattice Lloyd rounds), then within-cluster
    * near-duplicate pairs by an integer-exact cosine test at threshold
    * `tauNum/tauDen`: on [[PairScale]]-quantized vectors,
    * `cos >= tau  <=>  dot >= 0 AND tauDen^2*dot^2 >= tauNum^2*|a|^2*|b|^2`
    * — no sqrt, no division, pure int64 algebra (dot rides the codegen
    * [[graft.expr.VecDot]]: its sequential double fold is EXACT here
    * because every product is an integer < 2^53, and the cast back to
    * long loses nothing). Transitive closure and min-id representatives
    * as in [[SimilarityOps.semDedup]].
    *
    * Same output contract: (vec_id, rep_id, keep). Zero-norm and NULL
    * vectors pair with nothing (singleton keepers). The float variant
    * (`q_semdedup`) remains the paper's exact semantics; this one trades
    * ~2^-10 per-element precision for a FULL DuckDB training+dedup
    * oracle and bit-reproducibility under any partitioning.
    */
  def semDedup(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      tauNum: Long,
      tauDen: Long,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"need 0 < tauNum/tauDen <= 1, got $tauNum/$tauDen")
    require(tauDen <= 20, s"tauDen^2 must keep dot^2 in int64; got $tauDen > 20")
    val cents = train(vecs, k, iters, idCol, vecCol)
    val nodes = vecs.select(col(idCol).cast("long").as(idCol))
    if (cents.isEmpty)
      return nodes.select(col(idCol).as("vec_id"),
        col(idCol).as("rep_id"), lit(1).as("keep"))
    val qd = quantizePair(col(vecCol)).cast("array<double>")
    val assigned = vecs.select(
      col(idCol).cast("long").as("id"),
      (packed(quantize(col(vecCol)), cents) % 256).cast("int").as("cid"),
      qd.as("qs"),
      VectorExprs.vecDot(qd, qd).cast("long").as("n2"))
    val a = assigned.select(col("cid"), col("id").as("id_a"),
      col("qs").as("qa"), col("n2").as("na2"))
    val b = assigned.select(col("cid"), col("id").as("id_b"),
      col("qs").as("qb"), col("n2").as("nb2"))
    val pairs = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b") &&
        col("na2") > 0 && col("nb2") > 0)
      .withColumn("d", VectorExprs.vecDot(col("qa"), col("qb")).cast("long"))
      .filter(col("d") >= 0 &&
        lit(tauDen * tauDen) * col("d") * col("d") >=
          lit(tauNum * tauNum) * col("na2") * col("nb2"))
      .select(col("id_a"), col("id_b"))
    GraphOps.componentsOf(vecs, idCol, pairs, "id_a", "id_b")
      .select(col("node").as("vec_id"), col("component").as("rep_id"),
        (col("node") === col("component")).cast("int").as("keep"))
  }

  /** Every (vector, centroid) squared L2 distance under a trained
    * centroid matrix — the engine side of the `q_kmeans_lattice_fd`
    * bisection stage (the raw distance values of the final-assignment
    * pass, not just the argmin winner). k x corpus rows, exact integer
    * arithmetic via [[centDist2]]. */
  def allDistances(
      vecs: DataFrame,
      cents: Array[Array[Long]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val qd = quantize(col(vecCol)).cast("array<double>")
    val n2 = VectorExprs.vecDot(qd, qd).cast("long")
    vecs.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        posexplode(array(cents.map(c => centDist2(qd, n2, c)): _*)))
      .select(col("vec_id"), col("pos").cast("int").as("j"),
        col("col").cast("long").as("dist2"))
  }

  /** Integer squared L2 distance from a [[quantize]]d vector (as
    * `array<double>` — integral values, so the codegen VecDot fold is
    * exact) to one literal centroid: `|q|^2 + |c|^2 - 2*dot(q, c)`.
    * Every term < 2^53 stays exact through the double fold; the result
    * is cast back to an exact long.
    */
  private def centDist2(qd: Column, n2: Column, c: Array[Long]): Column =
    n2 + lit(c.map(x => x * x).sum) -
      lit(2L) * VectorExprs.vecDot(qd, typedLit(c.map(_.toDouble))).cast("long")

  /** IVF top-k under the L2 metric with IN-QUERY TRAINING and a full
    * oracle — the lattice answer to `q_sim_ivf_topk`'s rows-only floor
    * (whose float cosine ranking cannot be oracled through float
    * training). Exact-integer end to end: [[train]]ed coarse centroids,
    * corpus assigned by the fused [[graft.expr.LatticeArgmin]] pass,
    * each query probes its `nprobe` nearest lists (exact integer dist2
    * to each centroid, ties on (dist2, j)), candidates = corpus rows in
    * probed lists (list-id equi-join against the BROADCAST query side),
    * ranked by exact integer dist2 with corpus-id ascending ties — the
    * standard FAISS IVF-Flat/L2 search shape, deterministic on every
    * engine.
    *
    * Scale shape mirrors [[IvfOps.ivfTopK]]: the corpus is scanned once
    * (one codegen'd assignment pass), candidates are the only join rows,
    * and the per-query top-k is a partial aggregate — no full-score
    * shuffle. Returns (query_id, rank, corpus_id, dist2).
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nLists: Int,
      iters: Int,
      nprobe: Int,
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1 && nprobe <= nLists,
      s"need 1 <= nprobe <= nLists, got $nprobe/$nLists")
    val cents = train(corpus, nLists, iters, corpusId, vecCol)
    val spark = corpus.sparkSession
    if (cents.isEmpty)
      return spark.emptyDataFrame.select(
        lit(null).cast("long").as("query_id"),
        lit(null).cast("int").as("rank"),
        lit(null).cast("long").as("corpus_id"),
        lit(null).cast("long").as("dist2")).limit(0)
    def qd(c: Column) = quantize(c).cast("array<double>")
    val cFrame = corpus.select(
      col(corpusId).cast("long").as("corpus_id"),
      qd(col(vecCol)).as("cv"),
      VectorExprs.vecDot(qd(col(vecCol)), qd(col(vecCol)))
        .cast("long").as("cn2"),
      (packed(quantize(col(vecCol)), cents) % 256).cast("int").as("cid"))
      .filter(col("cid").isNotNull)
    val probeStructs = cents.zipWithIndex.map { case (c, j) =>
      struct(centDist2(col("__qd"), col("qn2"), c).as("d2"),
        lit(j).as("j"))
    }
    val qFrame = queries.select(
      col(queryId).cast("long").as("query_id"),
      qd(col(vecCol)).as("__qd"))
      .withColumn("qn2",
        VectorExprs.vecDot(col("__qd"), col("__qd")).cast("long"))
      .filter(col("qn2").isNotNull)
      .select(col("query_id"), col("__qd"), col("qn2"),
        explode(slice(array_sort(array(probeStructs: _*)), 1, nprobe))
          .as("__p"))
      .select(col("query_id"), col("__qd").as("qv"), col("qn2"),
        col("__p.j").as("cid"))
    val scored = cFrame.join(broadcast(qFrame), "cid")
      .withColumn("dist2",
        col("cn2") + col("qn2") -
          lit(2L) * VectorExprs.vecDot(col("cv"), col("qv")).cast("long"))
    // (-dist2) as the higher-is-better score: |dist2| < 2^53 keeps the
    // double exact, and id-ascending tie-break matches the oracle's
    // ORDER BY dist2, corpus_id
    scored
      .groupBy(col("query_id"))
      .agg(graft.agg.TopKFunctions.topKByScore(
        -col("dist2").cast("double"), col("corpus_id"), k).as("__topk"))
      .select(col("query_id"),
        posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(col("query_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__hit.id").as("corpus_id"),
        (-col("__hit.score")).cast("long").as("dist2"))
  }

  /** Farthest-point (k-center greedy) coreset selection on the lattice —
    * the classic diversity-sampling pass for training-data curation:
    * start from the lowest id (the portable "arbitrary first point"),
    * then repeatedly pick the vector FARTHEST from the chosen set
    * (max over rows of min over chosen of exact integer dist2, ties to
    * the lowest id). Selecting m points costs m-1 corpus scans, each one
    * fused [[graft.expr.LatticeArgmin]] pass (the chosen set IS the
    * centroid matrix — hence m <= 256) plus a 1-row TakeOrdered; the
    * driver holds only the m chosen vectors (the accepted k-bounded
    * centroid-frame pattern). Deterministic end to end, and the whole
    * greedy loop replays in DuckDB with the rounds unrolled.
    *
    * Returns (sel_rank 1..m, vec_id, min_dist2) in selection order;
    * `min_dist2` is the squared distance to the previously-chosen set
    * (NULL for the first pick) — the classic coreset radius curve.
    */
  def coresetSample(
      vecs: DataFrame,
      m: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && m <= 256, s"need 1 <= m <= 256, got $m")
    val spark = vecs.sparkSession
    import spark.implicits._
    val q = vecs.select(
      col(idCol).cast("long").as("id"), quantize(col(vecCol)).as("qv"))
      .filter(col("qv").isNotNull)
    val first = q.orderBy(col("id")).limit(1).collect()
    if (first.isEmpty)
      return Seq.empty[(Int, Long, Option[Long])]
        .toDF("sel_rank", "vec_id", "min_dist2")
    var chosen = Vector((first.head.getLong(0), first.head.getSeq[Long](1).toArray))
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Option[Long])](
      (1, chosen.head._1, None))
    var r = 2
    while (r <= m) {
      val cents = chosen.map(_._2).toArray
      val chosenIds = chosen.map(_._1)
      val next = q
        .filter(!col("id").isin(chosenIds: _*))
        .select(col("id"), col("qv"),
          shiftright(packed(col("qv"), cents), 8).as("md"))
        .orderBy(col("md").desc, col("id").asc)
        .limit(1)
        .collect()
      // corpus exhausted (fewer rows than m): stop early — duplicates
      // of chosen points are still pickable (md = 0), chosen ids are not
      if (next.isEmpty) { r = m + 1 }
      else {
        val row = next.head
        picks += ((r, row.getLong(0), Some(row.getLong(2))))
        chosen = chosen :+ ((row.getLong(0), row.getSeq[Long](1).toArray))
        r += 1
      }
    }
    picks.toSeq.toDF("sel_rank", "vec_id", "min_dist2")
  }

  /** Train, then assign every vector under the final centroids:
    * (id, cluster, dist2) with exact integer dist2. NULL/mismatched
    * vectors keep their row with NULL cluster/dist2 (total pipeline).
    */
  def assignments(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = train(vecs, k, iters, idCol, vecCol)
    val base = vecs.select(
      col(idCol).cast("long").as(idCol), quantize(col(vecCol)).as("qv"))
    if (cents.isEmpty)
      return base.select(col(idCol),
        lit(null).cast("int").as("cluster"),
        lit(null).cast("long").as("dist2"))
    base
      .select(col(idCol), packed(col("qv"), cents).as("p"))
      .select(col(idCol),
        col("p").bitwiseAND(255L).cast("int").as("cluster"),
        shiftright(col("p"), 8).as("dist2"))
  }
}
