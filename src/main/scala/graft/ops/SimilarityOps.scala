package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.TopKFunctions
import graft.expr.VectorExprs.vecDot

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Determinism discipline: every dot product is computed as a sequential
  * fold in index order over double-cast elements, so the result is
  * bit-identical on any engine and any partitioning (float reduction order
  * is the classic source of cross-run drift — SURVEY §7.4).
  *
  * Scale design: brute-force top-k is the correctness baseline (broadcast
  * the small query set, never the corpus; one pass over the corpus, no
  * shuffle until the per-query top-k). The LSH variant buckets vectors by
  * signed random-hyperplane projections so candidate generation touches only
  * same-bucket pairs — the 100 TB path.
  */
object SimilarityOps {

  /** Sequential-order dot product. Implemented as the codegen'd
    * [[graft.expr.VecDot]] expression; [[dotFold]] is the higher-order-
    * function formulation with identical (bit-for-bit) semantics, kept as
    * the executable specification the tests cross-check against.
    */
  def dot(a: Column, b: Column): Column = vecDot(a, b)

  /** Reference formulation of [[dot]] via zip_with + aggregate (interpreted
    * lambda dispatch per element — ~20x slower; spec/test use only).
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity; NULL when either norm is zero. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(sqrt(norm2(a)) * sqrt(norm2(b)), lit(0.0))

  /** Per-query top-k of a scored frame (`query_id, corpus_id, cosine`) by
    * (cosine DESC, corpus_id ASC), emitting `rank` 1..k.
    *
    * Single code path for every orderable id type: the partial top-k
    * aggregate ([[graft.agg.TopKByScoreAgg]]) rides two-phase hash
    * aggregation, so the shuffle carries at most |queries| x k pairs per
    * map task instead of every scored row (a `row_number` window here
    * would shuffle and sort the whole scored corpus — the one latent
    * scale cliff this used to have for string-keyed corpora).
    */
  private[ops] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(TopKFunctions.topKByScore(
        col("cosine"), col("corpus_id"), k).as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(col("query_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__hit.id").as("corpus_id"),
        col("__hit.score").as("cosine"))

  /** Brute-force cosine top-k: for each row of `queries`, the `k` nearest
    * corpus rows (ties broken by corpus id ascending — fully deterministic).
    * `queries` is broadcast (it must be the small side); the corpus is
    * scanned once, and the per-query top-k is a partial aggregate — no
    * full-score shuffle (see [[rankTopK]]).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // norms are computed ONCE per row on each side before the join (the
    // naive per-pair cosine recomputes both norms for every pair)
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qv"),
      sqrt(norm2(col(vecCol))).as("qn"))
    val c = corpus.select(col(corpusId).as("corpus_id"), col(vecCol).as("cv"),
      sqrt(norm2(col(vecCol))).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)))
      .filter(col("cosine").isNotNull)
    rankTopK(scored, k)
  }

  /** Two-stage retrieval — the production serving shape (Matryoshka /
    * "funnel" retrieval): stage 1 ranks the corpus by the CHEAP metric
    * (cosine over the first `frontDims` dims — 4x less arithmetic and,
    * in a real system, 4x less index memory) and keeps `kCand`
    * candidates per query; stage 2 re-ranks ONLY those candidates with
    * the full-dimension cosine and returns `k`. Recall loss is exactly
    * what q_matryoshka_recall measures; here the PIPELINE is the
    * operator. Both stages are the audited broadcast partial-top-k
    * shape; stage 2's input is kCand-bounded per query regardless of
    * corpus size — the full vectors of only the candidate set are ever
    * re-scored (at 100 TB: the stage-2 gather is a candidate-id join
    * against the full-vector store, not a second corpus scan with
    * another top-k; this composition keeps that contract).
    *
    * Returns (query_id, rank, corpus_id, cosine) — full-dim cosine.
    */
  def twoStageTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      kCand: Int,
      frontDims: Int,
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && kCand >= k, s"need 1 <= k <= kCand, got $k/$kCand")
    def front(c: Column) = slice(c, 1, frontDims)
    val q = queries.select(col(queryId).as("query_id"),
      col(vecCol).as("qv"), sqrt(norm2(col(vecCol))).as("qn"),
      front(col(vecCol)).as("qf"), sqrt(norm2(front(col(vecCol)))).as("qfn"))
    val c = corpus.select(col(corpusId).as("corpus_id"),
      col(vecCol).as("cv"), sqrt(norm2(col(vecCol))).as("cn"),
      front(col(vecCol)).as("cf"), sqrt(norm2(front(col(vecCol)))).as("cfn"))
    // stage 1: cheap front-dim scan, kCand-bounded partial top-k
    val cand = rankTopK(
      c.crossJoin(broadcast(q.select(col("query_id"), col("qf"), col("qfn"))))
        .withColumn("cosine",
          dot(col("qf"), col("cf")) / nullif(col("qfn") * col("cfn"), lit(0.0)))
        .filter(col("cosine").isNotNull),
      kCand)
      .select(col("query_id"), col("corpus_id"))
    // stage 2: full-dim re-rank of the candidate set only
    val rescored = cand
      .join(c.select(col("corpus_id"), col("cv"), col("cn")), "corpus_id")
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qn"))), "query_id")
      .withColumn("cosine",
        dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)))
      .filter(col("cosine").isNotNull)
    rankTopK(rescored, k)
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * `k` most similar corpus vectors whose `classCol` DIFFERS — the
    * near-boundary examples a contrastive or reranker objective needs
    * (random negatives are trivially easy; same-class neighbours are
    * positives). Identical scale shape to [[bruteForceTopK]] (queries
    * broadcast, one corpus scan, class filter as a join residual,
    * partial top-k), so swapping in an ANN candidate generator changes
    * the candidate set only. Self-pairs are excluded by construction
    * (same id => same class).
    *
    * Returns (query_id, rank, corpus_id, cosine).
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      classCol: String,
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qv"),
      sqrt(norm2(col(vecCol))).as("qn"), col(classCol).as("q_cls"))
    val c = corpus.select(col(corpusId).as("corpus_id"), col(vecCol).as("cv"),
      sqrt(norm2(col(vecCol))).as("cn"), col(classCol).as("c_cls"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("c_cls") =!= col("q_cls"))
      .withColumn("cosine",
        dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)))
      .filter(col("cosine").isNotNull)
    rankTopK(scored, k)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane j, dim d),
    * integer in [-3, 3]. Derived from an avalanche-mixed hash of (j, d) so
    * planes are effectively independent — a plain linear form like
    * `(j*a + d*b) mod m` collapses when a ≡ b (mod m), making plane j+m a
    * copy of plane j and voiding multi-table amplification. The weights are
    * evaluated in Scala at plan-build time and inlined as literals on both
    * the Spark and the SQL-oracle side, so any integer function is exactly
    * reproducible.
    */
  def planeWeight(j: Int, d: Int): Int = graft.expr.VectorExprs.planeWeight(j, d)

  /** LSH bucket id in [0, 2^planes): bit j = sign of projection j. Vectors
    * in the same bucket are ANN candidates; union over a few independent
    * bucket tables raises recall.
    */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    lshBucketTable(vec, 0, planes, dims)

  /** Bucket id for hash table `table`: plane family `table` uses planes
    * `table*planes .. table*planes+planes-1` of the shared deterministic
    * weight schedule, so tables are mutually independent. One fused pass
    * over the vector ([[graft.expr.LshPlanesBucket]]): per-plane
    * projections accumulate in index order, so every bit equals the
    * unfused `VecDot(vec, weights_j) >= 0` form bit for bit (pinned in
    * SimilarityOpsSpec; the q_sim_lsh_buckets DuckDB oracle re-proves it
    * against literal-weight SQL every round).
    */
  def lshBucketTable(vec: Column, table: Int, planes: Int, dims: Int): Column =
    graft.expr.VectorExprs.lshPlanesBucket(vec, table * planes, planes, dims)

  /** Bucketed ANN: exact cosine top-k but only within each query's LSH
    * bucket. Same output shape as [[bruteForceTopK]] (rank gaps possible
    * when a bucket has < k members).
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planes: Int,
      dims: Int,
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(vecCol).as("qv"),
      sqrt(norm2(col(vecCol))).as("qn"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val c = corpus.select(col(corpusId).as("corpus_id"), col(vecCol).as("cv"),
      sqrt(norm2(col(vecCol))).as("cn"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .withColumn("cosine", dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)))
      .filter(col("cosine").isNotNull)
    rankTopK(scored, k)
  }

  /** Multi-table LSH top-k (OR-amplification): `tables` independent bucket
    * assignments (plane family t uses planes `t*planes .. t*planes+planes-1`
    * of the same deterministic weight schedule); a corpus vector is a
    * candidate if it shares ANY table's bucket with the query. Recall grows
    * roughly as `1 - (1 - p^planes)^tables` while cost stays
    * candidates-bound — the standard ANN recall/cost dial at scale.
    */
  def lshTopKMulti(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planes: Int,
      dims: Int,
      tables: Int,
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // all tables' buckets from ONE fused pass over the vector (single
    // generated loop + one reference-object weight matrix, vs `tables`
    // independent codegen'd projections — the Janino compile and the
    // repeated vector re-reads dominated small benches)
    def withBuckets(df: DataFrame, id: String, v: String, side: String) =
      df.select(
        col(id).as(side),
        col(v).as(s"${side}_v"),
        sqrt(norm2(col(v))).as(s"${side}_n"),
        posexplode(graft.expr.VectorExprs.lshAllBuckets(col(v), planes, dims, tables))
          .as(Seq("t", "b")))
    val q = withBuckets(queries, queryId, vecCol, "query_id")
    val c = withBuckets(corpus, corpusId, vecCol, "corpus_id")
    val cand = c.join(broadcast(q), Seq("t", "b"))
      .select(col("query_id"), col("corpus_id"),
        col("query_id_v"), col("corpus_id_v"),
        col("query_id_n"), col("corpus_id_n"))
      .dropDuplicates("query_id", "corpus_id") // OR across tables
      .withColumn("cosine",
        dot(col("query_id_v"), col("corpus_id_v")) /
          nullif(col("query_id_n") * col("corpus_id_n"), lit(0.0)))
      .filter(col("cosine").isNotNull)
    rankTopK(cand, k)
  }

  /** LSH-bucketed embedding near-duplicate pairs — the scale path for
    * [[cosineNearDupPairs]], same output contract (id_a < id_b, cosine >=
    * `threshold`): candidate pairs are generated ONLY within shared
    * (table, bucket) cells (`tables` independent hash tables,
    * OR-amplified), then verified by exact cosine. Never all-pairs: cost is
    * sum over buckets of |bucket|^2, the standard LSH bound.
    *
    * `maxBucketSize` drops (table, bucket) cells larger than the cap — the
    * skew guard for degenerate corpora where one bucket would otherwise
    * dominate the join (documented recall tradeoff, mirrors
    * [[DedupOps]]' `maxShingleDf`).
    *
    * Recall is the S-curve `1 - (1 - p^planes)^tables` with
    * `p = 1 - theta/pi`; tune (planes, tables) to the corpus' similarity
    * profile. For weakly-similar thresholds (cosine ~0.35, p ~0.6) few
    * planes + many tables are required — measured 0.92-0.95 recall at
    * planes=4, tables=16 on the synthetic corpus; genuinely duplicated
    * corpora (cosine >= 0.9, p >= 0.85) reach the same recall at a
    * fraction of the candidate cost.
    */
  def lshNearDupPairs(
      vecs: DataFrame,
      threshold: Double,
      planes: Int,
      dims: Int,
      tables: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucketSize: Option[Int] = None): DataFrame = {
    // Phase 1 — SLIM candidate generation: the bucket index carries only
    // (id, table, bucket) = ~20 bytes/row, so the self-join and the
    // OR-across-tables `distinct` shuffle narrow rows even when one pair
    // collides in many tables. (Carrying the vectors through this join
    // multiplies the shuffled payload by tables x vector width — measured
    // 20x slower at 2k vectors.)
    // (all tables' buckets in one fused codegen pass — see lshTopKMulti)
    val b0 = vecs.select(
      col(idCol).as("id"),
      posexplode(graft.expr.VectorExprs.lshAllBuckets(col(vecCol), planes, dims, tables))
        .as(Seq("t", "b")))
    val b = maxBucketSize match {
      case None => b0
      case Some(cap) =>
        val hot = b0.groupBy(col("t"), col("b"))
          .agg(count(lit(1)).as("sz")).filter(col("sz") > cap)
          .select(col("t"), col("b"))
        b0.join(hot, Seq("t", "b"), "left_anti")
    }
    val pairs = b.as("x")
      .join(b.as("y"),
        col("x.t") === col("y.t") && col("x.b") === col("y.b") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct() // OR across tables
    // Phase 2 — exact verify: fetch each side's vector once per DISTINCT
    // candidate pair (two equi-joins; AQE broadcasts the vector side when
    // it is small enough, plain shuffle joins otherwise).
    val va = vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      sqrt(norm2(col(vecCol))).as("na"))
    val vb = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      sqrt(norm2(col(vecCol))).as("nb"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine",
        dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Embedding near-duplicate pairs: all (a < b) pairs with cosine >=
    * `threshold`. Brute-force all-pairs — correctness baseline for small
    * corpora; route through [[lshNearDupPairs]] at scale.
    */
  def cosineNearDupPairs(
      vecs: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      sqrt(norm2(col(vecCol))).as("na"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      sqrt(norm2(col(vecCol))).as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Deterministic sparse signed random projection (the
    * Johnson–Lindenstrauss / Achlioptas database-friendly variant):
    * component j of the reduced vector is `dot(v, w_j) / sqrt(outDims)`
    * with the shared integer plane-weight schedule ([[planeWeight]] —
    * the same deterministic planes LSH uses, so the projection is
    * reproducible across runs/engines with no stored matrix). Row-local
    * literal planes, zero shuffles: the dimensionality-reduction front
    * of ANN / clustering at 100 TB is a pure map over the scan. With
    * power-of-4 `outDims` the scale is a power of two, so projected
    * values are bit-exact across engines.
    */
  def projectCol(vec: Column, j: Int, dims: Int, outDims: Int): Column = {
    val plane = array((0 until dims).map(d => lit(planeWeight(j, d).toDouble)): _*)
    dot(vec, plane) / math.sqrt(outDims.toDouble)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering embeddings (spherical k-means — reuse
    * [[IvfOps.trainCentroids]]) and near-dup-ing ONLY within each
    * cluster: pair cost drops from O(n²) to Σ|cluster|², the paper's
    * central trick, while k-means assignment stays a row-local
    * literal-centroid argmax (zero joins/shuffles — the IVF property).
    * Duplicate groups are closed transitively (connected components) and
    * each keeps its min-id representative.
    *
    * Returns (vec_id, rep_id, keep): `keep = 1` iff the row is its
    * group's representative; singletons keep themselves. Cross-cluster
    * duplicate pairs are invisible by construction — the documented
    * recall trade the paper makes; raise k for cheaper pairs, lower k
    * for higher recall.
    */
  def semDedup(
      vecs: DataFrame,
      cents: Array[Array[Double]],
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = vecs.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).as("v"),
      sqrt(norm2(col(vecCol))).as("n"),
      IvfOps.assignmentCol(col(vecCol), cents).as("cid"))
    val a = assigned.select(col("cid"), col("id").as("id_a"),
      col("v").as("va"), col("n").as("na"))
    val b = assigned.select(col("cid"), col("id").as("id_b"),
      col("v").as("vb"), col("n").as("nb"))
    val pairs = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
      .filter(col("cosine").isNotNull && col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"))
    GraphOps.componentsOf(vecs, idCol, pairs, "id_a", "id_b")
      .select(col("node").as("vec_id"), col("component").as("rep_id"),
        (col("node") === col("component")).cast("int").as("keep"))
  }

  /** k-NN majority-vote classification (label propagation): each `corpus`
    * row takes the most frequent label among its `k` nearest `labeled`
    * rows by cosine, ties broken by smaller label — fully deterministic.
    *
    * Scale shape: the labeled support set is dimension-sized (a curated
    * seed set), so it broadcasts; the corpus scans ONCE with the
    * codegen'd [[dot]] per pair, and the per-row top-k is the partial
    * aggregate ([[rankTopK]]'s machinery) — the only shuffle carries
    * ≤ |corpus| × k (score, neighbor) pairs, i.e. output-sized. The vote
    * itself is a row-local fold over the k-element array (no second
    * shuffle, no join back to the support set: the neighbor's label rides
    * the top-k pair encoded into the id as `id*256 + label`, which also
    * keeps the aggregate's id-ascending tie-break == neighbor-id
    * ascending since the label is a function of the neighbor).
    *
    * `corpus` and `labeled` are expected disjoint (classify-the-rest);
    * rows whose vector has zero norm score NULL against everything and
    * drop out, mirroring the cosine contract of [[bruteForceTopK]].
    * Labels must lie in [0, 255] (asserted per row at runtime by the
    * encoding check below being exact).
    *
    * Returns (corpus id, pred_label, votes, best_cosine, nn_id).
    */
  def knnClassify(
      corpus: DataFrame,
      labeled: DataFrame,
      k: Int,
      corpusId: String = "vec_id",
      labeledId: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(corpusId).as(corpusId), col(vecCol).as("cv"),
      sqrt(norm2(col(vecCol))).as("cn"))
    val l = labeled.select(
      // enforce the encoding's domain per row (codegen'd, costs nothing):
      // a silent out-of-range label would decode as a different label
      when(col(labelCol).cast("long").between(0, 255) &&
          col(labeledId).cast("long") >= 0,
        col(labeledId).cast("long") * 256 + col(labelCol).cast("long"))
        .otherwise(raise_error(concat(
          lit("knnClassify: need label in [0,255] and id >= 0, got id="),
          col(labeledId), lit(" label="), col(labelCol))))
        .as("enc"),
      col(vecCol).as("lv"), sqrt(norm2(col(vecCol))).as("ln"))
    val scored = c.crossJoin(broadcast(l))
      .withColumn("cosine",
        dot(col("cv"), col("lv")) / nullif(col("cn") * col("ln"), lit(0.0)))
      .filter(col("cosine").isNotNull)
    val topk = scored
      .groupBy(col(corpusId))
      .agg(TopKFunctions.topKByScore(col("cosine"), col("enc"), k).as("__topk"))
    // row-local vote over the k-element array: count each distinct label,
    // winner = (votes DESC, label ASC) via array_min on (-votes, label)
    topk.select(
      col(corpusId),
      expr("""array_min(transform(
               array_distinct(transform(__topk, h -> CAST(h.id % 256 AS INT))),
               l -> struct(
                 -size(filter(__topk, h -> CAST(h.id % 256 AS INT) = l)) AS nv,
                 l AS lbl)))""").as("__win"),
      element_at(col("__topk"), 1).as("__best"))
      .select(
        col(corpusId),
        col("__win.lbl").as("pred_label"),
        (-col("__win.nv")).as("votes"),
        col("__best.score").as("best_cosine"),
        expr("CAST(__best.id DIV 256 AS BIGINT)").as("nn_id"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL'19 — the
    * LASER/CCMatrix parallel-corpus miner): for every source-side
    * embedding, its best target-side match is kept iff the match score
    * clears a RATIO MARGIN against both neighborhoods —
    * `2k·sim(x,y) > (tauNum/tauDen)·(Σ topk sims of x + Σ topk sims of y)`
    * — so a pair only survives when it stands out from everything else
    * either side is close to (the fix for cosine's hubness problem in
    * mining).
    *
    * Engine-exact: vectors are [[LatticeKmeans.quantize]]d to the integer
    * lattice and similarity is the raw integer dot product (64 dims ×
    * (2^20-scale)² < 2^53, exact through the codegen [[vecDot]] fold), so
    * neighborhood sums and the cross-multiplied margin predicate are pure
    * BIGINT algebra on any engine. The margin keeps the sum form (k·mean
    * = sum when both neighborhoods have k members; short corpora just sum
    * what exists — mirrored by the oracle).
    *
    * Scale shape: the source side is the (small) query set — broadcast —
    * and the target corpus is scanned once; BOTH directions' top-k
    * neighborhoods come from partial top-k aggregates over the same
    * scored frame (never a full-score shuffle). At 100 TB the scored
    * frame is bounded by ANN candidate generation first ([[IvfOps]] /
    * [[graft.ops.LatticeKmeans.ivfTopK]]) — the margin algebra is
    * unchanged, it just scores candidates instead of the cross product.
    *
    * Returns (src_id, tgt_id, dot, sum_src, sum_tgt) for mined pairs.
    */
  def bitextMine(
      src: DataFrame,
      tgt: DataFrame,
      k: Int,
      tauNum: Long,
      tauDen: Long,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(tauNum > 0 && tauDen > 0, s"tau must be positive, got $tauNum/$tauDen")
    // integral doubles: the codegen vecDot fold stays exact below 2^53
    val qs = src
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("src_id"),
        LatticeKmeans.quantize(col(vecCol)).cast("array<double>").as("sv"))
    val qt = tgt
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("tgt_id"),
        LatticeKmeans.quantize(col(vecCol)).cast("array<double>").as("tv"))
    val scored = qt.crossJoin(broadcast(qs))
      .select(col("src_id"), col("tgt_id"),
        vecDot(col("sv"), col("tv")).cast("long").as("dot"))

    // partial top-k per direction; scores are integral doubles (exact).
    // Each direction is ONE aggregate pass over the scored frame — the
    // best hit and the neighborhood sum both come from the same k-element
    // array row-locally (a separate best/sum pass would re-run the whole
    // scored subtree, doubling the dominant cost).
    def neighborhood(byCol: String, hitCol: String) = scored
      .groupBy(col(byCol))
      .agg(TopKFunctions.topKByScore(
        col("dot").cast("double"), col(hitCol), k).as("__t"))
    def arrSum(c: Column): Column =
      aggregate(transform(c, h => h.getField("score").cast("long")),
        lit(0L), _ + _)

    val fwd = neighborhood("src_id", "tgt_id").select(
      col("src_id"),
      element_at(col("__t"), 1).getField("id").as("tgt_id"),
      element_at(col("__t"), 1).getField("score").cast("long").as("dot"),
      arrSum(col("__t")).as("sum_src"))
    val sumTgt = neighborhood("tgt_id", "src_id").select(
      col("tgt_id"), arrSum(col("__t")).as("sum_tgt"))

    fwd
      .join(sumTgt, Seq("tgt_id"))
      .filter(lit(2L * k) * col("dot") * lit(tauDen) >
        lit(tauNum) * (col("sum_src") + col("sum_tgt")))
      .select(col("src_id"), col("tgt_id"), col("dot"),
        col("sum_src"), col("sum_tgt"))
  }

  /** Late-interaction (MaxSim) retrieval — the ColBERT scoring shape
    * (Khattab & Zaharia SIGIR'20): documents and queries are SETS of
    * vectors; score(q, d) = Σ over query vectors of the max dot against
    * any document vector. Catches term-level matches a single pooled
    * vector averages away.
    *
    * Engine-exact on the lattice (integer dots through the codegen
    * [[vecDot]] fold), so the full ranking hash-gates. Scale shape: the
    * query vectors broadcast; vector-level scores collapse through TWO
    * map-side-combined aggregates (max per (corpus_doc, query_vec),
    * then sum per (corpus_doc, query_doc)) and a partial top-k — no
    * full-score shuffle, no per-pair materialization beyond the
    * vector-level stream. At 100 TB an ANN pass bounds the candidate
    * vectors first (the standard ColBERT two-stage serving plan); the
    * MaxSim algebra is unchanged.
    *
    * Inputs carry (docCol, vecIdCol, vecCol); returns
    * (query_doc, rank, corpus_doc, score).
    */
  def maxSimTopK(
      queryVecs: DataFrame,
      corpusVecs: DataFrame,
      k: Int,
      docCol: String = "doc",
      vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def q(df: DataFrame, pfx: String) = df
      .filter(col(vecCol).isNotNull)
      .select(col(docCol).cast("long").as(s"${pfx}doc"),
        col(vecIdCol).cast("long").as(s"${pfx}vid"),
        LatticeKmeans.quantize(col(vecCol)).cast("array<double>").as(s"${pfx}v"))
    val qv = q(queryVecs, "q")
    val cv = q(corpusVecs, "c")
    val scores = cv.crossJoin(broadcast(qv))
      .select(col("qdoc"), col("qvid"), col("cdoc"),
        vecDot(col("qv"), col("cv")).cast("long").as("dot"))
      .groupBy(col("qdoc"), col("qvid"), col("cdoc"))
      .agg(max(col("dot")).as("m"))
      .groupBy(col("qdoc"), col("cdoc"))
      .agg(sum(col("m")).as("score"))
    scores
      .groupBy(col("qdoc"))
      .agg(TopKFunctions.topKByScore(
        col("score").cast("double"), col("cdoc"), k).as("__t"))
      .select(col("qdoc").as("query_doc"),
        posexplode(col("__t")).as(Seq("__pos", "__hit")))
      .select(col("query_doc"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__hit.id").as("corpus_doc"),
        col("__hit.score").cast("long").as("score"))
  }

  object Sql {
    /** DuckDB dot product with the same sequential fold order. */
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(" +
        s"range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
        s"(acc, v) -> acc + v)"

    def cosine(a: String, b: String): String =
      s"${dot(a, b)} / nullif(sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}), 0.0)"

    /** DuckDB LSH bucket for a `planes`-bit signature over `dims` dims;
      * `planeOffset` selects the plane family (hash table `t` passes
      * `t * planes`, mirroring [[SimilarityOps.lshBucketTable]]).
      */
    def lshBucket(vec: String, planes: Int, dims: Int, planeOffset: Int = 0): String = {
      val bits = (0 until planes).map { jj =>
        val j = planeOffset + jj
        val ws = (0 until dims).map(d => s"${SimilarityOps.planeWeight(j, d).toDouble}")
          .mkString("[", ", ", "]")
        val proj = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(" +
          s"range(1, len($vec) + 1), i -> CAST($vec[i] AS DOUBLE) * ($ws)[i])), " +
          s"(acc, v) -> acc + v)"
        s"(CASE WHEN $proj >= 0 THEN CAST(${1L << jj} AS BIGINT) ELSE 0 END)"
      }
      bits.mkString("(", " + ", ")")
    }
  }
}
