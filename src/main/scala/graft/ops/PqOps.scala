package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.TopKFunctions

/** Product quantization (PQ) — the memory side of the canonical
  * IVF-PQ index every production ANN system runs at 100 TB scale
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): split the d-dim vector into `m` subspaces,
  * quantize each to one of `ksub` per-subspace centroids, and store only
  * the `m` small codes (here 4 x 1 B instead of 64 x 4 B — a 64x
  * compression of the corpus). Search is ASYMMETRIC distance computation
  * (ADC): the query stays full-precision, a per-query lookup table holds
  * its distance to every (subspace, centroid), and each corpus vector's
  * approximate distance is `m` table lookups + adds — no vector math per
  * pair.
  *
  * Codebooks are supplied by the CALLER as constants — PQ codebooks, like
  * BPE merges ([[graft.queries.PipelineQueries.bpeFrozenMerges]]) and
  * tokenizer vocabularies, train once offline and ship frozen; the
  * corpus-scale operations are encode (pure row-local map) and search
  * (broadcast queries, partial top-k aggregate — one output-sized
  * shuffle). [[literalCodebook]] provides the deterministic integer
  * codebook the oracle re-generates from the same constants, so encode
  * AND ADC search hash-compare against ANSI SQL bit for bit (the
  * [[graft.ops.SimilarityOps.planeWeight]] discipline: integer
  * constants, fixed left-to-right fold order, float->double widening).
  *
  * Scale shape of the full IVF-PQ composition: [[IvfOps.ivfTopK]]'s
  * coarse lists bound the candidates, PQ codes bound the bytes per
  * candidate; both stages are independently gated here
  * (q_sim_ivf_literal, q_sim_pq_literal).
  */
object PqOps {

  /** Deterministic integer codebook entry for (subspace, centroid, dim),
    * in [-3, 3] — the shared avalanche-mixed weight schedule
    * ([[graft.expr.VectorExprs.planeWeight]]) at an offset that cannot
    * alias the LSH plane tables (which use rows < 4096).
    */
  def codebookWeight(sub: Int, cent: Int, d: Int): Int =
    graft.expr.VectorExprs.planeWeight(4096 + (sub << 8) + cent, d)

  /** `m x ksub x dsub` integer-valued codebook (as doubles) from
    * [[codebookWeight]] — the frozen "trained" artifact for the gated
    * catalog query; real deployments pass their k-means codebooks.
    */
  def literalCodebook(m: Int, ksub: Int, dsub: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m, ksub, dsub)((j, c, d) => codebookWeight(j, c, d).toDouble)

  /** Squared L2 distance from the `sub`-th subspace slice of `vec` to the
    * constant centroid `w` — literal-unrolled, left-to-right add order,
    * element widened float->double before the subtraction (bit-exact twin
    * of the SQL form). COMPOSED REFERENCE form: the production path is
    * the fused [[graft.expr.PqExprs]] loop expressions (same arithmetic
    * order, so bit-identical — PqOpsSpec pins the differential); the
    * unrolled form's generated source scales with codebook size and its
    * Janino compile cost (~2 s at 4x16x16) dominated both PQ catalog
    * queries at sf0.1.
    */
  private def subDist(vec: Column, sub: Int, w: Array[Double]): Column = {
    val dsub = w.length
    (0 until dsub).map { d =>
      val x = element_at(vec, sub * dsub + d + 1).cast("double") - lit(w(d))
      x * x
    }.reduce(_ + _)
  }

  /** All `ksub` subspace distances of subspace `sub` as one array. */
  private def subDists(vec: Column, sub: Int, cb: Array[Array[Double]]): Column =
    array(cb.indices.map(c => subDist(vec, sub, cb(c))): _*)

  /** COMPOSED REFERENCE encode (differential-test twin of
    * [[graft.expr.PqExprs.pqEncode]]).
    */
  private[graft] def pqEncodeComposed(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    array(cb.indices.map { j =>
      val ds = subDists(vec, j, cb(j))
      (array_position(ds, array_min(ds)) - 1).cast("int")
    }: _*)

  /** COMPOSED REFERENCE lookup table (differential-test twin of
    * [[graft.expr.PqExprs.pqLut]]).
    */
  private[graft] def pqLutComposed(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    array(cb.indices.map(j => subDists(vec, j, cb(j))): _*)

  /** PQ encode: `m` codes per vector, code j = argmin over subspace j's
    * centroids of the squared L2 distance (first minimum on ties — the
    * lowest centroid id, matching the oracle's CASE chain). Pure
    * row-local FUSED loop expression ([[graft.expr.PqExprs.pqEncode]]):
    * a 100 TB encode pass is a map with zero shuffles emitting `m` small
    * ints per vector, and plan-compile cost is constant in codebook size.
    */
  def pqEncode(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    graft.expr.PqExprs.pqEncode(vec, cb)

  /** IVF-PQ top-k — the full canonical index (Jégou 2011 §IV): a coarse
    * quantizer partitions the corpus into lists ([[IvfOps]] assignment),
    * each vector stores only its list id + the PQ codes of its RESIDUAL
    * (vector − list centroid), and a query probes its `nprobe` nearest
    * lists, building one ADC lookup table per probed list from the
    * query's residual against that centroid. This is the structure that
    * serves billion-vector corpora: candidates bounded by the probed
    * lists, bytes-per-candidate bounded by the code length, and the
    * coarse assignment is the ONLY corpus-wide vector pass.
    *
    * Plan: corpus side is two row-local projections (assign, then
    * residual+encode — the residual is projected to its own column first
    * so the 512-term encode references an attribute, never re-derives
    * it); queries explode to (query, probed list) rows and broadcast
    * with per-list LUTs; the join is a hash equi-join on the list id;
    * top-k is the partial aggregate. Ties: lowest list id at equal
    * coarse scores, lowest corpus id at equal ADC distances.
    *
    * Exactness note for the oracle: centroid and codebook entries are
    * small integers and vector elements are float-widened doubles, so
    * `(v − cent) − code == v − (cent + code)` holds BIT-EXACTLY (every
    * subtraction is exact in double at these magnitudes) — the SQL twin
    * bakes the folded `cent + code` constants per list branch.
    */
  /** Residual of `vec` against the `cid`-th literal centroid (fused
    * loop, [[graft.expr.PqExprs.vecResidual]] — replaces a per-row
    * interpreted `transform` lambda on the corpus path).
    */
  private def residualCol(
      vec: Column, cid: Column, cents: Array[Array[Double]]): Column =
    graft.expr.PqExprs.vecResidual(vec, cid.cast("int"), cents)

  /** The corpus half of the index: `(corpus_id, cid, codes)` — coarse
    * assignment plus PQ codes of the residual, two row-local projections
    * (the residual gets its OWN column so the 512-term encode references
    * an attribute, never re-derives it). This frame IS the persisted
    * index content ([[writeIndex]]).
    */
  def encodeCorpus(
      corpus: DataFrame,
      cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]],
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(cents.nonEmpty, "need at least one coarse centroid")
    corpus
      .select(col(corpusId).as("corpus_id"), col(vecCol).as("cv"),
        IvfOps.assignmentCol(col(vecCol), cents).as("cid"))
      .select(col("corpus_id"), col("cid"),
        residualCol(col("cv"), col("cid"), cents).as("__resid"))
      .select(col("corpus_id"), col("cid"),
        pqEncode(col("__resid"), cb).as("codes"))
  }

  /** ADC search over an already-encoded corpus frame (`(corpus_id, cid,
    * codes)` — [[encodeCorpus]] output, in-flight or read back from a
    * persisted index).
    */
  def searchEncoded(
      enc: DataFrame,
      queries: DataFrame,
      k: Int,
      cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]],
      nprobe: Int,
      queryId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries
      .select(col(queryId).as("query_id"), col(vecCol).as("qv"),
        explode(IvfOps.probesCol(col(vecCol), cents, nprobe)).as("cid"))
      .select(col("query_id"), col("cid"),
        residualCol(col("qv"), col("cid"), cents).as("__qresid"))
      .select(col("query_id"), col("cid"),
        graft.expr.PqExprs.pqLut(col("__qresid"), cb).as("lut"))
    val scored = enc.join(broadcast(q), "cid")
      .withColumn("adc_dist",
        graft.expr.PqExprs.pqAdc(col("codes"), col("lut")))
    scored
      .groupBy(col("query_id"))
      .agg(TopKFunctions.topKByScore(
        -col("adc_dist"), col("corpus_id"), k).as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(col("query_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__hit.id").as("corpus_id"),
        (-col("__hit.score")).as("adc_dist"))
  }

  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]],
      nprobe: Int,
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    searchEncoded(encodeCorpus(corpus, cents, cb, corpusId, vecCol),
      queries, k, cents, cb, nprobe, queryId, vecCol)

  /** Persist the IVF-PQ index as a hive layout PARTITIONED BY LIST ID
    * with sized files ([[LakeOps.writeSharded]]): the directory structure
    * IS the inverted-list structure, so a search that probes 2 of N lists
    * opens only those directories. Returns the sizing plan.
    */
  def writeIndex(
      corpus: DataFrame,
      path: String,
      cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]],
      targetRowsPerFile: Long = 1L << 20,
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): Map[Seq[String], Int] =
    LakeOps.writeSharded(encodeCorpus(corpus, cents, cb, corpusId, vecCol),
      path, Seq("cid"), col("corpus_id"), targetRowsPerFile)

  /** Serve a query batch from a PERSISTED index ([[writeIndex]] layout):
    * the probed list ids are computed up front from the (broadcast-small
    * by contract) query batch and pushed as a STATIC partition filter, so
    * the scan prunes to the probed directories — never reads the other
    * lists' files (PartitionFilters, pinned in PqOpsSpec). This is the
    * serving pattern: at 100 TB the index read cost is
    * |probed lists| / |lists| of the code bytes, not a corpus scan.
    */
  def searchIndex(
      indexPath: String,
      queries: DataFrame,
      k: Int,
      cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]],
      nprobe: Int,
      queryId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val probed = queries
      .select(explode(IvfOps.probesCol(col(vecCol), cents, nprobe)).as("cid"))
      .distinct().collect().map(_.getInt(0)).sorted
    val enc = spark.read.parquet(indexPath)
      .filter(col("cid").isin(probed.map(Integer.valueOf).toSeq: _*))
    searchEncoded(enc, queries, k, cents, cb, nprobe, queryId, vecCol)
  }

  /** ADC top-k: for each query row, the `k` corpus rows with the smallest
    * PQ-approximated squared L2 distance (ties -> lowest corpus id).
    *
    * Plan: the corpus is ENCODED ONCE (row-local) and never carries the
    * raw vector into the join; queries broadcast with their per-query
    * `m x ksub` lookup tables; the per-pair distance is `m` array lookups
    * folded left-to-right; the per-query top-k is the partial
    * [[graft.agg.TopKByScoreAgg]] aggregate, so the only shuffle carries
    * at most |queries| x k rows per map task. At 100 TB the dominant cost
    * is the corpus scan of the 4-byte code arrays — the point of PQ.
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      cb: Array[Array[Array[Double]]],
      queryId: String = "vec_id",
      corpusId: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val enc = corpus.select(col(corpusId).as("corpus_id"),
      pqEncode(col(vecCol), cb).as("codes"))
    val q = queries.select(col(queryId).as("query_id"),
      graft.expr.PqExprs.pqLut(col(vecCol), cb).as("lut"))
    val scored = enc.crossJoin(broadcast(q))
      .withColumn("adc_dist",
        graft.expr.PqExprs.pqAdc(col("codes"), col("lut")))
    scored
      .groupBy(col("query_id"))
      .agg(TopKFunctions.topKByScore(
        -col("adc_dist"), col("corpus_id"), k).as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(col("query_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__hit.id").as("corpus_id"),
        (-col("__hit.score")).as("adc_dist"))
  }
}
