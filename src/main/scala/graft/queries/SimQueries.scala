package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, TextOps}
import graft.streaming.{EventOps, IngestDedupStream}

import QueryShared._

/** Embedding similarity and ANN (IVF/PQ/LSH/k-means), plus multimodal/audio payload ops.
  *
  * Domain slice of the gated catalog (split out of PipelineQueries
  * in round 9); assembled and exposed by [[PipelineQueries]].
  */
private[queries] object SimQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 64-bit block-sum perceptual hash per media payload (pHash shape;
    // exact integer comparisons only, so the byte-level stub is fully
    // oracle-replayable). Codec batch shape: mapPartitions, no shuffle.
    "q_media_phash" -> ((s, dir) =>
      MultimodalOps.perceptualHashes(
        MultimodalOps.mediaFromDocuments(t(s, dir, "documents")))),

    // Perceptual near-dup pairs within Hamming 3: the SAME pigeonhole
    // chunk join that pairs text simhashes pairs image signatures —
    // 4 chunks of 16 bits, candidates bucket-joined, row-local verify.
    "q_media_neardup" -> ((s, dir) =>
      DedupOps.simhashNearDupPairs(
        MultimodalOps.perceptualHashes(
          MultimodalOps.mediaFromDocuments(t(s, dir, "documents")))
          .select(col("media_id").as("doc_id"), col("phash").as("simhash")),
        bits = 64, maxHamming = 3)),

    // In-query k-means with a FULL training oracle: embeddings quantized
    // to the integer lattice (round(x*2^20), row-local exact), 2 Lloyd
    // rounds of integer argmin assignment + truncating-division centroid update —
    // every reduction an associative integer sum, so the whole training
    // loop replays bit-for-bit in DuckDB with the rounds unrolled as
    // CTEs. The float k-means pair (q_semdedup/q_sim_ivf_topk) stays
    // rows-only by nature; this is the same algorithm made engine-exact.
    "q_kmeans_lattice" -> ((s, dir) =>
      LatticeKmeans.assignments(t(s, dir, "embeddings"), k = 4, iters = 2)),

    // --- q_kmeans_lattice driver-side bisection (round 8) -------------
    // The headline query above has been hash-red at the DRIVER for two
    // rounds while the identical SQL passes in the builder's DuckDB at
    // sf0.01 AND sf0.1 — so the divergence lives in something only the
    // driver's environment exhibits. These three stages share the exact
    // kmeansLatticeCtes SQL text and export each intermediate as scalar
    // rows, so the driver's own CORRECTNESS run localizes the failure:
    //   _q  green + _c1 red  -> round-1 update (list_reduce sum /
    //                           list(ORDER BY) / division);
    //   _c1 green + _c2 red  -> round-2 (same ops, post-update inputs);
    //   all green + headline red -> final assignment ranking or the
    //                           driver comparator itself.
    // Kept permanently: free insurance for every lattice query.

    // Stage 0 — quantization: every (vec, dim) lattice coordinate.
    "q_kmeans_lattice_q" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"), posexplode(
          LatticeKmeans.quantize(col("embedding")).cast("array<long>")))
        .select(col("vec_id"), col("pos").cast("int").as("d"),
          col("col").as("coord"))),

    // Stage 1a — round-1 winner assignment under the seed centroids
    // (exercises distExpr + the (dist2, j) row_number tie-break alone).
    "q_kmeans_lattice_a1" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      LatticeKmeans.trainRounds(e, k = 4, iters = 2).headOption match {
        case None => Seq.empty[(Long, Int)].toDF("vec_id", "cluster")
        case Some(seeds) =>
          e.select(col("vec_id"),
              LatticeKmeans.quantize(col("embedding")).as("qv"))
            .filter(col("qv").isNotNull)
            .select(col("vec_id"),
              (LatticeKmeans.packed(col("qv"), seeds) % 256)
                .cast("int").as("cluster"))
      }
    }),

    // Stage 1b / 2 — the centroid matrices after Lloyd rounds 1 and 2,
    // row-exploded to (j, d, coord) so no array-typed cell reaches the
    // driver comparator.
    "q_kmeans_lattice_c1" -> ((s, dir) =>
      latticeCentroidFrame(s, dir, round = 1)),
    "q_kmeans_lattice_c2" -> ((s, dir) =>
      latticeCentroidFrame(s, dir, round = 2)),

    // Stage 3 — every (vec, final-centroid) distance VALUE (the raw
    // numbers the headline's argmin ranks and emits).
    "q_kmeans_lattice_fd" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      LatticeKmeans.trainRounds(e, k = 4, iters = 2).lastOption match {
        case None => Seq.empty[(Long, Int, Long)].toDF("vec_id", "j", "dist2")
        case Some(cents) => LatticeKmeans.allDistances(e, cents)
      }
    }),

    // Farthest-point (k-center greedy) coreset selection — diversity
    // sampling for curation, exact-integer on the lattice: m-1 fused
    // assignment scans (the chosen set is the centroid matrix), 1-row
    // TakeOrdered per round, ties to the lowest id. The greedy loop
    // replays round by round in the oracle.
    "q_coreset_sample" -> ((s, dir) =>
      LatticeKmeans.coresetSample(t(s, dir, "embeddings"), m = 6)),

    // IVF ANN with IN-QUERY TRAINING and a full oracle: the lattice
    // answer to q_sim_ivf_topk's rows-only floor. L2 metric, exact
    // integer arithmetic end to end — trained coarse lists, fused
    // assignment pass, nprobe probe selection, candidates-only join,
    // (dist2, id) deterministic ranking. The float-cosine variant keeps
    // its literal-centroid twin; this is the trained index made
    // engine-exact.
    "q_sim_ivf_lattice" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      LatticeKmeans.ivfTopK(e.filter(col("vec_id") < 10), e,
        k = 10, nLists = 4, iters = 2, nprobe = 2)
    }),

    // Incremental IVF maintenance (IvfIndexOps): FAISS add-after-train on
    // disk — train on the base 2/3 of the corpus, persist centroids +
    // cid-partitioned lists, APPEND the remaining 1/3 without retraining
    // (assign under the persisted quantizer, add list files, merge
    // stats), then probe the merged index. The whole lifecycle is lattice
    // arithmetic, so training-on-a-subset + full-corpus assignment +
    // ranking replays bit-for-bit in the oracle (trainWhere pushes the
    // same base-segment predicate into the training CTEs).
    "q_sim_ivf_incremental" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_ivf_idx_").toString
      graft.ops.IvfIndexOps.build(
        e.filter(col("vec_id") % 3 =!= 0), idx, nLists = 4, iters = 2)
      graft.ops.IvfIndexOps.append(
        e.filter(col("vec_id") % 3 === 0), idx, segment = "delta1")
      graft.ops.IvfIndexOps.probe(
        e.filter(col("vec_id") < 10), idx, k = 10, nprobe = 2)
    }),

    // SemDeDup with NOTHING left un-oracled: lattice-trained clusters,
    // integer-exact within-cluster cosine test at tau = 7/20 (= the
    // 0.35 of the literal variant), recursive-CTE transitive closure.
    // q_semdedup (float training) keeps the paper's exact semantics as
    // the rows-only twin; this is the same pipeline made engine-exact.
    "q_semdedup_lattice" -> ((s, dir) =>
      LatticeKmeans.semDedup(t(s, dir, "embeddings"),
        k = 4, iters = 2, tauNum = 7, tauDen = 20)),

    // Audio leg of the multimodal contract: real RIFF/WAVE parse inside
    // the partition (synthetic payloads whose PCM replays in DuckDB via
    // the HUGEINT splitmix SQL), integer-exact acoustic features out.
    "q_audio_features" -> ((s, dir) =>
      AudioOps.featureFrame(t(s, dir, "documents"))),

    // Duplicate-audio groups by energy-delta fingerprint
    // (Haitsma-Kalker bit vector): one map-side-combining shuffle on the
    // 8-byte fingerprint; the synthetic corpus plants the duplicates.
    "q_audio_dup" -> ((s, dir) =>
      AudioOps.dupGroups(t(s, dir, "documents"))),

    // Radius-tolerant audio NEAR-dup (Hamming <= 3 on the energy-delta
    // fingerprint) riding the same pigeonhole chunk join as simhash and
    // phash — never all-pairs. Planted near-dups: each doc_id < 50 also
    // contributes a "re-recorded" variant whose quiet window halves the
    // PCM (<= 2 fingerprint bits flip), invisible to exact-equality
    // grouping but found here; the oracle replays variant PCM, both
    // fingerprints and the radius join exactly.
    "q_audio_neardup" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 200)
      val fps = AudioOps.fingerprintFrame(d).unionByName(
        AudioOps.variantFingerprintFrame(d.filter(col("doc_id") < 50)))
      AudioOps.nearDupPairs(fps, maxHamming = 3)
    }),

    // Gated projection stringifies the int8 vector (comma-joined): the
    // driver's pandas comparator cannot sort array cells. quantizeInt8
    // itself still returns the real ARRAY<INT> column.
    "q_embed_quantize" -> ((s, dir) =>
      PrepOps.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("qvec"), x => x.cast("string")), ",")
            .as("qvec_str"))),

    // Embedding outlier scoring for curation: cosine of every vector to
    // its label centroid. The centroid comes from the EXACT fixed-point
    // sums (merge-order-proof), so the tiny centroid table is bit-stable;
    // it broadcasts, and the per-row cosine is the sequential-order VecDot
    // fold — deterministic doubles, hash-matched against DuckDB's
    // identical-order list_reduce.
    "q_embed_outliers" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.groupBy(col("label"))
        .agg(
          graft.agg.VecSumFunctions.vecSumFixed(col("embedding"), 1000000.0).as("__s"),
          count(col("embedding")).as("__n"))
        .select(col("label"),
          transform(col("__s"),
            x => x.cast("double") / col("__n") / lit(1000000.0)).as("__c"))
      emb.join(broadcast(cents), "label")
        .select(col("vec_id"), col("label"),
          SimilarityOps.cosine(
            col("embedding").cast("array<double>"), col("__c")).as("cos_centroid"))
    }),

    // Per-label centroids via the mergeable fixed-point vector-sum
    // aggregate: each map task forwards ONE dims x 8 B buffer per label
    // (the posexplode + groupBy(label, dim) alternative — which the oracle
    // uses as an independent formulation — shuffles rows x dims). Long
    // sums are merge-order-proof; truncation toward zero is bit-portable.
    "q_embed_centroids" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(
          graft.agg.VecSumFunctions.vecSumFixed(col("embedding"), 1000000.0).as("__s"),
          // count NON-NULL embeddings: the sum skips null vectors and the
          // oracle's per-dim count(*) only sees unnested (non-null) rows —
          // count(lit(1)) would divide by a larger n on null-bearing data
          count(col("embedding")).as("n_vecs"))
        .select(col("label"), col("n_vecs"),
          posexplode(col("__s")).as(Seq("__p", "__v")))
        .select(col("label"), (col("__p") + 1).cast("long").as("dim"),
          col("__v").as("sum_fp"), col("n_vecs"),
          (col("__v").cast("double") / col("n_vecs") / lit(1000000.0)).as("centroid"))),

    // -------------------------------------------------------- similarity
    "q_sim_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 10)
    }),

    // Two-stage funnel retrieval (the production serving pipeline): a
    // cheap 16-dim Matryoshka front ranks the corpus and keeps 50
    // candidates; the full 64-dim cosine re-ranks ONLY those and
    // returns 10. Stage 2's cost is candidate-bounded at any corpus
    // size. Both stage rankings replay in the oracle (two window
    // ranks over the sequential-fold cosines).
    "q_two_stage_rerank" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.twoStageTopK(
        e.filter(col("vec_id") < 10), e, k = 10, kCand = 50, frontDims = 16)
    }),

    // Hard-negative mining for contrastive training: nearest corpus
    // vectors of a DIFFERENT class (vec_id % 4 as the synthetic label) —
    // near-boundary negatives, not random ones. Same audited broadcast
    // top-k shape with the class test as a join residual.
    "q_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("cls", (col("vec_id") % 4).cast("int"))
      SimilarityOps.hardNegatives(
        e.filter(col("vec_id") < 10), e, k = 3, classCol = "cls")
    }),

    // Late-interaction MaxSim retrieval (ColBERT, Khattab-Zaharia
    // SIGIR'20): docs/queries are SETS of 4 vectors (vec_id div 4);
    // score = sum over query vectors of the max integer dot against any
    // doc vector. Full ranking hash-gated on the lattice; two map-side
    // aggregates + partial top-k, query vectors broadcast. Self-docs
    // rank first by construction — a live sanity pin inside the gate.
    "q_maxsim_topk" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .select(expr("vec_id div 4").as("doc"),
          col("vec_id"), col("embedding"))
      SimilarityOps.maxSimTopK(
        vecs.filter(col("vec_id") < 32), vecs, k = 5)
    }),

    // Margin-based bitext mining (Artetxe-Schwenk ACL'19): parity splits
    // the corpus into a source and a target "language"; each source
    // vector's best target survives only if it clears the ratio margin
    // against BOTH top-4 neighborhoods. Integer-exact on the lattice, so
    // the neighborhood sums and the cross-multiplied margin predicate
    // hash-gate end to end. Both neighborhoods come from partial top-k
    // aggregates — no full-score shuffle.
    "q_bitext_mine" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.bitextMine(
        e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1),
        k = 4, tauNum = 21L, tauDen = 20L)
    }),

    "q_sim_lsh_buckets" -> ((s, dir) =>
      t(s, dir, "embeddings").select(
        col("vec_id"),
        SimilarityOps.lshBucket(col("embedding"), planes = 8, dims = 64)
          .as("bucket"))),

    // Oracled by composing the two already-proven pieces: the
    // literal-weight bucket SQL (q_sim_lsh_buckets) as the join key and
    // the sequential-fold cosine + window top-k (q_sim_topk).
    "q_sim_lsh_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.lshTopK(
        e.filter(col("vec_id") < 10), e, k = 10, planes = 8, dims = 64)
    }),

    // IVF coarse-quantizer ANN (spherical k-means lists + nprobe search).
    // Oracled DOWNSTREAM OF TRAINING since round 8: training is
    // deterministic (fixed-point Lloyd sums — layout-invariant), so the
    // trained centroids export as exact double literals into a
    // dynamically-built oracle (TrainedExport) that re-derives the
    // assignment argmax, probe ranking, and candidate cosine top-k in
    // DuckDB. Training itself remains the un-oracled stage
    // (IvfOpsSpec-verified); the L2 lattice twin q_sim_ivf_lattice
    // oracles training too.
    "q_sim_ivf_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      // export the (deterministic) trained centroids so oracleSql can
      // gate everything downstream of training — see TrainedExport
      val cents = IvfOps.trainCentroids(e, k = 8, iters = 2)
      if (cents.nonEmpty) TrainedExport.put("float_k8_i2", cents)
      IvfOps.ivfTopK(e.filter(col("vec_id") < 10), e, k = 10, cents, nprobe = 4)
    }),

    // The IVF SEARCH path gated end to end with a DuckDB oracle: the
    // centroids are FIXED integer literals (training is the genuinely
    // un-oracle-able half — see q_sim_ivf_topk), so the row-local corpus
    // assignment argmax, the query's nprobe probe selection, and the
    // candidates-only cosine top-k all hash-compare exactly. Composes the
    // proven literal-weight dot (q_embed_project) + window top-k
    // (q_sim_topk) pieces.
    "q_sim_ivf_literal" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      IvfOps.ivfTopK(e.filter(col("vec_id") < 10), e, k = 10,
        IvfOps.literalCentroids(4, 64), nprobe = 2)
    }),

    // Product quantization (Jégou et al. 2011) — the memory side of the
    // canonical IVF-PQ index: corpus encoded to 4 subspace codes
    // (row-local argmin vs a FROZEN literal codebook — the 64x corpus
    // compression), search by asymmetric distance (per-query LUT, m
    // lookups + adds per pair, partial top-k aggregate). Every stage is
    // integer-literal + fixed-fold-order arithmetic, so encode AND ADC
    // search hash-compare against the DuckDB twin exactly.
    "q_sim_pq_literal" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      PqOps.pqTopK(e.filter(col("vec_id") < 10), e, k = 10,
        PqOps.literalCodebook(4, 8, 16))
    }),

    // The FULL IVF-PQ index (coarse literal centroids partition the
    // corpus into lists; each vector stores list id + PQ codes of its
    // RESIDUAL; a query probes nprobe lists with one ADC table per
    // list). Candidates bounded by the probed lists, bytes per candidate
    // by the code length — the billion-vector production structure,
    // hash-gated end to end: assignment, probe selection, residual
    // encode and per-list ADC all compare bit-for-bit (the oracle folds
    // centroid+code constants per list branch).
    "q_sim_ivfpq_literal" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      PqOps.ivfPqTopK(e.filter(col("vec_id") < 10), e, k = 10,
        IvfOps.literalCentroids(4, 64), PqOps.literalCodebook(4, 8, 16),
        nprobe = 2)
    }),

    // ANN quality gate AS A QUERY: recall@10 of the PQ-ADC ranking vs the
    // exact cosine ranking, per query — the metric every production ANN
    // deployment monitors (both rankings are independently oracle-gated;
    // this composes them, so the oracle re-derives BOTH lists and the
    // recall arithmetic in one statement).
    "q_ann_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val exact = SimilarityOps.bruteForceTopK(q, e, k = 10)
        .select(col("query_id"), col("corpus_id"))
      val approx = PqOps.pqTopK(q, e, k = 10, PqOps.literalCodebook(4, 8, 16))
        .select(col("query_id"), col("corpus_id"))
      val hits = exact.join(approx, Seq("query_id", "corpus_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / 10)
            .as("recall_at_10"))
    }),

    // Matryoshka-style truncation eval (Kusupati et al. 2022): how much
    // of the full-64-dim top-10 survives searching only the first 16
    // dims — the cheap-retrieval/full-rerank tradeoff measured per
    // query. Both legs are the audited broadcast brute-force top-k
    // (query-sized output); recall joins candidate-sized frames.
    "q_matryoshka_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val e16 = e.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val exact = SimilarityOps
        .bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 10)
        .select(col("query_id"), col("corpus_id"))
      val trunc = SimilarityOps
        .bruteForceTopK(e16.filter(col("vec_id") < 10), e16, k = 10)
        .select(col("query_id"), col("corpus_id"))
      val hits = exact.join(trunc, Seq("query_id", "corpus_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / 10)
            .as("recall_at_10"))
    }),

    // JL random projection 64 -> 16 dims: deterministic literal planes,
    // pure map (the cheap front of ANN/clustering pipelines). Bit-exact
    // vs the oracle: integer weights, sequential fold, power-of-two scale.
    "q_embed_project" -> ((s, dir) =>
      t(s, dir, "embeddings").select(
        col("vec_id") +: (0 until 16).map(j =>
          SimilarityOps.projectCol(col("embedding"), j, dims = 64, outDims = 16)
            .as(s"p$j")): _*)),

    // DATA-ADAPTIVE dimensionality reduction next to the data-oblivious
    // JL projection above: distributed PCA. The corpus contributes ONE
    // fixed-point moment pass (mean + Gram — layout-invariant integers);
    // covariance, cyclic-Jacobi eigen, ordering and sign conventions run
    // on the driver over the 64x64 matrix; projection is a row-local
    // literal-component scan. The deterministic model exports through
    // TrainedExport, so the oracle re-derives every projected score from
    // the base table — downstream-of-decomposition hash-gated, the
    // q_sim_ivf_topk discipline.
    "q_pca_project" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      PcaOps.fitOption(e, m = 4, dims = 64) match {
        case None => // empty/all-null corpus: total, zero rows
          Seq.empty[(Long, Double, Double, Double, Double)]
            .toDF("vec_id", "pc1", "pc2", "pc3", "pc4")
        case Some(model) =>
          TrainedExport.put("pca_m4", model.components :+ model.offsets)
          PcaOps.project(e, model)
      }
    }),

    // SemDeDup (Abbas et al. 2023): k-means clusters (layout-invariant
    // training), within-cluster cosine pairs (Σ|cluster|² — never
    // all-pairs), transitive closure, min-id representative per group.
    // Oracled DOWNSTREAM OF TRAINING since round 8 via the TrainedExport
    // mechanism (deterministic trained centroids as exact literals in a
    // dynamically-built oracle); training itself stays spec-pinned in
    // SimilarityOpsSpec (planted groups == global brute-force
    // components). The SAME pipeline with engine-exact training is
    // fully oracled — training included — as q_semdedup_lattice.
    "q_semdedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      // same training geometry as q_sim_ivf_topk — one shared export
      val cents = IvfOps.trainCentroids(e, k = 8, iters = 2)
      if (cents.nonEmpty) TrainedExport.put("float_k8_i2", cents)
      SimilarityOps.semDedup(e, cents, threshold = 0.35)
    }),

    // The SemDeDup mechanics gated end to end with a DuckDB oracle (the
    // q_sim_ivf_literal trick): centroids FIXED as integer literals, so
    // the row-local assignment argmax, the within-cluster cosine pairs,
    // and the transitive closure (min-id representatives — a recursive
    // CTE on the oracle side) all hash-compare exactly. Training stays
    // the documented un-oracle-able half (q_semdedup, rows-only).
    "q_semdedup_literal" -> ((s, dir) =>
      SimilarityOps.semDedup(t(s, dir, "embeddings"),
        IvfOps.literalCentroids(4, 64), threshold = 0.35)),

    // k-NN majority-vote classification (label propagation): the 20%
    // labeled slice (vec_id % 5 == 0) is the broadcast support set, the
    // other 80% gets classified by its 7 nearest labeled vectors.
    // Deterministic end to end: sequential-fold cosines, (score DESC,
    // neighbor ASC) top-k, (votes DESC, label ASC) vote — the oracle
    // recomputes the vote with window rank + group count.
    "q_knn_classify" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.knnClassify(
        e.filter(col("vec_id") % 5 =!= 0),
        e.filter(col("vec_id") % 5 === 0), k = 7)
    }),

    "q_embed_neardup" -> ((s, dir) =>
      SimilarityOps.cosineNearDupPairs(t(s, dir, "embeddings"), 0.35)),

    // Same output contract via the LSH scale path: candidates only from
    // shared (table, bucket) cells, exact-cosine verified. planes=4 x
    // tables=16 tuned to this corpus' weak-similarity profile (recall
    // 0.92-0.95 vs brute force, SimilarityOpsSpec).
    "q_embed_neardup_lsh" -> ((s, dir) =>
      SimilarityOps.lshNearDupPairs(
        t(s, dir, "embeddings"), threshold = 0.35,
        planes = 4, dims = 64, tables = 16)),

    // -------------------------------------------------------- multimodal
    "q_multimodal_features" -> ((s, dir) =>
      MultimodalOps.documentFeatures(s, t(s, dir, "documents"))),

    // frame sampling: 1 media row -> N frame rows (UDTF-shaped expansion)
    "q_multimodal_frames" -> ((s, dir) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.mediaFromDocuments(t(s, dir, "documents")),
        frameSize = 32, every = 2)
        .toDF()
        .select(col("media_id"), col("frame_idx"),
          length(col("frame_bytes")).cast("long").as("n_bytes"),
          col("frame_sha"))),

    // MMR diversified re-ranking (maximal marginal relevance, Carbonell &
    // Goldstein SIGIR'98) — the standard last stage of a retrieval
    // pipeline: from the top-N candidates by relevance to a query vector,
    // greedily pick k maximizing lambda*rel - (1-lambda)*max-sim-to-
    // selected. Scale shape: candidate generation is the audited
    // distributed top-k (corpus-sized); the greedy loop touches ONLY the
    // N candidates and their NxN cosines, so the bounded collect (N=12
    // rows) is the honest plan — production rerankers run on tens of
    // rows per query, never on the corpus. All cosines are computed IN
    // Spark by the proven sequential-fold expression; the driver does
    // only the 0.7*rel - 0.3*maxSim compares, which the oracle's
    // recursive CTE replays operation for operation.
    "q_mmr_rerank" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val cands = e.filter(col("vec_id") > 0)
        .join(broadcast(qv))
        .select(col("vec_id"), col("embedding"),
          SimilarityOps.cosine(col("embedding"), col("q_emb")).as("rel"))
        .filter(col("rel").isNotNull)
        .orderBy(col("rel").desc, col("vec_id"))
        .limit(12)
        .cache()
      val a = cands.select(col("vec_id").as("ia"), col("embedding").as("ea"),
        col("rel"))
      val b = cands.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      val pairs = a.crossJoin(broadcast(b)).filter(col("ia") =!= col("ib"))
        .select(col("ia"), col("ib"),
          SimilarityOps.cosine(col("ea"), col("eb")).as("sim"))
      val relM = cands.select(col("vec_id"), col("rel"))
        .as[(Long, Double)].collect().toMap
      val simM = pairs.as[(Long, Long, Double)].collect()
        .map { case (x, y, v) => (x, y) -> v }.toMap
      var selected = Vector.empty[(Long, Double, Double)]
      var remaining = relM.keySet.toList.sorted
      for (_ <- 1 to 5 if remaining.nonEmpty) {
        val scored = remaining.map { id =>
          val ms = if (selected.isEmpty) 0.0
            else selected.map(sel => simM((id, sel._1))).max
          (id, relM(id), 0.7 * relM(id) - 0.3 * ms)
        }
        val best = scored.minBy { case (id, _, m) => (-m, id) }
        selected :+= best
        remaining = remaining.filterNot(_ == best._1)
      }
      selected.zipWithIndex
        .map { case ((id, rel, m), i) => (i + 1L, id, rel, m) }
        .toDF("rank", "corpus_id", "relevance", "mmr_score")
    }),

    // Hybrid retrieval with reciprocal-rank fusion (RRF, Cormack et al.
    // SIGIR'09) — the standard way to combine a lexical (BM25) and a
    // dense (cosine) ranking without score calibration: each leg
    // contributes 1/(60+rank). Scale shape: both legs end in k-row
    // TakeOrderedAndProject heaps (never a corpus sort), so the fusion
    // join, the rank windows, and the final cut all run on 2k metric
    // rows — the single-partition windows are deliberate and safe at any
    // corpus size because the inputs are k-bounded.
    "q_hybrid_rrf" -> ((s, dir) => {
      val wt = Window.orderBy(col("score").desc, col("doc_id"))
      val bm = SearchOps.bm25TopK(t(s, dir, "documents"), col("doc_id"),
          col("text"), Seq("vector", "customer", "stream"), k = 20)
        .withColumn("r_text", row_number().over(wt))
      val e = t(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      val wv = Window.orderBy(col("cosine").desc, col("vec_id"))
      val vec = e.filter(col("vec_id") > 0)
        .join(broadcast(qv))
        .select(col("vec_id"),
          SimilarityOps.cosine(col("embedding"), col("q_emb")).as("cosine"))
        .filter(col("cosine").isNotNull)
        .orderBy(col("cosine").desc, col("vec_id")).limit(20)
        .withColumn("r_vec", row_number().over(wv))
      bm.select(col("doc_id"), col("r_text"))
        .join(vec.select(col("vec_id").as("doc_id"), col("r_vec")),
          Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(lit(1.0) / (lit(60) + col("r_text")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0))).as("rrf"),
          col("r_text"), col("r_vec"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_sim_ivf_literal" -> ivfLiteralOracle,
    "q_semdedup_literal" -> semDedupLiteralOracle,

    "q_media_phash" ->
      s"""WITH $phashCtes
         |SELECT media_id, phash FROM ph""".stripMargin,

    "q_media_neardup" ->
      s"""WITH $phashCtes
         |SELECT a.media_id AS id_a, b.media_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
         |FROM ph a JOIN ph b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3""".stripMargin,

    "q_kmeans_lattice" -> kmeansLatticeOracle(k = 4, iters = 2, dims = 64),
    // Bisection stages for the headline hash-fail (round 8, VERDICT r7
    // task 1): identical CTE text, one intermediate each.
    "q_kmeans_lattice_q" ->
      kmeansLatticeQuantOracle(k = 4, iters = 2, dims = 64),
    "q_kmeans_lattice_a1" ->
      kmeansLatticeAssign1Oracle(k = 4, iters = 2, dims = 64),
    "q_kmeans_lattice_c1" ->
      kmeansLatticeCentsOracle(k = 4, iters = 2, dims = 64, round = 1),
    "q_kmeans_lattice_c2" ->
      kmeansLatticeCentsOracle(k = 4, iters = 2, dims = 64, round = 2),
    "q_kmeans_lattice_fd" ->
      kmeansLatticeFinDistOracle(k = 4, iters = 2, dims = 64),
    "q_semdedup_lattice" ->
      semDedupLatticeOracle(k = 4, iters = 2, dims = 64, tauNum = 7, tauDen = 20),
    "q_sim_ivf_lattice" ->
      ivfLatticeOracle(k = 4, iters = 2, dims = 64, nprobe = 2, topK = 10),
    // Same search semantics, quantizer trained ONLY on the base segment
    // (vec_id % 3 <> 0) while fin assigns the full corpus — the oracle of
    // the add-after-train lifecycle.
    "q_sim_ivf_incremental" ->
      ivfLatticeOracle(k = 4, iters = 2, dims = 64, nprobe = 2, topK = 10,
        trainWhere = "vec_id % 3 <> 0"),
    "q_coreset_sample" -> coresetOracle(m = 6, dims = 64),

    // Every PCM sample of every clip regenerated in HUGEINT SQL
    // (RefQueries.mixSql splitmix replay), then the same integer folds.
    "q_audio_features" ->
      s"""WITH $audioCtes,
         |lagd AS (SELECT doc_id, i, smp,
         |  lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prv FROM x)
         |SELECT doc_id,
         |  ${AudioOps.SampleRate} AS sample_rate,
         |  CAST(count(*) AS BIGINT) AS n_samples,
         |  CAST(count(*) * 1000 // ${AudioOps.SampleRate} AS BIGINT) AS duration_ms,
         |  CAST(sum(smp) AS BIGINT) AS sum_amp,
         |  CAST(sum(smp * smp) AS BIGINT) AS sum_sq,
         |  CAST(sum(CASE WHEN prv IS NOT NULL AND ((smp >= 0) <> (prv >= 0))
         |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
         |  CAST(max(abs(smp)) AS BIGINT) AS peak
         |FROM lagd GROUP BY doc_id""".stripMargin,

    "q_audio_dup" ->
      s"""WITH $audioCtes,
         |e AS (SELECT doc_id, i // ${AudioOps.WindowLen} AS w, sum(smp * smp) AS en
         |      FROM x GROUP BY doc_id, i // ${AudioOps.WindowLen}),
         |l AS (SELECT doc_id, w, en,
         |      lead(en) OVER (PARTITION BY doc_id ORDER BY w) AS nxt FROM e),
         |fp AS (SELECT doc_id,
         |       CAST(sum(CASE WHEN nxt > en THEN 1::BIGINT << w ELSE 0 END) AS BIGINT)
         |         AS fingerprint
         |       FROM l WHERE nxt IS NOT NULL GROUP BY doc_id)
         |SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(doc_id) AS canonical_doc
         |FROM fp GROUP BY fingerprint HAVING count(*) > 1""".stripMargin,
    // Original + variant PCM regenerated per observation (qw = the
    // halved window, -1 = untouched original), both fingerprints, then
    // the exact radius-3 pair join. The variant's halving replays with
    // the sign-split `//` (division-direction-proof on negative PCM).
    "q_audio_neardup" -> {
      val nW = AudioOps.NSamples / AudioOps.WindowLen
      s"""WITH obs AS (
         |  SELECT doc_id AS oid, doc_id AS src, -1 AS qw
         |  FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT doc_id + ${AudioOps.VariantIdOffset}, doc_id,
         |    CAST(doc_id % ${nW - 2} + 1 AS INTEGER)
         |  FROM documents WHERE doc_id < 50),
         |px AS (SELECT oid, qw,
         |         (src % ${AudioOps.SeedGroups})::HUGEINT AS seed,
         |         t.range AS i
         |       FROM obs CROSS JOIN range(0, ${AudioOps.NSamples}) t),
         |m AS (SELECT oid, qw, i,
         |  ${RefQueries.mixSql("a", s"seed * ${AudioOps.SeedMult} + i")}
         |  FROM px),
         |x0 AS (SELECT oid, qw, i, (am % 65536)::BIGINT - 32768 AS s0 FROM m),
         |x AS (SELECT oid, i,
         |        CASE WHEN i // ${AudioOps.WindowLen} = qw THEN
         |          CASE WHEN s0 >= 0 THEN s0 // 2 ELSE -((-s0) // 2) END
         |        ELSE s0 END AS smp
         |      FROM x0),
         |e AS (SELECT oid, i // ${AudioOps.WindowLen} AS w, sum(smp * smp) AS en
         |      FROM x GROUP BY oid, i // ${AudioOps.WindowLen}),
         |l AS (SELECT oid, w, en,
         |      lead(en) OVER (PARTITION BY oid ORDER BY w) AS nxt FROM e),
         |fp AS (SELECT oid,
         |       CAST(sum(CASE WHEN nxt > en THEN 1::BIGINT << w ELSE 0 END) AS BIGINT)
         |         AS fingerprint
         |       FROM l WHERE nxt IS NOT NULL GROUP BY oid)
         |SELECT a.oid AS id_a, b.oid AS id_b,
         |  CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INTEGER) AS hamming
         |FROM fp a JOIN fp b ON a.oid < b.oid
         |WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3""".stripMargin
    },
    "q_sim_pq_literal" -> pqLiteralOracle,
    "q_sim_ivfpq_literal" -> ivfPqLiteralOracle,
    "q_ann_recall" -> annRecallOracle,

    // Both legs replay the q_sim_topk window formulation; the truncated
    // leg slices the SAME stored lists, so a hash match also proves the
    // slice semantics line up (1-based inclusive on both engines).
    "q_matryoshka_recall" -> {
      val cos64 = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
      val cos16 = SimilarityOps.Sql.cosine(
        "q.embedding[1:16]", "c.embedding[1:16]")
      s"""WITH exact AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY $cos64 DESC, c.vec_id) AS rank
         |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10
         |    WHERE $cos64 IS NOT NULL)
         |  WHERE rank <= 10),
         |trunc AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY $cos16 DESC, c.vec_id) AS rank
         |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10
         |    WHERE $cos16 IS NOT NULL)
         |  WHERE rank <= 10),
         |h AS (
         |  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM exact e JOIN trunc tr
         |    ON e.query_id = tr.query_id AND e.corpus_id = tr.corpus_id
         |  GROUP BY e.query_id)
         |SELECT qq.vec_id AS query_id,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10 AS recall_at_10
         |FROM embeddings qq LEFT JOIN h ON h.query_id = qq.vec_id
         |WHERE qq.vec_id < 10""".stripMargin
    },

    "q_embed_quantize" ->
      """SELECT vec_id, s AS scale,
        |  array_to_string(
        |    list_transform(v, x -> CAST(CAST(round(x * s) AS INTEGER) AS VARCHAR)),
        |    ',') AS qvec_str
        |FROM (
        |  SELECT vec_id, v, CASE WHEN m > 0 THEN 127.0 / m ELSE 1.0 END AS s
        |  FROM (
        |    SELECT vec_id,
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |      list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        |    FROM embeddings))""".stripMargin,

    "q_embed_outliers" ->
      s"""WITH e AS (
         |  SELECT label,
         |         unnest(range(1, len(embedding) + 1)) AS dim,
         |         unnest(list_transform(embedding,
         |           x -> CAST(trunc(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS v
         |  FROM embeddings),
         |c AS (
         |  SELECT label, array_agg(CAST(s AS DOUBLE) / n / 1000000.0 ORDER BY dim) AS centroid
         |  FROM (SELECT label, dim, sum(v) AS s, count(*) AS n FROM e GROUP BY label, dim)
         |  GROUP BY label)
         |SELECT vec_id, emb.label, ${SimilarityOps.Sql.cosine("emb2", "centroid")} AS cos_centroid
         |FROM (SELECT vec_id, label,
         |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb2
         |      FROM embeddings) emb
         |JOIN c ON emb.label = c.label""".stripMargin,

    // Independent formulation: explode to (label, dim, fixed-point value)
    // and group — same exact integer sums, so the double centroid division
    // matches bit-for-bit.
    "q_embed_centroids" ->
      """WITH e AS (
        |  SELECT label,
        |         unnest(range(1, len(embedding) + 1)) AS dim,
        |         unnest(list_transform(embedding,
        |           x -> CAST(trunc(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS v
        |  FROM embeddings)
        |SELECT label, dim, CAST(sum(v) AS BIGINT) AS sum_fp,
        |       count(*) AS n_vecs,
        |       CAST(sum(v) AS DOUBLE) / count(*) / 1000000.0 AS centroid
        |FROM e GROUP BY label, dim""".stripMargin,

    "q_embed_project" -> {
      val terms = (0 until 16).map { j =>
        val ws = (0 until 64).map(d => s"${SimilarityOps.planeWeight(j, d).toDouble}")
          .mkString("[", ", ", "]")
        val proj = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          s"list_transform(range(1, len(embedding) + 1), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * ($ws)[i])), (acc, v) -> acc + v)"
        s"$proj / 4.0 AS p$j"
      }
      s"SELECT vec_id,\n ${terms.mkString(",\n ")}\nFROM embeddings"
    },

    "q_sim_topk" -> {
      val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
      s"""SELECT query_id, rank, corpus_id, cosine FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS cosine,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cos DESC, c.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
         |  WHERE $cos IS NOT NULL)
         |WHERE rank <= 10""".stripMargin
    },

    // Stage 1 window rank on the 16-dim slice cosine keeps 50; stage 2
    // window rank on the full cosine over those candidates keeps 10 —
    // both folds the proven sequential form.
    "q_two_stage_rerank" -> {
      val cosF = SimilarityOps.Sql.cosine("q.embedding[1:16]", "c.embedding[1:16]")
      val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
      s"""WITH cand AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY $cosF DESC, c.vec_id) AS rnk
         |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10
         |    WHERE $cosF IS NOT NULL)
         |  WHERE rnk <= 50)
         |SELECT query_id, rank, corpus_id, cosine FROM (
         |  SELECT cand.query_id, cand.corpus_id, $cos AS cosine,
         |    row_number() OVER (PARTITION BY cand.query_id
         |      ORDER BY $cos DESC, cand.corpus_id) AS rank
         |  FROM cand
         |  JOIN embeddings q ON q.vec_id = cand.query_id
         |  JOIN embeddings c ON c.vec_id = cand.corpus_id
         |  WHERE $cos IS NOT NULL)
         |WHERE rank <= 10""".stripMargin
    },

    // Same proven window shape with the different-class residual.
    "q_hard_negatives" -> {
      val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
      s"""SELECT query_id, rank, corpus_id, cosine FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS cosine,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cos DESC, c.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings c
         |    ON q.vec_id < 10 AND c.vec_id % 4 <> q.vec_id % 4
         |  WHERE $cos IS NOT NULL)
         |WHERE rank <= 3""".stripMargin
    },

    // Window-rank formulation over the same lattice dots: max per
    // (corpus doc, query vector), sum per doc pair, rank per query doc.
    "q_maxsim_topk" -> {
      val dotF = "list_reduce(list_prepend(0::BIGINT, list_transform(" +
        "range(1, 65), i -> a.qv[i] * b.qv[i])), (x, y) -> x + y)"
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * ${graft.ops.LatticeKmeans.Scale} + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |a AS (SELECT vec_id // 4 AS qdoc, vec_id AS qvid, qv
         |      FROM q WHERE vec_id < 32),
         |b AS (SELECT vec_id // 4 AS cdoc, qv FROM q),
         |mx AS (SELECT a.qdoc, a.qvid, b.cdoc, max($dotF) AS m
         |       FROM a CROSS JOIN b GROUP BY 1, 2, 3),
         |sc AS (SELECT qdoc, cdoc, CAST(sum(m) AS BIGINT) AS score
         |       FROM mx GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qdoc
         |        ORDER BY score DESC, cdoc) AS rank FROM sc)
         |SELECT qdoc AS query_doc, CAST(rank AS INT) AS rank,
         |  cdoc AS corpus_doc, score
         |FROM r WHERE rank <= 5""".stripMargin
    },

    // Window-rank formulation of both neighborhoods over the same
    // integer-lattice dot products; the margin is the identical
    // cross-multiplied BIGINT predicate.
    "q_bitext_mine" -> {
      val dotF = "list_reduce(list_prepend(0::BIGINT, list_transform(" +
        "range(1, 65), i -> s.qv[i] * tt.qv[i])), (x, y) -> x + y)"
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * ${graft.ops.LatticeKmeans.Scale} + 0.5) AS BIGINT)) AS qv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |s AS (SELECT vec_id AS src_id, qv FROM q WHERE vec_id % 2 = 0),
         |tt AS (SELECT vec_id AS tgt_id, qv FROM q WHERE vec_id % 2 = 1),
         |sc AS (SELECT src_id, tgt_id, $dotF AS dot FROM s CROSS JOIN tt),
         |fr AS (SELECT *, row_number() OVER (PARTITION BY src_id
         |         ORDER BY dot DESC, tgt_id) AS rn FROM sc),
         |ss AS (SELECT src_id, CAST(sum(dot) AS BIGINT) AS sum_src
         |       FROM fr WHERE rn <= 4 GROUP BY 1),
         |rr AS (SELECT *, row_number() OVER (PARTITION BY tgt_id
         |         ORDER BY dot DESC, src_id) AS rn FROM sc),
         |st AS (SELECT tgt_id, CAST(sum(dot) AS BIGINT) AS sum_tgt
         |       FROM rr WHERE rn <= 4 GROUP BY 1)
         |SELECT b.src_id, b.tgt_id, b.dot, ss.sum_src, st.sum_tgt
         |FROM (SELECT src_id, tgt_id, dot FROM fr WHERE rn = 1) b
         |JOIN ss USING (src_id)
         |JOIN st ON st.tgt_id = b.tgt_id
         |WHERE 8 * b.dot * 20 > 21 * (ss.sum_src + st.sum_tgt)""".stripMargin
    },

    // independent vote formulation: window rank for the top-7, group
    // count per label, winner by (votes DESC, label ASC) — vs the Spark
    // side's encoded-id partial aggregate + row-local array vote
    "q_knn_classify" -> {
      val cos = SimilarityOps.Sql.cosine("c.embedding", "l.embedding")
      s"""WITH l AS (SELECT vec_id, embedding, label FROM embeddings
         |           WHERE vec_id % 5 = 0),
         |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0),
         |scored AS (
         |  SELECT c.vec_id AS vec_id, l.vec_id AS lid, l.label AS label,
         |    $cos AS cosine,
         |    row_number() OVER (PARTITION BY c.vec_id
         |      ORDER BY $cos DESC, l.vec_id) AS rank
         |  FROM c CROSS JOIN l
         |  WHERE $cos IS NOT NULL),
         |topk AS (SELECT * FROM scored WHERE rank <= 7),
         |vote AS (SELECT vec_id, label, count(*) AS v
         |         FROM topk GROUP BY vec_id, label),
         |win AS (SELECT vec_id, label, v,
         |          row_number() OVER (PARTITION BY vec_id
         |            ORDER BY v DESC, label) AS r
         |        FROM vote)
         |SELECT w.vec_id, CAST(w.label AS INT) AS pred_label,
         |  CAST(w.v AS INT) AS votes, t.cosine AS best_cosine,
         |  CAST(t.lid AS BIGINT) AS nn_id
         |FROM win w JOIN topk t ON w.vec_id = t.vec_id AND t.rank = 1
         |WHERE w.r = 1""".stripMargin
    },

    "q_sim_lsh_buckets" ->
      s"""SELECT vec_id,
         | ${SimilarityOps.Sql.lshBucket("embedding", 8, 64)} AS bucket
         |FROM embeddings""".stripMargin,

    // q_sim_topk's cosine/rank formulation restricted to same-bucket pairs
    // (the bucket expression is the literal-weight SQL q_sim_lsh_buckets
    // proves against the fused Spark expression every round).
    "q_sim_lsh_topk" -> {
      val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
      s"""WITH bk AS (
         |  SELECT vec_id, embedding,
         |    ${SimilarityOps.Sql.lshBucket("embedding", 8, 64)} AS bucket
         |  FROM embeddings)
         |SELECT query_id, rank, corpus_id, cosine FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS cosine,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cos DESC, c.vec_id) AS rank
         |  FROM bk q JOIN bk c ON q.vec_id < 10 AND q.bucket = c.bucket
         |  WHERE $cos IS NOT NULL)
         |WHERE rank <= 10""".stripMargin
    },

    "q_embed_neardup" -> {
      val cos = SimilarityOps.Sql.cosine("a.embedding", "b.embedding")
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cos AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE $cos >= 0.35""".stripMargin
    },

    "q_embed_neardup_lsh" -> {
      val cos = SimilarityOps.Sql.cosine("a.embedding", "b.embedding")
      val tables = 16
      val planes = 4
      val bucketCols = (0 until tables)
        .map(tt => s"${SimilarityOps.Sql.lshBucket("embedding", planes, 64, tt * planes)} AS b$tt")
        .mkString(",\n ")
      val anyShared = (0 until tables).map(tt => s"a.b$tt = b.b$tt").mkString(" OR ")
      s"""WITH bk AS (
         |  SELECT vec_id, embedding,
         | $bucketCols
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cos AS cosine
         |FROM bk a JOIN bk b ON a.vec_id < b.vec_id AND ($anyShared)
         |WHERE $cos >= 0.35""".stripMargin
    },

    "q_multimodal_features" -> {
      // hex nibble -> int, evaluation-order-stable in both engines
      def byteAt(i: Int): String = {
        def nib(p: Int) = s"(strpos('0123456789abcdef', substring(h, $p, 1)) - 1)"
        s"(${nib(2 * i + 1)} * 16 + ${nib(2 * i + 2)})"
      }
      s"""SELECT media_id, modality, n_bytes, sha_hex,
         | CAST(64 + ${byteAt(0)} * 16 + ${byteAt(1)} // 16 AS INTEGER) AS width,
         | CAST(64 + (${byteAt(1)} % 16) * 256 + ${byteAt(2)} AS INTEGER) AS height,
         | CAST(${byteAt(3)} AS DOUBLE) / 255.0 AS mean_lum
         |FROM (
         |  SELECT doc_id AS media_id,
         |    (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |    sha256(text) AS h, sha256(text) AS sha_hex
         |  FROM documents)""".stripMargin
    },

    // NOTE: the oracle slices by CHARACTER while the engine slices the
    // UTF-8 payload by BYTE — equivalent only for ASCII corpora (these
    // fixtures are; DuckDB's sha256 cannot digest BLOBs, so a byte-exact
    // oracle is not expressible).
    "q_multimodal_frames" ->
      """SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        | CAST(octet_length(encode(substring(text, CAST(frame_idx*32+1 AS INTEGER), 32))) AS BIGINT) AS n_bytes,
        | sha256(substring(text, CAST(frame_idx*32+1 AS INTEGER), 32)) AS frame_sha
        |FROM (
        |  SELECT doc_id AS media_id, text,
        |    unnest(range(0, CAST(ceil(length(text)/32.0) AS BIGINT))) AS frame_idx
        |  FROM documents)
        |WHERE frame_idx % 2 = 0""".stripMargin,

    // Recursive-CTE replay of the greedy MMR loop: one selected row per
    // iteration, argmax by (0.7*rel - 0.3*max-sim-to-picked DESC, id) —
    // identical float ops to the driver-side fold; cosines are the
    // proven sequential-fold formulation (q_sim_topk).
    "q_mmr_rerank" -> {
      val c = SimilarityOps.Sql.cosine("e.embedding", "q.q_emb")
      val pc = SimilarityOps.Sql.cosine("a.embedding", "b.embedding")
      s"""WITH RECURSIVE
         |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |cand0 AS (
         |  SELECT e.vec_id, e.embedding, $c AS rel,
         |    row_number() OVER (ORDER BY $c DESC, e.vec_id) AS rn
         |  FROM embeddings e, q WHERE e.vec_id > 0 AND $c IS NOT NULL),
         |cand AS (SELECT vec_id, embedding, rel FROM cand0 WHERE rn <= 12),
         |pair AS (SELECT a.vec_id AS ia, b.vec_id AS ib, $pc AS sim
         |         FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |sel(rank, corpus_id, relevance, mmr_score, picked) AS (
         |  (SELECT CAST(1 AS BIGINT), vec_id, rel, 0.7*rel - 0.3*0.0, [vec_id]
         |   FROM cand ORDER BY 0.7*rel - 0.3*0.0 DESC, vec_id LIMIT 1)
         |  UNION ALL
         |  (SELECT * FROM (
         |     SELECT s.rank + 1 AS rank, c.vec_id AS corpus_id,
         |       c.rel AS relevance,
         |       0.7*c.rel - 0.3*coalesce((SELECT max(p.sim) FROM pair p
         |         WHERE p.ia = c.vec_id AND list_contains(s.picked, p.ib)), 0.0)
         |         AS mmr_score,
         |       list_append(s.picked, c.vec_id) AS picked
         |     FROM sel s JOIN cand c ON NOT list_contains(s.picked, c.vec_id)
         |     WHERE s.rank < 5)
         |   ORDER BY mmr_score DESC, corpus_id LIMIT 1))
         |SELECT rank, corpus_id, relevance, mmr_score FROM sel""".stripMargin
    },

    // Both legs reuse proven formulations (the BM25 rational arithmetic
    // of q_bm25_search; the sequential-fold cosine of q_sim_topk); the
    // fused score 1.0/(60+r) + 1.0/(60+r) is the same two IEEE divisions
    // and one add on both engines.
    "q_hybrid_rrf" -> {
      val c = SimilarityOps.Sql.cosine("e.embedding", "q.q_emb")
      s"""WITH d AS (
         |  SELECT doc_id,
         |         CAST(len(toks) AS DOUBLE) AS dl,
         |         CAST(len(list_filter(toks, t -> t = 'vector')) AS DOUBLE) AS tf0,
         |         CAST(len(list_filter(toks, t -> t = 'customer')) AS DOUBLE) AS tf1,
         |         CAST(len(list_filter(toks, t -> t = 'stream')) AS DOUBLE) AS tf2
         |  FROM (SELECT doc_id, ${S.tokens("lower(text)")} AS toks FROM documents)),
         |st AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl,
         |         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
         |         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
         |         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
         |  FROM d),
         |bm0 AS (
         |  SELECT doc_id, score FROM (
         |    SELECT doc_id,
         |      ((n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.25) / (tf0 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |    + ((n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.25) / (tf1 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |    + ((n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.25) / (tf2 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |        AS score
         |    FROM d, st)
         |  WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20),
         |bm AS (SELECT doc_id, CAST(row_number() OVER (
         |         ORDER BY score DESC, doc_id) AS INTEGER) AS r_text FROM bm0),
         |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |v0 AS (
         |  SELECT e.vec_id AS doc_id, $c AS cosine
         |  FROM embeddings e, q WHERE e.vec_id > 0 AND $c IS NOT NULL
         |  ORDER BY $c DESC, e.vec_id LIMIT 20),
         |v AS (SELECT doc_id, CAST(row_number() OVER (
         |        ORDER BY cosine DESC, doc_id) AS INTEGER) AS r_vec FROM v0)
         |SELECT coalesce(bm.doc_id, v.doc_id) AS doc_id,
         |  coalesce(CAST(1.0 AS DOUBLE) / (60 + r_text), CAST(0.0 AS DOUBLE))
         |    + coalesce(CAST(1.0 AS DOUBLE) / (60 + r_vec), CAST(0.0 AS DOUBLE))
         |    AS rrf,
         |  r_text, r_vec
         |FROM bm FULL OUTER JOIN v ON bm.doc_id = v.doc_id
         |ORDER BY rrf DESC, coalesce(bm.doc_id, v.doc_id) LIMIT 10""".stripMargin
    },
  )
}
