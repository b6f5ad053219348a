package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, SurvivalOps, TextOps}
import graft.streaming.{EventOps, IngestDedupStream}

import QueryShared._

/** Statistics and evaluation: experiment tests, rank stats, estimators, small models.
  *
  * Domain slice of the gated catalog (split out of PipelineQueries
  * in round 9); assembled and exposed by [[PipelineQueries]].
  */
private[queries] object StatsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Ranking-quality eval: nDCG@10 of the BM25 ranking against binary
    // contains-all-terms relevance. The 1/log2(rank+1) gains are
    // pre-rounded ×10⁶ literals (the q_benford no-libm discipline), so
    // DCG and IDCG are exact longs with ONE closing division. The rank
    // window runs on ≤10 heap-bounded rows (the q_hybrid_rrf argument);
    // the final cross is two 1-row eval frames.
    "q_ndcg" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val terms = Seq("vector", "customer", "stream")
      val wArr = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
        356207L, 333333L, 315465L, 301030L, 289065L)
      val idcgPrefix = wArr.scanLeft(0L)(_ + _).tail
      val top = SearchOps
        .bm25TopK(docs, col("doc_id"), col("text"), terms, k = 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
      val rel = docs.select(col("doc_id"),
        terms.map(tm =>
            array_contains(TextOps.tokens(lower(col("text"))), tm))
          .reduce(_ && _).cast("long").as("rel"))
      val gain = (1 to 10).foldLeft(lit(0L)) { (acc, i) =>
        when(col("rank") === i, wArr(i - 1)).otherwise(acc)
      }
      val dcg = top.join(rel, "doc_id")
        .agg(coalesce(sum(col("rel") * gain), lit(0L)).as("dcg_micro"))
      val nRel = rel.agg(coalesce(sum(col("rel")), lit(0L)).as("n_rel"))
      val idcg = (1 to 10).foldLeft(lit(0L)) { (acc, i) =>
        when(col("n_rel") >= i, idcgPrefix(i - 1)).otherwise(acc)
      }
      nRel.crossJoin(dcg)
        .select(col("n_rel"), col("dcg_micro"), idcg.as("idcg_micro"),
          when(idcg > 0, col("dcg_micro").cast("double") / idcg).as("ndcg"))
    }),

    // Two-proportion z-test over a deterministic hash-split experiment:
    // arms from the portable affine hash of user_id (no assignment table),
    // conversion = "purchases >= views" per user, pooled z in a fixed
    // IEEE chain. Two map-side-combined aggregates; one summary row.
    "q_ab_test" -> ((s, dir) => {
      val units = RefQueries.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"))
      ExperimentOps.abTest(
        units, col("user_id"), (col("np") >= col("nv")).cast("long"))
    }),

    // Minimum detectable effect at the current traffic — the power
    // readout that makes a non-significant q_ab_test interpretable (no
    // effect, or not enough users?). Same unit fixture and exact counts
    // as q_ab_test; one fixed sqrt chain against the shared
    // (z_alpha/2 + z_beta) literal.
    "q_power_mde" -> ((s, dir) => {
      val units = RefQueries.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"))
      ExperimentOps.powerMde(
        units, col("user_id"), (col("np") >= col("nv")).cast("long"))
    }),

    // Sample-ratio-mismatch gate: arm counts vs the designed 50/50 split,
    // chi2 = (n_a - n_b)^2 / n exact-integer until one closing division.
    // Run BEFORE reading any experiment metric.
    "q_srm" -> ((s, dir) =>
      ExperimentOps.srmCheck(
        RefQueries.events(s, dir).select(col("user_id")).distinct(),
        col("user_id"))),

    // CUPED variance reduction: pre-period activity (first half of the
    // month) as the covariate for the post-period purchase count. One
    // user-grain aggregate + ONE moments pass (12 exact-long sums in a
    // single map-side-combined aggregate); θ and the adjusted means are
    // integer moment identities with one closing double division each.
    "q_cuped" -> ((s, dir) => {
      val e = RefQueries.events(s, dir)
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val units = e.groupBy(col("user_id")).agg(
        sum(when(col("ts") < cut, 1L).otherwise(0L)).as("x"),
        sum(when(col("ts") >= cut && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("y"))
      ExperimentOps.cuped(units, col("user_id"), col("x"), col("y"))
    }),

    // Did the language mix shift per source? Per-cell chi-square terms
    // as exact integer rationals with one closing division each (a
    // double Σ over cells would be reduction-order-dependent; summing
    // is the consumer's one cheap step).
    "q_chisq" -> ((s, dir) =>
      ProfileOps.chiSquareCells(
        t(s, dir, "documents"), col("source"), col("lang"))
        .select(col("a").as("source"), col("b").as("lang"),
          col("o"), col("e"), col("chi_term"))),

    // Cramér's V on order priority × status — the [0,1] dependence
    // scalar q_chisq's per-cell terms can't give: per-cell doubles are
    // engine-identical, the cross-cell fold rides the exact ×10⁶ micro
    // grid (floor of an exact IEEE multiply), √ is correctly rounded.
    "q_cramers_v" -> ((s, dir) =>
      ProfileOps.cramersV(
        t(s, dir, "orders"), col("o_orderpriority"), col("o_orderstatus"))),

    // Mutual information source↔lang in bits, with marginal entropies
    // and normalized MI — exact Log2Fixed sums over the cell frame,
    // three fixed closing chains.
    "q_mutual_info" -> ((s, dir) =>
      ProfileOps.mutualInfo(
        t(s, dir, "documents"), col("source"), col("lang"))),

    // Weight-of-evidence + information value of source against the
    // lang='en' label — the risk-scoring categorical encode: +1 Laplace
    // cells, base-2 fixed-point WOE, IV folded as exact integers over
    // the shared smoothed denominator.
    "q_woe_iv" -> ((s, dir) =>
      ProfileOps.woeIv(
        t(s, dir, "documents"), col("source"), col("lang") === "en")),

    // Byte-concentration per source: exact rank-formulation Gini in
    // int64 with one closing division.
    "q_gini" -> ((s, dir) =>
      ProfileOps.giniByGroup(
        t(s, dir, "documents"), col("source"), col("n_chars"))
        .select(col("group").as("source"), col("n"), col("total"),
          col("gini"))),

    // Quantity-revenue coupling per return flag: exact integer power
    // sums, then the fixed double chain (dollars, not cents — the
    // Σy² headroom note on corrByGroup).
    "q_correlation" -> ((s, dir) =>
      ProfileOps.corrByGroup(
        t(s, dir, "lineitem"), col("l_returnflag"),
        col("l_quantity"), round(col("l_extendedprice")).cast("long"))
        .select(col("group").as("l_returnflag"), col("n"), col("r"))),

    // Monotone quantity-revenue coupling: Spearman over the same pair
    // as q_correlation — centered doubled midranks on the two-phase
    // prefix scan, decimal-128 moment sums, one closing chain.
    "q_spearman" -> ((s, dir) =>
      ProfileOps.spearman(
        t(s, dir, "lineitem"),
        col("l_quantity"), round(col("l_extendedprice")).cast("long"))),

    // Distinct aggregation (exact).
    "q_count_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))),

    // Exact distributed percentiles over fixed-point cents (integer
    // endpoints keep the interpolation arithmetic engine-exact); the
    // sketch-based scale path is percentile_approx (error-bounded in
    // SamplingOpsSpec — exact percentile sorts per group, approx merges
    // constant-size sketches).
    "q_quantiles" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * 100).cast("long")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        // ONE percentile buffer per group evaluating all three points
        // (three separate calls would hold three copies of every value)
        .agg(percentile(cents, array(lit(0.5), lit(0.9), lit(0.99))).as("ps"))
        .select(col("l_returnflag"),
          (element_at(col("ps"), 1) / 100).as("p50"),
          (element_at(col("ps"), 2) / 100).as("p90"),
          (element_at(col("ps"), 3) / 100).as("p99"))
    }),

    // The percentile SKETCH (KLL-style: constant-size mergeable buffers,
    // the 100 TB path where exact percentile would sort every group)
    // gated with an error-bound oracle, like q_approx_distinct: the
    // approx p90 must land inside the exact [p85, p95] rank window —
    // orders of magnitude looser than the sketch's n/accuracy rank
    // guarantee at accuracy=10000, so the flag is 1 iff the sketch
    // behaves. Exact legs ride the proven fixed-point-cents arithmetic
    // (q_quantiles).
    "q_approx_quantiles" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * 100).cast("long")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(cents, lit(0.9), lit(10000)).as("ap90"),
          percentile(cents, array(lit(0.85), lit(0.9), lit(0.95))).as("ps"))
        .select(col("l_returnflag"),
          (element_at(col("ps"), 2) / 100).as("p90"),
          (col("ap90") >= element_at(col("ps"), 1) &&
            col("ap90") <= element_at(col("ps"), 3))
            .cast("int").as("within_rank_window"))
    }),

    // HLL++ sketch distinct (the 100 TB path where exact per-group
    // count-distinct would shuffle every distinct value). The sketch
    // value itself is engine-specific, but its ERROR BOUND is not: the
    // gated output carries the exact distinct count plus a within-5%
    // flag for the rsd=0.02 sketch (3-sigma margin at 4096 registers), and the oracle asserts the flag is 1
    // on every group — a hash-matched error-bound oracle. (The exact
    // leg exists only to express that oracle; the production 100 TB call
    // is the sketch alone.)
    "q_approx_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"),
          countDistinct(col("l_partkey")).as("nd_parts"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("n_rows"), col("nd_parts"),
          (abs(col("approx") - col("nd_parts")) <=
            col("nd_parts") * 0.05).cast("int").as("within_5pct"))),

    // Exact distinct users per event type via the fixed-bitmap aggregate
    // — the exact complement of q_approx_distinct's HLL: for a BOUNDED
    // id domain the shuffle moves partitions x groups x maxId/8 bytes of
    // bitmap (merge = word-wise OR, layout-invariant by construction)
    // instead of re-shuffling every distinct id the way count(DISTINCT)
    // does. The oracle IS count(DISTINCT): hash equality proves the
    // bitmap path exact.
    "q_bitmap_distinct" -> ((s, dir) =>
      RefQueries.events(s, dir)
        .groupBy(col("event_type"))
        .agg(graft.agg.BitmapDistinct
          .bitmapDistinct(col("user_id"), 1L << 20).as("n_users"))),

    // Equi-depth (quantile-boundary) histogram: the reference's A6
    // histograms bin over KNOWN fixed edges; feature pipelines bucket by
    // QUANTILES so every bucket carries equal mass. The three boundaries
    // are ONE percentile aggregate (driver-collected — bounded at 3
    // doubles, the IvfOps centroid precedent) re-entering the plan as
    // literals, so bucket assignment is a row-local codegen'd comparison
    // chain and the counts are one map-side-combined aggregate. Exact
    // interpolated percentiles parity with quantile_cont (q_quantiles).
    "q_equidepth" -> ((s, dir) => {
      val src = t(s, dir, "orders")
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      val eRow = src.agg(percentile(col("cents"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("e"))
        .collect()(0)
      // empty input -> NULL percentile array; the edges are then unused
      // (the aggregate below emits zero rows) but must still be literals
      val e = if (eRow.isNullAt(0)) Seq(0.0, 0.0, 0.0)
        else eRow.getSeq[Double](0)
      src
        .withColumn("bucket",
          when(col("cents") < e(0), 0)
            .when(col("cents") < e(1), 1)
            .when(col("cents") < e(2), 2).otherwise(3))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"),
          max(col("cents")).as("hi"))
    }),

    // ------------------------------------------- estimation & evaluation

    // Deterministic HyperLogLog: the register table itself (≤256 rows no
    // matter the corpus — the sketch STATE is the gated artifact, unlike
    // approx_count_distinct whose HLL++ buffer is engine-private). One
    // register-sized shuffle; rho rides the integer Log2Fixed msb, never
    // float log; the oracle regenerates every register from the splitmix
    // replay in HUGEINT SQL.
    "q_hll_registers" -> ((s, dir) =>
      EstimatorOps.hllRegisters(
        t(s, dir, "orders"), col("o_custkey"), salt = 77)),

    // The folded HLL estimate next to the exact distinct count: the
    // harmonic sum is exact int64 (rho clipped at RhoCap — see
    // EstimatorOps), the estimate ONE correctly-rounded IEEE division,
    // and the ±20% sanity flag uses only exact-representable factors.
    // The two 1-row frames cross at the end (q_kmv_join_card shape).
    "q_hll_estimate" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val est = EstimatorOps.hllEstimate(
        EstimatorOps.hllRegisters(orders, col("o_custkey"), salt = 77))
      val exact = orders.agg(countDistinct(col("o_custkey")).as("n_exact"))
      est.crossJoin(exact)
        .withColumn("within20",
          (col("est_raw") * lit(5.0) >= col("n_exact").cast("double") * lit(4.0) &&
            col("est_raw") * lit(5.0) <= col("n_exact").cast("double") * lit(6.0))
            .cast("int"))
    }),

    // Poisson bootstrap CI of the mean order value: 64 deterministic
    // splitmix-keyed Poisson(1) replicates folded map-side into 65
    // partial-agg groups (the distributed bootstrap — no per-replicate
    // resample shuffle), order statistics on the replicate-sized frame.
    // Ranks 2/63 of 64 bracket a ~94% interval.
    "q_bootstrap_ci" -> ((s, dir) =>
      EstimatorOps.poissonBootstrapCi(t(s, dir, "orders"),
        col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"),
        reps = 64, loRank = 2, hiRank = 63, salt = 421)),

    // Split-conformal 90% prediction interval for order value under the
    // per-priority mean model: q_hat is the exact ceil((n+1)·0.9)-th
    // smallest calibration residual via the three-pass bounded selection
    // (EstimatorOps.kthSmallest — no global sort), coverage checked on
    // the held-out parity split.
    "q_conformal" -> ((s, dir) =>
      EstimatorOps.splitConformal(t(s, dir, "orders"),
        col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long"),
        col("o_orderkey") % 2 === 0)),

    // Mean-reciprocal-rank retrieval eval over eight frozen term queries:
    // rank by exact term frequency (doc_id tie-break), relevance = term
    // within the first three tokens. The rank window shuffles only
    // term-matching rows (tf > 0), partitioned by term; gains are the
    // pre-rounded ×10⁶ literals (q_ndcg discipline). The literal 8-term
    // frame left-joins the per-term aggregate so termless queries keep
    // their rr_micro = 0 row.
    "q_mrr" -> ((s, dir) => {
      val firstRel = mrrCandidates(s, dir)
        .withColumn("rank", mrrRank)
        .filter(col("rank") <= 10 && col("rel"))
        .groupBy("term")
        .agg(min(col("rank")).cast("long").as("first_rel_rank"))
      val rr = MrrGainMicro.zipWithIndex.foldLeft(lit(0L)) {
        case (els, (g, i)) =>
          when(col("first_rel_rank") === (i + 1), lit(g)).otherwise(els)
      }
      mrrTermsDf(s).join(firstRel, Seq("term"), "left")
        .select(col("term"), col("first_rel_rank"), rr.as("rr_micro"))
    }),

    // Mean-average-precision companion to q_mrr on the SAME candidate
    // frame: AP@10 in exact micro-integers — running relevant-hit counts
    // over the rank window (term-partitioned, ≤10 rows after the cut),
    // precision@k as `hits×10⁶ div k`, normalized by min(R, 10) with R
    // the term's corpus-wide relevant count. Every division is integer;
    // termless / relevant-free queries keep their zero row.
    "q_map_eval" -> ((s, dir) => {
      val cand = mrrCandidates(s, dir)
      val apNum = cand
        .withColumn("rank", mrrRank)
        .filter(col("rank") <= 10)
        .withColumn("hits", sum(col("rel").cast("long")).over(
          Window.partitionBy(col("term")).orderBy(col("rank"))))
        .filter(col("rel"))
        .withColumn("prec_micro", expr("(hits * 1000000) div rank"))
        .groupBy("term").agg(sum(col("prec_micro")).as("ap_num"))
      val nRel = cand.filter(col("rel"))
        .groupBy("term").agg(count(lit(1)).as("n_rel"))
      mrrTermsDf(s)
        .join(nRel, Seq("term"), "left")
        .join(apNum, Seq("term"), "left")
        .select(col("term"),
          coalesce(col("n_rel"), lit(0L)).as("n_rel"),
          coalesce(expr("ap_num div least(n_rel, 10)"), lit(0L))
            .as("ap_micro"))
    }),

    // HLL set algebra over the order-status customer sets: per-status
    // registers in ONE corpus pass, the union's registers by max-merge
    // in ONE idx-keyed (≤256-group) shuffle, estimates for A='O', B='F',
    // A∪B, and the inclusion-exclusion intersection — next to the exact
    // counts from a single custkey-keyed pass. The two 1-row frames
    // (sketch summary, exact summary) cross at the end.
    "q_hll_sources" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("O", "F"))
      val byIdx = EstimatorOps
        .hllRegistersBy(o, col("o_orderstatus"), col("o_custkey"), salt = 77)
        .groupBy("idx")
        .agg(max(col("rho")).as("rho_u"),
          max(when(col("g") === "O", col("rho"))).as("rho_a"),
          max(when(col("g") === "F", col("rho"))).as("rho_b"))
      def sp(c: String) = coalesce(sum(expr(
        s"shiftleft(CAST(1 AS BIGINT), CAST(41 - least($c, 41) AS INT))")),
        lit(0L))
      val zm = 1L << EstimatorOps.RhoCap
      def est(spc: Column, present: Column) =
        lit(EstimatorOps.HllAlphaNum) /
          (spc + (lit(256L) - present) * lit(zm)).cast("double")
      val sk = byIdx.agg(
        est(sp("rho_a"), count(col("rho_a"))).as("est_a"),
        est(sp("rho_b"), count(col("rho_b"))).as("est_b"),
        est(sp("rho_u"), count(col("rho_u"))).as("est_union"))
        .withColumn("est_intersect",
          (col("est_a") + col("est_b")) - col("est_union"))
      val ex = o.groupBy(col("o_custkey"))
        .agg(max((col("o_orderstatus") === "O").cast("long")).as("ia"),
          max((col("o_orderstatus") === "F").cast("long")).as("ib"))
        .agg(sum(col("ia")).as("n_a"), sum(col("ib")).as("n_b"),
          count(lit(1)).as("n_union"),
          sum(col("ia") * col("ib")).as("n_intersect"))
      sk.crossJoin(ex)
    }),

    // ------------------------------------------------ modeling & inference

    // Closed-form OLS trend of the daily mean event value per type:
    // "regression is five sums" — ONE map-side-combined moment pass over
    // the fact, then per-group column algebra. Slope/intercept in exact
    // micro fixed point (toward-zero divisions; the oracle sign-splits);
    // x anchors to the table's literal epoch so every moment product
    // stays far inside int64.
    "q_ols_trend" -> ((s, dir) =>
      ModelOps.olsTrend(trendDaily(s, dir),
        col("g"), col("x"), col("y"))
        .withColumnRenamed("g", "event_type")),

    // Robust twin of q_ols_trend: Mann-Kendall's S plus the Theil-Sen
    // lower-median slope over the same daily series. Pairs are emitted
    // row-locally from each group's calendar-bounded sorted array (never
    // a self-join); the median window partitions by group over ≤ 31²
    // pair rows.
    "q_theilsen" -> ((s, dir) =>
      ModelOps.theilSen(trendDaily(s, dir),
        col("g"), col("x"), col("y"))
        .withColumnRenamed("g", "event_type")),

    // Hashed multinomial Naive Bayes lang classifier: train on even
    // doc_ids, score the odd half, report the confusion matrix. The
    // model is the 64-bucket × classes count grid (hashing trick —
    // vocabulary-independent, broadcast); scores are exact fixed-point
    // log-likelihoods on Log2Fixed, so the whole fit+predict replays in
    // SQL.
    "q_nb_classify" -> ((s, dir) =>
      ModelOps.naiveBayesConfusion(t(s, dir, "documents"),
        col("doc_id"), col("lang"), col("text"),
        col("doc_id") % 2 === 0, buckets = 64)),

    // Bradley-Terry strength leaderboard (the LLM-arena aggregation)
    // over deterministic length battles: id-contiguous buckets of 8
    // docs, cross-source pairs inside each bucket, longer text wins.
    // Three unrolled fixed-point MM rounds on the players²-bounded win
    // table; every division nonnegative toward-zero (HITS convention).
    "q_bt_ratings" -> ((s, dir) =>
      ModelOps.bradleyTerry(
        ModelOps.lengthBattles(t(s, dir, "documents"),
          col("doc_id"), col("source"), col("n_chars"), bucketWidth = 8),
        iters = 3)),

    // Mann-Whitney U rank-sum test (BUILDING vs MACHINERY account
    // balances): the nonparametric two-sample complement to q_ab_test.
    // Doubled midranks keep ties exact-integer; the z² readout closes
    // in a fixed-order double chain against the shared 1.96² literal.
    "q_mann_whitney" -> ((s, dir) =>
      ExperimentOps.mannWhitneyU(
        t(s, dir, "customer").filter(
          col("c_mktsegment").isin("BUILDING", "MACHINERY")),
        col("c_mktsegment") === "BUILDING",
        round(col("c_acctbal") * 100).cast("long"))),

    // Two-sample Kolmogorov-Smirnov drift gate (open vs finished order
    // values): the cross-multiplied CDF-gap maximum is exact-integer at
    // every distinct value; the same value-keyed-aggregate + bounded-
    // window shape as q_mann_whitney — KS catches shape/spread drift
    // the rank test is blind to.
    "q_ks_test" -> ((s, dir) =>
      ExperimentOps.ksTest(
        t(s, dir, "orders").filter(col("o_orderstatus").isin("O", "F")),
        col("o_orderstatus") === "O",
        round(col("o_totalprice") * 100).cast("long"))),

    // ROC AUC of the lexicon quality classifier against the lang='en'
    // label — AUC as the tie-aware Mann-Whitney statistic (u2/(2·n₊·n₋)),
    // exact-integer until one closing division; no corpus sort.
    "q_auc" -> ((s, dir) =>
      ExperimentOps.rocAuc(
        t(s, dir, "documents").filter(col("lang").isNotNull),
        col("lang") === "en",
        TextOps.classifierMargin(col("text"), qualityLexicon))),

    // Reliability bins + expected calibration error of the same lexicon
    // classifier (margin squashed onto the ×10⁶ grid) — ranking can be
    // perfect (q_auc) while confidence lies; the ECE numerator
    // telescopes to an exact-long sum, one closing division.
    "q_calibration_ece" -> ((s, dir) =>
      ExperimentOps.calibrationEce(
        t(s, dir, "documents").filter(col("lang").isNotNull),
        col("lang") === "en",
        TextOps.classifierMargin(col("text"), qualityLexicon) * 100000L +
          500000L)),

    // Isotonic (PAV) calibration of the same bins — the fix for what
    // ECE measures, with NO iterative pooling: the minimax closed form
    // runs as bounded bin-frame self-joins, and floor commutes with
    // max/min so the ×10⁶ intdiv segment rates give exactly
    // floor(PAV·10⁶) — fully oracled, float-free.
    "q_isotonic_fit" -> ((s, dir) =>
      ExperimentOps.isotonicCalibration(
        t(s, dir, "documents").filter(col("lang").isNotNull),
        col("lang") === "en",
        TextOps.classifierMargin(col("text"), qualityLexicon) * 100000L +
          500000L)),

    // Welch's unequal-variance t on the same BUILDING/MACHINERY balance
    // fixture as q_mann_whitney — the parametric continuous-metric
    // complement: exact-long (n, Σx, Σx²) per arm, variance closed as
    // the overflow-safe fixed IEEE chain, Welch-Satterthwaite df, the
    // shared 1.96² normal cut.
    "q_welch_t" -> ((s, dir) =>
      ExperimentOps.welchT(
        t(s, dir, "customer").filter(
          col("c_mktsegment").isin("BUILDING", "MACHINERY")),
        col("c_mktsegment") === "BUILDING",
        round(col("c_acctbal") * 100).cast("long"))),

    // One-way ANOVA F across ALL FIVE market segments — the k-arm
    // omnibus "do the arms differ at all?" upstream of any pairwise
    // test: per-segment (n, Σx, Σx²) pivoted into ONE 1-row aggregate
    // (the segment list is a query literal), sums of squares as fixed
    // left-assoc IEEE chains over exact longs.
    "q_anova_f" -> ((s, dir) =>
      ExperimentOps.anovaF(
        t(s, dir, "customer"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"), MktSegments)),

    // Brown-Forsythe spread-homogeneity gate on the same five segments:
    // exact grouped lower medians (grouped two-phase prefix scan), then
    // the ANOVA F over |v - median| deviations — decides whether
    // pooled-variance readouts are admissible segment-wide.
    "q_levene" -> ((s, dir) =>
      ProfileOps.brownForsythe(
        t(s, dir, "customer"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"), MktSegments)),

    // Cliff's delta effect size on open-vs-finished order values — the
    // magnitude readout q_mann_whitney's significance bit can't give at
    // corpus n (where everything is significant): exact dominance
    // difference from the doubled-rank machinery, one closing division,
    // Romano-threshold magnitude label.
    "q_cliffs_delta" -> ((s, dir) =>
      ExperimentOps.cliffsDelta(
        t(s, dir, "orders").filter(col("o_orderstatus").isin("O", "F")),
        col("o_orderstatus") === "O",
        round(col("o_totalprice") * 100).cast("long"))),

    // Benjamini-Hochberg step-up FDR over the (source, lang) hypothesis
    // family — p-values stand in as the deterministic portable hash
    // (the CONTROL procedure is the operator under test; upstream tests
    // produce real p_micro in production). Pure exact-long step-up:
    // p_micro·m <= rank·50000.
    "q_fdr_bh" -> ((s, dir) => {
      val hyp = t(s, dir, "documents")
        .filter(col("lang").isNotNull && col("source").isNotNull)
        .select(concat(col("source"), lit("|"), col("lang")).as("h"))
        .distinct()
      ExperimentOps.bhFdr(hyp, col("h"),
        DedupOps.portableShingleHash(col("h")) % 1000000L + 1L)
    }),

    // Monte-Carlo permutation test on open-vs-finished order values:
    // 64 deterministic splitmix relabelings folded map-side into 64
    // partial-agg groups (the distributed-bootstrap shape), add-one
    // p-value as an exact integer — the significance check that needs
    // NO variance formula next to q_ab_test / q_mann_whitney.
    "q_permutation_test" -> ((s, dir) =>
      ExperimentOps.permutationTest(
        t(s, dir, "orders").filter(col("o_orderstatus").isin("O", "F")),
        col("o_orderkey"), col("o_orderstatus") === "O",
        round(col("o_totalprice") * 100).cast("long"))),

    // Post-stratified A/B readout (variance reduction by a known
    // covariate): per-stratum arm means + population weights, every
    // number a single division of exact longs — the scalar weighted
    // effect is one consumer-side fold, so no cross-stratum double
    // summation order needs pinning.
    "q_stratified_effect" -> ((s, dir) =>
      ExperimentOps.stratifiedEffect(
        t(s, dir, "orders"), col("o_custkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long"))),

    // Exact weighted median (quantity-weighted price cents per return
    // flag) — pure selection, no interpolation: the smallest value whose
    // inclusive cumulative weight reaches half the group total. The
    // cumulative weights ride the GROUPED two-phase bucketed prefix scan
    // (partitioned by group AND bucket — no SinglePartition window
    // anywhere in the plan, pinned in QueryPlanSpec).
    "q_weighted_median" -> ((s, dir) =>
      ProfileOps.weightedMedianByGroup(
        t(s, dir, "lineitem"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"))),

    // 10%-per-tail trimmed mean of price cents per return flag — the
    // robust location between mean and median: positional trimming via
    // integer interval intersection on the grouped two-phase prefix
    // scan, so tied values trim identically on any engine.
    "q_trimmed_mean" -> ((s, dir) =>
      ProfileOps.trimmedMeanByGroup(
        t(s, dir, "lineitem"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"), 100000L)
        .select(col("group").as("l_returnflag"), col("n"), col("n_kept"),
          col("kept_sum"), col("t_mean"))),

    // Huber M-location of balance cents per segment (k = $1000, two
    // IRLS refits from the exact grouped median): ×10⁶ micro weights by
    // nonneg intdiv, signed toward-zero refit division — the entire
    // iterate trajectory replays bit-for-bit in the oracle.
    "q_huber_mean" -> ((s, dir) =>
      ProfileOps.huberMeanByGroup(
        t(s, dir, "customer"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"), k = 100000L, iters = 2)
        .select(col("group").as("c_mktsegment"), col("n"), col("mu_median"),
          col("mu_huber"), col("w_sum_micro"))),

    // Kaplan-Meier life table over right-censored signup→first-purchase
    // lifetimes (entry = first event day, event = first purchase day,
    // administrative censoring at study end, day 30). Exact-long life
    // table + intdiv hazard; the survival curve rides the fixed-point
    // Log2Fixed log-space prefix sum (no float cumulative product, no
    // libm), both prefix passes on the two-phase bucketed scan.
    "q_km_lifetable" -> ((s, dir) => {
      val sb = survivalSubjects(s, dir)
      SurvivalOps.kmLifeTable(
        sb.select(
          when(col("conv").isNotNull, col("conv") - col("entry"))
            .otherwise(lit(30L) - col("entry")).as("dur"),
          col("conv").isNotNull.cast("long").as("ev")),
        col("dur"), col("ev"))
    }),

    // Two-group log-rank test on the same censored lifetimes, arms from
    // the q_ab_test affine hash — does treatment change TIME-to-convert,
    // not just whether (the question q_ab_test can't see). Per-event-time
    // observed-minus-expected and hypergeometric-variance terms, each an
    // all-double fixed chain (the welchT overflow discipline); the scalar
    // z² = (Σoe)²/Σvar is the consumer's one fold (q_chisq convention).
    "q_logrank" -> ((s, dir) => {
      val sb = survivalSubjects(s, dir)
      SurvivalOps.logRankTerms(
        sb.select(
          when(col("conv").isNotNull, col("conv") - col("entry"))
            .otherwise(lit(30L) - col("entry")).as("dur"),
          col("conv").isNotNull.cast("long").as("ev"),
          (ExperimentOps.armOf(col("user_id"), 2) === 0).as("a")),
        col("dur"), col("ev"), col("a"))
    }),

    // Group-sequential monitoring: the q_ab_test pooled z² evaluated at
    // four weekly interim looks against the constant Pocock K=4 boundary
    // (shared 2.361² literal) — peeking made honest. Cumulative exact
    // counts per look via one map-side ×4 replicate explode (the
    // permutationTest shape); stop_look over the 4-row look frame.
    "q_seq_monitor" -> ((s, dir) =>
      SurvivalOps.seqMonitor(
        survivalSubjects(s, dir), col("user_id"),
        col("entry"), col("conv"), Seq(7L, 14L, 21L, 28L))),

    // Two-period difference-in-differences on purchase spend (pre = days
    // 0-14, post = days 15+), arms from the same affine hash: the panel
    // estimator that differences out time trends a raw post-period
    // comparison confounds. Balanced user-period cells (absent periods
    // spend 0), ONE 8-sum map-side aggregate, means one division each,
    // the DiD contrast a fixed four-term chain.
    "q_did" -> ((s, dir) => {
      val day = datediff(to_date(col("ts")),
        lit("2024-01-01").cast("date")).cast("long")
      val cents = round(col("value") * 100).cast("long")
      val perUser = RefQueries.events(s, dir)
        .groupBy(col("user_id")).agg(
          sum(when(col("event_type") === "purchase" && day < 15L, cents)
            .otherwise(0L)).as("pre_cents"),
          sum(when(col("event_type") === "purchase" && day >= 15L, cents)
            .otherwise(0L)).as("post_cents"))
      val cells = perUser.select(
        (ExperimentOps.armOf(col("user_id"), 2) === 0).as("tr"),
        explode(array(
          struct(lit(false).as("po"), col("pre_cents").as("y")),
          struct(lit(true).as("po"), col("post_cents").as("y")))).as("pp"))
        .select(col("tr"), col("pp.po").as("po"), col("pp.y").as("y"))
      SurvivalOps.did(cells, col("tr"), col("po"), col("y"))
    }),

    // Kruskal-Wallis H across ALL FIVE market segments — q_anova_f's
    // nonparametric omnibus sibling: doubled midranks on the two-phase
    // prefix scan keep every per-segment rank sum an exact long; H and
    // its tie correction close as one fixed double chain against the
    // shared χ²₄ literal.
    "q_kruskal_wallis" -> ((s, dir) =>
      ExperimentOps.kruskalWallis(
        t(s, dir, "customer"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"), MktSegments,
        ExperimentOps.Chi2Crit4Df)),

    // Kendall τ-b between order value and the LITERAL priority ladder —
    // concordance with NO pair join: the five level counts ride one
    // two-phase prefix scan, so P/Q are exact longs off row-local level
    // folds; τ-b one fixed chain, Goodman-Kruskal γ exact ×10⁶ intdiv.
    "q_kendall_tau" -> ((s, dir) =>
      ExperimentOps.kendallTauB(
        t(s, dir, "orders"),
        round(col("o_totalprice") * 100).cast("long"),
        col("o_orderpriority"), PriorityLadder)),

    // McNemar paired-model gate: lexicon-margin classifier vs the naive
    // "mentions data" rule, both judged on lang='en' over the SAME docs
    // — only the discordant cells matter; exact longs, χ²₁ chain.
    "q_mcnemar" -> ((s, dir) => {
      val truth = col("lang") === "en"
      ExperimentOps.mcnemar(
        t(s, dir, "documents")
          .filter(col("lang").isNotNull && col("text").isNotNull),
        (TextOps.classifierMargin(col("text"), qualityLexicon) > 0L) ===
          truth,
        array_contains(TextOps.tokens(lower(col("text"))), "data") === truth)
    }),

    // Cochran's Q over three corpus quality filters (length, lexicon
    // margin, stopword presence) judged on the same docs — the k=3
    // extension of q_mcnemar: do the filters' pass rates differ
    // anywhere? Row sums are row-local; one aggregate pass.
    "q_cochran_q" -> ((s, dir) =>
      ExperimentOps.cochranQ(
        t(s, dir, "documents")
          .filter(col("text").isNotNull && col("n_chars").isNotNull),
        Seq(
          "len" -> (col("n_chars") >= 120L),
          "lex" -> (TextOps.classifierMargin(col("text"),
            qualityLexicon) > 0L),
          "stop" -> array_contains(TextOps.tokens(lower(col("text"))),
            "the")),
        ExperimentOps.Chi2Crit2Df)),

    // Wald-Wolfowitz runs test: does open-vs-closed status clump along
    // the orderkey ingest sequence? Two-phase bucketed scan with NO
    // join — within-bucket lag changes, boundary changes off the
    // metadata-sized bucket frame, one fixed z² chain.
    "q_runs_test" -> ((s, dir) =>
      ExperimentOps.runsTest(
        t(s, dir, "orders"), col("o_orderkey"),
        col("o_orderstatus") === "O")),

    // Gains/lift operating curve of the lexicon classifier against
    // lang='en' (q_auc's threshold sweep): depth/precision/recall exact
    // on the ×10⁶ grid off ONE two-phase prefix scan; lift the only
    // float, a fixed two-division chain.
    "q_lift_gains" -> ((s, dir) =>
      ExperimentOps.liftGains(
        t(s, dir, "documents").filter(col("lang").isNotNull),
        col("lang") === "en",
        TextOps.classifierMargin(col("text"), qualityLexicon))),

    // Autocorrelation of the daily order-revenue series at lags 1..7
    // plus Durbin-Watson — serial-dependence readout behind q_ols_trend:
    // decimal-128 moments make every centered sum exact; one division
    // per lag. Corpus collapses through one day-keyed aggregate; all
    // windows run on the calendar-bounded daily frame.
    "q_acf" -> ((s, dir) =>
      ModelOps.acfSeries(
        t(s, dir, "orders"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long"), maxLag = 7)),

    // Simpson's-paradox screen on the hash-split experiment stratified
    // by market segment: every direction decided by exact
    // cross-multiplication (never a float rate); the strict textbook
    // reversal flag plus the stratum direction census.
    "q_simpson_paradox" -> ((s, dir) =>
      ExperimentOps.simpsonParadox(
        t(s, dir, "customer"), col("c_mktsegment"),
        ExperimentOps.armOf(col("c_custkey"), 2) === 0,
        col("c_acctbal") >= 0.0)),

    // Hill tail-exponent of the order-value distribution over the top
    // 64 order statistics — q_zipf_fit's value-distribution twin: heap-
    // bounded top-(k+1), exact fixed-point log sum (boundary-tie-proof),
    // one shared-ln2 closing chain.
    "q_tail_index" -> ((s, dir) =>
      ModelOps.hillTailIndex(
        t(s, dir, "orders"),
        round(col("o_totalprice") * 100).cast("long"), k = 64)),

    // Optimal single changepoint of the daily-revenue series (binary
    // segmentation, first split) — localizes the level shift
    // q_cusum_shift only flags: every candidate split scored on a fixed
    // S-normalized ×2^20 integer grid (decimal-128 numerators), so the
    // argmax is engine-deterministic — no double score, no ulp lottery.
    "q_changepoint" -> ((s, dir) =>
      ModelOps.changepointScan(
        t(s, dir, "orders"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long"))),

    // Lorenz curve at deciles per source — the curve behind q_gini's
    // scalar, on the identical frame: bottom-k/10 byte shares, exact
    // ×10⁶ intdiv off the same grouped rank window.
    "q_lorenz" -> ((s, dir) =>
      ProfileOps.lorenzDeciles(
        t(s, dir, "documents"), col("source"), col("n_chars"))
        .select(col("group").as("source"), col("decile"),
          col("boundary_rank"), col("share_micro"))),

    // G-test of independence on priority × status (the q_cramers_v
    // contingency) — the likelihood-ratio omnibus that stays calibrated
    // at low expected counts: fixed-point log2 cell terms (no libm),
    // decimal-128 accumulation, the shared ln2 literal for the nats
    // readout against χ²₈.
    "q_gtest" -> ((s, dir) =>
      ProfileOps.gTest(
        t(s, dir, "orders"), col("o_orderpriority"), col("o_orderstatus"),
        PriorityLadder, OrderStatuses, ExperimentOps.Chi2Crit8Df)),

    // Theil T inequality of byte mass per source on the identical
    // q_gini frame — the decomposable information-theoretic twin:
    // fixed-point log2 terms (no libm), decimal-128 accumulation, one
    // sign-split intdiv per group.
    "q_theil" -> ((s, dir) =>
      ProfileOps.theilByGroup(
        t(s, dir, "documents"), col("source"), col("n_chars"))
        .select(col("group").as("source"), col("n"), col("total"),
          col("theil_log2fx"))),

    // Day-of-week seasonal index of daily order revenue — the weekly
    // shape behind q_acf's lag-7 reading: portable integer calendar
    // math ((epoch_day+4) mod 7), exact ×10⁶ decimal intdiv, the
    // 7-row dow frame after one day-keyed collapse.
    "q_seasonal_index" -> ((s, dir) =>
      ModelOps.seasonalIndex(
        t(s, dir, "orders"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long"))),

    // Chapman capture-recapture estimate of the active-user population
    // from two observation windows (first vs second half-month) against
    // the observed union — exact intdiv, one user-keyed aggregate.
    "q_capture_recapture" -> ((s, dir) => {
      val day = datediff(to_date(col("ts")),
        lit("2024-01-01").cast("date")).cast("long")
      EstimatorOps.captureRecapture(
        RefQueries.events(s, dir), col("user_id"),
        day < 15L, day >= 15L)
    }),
  )

  /** Shared survival fixture: one row per user with `entry` (first event
    * day since 2024-01-01) and `conv` (first purchase day, NULL = never)
    * — the subject frame for q_km_lifetable / q_logrank / q_seq_monitor.
    * One map-side-combined user-grain aggregate over events.
    */
  private def survivalSubjects(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date")).cast("long")
    RefQueries.events(s, dir).groupBy(col("user_id")).agg(
      min(day).as("entry"),
      min(when(col("event_type") === "purchase", day)).as("conv"))
  }

  /** The survival subject frame as a DuckDB CTE body (replays
    * [[survivalSubjects]]): emits `user_id, entry, conv`. */
  private val survSubjSql: String =
    """SELECT user_id,
      |    min(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)))
      |      AS entry,
      |    min(CASE WHEN event_type = 'purchase'
      |        THEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |        END) AS conv
      |  FROM events GROUP BY user_id""".stripMargin

  /** The five TPC-H market segments — the literal arm list for the
    * k-group omnibus tests (arms are experiment config, never
    * data-discovered; the [[graft.ops.ExperimentOps.anovaF]] contract).
    */
  private val MktSegments: Seq[String] =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** The TPC-H priority ladder as an ORDERED literal ordinal scale
    * (lowest first) — the level axis for Kendall τ-b (level order is
    * semantics, not data).
    */
  private val PriorityLadder: Seq[String] = Seq(
    "5-LOW", "4-NOT SPECIFIED", "3-MEDIUM", "2-HIGH", "1-URGENT")

  /** The three TPC-H order statuses — the literal second axis for the
    * contingency omnibus tests. */
  private val OrderStatuses: Seq[String] = Seq("F", "O", "P")

  /** The q_auc lexicon-margin CTE prefix (`w`/`tk`/`mm`): per-doc margin
    * of the frozen quality lexicon, docs with no lexicon hits coalesced
    * to 0 downstream — shared by the paired-classifier oracles so the
    * margin definition cannot drift between them.
    */
  private lazy val lexMarginCtes: String = {
    val vals = qualityLexicon.toSeq.sortBy(_._1)
      .map { case (k, v2) => s"('$k', CAST($v2 AS BIGINT))" }.mkString(", ")
    s"""w(tok, wt) AS (VALUES $vals),
       |tk AS (SELECT doc_id, unnest(${S.tokens("lower(text)")}) AS tok
       |       FROM documents),
       |mm AS (SELECT doc_id, CAST(COALESCE(sum(wt), 0) AS BIGINT)
       |         AS margin
       |       FROM tk LEFT JOIN w USING (tok) GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB replay of [[graft.ops.ExperimentOps.anovaF]] over a source
    * CTE named `srcCte` emitting `(g, v)`: per-group moment pivot, then
    * the IDENTICAL fixed left-assoc IEEE chains (both engines evaluate
    * the same expression tree — the welch_t discipline, k-ary).
    */
  private def anovaFSql(srcCte: String, groups: Seq[String]): String = {
    val is = groups.indices
    val moments = groups.zipWithIndex.flatMap { case (gl, i) =>
      Seq(
        s"CAST(count(*) FILTER (WHERE g = '$gl') AS BIGINT) AS n_$i",
        s"CAST(coalesce(sum(v) FILTER (WHERE g = '$gl'), 0) AS BIGINT) AS s_$i",
        s"CAST(coalesce(sum(v * v) FILTER (WHERE g = '$gl'), 0) AS BIGINT) AS q_$i")
    }.mkString(",\n    ")
    val kSum = is.map(i => s"CAST(n_$i > 0 AS BIGINT)").mkString(" + ")
    val nSum = is.map(i => s"n_$i").mkString(" + ")
    val sSum = is.map(i => s"s_$i").mkString(" + ")
    val bChain = is.map(i =>
      s"""CASE WHEN n_$i > 0 THEN (CAST(s_$i AS DOUBLE) / CAST(n_$i AS DOUBLE)) * CAST(s_$i AS DOUBLE) ELSE 0.0 END""")
      .mkString(" + ")
    val wChain = is.map(i =>
      s"""CASE WHEN n_$i > 0 THEN CAST(q_$i AS DOUBLE) - (CAST(s_$i AS DOUBLE) / CAST(n_$i AS DOUBLE)) * CAST(s_$i AS DOUBLE) ELSE 0.0 END""")
      .mkString(" + ")
    s"""av_m AS (SELECT
       |    $moments
       |  FROM $srcCte),
       |av_c AS (SELECT *, $kSum AS k, $nSum AS n, $sSum AS s FROM av_m),
       |av_e AS (SELECT *,
       |    ($bChain) - CASE WHEN n > 0 THEN (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s AS DOUBLE) ELSE 0.0 END AS ssb,
       |    ($wChain) AS ssw
       |  FROM av_c)
       |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       |  CASE WHEN n > 0 THEN ssb END AS ss_between,
       |  CASE WHEN n > 0 THEN ssw END AS ss_within,
       |  CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
       |  CASE WHEN k - 1 > 0 AND n - k > 0 AND ssw > 0.0
       |    THEN (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE))
       |  END AS f_stat,
       |  CASE WHEN ssb + ssw > 0.0 THEN ssb / (ssb + ssw) END AS eta2
       |FROM av_e""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    // Same BM25 scoring text cut at 10, gains/prefixes the identical
    // ×10⁶ literals, one closing division.
    "q_ndcg" ->
      s"""WITH d AS (
         |  SELECT doc_id, toks,
         |         CAST(len(toks) AS DOUBLE) AS dl,
         |         CAST(len(list_filter(toks, t -> t = 'vector')) AS DOUBLE) AS tf0,
         |         CAST(len(list_filter(toks, t -> t = 'customer')) AS DOUBLE) AS tf1,
         |         CAST(len(list_filter(toks, t -> t = 'stream')) AS DOUBLE) AS tf2
         |  FROM (SELECT doc_id, ${S.tokens("lower(text)")} AS toks FROM documents)),
         |s AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl,
         |         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
         |         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
         |         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
         |  FROM d),
         |top AS (
         |  SELECT doc_id, rank FROM (
         |    SELECT doc_id, score,
         |      row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |    FROM (
         |      SELECT doc_id,
         |        ((n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.25) / (tf0 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |      + ((n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.25) / (tf1 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |      + ((n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.25) / (tf2 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |        AS score
         |      FROM d, s)
         |    WHERE score > 0)
         |  WHERE rank <= 10),
         |rel AS (
         |  SELECT doc_id,
         |    CAST(list_contains(toks, 'vector') AND list_contains(toks, 'customer')
         |      AND list_contains(toks, 'stream') AS BIGINT) AS rel
         |  FROM d),
         |g AS (
         |  SELECT CAST(COALESCE(sum(r.rel * CASE rank
         |    WHEN 1 THEN 1000000 WHEN 2 THEN 630930 WHEN 3 THEN 500000
         |    WHEN 4 THEN 430677 WHEN 5 THEN 386853 WHEN 6 THEN 356207
         |    WHEN 7 THEN 333333 WHEN 8 THEN 315465 WHEN 9 THEN 301030
         |    WHEN 10 THEN 289065 END), 0) AS BIGINT) AS dcg_micro
         |  FROM top JOIN rel r USING (doc_id)),
         |nr AS (SELECT CAST(COALESCE(sum(rel), 0) AS BIGINT) AS n_rel FROM rel),
         |i AS (
         |  SELECT n_rel, CAST(CASE
         |    WHEN n_rel >= 10 THEN 4543560 WHEN n_rel = 9 THEN 4254495
         |    WHEN n_rel = 8 THEN 3953465 WHEN n_rel = 7 THEN 3638000
         |    WHEN n_rel = 6 THEN 3304667 WHEN n_rel = 5 THEN 2948460
         |    WHEN n_rel = 4 THEN 2561607 WHEN n_rel = 3 THEN 2130930
         |    WHEN n_rel = 2 THEN 1630930 WHEN n_rel = 1 THEN 1000000
         |    ELSE 0 END AS BIGINT) AS idcg_micro
         |  FROM nr)
         |SELECT n_rel, dcg_micro, idcg_micro,
         |  CASE WHEN idcg_micro > 0
         |    THEN CAST(dcg_micro AS DOUBLE) / idcg_micro END AS ndcg
         |FROM i, g""".stripMargin,

    // Error-bound oracle: the exact p90 leg must hash-match and the
    // sketch must sit inside the exact [p85, p95] window on every group.
    "q_approx_quantiles" ->
      """SELECT l_returnflag,
        | quantile_cont(cents, 0.9) / 100 AS p90,
        | CAST(1 AS INT) AS within_rank_window
        |FROM (SELECT l_returnflag,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |      FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin,

    // Error-bound oracle: DuckDB contributes the exact distinct counts
    // and asserts within_5pct = 1; the hash compare fails iff Spark's
    // rsd=0.02 HLL++ estimate strays past 5% on any group.
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_parts,
        |       CAST(1 AS INT) AS within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // Verbatim twin of ExperimentOps.abTest: same affine-hash arm split,
    // same fixed IEEE chain for the pooled z (/, *, sqrt are all
    // correctly rounded, so the statistic is bit-identical).
    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS np,
        |    count(*) FILTER (WHERE event_type = 'view') AS nv
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT
        |    ((((user_id % 999999937) * 2654435761 + 104729) % 999999937)
        |      % 2) AS arm,
        |    CASE WHEN np >= nv THEN 1 ELSE 0 END AS converted
        |  FROM u),
        |s AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS users_a,
        |    CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS users_b,
        |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_b
        |  FROM a),
        |r AS (
        |  SELECT *,
        |    CASE WHEN users_a > 0 THEN conv_a / users_a END AS rate_a,
        |    CASE WHEN users_b > 0 THEN conv_b / users_b END AS rate_b,
        |    CASE WHEN users_a + users_b > 0
        |      THEN (conv_a + conv_b) / (users_a + users_b) END AS pool
        |  FROM s)
        |SELECT users_a, users_b, conv_a, conv_b, rate_a, rate_b,
        |  CASE WHEN users_a > 0 AND users_b > 0
        |        AND pool > 0.0 AND pool < 1.0
        |    THEN (rate_a - rate_b) / sqrt(pool * (1.0 - pool)
        |      * (1.0 / users_a + 1.0 / users_b))
        |  END AS z
        |FROM r""".stripMargin,

    // Same affine arm split; chi2 chain mirrors ExperimentOps.srmCheck.
    "q_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (
        |  SELECT ((((user_id % 999999937) * 2654435761 + 104729)
        |    % 999999937) % 2) AS arm FROM u),
        |s AS (
        |  SELECT CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS users_a,
        |    CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS users_b
        |  FROM a)
        |SELECT users_a, users_b,
        |  CASE WHEN users_a + users_b > 0
        |    THEN CAST((users_a - users_b) * (users_a - users_b) AS DOUBLE)
        |      / (users_a + users_b) END AS chi2,
        |  CAST(CASE WHEN users_a + users_b > 0
        |    THEN CAST((users_a - users_b) * (users_a - users_b) AS DOUBLE)
        |      / (users_a + users_b) > 3.841 END AS INTEGER) AS srm_suspect
        |FROM s""".stripMargin,

    // Verbatim twin of ExperimentOps.cuped: same integer moment
    // identities, same closing-division order.
    "q_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-16') AS x,
        |    count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-16'
        |      AND event_type = 'purchase') AS y
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT ((((user_id % 999999937) * 2654435761 + 104729)
        |    % 999999937) % 2) AS arm, x, y FROM u),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
        |    CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
        |  FROM a),
        |d AS (
        |  SELECT *,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS deny
        |  FROM m),
        |t AS (
        |  SELECT *, CASE WHEN n > 0 THEN
        |    (CASE WHEN denx > 0 THEN num / denx ELSE 0.0 END) END AS theta
        |  FROM d)
        |SELECT n_a, n_b, theta,
        |  CASE WHEN n_a > 0 THEN CAST(sy_a AS DOUBLE) / n_a END AS mean_y_a,
        |  CASE WHEN n_b > 0 THEN CAST(sy_b AS DOUBLE) / n_b END AS mean_y_b,
        |  CASE WHEN n_a > 0 THEN CAST(sy_a AS DOUBLE) / n_a
        |    - theta * (CAST(sx_a AS DOUBLE) / n_a - CAST(sx AS DOUBLE) / n)
        |  END AS mean_adj_a,
        |  CASE WHEN n_b > 0 THEN CAST(sy_b AS DOUBLE) / n_b
        |    - theta * (CAST(sx_b AS DOUBLE) / n_b - CAST(sx AS DOUBLE) / n)
        |  END AS mean_adj_b,
        |  CASE WHEN denx > 0 AND deny > 0
        |    THEN num * num / (denx * deny) END AS var_reduction
        |FROM t""".stripMargin,

    // Same exact rational per cell: (o·N − r·c)² / (N·r·c), margins via
    // windows over the cell frame.
    "q_chisq" ->
      """WITH cells AS (
        |  SELECT source AS a, lang AS b, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |m AS (
        |  SELECT a, b, o,
        |    CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS r,
        |    CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS c,
        |    CAST(sum(o) OVER () AS BIGINT) AS n
        |  FROM cells)
        |SELECT a AS source, b AS lang, o,
        |  CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE) AS e,
        |  CAST((o*n - r*c) * (o*n - r*c) AS DOUBLE)
        |    / CAST(n * r * c AS DOUBLE) AS chi_term
        |FROM m""".stripMargin,

    // Same observed-cell identity χ² = Σ o²·N/(r·c) − N (zero cells
    // covered exactly), per-cell fixed IEEE chain floored onto the ×10⁶
    // grid, exact long fold, the identical sqrt chain.
    "q_cramers_v" ->
      """WITH cv_cells AS (
        |  SELECT o_orderpriority AS a, o_orderstatus AS b,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM orders GROUP BY 1, 2),
        |cv_m AS (SELECT a, b, o,
        |    CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS r,
        |    CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS c,
        |    CAST(sum(o) OVER () AS BIGINT) AS n
        |  FROM cv_cells),
        |cv_t AS (SELECT a, b, o, n,
        |    CAST(floor((CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
        |        * CAST(n AS DOUBLE)
        |        / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS t_micro
        |  FROM cv_m),
        |cv_a AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS r_cats,
        |    CAST(count(DISTINCT b) AS BIGINT) AS c_cats,
        |    CAST(sum(t_micro) AS BIGINT) AS s_micro
        |  FROM cv_t),
        |cv_b AS (SELECT *,
        |    greatest(s_micro - n * 1000000, CAST(0 AS BIGINT))
        |      AS chi2_micro
        |  FROM cv_a)
        |SELECT n, r_cats, c_cats, CAST(chi2_micro AS BIGINT) AS chi2_micro,
        |  CAST(chi2_micro AS DOUBLE) / 1000000.0 AS chi2,
        |  CASE WHEN least(r_cats, c_cats) - 1 > 0 AND n > 0
        |    THEN sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
        |      / CAST(n * (least(r_cats, c_cats) - 1) AS DOUBLE))
        |  END AS v
        |FROM cv_b""".stripMargin,

    // Same cell frame and margins; every log through the unrolled
    // fixed-point log2 CTEs, exact long term sums, the identical
    // closing chains.
    "q_mutual_info" ->
      s"""WITH mi_cells AS (
         |  SELECT source AS x, lang AS y, CAST(count(*) AS BIGINT) AS o
         |  FROM documents
         |  WHERE source IS NOT NULL AND lang IS NOT NULL
         |  GROUP BY 1, 2),
         |mi_m AS (SELECT x, y, o,
         |    CAST(sum(o) OVER (PARTITION BY x) AS BIGINT) AS r,
         |    CAST(sum(o) OVER (PARTITION BY y) AS BIGINT) AS c,
         |    CAST(sum(o) OVER () AS BIGINT) AS n
         |  FROM mi_cells),
         |vals AS (SELECT DISTINCT v FROM (
         |  SELECT o * n AS v FROM mi_m
         |  UNION ALL SELECT r * c FROM mi_m
         |  UNION ALL SELECT n FROM mi_m
         |  UNION ALL SELECT r FROM mi_m
         |  UNION ALL SELECT c FROM mi_m)),
         |${log2FixedSql("vals")},
         |mi_t AS (
         |  SELECT m.o, m.n,
         |    m.o * (lon.lg - lrc.lg) AS mi_term,
         |    m.o * (lnn.lg - lr.lg) AS hx_term,
         |    m.o * (lnn.lg - lc.lg) AS hy_term
         |  FROM mi_m m
         |  JOIN lg lon ON lon.v = m.o * m.n
         |  JOIN lg lrc ON lrc.v = m.r * m.c
         |  JOIN lg lnn ON lnn.v = m.n
         |  JOIN lg lr ON lr.v = m.r
         |  JOIN lg lc ON lc.v = m.c),
         |mi_a AS (SELECT CAST(max(n) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS cells,
         |    CAST(sum(mi_term) AS BIGINT) AS mi_fixed,
         |    CAST(sum(hx_term) AS BIGINT) AS hx_fixed,
         |    CAST(sum(hy_term) AS BIGINT) AS hy_fixed
         |  FROM mi_t),
         |mi_b AS (SELECT *,
         |    CAST(mi_fixed AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0
         |      AS mi_bits,
         |    CAST(hx_fixed AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0
         |      AS hx_bits,
         |    CAST(hy_fixed AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0
         |      AS hy_bits
         |  FROM mi_a)
         |SELECT n, cells, mi_fixed, mi_bits, hx_bits, hy_bits,
         |  CASE WHEN least(hx_bits, hy_bits) > 0.0
         |    THEN mi_bits / least(hx_bits, hy_bits) END AS nmi
         |FROM mi_b""".stripMargin,

    // Same distinct-value frame, inclusive/exclusive cumulative counts
    // as plain grouped windows, the identical integer interval
    // intersection per value.
    "q_trimmed_mean" ->
      """WITH tm_byv AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |tm_cum AS (SELECT g, v, cnt,
        |    CAST(coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS pre,
        |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM tm_byv),
        |tm_k AS (SELECT g, v, n,
        |    greatest(least(n - (n * 100000) // 1000000, pre + cnt)
        |      - greatest((n * 100000) // 1000000, pre),
        |      CAST(0 AS BIGINT)) AS kept
        |  FROM tm_cum)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(kept) AS BIGINT) AS n_kept,
        |  CAST(sum(kept * v) AS BIGINT) AS kept_sum,
        |  CASE WHEN sum(kept) > 0
        |    THEN CAST(sum(kept * v) AS DOUBLE) / CAST(sum(kept) AS DOUBLE)
        |  END AS t_mean
        |FROM tm_k GROUP BY g""".stripMargin,

    // The IRLS trajectory replayed literally: exact grouped lower
    // median, two refits with the ×10⁶ intdiv weights and the
    // SIGN-SPLIT toward-zero refit division.
    "q_huber_mean" ->
      """WITH hb_rows AS (
        |  SELECT c_mktsegment AS g,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |hb_byv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM hb_rows GROUP BY 1, 2),
        |hb_cum AS (SELECT g, v,
        |    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
        |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS tw
        |  FROM hb_byv),
        |hb_med AS (SELECT g, min(v) AS mu0
        |  FROM hb_cum WHERE 2 * cw >= tw GROUP BY g),
        |hb_n AS (SELECT g, CAST(count(*) AS BIGINT) AS n
        |  FROM hb_rows GROUP BY g),
        |hb_w1 AS (SELECT r.g, r.v,
        |    CASE WHEN abs(r.v - m.mu0) <= 100000 THEN 1000000
        |         ELSE 100000000000 // abs(r.v - m.mu0) END AS w
        |  FROM hb_rows r JOIN hb_med m ON r.g = m.g),
        |hb_i1 AS (SELECT g,
        |    CAST(sum(w * v) AS BIGINT) AS wx, CAST(sum(w) AS BIGINT) AS ws
        |  FROM hb_w1 GROUP BY g),
        |hb_m1 AS (SELECT g,
        |    CASE WHEN wx >= 0 THEN wx // ws ELSE -((-wx) // ws) END AS mu
        |  FROM hb_i1),
        |hb_w2 AS (SELECT r.g, r.v,
        |    CASE WHEN abs(r.v - m.mu) <= 100000 THEN 1000000
        |         ELSE 100000000000 // abs(r.v - m.mu) END AS w
        |  FROM hb_rows r JOIN hb_m1 m ON r.g = m.g),
        |hb_i2 AS (SELECT g,
        |    CAST(sum(w * v) AS BIGINT) AS wx, CAST(sum(w) AS BIGINT) AS ws
        |  FROM hb_w2 GROUP BY g),
        |hb_m2 AS (SELECT g,
        |    CAST(CASE WHEN wx >= 0 THEN wx // ws
        |         ELSE -((-wx) // ws) END AS BIGINT) AS mu,
        |    ws
        |  FROM hb_i2)
        |SELECT n.g AS c_mktsegment, n.n, med.mu0 AS mu_median,
        |  m2.mu AS mu_huber, m2.ws AS w_sum_micro
        |FROM hb_n n
        |JOIN hb_med med ON n.g = med.g
        |JOIN hb_m2 m2 ON n.g = m2.g""".stripMargin,

    // Same +1 Laplace cells and smoothed totals; WOE through the
    // fixed-point log2 CTEs, the IV integer fold over the shared
    // SP·SN denominator.
    "q_woe_iv" ->
      s"""WITH wv_cat AS (
         |  SELECT source AS category,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_neg
         |  FROM documents
         |  WHERE source IS NOT NULL AND lang IS NOT NULL
         |  GROUP BY source),
         |wv_m AS (
         |  SELECT category, n_pos, n_neg,
         |    n_pos + 1 AS sp, n_neg + 1 AS sn,
         |    CAST(sum(n_pos) OVER () + count(*) OVER () AS BIGINT) AS tp,
         |    CAST(sum(n_neg) OVER () + count(*) OVER () AS BIGINT) AS tn
         |  FROM wv_cat),
         |vals AS (SELECT DISTINCT v FROM (
         |  SELECT sp AS v FROM wv_m
         |  UNION ALL SELECT sn FROM wv_m
         |  UNION ALL SELECT tp FROM wv_m
         |  UNION ALL SELECT tn FROM wv_m)),
         |${log2FixedSql("vals")},
         |wv_w AS (
         |  SELECT m.category, m.n_pos, m.n_neg, m.sp, m.sn, m.tp, m.tn,
         |    (lsp.lg - ltp.lg) - (lsn.lg - ltn.lg) AS woe_fixed
         |  FROM wv_m m
         |  JOIN lg lsp ON lsp.v = m.sp
         |  JOIN lg ltp ON ltp.v = m.tp
         |  JOIN lg lsn ON lsn.v = m.sn
         |  JOIN lg ltn ON ltn.v = m.tn),
         |wv_t AS (SELECT *,
         |    (sp * tn - sn * tp) * woe_fixed AS iv_term FROM wv_w),
         |wv_f AS (SELECT *,
         |    CAST(sum(iv_term) OVER () AS BIGINT) AS iv_fixed FROM wv_t)
         |SELECT category, n_pos, n_neg,
         |  CAST(woe_fixed AS BIGINT) AS woe_fixed,
         |  CAST(woe_fixed AS DOUBLE) / 1048576.0 AS woe_bits,
         |  CAST(iv_fixed AS DOUBLE) / CAST(tp * tn AS DOUBLE) / 1048576.0
         |    AS iv_bits
         |FROM wv_f""".stripMargin,

    // Same rank formulation; ties across equal values cannot move the
    // i·x sum, so the arbitrary tie order is harmless on both engines.
    "q_gini" ->
      """WITH rk AS (
        |  SELECT source, n_chars,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY n_chars) AS BIGINT) AS i
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total,
        |  CASE WHEN sum(n_chars) > 0 THEN
        |    CAST(2*sum(i*n_chars) - (count(*)+1)*sum(n_chars) AS DOUBLE)
        |      / CAST(count(*)*sum(n_chars) AS DOUBLE)
        |  ELSE NULL END AS gini
        |FROM rk GROUP BY source""".stripMargin,

    // Same centered doubled midranks (naive cumulative window in the
    // oracle, two-phase scan in the engine), HUGEINT moment sums, the
    // identical closing chain.
    "q_spearman" ->
      """WITH sp_v AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS xv,
        |    CAST(round(l_extendedprice) AS BIGINT) AS yv
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |sp_bx AS (SELECT xv AS v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM sp_v GROUP BY 1),
        |sp_dx AS (SELECT v AS xv,
        |    CAST(2 * coalesce(sum(cnt) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt - sum(cnt) OVER () AS BIGINT) AS d_xv
        |  FROM sp_bx),
        |sp_by AS (SELECT yv AS v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM sp_v GROUP BY 1),
        |sp_dy AS (SELECT v AS yv,
        |    CAST(2 * coalesce(sum(cnt) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt - sum(cnt) OVER () AS BIGINT) AS d_yv
        |  FROM sp_by),
        |sp_r AS (SELECT d_xv, d_yv
        |  FROM sp_v JOIN sp_dx USING (xv) JOIN sp_dy USING (yv)),
        |sp_a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(d_xv * d_yv AS HUGEINT)) AS sxy,
        |    sum(CAST(d_xv * d_xv AS HUGEINT)) AS sxx,
        |    sum(CAST(d_yv * d_yv AS HUGEINT)) AS syy
        |  FROM sp_r)
        |SELECT n,
        |  CASE WHEN sxx > 0 AND syy > 0
        |    THEN CAST(sxy AS DOUBLE)
        |      / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
        |  END AS rho
        |FROM sp_a""".stripMargin,

    // Same five power sums, same double chain.
    "q_correlation" ->
      """WITH s AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM s GROUP BY g)
        |SELECT g AS l_returnflag, n,
        |  CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) > 0
        |        AND CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
        |              - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) > 0 THEN
        |    (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |       - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |           * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
        |              - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
        |  END AS r
        |FROM a""".stripMargin,

    "q_quantiles" ->
      """SELECT l_returnflag,
        | quantile_cont(cents, 0.5) / 100 AS p50,
        | quantile_cont(cents, 0.9) / 100 AS p90,
        | quantile_cont(cents, 0.99) / 100 AS p99
        |FROM (SELECT l_returnflag,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |      FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_bitmap_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "q_equidepth" ->
      """WITH src AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |ed AS (SELECT quantile_cont(cents, [0.25, 0.5, 0.75]) AS e FROM src),
        |b AS (SELECT cents,
        |        CASE WHEN cents < e[1] THEN 0 WHEN cents < e[2] THEN 1
        |             WHEN cents < e[3] THEN 2 ELSE 3 END AS bucket
        |      FROM src, ed)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(cents) AS lo, max(cents) AS hi
        |FROM b GROUP BY 1""".stripMargin,

    // Every register regenerated from scratch: the splitmix chain in
    // HUGEINT mod-2^64 SQL (RefQueries.mixSql — the identical replay
    // family as q_bloom_index), idx/w as unsigned div/mod by 2^56, msb
    // from bin() string length (no leading zeros — the log2FixedSql
    // convention), max per register.
    "q_hll_registers" ->
      s"""WITH m AS (
         |  SELECT ${RefQueries.mixSql("h", "o_custkey::HUGEINT * 2654435761 + 77")}
         |  FROM orders),
         |r0 AS (SELECT hm // 72057594037927936 AS idx,
         |              (hm % 72057594037927936)::BIGINT AS w FROM m)
         |SELECT idx::BIGINT AS idx,
         |  CAST(max(CASE WHEN w = 0 THEN 57
         |           ELSE 56 - (length(bin(w)) - 1) END) AS BIGINT) AS rho
         |FROM r0 GROUP BY idx""".stripMargin,

    // Same register build, folded: the clipped harmonic sum in exact
    // int64 (absent registers contribute 2^RhoCap), ONE division by the
    // shared HllAlphaNum literal, and the ±20% flag from
    // exact-representable factors only.
    "q_hll_estimate" -> {
      val zm = 1L << EstimatorOps.RhoCap
      val a = dlit(EstimatorOps.HllAlphaNum)
      val sTot = s"sp + (256 - present) * $zm"
      s"""WITH m AS (
         |  SELECT ${RefQueries.mixSql("h", "o_custkey::HUGEINT * 2654435761 + 77")}
         |  FROM orders),
         |r0 AS (SELECT hm // 72057594037927936 AS idx,
         |              (hm % 72057594037927936)::BIGINT AS w FROM m),
         |reg AS (SELECT idx,
         |          max(CASE WHEN w = 0 THEN 57
         |              ELSE 56 - (length(bin(w)) - 1) END) AS rho
         |        FROM r0 GROUP BY idx),
         |e AS (SELECT CAST(count(*) AS BIGINT) AS present,
         |        CAST(coalesce(sum(
         |          1::BIGINT << CAST(${EstimatorOps.RhoCap} -
         |            least(rho, ${EstimatorOps.RhoCap}) AS INT)), 0) AS BIGINT)
         |          AS sp
         |      FROM reg),
         |x AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
         |      FROM orders)
         |SELECT CAST(256 AS BIGINT) AS m,
         |  CAST(256 - present AS BIGINT) AS v_zero,
         |  CAST($sTot AS BIGINT) AS s_scaled,
         |  $a / CAST($sTot AS DOUBLE) AS est_raw,
         |  n_exact,
         |  CAST(($a / CAST($sTot AS DOUBLE)) * CAST(5 AS DOUBLE)
         |         >= CAST(n_exact AS DOUBLE) * CAST(4 AS DOUBLE)
         |   AND ($a / CAST($sTot AS DOUBLE)) * CAST(5 AS DOUBLE)
         |         <= CAST(n_exact AS DOUBLE) * CAST(6 AS DOUBLE) AS INT)
         |    AS within20
         |FROM e, x""".stripMargin
    },

    // Per-(row, replicate) splitmix draw replayed in HUGEINT, the
    // Poisson(1) CDF ladder on the SAME double literals, replicate
    // means as the identical two-division IEEE chain, rank via the
    // point-row-first ordering.
    "q_bootstrap_ci" -> {
      val ladder = EstimatorOps.PoissonCdf1.zipWithIndex
        .map { case (th, i) => s"WHEN hu < ${dlit(th)} THEN $i" }
        .mkString(" ")
      s"""WITH x AS (SELECT o_orderkey AS id,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         |rp AS (SELECT id, c, t.range AS r FROM x CROSS JOIN range(-1, 64) t),
         |m AS (SELECT id, c, r,
         |  ${RefQueries.mixSql("h", "(id::HUGEINT * 1000003 + r) * 2654435761 + 421")}
         |  FROM rp),
         |w AS (SELECT r, c,
         |    CASE WHEN r = -1 THEN 1 $ladder ELSE 7 END AS w FROM m),
         |pr AS (SELECT r,
         |    CASE WHEN sum(w) > 0
         |         THEN CAST(sum(w * c) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
         |              / CAST(100 AS DOUBLE)
         |    END AS mean
         |  FROM w GROUP BY r),
         |rk AS (SELECT r, mean, row_number() OVER (
         |    ORDER BY (r <> -1), mean NULLS LAST, r) AS rk FROM pr)
         |SELECT CAST(64 AS BIGINT) AS n_reps,
         |  max(CASE WHEN rk = 1 THEN mean END) AS point_mean,
         |  max(CASE WHEN rk = 3 THEN mean END) AS ci_lo,
         |  max(CASE WHEN rk = 64 THEN mean END) AS ci_hi
         |FROM rk""".stripMargin
    },

    // The conformal replay: integer-division group means, residual rank
    // via row_number (the VALUE at sorted position k is tie-order-proof),
    // k = ceil((n+1)·0.9) in pure integer arithmetic, coverage as one
    // division. Null-residual rows (nulled-input sweeps) are excluded on
    // both sides.
    "q_conformal" ->
      s"""WITH b AS (SELECT o_orderpriority AS g,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS y,
         |    o_orderkey % 2 = 0 AS cal FROM orders),
         |p AS (SELECT g, CAST(sum(y) // count(*) AS BIGINT) AS pred
         |      FROM b WHERE cal AND y IS NOT NULL GROUP BY g),
         |j AS (SELECT b.cal, abs(b.y - p.pred) AS r
         |      FROM b JOIN p USING (g) WHERE b.y IS NOT NULL),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS n_cal,
         |    CAST(least(((count(*) + 1) * 9 + 9) // 10, count(*)) AS BIGINT)
         |      AS k_rank
         |  FROM j WHERE cal),
         |q AS (SELECT s.r AS q_hat FROM
         |    (SELECT r, row_number() OVER (ORDER BY r) AS rn
         |     FROM j WHERE cal) s
         |    JOIN kk ON s.rn = kk.k_rank),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
         |    CAST(sum(CASE WHEN r <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT)
         |      AS covered
         |  FROM j, q WHERE NOT cal)
         |SELECT kk.n_cal, kk.k_rank, q.q_hat AS q_hat_cents, tt.n_test,
         |  tt.covered,
         |  CASE WHEN tt.n_test > 0
         |       THEN CAST(tt.covered AS DOUBLE) / CAST(tt.n_test AS DOUBLE)
         |  END AS coverage
         |FROM kk, q, tt""".stripMargin,

    // Term-frequency ranking, first-relevant rank, the same ×10⁶ gain
    // literals — the engine's exact pipeline in SQL, with the VALUES
    // term frame left-joined so termless queries keep their zero row.
    "q_mrr" -> {
      val termsVals = MrrTerms.map(tm => s"('$tm')").mkString(", ")
      val gains = MrrGainMicro.zipWithIndex
        .map { case (g, i) => s"WHEN ${i + 1} THEN $g" }.mkString(" ")
      s"""WITH d AS (SELECT doc_id, ${S.tokens("lower(text)")} AS tk
         |           FROM documents),
         |tq(term) AS (VALUES $termsVals),
         |f AS (SELECT doc_id, term,
         |        CAST(len(list_filter(tk, x -> x = term)) AS BIGINT) AS tf,
         |        list_contains(tk[1:3], term) AS rel
         |      FROM d CROSS JOIN tq
         |      WHERE len(list_filter(tk, x -> x = term)) > 0),
         |r AS (SELECT term, rel, row_number() OVER (
         |        PARTITION BY term ORDER BY tf DESC, doc_id) AS rank FROM f),
         |fr AS (SELECT term, CAST(min(rank) AS BIGINT) AS first_rel_rank
         |       FROM r WHERE rel AND rank <= 10 GROUP BY term)
         |SELECT tq.term, fr.first_rel_rank,
         |  CAST(coalesce(CASE fr.first_rel_rank $gains END, 0) AS BIGINT)
         |    AS rr_micro
         |FROM tq LEFT JOIN fr ON fr.term = tq.term""".stripMargin
    },

    // Same ranking CTEs as q_mrr, plus the running relevant-hit window
    // and the two integer divisions (prec@k, the min(R,10) normalizer).
    "q_map_eval" -> {
      val termsVals = MrrTerms.map(tm => s"('$tm')").mkString(", ")
      s"""WITH d AS (SELECT doc_id, ${S.tokens("lower(text)")} AS tk
         |           FROM documents),
         |tq(term) AS (VALUES $termsVals),
         |f AS (SELECT doc_id, term,
         |        CAST(len(list_filter(tk, x -> x = term)) AS BIGINT) AS tf,
         |        list_contains(tk[1:3], term) AS rel
         |      FROM d CROSS JOIN tq
         |      WHERE len(list_filter(tk, x -> x = term)) > 0),
         |r AS (SELECT term, rel, row_number() OVER (
         |        PARTITION BY term ORDER BY tf DESC, doc_id) AS rank FROM f),
         |h AS (SELECT term, rel, rank,
         |        sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
         |          PARTITION BY term ORDER BY rank) AS hits
         |      FROM r WHERE rank <= 10),
         |ap AS (SELECT term, sum((hits * 1000000) // rank) AS ap_num
         |       FROM h WHERE rel GROUP BY term),
         |nr AS (SELECT term, CAST(count(*) AS BIGINT) AS n_rel
         |       FROM f WHERE rel GROUP BY term)
         |SELECT tq.term, coalesce(nr.n_rel, 0) AS n_rel,
         |  CAST(coalesce(ap.ap_num // least(nr.n_rel, 10), 0) AS BIGINT)
         |    AS ap_micro
         |FROM tq LEFT JOIN nr ON nr.term = tq.term
         |        LEFT JOIN ap ON ap.term = tq.term""".stripMargin
    },

    // Grouped register build (one pass), idx-keyed max-merge for the
    // union, conditional harmonic folds for all three sets, the
    // inclusion-exclusion subtraction in the SAME operation order, and
    // the exact custkey-keyed flags.
    "q_hll_sources" -> {
      val zm = 1L << EstimatorOps.RhoCap
      val a = dlit(EstimatorOps.HllAlphaNum)
      def spSql(c: String) =
        s"coalesce(sum(1::BIGINT << CAST(41 - least($c, 41) AS INT)), 0)"
      def estSql(s0: String, p: String) =
        s"$a / CAST($s0 + (256 - $p) * $zm AS DOUBLE)"
      s"""WITH o AS (SELECT o_custkey, o_orderstatus FROM orders
         |           WHERE o_orderstatus IN ('O', 'F')),
         |m AS (SELECT o_orderstatus AS g,
         |  ${RefQueries.mixSql("h", "o_custkey::HUGEINT * 2654435761 + 77")}
         |  FROM o),
         |r0 AS (SELECT g, hm // 72057594037927936 AS idx,
         |              (hm % 72057594037927936)::BIGINT AS w FROM m),
         |reg AS (SELECT g, idx,
         |          max(CASE WHEN w = 0 THEN 57
         |              ELSE 56 - (length(bin(w)) - 1) END) AS rho
         |        FROM r0 GROUP BY g, idx),
         |bi AS (SELECT idx, max(rho) AS rho_u,
         |         max(CASE WHEN g = 'O' THEN rho END) AS rho_a,
         |         max(CASE WHEN g = 'F' THEN rho END) AS rho_b
         |       FROM reg GROUP BY idx),
         |e AS (SELECT count(rho_a) AS pa, ${spSql("rho_a")} AS sa,
         |             count(rho_b) AS pb, ${spSql("rho_b")} AS sb,
         |             count(rho_u) AS pu, ${spSql("rho_u")} AS su
         |      FROM bi),
         |x AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a,
         |        CAST(sum(ib) AS BIGINT) AS n_b,
         |        CAST(count(*) AS BIGINT) AS n_union,
         |        CAST(sum(ia * ib) AS BIGINT) AS n_intersect
         |      FROM (SELECT o_custkey,
         |              max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS ia,
         |              max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ib
         |            FROM o GROUP BY o_custkey))
         |SELECT ${estSql("sa", "pa")} AS est_a,
         |  ${estSql("sb", "pb")} AS est_b,
         |  ${estSql("su", "pu")} AS est_union,
         |  (est_a + est_b) - est_union AS est_intersect,
         |  n_a, n_b, n_union, n_intersect
         |FROM e, x""".stripMargin
    },

    // Moments replayed per group (HUGEINT intermediates), both divisions
    // sign-split so either DuckDB `//` semantics is toward-zero.
    "q_ols_trend" ->
      s"""WITH $trendDailySql,
         |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |        sum(x) AS sx, sum(y) AS sy,
         |        sum(x * x) AS sxx, sum(x * y) AS sxy,
         |        max(x) AS xmax
         |      FROM d GROUP BY g),
         |f AS (SELECT g, n, sx, sy, xmax,
         |        (n * sxy - sx * sy) * 1000000 AS num,
         |        n * sxx - sx * sx AS den
         |      FROM m),
         |s1 AS (SELECT g, n, sx, sy, xmax, den,
         |         CASE WHEN den > 0 THEN
         |           CASE WHEN num >= 0 THEN num // den
         |                ELSE -((-num) // den) END
         |         END AS slope_micro
         |       FROM f),
         |s2 AS (SELECT g, n, xmax, slope_micro,
         |         CASE WHEN den > 0 THEN
         |           CASE WHEN sy * 1000000 - slope_micro * sx >= 0
         |                THEN (sy * 1000000 - slope_micro * sx) // n
         |                ELSE -((-(sy * 1000000 - slope_micro * sx)) // n) END
         |         END AS intercept_micro
         |       FROM s1)
         |SELECT g AS event_type, n AS n_points,
         |  CAST(slope_micro AS BIGINT) AS slope_micro,
         |  CAST(intercept_micro AS BIGINT) AS intercept_micro,
         |  CAST(intercept_micro + slope_micro * (xmax + 1) AS BIGINT)
         |    AS pred_next_micro
         |FROM s2""".stripMargin,

    // Pairwise replay: the self-join IS the oracle's formulation (the
    // engine emits pairs row-locally); slope candidates sign-split, the
    // lower median by the identical (s_micro, xi, xj) ordering.
    "q_theilsen" ->
      s"""WITH $trendDailySql,
         |pr AS (SELECT a.g, a.x AS xi, b.x AS xj, b.y - a.y AS dy
         |       FROM d a JOIN d b ON a.g = b.g AND b.x > a.x),
         |sm AS (SELECT g, xi, xj, dy,
         |         CASE WHEN dy >= 0 THEN (dy * 1000000) // (xj - xi)
         |              ELSE -(((-dy) * 1000000) // (xj - xi)) END AS s_micro
         |       FROM pr),
         |rk AS (SELECT g, dy, s_micro,
         |         row_number() OVER (PARTITION BY g
         |           ORDER BY s_micro, xi, xj) AS rn,
         |         count(*) OVER (PARTITION BY g) AS np
         |       FROM sm),
         |g2 AS (SELECT g, CAST(count(*) AS BIGINT) AS n_points
         |       FROM d GROUP BY g),
         |ag AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pairs,
         |         CAST(sum(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1
         |                       ELSE 0 END) AS BIGINT) AS s_stat,
         |         CAST(max(CASE WHEN rn = (np + 1) // 2 THEN s_micro END)
         |           AS BIGINT) AS slope_micro
         |       FROM rk GROUP BY g)
         |SELECT g2.g AS event_type, g2.n_points, ag.n_pairs, ag.s_stat,
         |  ag.slope_micro
         |FROM g2 JOIN ag USING (g)""".stripMargin,

    // Full fit+predict replay: md5 token buckets (the DSIR hash), the
    // dense bucket×class grid with add-1 smoothing, log2FixedSql over
    // every needed value, the same argmax tie-break, the confusion
    // aggregate.
    "q_nb_classify" -> {
      val p = DedupOps.PortableHashPrime
      val bhash =
        s"(CAST(('0x' || substring(md5(tk), 1, 15)) AS BIGINT) % $p) % 64"
      s"""WITH base AS (SELECT doc_id, lang, text, doc_id % 2 = 0 AS tr
         |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
         |tok AS (SELECT doc_id, lang, tr, CAST($bhash AS BIGINT) AS b
         |  FROM (SELECT doc_id, lang, tr,
         |          unnest(${S.tokens("lower(text)")}) AS tk FROM base)),
         |cls AS (SELECT DISTINCT lang AS cls FROM base WHERE tr),
         |cnt AS (SELECT b, lang AS cls, CAST(count(*) AS BIGINT) AS cnt
         |        FROM tok WHERE tr GROUP BY b, lang),
         |grid AS (SELECT c.cls, r.range AS b,
         |           CAST(coalesce(cnt.cnt, 0) AS BIGINT) AS cnt
         |         FROM cls c CROSS JOIN range(0, 64) r
         |         LEFT JOIN cnt ON cnt.cls = c.cls AND cnt.b = r.range),
         |tot AS (SELECT cls, CAST(sum(cnt) AS BIGINT) AS tot
         |        FROM grid GROUP BY cls),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT cnt + 1 AS v FROM grid
         |    UNION ALL SELECT tot + 64 FROM tot)),
         |${log2FixedSql("vals")},
         |nbsc AS (SELECT t.doc_id, t.lang, g.cls,
         |         CAST(sum(l1.lg) AS BIGINT) AS sum_lg,
         |         CAST(count(*) AS BIGINT) AS n_tok
         |       FROM tok t JOIN grid g ON g.b = t.b
         |       JOIN lg l1 ON l1.v = g.cnt + 1
         |       WHERE NOT t.tr GROUP BY t.doc_id, t.lang, g.cls),
         |nbsd AS (SELECT nbsc.doc_id, nbsc.lang, nbsc.cls,
         |         nbsc.sum_lg - nbsc.n_tok * lt.lg AS score
         |       FROM nbsc JOIN tot ON tot.cls = nbsc.cls
         |       JOIN lg lt ON lt.v = tot.tot + 64),
         |arg AS (SELECT doc_id, lang, cls, row_number() OVER (
         |          PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
         |        FROM nbsd)
         |SELECT lang AS label_true, cls AS label_pred,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM arg WHERE rn = 1 GROUP BY lang, cls""".stripMargin
    },

    // Battles via the bucket self-join (the engine emits them
    // row-locally), then the three MM rounds unrolled — every division
    // has nonnegative operands, so `//` is toward-zero under either
    // DuckDB semantics.
    "q_bt_ratings" -> {
      val s2 = ModelOps.BtScale * ModelOps.BtScale
      def round(i: Int) =
        s"""d$i AS (SELECT s.p,
           |  sum((s.n * ${s2}) // (x.pi + y.pi)) AS den
           |  FROM sym s JOIN r${i - 1} x ON x.p = s.p
           |  JOIN r${i - 1} y ON y.p = s.q GROUP BY s.p),
           |w$i AS (SELECT pl.p,
           |  greatest(1, (pl.wins * ${s2}) // d$i.den) AS praw
           |  FROM pl JOIN d$i ON d$i.p = pl.p),
           |m$i AS (SELECT max(praw) AS mx FROM w$i),
           |r$i AS (SELECT p,
           |          greatest(1, (praw * ${ModelOps.BtScale}) // mx) AS pi
           |        FROM w$i, m$i)""".stripMargin
      s"""WITH docs0 AS (SELECT doc_id, source, n_chars FROM documents
         |  WHERE doc_id IS NOT NULL AND source IS NOT NULL
         |    AND n_chars IS NOT NULL),
         |pr AS (SELECT a.source AS sa, b.source AS sb,
         |         a.n_chars >= b.n_chars AS a_wins
         |       FROM docs0 a JOIN docs0 b
         |         ON (a.doc_id // 8) = (b.doc_id // 8)
         |        AND a.doc_id < b.doc_id AND a.source <> b.source),
         |bt AS (SELECT least(sa, sb) AS pa, greatest(sa, sb) AS pb,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN sa <= sb
         |               THEN CASE WHEN a_wins THEN 1 ELSE 0 END
         |               ELSE CASE WHEN a_wins THEN 0 ELSE 1 END END)
         |           AS BIGINT) AS wa
         |       FROM pr GROUP BY 1, 2),
         |sym AS (SELECT pa AS p, pb AS q, n, wa AS w FROM bt
         |        UNION ALL SELECT pb, pa, n, n - wa FROM bt),
         |pl AS (SELECT p, CAST(sum(n) AS BIGINT) AS games,
         |         CAST(sum(w) AS BIGINT) AS wins FROM sym GROUP BY p),
         |r0 AS (SELECT p, CAST(${ModelOps.BtScale} AS BIGINT) AS pi FROM pl),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT pl.p AS player, pl.games, pl.wins,
         |  CAST(r3.pi AS BIGINT) AS rating_fx
         |FROM pl JOIN r3 ON r3.p = pl.p""".stripMargin
    },

    // Doubled-midrank replay (2·cum + t + 1), exact tie term, the
    // identical fixed-order double chain for z², the shared 1.96²
    // literal.
    "q_mann_whitney" -> {
      val crit = dlit(ExperimentOps.MwZ2Crit)
      val z2 = "3.0e0 * (CAST(u2_a - n_a * n_b AS DOUBLE) * " +
        "CAST(u2_a - n_a * n_b AS DOUBLE)) * CAST(n AS DOUBLE) * " +
        "CAST(n - 1 AS DOUBLE) / (CAST(n_a AS DOUBLE) * " +
        "CAST(n_b AS DOUBLE) * CAST(m AS DOUBLE))"
      s"""WITH v AS (SELECT c_mktsegment = 'BUILDING' AS a,
         |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
         |  FROM customer
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
         |    AND c_acctbal IS NOT NULL),
         |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a
         |  FROM v GROUP BY v),
         |cum AS (SELECT cnt, cnt_a,
         |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum
         |  FROM byv),
         |ag AS (SELECT CAST(coalesce(sum(cnt_a), 0) AS BIGINT) AS n_a,
         |    CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n,
         |    CAST(coalesce(sum(cnt_a * (2 * cum + cnt + 1)), 0) AS BIGINT)
         |      AS r2a,
         |    CAST(coalesce(sum(cnt * cnt * cnt - cnt), 0) AS BIGINT)
         |      AS t_ties
         |  FROM cum),
         |fin AS (SELECT n_a, n - n_a AS n_b,
         |    r2a - n_a * (n_a + 1) AS u2_a, t_ties, n,
         |    (n + 1) * n * (n - 1) - t_ties AS m
         |  FROM ag)
         |SELECT n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CAST(u2_a AS BIGINT) AS u2_a, t_ties,
         |  CASE WHEN n_a > 0 AND n_b > 0 AND m > 0 THEN $z2 END AS z2,
         |  CASE WHEN n_a > 0 AND n_b > 0 AND m > 0
         |       THEN CAST($z2 >= $crit AS INT) END AS significant
         |FROM fin""".stripMargin
    },

    // The splitmix relabeling replayed in HUGEINT (mixSql parity bit),
    // per-replicate sums, the identical two-division mean chain, the
    // add-one integer p-value.
    "q_permutation_test" ->
      s"""WITH base AS (SELECT o_orderkey AS id, o_orderstatus = 'O' AS a,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
         |  FROM orders WHERE o_orderstatus IN ('O', 'F')
         |    AND o_totalprice IS NOT NULL),
         |obs AS (SELECT
         |    CAST(coalesce(sum(CASE WHEN a THEN c END), 0) AS BIGINT) AS sa,
         |    CAST(coalesce(sum(CASE WHEN a THEN 1 END), 0) AS BIGINT) AS na,
         |    CAST(coalesce(sum(CASE WHEN NOT a THEN c END), 0) AS BIGINT)
         |      AS sb,
         |    CAST(coalesce(sum(CASE WHEN NOT a THEN 1 END), 0) AS BIGINT)
         |      AS nb
         |  FROM base),
         |o2 AS (SELECT na + nb AS n_units,
         |    CASE WHEN na > 0 AND nb > 0
         |         THEN CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
         |            - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) END AS d_obs
         |  FROM obs),
         |rp AS (SELECT id, c, t.range AS r FROM base CROSS JOIN range(0, 64) t),
         |m AS (SELECT c, r,
         |  ${RefQueries.mixSql("h", "(id::HUGEINT * 1000003 + r) * 2654435761 + 97")}
         |  FROM rp),
         |pr AS (SELECT r,
         |    CAST(coalesce(sum(CASE WHEN hm % 2 = 1 THEN c END), 0)
         |      AS BIGINT) AS sa,
         |    CAST(coalesce(sum(CASE WHEN hm % 2 = 1 THEN 1 END), 0)
         |      AS BIGINT) AS na,
         |    CAST(coalesce(sum(CASE WHEN hm % 2 = 0 THEN c END), 0)
         |      AS BIGINT) AS sb,
         |    CAST(coalesce(sum(CASE WHEN hm % 2 = 0 THEN 1 END), 0)
         |      AS BIGINT) AS nb
         |  FROM m GROUP BY r),
         |dr AS (SELECT CASE WHEN na > 0 AND nb > 0
         |         THEN CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
         |            - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) END AS d
         |       FROM pr),
         |ex AS (SELECT CAST(coalesce(sum(CASE WHEN d IS NULL
         |           OR o2.d_obs IS NULL OR abs(d) >= abs(o2.d_obs)
         |         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge
         |       FROM dr, o2)
         |SELECT o2.n_units, CAST(64 AS BIGINT) AS n_reps, o2.d_obs,
         |  ex.n_ge, CAST(((1 + ex.n_ge) * 1000000) // 65 AS BIGINT)
         |    AS p_micro
         |FROM o2, ex""".stripMargin,

    // The q_ab_test affine-arm replay, per-stratum FILTER counts, the
    // same single divisions, weights via the 1-row totals frame.
    "q_stratified_effect" ->
      """WITH b AS (SELECT
        |    ((((o_custkey % 999999937) * 2654435761 + 104729) % 999999937)
        |      % 2) AS arm,
        |    o_orderpriority AS s,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |per AS (SELECT s,
        |    CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b,
        |    CAST(coalesce(sum(CASE WHEN arm = 0 THEN c END), 0) AS BIGINT)
        |      AS sa,
        |    CAST(coalesce(sum(CASE WHEN arm = 1 THEN c END), 0) AS BIGINT)
        |      AS sb
        |  FROM b GROUP BY s),
        |tot AS (SELECT CAST(sum(n_a + n_b) AS BIGINT) AS n_total FROM per)
        |SELECT per.s AS stratum, n_a, n_b,
        |  CASE WHEN n_a > 0
        |       THEN CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) END AS mean_a,
        |  CASE WHEN n_b > 0
        |       THEN CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b,
        |  mean_a - mean_b AS diff,
        |  CAST(((n_a + n_b) * 1000000) // n_total AS BIGINT) AS weight_micro
        |FROM per, tot""".stripMargin,

    // Inclusive cumulative CDFs per distinct value, totals as the last
    // cumulative (whole-frame window), the exact cross-multiplied gap,
    // the fixed-order double rejection rule.
    "q_ks_test" -> {
      val crit = dlit(ExperimentOps.KsC2Crit)
      s"""WITH v AS (SELECT o_orderstatus = 'O' AS a,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
         |  FROM orders WHERE o_orderstatus IN ('O', 'F')
         |    AND o_totalprice IS NOT NULL),
         |byv AS (SELECT v,
         |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca0,
         |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb0
         |  FROM v GROUP BY v),
         |cum AS (SELECT v, sum(ca0) OVER wv AS cum_a,
         |    sum(cb0) OVER wv AS cum_b
         |  FROM byv WINDOW wv AS (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |cum2 AS (SELECT cum_a, cum_b, max(cum_a) OVER () AS n_a,
         |    max(cum_b) OVER () AS n_b FROM cum),
         |g AS (SELECT CAST(coalesce(max(n_a), 0) AS BIGINT) AS n_a,
         |    CAST(coalesce(max(n_b), 0) AS BIGINT) AS n_b,
         |    CAST(coalesce(max(abs(cum_a * n_b - cum_b * n_a)), 0)
         |      AS BIGINT) AS d_num
         |  FROM cum2)
         |SELECT n_a, n_b, d_num,
         |  CASE WHEN n_a * n_b > 0
         |       THEN CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)
         |  END AS d_stat,
         |  CASE WHEN n_a * n_b > 0 THEN CAST(
         |    CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE) >=
         |      $crit * CAST(n_a + n_b AS DOUBLE) * CAST(n_a * n_b AS DOUBLE)
         |    AS INT) END AS significant
         |FROM g""".stripMargin
    },

    // The q_judge_agreement margin fragment as the score, then the
    // q_mann_whitney doubled-midrank replay and the single AUC division.
    "q_auc" -> {
      val vals = qualityLexicon.toSeq.sortBy(_._1)
        .map { case (k, v2) => s"('$k', CAST($v2 AS BIGINT))" }.mkString(", ")
      s"""WITH w(tok, wt) AS (VALUES $vals),
         |tk AS (SELECT doc_id, unnest(${S.tokens("lower(text)")}) AS tok
         |       FROM documents),
         |mm AS (SELECT doc_id, CAST(COALESCE(sum(wt), 0) AS BIGINT)
         |         AS margin
         |       FROM tk LEFT JOIN w USING (tok) GROUP BY doc_id),
         |v AS (SELECT d.lang = 'en' AS a, COALESCE(mm.margin, 0) AS v
         |      FROM documents d LEFT JOIN mm USING (doc_id)
         |      WHERE d.lang IS NOT NULL AND d.text IS NOT NULL),
         |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a
         |  FROM v GROUP BY v),
         |cum AS (SELECT cnt, cnt_a,
         |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum
         |  FROM byv),
         |ag AS (SELECT CAST(coalesce(sum(cnt_a), 0) AS BIGINT) AS n_pos,
         |    CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n,
         |    CAST(coalesce(sum(cnt_a * (2 * cum + cnt + 1)), 0) AS BIGINT)
         |      AS r2p
         |  FROM cum)
         |SELECT n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
         |  CAST(r2p - n_pos * (n_pos + 1) AS BIGINT) AS u2_pos,
         |  CASE WHEN n_pos > 0 AND n - n_pos > 0
         |       THEN CAST(r2p - n_pos * (n_pos + 1) AS DOUBLE)
         |          / CAST(2 * n_pos * (n - n_pos) AS DOUBLE)
         |  END AS auc
         |FROM ag""".stripMargin
    },

    // The engine's exact welchT chain: exact-long (n, Σx, Σx²) per arm,
    // the overflow-safe variance form, fixed-order t²/df doubles, the
    // shared 1.96² literal through the dlit discipline.
    "q_welch_t" ->
      """WITH v AS (
        |  SELECT (c_mktsegment = 'BUILDING') AS a,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
        |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |s AS (SELECT
        |    CAST(count(*) FILTER (WHERE a) AS BIGINT) AS n_a,
        |    CAST(coalesce(sum(v) FILTER (WHERE a), 0) AS BIGINT) AS s_a,
        |    CAST(coalesce(sum(v * v) FILTER (WHERE a), 0) AS BIGINT) AS q_a,
        |    CAST(count(*) FILTER (WHERE NOT a) AS BIGINT) AS n_b,
        |    CAST(coalesce(sum(v) FILTER (WHERE NOT a), 0) AS BIGINT) AS s_b,
        |    CAST(coalesce(sum(v * v) FILTER (WHERE NOT a), 0) AS BIGINT) AS q_b
        |  FROM v),
        |m AS (SELECT *,
        |    CASE WHEN n_a > 0
        |      THEN CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS mean_a,
        |    CASE WHEN n_b > 0
        |      THEN CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b,
        |    CASE WHEN n_a > 1
        |      THEN CAST(q_a AS DOUBLE) / CAST(n_a - 1 AS DOUBLE)
        |         - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |           * (CAST(s_a AS DOUBLE) / CAST(n_a - 1 AS DOUBLE))
        |    END AS var_a,
        |    CASE WHEN n_b > 1
        |      THEN CAST(q_b AS DOUBLE) / CAST(n_b - 1 AS DOUBLE)
        |         - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |           * (CAST(s_b AS DOUBLE) / CAST(n_b - 1 AS DOUBLE))
        |    END AS var_b
        |  FROM s),
        |t AS (SELECT *,
        |    var_a / CAST(n_a AS DOUBLE) AS ta,
        |    var_b / CAST(n_b AS DOUBLE) AS tb
        |  FROM m),
        |u AS (SELECT *, ta + tb AS se2, mean_a - mean_b AS d FROM t),
        |z AS (SELECT *,
        |    CASE WHEN se2 > 0.0 THEN d * d / se2 END AS t2,
        |    CASE WHEN se2 > 0.0 THEN se2 * se2
        |      / (ta * ta / CAST(n_a - 1 AS DOUBLE)
        |         + tb * tb / CAST(n_b - 1 AS DOUBLE)) END AS df_welch
        |  FROM u)
        |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b, t2, df_welch,
        |  CASE WHEN t2 IS NOT NULL THEN
        |    CAST(t2 >= CAST('3.8416' AS DOUBLE) AS INT) END AS significant
        |FROM z""".stripMargin,

    // Same margin CTEs as q_auc, the identical clamp/bin/telescoped-ECE
    // integer chain.
    "q_calibration_ece" -> {
      val vals = qualityLexicon.toSeq.sortBy(_._1)
        .map { case (k, v2) => s"('$k', CAST($v2 AS BIGINT))" }.mkString(", ")
      s"""WITH w(tok, wt) AS (VALUES $vals),
         |tk AS (SELECT doc_id, unnest(${S.tokens("lower(text)")}) AS tok
         |       FROM documents),
         |mm AS (SELECT doc_id, CAST(COALESCE(sum(wt), 0) AS BIGINT)
         |         AS margin
         |       FROM tk LEFT JOIN w USING (tok) GROUP BY doc_id),
         |ce_v AS (SELECT d.lang = 'en' AS y,
         |    greatest(CAST(0 AS BIGINT), least(CAST(1000000 AS BIGINT),
         |      COALESCE(mm.margin, 0) * 100000 + 500000)) AS s
         |  FROM documents d LEFT JOIN mm USING (doc_id)
         |  WHERE d.lang IS NOT NULL AND d.text IS NOT NULL),
         |ce_b AS (SELECT s // 100000 AS bin, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(sum(s) AS BIGINT) AS ssm
         |  FROM ce_v GROUP BY 1),
         |ce_f AS (SELECT *,
         |    abs(n_pos * 1000000 - ssm) AS dev_abs,
         |    CAST(sum(n) OVER () AS BIGINT) AS n_tot,
         |    CAST(sum(abs(n_pos * 1000000 - ssm)) OVER () AS BIGINT)
         |      AS dev_tot
         |  FROM ce_b)
         |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
         |  CAST(ssm // n AS BIGINT) AS conf_micro,
         |  CAST((n_pos * 1000000) // n AS BIGINT) AS acc_micro,
         |  CAST(dev_abs AS BIGINT) AS dev_abs,
         |  CAST(dev_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) / 1000000.0
         |    AS ece
         |FROM ce_f""".stripMargin
    },

    // Same margin/bin CTEs, the prefix sums as a window over the
    // ≤11-row frame, the identical minimax self-joins and intdiv
    // segment rates.
    "q_isotonic_fit" -> {
      val vals = qualityLexicon.toSeq.sortBy(_._1)
        .map { case (k, v2) => s"('$k', CAST($v2 AS BIGINT))" }.mkString(", ")
      s"""WITH w(tok, wt) AS (VALUES $vals),
         |tk AS (SELECT doc_id, unnest(${S.tokens("lower(text)")}) AS tok
         |       FROM documents),
         |mm AS (SELECT doc_id, CAST(COALESCE(sum(wt), 0) AS BIGINT)
         |         AS margin
         |       FROM tk LEFT JOIN w USING (tok) GROUP BY doc_id),
         |ce_v AS (SELECT d.lang = 'en' AS y,
         |    greatest(CAST(0 AS BIGINT), least(CAST(1000000 AS BIGINT),
         |      COALESCE(mm.margin, 0) * 100000 + 500000)) AS s
         |  FROM documents d LEFT JOIN mm USING (doc_id)
         |  WHERE d.lang IS NOT NULL AND d.text IS NOT NULL),
         |ib AS (SELECT s // 100000 AS bin, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |  FROM ce_v GROUP BY 1),
         |ipre AS (SELECT bin, n, n_pos,
         |    CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cn,
         |    CAST(sum(n_pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS cp
         |  FROM ib),
         |iseg AS (SELECT j.bin AS j, k.bin AS k,
         |    ((k.cp - (j.cp - j.n_pos)) * 1000000)
         |      // (k.cn - (j.cn - j.n)) AS avg_micro
         |  FROM ipre j JOIN ipre k ON j.bin <= k.bin),
         |imin AS (SELECT b.bin, s2.j, min(s2.avg_micro) AS mn
         |  FROM iseg s2 JOIN ib b ON s2.j <= b.bin AND b.bin <= s2.k
         |  GROUP BY 1, 2),
         |imax AS (SELECT bin, CAST(max(mn) AS BIGINT) AS iso_micro
         |  FROM imin GROUP BY bin)
         |SELECT CAST(b.bin AS BIGINT) AS bin, b.n, b.n_pos,
         |  CAST((b.n_pos * 1000000) // b.n AS BIGINT) AS raw_micro,
         |  iso_micro
         |FROM ib b JOIN imax USING (bin)""".stripMargin
    },

    // The engine's k-arm moment pivot replayed with the identical fixed
    // left-assoc SS chains (anovaFSql builds both sides from the same
    // group list).
    "q_anova_f" -> {
      val inList = MktSegments.map(g => s"'$g'").mkString(", ")
      s"""WITH av_v AS (
         |  SELECT c_mktsegment AS g,
         |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
         |  FROM customer
         |  WHERE c_mktsegment IN ($inList) AND c_acctbal IS NOT NULL),
         |${anovaFSql("av_v", MktSegments)}""".stripMargin
    },

    // Exact grouped lower median (2·cum >= total selection), |v − med|
    // deviations, then the same ANOVA chain over the deviation frame.
    "q_levene" -> {
      val inList = MktSegments.map(g => s"'$g'").mkString(", ")
      s"""WITH bf_rows AS (
         |  SELECT c_mktsegment AS g,
         |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
         |  FROM customer
         |  WHERE c_mktsegment IN ($inList) AND c_acctbal IS NOT NULL),
         |bf_byv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS w
         |  FROM bf_rows GROUP BY g, v),
         |bf_cum AS (SELECT g, v,
         |    CAST(sum(w) OVER (PARTITION BY g ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
         |    CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS tw
         |  FROM bf_byv),
         |bf_med AS (SELECT g, min(v) AS med
         |  FROM bf_cum WHERE 2 * cw >= tw GROUP BY g),
         |av_v AS (SELECT bf_rows.g AS g,
         |    CAST(abs(bf_rows.v - bf_med.med) AS BIGINT) AS v
         |  FROM bf_rows JOIN bf_med ON bf_rows.g = bf_med.g),
         |${anovaFSql("av_v", MktSegments)}""".stripMargin
    },

    // Same doubled-rank CTEs as q_mann_whitney on the O-vs-F order
    // values; the dominance difference u2_a − n_a·n_b is exact long,
    // one closing division, Romano thresholds through dlit.
    "q_cliffs_delta" ->
      s"""WITH v AS (SELECT o_orderstatus = 'O' AS a,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
         |  FROM orders
         |  WHERE o_orderstatus IN ('O', 'F') AND o_totalprice IS NOT NULL),
         |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a
         |  FROM v GROUP BY v),
         |cum AS (SELECT cnt, cnt_a,
         |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum
         |  FROM byv),
         |ag AS (SELECT CAST(coalesce(sum(cnt_a), 0) AS BIGINT) AS n_a,
         |    CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n,
         |    CAST(coalesce(sum(cnt_a * (2 * cum + cnt + 1)), 0) AS BIGINT)
         |      AS r2a
         |  FROM cum),
         |fin AS (SELECT n_a, n - n_a AS n_b,
         |    r2a - n_a * (n_a + 1) - n_a * (n - n_a) AS dom_diff,
         |    n_a * (n - n_a) AS prod
         |  FROM ag),
         |dl AS (SELECT n_a, CAST(n_b AS BIGINT) AS n_b,
         |    CAST(dom_diff AS BIGINT) AS dom_diff,
         |    CASE WHEN prod > 0
         |      THEN CAST(dom_diff AS DOUBLE) / CAST(prod AS DOUBLE)
         |    END AS delta
         |  FROM fin)
         |SELECT n_a, n_b, dom_diff, delta,
         |  CASE WHEN delta IS NOT NULL THEN
         |    CASE WHEN abs(delta) < ${dlit(0.147)} THEN 'negligible'
         |         WHEN abs(delta) < ${dlit(0.33)} THEN 'small'
         |         WHEN abs(delta) < ${dlit(0.474)} THEN 'medium'
         |         ELSE 'large' END
         |  END AS magnitude
         |FROM dl""".stripMargin,

    // The exact-long BH step-up: portable-md5 p_micro per hypothesis,
    // rank window over the hypothesis-bounded frame, cross-multiplied
    // acceptance p_micro*m <= rank*50000, rejection by rank <= k_max.
    "q_fdr_bh" ->
      s"""WITH g AS (
         |  SELECT DISTINCT source || '|' || lang AS h FROM documents
         |  WHERE lang IS NOT NULL AND source IS NOT NULL),
         |p AS (
         |  SELECT h, (CAST(('0x' || substring(md5(h), 1, 15)) AS BIGINT)
         |    % ${graft.ops.DedupOps.PortableHashPrime}) % 1000000 + 1
         |    AS p_micro
         |  FROM g),
         |r AS (
         |  SELECT h AS hyp, CAST(p_micro AS BIGINT) AS p_micro,
         |    CAST(row_number() OVER (ORDER BY p_micro, h) AS BIGINT)
         |      AS rank,
         |    CAST(count(*) OVER () AS BIGINT) AS m
         |  FROM p),
         |k AS (SELECT coalesce(max(CASE WHEN p_micro * m <= rank * 50000
         |        THEN rank END), 0) AS k_max FROM r)
         |SELECT hyp, p_micro, rank, m,
         |  CAST(CASE WHEN rank <= k_max THEN 1 ELSE 0 END AS INT)
         |    AS rejected
         |FROM r, k""".stripMargin,

    // Same conversion fixture and affine arms as q_ab_test; the MDE
    // chain against the shared dlit'd planning literal.
    "q_power_mde" -> {
      val zsum = dlit(ExperimentOps.PowerZSum)
      s"""WITH u AS (
         |  SELECT user_id,
         |    count(*) FILTER (WHERE event_type = 'purchase') AS np,
         |    count(*) FILTER (WHERE event_type = 'view') AS nv
         |  FROM events GROUP BY 1),
         |a AS (
         |  SELECT
         |    ((((user_id % 999999937) * 2654435761 + 104729) % 999999937)
         |      % 2) AS arm,
         |    CASE WHEN np >= nv THEN 1 ELSE 0 END AS converted
         |  FROM u),
         |sm AS (
         |  SELECT
         |    CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS users_a,
         |    CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS users_b,
         |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
         |      AS BIGINT) AS conv_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
         |      AS BIGINT) AS conv_b
         |  FROM a),
         |r AS (
         |  SELECT *,
         |    CASE WHEN users_a + users_b > 0
         |      THEN (conv_a + conv_b) / (users_a + users_b) END AS pool,
         |    users_a > 0 AND users_b > 0 AND conv_a + conv_b > 0
         |      AND conv_a + conv_b < users_a + users_b AS ok
         |  FROM sm),
         |f AS (
         |  SELECT *,
         |    CASE WHEN ok THEN $zsum * sqrt(pool * (1.0 - pool)
         |      * (1.0 / users_a + 1.0 / users_b)) END AS mde
         |  FROM r)
         |SELECT users_a, users_b, conv_a, conv_b,
         |  pool AS pool_rate, mde AS mde_abs,
         |  CASE WHEN ok THEN mde / pool END AS mde_rel
         |FROM f""".stripMargin
    },

    // Same distinct-value weight frame; the cumulative scan is a plain
    // per-group window (the oracle needs correctness, not the scale
    // shape), the same exact-long median cut.
    "q_weighted_median" ->
      """WITH byv AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 0
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v, w,
        |    CAST(coalesce(sum(w) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS pre_w,
        |    CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS tot_w
        |  FROM byv)
        |SELECT g AS "group", CAST(min(v) AS BIGINT) AS w_median,
        |  CAST(max(tot_w) AS BIGINT) AS w_total,
        |  CAST(count(*) AS BIGINT) AS n_upper
        |FROM cum WHERE 2 * (pre_w + w) >= tot_w GROUP BY g""".stripMargin,

    // Full life-table replay: the same subject frame, at-risk counts via
    // the exclusive prefix window, the 20-round fixed-point log2 unrolled
    // over every (n_risk, n_risk−d) value, intdiv hazard.
    "q_km_lifetable" ->
      s"""WITH u AS ($survSubjSql),
         |subj AS (
         |  SELECT CASE WHEN conv IS NOT NULL THEN conv - entry
         |              ELSE 30 - entry END AS v,
         |         CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS e
         |  FROM u),
         |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(e) AS BIGINT) AS d
         |  FROM subj GROUP BY v),
         |risk AS (SELECT v, cnt, d,
         |    CAST(sum(cnt) OVER ()
         |      - coalesce(sum(cnt) OVER (ORDER BY v
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS n_risk
         |  FROM byv),
         |vals AS (SELECT DISTINCT v FROM (
         |  SELECT n_risk AS v FROM risk WHERE d > 0 AND d < n_risk
         |  UNION ALL
         |  SELECT n_risk - d FROM risk WHERE d > 0 AND d < n_risk)),
         |${QueryShared.log2FixedSql("vals")},
         |inc AS (SELECT r.v, r.cnt, r.d, r.n_risk,
         |    CAST(r.d * 1000000 // r.n_risk AS BIGINT) AS hz,
         |    CASE WHEN r.d = 0 OR r.d = r.n_risk THEN 0
         |         ELSE ls.lg - lr.lg END AS dlog,
         |    CASE WHEN r.d = r.n_risk AND r.d > 0 THEN 1 ELSE 0 END AS dead
         |  FROM risk r
         |  LEFT JOIN lg ls ON ls.v = r.n_risk - r.d
         |  LEFT JOIN lg lr ON lr.v = r.n_risk),
         |cum AS (SELECT v, cnt, d, n_risk, hz,
         |    CAST(sum(hz) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS chz,
         |    CAST(sum(dlog) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cdlog,
         |    CAST(sum(dead) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cdead
         |  FROM inc)
         |SELECT v AS t, n_risk, d, CAST(cnt - d AS BIGINT) AS c,
         |  hz AS hazard_micro, chz AS cumhaz_micro,
         |  CASE WHEN cdead = 0 THEN cdlog END AS km_log2fx,
         |  CAST(CASE WHEN cdead > 0 THEN 1 ELSE 0 END AS INT) AS km_zero
         |FROM cum""".stripMargin,

    // Same subject frame + affine arms; per-event-time O−E and
    // hypergeometric-variance terms in the identical all-double chains.
    "q_logrank" ->
      """WITH u AS (%SUBJ%),
        |subj AS (
        |  SELECT CASE WHEN conv IS NOT NULL THEN conv - entry
        |              ELSE 30 - entry END AS v,
        |         CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS e,
        |         ((((user_id % 999999937) * 2654435761 + 104729)
        |           % 999999937) % 2) = 0 AS a
        |  FROM u),
        |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |    CAST(sum(e) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN a THEN e ELSE 0 END) AS BIGINT) AS d_a
        |  FROM subj GROUP BY v),
        |risk AS (SELECT v, d, d_a,
        |    CAST(sum(cnt) OVER ()
        |      - coalesce(sum(cnt) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n,
        |    CAST(sum(cnt_a) OVER ()
        |      - coalesce(sum(cnt_a) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_a
        |  FROM byv)
        |SELECT v AS t, n, n_a, d, d_a,
        |  CAST(d_a AS DOUBLE)
        |    - CAST(d AS DOUBLE) * CAST(n_a AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS term_oe,
        |  CASE WHEN n > 1 THEN
        |    CAST(d AS DOUBLE) * CAST(n - d AS DOUBLE) * CAST(n_a AS DOUBLE)
        |      * CAST(n - n_a AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |         * CAST(n - 1 AS DOUBLE)) END AS term_var
        |FROM risk WHERE d > 0""".stripMargin
        .replace("%SUBJ%", survSubjSql),

    // Affine arms, ×4 look replicate, cumulative FILTERed counts, the
    // identical pooled-z² chain per look, the shared Pocock literal,
    // first-crossing via a frame-global window min.
    "q_seq_monitor" -> {
      val crit = dlit(SurvivalOps.PocockZ2CritK4)
      val z2 = "(ra - rb) * (ra - rb) / (pool * (1.0e0 - pool) * " +
        "(1.0e0 / CAST(n_a AS DOUBLE) + 1.0e0 / CAST(n_b AS DOUBLE)))"
      s"""WITH u AS ($survSubjSql),
         |armed AS (
         |  SELECT ((((user_id % 999999937) * 2654435761 + 104729)
         |      % 999999937) % 2) AS arm,
         |    entry, conv
         |  FROM u),
         |looks(look) AS (VALUES (7), (14), (21), (28)),
         |pl AS (
         |  SELECT CAST(look AS BIGINT) AS look,
         |    CAST(count(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n_a,
         |    CAST(count(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n_b,
         |    CAST(coalesce(sum(CASE WHEN arm = 0 AND conv <= look
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS x_a,
         |    CAST(coalesce(sum(CASE WHEN arm = 1 AND conv <= look
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS x_b
         |  FROM armed CROSS JOIN looks
         |  WHERE entry <= look
         |  GROUP BY look),
         |sc AS (
         |  SELECT look, n_a, x_a, n_b, x_b,
         |    CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
         |              AND x_a + x_b < n_a + n_b
         |         THEN $z2 END AS z2
         |  FROM (SELECT look, n_a, x_a, n_b, x_b,
         |          CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
         |          CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
         |          CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
         |            AS pool
         |        FROM pl))
         |SELECT look, n_a, x_a, n_b, x_b, z2,
         |  coalesce(CAST(z2 >= $crit AS INT), 0) AS crossed,
         |  min(CASE WHEN z2 >= $crit THEN look END) OVER () AS stop_look
         |FROM sc""".stripMargin
    },

    // Per-user pre/post purchase cents (absent period = 0), the affine
    // treat flag, ONE 8-sum aggregate, identical mean and DiD chains.
    "q_did" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |      AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) < 15
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
        |      AS BIGINT) AS pre_cents,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |      AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) >= 15
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
        |      AS BIGINT) AS post_cents
        |  FROM events GROUP BY user_id),
        |cells AS (
        |  SELECT ((((user_id % 999999937) * 2654435761 + 104729)
        |      % 999999937) % 2) = 0 AS tr,
        |    po,
        |    CASE WHEN po THEN post_cents ELSE pre_cents END AS y
        |  FROM pu, (VALUES (FALSE), (TRUE)) AS p(po)),
        |sums AS (
        |  SELECT
        |    CAST(count(CASE WHEN tr AND NOT po THEN 1 END) AS BIGINT)
        |      AS n_t_pre,
        |    CAST(coalesce(sum(CASE WHEN tr AND NOT po THEN y ELSE 0 END), 0)
        |      AS BIGINT) AS s_t_pre,
        |    CAST(count(CASE WHEN tr AND po THEN 1 END) AS BIGINT)
        |      AS n_t_post,
        |    CAST(coalesce(sum(CASE WHEN tr AND po THEN y ELSE 0 END), 0)
        |      AS BIGINT) AS s_t_post,
        |    CAST(count(CASE WHEN NOT tr AND NOT po THEN 1 END) AS BIGINT)
        |      AS n_c_pre,
        |    CAST(coalesce(sum(CASE WHEN NOT tr AND NOT po THEN y ELSE 0 END),
        |      0) AS BIGINT) AS s_c_pre,
        |    CAST(count(CASE WHEN NOT tr AND po THEN 1 END) AS BIGINT)
        |      AS n_c_post,
        |    CAST(coalesce(sum(CASE WHEN NOT tr AND po THEN y ELSE 0 END), 0)
        |      AS BIGINT) AS s_c_post
        |  FROM cells),
        |m AS (
        |  SELECT *,
        |    CASE WHEN n_t_pre > 0
        |      THEN CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE) END
        |      AS m_t_pre,
        |    CASE WHEN n_t_post > 0
        |      THEN CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE) END
        |      AS m_t_post,
        |    CASE WHEN n_c_pre > 0
        |      THEN CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE) END
        |      AS m_c_pre,
        |    CASE WHEN n_c_post > 0
        |      THEN CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE) END
        |      AS m_c_post
        |  FROM sums)
        |SELECT n_t_pre, s_t_pre, n_t_post, s_t_post,
        |  n_c_pre, s_c_pre, n_c_post, s_c_post,
        |  m_t_pre, m_t_post, m_c_pre, m_c_post,
        |  (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did
        |FROM m""".stripMargin,

    // Doubled-midrank replay per segment (the q_mann_whitney identity,
    // k-ary), exact tie term, the identical fixed-order H chain, the
    // shared χ²₄ literal.
    "q_kruskal_wallis" -> {
      val is = MktSegments.indices
      val crit = dlit(ExperimentOps.Chi2Crit4Df)
      val ccols = MktSegments.zipWithIndex.map { case (gl, i) =>
        s"CAST(count(*) FILTER (WHERE g = '$gl') AS BIGINT) AS c_$i"
      }.mkString(",\n    ")
      val aggs = is.map(i =>
        s"""CAST(coalesce(sum(c_$i), 0) AS BIGINT) AS n_$i,
           |    CAST(coalesce(sum(c_$i * (2 * cum + cnt + 1)), 0) AS BIGINT)
           |      AS r2_$i""".stripMargin).mkString(",\n    ")
      val terms = is.map(i =>
        s"""CASE WHEN n_$i > 0 THEN (CAST(r2_$i AS DOUBLE) *
           | CAST(r2_$i AS DOUBLE)) / CAST(n_$i AS DOUBLE)
           | ELSE CAST(0 AS DOUBLE) END""".stripMargin.replace("\n", ""))
        .mkString(" + ")
      val kExpr = is.map(i => s"CASE WHEN n_$i > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH v AS (SELECT c_mktsegment AS g,
         |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
         |  FROM customer
         |  WHERE c_mktsegment IN (${MktSegments.map(g => s"'$g'")
          .mkString(", ")})
         |    AND c_acctbal IS NOT NULL),
         |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    $ccols
         |  FROM v GROUP BY v),
         |cum AS (SELECT *,
         |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum
         |  FROM byv),
         |ag AS (SELECT
         |    $aggs,
         |    CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n,
         |    CAST(coalesce(sum(cnt * cnt * cnt - cnt), 0) AS BIGINT)
         |      AS t_ties
         |  FROM cum),
         |f AS (SELECT *, (n + 1) * n * (n - 1) AS tieden,
         |    CAST($kExpr AS BIGINT) AS k FROM ag),
         |hh AS (SELECT *,
         |    CASE WHEN n > 0 AND tieden > t_ties THEN
         |      (${dlit(3.0)} * ($terms)
         |         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + ${dlit(1.0)}))
         |       - ${dlit(3.0)} * (CAST(n AS DOUBLE) + ${dlit(1.0)}))
         |      / (${dlit(1.0)} - CAST(t_ties AS DOUBLE)
         |                        / CAST(tieden AS DOUBLE))
         |    END AS h
         |  FROM f)
         |SELECT k, n, t_ties, h,
         |  CASE WHEN h IS NOT NULL AND k = ${MktSegments.size}
         |       THEN CAST(h >= $crit AS INT) END AS significant
         |FROM hh""".stripMargin
    },

    // Cell-based concordance replay: per-level cumulative windows over
    // the distinct-value frame, row-local below/above folds, exact
    // doubled tie terms, the identical τ-b chain and the sign-split
    // division-direction-proof γ intdiv.
    "q_kendall_tau" -> {
      val is = PriorityLadder.indices
      val ccols = PriorityLadder.zipWithIndex.map { case (gl, i) =>
        s"CAST(count(*) FILTER (WHERE g = '$gl') AS BIGINT) AS c_$i"
      }.mkString(",\n    ")
      val pres = is.map(i =>
        s"""CAST(coalesce(sum(c_$i) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS p_$i""".stripMargin).mkString(",\n    ")
      def below(j: Int) =
        if (j == 0) "0" else (0 until j).map(i => s"p_$i").mkString(" + ")
      def above(j: Int) =
        if (j == is.last) "0"
        else (j + 1 to is.last).map(i => s"p_$i").mkString(" + ")
      val pRow = is.map(j => s"c_$j * (${below(j)})").mkString(" + ")
      val qRow = is.map(j => s"c_$j * (${above(j)})").mkString(" + ")
      val tots = is.map(i =>
        s"CAST(coalesce(sum(c_$i), 0) AS BIGINT) AS t_$i").mkString(",\n    ")
      val ty2 = is.map(i => s"(t_$i * (t_$i - 1))").mkString(" + ")
      s"""WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         |    o_orderpriority AS g
         |  FROM orders WHERE o_totalprice IS NOT NULL
         |    AND o_orderpriority IN (${PriorityLadder.map(g => s"'$g'")
          .mkString(", ")})),
         |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    $ccols
         |  FROM v GROUP BY v),
         |cum AS (SELECT *,
         |    $pres
         |  FROM byv),
         |ag AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n,
         |    CAST(coalesce(sum($pRow), 0) AS BIGINT) AS p_conc,
         |    CAST(coalesce(sum($qRow), 0) AS BIGINT) AS q_disc,
         |    CAST(coalesce(sum(cnt * (cnt - 1)), 0) AS BIGINT) AS tx2,
         |    $tots
         |  FROM cum),
         |fin AS (SELECT *, n * (n - 1) AS pairs2,
         |    CAST($ty2 AS BIGINT) AS ty2 FROM ag)
         |SELECT n, p_conc, q_disc, tx2, ty2,
         |  CASE WHEN pairs2 - tx2 > 0 AND pairs2 - ty2 > 0 THEN
         |    ${dlit(2.0)} * CAST(p_conc - q_disc AS DOUBLE)
         |      / sqrt(CAST(pairs2 - tx2 AS DOUBLE)
         |             * CAST(pairs2 - ty2 AS DOUBLE))
         |  END AS tau_b,
         |  CASE WHEN p_conc + q_disc > 0 THEN
         |    CASE WHEN p_conc >= q_disc
         |      THEN CAST((1000000 * (p_conc - q_disc))
         |                // (p_conc + q_disc) AS BIGINT)
         |      ELSE -CAST((1000000 * (q_disc - p_conc))
         |                 // (p_conc + q_disc) AS BIGINT) END
         |  END AS gamma_micro
         |FROM fin""".stripMargin
    },

    // Discordant-cell counts over the joined margin/rule predictions,
    // the identical (b−c)²/(b+c) chain, the shared χ²₁ literal.
    "q_mcnemar" ->
      s"""WITH $lexMarginCtes,
         |v AS (SELECT
         |    (COALESCE(mm.margin, 0) > 0) = (d.lang = 'en') AS r1,
         |    list_contains(${S.tokens("lower(d.text)")}, 'data')
         |      = (d.lang = 'en') AS r2
         |  FROM documents d LEFT JOIN mm USING (doc_id)
         |  WHERE d.lang IS NOT NULL AND d.text IS NOT NULL),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(coalesce(sum(CASE WHEN r1 AND NOT r2 THEN 1 END), 0)
         |      AS BIGINT) AS b_only,
         |    CAST(coalesce(sum(CASE WHEN NOT r1 AND r2 THEN 1 END), 0)
         |      AS BIGINT) AS c_only
         |  FROM v),
         |c2 AS (SELECT *,
         |    CASE WHEN b_only + c_only > 0 THEN
         |      (CAST(b_only - c_only AS DOUBLE)
         |       * CAST(b_only - c_only AS DOUBLE))
         |      / CAST(b_only + c_only AS DOUBLE) END AS chi2
         |  FROM m)
         |SELECT n, b_only, c_only, chi2,
         |  CASE WHEN chi2 IS NOT NULL
         |       THEN CAST(chi2 >= ${dlit(ExperimentOps.MwZ2Crit)} AS INT)
         |  END AS significant
         |FROM c2""".stripMargin,

    // Row-local pass-count moments, pivoted column totals, the
    // identical fixed Q chain, the shared χ²₂ literal.
    "q_cochran_q" ->
      s"""WITH $lexMarginCtes,
         |v AS (SELECT
         |    CASE WHEN d.n_chars >= 120 THEN 1 ELSE 0 END AS f0,
         |    CASE WHEN COALESCE(mm.margin, 0) > 0 THEN 1 ELSE 0 END AS f1,
         |    CASE WHEN list_contains(${S.tokens("lower(d.text)")}, 'the')
         |      THEN 1 ELSE 0 END AS f2
         |  FROM documents d LEFT JOIN mm USING (doc_id)
         |  WHERE d.text IS NOT NULL AND d.n_chars IS NOT NULL),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(coalesce(sum(f0), 0) AS BIGINT) AS g_0,
         |    CAST(coalesce(sum(f1), 0) AS BIGINT) AS g_1,
         |    CAST(coalesce(sum(f2), 0) AS BIGINT) AS g_2,
         |    CAST(coalesce(sum(f0 + f1 + f2), 0) AS BIGINT) AS sum_l,
         |    CAST(coalesce(sum((f0 + f1 + f2) * (f0 + f1 + f2)), 0)
         |      AS BIGINT) AS sum_l2
         |  FROM v),
         |qq AS (SELECT *,
         |    CASE WHEN ${dlit(3.0)} * CAST(sum_l AS DOUBLE)
         |              - CAST(sum_l2 AS DOUBLE) > ${dlit(0.0)} THEN
         |      ${dlit(2.0)} * (${dlit(3.0)} *
         |          (CAST(g_0 AS DOUBLE) * CAST(g_0 AS DOUBLE)
         |           + CAST(g_1 AS DOUBLE) * CAST(g_1 AS DOUBLE)
         |           + CAST(g_2 AS DOUBLE) * CAST(g_2 AS DOUBLE))
         |        - CAST(sum_l AS DOUBLE) * CAST(sum_l AS DOUBLE))
         |      / (${dlit(3.0)} * CAST(sum_l AS DOUBLE)
         |         - CAST(sum_l2 AS DOUBLE)) END AS q_stat
         |  FROM m)
         |SELECT n, g_0 AS n_len, g_1 AS n_lex, g_2 AS n_stop, q_stat,
         |  CASE WHEN q_stat IS NOT NULL
         |       THEN CAST(q_stat >= ${dlit(ExperimentOps.Chi2Crit2Df)}
         |                 AS INT) END AS significant
         |FROM qq""".stripMargin,

    // Naive single-window replay of the two-phase runs count, then the
    // identical z² chain against the shared 1.96² literal.
    "q_runs_test" ->
      s"""WITH v AS (SELECT o_orderkey AS s, o_orderstatus = 'O' AS f
         |  FROM orders
         |  WHERE o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL),
         |l AS (SELECT f,
         |    CASE WHEN lag(f) OVER (ORDER BY s) IS NOT NULL
         |          AND f <> lag(f) OVER (ORDER BY s)
         |         THEN 1 ELSE 0 END AS chg
         |  FROM v),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(coalesce(sum(CASE WHEN f THEN 1 END), 0) AS BIGINT) AS n1,
         |    CAST(coalesce(sum(chg), -1) AS BIGINT) AS chgs
         |  FROM l),
         |f2 AS (SELECT n, n1, n - n1 AS n0,
         |    CASE WHEN n > 0 THEN chgs + 1 ELSE 0 END AS runs FROM m),
         |f3 AS (SELECT *, 2 * n1 * n0 AS a,
         |    runs * n - n - 2 * n1 * n0 AS d FROM f2),
         |f4 AS (SELECT *,
         |    CASE WHEN n1 > 0 AND n0 > 0 AND a > n THEN
         |      (CAST(d AS DOUBLE) * CAST(d AS DOUBLE))
         |        * CAST(n - 1 AS DOUBLE)
         |      / (CAST(a AS DOUBLE) * CAST(a - n AS DOUBLE)) END AS z2
         |  FROM f3)
         |SELECT n, n1, CAST(n0 AS BIGINT) AS n0, CAST(runs AS BIGINT) AS runs,
         |  z2,
         |  CASE WHEN z2 IS NOT NULL
         |       THEN CAST(z2 >= ${dlit(ExperimentOps.MwZ2Crit)} AS INT)
         |  END AS significant
         |FROM f4""".stripMargin,

    // The q_auc margin frame swept over every distinct score: exact
    // ×10⁶ intdiv depth/precision/recall, lift as the identical fixed
    // two-division chain.
    "q_lift_gains" ->
      s"""WITH $lexMarginCtes,
         |v AS (SELECT d.lang = 'en' AS y, COALESCE(mm.margin, 0) AS v
         |  FROM documents d LEFT JOIN mm USING (doc_id)
         |  WHERE d.lang IS NOT NULL AND d.text IS NOT NULL),
         |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(coalesce(sum(CASE WHEN y THEN 1 END), 0) AS BIGINT) AS pos
         |  FROM v GROUP BY v),
         |cum AS (SELECT v, cnt, pos,
         |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS pre_cnt,
         |    CAST(coalesce(sum(pos) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS pre_pos,
         |    CAST(sum(cnt) OVER () AS BIGINT) AS tot_cnt,
         |    CAST(sum(pos) OVER () AS BIGINT) AS tot_pos
         |  FROM byv)
         |SELECT v AS score,
         |  CAST(tot_cnt - pre_cnt AS BIGINT) AS n_ge,
         |  CAST(tot_pos - pre_pos AS BIGINT) AS pos_ge,
         |  CAST((1000000 * (tot_cnt - pre_cnt)) // tot_cnt AS BIGINT)
         |    AS depth_micro,
         |  CAST((1000000 * (tot_pos - pre_pos)) // (tot_cnt - pre_cnt)
         |    AS BIGINT) AS precision_micro,
         |  CASE WHEN tot_pos > 0 THEN
         |    CAST((1000000 * (tot_pos - pre_pos)) // tot_pos AS BIGINT)
         |  END AS recall_micro,
         |  CASE WHEN tot_pos > 0 AND tot_cnt - pre_cnt > 0 THEN
         |    (CAST(tot_pos - pre_pos AS DOUBLE)
         |     / CAST(tot_cnt - pre_cnt AS DOUBLE))
         |    / (CAST(tot_pos AS DOUBLE) / CAST(tot_cnt AS DOUBLE))
         |  END AS lift
         |FROM cum""".stripMargin,

    // The daily series replayed with HUGEINT moments (exact 128-bit,
    // the decimal-128 twin), identical n²-scaled centered sums, one
    // division per lag.
    "q_acf" -> {
      val lags = 1 to 7
      val lagCols = lags.map(l => s"lag(x, $l) OVER w AS x_$l")
        .mkString(",\n    ")
      val perLag = lags.map(l =>
        s"""CAST(count(x_$l) AS BIGINT) AS np_$l,
           |    coalesce(sum(CAST(x AS HUGEINT) * CAST(x_$l AS HUGEINT)), 0)
           |      AS cross_$l,
           |    coalesce(sum(CASE WHEN x_$l IS NOT NULL
           |      THEN CAST(x AS HUGEINT) END), 0) AS t_$l,
           |    coalesce(sum(CAST(x_$l AS HUGEINT)), 0) AS h_$l""".stripMargin)
        .mkString(",\n    ")
      val rows = lags.map { l =>
        val num = s"nh * nh * cross_$l - nh * s * (h_$l + t_$l)" +
          s" + (nh - $l) * s * s"
        val dw =
          if (l == 1)
            """CASE WHEN den > 0 THEN CAST(nh * nh * sd2 AS DOUBLE)
              |      / CAST(den AS DOUBLE) END""".stripMargin
          else "CAST(NULL AS DOUBLE)"
        s"""SELECT CAST($l AS INT) AS lag, np_$l AS n_pairs,
           |  CASE WHEN den > 0 AND np_$l > 0 THEN CAST($num AS DOUBLE)
           |    / CAST(den AS DOUBLE) END AS acf,
           |  $dw AS dw
           |FROM f2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
         |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         |      AS BIGINT) AS x
         |  FROM orders
         |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
         |  GROUP BY 1),
         |lg AS (SELECT x,
         |    $lagCols
         |  FROM daily WINDOW w AS (ORDER BY dt)),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    coalesce(sum(CAST(x AS HUGEINT)), 0) AS s,
         |    coalesce(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)), 0)
         |      AS sxx,
         |    coalesce(sum(CAST(x - x_1 AS HUGEINT)
         |      * CAST(x - x_1 AS HUGEINT)), 0) AS sd2,
         |    $perLag
         |  FROM lg),
         |f AS (SELECT *, CAST(n AS HUGEINT) AS nh FROM ag),
         |f2 AS (SELECT *, nh * nh * sxx - nh * s * s AS den FROM f)
         |$rows""".stripMargin
    },

    // The affine arm replay, exact cross-multiplied directions per
    // stratum and pooled, the same census and strict-reversal flag.
    "q_simpson_paradox" ->
      """WITH b AS (SELECT c_mktsegment AS s,
        |    ((((c_custkey % 999999937) * 2654435761 + 104729)
        |      % 999999937) % 2) = 0 AS a,
        |    CASE WHEN c_acctbal >= 0.0 THEN 1 ELSE 0 END AS y
        |  FROM customer
        |  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
        |    AND c_custkey IS NOT NULL),
        |per AS (SELECT s,
        |    CAST(coalesce(sum(CASE WHEN a THEN 1 END), 0) AS BIGINT)
        |      AS n_a,
        |    CAST(coalesce(sum(CASE WHEN a THEN y END), 0) AS BIGINT)
        |      AS c_a,
        |    CAST(coalesce(sum(CASE WHEN NOT a THEN 1 END), 0) AS BIGINT)
        |      AS n_b,
        |    CAST(coalesce(sum(CASE WHEN NOT a THEN y END), 0) AS BIGINT)
        |      AS c_b
        |  FROM b GROUP BY s),
        |wd AS (SELECT *, CASE WHEN n_a > 0 AND n_b > 0 THEN
        |      CASE WHEN c_a * n_b > c_b * n_a THEN 1
        |           WHEN c_a * n_b < c_b * n_a THEN -1 ELSE 0 END
        |    END AS dir FROM per),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(coalesce(sum(n_a), 0) AS BIGINT) AS t_na,
        |    CAST(coalesce(sum(c_a), 0) AS BIGINT) AS t_ca,
        |    CAST(coalesce(sum(n_b), 0) AS BIGINT) AS t_nb,
        |    CAST(coalesce(sum(c_b), 0) AS BIGINT) AS t_cb,
        |    CAST(coalesce(sum(CASE WHEN dir = 1 THEN 1 END), 0)
        |      AS BIGINT) AS n_pos,
        |    CAST(coalesce(sum(CASE WHEN dir = -1 THEN 1 END), 0)
        |      AS BIGINT) AS n_neg,
        |    CAST(coalesce(sum(CASE WHEN dir = 0 THEN 1 END), 0)
        |      AS BIGINT) AS n_zero,
        |    CAST(coalesce(sum(CASE WHEN dir IS NULL THEN 1 END), 0)
        |      AS BIGINT) AS n_undef
        |  FROM wd),
        |f AS (SELECT *, CASE WHEN t_na > 0 AND t_nb > 0 THEN
        |      CASE WHEN t_ca * t_nb > t_cb * t_na THEN 1
        |           WHEN t_ca * t_nb < t_cb * t_na THEN -1 ELSE 0 END
        |    END AS pooled FROM m),
        |g AS (SELECT *,
        |    CASE WHEN pooled = 1 THEN n_pos
        |         WHEN pooled = -1 THEN n_neg END AS n_with,
        |    CASE WHEN pooled = 1 THEN n_neg
        |         WHEN pooled = -1 THEN n_pos END AS n_against
        |  FROM f)
        |SELECT n_strata, CAST(pooled AS BIGINT) AS pooled_dir,
        |  n_with, n_against, n_zero, n_undef,
        |  CAST(coalesce(pooled IS NOT NULL AND pooled <> 0
        |    AND n_with = 0 AND n_against > 0, false) AS INT) AS paradox
        |FROM g""".stripMargin,

    // Heap replay (ORDER BY DESC LIMIT k+1), the lg table over the
    // survivor values, the identical intdiv and ln2 chain.
    "q_tail_index" ->
      s"""WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x
         |  FROM orders WHERE o_totalprice IS NOT NULL
         |    AND round(o_totalprice * 100) > 0),
         |tp AS (SELECT x FROM v ORDER BY x DESC LIMIT 65),
         |rk AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS r
         |       FROM tp),
         |vals AS (SELECT DISTINCT x AS v FROM rk),
         |${log2FixedSql("vals")},
         |j AS (SELECT rk.r, rk.x, lg.lg FROM rk JOIN lg ON lg.v = rk.x),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_top,
         |    CAST(coalesce(sum(CASE WHEN r <= 64 THEN lg END), 0)
         |      AS BIGINT) AS sum_lg,
         |    CAST(coalesce(max(CASE WHEN r = 65 THEN lg END), 0)
         |      AS BIGINT) AS lg_thr,
         |    CAST(coalesce(max(CASE WHEN r = 65 THEN x END), 0)
         |      AS BIGINT) AS x_thr
         |  FROM j)
         |SELECT n_top, CAST(64 AS BIGINT) AS k, x_thr AS x_threshold,
         |  CASE WHEN n_top = 65 AND sum_lg - 64 * lg_thr > 0
         |    THEN CAST((sum_lg - 64 * lg_thr) // 64 AS BIGINT)
         |  END AS h_log2fx,
         |  CASE WHEN n_top = 65 AND sum_lg - 64 * lg_thr > 0
         |    THEN CAST(67108864 AS DOUBLE)
         |      / (CAST(sum_lg - 64 * lg_thr AS DOUBLE)
         |         * ${dlit(ProfileOps.Ln2)})
         |  END AS alpha
         |FROM m""".stripMargin,

    // The same fixed-grid candidate scoring in HUGEINT, the identical
    // (score desc, day asc) argmax.
    "q_changepoint" ->
      """WITH daily AS (SELECT
        |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |sc AS (SELECT d, row_number() OVER (ORDER BY d) AS i,
        |    sum(x) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1,
        |    count(*) OVER () AS n, sum(x) OVER () AS s
        |  FROM daily),
        |f AS (SELECT *,
        |    CAST(((CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
        |        * CAST(n - i AS HUGEINT)
        |      + CAST(s - s1 AS HUGEINT) * CAST(s - s1 AS HUGEINT)
        |        * CAST(i AS HUGEINT)) * 1048576)
        |      // (CAST(i AS HUGEINT) * CAST(n - i AS HUGEINT)
        |         * CAST(s AS HUGEINT)) AS BIGINT) AS score_fx
        |  FROM sc WHERE i < n AND s > 0),
        |r AS (SELECT * FROM f ORDER BY score_fx DESC, d LIMIT 1)
        |SELECT CAST(n AS BIGINT) AS n_days, CAST(d AS BIGINT) AS split_d,
        |  CAST(i AS BIGINT) AS n_left, CAST(n - i AS BIGINT) AS n_right,
        |  CAST(s1 AS BIGINT) AS sum_left,
        |  CAST(s - s1 AS BIGINT) AS sum_right, score_fx,
        |  CAST((CAST(s AS HUGEINT) * 1048576) // n AS BIGINT) AS base_fx
        |FROM r""".stripMargin,

    // Same grouped rank window and boundary-rank join; shares exact
    // ×10⁶ intdiv (cum at a rank is tie-order-invariant: any order of
    // equal values sums identically).
    "q_lorenz" ->
      """WITH b AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS x
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |rkd AS (SELECT g, x,
        |    row_number() OVER (PARTITION BY g ORDER BY x) AS r,
        |    sum(x) OVER (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM b),
        |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS total FROM b GROUP BY g),
        |bd AS (SELECT g, n, total, k AS decile, (k * n) // 10
        |    AS boundary_rank
        |  FROM tot CROSS JOIN (SELECT unnest(range(1, 11)) AS k))
        |SELECT bd.g AS source, CAST(bd.decile AS BIGINT) AS decile,
        |  CAST(bd.boundary_rank AS BIGINT) AS boundary_rank,
        |  CASE WHEN bd.total > 0 THEN
        |    CAST(coalesce((1000000 * r2.cum) // bd.total, 0) AS BIGINT)
        |  END AS share_micro
        |FROM bd LEFT JOIN rkd r2
        |  ON r2.g = bd.g AND r2.r = bd.boundary_rank""".stripMargin,

    // Cell counts, window marginals, the identical log2Fixed term
    // replay, HUGEINT accumulation, the shared ln2 nats chain.
    "q_gtest" -> {
      val ladder = PriorityLadder.map(g => s"'$g'").mkString(", ")
      val statuses = OrderStatuses.map(g => s"'$g'").mkString(", ")
      val gnats = s"CAST(g_log2fx AS DOUBLE) * ${dlit(ProfileOps.Ln2)}" +
        s" / ${dlit(1048576.0)}"
      s"""WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
         |    CAST(count(*) AS BIGINT) AS o
         |  FROM orders WHERE o_orderpriority IN ($ladder)
         |    AND o_orderstatus IN ($statuses)
         |  GROUP BY 1, 2),
         |mg AS (SELECT *,
         |    CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS r,
         |    CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS c,
         |    CAST(sum(o) OVER () AS BIGINT) AS nn FROM cells),
         |vals AS (SELECT DISTINCT o * nn AS v FROM mg
         |         UNION SELECT DISTINCT r * c FROM mg),
         |${log2FixedSql("vals")},
         |tm AS (SELECT mg.a, mg.b, mg.nn,
         |    CAST(mg.o AS HUGEINT) * (l1.lg - l2.lg) AS term
         |  FROM mg JOIN lg l1 ON l1.v = mg.o * mg.nn
         |          JOIN lg l2 ON l2.v = mg.r * mg.c),
         |m AS (SELECT CAST(coalesce(max(nn), 0) AS BIGINT) AS n,
         |    CAST(count(DISTINCT a) AS BIGINT) AS ka,
         |    CAST(count(DISTINCT b) AS BIGINT) AS kb,
         |    coalesce(sum(term), 0) AS num FROM tm),
         |ff AS (SELECT n, ka, kb,
         |    CAST(2 * num AS BIGINT) AS g_log2fx FROM m)
         |SELECT n, CAST(8 AS BIGINT) AS df, g_log2fx,
         |  $gnats AS g_nats,
         |  CASE WHEN ka = ${PriorityLadder.size} AND kb = ${
           OrderStatuses.size}
         |    THEN CAST($gnats >= ${dlit(ExperimentOps.Chi2Crit8Df)}
         |              AS INT) END AS significant
         |FROM ff""".stripMargin
    },

    // Per-group totals, the identical log2Fixed term replay (unrolled
    // mantissa rounds), HUGEINT accumulation, the sign-split intdiv.
    "q_theil" ->
      s"""WITH b AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS x
         |  FROM documents WHERE source IS NOT NULL AND n_chars > 0),
         |gt AS (SELECT g, CAST(count(*) AS BIGINT) AS nn,
         |    CAST(sum(x) AS BIGINT) AS tot FROM b GROUP BY g),
         |j AS (SELECT b.g, b.x, gt.nn, gt.tot FROM b JOIN gt USING (g)),
         |vals AS (SELECT DISTINCT x * nn AS v FROM j
         |         UNION SELECT DISTINCT tot FROM gt),
         |${log2FixedSql("vals")},
         |tm AS (SELECT j.g, j.nn, j.tot,
         |    CAST(j.x AS HUGEINT) * (l1.lg - l2.lg) AS term
         |  FROM j JOIN lg l1 ON l1.v = j.x * j.nn
         |         JOIN lg l2 ON l2.v = j.tot),
         |m AS (SELECT g, CAST(max(nn) AS BIGINT) AS n,
         |    CAST(max(tot) AS BIGINT) AS total,
         |    coalesce(sum(term), 0) AS num
         |  FROM tm GROUP BY g)
         |SELECT g AS source, n, total,
         |  CASE WHEN num >= 0 THEN CAST(num // total AS BIGINT)
         |       ELSE -CAST((-num) // total AS BIGINT) END AS theil_log2fx
         |FROM m""".stripMargin,

    // Portable (epoch_day+4) mod 7 bucketing, HUGEINT ×10⁶ intdiv.
    "q_seasonal_index" ->
      """WITH daily AS (SELECT
        |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |bd AS (SELECT (d + 4) % 7 AS dow, CAST(count(*) AS BIGINT)
        |    AS n_days, CAST(sum(x) AS BIGINT) AS cents
        |  FROM daily GROUP BY 1),
        |tt AS (SELECT bd.*, CAST(sum(n_days) OVER () AS BIGINT) AS n,
        |    CAST(sum(cents) OVER () AS BIGINT) AS s FROM bd)
        |SELECT CAST(dow AS BIGINT) AS dow, n_days, cents,
        |  CASE WHEN s > 0 THEN
        |    CAST((CAST(1000000 AS HUGEINT) * CAST(cents AS HUGEINT)
        |      * CAST(n AS HUGEINT)) // (n_days * s) AS BIGINT)
        |  END AS idx_micro
        |FROM tt""".stripMargin,

    // Per-user capture flags via bool_or, the exact Chapman intdiv.
    "q_capture_recapture" ->
      """WITH pu AS (SELECT user_id,
        |    bool_or(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      < 15) AS in1,
        |    bool_or(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      >= 15) AS in2
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |pf AS (SELECT user_id, coalesce(in1, false) AS in1,
        |    coalesce(in2, false) AS in2 FROM pu),
        |fl AS (SELECT * FROM pf WHERE in1 OR in2),
        |m AS (SELECT
        |    CAST(coalesce(sum(CASE WHEN in1 THEN 1 END), 0) AS BIGINT)
        |      AS n1,
        |    CAST(coalesce(sum(CASE WHEN in2 THEN 1 END), 0) AS BIGINT)
        |      AS n2,
        |    CAST(coalesce(sum(CASE WHEN in1 AND in2 THEN 1 END), 0)
        |      AS BIGINT) AS m_both,
        |    CAST(count(*) AS BIGINT) AS n_seen
        |  FROM fl)
        |SELECT n1, n2, m_both, n_seen,
        |  CAST((n1 + 1) * (n2 + 1) // (m_both + 1) - 1 AS BIGINT) AS n_hat,
        |  CAST(greatest(0, (n1 + 1) * (n2 + 1) // (m_both + 1) - 1 - n_seen)
        |    AS BIGINT) AS unseen_hat
        |FROM m""".stripMargin,
  )
}
