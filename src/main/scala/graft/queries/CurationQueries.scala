package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, TextOps}
import graft.streaming.{EventOps, IngestDedupStream}

import QueryShared._

/** Corpus curation: sampling, mixture planning, selection scores, privacy, data quality.
  *
  * Domain slice of the gated catalog (split out of PipelineQueries
  * in round 9); assembled and exposed by [[PipelineQueries]].
  */
private[queries] object CurationQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Model-based quality filtering (the GPT-3/fastText linear-classifier
    // shape): weights trained offline, applied at scale as a row-local
    // codegen'd hash-table fold. Margin is an exact integer.
    // 2-D Pareto frontier (skyline, Borzsonyi ICDE'01) over the curation
    // plane (minimize length, maximize classifier margin): "the best
    // quality at every token budget". Corpus collapses through ONE
    // map-side-combined groupBy(cost) to a value-domain-sized frame; the
    // only global sort runs over THAT frame; winners broadcast back as a
    // semi join. The oracle is the quadratic NOT EXISTS dominance
    // predicate — the completeness proof lives where quadratic cost
    // belongs.
    "q_pareto_frontier" -> ((s, dir) =>
      PrepOps.paretoFrontier(
        t(s, dir, "documents").select(
          col("doc_id"), col("n_chars"),
          TextOps.classifierMargin(col("text"), qualityLexicon)
            .as("margin")),
        cost = col("n_chars"), gain = col("margin"))),

    // Eval-set decontamination: per-doc fraction of distinct 3-shingles
    // found in the benchmark slice. Benchmark collapses to one broadcast
    // row of sorted shingle hashes; the corpus side is a pure map (zero
    // corpus shuffles). Oracle joins shingle STRINGS — an independent
    // formulation of the same set semantics (hash collisions at 2^-64).
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs
        .filter(col("source") === "src18" && col("lang") === "en")
        .select(col("text"))
      ContaminationOps.contaminationScores(
        docs.select(col("doc_id"), col("text")), "text", bench, "text", k = 3)
        .select(col("doc_id"), col("contamination"))
    }),

    // Corpus-slice leakage audit: pairwise distinct-shingle overlap matrix
    // between sources (hash-keyed; fan-out bounded by slices-per-shingle²).
    "q_source_overlap" -> ((s, dir) =>
      ContaminationOps.overlapMatrix(
        t(s, dir, "documents"), "source", "text", k = 3)),

    // Contrastive negatives: k=4 hash-driven partners per doc over the
    // checked-dense id domain — row-local after a 1-row bounds attach.
    "q_neg_samples" -> ((s, dir) =>
      PrepOps.negativeSamples(t(s, dir, "documents"), col("doc_id"), k = 4)
        .select(col("id").as("doc_id"), col("j"), col("neg_id"))),

    // Cross-lingual score calibration (the CCNet move): a raw quality
    // score is not comparable across languages, its within-language
    // percentile is. percent_rank = (rank-1)/(n-1) — a ratio of exact
    // integers, so the doubles hash-match any engine. Ties share a rank
    // (no arbitrary ordering leaks into the result).
    "q_score_calibrate" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).as("score"))
      scored.withColumn("cal",
        percent_rank().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("score"))))
    }),

    // Column-level data profiling (exact): per column, row/null/distinct
    // counts + stringified min/max. Each UNION leg prunes its scan to ONE
    // column (total bytes across legs == one full-width scan) and the
    // distinct count shuffles DISTINCT VALUES only. The single-pass HLL
    // variant (ProfileOps.profileApprox — one scan, zero row shuffle,
    // the 100 TB path for all-distinct id columns) is pinned against this
    // exact form in ProfileOpsSpec.
    "q_profile" -> ((s, dir) =>
      graft.ops.ProfileOps.profile(
        t(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),

    // Data-quality admission gate (Deequ-style): declarative row
    // constraints + key uniqueness, ONE scan, zero row shuffles (the
    // distinct-count leg shuffles key VALUES only). The en_only rule is
    // deliberately violated — both report branches (pass and fail with
    // exact violation counts) are exercised.
    "q_dq_checks" -> ((s, dir) =>
      graft.ops.DqOps.check(
        t(s, dir, "documents"),
        rules = Seq(
          "n_chars_nonneg" -> (col("n_chars") >= 0),
          "lang_known" ->
            col("lang").isin("en", "de", "fr", "es", "zh"),
          "text_nonempty" -> (length(col("text")) > 0),
          "en_only" -> (col("lang") === "en")),
        uniqueKeys = Seq("doc_id"))),

    // The curation pipeline end to end, composed entirely from gated
    // stages: chrome construction -> line-level boilerplate strip
    // (q_line_dedup's exact semantics) -> exact dedup of the CLEANED
    // text (chrome-insensitive: bodies identical after stripping
    // collapse) -> token-budget best-first selection. Every shuffle is
    // hash-keyed (line hash, text hash, score class) — the composition
    // adds no new scale risk beyond its audited pieces.
    "q_corpus_curate" -> ((s, dir) => {
      def nn(c: Column) = coalesce(c, lit(""))
      val built = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          concat(lit("== "), nn(col("source")), lit(" news ==")),
          concat(lit("promo "), (col("doc_id") % 97).cast("string")),
          nn(col("text")),
          lit("(c) all rights reserved")).as("text"))
      val stripped = DedupOps.lineDedup(built, "doc_id", "text", 8L)
      val deduped = DedupOps.exactDedup(
        stripped, "doc_id", col("text_clean"))
      SamplingOps.selectByBudget(
        deduped, "doc_id",
        scoreCol = TextOps.tokenCount(col("text_clean")),
        weightCol = length(col("text_clean")),
        budget = 30000L)
    }),

    // The curation funnel report — per-stage survivor counts and byte
    // volumes for q_corpus_curate's pipeline (the observability artifact
    // every production curation job emits next to its output). Each
    // stage's frame reduces to ONE (n, chars) row via map-side partial
    // aggregation before the union — stage outputs never co-shuffle.
    "q_curate_report" -> ((s, dir) => {
      def nn(c: Column) = coalesce(c, lit(""))
      val docs = t(s, dir, "documents")
      val built = docs.select(col("doc_id"),
        concat_ws("\n",
          concat(lit("== "), nn(col("source")), lit(" news ==")),
          concat(lit("promo "), (col("doc_id") % 97).cast("string")),
          nn(col("text")),
          lit("(c) all rights reserved")).as("text"))
      val stripped = DedupOps.lineDedup(built, "doc_id", "text", 8L)
      val deduped = DedupOps.exactDedup(stripped, "doc_id", col("text_clean"))
      val selected = SamplingOps.selectByBudget(
        deduped, "doc_id",
        scoreCol = TextOps.tokenCount(col("text_clean")),
        weightCol = length(col("text_clean")),
        budget = 30000L)
      def stageRow(name: String, df: DataFrame, chars: Column) =
        df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(chars.cast("long")), lit(0L)).as("n_chars"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_chars"))
      stageRow("0_input", docs, length(nn(col("text"))))
        .unionByName(stageRow("1_built", built, length(col("text"))))
        .unionByName(stageRow("2_stripped", stripped, length(col("text_clean"))))
        .unionByName(stageRow("3_deduped", deduped, length(col("text_clean"))))
        .unionByName(stageRow("4_selected", selected, col("weight")))
    }),

    // Referential-integrity gate: orders→customer holds (pass branch);
    // the second rule checks lineitem against the EVEN-keyed suppliers
    // only — a deliberately broken parent so the fail branch carries a
    // real violation count (the synthetic schema's natural FKs are all
    // clean). Parent sides join as DISTINCT KEYS (dimension-sized).
    "q_dq_referential" -> ((s, dir) =>
      graft.ops.DqOps.checkReferential(
        t(s, dir, "orders"), col("o_custkey"),
        t(s, dir, "customer"), col("c_custkey"),
        "orders_customer_fk")
        .unionByName(graft.ops.DqOps.checkReferential(
          t(s, dir, "lineitem"), col("l_suppkey"),
          t(s, dir, "supplier").filter(col("s_suppkey") % 2 === 0),
          col("s_suppkey"),
          "lineitem_even_supplier_fk"))),

    // Benford first-digit audit on order totals (fabricated-numbers
    // screen): expected shares are pre-rounded log10(1+1/d) literals on
    // the exact ×10⁶ grid (in-query log10 would tie the result to an
    // engine's libm), observed shares integer-divide on the same grid.
    // Row-local digit extraction + one 9-row aggregate.
    "q_benford" -> ((s, dir) =>
      graft.ops.DqOps.benford(
        t(s, dir, "orders"), round(col("o_totalprice") * 100))),

    // Budget-constrained best-first selection ("take the best 60k chars"):
    // histogram/class-threshold plan — per-score-class weight sums, a
    // driver walk of the ~90-class table, shuffle-free emission of the
    // fully-in classes; ONLY the boundary score class pays an id-ordered
    // running sum. The oracle is the global sort + running-sum window the
    // plan deliberately avoids — hash-equality proves the two-phase
    // selection is exactly the greedy prefix.
    "q_budget_select" -> ((s, dir) =>
      SamplingOps.selectByBudget(
        t(s, dir, "documents"), "doc_id",
        scoreCol = TextOps.tokenCount(col("text")),
        weightCol = col("n_chars"),
        budget = 60000L)),

    // Mixture-drift diagnostic: per-source KL(P_source || P_corpus) over
    // token distributions, exact fixed point (emitted as the undivided
    // n_s-scaled sum — no integer division in the gate). Corpus counts
    // derive from the vocabulary-sized frame, never a second corpus
    // pass.
    "q_source_kl" -> ((s, dir) =>
      graft.ops.ProfileOps.tokenKlByGroup(
        t(s, dir, "documents"), col("source"))),

    // Jensen-Shannon divergence between two source slices — the
    // symmetric, always-finite drift readout KL can't give (tokens
    // absent from one slice blow KL up; JS's mixture midpoint never
    // does). Undivided Log2Fixed sums per side; one fixed closing chain
    // to bits; zero-count sides contribute 0 by construction.
    "q_js_divergence" -> ((s, dir) =>
      graft.ops.ProfileOps.tokenJsDivergence(
        t(s, dir, "documents"),
        col("source") === "src0", col("source") === "src1")),

    // DSIR quality-targeted selection (Xie et al. NeurIPS'23): per-doc
    // log importance ratio of hashed-token distributions, target = the
    // English slice. Engine-exact: add-1-smoothed INTEGER bucket counts
    // and a fixed-point integer log2 (msb + 20 squaring rounds), so the
    // oracle replays the ENTIRE computation from scratch — bucketing,
    // counts, every log iteration (unrolled SQL), and the per-doc fold.
    // One explode pass to a buckets-sized count table; scoring is a
    // row-local literal-array fold, zero shuffles.
    "q_dsir_score" -> ((s, dir) =>
      graft.ops.SelectionOps.dsirScores(
        t(s, dir, "documents"), target = col("lang") === "en",
        buckets = 4096)),

    // Continuous DQ monitoring: the same constraint report per 1-hour
    // event-time window (the incrementally-mergeable streaming form —
    // runs unchanged under readStream with a watermark, pinned
    // streamed==batch in DqOpsSpec). type_known fails exactly in the
    // windows containing 'error' events — per-window pass/fail
    // discrimination, not a global verdict.
    "q_dq_monitor" -> ((s, dir) =>
      graft.ops.DqOps.checkWindowed(
        RefQueries.events(s, dir), "ts", "1 hour",
        rules = Seq(
          "value_pos" -> (col("value") > 0),
          "type_known" ->
            col("event_type").isin("signup", "view", "click", "purchase"),
          "has_user" -> col("user_id").isNotNull))),

    // ---------------------------------------------------------- sampling
    "q_sample_stratified" -> ((s, dir) =>
      SamplingOps.stratifiedExact(
        t(s, dir, "documents"), col("doc_id"), col("source"),
        Map("src0" -> 13, "src1" -> 37), defaultPercent = 61)
        .select(col("doc_id"), col("source"))),

    // Gated through the ANSI-portable affine hash so the keep predicate
    // has an exact DuckDB twin (the xxhash64 default keeper stays the
    // production path; its determinism + rate are SamplingOpsSpec-pinned).
    "q_sample_hash" -> ((s, dir) =>
      SamplingOps.hashSample(
        t(s, dir, "documents"), col("doc_id"), 25, 100, portable = true)
        .select(col("doc_id"), col("source"))),

    // Exactly-k-per-source deterministic draw ranked by the content
    // fingerprint: bounded-buffer top-k aggregation (groups x k x
    // partitions shuffle rows), not a row_number window over every row.
    "q_sample_per_source" -> ((s, dir) =>
      SamplingOps.topKPerGroup(
        t(s, dir, "documents"),
        col("source"), TextOps.fingerprint(col("text")), col("doc_id"), k = 5)
        .select(col("group").as("source"), col("id").as("doc_id"), col("rank"))),

    // Weighted sampling without replacement (Efraimidis-Spirtakis A-ES),
    // k per source with probability ∝ n_chars: the hash-driven uniform
    // replaces the RNG so the draw is layout-reproducible, and the
    // per-group top-k rides the bounded-buffer aggregate (no window over
    // the corpus). Priorities are never emitted — ranks only — so the
    // ln() draw stays engine-comparable.
    "q_sample_weighted" -> ((s, dir) =>
      SamplingOps.weightedSamplePerGroup(
        t(s, dir, "documents"),
        col("source"), col("n_chars"), col("doc_id"), k = 10)
        .select(col("group").as("source"), col("id").as("doc_id"), col("rank"))),

    // Pretraining data mixing: upweight two curated sources (2.5x / 2x),
    // downweight one (0.25x), keep the rest at 1x — row-local replication
    // (chained-when weight + sequence/explode), no join, no shuffle.
    "q_mixture_resample" -> ((s, dir) =>
      SamplingOps.mixtureResample(
        t(s, dir, "documents"),
        col("source"), col("doc_id"),
        Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.25))
        .select(col("doc_id"), col("source"), col("copy"))),

    "q_train_order" -> ((s, dir) =>
      PrepOps.trainingOrder(
        t(s, dir, "documents"), col("doc_id"),
        TextOps.fingerprint(col("text")), shards = 8, salt = 7L)
        .select(col("id").as("doc_id"), col("shard"), col("rank"))),

    // Deterministic leakage-safe train/val/test split: bucket by the
    // CONTENT fingerprint (not the id), so byte-identical duplicates can
    // never straddle splits; row-local, zero shuffles, reproducible on any
    // engine (the rolling-hash fingerprint has an exact SQL twin).
    "q_split_train_val" -> ((s, dir) => {
      val b = TextOps.fingerprint(col("text")) % 100
      t(s, dir, "documents").select(
        col("doc_id"),
        when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
    }),

    // sqrt-temperature mixture allocation across sources for a 200-row
    // budget: integer milli-weight grid end to end (see the op's
    // portability note — a float Σw would be order-dependent).
    "q_mixture_plan" -> ((s, dir) =>
      SamplingOps.temperatureMixturePlan(
        t(s, dir, "documents"), col("source"), budget = 200L)),

    // Explicit token-budget mixture allocation ("30% from src1, 10%
    // from src4, rest even"): per-source token availability, integer
    // micro-weight targets, and the epochs factor that flags
    // oversampling — the planning arithmetic a mixture spec becomes
    // before any row is sampled. One corpus scan -> sources-sized
    // frame; every number exact int64.
    "q_token_mixture" -> ((s, dir) =>
      SamplingOps.tokenMixturePlan(
        t(s, dir, "documents"), col("source"), col("text"),
        weightsMicro = Map("src1" -> 300000L, "src4" -> 100000L),
        defaultMicro = 50000L, budgetTokens = 40000L)),

    // Quantile-normalize doc lengths per source onto a frozen 0-100
    // reference scale: rank window + row-local interpolation over
    // literal boundaries — the no-global-sort production shape.
    "q_qnorm" -> ((s, dir) =>
      PrepOps.quantileNormalizeRef(
        t(s, dir, "documents"), col("doc_id"), col("source"),
        col("n_chars"), Seq(0.0, 10.0, 25.0, 50.0, 100.0))
        .select(col("id").as("doc_id"), col("group").as("source"),
          col("x").as("n_chars"), col("p"), col("qnorm"))),

    // Value-distribution drift, first half of January vs second, over
    // frozen cent boundaries: row-local bucketing, one corpus shuffle;
    // the PSI ln terms stay with the consumer (ln is not portable).
    "q_drift_buckets" -> ((s, dir) =>
      ProfileOps.bucketDrift(
        RefQueries.events(s, dir)
          .withColumn("__cents", round(col("value") * 100).cast("long")),
        col("ts") < lit("2024-01-16").cast("timestamp"),
        col("__cents"),
        Seq(1000.0, 2500.0, 5000.0, 10000.0, 20000.0))),

    // Curriculum with round-robin source interleave: per-source quality
    // rank window + an arithmetic global position against a broadcast
    // source index — no global sort anywhere.
    "q_curriculum" -> ((s, dir) =>
      PrepOps.curriculumInterleave(
        t(s, dir, "documents"), col("doc_id"), col("source"),
        TextOps.qualityScore(col("text")))
        .select(col("id").as("doc_id"), col("source"), col("rank"),
          col("position"))),

    // Leave-one-out target encoding (the classic categorical feature at
    // corpus scale, leakage-safe): each order's priority encoded as the
    // mean price of the OTHER orders in its category — (sum − own)/(n−1)
    // from ONE group-sized aggregate broadcast back; arithmetic in exact
    // cents, row-local. Singleton categories get NULL: no signal beats a
    // self-leak.
    "q_target_encode" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val agg = o.groupBy(col("o_orderpriority").as("prio"))
        .agg(sum(col("cents")).as("cat_sum"), count(lit(1)).as("cat_n"))
      o.join(broadcast(agg), col("o_orderpriority") === col("prio"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(col("cat_n") > 1,
            (col("cat_sum") - col("cents")).cast("double") /
              (col("cat_n") - 1) / 100).as("loo_mean"))
    }),

    // Do two automated quality judges agree beyond chance? Cohen's kappa
    // between the Gopher rule bundle and the lexicon classifier: both
    // raters row-local, confusion cells + marginals in ONE aggregate,
    // κ an exact integer rational with one closing division.
    "q_judge_agreement" -> ((s, dir) => {
      val (rWords, rLen, rSym, rStop) = gopherRules
      ProfileOps.cohenKappa(
        t(s, dir, "documents"),
        rWords * rLen * rSym * rStop,
        (TextOps.classifierMargin(col("text"), qualityLexicon) >= 0L)
          .cast("int"))
    }),

    // Winsorization (percentile clipping) — the outlier-robust feature
    // clamp run before score normalization: values outside the
    // per-group [p01, p99] envelope are clipped to it. The envelope is
    // ONE grouped percentile aggregate (group-sized, broadcast back);
    // the clamp is row-local. Exact interpolated percentiles over
    // integer inputs hash-match quantile_cont (the q_quantiles parity);
    // greatest/least skip NULLs identically on both engines.
    "q_winsorize" -> ((s, dir) => {
      val env = t(s, dir, "documents")
        .groupBy(col("source").as("src"))
        .agg(percentile(col("n_chars"), array(lit(0.01), lit(0.99))).as("ps"))
        .select(col("src"), element_at(col("ps"), 1).as("lo"),
          element_at(col("ps"), 2).as("hi"))
      t(s, dir, "documents")
        .join(broadcast(env), col("source") === col("src"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          greatest(col("lo"), least(col("hi"), col("n_chars").cast("double")))
            .as("clipped"),
          (col("n_chars") < col("lo") || col("n_chars") > col("hi"))
            .cast("int").as("was_clipped"))
    }),

    // Robust per-type outlier report: median + MAD beat mean/std rules
    // under heavy tails (one wild value cannot move a median). Exact
    // half/quarter-grid medians; the 3·1.4826 consistency factor enters
    // as the integer ratio 44780/10000 so both engines compare the same
    // doubles. Three type-keyed passes with group-sized frames broadcast
    // back (see ProfileOps.madOutliers' scale note).
    "q_mad_outliers" -> ((s, dir) =>
      ProfileOps.madOutliers(
        RefQueries.events(s, dir)
          .withColumn("__cents", round(col("value") * 100).cast("long")),
        col("event_type"), col("__cents"))
        .select(col("group").as("event_type"), col("n"), col("med"),
          col("mad"), col("n_outliers"))),

    // Tabular feature scaling: fit per-segment (n, Σx, Σx²) in one
    // map-side-combined aggregate, broadcast the 5-row stats frame back,
    // apply z row-locally — exact integer sums, then a fixed chain of
    // correctly-rounded IEEE ops (bit-portable scores).
    "q_standardize" -> ((s, dir) =>
      PrepOps.standardizeByGroup(
        t(s, dir, "customer"),
        col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"))
        .select(col("id").as("c_custkey"), col("group").as("c_mktsegment"),
          col("cents"), col("z"))),

    // One-bit randomized response (Warner 1965 / RAPPOR basic): each
    // document "reports" lang='en' truthfully with p=3/4 (deterministic
    // portable-hash coin — the production coin is client-side; the
    // server-side estimator is identical); the unbiased per-source
    // estimate (4*sum_r - n)/2 stays in exact integers as est_x2.
    "q_randomized_response" -> ((s, dir) =>
      PrivacyOps.randomizedResponse(
        t(s, dir, "documents"),
        idCol = col("doc_id"),
        bitCol = coalesce(col("lang") === "en", lit(false)),
        groupCol = col("source"))),

    // k-anonymity audit (privacy gate for releasable training data):
    // quasi-identifier groups smaller than k single out individuals —
    // report every violating group. ONE map-side-combined aggregate over
    // the table; the report is group-sized.
    "q_k_anonymity" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("group_size"))
        .filter(col("group_size") < 10)),

    // Leave-one-source-out ablation over the document corpus: for every
    // source, the corpus mean token count WITHOUT that source — the
    // cheap exact proxy for per-source influence a mixture planner reads
    // before re-weighting. One source-keyed aggregate; grand totals ride
    // a window over the source-count-sized frame (no corpus re-scan, no
    // 1-row cross).
    "q_loo_source" -> ((s, dir) =>
      EstimatorOps.looDeltas(t(s, dir, "documents"),
        col("source"), TextOps.tokenCount(col("text")))
        .select(col("g").as("source"), col("n_g").as("n_docs"),
          col("mean_all"), col("mean_without"), col("delta"))),

    // Central-DP noisy per-source histogram: discrete-Laplace (two-sided
    // geometric, ε = ln 2) noise from the deterministic portable-hash
    // coin through a fixed CDF ladder — the q_randomized_response
    // contract (production swaps true randomness; the release arithmetic
    // is identical and replayable). True counts ride along for error
    // observability.
    "q_dp_counts" -> ((s, dir) =>
      PrivacyOps.dpCounts(t(s, dir, "documents"), col("source"), salt = "v1")
        .withColumnRenamed("grp", "source")),

    // Fleiss' kappa across THREE automated quality judges (the gopher
    // word-count / symbol-ratio / stopword rules): chance-corrected
    // multi-rater agreement in one exact-integer rational with a single
    // closing IEEE division — the multi-rater extension of
    // q_judge_agreement's Cohen κ.
    "q_fleiss_kappa" -> ((s, dir) => {
      val (rWords, _, rSym, rStop) = gopherRules
      ProfileOps.fleissKappa3(t(s, dir, "documents"), rWords, rSym, rStop)
    }),

    // Herfindahl concentration of the corpus by source — the "is this
    // dominated by a few sources" number (and 1/HHI = effective source
    // count) a mixture planner reads; pre-truncated micro shares keep
    // the sum order-free.
    "q_source_hhi" -> ((s, dir) =>
      ProfileOps.concentration(t(s, dir, "documents"), col("source"))),
  )

  val oracleSql: Map[String, String] = Map(

    // One wide aggregate, pivoted to a row per rule — the same
    // single-pass shape as the Spark side.
    "q_dq_checks" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN coalesce(n_chars >= 0, FALSE)
        |        THEN 0 ELSE 1 END) AS v_n_chars_nonneg,
        |    sum(CASE WHEN coalesce(lang IN ('en','de','fr','es','zh'), FALSE)
        |        THEN 0 ELSE 1 END) AS v_lang_known,
        |    sum(CASE WHEN coalesce(length(text) > 0, FALSE)
        |        THEN 0 ELSE 1 END) AS v_text_nonempty,
        |    sum(CASE WHEN coalesce(lang = 'en', FALSE)
        |        THEN 0 ELSE 1 END) AS v_en_only,
        |    count(*) - count(DISTINCT doc_id) AS v_unique_doc_id
        |  FROM documents),
        |r AS (
        |  SELECT 'n_chars_nonneg' AS rule, n_rows,
        |    CAST(v_n_chars_nonneg AS BIGINT) AS n_violations FROM a
        |  UNION ALL SELECT 'lang_known', n_rows,
        |    CAST(v_lang_known AS BIGINT) FROM a
        |  UNION ALL SELECT 'text_nonempty', n_rows,
        |    CAST(v_text_nonempty AS BIGINT) FROM a
        |  UNION ALL SELECT 'en_only', n_rows,
        |    CAST(v_en_only AS BIGINT) FROM a
        |  UNION ALL SELECT 'unique_doc_id', n_rows,
        |    CAST(v_unique_doc_id AS BIGINT) FROM a)
        |SELECT rule, n_rows, n_violations,
        |  CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM r""".stripMargin,

    // Composed oracle mirroring each stage exactly (line-equality df,
    // text-partition dedup, global running-sum selection); the Spark
    // side's hash keys are the documented trade at every stage.
    "q_corpus_curate" ->
      s"""WITH built AS (
         |  SELECT doc_id,
         |    concat('== ', coalesce(source, ''), ' news ==', chr(10),
         |           'promo ', CAST(doc_id % 97 AS VARCHAR), chr(10),
         |           coalesce(text, ''), chr(10),
         |           '(c) all rights reserved') AS text
         |  FROM documents),
         |lns AS (
         |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         |    unnest(range(len(string_split(text, chr(10))))) AS pos
         |  FROM built),
         |ldf AS (SELECT line, count(DISTINCT doc_id) AS c
         |        FROM lns GROUP BY line),
         |stripped AS (
         |  SELECT l.doc_id,
         |    string_agg(l.line, chr(10) ORDER BY l.pos) AS text_clean
         |  FROM lns l JOIN ldf ON l.line = ldf.line
         |  WHERE ldf.c <= 8 GROUP BY l.doc_id),
         |deduped AS (
         |  SELECT doc_id, text_clean FROM (
         |    SELECT doc_id, text_clean, row_number() OVER (
         |      PARTITION BY text_clean ORDER BY doc_id) AS rn
         |    FROM stripped) WHERE rn = 1),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(${S.tokenCount("text_clean")} AS BIGINT) AS score,
         |    CAST(length(text_clean) AS BIGINT) AS weight
         |  FROM deduped),
         |runs AS (
         |  SELECT *, sum(weight) OVER
         |    (ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM scored)
         |SELECT doc_id, score, weight FROM runs WHERE cum <= 30000""".stripMargin,

    // Shares q_corpus_curate's stage CTEs; one (n, chars) row per stage.
    "q_curate_report" ->
      s"""WITH built AS (
         |  SELECT doc_id,
         |    concat('== ', coalesce(source, ''), ' news ==', chr(10),
         |           'promo ', CAST(doc_id % 97 AS VARCHAR), chr(10),
         |           coalesce(text, ''), chr(10),
         |           '(c) all rights reserved') AS text
         |  FROM documents),
         |lns AS (
         |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         |    unnest(range(len(string_split(text, chr(10))))) AS pos
         |  FROM built),
         |ldf AS (SELECT line, count(DISTINCT doc_id) AS c
         |        FROM lns GROUP BY line),
         |stripped AS (
         |  SELECT l.doc_id,
         |    string_agg(l.line, chr(10) ORDER BY l.pos) AS text_clean
         |  FROM lns l JOIN ldf ON l.line = ldf.line
         |  WHERE ldf.c <= 8 GROUP BY l.doc_id),
         |deduped AS (
         |  SELECT doc_id, text_clean FROM (
         |    SELECT doc_id, text_clean, row_number() OVER (
         |      PARTITION BY text_clean ORDER BY doc_id) AS rn
         |    FROM stripped) WHERE rn = 1),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(${S.tokenCount("text_clean")} AS BIGINT) AS score,
         |    CAST(length(text_clean) AS BIGINT) AS weight
         |  FROM deduped),
         |runs AS (
         |  SELECT *, sum(weight) OVER
         |    (ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM scored),
         |selected AS (SELECT doc_id, weight FROM runs WHERE cum <= 30000)
         |SELECT '0_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(coalesce(sum(length(coalesce(text, ''))), 0) AS BIGINT)
         |    AS n_chars FROM documents
         |UNION ALL SELECT '1_built', count(*),
         |  CAST(coalesce(sum(length(text)), 0) AS BIGINT) FROM built
         |UNION ALL SELECT '2_stripped', count(*),
         |  CAST(coalesce(sum(length(text_clean)), 0) AS BIGINT) FROM stripped
         |UNION ALL SELECT '3_deduped', count(*),
         |  CAST(coalesce(sum(length(text_clean)), 0) AS BIGINT) FROM deduped
         |UNION ALL SELECT '4_selected', count(*),
         |  CAST(coalesce(sum(weight), 0) AS BIGINT) FROM selected""".stripMargin,

    "q_dq_referential" ->
      """WITH r1 AS (
        |  SELECT 'orders_customer_fk' AS rule, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_violations
        |  FROM orders o
        |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey),
        |r2 AS (
        |  SELECT 'lineitem_even_supplier_fk' AS rule, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_violations
        |  FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier
        |             WHERE s_suppkey % 2 = 0) s
        |    ON l.l_suppkey = s.s_suppkey)
        |SELECT rule, n_rows, n_violations,
        |  CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)""".stripMargin,

    // Same ×10⁶ integer grid: observed share by integer division,
    // expected share from the identical pre-rounded literal table.
    "q_benford" ->
      """WITH v AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
        |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER)
        |        AS digit FROM v),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
        |t AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS total FROM c),
        |e(digit, exp_micro) AS (VALUES
        |  (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        |  (6, 66947), (7, 57992), (8, 51153), (9, 45757))
        |SELECT e.digit, CAST(coalesce(cnt, 0) AS BIGINT) AS n,
        |  CAST(CASE WHEN total = 0 THEN 0
        |       ELSE (coalesce(cnt, 0) * 1000000) // total END AS BIGINT)
        |    AS obs_micro,
        |  CAST(exp_micro AS BIGINT) AS exp_micro,
        |  CAST(CASE WHEN total = 0 THEN 0
        |       ELSE (coalesce(cnt, 0) * 1000000) // total END
        |       - exp_micro AS BIGINT) AS delta_micro
        |FROM e LEFT JOIN c ON c.digit = e.digit CROSS JOIN t""".stripMargin,

    // The straightforward formulation the distributed plan must equal:
    // one total order, one running sum, prefix under the budget.
    "q_budget_select" ->
      s"""WITH scored AS (
         |  SELECT doc_id, CAST(${S.tokenCount("text")} AS BIGINT) AS score,
         |    n_chars AS weight
         |  FROM documents),
         |runs AS (
         |  SELECT *, sum(weight) OVER
         |    (ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM scored)
         |SELECT doc_id, score, weight FROM runs WHERE cum <= 60000""".stripMargin,

    "q_dq_monitor" ->
      """WITH a AS (
        |  SELECT date_trunc('hour', ts) AS h, count(*) AS n_rows,
        |    sum(CASE WHEN coalesce(value > 0, FALSE)
        |        THEN 0 ELSE 1 END) AS v_value_pos,
        |    sum(CASE WHEN coalesce(
        |          event_type IN ('signup','view','click','purchase'), FALSE)
        |        THEN 0 ELSE 1 END) AS v_type_known,
        |    sum(CASE WHEN user_id IS NOT NULL
        |        THEN 0 ELSE 1 END) AS v_has_user
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT h, 'value_pos' AS rule, n_rows,
        |    CAST(v_value_pos AS BIGINT) AS n_violations FROM a
        |  UNION ALL SELECT h, 'type_known', n_rows,
        |    CAST(v_type_known AS BIGINT) FROM a
        |  UNION ALL SELECT h, 'has_user', n_rows,
        |    CAST(v_has_user AS BIGINT) FROM a)
        |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS win_start, rule,
        |  n_rows, n_violations,
        |  CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM r""".stripMargin,

    // Exact per-column profile: same UNION-of-single-column-aggregates
    // shape as the Spark plan. count/count DISTINCT are exact integers on
    // both engines; min/max stringify identically for BIGINT/VARCHAR
    // columns (both engines compare strings bytewise).
    "q_profile" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n"),

    // Same affine formula over the same checked-dense domain.
    "q_neg_samples" ->
      """WITH b AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |x AS (
        |  SELECT doc_id, j,
        |    (doc_id * 2654435761 + j * 40503 + 104729)
        |      % (SELECT n FROM b) AS raw
        |  FROM documents, (VALUES (0), (1), (2), (3)) AS js(j))
        |SELECT doc_id, CAST(j AS BIGINT) AS j,
        |  CAST(CASE WHEN raw = doc_id
        |    THEN (raw + 1) % (SELECT n FROM b) ELSE raw END AS BIGINT)
        |    AS neg_id
        |FROM x""".stripMargin,

    // The independent quadratic formulation: strict-dominance NOT EXISTS
    // over the same exact-integer (n_chars, margin) plane.
    "q_pareto_frontier" -> {
      val vals = qualityLexicon.toSeq.sortBy(_._1)
        .map { case (k, v) => s"('$k', CAST($v AS BIGINT))" }.mkString(", ")
      s"""WITH w(tok, wt) AS (VALUES $vals),
         |toks AS (
         |  SELECT doc_id, unnest(${S.tokens("lower(text)")}) AS tok FROM documents),
         |m AS (
         |  SELECT doc_id, CAST(COALESCE(sum(wt), 0) AS BIGINT) AS margin
         |  FROM toks LEFT JOIN w USING (tok) GROUP BY doc_id),
         |sc AS (
         |  SELECT d.doc_id, d.n_chars, COALESCE(m.margin, 0) AS margin
         |  FROM documents d LEFT JOIN m USING (doc_id)
         |  WHERE d.n_chars IS NOT NULL)
         |SELECT a.doc_id, a.n_chars, a.margin FROM sc a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM sc b
         |  WHERE b.n_chars <= a.n_chars AND b.margin >= a.margin
         |    AND (b.n_chars < a.n_chars OR b.margin > a.margin))""".stripMargin
    },

    "q_decontaminate" ->
      s"""WITH bs AS (
         |  SELECT DISTINCT unnest(${S.tokenNgrams("text", 3)}) AS s
         |  FROM documents WHERE source = 'src18' AND lang = 'en'),
         |ds AS (
         |  SELECT doc_id, unnest(list_distinct(${S.tokenNgrams("text", 3)})) AS s
         |  FROM documents),
         |cnt AS (
         |  SELECT ds.doc_id,
         |    CAST(count(*) AS BIGINT) AS total,
         |    CAST(count(bs.s) AS BIGINT) AS hit
         |  FROM ds LEFT JOIN bs USING (s) GROUP BY ds.doc_id)
         |SELECT d.doc_id,
         |  CAST(hit AS DOUBLE) / CAST(total AS DOUBLE) AS contamination
         |FROM documents d LEFT JOIN cnt USING (doc_id)""".stripMargin,

    // Independent formulation with shingle STRINGS (Spark joins 8-byte
    // hashes; same pairs modulo 2^-64 collisions).
    "q_source_overlap" ->
      s"""WITH toks AS (
         |  SELECT source, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT DISTINCT source, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source),
         |pairs AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, n_common, sa.n AS n_a, sb.n AS n_b,
         |  CAST(n_common AS DOUBLE)/(sa.n + sb.n - n_common) AS jaccard
         |FROM pairs JOIN sizes sa ON src_a = sa.source
         |JOIN sizes sb ON src_b = sb.source""".stripMargin,

    // Same component CTEs; the weight is 10^6 DIV cluster size (nonneg
    // integer division — direction-proof).
    "q_dsir_score" -> dsirOracle(buckets = 4096),

    // KL replay: same counts, same log, undivided n_s-scaled sum.
    "q_source_kl" ->
      s"""WITH tokss AS (
         |  SELECT source, ${S.tokens("lower(text)")} AS w FROM documents),
         |st AS (
         |  SELECT source, tk, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT source, unnest(w) AS tk FROM tokss) GROUP BY 1, 2),
         |ct AS (SELECT tk, CAST(sum(c) AS BIGINT) AS ctot FROM st GROUP BY tk),
         |nsrc AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY source),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM st),
         |vals AS (
         |  SELECT DISTINCT v FROM (
         |    SELECT c AS v FROM st UNION ALL SELECT ctot FROM ct
         |    UNION ALL SELECT n FROM nsrc UNION ALL SELECT nt FROM nn)),
         |${log2FixedSql("vals")},
         |ks AS (
         |  SELECT st.source,
         |    CAST(sum(st.c * ((la.lg + lb.lg) - (lc.lg + ld.lg)))
         |      AS BIGINT) AS kl_sum_fixed
         |  FROM st JOIN ct USING (tk) JOIN nsrc USING (source) CROSS JOIN nn
         |  JOIN lg la ON la.v = st.c
         |  JOIN lg lb ON lb.v = nn.nt
         |  JOIN lg lc ON lc.v = nsrc.n
         |  JOIN lg ld ON ld.v = ct.ctot
         |  GROUP BY st.source)
         |SELECT nsrc.source AS "group", nsrc.n AS n_tokens, ks.kl_sum_fixed
         |FROM nsrc JOIN ks USING (source)""".stripMargin,

    // JS replay: per-token conditional counts for the two slices, the
    // cleared p·log2(p/m) term with every log a lg-join, same closing
    // chain. Tokens in one slice only keep the OTHER side's term at 0.
    "q_js_divergence" ->
      s"""WITH tokss AS (
         |  SELECT source, ${S.tokens("lower(text)")} AS w FROM documents
         |  WHERE source IN ('src0', 'src1')),
         |tok AS (
         |  SELECT tk,
         |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b
         |  FROM (SELECT source, unnest(w) AS tk FROM tokss) GROUP BY tk),
         |tt AS (SELECT CAST(sum(a) AS BIGINT) AS na,
         |    CAST(sum(b) AS BIGINT) AS nb FROM tok),
         |vals AS (
         |  SELECT DISTINCT v FROM (
         |    SELECT a AS v FROM tok WHERE a > 0
         |    UNION ALL SELECT b FROM tok WHERE b > 0
         |    UNION ALL SELECT a * nb + b * na FROM tok, tt
         |    UNION ALL SELECT na FROM tt
         |    UNION ALL SELECT nb FROM tt
         |    UNION ALL SELECT 2 * na * nb FROM tt)
         |  WHERE v >= 1),
         |${log2FixedSql("vals")},
         |terms AS (
         |  SELECT na, nb,
         |    CASE WHEN a > 0
         |      THEN a * ((la.lg - lna.lg) - lm.lg + l2.lg) ELSE 0 END AS ta,
         |    CASE WHEN b > 0
         |      THEN b * ((lb.lg - lnb.lg) - lm.lg + l2.lg) ELSE 0 END AS tb
         |  FROM tok CROSS JOIN tt
         |  LEFT JOIN lg la ON la.v = tok.a
         |  LEFT JOIN lg lb ON lb.v = tok.b
         |  JOIN lg lna ON lna.v = tt.na
         |  JOIN lg lnb ON lnb.v = tt.nb
         |  JOIN lg lm ON lm.v = tok.a * tt.nb + tok.b * tt.na
         |  JOIN lg l2 ON l2.v = 2 * tt.na * tt.nb)
         |SELECT na AS n_a, nb AS n_b, CAST(count(*) AS BIGINT) AS vocab,
         |  CAST(coalesce(sum(ta), 0) AS BIGINT) AS js_a_fixed,
         |  CAST(coalesce(sum(tb), 0) AS BIGINT) AS js_b_fixed,
         |  CASE WHEN na > 0 AND nb > 0 THEN
         |    (CAST(coalesce(sum(ta), 0) AS DOUBLE) / CAST(na AS DOUBLE)
         |     + CAST(coalesce(sum(tb), 0) AS DOUBLE) / CAST(nb AS DOUBLE))
         |    / 2.0e0 / 1048576.0e0 END AS js_bits
         |FROM terms GROUP BY na, nb""".stripMargin,

    // The coin replays as the same md5 15-hex-char parse the portable
    // MinHash family uses; everything downstream is integer algebra.
    "q_randomized_response" ->
      s"""WITH r AS (
         |  SELECT source AS grp,
         |    CASE WHEN coalesce(lang = 'en', FALSE) THEN 1 ELSE 0 END AS b,
         |    CAST(('0x' || substring(md5('rr:' || CAST(doc_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) % ${DedupOps.PortableHashPrime} % 4 AS c
         |  FROM documents)
         |SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(b) AS BIGINT) AS true_cnt,
         |  CAST(sum(CASE WHEN c < 3 THEN b ELSE 1 - b END) AS BIGINT) AS sum_reported,
         |  4 * CAST(sum(CASE WHEN c < 3 THEN b ELSE 1 - b END) AS BIGINT)
         |    - CAST(count(*) AS BIGINT) AS est_x2
         |FROM r GROUP BY grp""".stripMargin,

    "q_split_train_val" ->
      s"""SELECT doc_id,
         |  CASE WHEN ${S.fingerprint("text")} % 100 < 90 THEN 'train'
         |       WHEN ${S.fingerprint("text")} % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "q_train_order" ->
      s"""SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY fp, doc_id) AS BIGINT) AS rank
         |FROM (
         |  SELECT doc_id, (doc_id * 104729 + 7) % 8 AS shard,
         |         ${S.fingerprint("text")} AS fp
         |  FROM documents)""".stripMargin,

    // Fingerprint collisions would make DESC rank ambiguous — the id
    // tie-break (doc_id ASC on both sides) pins a total order.
    "q_sample_per_source" ->
      s"""SELECT source, doc_id, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT source, doc_id, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY ${S.fingerprint("text")} DESC, doc_id) AS rank
         |  FROM documents) WHERE rank <= 5""".stripMargin,

    // Same arithmetic as the Spark side: exact binary-fraction weights, so
    // floor/round are exact; the fractional keep is an integer modulus.
    "q_mixture_resample" ->
      """WITH wt AS (
        |  SELECT doc_id, source,
        |         CASE WHEN source = 'src0' THEN 2.5
        |              WHEN source = 'src1' THEN 2.0
        |              WHEN source = 'src2' THEN 0.25
        |              ELSE 1.0 END AS w
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, source,
        |         CAST(floor(w) AS BIGINT) +
        |         CASE WHEN (doc_id * 7919 + 13) % 1000 <
        |                   CAST(round((w - floor(w)) * 1000) AS BIGINT)
        |              THEN 1 ELSE 0 END AS n_copies
        |  FROM wt)
        |SELECT doc_id, source, unnest(range(n_copies)) AS copy
        |FROM n WHERE n_copies > 0""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE doc_id % 100 < (CASE WHEN source = 'src0' THEN 13
        |                           WHEN source = 'src1' THEN 37
        |                           ELSE 61 END)""".stripMargin,

    // A-ES twin: same affine draw, same ln(u)/w priority (both engines
    // evaluate one correctly-rounded division inside ln, see
    // SamplingOps.weightedSamplePerGroup's determinism note); priorities
    // are compared, never emitted.
    "q_sample_weighted" ->
      """WITH pr AS (
        |  SELECT source, doc_id,
        |    ln((((doc_id % 999999937) * 2654435761 + 104729) % 999999937
        |        + 1) / 999999938.0) / n_chars AS priority
        |  FROM documents WHERE n_chars > 0)
        |SELECT source, doc_id, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source ORDER BY priority DESC, doc_id) AS rank
        |  FROM pr) WHERE rank <= 10""".stripMargin,

    // Verbatim twin of SamplingOps.portableHashKeep — same prime, same
    // affine constants, pure integer arithmetic on both engines.
    "q_sample_hash" ->
      """SELECT doc_id, source FROM documents
        |WHERE ((((doc_id % 999999937) * 2654435761 + 104729) % 999999937)
        |       % 100) < 25""".stripMargin,

    // Same rank division and the same literal-boundary interpolation
    // chain (lo + (p·B − i)·(hi − lo)), token for token.
    "q_qnorm" -> {
      val bnd = "[0.0, 10.0, 25.0, 50.0, 100.0]"
      val idx = "least(CAST(floor(p * 4) AS INT), 3)"
      s"""WITH rk AS (
         |  SELECT doc_id, source, n_chars,
         |    CAST(row_number() OVER (
         |      PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM documents),
         |pp AS (
         |  SELECT doc_id, source, n_chars,
         |    CASE WHEN n = 1 THEN 0.0
         |         ELSE CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS p
         |  FROM rk)
         |SELECT doc_id, source, n_chars, p,
         |  ($bnd)[$idx + 1]
         |    + (p * 4 - CAST($idx AS DOUBLE))
         |      * (($bnd)[$idx + 2] - ($bnd)[$idx + 1]) AS qnorm
         |FROM pp""".stripMargin
    },

    // Same row-local threshold chain over the same literal boundaries.
    "q_drift_buckets" ->
      """WITH e AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
        |    ts < TIMESTAMP '2024-01-16' AS b
        |  FROM events),
        |k AS (
        |  SELECT CAST(
        |    CASE WHEN c >= 1000 THEN 1 ELSE 0 END +
        |    CASE WHEN c >= 2500 THEN 1 ELSE 0 END +
        |    CASE WHEN c >= 5000 THEN 1 ELSE 0 END +
        |    CASE WHEN c >= 10000 THEN 1 ELSE 0 END +
        |    CASE WHEN c >= 20000 THEN 1 ELSE 0 END AS BIGINT) AS bucket, b
        |  FROM e),
        |g AS (
        |  SELECT bucket,
        |    CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS base_n,
        |    CAST(sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
        |  FROM k GROUP BY bucket),
        |t AS (
        |  SELECT bucket, base_n, cur_n,
        |    CAST(sum(base_n) OVER () AS BIGINT) AS bt,
        |    CAST(sum(cur_n) OVER () AS BIGINT) AS ct
        |  FROM g)
        |SELECT bucket, base_n, cur_n,
        |  CAST(base_n AS DOUBLE) / CAST(bt AS DOUBLE) AS base_frac,
        |  CAST(cur_n AS DOUBLE) / CAST(ct AS DOUBLE) AS cur_frac,
        |  CAST(cur_n AS DOUBLE) / CAST(ct AS DOUBLE)
        |    - CAST(base_n AS DOUBLE) / CAST(bt AS DOUBLE) AS frac_diff
        |FROM t""".stripMargin,

    // Same per-source rank + arithmetic position over the source index.
    "q_curriculum" ->
      s"""WITH q AS (
         |  SELECT doc_id, source, ${S.qualityScore("text")} AS sc
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, CAST(row_number() OVER (
         |    PARTITION BY source ORDER BY sc DESC, doc_id) AS BIGINT) AS rank
         |  FROM q),
         |si AS (
         |  SELECT source,
         |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS idx,
         |    CAST(count(*) OVER () AS BIGINT) AS nsrc
         |  FROM (SELECT DISTINCT source FROM documents))
         |SELECT doc_id, r.source, rank, (rank - 1) * nsrc + idx AS position
         |FROM r JOIN si ON r.source = si.source""".stripMargin,

    // Same integer milli-weight grid: one sqrt, then int64 only.
    "q_mixture_plan" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs,
        |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000.0) AS BIGINT)
        |      AS w_milli
        |  FROM c),
        |s AS (SELECT CAST(sum(w_milli) AS BIGINT) AS wsum FROM w)
        |SELECT source, n_docs, w_milli,
        |  least(n_docs,
        |    CAST((200 * w_milli) // (SELECT wsum FROM s) AS BIGINT)) AS alloc
        |FROM w""".stripMargin,

    // Same exact micro-weight algebra: budget x w div Σw, then the
    // epochs ratio on the x10^6 grid.
    "q_token_mixture" ->
      s"""WITH a AS (
         |  SELECT source,
         |    CAST(sum(${S.tokenCount("text")}) AS BIGINT) AS available_tokens
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, available_tokens,
         |    CAST(CASE source WHEN 'src1' THEN 300000
         |         WHEN 'src4' THEN 100000 ELSE 50000 END AS BIGINT)
         |      AS w_micro
         |  FROM a),
         |t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS wsum FROM w)
         |SELECT source, available_tokens, w_micro,
         |  CAST((40000 * w_micro) // wsum AS BIGINT) AS target_tokens,
         |  CASE WHEN available_tokens > 0 THEN
         |    CAST(((40000 * w_micro) // wsum) * 1000000 // available_tokens
         |      AS BIGINT) END AS epochs_micro,
         |  CASE WHEN available_tokens > 0 THEN
         |    CAST(CASE WHEN ((40000 * w_micro) // wsum) * 1000000
         |         // available_tokens > 1000000
         |         THEN 1 ELSE 0 END AS INTEGER) END AS oversampled
         |FROM w CROSS JOIN t""".stripMargin,

    "q_score_calibrate" ->
      s"""SELECT doc_id, lang,
         |  CAST(${S.tokenCount("text")} AS INTEGER) AS score,
         |  percent_rank() OVER (PARTITION BY lang
         |    ORDER BY ${S.tokenCount("text")}) AS cal
         |FROM documents""".stripMargin,

    "q_target_encode" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |agg AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(sum(cents) AS BIGINT) AS cat_sum,
        |    CAST(count(*) AS BIGINT) AS cat_n
        |  FROM o GROUP BY 1)
        |SELECT o_orderkey, o_orderpriority,
        |  CASE WHEN cat_n > 1
        |    THEN CAST(cat_sum - cents AS DOUBLE) / (cat_n - 1) / 100
        |  END AS loo_mean
        |FROM o JOIN agg ON o_orderpriority = prio""".stripMargin,

    // Raters rebuilt from the q_gopher_rules / q_quality_classifier
    // oracle fragments; κ chain mirrors ProfileOps.cohenKappa exactly.
    "q_judge_agreement" -> {
      val toks = S.tokens("lower(text)")
      val sumLen = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($toks, t -> CAST(len(t) AS BIGINT))), (a, b) -> a + b)"
      val stops = TextOps.Sql.stopwordHits("text",
        Seq("the", "a", "of", "and", "to", "in", "is", "it"))
      val vals = qualityLexicon.toSeq.sortBy(_._1)
        .map { case (k, v) => s"('$k', CAST($v AS BIGINT))" }.mkString(", ")
      s"""WITH w(tok, wt) AS (VALUES $vals),
         |tk AS (
         |  SELECT doc_id, unnest($toks) AS tok FROM documents),
         |mm AS (
         |  SELECT doc_id, CAST(COALESCE(sum(wt), 0) AS BIGINT) AS margin
         |  FROM tk LEFT JOIN w USING (tok) GROUP BY doc_id),
         |g AS (SELECT doc_id,
         |        CAST(len($toks) AS BIGINT) AS nw,
         |        $sumLen AS suml,
         |        CAST(length(text) AS BIGINT) AS nc,
         |        CAST(${S.punctCount("text")} AS BIGINT) AS np,
         |        $stops AS stops
         |      FROM documents),
         |r AS (
         |  SELECT
         |    CAST(nw >= 3 AND nw <= 50 AS BIGINT)
         |      * CAST(nw > 0 AND suml >= nw AND suml * 10 <= nw * 45 AS BIGINT)
         |      * CAST(np * 10 <= nc AS BIGINT)
         |      * CAST(stops >= 1 AS BIGINT) AS a,
         |    CAST(CASE WHEN COALESCE(mm.margin, 0) >= 0
         |      THEN 1 ELSE 0 END AS BIGINT) AS b
         |  FROM g LEFT JOIN mm USING (doc_id)),
         |c AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(a * b) AS BIGINT) AS n11,
         |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
         |  FROM r),
         |k AS (
         |  SELECT *,
         |    (n11 + n10) * (n11 + n01)
         |      + (n - n11 - n10) * (n - n11 - n01) AS chance
         |  FROM c)
         |SELECT n, n11, n10, n01, n00,
         |  CASE WHEN n > 0 THEN CAST(n11 + n00 AS DOUBLE) / n END AS po,
         |  CASE WHEN n > 0 THEN CAST(chance AS DOUBLE) / (n * n) END AS pe,
         |  CASE WHEN n * n - chance > 0
         |    THEN CAST(n * (n11 + n00) - chance AS DOUBLE)
         |      / CAST(n * n - chance AS DOUBLE) END AS kappa
         |FROM k""".stripMargin
    },

    "q_winsorize" ->
      """WITH env AS (
        |  SELECT source AS src, quantile_cont(n_chars, 0.01) AS lo,
        |         quantile_cont(n_chars, 0.99) AS hi
        |  FROM documents GROUP BY 1)
        |SELECT doc_id, source, n_chars,
        |  greatest(lo, least(hi, CAST(n_chars AS DOUBLE))) AS clipped,
        |  CAST(n_chars < lo OR n_chars > hi AS INTEGER) AS was_clipped
        |FROM documents JOIN env ON source = src""".stripMargin,

    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS group_size
        |FROM customer GROUP BY 1, 2 HAVING count(*) < 10""".stripMargin,

    // Same three-pass median/MAD shape; quantile_cont == Spark's exact
    // interpolating percentile on the integer cents and their exact
    // half-grid deviations.
    "q_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |med AS (
        |  SELECT event_type, quantile_cont(c, 0.5) AS med
        |  FROM e GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, med,
        |    abs(CAST(c AS DOUBLE) - med) AS d
        |  FROM e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(d, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
        |  any_value(dev.med) AS med, any_value(mad.mad) AS mad,
        |  CAST(sum(CASE WHEN dev.d * 10000 > mad.mad * 44780
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY dev.event_type""".stripMargin,

    // Identical arithmetic chain: exact int64 (n, Σx, Σx²), then
    // mean = Σx/n, std = sqrt(Σx²/n − mean²), z = (x − mean)/std — every
    // float op correctly rounded in the same order on both engines.
    "q_standardize" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |s AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sm,
        |    CAST(sum(cents * cents) AS BIGINT) AS sq
        |  FROM c GROUP BY 1),
        |m AS (
        |  SELECT c_mktsegment, CAST(sm AS DOUBLE) / n AS mean,
        |    sqrt(CAST(sq AS DOUBLE) / n -
        |         (CAST(sm AS DOUBLE) / n) * (CAST(sm AS DOUBLE) / n)) AS std
        |  FROM s)
        |SELECT c_custkey, c.c_mktsegment, cents,
        |  CASE WHEN std > 0 THEN (CAST(cents AS DOUBLE) - mean) / std
        |       ELSE 0.0 END AS z
        |FROM c JOIN m USING (c_mktsegment)""".stripMargin,

    // The md5 coin at full 60-bit width (>> 7 leaves 53 exact bits), the
    // same CDF double literals, the same clip at zero.
    "q_dp_counts" -> {
      val ladder = PrivacyOps.DiscreteLaplaceCdf
        .map { case (k, th) => s"WHEN u < ${dlit(th)} THEN $k" }
        .mkString(" ")
      s"""WITH c AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_true
         |           FROM documents GROUP BY source),
         |h AS (SELECT grp, n_true,
         |        CAST(('0x' || substring(md5('dp:v1:' || grp), 1, 15))
         |          AS BIGINT) AS hv
         |      FROM c),
         |u AS (SELECT grp, n_true,
         |        CAST(hv >> 7 AS DOUBLE) / 9007199254740992.0 AS u
         |      FROM h),
         |z AS (SELECT grp, n_true,
         |        CAST(CASE $ladder ELSE 6 END AS BIGINT) AS noise
         |      FROM u)
         |SELECT grp AS source, n_true, noise,
         |  greatest(CAST(0 AS BIGINT), n_true + noise) AS n_dp
         |FROM z""".stripMargin
    },

    // Pre-truncated micro shares, order-free square sum, the same two
    // integer divisions.
    "q_source_hhi" ->
      """WITH per AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS c
        |             FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM per),
        |sh AS (SELECT c, (c * 1000000) // n AS share_micro FROM per, tot),
        |ag AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_units,
        |    CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(coalesce(sum(share_micro * share_micro) // 1000000, 0)
        |      AS BIGINT) AS hhi_micro
        |  FROM sh)
        |SELECT n_units, n_groups, hhi_micro,
        |  CASE WHEN hhi_micro > 0
        |       THEN CAST(1000000000000 // hhi_micro AS BIGINT)
        |  END AS effective_groups_micro
        |FROM ag""".stripMargin,

    // Three raters rebuilt from the q_judge_agreement oracle fragments;
    // the κ clearing mirrors ProfileOps.fleissKappa3 term for term.
    "q_fleiss_kappa" -> {
      val toks = S.tokens("lower(text)")
      val stops = TextOps.Sql.stopwordHits("text",
        Seq("the", "a", "of", "and", "to", "in", "is", "it"))
      s"""WITH g AS (SELECT CAST(len($toks) AS BIGINT) AS nw,
         |        CAST(length(text) AS BIGINT) AS nc,
         |        CAST(${S.punctCount("text")} AS BIGINT) AS np,
         |        $stops AS stops
         |      FROM documents WHERE text IS NOT NULL),
         |r AS (SELECT CAST(nw >= 3 AND nw <= 50 AS BIGINT)
         |        + CAST(np * 10 <= nc AS BIGINT)
         |        + CAST(stops >= 1 AS BIGINT) AS c FROM g),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(coalesce(sum(c), 0) AS BIGINT) AS s,
         |        CAST(coalesce(sum(c * c + (3 - c) * (3 - c) - 3), 0)
         |          AS BIGINT) AS a
         |      FROM r)
         |SELECT n AS n_items, s AS s_sum, a AS a_sum,
         |  CASE WHEN n > 0
         |       THEN CAST(a AS DOUBLE) / CAST(6 * n AS DOUBLE) END AS p_bar,
         |  CASE WHEN n > 0
         |       THEN CAST(s * s + (3 * n - s) * (3 * n - s) AS DOUBLE)
         |          / CAST(9 * n * n AS DOUBLE) END AS p_e,
         |  CASE WHEN 18 * n * n - 2 * (s * s + (3 * n - s) * (3 * n - s)) > 0
         |       THEN CAST(3 * n * a - 2 * (s * s + (3 * n - s) * (3 * n - s))
         |              AS DOUBLE)
         |          / CAST(18 * n * n - 2 * (s * s + (3 * n - s) * (3 * n - s))
         |              AS DOUBLE) END AS kappa
         |FROM m""".stripMargin
    },

    // Exact integer totals, grand totals from the per-source frame, the
    // identical two-division/one-subtraction IEEE chain.
    "q_loo_source" ->
      s"""WITH per AS (SELECT source,
         |    CAST(sum(ntok) AS BIGINT) AS t_g,
         |    CAST(count(*) AS BIGINT) AS n_g
         |  FROM (SELECT source, ${S.tokenCount("text")} AS ntok
         |        FROM documents)
         |  GROUP BY source),
         |tot AS (SELECT CAST(sum(t_g) AS BIGINT) AS t_all,
         |               CAST(sum(n_g) AS BIGINT) AS n_all FROM per)
         |SELECT per.source, per.n_g AS n_docs,
         |  CAST(t_all AS DOUBLE) / CAST(n_all AS DOUBLE) AS mean_all,
         |  CASE WHEN n_all > n_g
         |       THEN CAST(t_all - t_g AS DOUBLE) / CAST(n_all - n_g AS DOUBLE)
         |  END AS mean_without,
         |  mean_without - mean_all AS delta
         |FROM per, tot""".stripMargin,
  )
}
