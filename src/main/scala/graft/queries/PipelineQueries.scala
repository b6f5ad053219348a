package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, TextOps}
import graft.streaming.{EventOps, IngestDedupStream}

/** Training-data pipeline operators (dedup, similarity search, multimodal,
  * text analysis, event streams) as driver-checkable queries over the
  * documents / embeddings / events / orders tables.
  *
  * Queries whose operators rely on `xxhash64` (MinHash, SimHash, LSH band
  * hashes) have no DuckDB twin -> no oracle entry (rows-only check);
  * their semantics are covered by ScalaTest property tests instead.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** TPC-H revenue in exact fixed point: cents x (100 - discount
    * basis-points). Integer products sum merge-order-proof; divide by
    * 10000 AFTER the aggregate. One definition — the parity-critical
    * formula must not drift between the queries that share it.
    */
  private def revU: Column =
    round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))

  /** Demo lexicon for `q_quality_classifier` — stands in for an
    * offline-trained linear model's weight vector (content terms positive,
    * filler/degenerate markers negative). Fixed integers so the margin is
    * exact on any engine; the oracle rebuilds the same table as VALUES.
    */
  val qualityLexicon: Map[String, Long] = Map(
    "data" -> 3L, "query" -> 2L, "table" -> 2L, "join" -> 2L,
    "spark" -> 3L, "stream" -> 2L, "column" -> 1L, "group" -> 1L,
    "the" -> 1L, "a" -> -1L, "slow" -> -5L, "small" -> -2L,
    "big" -> -2L, "value" -> -1L, "row" -> -1L)

  /** Frozen BPE merge table for `q_bpe_encode` — the output of
    * [[graft.ops.PrepOps.bpeTrainLocal]](documents, text, 32) on the
    * sf0.01 corpus, then FROZEN as literals. This mirrors production:
    * tokenizers are trained once offline and shipped as a constant
    * artifact; the corpus-scale operation is the apply. Freezing also
    * gives the apply a DuckDB oracle ([[bpeEncodeOracle]]) — the trainer
    * itself stays gated by `q_bpe_pairs` and PrepOpsSpec differentials.
    */
  val bpeFrozenMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"))

  /** Evaluation term set for `q_mrr` — eight frozen query terms drawn
    * from the corpus vocabulary; relevance is "term appears in the
    * document's first three tokens" (a label independent of the
    * term-frequency ranking signal, so the metric is non-degenerate).
    */
  private val MrrTerms: Seq[String] = Seq(
    "vector", "stream", "window", "filter", "merge", "batch", "scan",
    "column")

  /** 10^6/rank pre-rounded once (rank 1..10) — the reciprocal-rank gain
    * table, identical literals in the engine plan and the oracle SQL
    * (the q_ndcg discipline: no division inside the aggregate).
    */
  private val MrrGainMicro: Seq[Long] = (1 to 10).map(i => math.round(1e6 / i))

  /** Shared candidate frame for the retrieval-eval pair (`q_mrr`,
    * `q_map_eval`): one corpus scan exploded over the 8 literal terms,
    * pruned to term-matching rows (`tf > 0`) BEFORE any shuffle, with
    * the relevance label row-local.
    */
  private def mrrCandidates(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(lower(col("text")))
    t(s, dir, "documents")
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(array(MrrTerms.map(lit): _*)).as("term"))
      .withColumn("tf",
        size(filter(col("tk"), x => x === col("term"))).cast("long"))
      .filter(col("tf") > 0L)
      .withColumn("rel",
        array_contains(slice(col("tk"), 1, 3), col("term")))
      .select(col("doc_id"), col("term"), col("tf"), col("rel"))
  }

  /** The eval pair's shared ranking: per-term tf-desc with doc_id
    * tie-break — MUST stay one definition so the two metrics rank
    * identically.
    */
  private def mrrRank: Column = row_number().over(
    Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id")))

  /** The literal 8-term frame both eval queries left-join so termless
    * queries keep a zero row. */
  private def mrrTermsDf(s: SparkSession): DataFrame =
    s.createDataFrame(MrrTerms.map(Tuple1(_))).toDF("term")

  /** Soft-dedup weights (1/cluster_size in micro units) over the 3-gram
    * Jaccard near-dup components — shared by `q_dedup_weights` (the
    * per-doc frame) and `q_ess_weights` (its effective-sample-size fold)
    * so the weight definition cannot drift between them.
    */
  private def dedupWeightsFrame(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DedupOps.ngramJaccardPairs(
      docs, "doc_id", "text", k = 3, threshold = 0.2)
    val comp = GraphOps.componentsOf(docs, "doc_id", pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("component"))
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("doc_id"), col("component"), col("cluster_size"),
        expr("1000000 DIV cluster_size").as("weight_micro"))
  }

  /** The Gopher-style quality rule bundle as four 0/1 columns
    * (word-count bounds, mean-word-length window, symbol ratio, stopword
    * presence) — shared by `q_gopher_rules` and the `q_judge_agreement`
    * kappa so the rater definition cannot drift between them. Every
    * threshold is an exact integer cross-product; the token-length fold
    * is the codegen'd expression (see expr/TokenExprs).
    */
  private def gopherRules: (Column, Column, Column, Column) = {
    val toks = TextOps.tokens(lower(col("text")))
    val nW = size(toks).cast("long")
    val sumLen = graft.expr.TokenExprs.tokenLengthSum(toks)
    val nC = TextOps.charCount(col("text")).cast("long")
    val nP = TextOps.punctCount(col("text")).cast("long")
    val stops = TextOps.stopwordHits(col("text"),
      Seq("the", "a", "of", "and", "to", "in", "is", "it"))
    ((nW >= 3 && nW <= 50).cast("int"),
      (nW > 0 && sumLen >= nW && sumLen * 10 <= nW * 45).cast("int"),
      (nP * 10 <= nC).cast("int"),
      (stops >= 1).cast("int"))
  }

  /** Session-scoped memo for the two canonical graph edge tables: the
    * heaviest graph queries each used to rebuild the same
    * project→explode→distinct edge list from scratch (`q_triangles`/
    * `q_communities`/`q_modularity` the co-occurrence pairs;
    * `q_pagerank`/`q_pagerank_dangling`/`q_kcore` the order-line
    * customer-supplier join), so a catalog run paid the build five
    * times. The memo persists the frame ONCE per (session, input dir)
    * and every later query reads the materialized cache — the
    * `writeBucketedIfAbsent` write-once-read-many amortization, in
    * memory. Keys hold the session reference, so a stopped session's
    * entries are never revived; robustness sweeps (empty/nulled/skewed
    * dirs) key separately by dir. Results are unchanged — only the
    * number of times the identical build executes.
    */
  private val edgeMemo =
    scala.collection.mutable.HashMap.empty[(SparkSession, String, String), DataFrame]

  private def memoized(s: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame = {
    val key = (s, dir, tag)
    val hit = edgeMemo.synchronized {
      // evict entries pinned to STOPPED sessions on every access: a
      // long-lived JVM that creates many sessions (suite runners) must
      // not accumulate dead session references + persisted frames
      edgeMemo.filterInPlace { case ((sess, _, _), _) =>
        !sess.sparkContext.isStopped }
      edgeMemo.get(key)
    }
    hit.getOrElse {
      // build OUTSIDE the lock (this is minutes of Spark work); if two
      // threads raced to build the same key, the loser unpersists its
      // copy instead of orphaning it
      val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize once; consumers start from the cache
      edgeMemo.synchronized {
        edgeMemo.get(key) match {
          case Some(winner) => df.unpersist(blocking = false); winner
          case None => edgeMemo.put(key, df); df
        }
      }
    }
  }

  /** Part co-occurrence edges (parts bought in the same order),
    * generated ROW-LOCALLY from each order's sorted part set — shared by
    * `q_triangles`, `q_communities`, and `q_modularity` (one definition;
    * see q_triangles' plan note for the measured rationale), built once
    * per session+dir via [[memoized]].
    */
  private def partCooccurrenceEdges(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "part_cooccurrence") {
      val ps = col("ps")
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(transform(ps,
          (x, i) => transform(slice(ps, i + 2, size(ps)),
            y => struct(x.cast("long").as("u"), y.cast("long").as("v"))))))
          .as("p"))
        .select(col("p.u"), col("p.v")).distinct()
    }

  /** The 4-round LPA labels over [[partCooccurrenceEdges]], memoized:
    * shared by `q_communities` (the partition itself) and `q_modularity`
    * (its quality score) so the iterative rounds run once per
    * session+dir.
    */
  private def partCommunities(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "part_communities_r4") {
      GraphOps.labelPropagation(partCooccurrenceEdges(s, dir), "u", "v",
        rounds = 4)
    }

  /** Customer-supplier interaction pairs from the orders-lineitem join,
    * on the disjoint even/odd node encoding (customers 2k, suppliers
    * 2k+1) — shared by `q_pagerank`, `q_pagerank_dangling`, and
    * `q_kcore`, built once per session+dir via [[memoized]]. Kept raw
    * (with multiplicities): each consumer applies its own distinct.
    */
  private def custSuppPairs(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "cust_supp") {
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * lit(2L)).as("cust"),
          (col("l_suppkey") * lit(2L) + lit(1L)).as("supp"))
    }

  /** Run-time export of float-trained model state into the oracle
    * catalog. [[IvfOps.trainCentroids]] is DETERMINISTIC (xxhash64
    * seeding, fixed-point Lloyd sums — layout-invariant by construction,
    * spec-pinned), so the centroids a query trains are a pure function
    * of the input tables; exporting them as exact shortest-repr double
    * literals (which round-trip bit-for-bit through SQL text) lets the
    * DuckDB oracle re-derive EVERYTHING DOWNSTREAM of training —
    * assignment argmax, probe selection, candidate cosine, closure —
    * upgrading `q_sim_ivf_topk`/`q_semdedup` from rows-only checks to
    * hash-gated ones. Training itself remains the un-oracled half
    * (unchanged trade, now confined to exactly that stage). `Verify`
    * runs every query BEFORE dumping `oracleSql`, so the export is
    * always populated in the driver's correctness pass; when the
    * queries have not run (or a dev subset excluded them) the dynamic
    * entries are simply absent and the pair degrades to its old
    * rows-only status.
    */
  private object TrainedExport {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
    def put(key: String, c: Array[Array[Double]]): Array[Array[Double]] = {
      cache.put(key, c); c
    }
    def get(key: String): Option[Array[Array[Double]]] = Option(cache.get(key))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------ text analysis
    "q_text_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.charCount(col("text")).as("n_chars_actual"),
        TextOps.punctCount(col("text")).as("n_punct"),
        TextOps.tokenEstimate(col("text")).as("n_subword_est"),
        TextOps.qualityScore(col("text")).as("quality"))),

    "q_text_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.langId(col("text")).as("lang_pred"))),

    // Tokenizer fertility (chars per subword, by language) — the standard
    // multilingual tokenizer-quality report: a high ratio means the
    // vocabulary splits that language into many pieces (costly training
    // tokens). Row-local estimate, one lang-keyed aggregate, exact longs
    // + one closing division.
    "q_fertility" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(TextOps.tokenEstimate(col("text")).cast("long"))
            .as("n_subwords"))
        .withColumn("chars_per_subword",
          when(col("n_subwords") > 0,
            col("n_chars").cast("double") / col("n_subwords")))),

    // Lang-ID confusion matrix: labeled lang vs stopword-heuristic
    // prediction, with the row-conditional rate — the accuracy report
    // that decides whether the cheap classifier gates a language. One
    // corpus scan; totals ride the tiny cell frame (transitionMatrix
    // discipline).
    "q_lang_confusion" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .withColumn("row_total",
          sum(col("n")).over(Window.partitionBy(col("lang"))))
        .select(col("lang"), col("lang_pred"), col("n"),
          (col("n").cast("double") / col("row_total").cast("double"))
            .as("rate"))),

    // Exact-duplicate rate per source: 1 - distinct fingerprints / docs.
    // Two map-side-combined aggregates over the fingerprint frame.
    "q_dup_rate" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), TextOps.fingerprint(col("text")).as("__fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("__fp")).as("n_unique"))
        .withColumn("dup_rate",
          lit(1.0) - col("n_unique").cast("double") /
            col("n_docs").cast("double"))),

    // Inverted-index health: how many shingles appear in 1 doc, 2-3,
    // 4-7, ... (log2 df buckets). THE histogram that justifies a
    // maxShingleDf cap before a candidate join: candidate volume is
    // sum df^2, so the tail buckets dominate cost. Index-sized
    // aggregates only. Bucket = floor(log2 df) computed as
    // length(bin(df)) - 1: pure integer/string ops — a float log2 can
    // land on either side of a power-of-2 boundary per libm.
    "q_shingle_df_hist" -> ((s, dir) => {
      val idx = DedupOps.shingleIndexHashed(
        t(s, dir, "documents"), "doc_id", "text", k = 3)
      idx.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .select((length(bin(col("df"))) - 1).cast("long").as("df_bucket"),
          col("df"))
        .groupBy(col("df_bucket"))
        .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("n_postings"),
          sum(col("df") * col("df")).as("candidate_volume"))
    }),

    "q_text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))),

    // Unicode NFC normalization — the dedup prerequisite for text that
    // mixes combining sequences with precomposed forms (byte-distinct,
    // visually identical, hash-keyed dedup misses them). The corpus is
    // ASCII, so the query plants combining marks deterministically
    // (a+U+0300, o+U+0308) and gates the composed output + codepoint
    // counts. The oracle runs DuckDB's NATIVE nfc_normalize — two
    // independent implementations of the Unicode conformance algorithm,
    // hash-compared.
    "q_text_nfc" -> ((s, dir) => {
      val raw = regexp_replace(
        regexp_replace(col("text"), "a", "a\u0300"), "o", "o\u0308")
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.expr.UnicodeExprs.nfcNormalize(raw).as("text_nfc"),
        length(raw).cast("long").as("n_raw"))
        .withColumn("n_nfc", length(col("text_nfc")).cast("long"))
    }),

    // Diacritic folding (NFD + strip combining marks) \u2014 the match-key
    // normalization fuzzy joins block on: planted combining grave +
    // precomposed \u00e9 both fold away. Oracle = DuckDB's independent
    // utf8proc strip_accents (the q_text_nfc two-implementations
    // discipline).
    "q_text_fold" -> ((s, dir) => {
      val raw = regexp_replace(
        regexp_replace(col("text"), "a", "a\u0300"), "e", "\u00e9")
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.expr.UnicodeExprs.foldDiacritics(raw).as("text_folded"),
        length(raw).cast("long").as("n_raw"))
        .withColumn("n_folded", length(col("text_folded")).cast("long"))
    }),

    // Canonical normalization pass (pre-dedup cleanup): row-local regexp
    // chain, zero shuffles — at 100 TB this query IS its scan + write.
    "q_text_normalize" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.normalizeText(col("text")).as("text_norm"))
        .withColumn("n_chars_norm", length(col("text_norm")).cast("long"))),

    // PII scrub as a gated transform: chained codegen'd regexp_replace
    // (patterns avoid dialect-divergent constructs, so the DuckDB twin is
    // the same chain with the 'g' flag). Row-local, zero shuffles.
    "q_pii_redact" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.redactPii(col("text")).as("clean_text"),
        TextOps.piiCount(col("text")).as("n_pii"))),

    // Gopher/C4-style repetition filter signals: all row-local codegen'd
    // expressions (integer counts + one IEEE division each) — a 100 TB
    // repetition pass is a pure map over the scan, zero shuffles. Staged
    // selects tokenize ONCE and build each n-gram array ONCE: the arrays
    // are non-cheap and multiply-referenced, so CollapseProject keeps the
    // stages and nothing is recomputed under the `when` guards.
    "q_repetition" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__w"))
        .select(col("doc_id"), col("__w"),
          TextOps.ngramsOfTokens(col("__w"), 2).as("__g2"),
          TextOps.ngramsOfTokens(col("__w"), 3).as("__g3"))
        .select(col("doc_id"),
          TextOps.distinctFracOfTokens(col("__w")).as("distinct_token_frac"),
          TextOps.dupFracOfNgrams(col("__g2")).as("dup_bigram_frac"),
          TextOps.dupFracOfNgrams(col("__g3")).as("dup_trigram_frac"))),

    // CCNet-style LM quality scoring: train a char-bigram model on the
    // corpus (one bounded-key groupBy pass), then score every doc with a
    // codegen'd string walk over the literal model — the scoring pass is
    // a pure map (zero joins/shuffles at 100 TB). Fixed-point ppm
    // probabilities keep train AND score integer-exact across engines.
    "q_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = LmOps.trainModelPpm(docs, col("text"))
      LmOps.scoreDocs(docs, col("doc_id"), col("text"), model)
    }),

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

    "q_quality_classifier" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.classifierMargin(col("text"), qualityLexicon).as("margin"))
        .withColumn("keep", (col("margin") >= 0L).cast("int"))),

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

    // ------------------------------------------------------------- dedup
    "q_dedup_exact" -> ((s, dir) =>
      DedupOps.exactDedup(
        t(s, dir, "documents"), "doc_id",
        concat_ws(" ", TextOps.tokens(lower(col("text")))))
        .select(col("doc_id"), col("source"))),

    "q_dedup_ngram" -> ((s, dir) =>
      DedupOps.ngramJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", k = 3, threshold = 0.2)),

    // Overlap-coefficient (containment) dedup: |A∩B|/min(|A|,|B|) >= 0.8
    // catches a short doc quoted wholly inside a long one — the pair
    // Jaccard's union term drowns. Same 8-byte inverted-index shape as
    // q_dedup_ngram; one extra IEEE division at the end.
    "q_dedup_containment" -> ((s, dir) =>
      DedupOps.containmentPairs(
        t(s, dir, "documents"), "doc_id", "text", k = 3, threshold = 0.8)),

    // Mosaic-duplication salvage score: the fraction of a doc's shingles
    // unseen in any earlier doc — the duplication tail pairwise
    // thresholds miss. Index-sized aggregates only; no candidate join.
    "q_novelty" -> ((s, dir) =>
      DedupOps.noveltyScores(t(s, dir, "documents"), "doc_id", "text", k = 3)),

    // Exact SUBSTRING-level dedup (Lee et al. 2021): every maximal span
    // of 8-token windows occurring >= 2 times corpus-wide — removal at
    // span granularity instead of dropping whole near-dup documents.
    // Window-hash postings aggregate + per-doc gaps-and-islands merge;
    // the oracle replays the rolling window hashes, the global counts,
    // and the island algebra, so every span boundary is hash-gated.
    "q_dup_spans" -> ((s, dir) =>
      DedupOps.duplicateSpans(t(s, dir, "documents"), k = 8)),

    // The per-document scrub report over the same spans: token totals,
    // duplicated-token mass and the x10^6 duplicated fraction (span-free
    // docs report zeros — the corpus-health readout a curation run logs).
    "q_dup_span_stats" -> ((s, dir) =>
      DedupOps.duplicateSpanStats(t(s, dir, "documents"), k = 8)),

    // Weak labeling against a literal lexicon: word-boundary contains on
    // the normalized text, one codegen'd scan per entity, zero shuffles.
    "q_dict_tag" -> ((s, dir) =>
      TextOps.dictionaryTag(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "stream", "hash value", "table part"))),

    // Contrastive negatives: k=4 hash-driven partners per doc over the
    // checked-dense id domain — row-local after a 1-row bounds attach.
    "q_neg_samples" -> ((s, dir) =>
      PrepOps.negativeSamples(t(s, dir, "documents"), col("doc_id"), k = 4)
        .select(col("id").as("doc_id"), col("j"), col("neg_id"))),

    // PPJoin-style prefix-filtered Jaccard join: each doc indexes only
    // its rarest |d|-ceil(t|d|)+1 shingles under a global (df, hash)
    // order — provably complete for J >= t (prefix-filtering lemma)
    // while the hottest shingles sort themselves OUT of the index (the
    // skew guard is inherent, not a df cap). Candidates verify via the
    // codegen'd sorted-array intersection walk.
    "q_dedup_prefix" -> ((s, dir) =>
      DedupOps.prefixJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", k = 3, threshold = 0.5)),

    // Incremental ingest: the daily batch (doc_id % 5 == 0 stands in for
    // "today") deduped against the existing corpus only — exact dupes out
    // via an 8-byte-hash anti join, near-dupes out via the cross-corpus
    // inverted index; the existing corpus is never re-paired with itself.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      DedupOps.incrementalDedup(
        incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        existing = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        idCol = "doc_id", textCol = "text",
        keyCol = concat_ws(" ", TextOps.tokens(lower(col("text")))),
        k = 3, threshold = 0.2)
        .select(col("doc_id"), col("source"))
    }),

    // The streaming ingest-dedup's batch reference over the same split:
    // the feed (doc_id % 3 == 0) anti-joined on key hashes against the
    // standing corpus, then first arrival per key. documents has no
    // timestamp, so arrival order is synthesized deterministically
    // (doc_id % 7, ties by doc_id) — it exercises the within-feed
    // first-wins path with non-id-ordered arrivals.
    "q_dedup_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      IngestDedupStream.batchReference(
        incoming = docs
          .filter(pmod(col("doc_id"), lit(3)) === 0)
          .withColumn("arrival", pmod(col("doc_id"), lit(7))),
        existingKeys = docs
          .filter(pmod(col("doc_id"), lit(3)) =!= 0)
          .select(lower(col("text")).as("k")),
        keyCol = lower(col("text")),
        eventTimeCol = "arrival", idCol = "doc_id")
        .select(col("doc_id"), col("source"))
    }),

    // Exact-substring span dedup (Lee et al. 2021 semantics at 5-token
    // granularity): duplicated spans cut everywhere but their first
    // occurrence, overlaps merged, documents reassembled.
    "q_dedup_spans" -> ((s, dir) =>
      DedupOps.spanDedup(t(s, dir, "documents"), "doc_id", "text", k = 5)),

    // Winnowing local fingerprints (Schleimer-Wilkerson-Aiken SIGMOD'03,
    // the MOSS algorithm): k-gram polynomial hashes over the
    // formatting-free normalization, min per w-window, distinct selected
    // values. Row-local codegen selection; the oracle replays the exact
    // gram/window arithmetic with DuckDB list comprehensions.
    "q_winnowing" -> ((s, dir) =>
      DedupOps.winnowFingerprints(
        t(s, dir, "documents"), "doc_id", "text", k = 4, w = 8)),

    // Partial-overlap pairs on those fingerprints: shared substrings of
    // length >= w + k - 1 guarantee a shared fingerprint, so reuse
    // detection is a df-capped posting self-join — never an all-pairs
    // alignment. The df cap (boilerplate fingerprints out FIRST) is the
    // candidate-volume control that holds at 100 TB.
    "q_winnow_pairs" -> ((s, dir) =>
      DedupOps.winnowOverlapPairs(
        DedupOps.winnowFingerprints(
          t(s, dir, "documents"), "doc_id", "text", k = 4, w = 8),
        minShared = 8L, maxDf = 64L)),

    // Line-level boilerplate removal (CCNet/RefinedWeb pass). The source
    // docs are single-line, so the query deterministically wraps each in
    // web chrome first: a per-source header (df ~ docs/source — always
    // boilerplate), a per-(lang,source) tagline and a doc_id%97 promo
    // line (df straddles the threshold differently at every SF — the
    // boundary is exercised on BOTH sides at each scale), a global footer
    // (always dropped), and the unique body (always kept). Production
    // path dfs by 8-byte line hash; the oracle recomputes with exact
    // line-equality semantics, so the hash-compare also proves the
    // hash-keyed plan changes nothing.
    "q_line_dedup" -> ((s, dir) => {
      // coalesce matches DuckDB's concat NULL semantics (skip-as-empty);
      // Spark's concat would NULL the whole line and concat_ws would then
      // DROP it, shifting positions — divergent if a column is ever NULL
      def nn(c: Column) = coalesce(c, lit(""))
      val built = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          concat(lit("== "), nn(col("source")), lit(" news ==")),
          concat(lit("lang "), nn(col("lang")), lit(" @ "), nn(col("source"))),
          concat(lit("promo "), (col("doc_id") % 97).cast("string")),
          concat(lit("ref "), (col("doc_id") % 997).cast("string")),
          nn(col("text")),
          lit("(c) all rights reserved")).as("text"))
      DedupOps.lineDedup(built, "doc_id", "text", maxDocFreq = 8L)
    }),

    // MinHash -> banded LSH candidate generation, run with the PORTABLE
    // hash family so the registered query is oracle-gated end to end
    // (signatures, band keys, bucket join — hash-compared vs DuckDB).
    // Same production functions; pass family = XxHash64Family for the
    // cheaper non-oracle-able hashes (that family's bit-identity and
    // recall are pinned in DedupOpsSpec).
    "q_dedup_minhash" -> ((s, dir) => {
      // cache: the LSH bucket self-join reads the signatures from BOTH
      // sides — uncached, each side would redo the md5-per-shingle pass
      // (the same sets-cache decision minhashVerifiedPairs makes)
      val sigs = DedupOps.minhashSignatures(
        t(s, dir, "documents"), "doc_id", "text", k = 3, numHashes = 32,
        family = DedupOps.PortableFamily).cache()
      DedupOps.minhashLshCandidates(sigs, bands = 8, rowsPerBand = 4,
        family = DedupOps.PortableFamily)
    }),

    // The registered SimHash runs the portable 60-bit md5 token-hash
    // family end to end, so the signature itself hash-compares against
    // DuckDB — the q_dedup_minhash discipline: ONE implementation
    // (simhashOver) parameterized by family, the oracle-green family
    // registered, xxhash64 remaining the documented throughput default
    // (DedupOpsSpec pins its determinism and bit mixing).
    "q_dedup_simhash" -> ((s, dir) =>
      DedupOps.portableSimhash(t(s, dir, "documents"), "doc_id", "text")),

    // SimHash near-dup PAIRS (Manku WWW'07): pigeonhole chunk bucket
    // join over the portable signatures, row-local Hamming verify. The
    // oracle runs the naive all-pairs Hamming predicate — the
    // hash-compare IS the completeness proof for the chunk join.
    "q_simhash_neardup" -> ((s, dir) =>
      DedupOps.simhashNearDupPairs(
        DedupOps.portableSimhash(t(s, dir, "documents"), "doc_id", "text"),
        bits = 60, maxHamming = 5)),

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

    // Content-defined chunking of opaque payloads (Manber'94 anchors):
    // every boundary, length and chunk hash of every blob, gated — the
    // storage-dedup unit blob stores actually use. Payload-local codec
    // pass; the oracle regenerates the gear table in HUGEINT splitmix
    // SQL and replays the windowed rolling hash per byte position.
    "q_cdc_chunks" -> ((s, dir) =>
      MultimodalOps.contentChunks(
        MultimodalOps.mediaFromDocuments(t(s, dir, "documents"))).toDF()),

    // The dedup-ratio readout per modality: unique-vs-total chunk bytes
    // (the corpus plants exact text dups, so ratios are meaningfully
    // below 1). Chunk-metadata-sized aggregate — payload bytes never
    // shuffle.
    "q_cdc_dedup" -> ((s, dir) => {
      val chunks = MultimodalOps.contentChunks(
        MultimodalOps.mediaFromDocuments(t(s, dir, "documents"))).toDF()
        .withColumn("modality",
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("media_id") % 3 + 1).cast("int")))
      chunks
        .groupBy(col("modality"), col("chash"))
        .agg(count(lit(1)).as("refs"), min(col("len")).as("clen"))
        .groupBy(col("modality"))
        .agg(sum(col("refs")).as("total_chunks"),
          count(lit(1)).as("unique_chunks"),
          sum(col("refs") * col("clen")).as("total_bytes"),
          sum(col("clen")).as("unique_bytes"))
        .withColumn("dedup_ratio",
          col("unique_bytes").cast("double") / col("total_bytes").cast("double"))
    }),

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

    // The composed scale path: LSH candidates -> exact Jaccard verify on
    // candidates only, at the production 32/8/4 geometry, with the
    // portable family so the full pipeline is hash-gated by the driver
    // oracle (recall vs the exact ngram ground truth stays asserted in
    // DedupOpsSpec, for both families).
    "q_dedup_minhash_verified" -> ((s, dir) =>
      DedupOps.minhashVerifiedPairs(
        t(s, dir, "documents"), "doc_id", "text", k = 3, threshold = 0.2,
        family = DedupOps.PortableFamily)),

    // The same pipeline at a smaller 16/4/4 geometry (higher collision
    // probability per band — a second point on the S-curve, also
    // oracle-gated).
    "q_dedup_minhash_portable" -> ((s, dir) =>
      DedupOps.portableMinhashVerifiedPairs(
        t(s, dir, "documents"), "doc_id", "text", k = 3, threshold = 0.2)),

    // Near-dup pairs -> canonical duplicate CLUSTERS: connected components
    // (alternating star contraction, O(log n) rounds) over the Jaccard
    // pair graph; singleton docs keep their own id as the component.
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.ngramJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = 0.2)
      GraphOps.componentsOf(docs, "doc_id", pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("component"))
    }),

    // SOFT dedup: instead of dropping near-duplicates, DOWNWEIGHT them —
    // every member of a duplicate cluster trains at weight 1/|cluster|
    // (x10^6 exact grid), so the cluster contributes one document's worth
    // of gradient mass while keeping its phrasing diversity (the
    // sampling-weight alternative the hard q_dedup_apply cut discards).
    // One cluster-sized aggregate over the components frame joined back.
    "q_dedup_weights" -> ((s, dir) => dedupWeightsFrame(s, dir)),

    // Effective sample size of the soft-dedup weights — the number a
    // mixture planner actually budgets against: ESS = (Σw)²/Σw²
    // (Kish 1965). Exact long sums (micro weights ≤ 10⁶ per row), then
    // ONE multiply and ONE divide of correctly-rounded doubles; the
    // micro scale cancels in the ratio. ess_ratio = ESS/n — 1.0 means
    // dedup found nothing, 1/max_cluster_size means one gigantic clone
    // class dominates.
    "q_ess_weights" -> ((s, dir) =>
      dedupWeightsFrame(s, dir).agg(
        count(lit(1)).as("n_docs"),
        sum(col("weight_micro")).as("sum_w_micro"),
        sum(col("weight_micro") * col("weight_micro")).as("sum_w2"))
        .withColumn("ess",
          (col("sum_w_micro").cast("double") *
            col("sum_w_micro").cast("double")) / col("sum_w2").cast("double"))
        .withColumn("ess_ratio", col("ess") / col("n_docs").cast("double"))),

    // Quality-aware survivorship: within each near-dup cluster keep the
    // LONGEST document (most tokens; ties -> lowest id) instead of the
    // arbitrary min-id — truncated/mangled copies lose to the complete
    // one, the curation policy real pipelines want. One cluster-keyed
    // window over the components frame.
    "q_dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.ngramJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = 0.2)
      val comp = GraphOps.componentsOf(docs, "doc_id", pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("component"))
      val withQ = comp.join(
        docs.select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id")
      val byCluster = Window.partitionBy(col("component"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      withQ.select(col("doc_id"), col("component"), col("n_tokens"),
        (row_number().over(byCluster) === 1).cast("int").as("keep"))
    }),

    // Dedup APPLIED: keep one representative (the minimum id) per
    // near-dup cluster — the end-to-end "give me the cleaned corpus" op.
    "q_dedup_apply" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.ngramJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = 0.2)
      val reps = GraphOps.componentsOf(docs, "doc_id", pairs, "id_a", "id_b")
        .filter(col("node") === col("component"))
        .select(col("node").as("doc_id"))
      docs.join(reps, "doc_id").select(col("doc_id"), col("source"))
    }),

    // Dataset-card statistics per (source, lang): doc/token counts + PII
    // audit + quality bounds. Sums are integers and bounds are
    // order-independent — reproducible under any merge order (a double
    // quality SUM would not be).
    "q_corpus_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(TextOps.piiCount(col("text")).cast("long")).as("n_pii"),
          min(TextOps.qualityScore(col("text"))).as("min_quality"),
          max(TextOps.qualityScore(col("text"))).as("max_quality"))),

    // Top-3 characteristic terms per document by tf * (1/df) weighting
    // (df from the whole corpus; ratio instead of ln-idf keeps the score
    // an exact IEEE division — ln differs in last ulps across libm
    // implementations). The exploded token stream shuffles ONCE (map-side
    // partial tf counts); df = per-token row count OVER the tf aggregate
    // (== countDistinct(doc_id), since tf has one row per (doc, token)),
    // so no second corpus-sized shuffle and no distinct-expand. The
    // per-doc selection is the bounded top-k aggregate, not a row_number
    // window: each map task forwards <= 3 rows per doc instead of
    // shuffling and sorting the whole tf frame. The struct id carries
    // (token, tf, df) through the buffer; struct ordering is field-by-
    // field and tokens are unique per doc, so ties still break token ASC.
    "q_top_terms" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("token"))
      // cache the shared tf leg: without it the df side RE-SCANS the
      // corpus and repeats the (doc, token) shuffle (differing downstream
      // projections defeat exchange reuse — same trap as TPC-H Q15/Q17)
      val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        .cache()
      val df_ = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(df_), "token")
        .withColumn("score", col("tf").cast("double") / col("df"))
        .groupBy(col("doc_id"))
        .agg(graft.agg.TopKFunctions.topKByScore(
          col("score"), struct(col("token"), col("tf"), col("df")), 3).as("__t"))
        .select(col("doc_id"), posexplode(col("__t")).as(Seq("__p", "__h")))
        .select(col("doc_id"), (col("__p") + 1).cast("long").as("rank"),
          col("__h.id.token").as("token"), col("__h.id.tf").as("tf"),
          col("__h.id.df").as("df"), col("__h.score").as("score"))
    }),

    // Output-layout sizing plan for the sharded corpus sink
    // (LakeOps.writeSharded): files-per-partition by exact integer
    // ceiling — the sizing half of the write is fully oracled; the
    // filesystem effects (hive dirs, per-file row cap, losslessness,
    // layout determinism) are pinned in LakeOpsSpec.
    "q_lake_layout" -> ((s, dir) =>
      LakeOps.layoutPlan(t(s, dir, "documents"), Seq("source"), 40L)),

    // Two-level hive layout sizing (the multi-column partitionBy case
    // LakeOpsSpec round-trips on disk): one count aggregate over both
    // partition columns.
    "q_lake_layout2" -> ((s, dir) =>
      LakeOps.layoutPlan(t(s, dir, "documents"), Seq("source", "lang"), 25L)),

    // Shuffle-once-at-write-time: both join sides land as bucketed tables
    // on the join key (8 buckets, bucket-sorted), then the revenue join
    // reads HashPartitioning straight from the scans — zero Exchange on
    // either join input (BucketJoinSpec pins it). The oracle re-joins the
    // raw parquet, so a green row also proves the bucketed round-trip is
    // lossless.
    "q_bucket_join" -> ((s, dir) => {
      // table names keyed to the (immutable) input dir: within a session
      // the bucketed write happens ONCE and later runs pay only the
      // shuffle-free join — the amortization the operator exists for
      val sfx = java.lang.Integer.toHexString(dir.hashCode)
      LakeOps.writeBucketedIfAbsent(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        s"graft_bkt_lineitem_$sfx", Seq("l_orderkey"), nBuckets = 8)
      LakeOps.writeBucketedIfAbsent(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        s"graft_bkt_orders_$sfx", Seq("o_orderkey"), nBuckets = 8)
      s.table(s"graft_bkt_lineitem_$sfx")
        .join(s.table(s"graft_bkt_orders_$sfx"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg((sum(revU) / 10000.0).as("revenue"))
    }),

    // Right-to-be-forgotten erasure with cascade + residual audit: a
    // deterministic delete-list of customers propagates through the FK
    // chain (customer -> orders -> lineitem) via anti joins, and each
    // table reports before/after/erased plus a residual count that MUST
    // be zero — the verification regulators actually ask for. The
    // delete-list broadcasts; the doomed-orders key set is fact-derived,
    // so the lineitem erase is a keyed anti join (never broadcast at
    // 100 TB) — each anti join is the table's one shuffle.
    "q_erasure" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ords = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val doomed = cust.filter(pmod(col("c_custkey"), lit(10)) === 3)
        .select(col("c_custkey"))
      val custAfter = cust.join(broadcast(doomed), Seq("c_custkey"),
        "left_anti")
      val ordsAfter = ords.join(broadcast(doomed),
        col("o_custkey") === col("c_custkey"), "left_anti")
      val doomedOrders = ords.join(broadcast(doomed),
        col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"))
      val liAfter = li.join(doomedOrders,
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      def leg(name: String, before: DataFrame, after: DataFrame,
          residual: DataFrame) =
        before.agg(count(lit(1)).as("n_before")).crossJoin(
          after.agg(count(lit(1)).as("n_after"))).crossJoin(
          residual.agg(count(lit(1)).as("n_residual")))
          .select(lit(name).as("table_name"), col("n_before"),
            col("n_after"),
            (col("n_before") - col("n_after")).as("n_erased"),
            col("n_residual"))
      leg("customer", cust, custAfter,
        custAfter.join(broadcast(doomed), Seq("c_custkey"), "left_semi"))
        .unionByName(leg("orders", ords, ordsAfter,
          ordsAfter.join(broadcast(doomed),
            col("o_custkey") === col("c_custkey"), "left_semi")))
        .unionByName(leg("lineitem", li, liAfter,
          liAfter.join(doomedOrders,
            col("l_orderkey") === col("o_orderkey"), "left_semi")))
    }),

    // Join-key skew diagnostic (run BEFORE choosing saltedJoin): key
    // cardinality, max/median/p99 group sizes, skew ratio, hottest keys.
    // One corpus-sized count shuffle; rank selection pays one KEY-sized
    // SinglePartition window (the op's documented bound).
    "q_skew_report" -> ((s, dir) =>
      ProfileOps.skewReport(t(s, dir, "lineitem"), col("l_suppkey"))),

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

    // Zone-map stats (the data-skipping index) over lineitem laid out by
    // ship month, with the skip verdicts of two range predicates: the
    // date range touches ~3 zones (layout-aligned key -> tight
    // envelopes), while the same-selectivity price range touches nearly
    // every zone (unclustered key -> useless envelopes) — the measured
    // argument for Z-ordering. Pruned-scan == full-filter equivalence
    // and directory-level PartitionFilters are pinned in LakeOpsSpec.
    "q_zone_map" -> ((s, dir) => {
      val zm = LakeOps.zoneMap(t(s, dir, "lineitem"),
        date_format(col("l_shipdate"), "yyyy-MM"),
        "ship" -> to_date(col("l_shipdate")),
        "cents" -> round(col("l_extendedprice") * 100).cast("long"))
      zm.select(col("zone"), col("n_rows"),
        date_format(col("min_ship"), "yyyy-MM-dd").as("min_ship"),
        date_format(col("max_ship"), "yyyy-MM-dd").as("max_ship"),
        col("min_cents"), col("max_cents"),
        LakeOps.zoneTouched("ship",
          lit("1996-02-01").cast("date"), lit("1996-04-30").cast("date"))
          .as("touch_ship"),
        LakeOps.zoneTouched("cents", lit(9000000L), lit(9100000L))
          .as("touch_cents"))
    }),

    // Bloom-filter partition index — the point-lookup twin of q_zone_map:
    // orders laid out by month, probed with 400 keys — 200 live ones and
    // 200 from 1e12 up (absent at ANY scale factor; keys stay positive so
    // the HUGEINT mod-2^64 replay stays on the unsigned branch). The
    // splitmix64 family replays in HUGEINT SQL, so the oracle gates the
    // PRUNING DECISIONS themselves (n_candidate_parts per probe), not
    // just the row counts — a false negative or a wrongly-set bit on
    // either side breaks the hash.
    "q_bloom_index" -> ((s, dir) =>
      LakeOps.bloomPointLookup(
        t(s, dir, "orders"),
        partCol = expr("year(o_orderdate) * 12 + month(o_orderdate)"),
        keyCol = col("o_orderkey"),
        probes = s.range(1, 201)
          .union(s.range(1000000000001L, 1000000000201L)).toDF("probe"),
        probeCol = col("probe"),
        mBits = 65536, k = 3)),

    // Bloom-index LIFECYCLE through IndexOps.refresh: base 2/3 of the
    // orders built first, the remaining 1/3 folded in as a segment via
    // the OR-monoid merge (one layout-sized bit_or — the corpus is read
    // once per segment, ever), idempotent re-refresh, then EVERY pruning
    // decision of the merged index gated: the oracle replays the
    // from-scratch build over the full table in HUGEINT splitmix SQL, so
    // green means merged-after-append == rebuilt, bit for bit.
    "q_index_refresh_bloom" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val part = expr("year(o_orderdate) * 12 + month(o_orderdate)")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_idxb_").toString
      IndexOps.refreshBloom(orders.filter(col("o_orderkey") % 3 =!= 0),
        idx, "base", part, col("o_orderkey"))
      IndexOps.refreshBloom(orders.filter(col("o_orderkey") % 3 === 0),
        idx, "delta1", part, col("o_orderkey"))
      IndexOps.refreshBloom(orders.filter(col("o_orderkey") % 3 === 0),
        idx, "delta1", part, col("o_orderkey")) // idempotent re-run
      LakeOps.bloomCandidates(
        IndexOps.readBloom(s, idx),
        probes = s.range(1, 201)
          .union(s.range(1000000000001L, 1000000000201L)).toDF("probe"),
        probeCol = col("probe"), mBits = 65536, k = 3)
        .select(col("probe"), col("part").cast("long").as("part"))
    }),

    // Lake drift detection: one (n_rows, xor-of-content-hash) row per
    // (source, lang) partition — snapshot comparison without re-reading
    // either lake. The portable rolling fingerprint makes the XOR
    // engine-comparable.
    "q_partition_hash" -> ((s, dir) =>
      LakeOps.partitionFingerprints(
        t(s, dir, "documents"),
        TextOps.fingerprint(col("text")),
        "source" -> col("source"), "lang" -> col("lang"))),

    // Rendezvous (HRW) shard placement under 8 shards and after growing
    // to 9: row-local argmax over the splitmix family, no shuffle, no
    // directory service. The gated frame carries BOTH assignments plus
    // the moved flag, so the oracle hash-pins the consistent-placement
    // law: every moved key lands on the NEW shard (RendezvousSpec
    // asserts it; the driver hash would break if either argmax drifted).
    "q_rendezvous_shard" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        LakeOps.rendezvousShard(col("doc_id"), 8).as("shard8"),
        LakeOps.rendezvousShard(col("doc_id"), 9).as("shard9"))
        .withColumn("moved", (col("shard8") =!= col("shard9")).cast("int"))),

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

    // Per-doc Shannon entropy of the token distribution (2^-20-bit fixed
    // point) — the diversity/repetition quality signal, engine-exact via
    // the codegen'd integer log2 (no libm in the gate). One (doc, token)
    // count + one doc fold.
    "q_token_entropy" -> ((s, dir) =>
      TextOps.tokenEntropy(t(s, dir, "documents"))),

    // Mixture-drift diagnostic: per-source KL(P_source || P_corpus) over
    // token distributions, exact fixed point (emitted as the undivided
    // n_s-scaled sum — no integer division in the gate). Corpus counts
    // derive from the vocabulary-sized frame, never a second corpus
    // pass.
    "q_source_kl" -> ((s, dir) =>
      graft.ops.ProfileOps.tokenKlByGroup(
        t(s, dir, "documents"), col("source"))),

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

    // MERGE INTO / CDC upsert-apply (lakehouse incremental write): a
    // changelog of updates, deletes, re-inserts and multi-version rows
    // lands on a snapshot; latest seq wins per key, delete winners drop.
    // NO join — snapshot+changelog union rides ONE key shuffle with a
    // map-side partial max_by (LakeOps.applyChanges scaladoc).
    "q_merge_upsert" -> ((s, dir) => {
      val (snapshot, changes) = cdcFeed(s, dir)
      LakeOps.applyChanges(snapshot, changes,
        keyCol = "o_orderkey", seqCol = "seq", opCol = "op")
    }),

    // The streaming CDC operator's batch form: the SAME planted
    // changelog, bootstrap snapshot replayed as seq=-inf 'U' changes
    // (the standard streaming bootstrap), folded by
    // CdcStream.latestView — the IDENTICAL declarative plan the
    // streaming twin runs as ONE stateful aggregation in update mode
    // (CdcStreamSpec pins streamed == batch on out-of-order, stale,
    // duplicate-delivery and post-tombstone feeds). applyChanges
    // (q_merge_upsert) and this fold agree by construction — both
    // gated so neither formulation can drift.
    "q_cdc_view" -> ((s, dir) => {
      val (snapshot, changes) = cdcFeed(s, dir)
      val snapAsChanges = snapshot.select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("total_cents"),
        lit(Long.MinValue).as("seq"), lit("U").as("op"))
      graft.streaming.CdcStream.latestView(
        snapAsChanges.unionByName(changes), "o_orderkey", "seq", "op")
    }),

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

    // Keyword relevance search: rational-idf BM25 (no ln — bit-identical
    // scores on every engine/libm), one stats row broadcast back, row-local
    // scoring, TakeOrderedAndProject top-k. Two corpus passes, zero wide
    // shuffles.
    // Exact-phrase query over the positional inverted index: three
    // postings legs (each pre-filtered to ONE token) equi-joined on
    // (doc_id, pos - i) — candidate volume bounded by the rarest term's
    // df; a contains() scan reads every document instead. Gates every
    // occurrence position.
    "q_phrase_search" -> ((s, dir) =>
      SearchOps.phraseSearch(
        SearchOps.positionalPostings(t(s, dir, "documents"), "doc_id", "text"),
        Seq("slow", "hash", "batch"))),

    // Index LIFECYCLE, gated end to end (IndexOps.refresh): build the
    // token-bucket postings lake on the base 2/3 of the corpus, APPEND
    // the remaining 1/3 as a named segment (pure file adds into the
    // existing bucket partitions — base postings bytes never rewritten),
    // prove idempotence by re-refreshing the base segment (a ledger
    // no-op), then phrase-search THROUGH the refreshed lake. The oracle
    // replays the phrase over the full corpus — green means
    // append-without-rebuild produced exactly the from-scratch index's
    // answers, delta docs included (the from_delta flag pins that delta
    // occurrences are really present).
    "q_index_refresh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_idx_").toString
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 =!= 0), idx, "base")
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 === 0), idx, "delta1")
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 =!= 0), idx, "base") // idempotent re-run
      IndexOps.phraseSearch(s, idx, Seq("slow", "hash", "batch"))
        .withColumn("from_delta", (col("doc_id") % 3 === 0).cast("int"))
    }),

    // The ledger side of the lifecycle: which EXPECTED segments has the
    // index not folded in yet? (The assertion a scheduled ingest alerts
    // on.) base+delta1 refreshed, delta2 deliberately absent -> covered
    // 1/1/0.
    "q_index_staleness" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 120)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_idxs_").toString
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 =!= 0), idx, "base")
      IndexOps.refreshPostings(docs.filter(col("doc_id") % 3 === 0), idx, "delta1")
      IndexOps.staleness(s, idx, "postings", Seq("base", "delta1", "delta2"))
    }),

    "q_bm25_search" -> ((s, dir) =>
      SearchOps.bm25TopK(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        Seq("vector", "customer", "stream"), k = 20)),

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

    // Pretraining data mixing: upweight two curated sources (2.5x / 2x),
    // downweight one (0.25x), keep the rest at 1x — row-local replication
    // (chained-when weight + sequence/explode), no join, no shuffle.
    "q_mixture_resample" -> ((s, dir) =>
      SamplingOps.mixtureResample(
        t(s, dir, "documents"),
        col("source"), col("doc_id"),
        Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.25))
        .select(col("doc_id"), col("source"), col("copy"))),

    // BPE vocabulary induction, round one: adjacent character-pair counts
    // over corpus words (explode + groupBy; further rounds iterate on the
    // small distinct-word table — PrepOps.bpeTrain, spec-tested).
    "q_bpe_pairs" -> ((s, dir) =>
      PrepOps.bpePairCounts(t(s, dir, "documents"), col("text"))
        .orderBy(col("n").desc, col("pair"))
        .limit(50)),

    // Epoch-1 training order: salted shard assignment + shard-local
    // content-keyed rank. The only shuffle is the shard partitioning;
    // each shard sorts locally (shards scale with the corpus — never a
    // global sort).
    // BPE encode with a FROZEN merge list — how production tokenizers
    // work (train once offline, apply at corpus scale as plan literals;
    // the row-local codegen'd encoder makes a 100 TB tokenization pass a
    // pure map with zero shuffles). Freezing the merges is also what
    // makes this oracle-able: the same 32 literals feed a DuckDB
    // recursive CTE that replays the encoder's exact priority loop
    // (merge ALL occurrences of the lowest-ranked applicable pair,
    // repeat), so the segmentation hash-compares end to end. The TRAINER
    // stays differential-tested in PrepOpsSpec (bpeTrainLocal == bpeTrain)
    // and corpus-gated via q_bpe_pairs; [[bpeFrozenMerges]] is its output
    // on the sf0.01 corpus, frozen.
    "q_bpe_encode" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        PrepOps.bpeEncode(col("text"), bpeFrozenMerges).as("pieces"))
        .select(col("doc_id"), size(col("pieces")).as("n_pieces"),
          array_join(col("pieces"), "|").as("pieces_str"))),

    "q_train_order" -> ((s, dir) =>
      PrepOps.trainingOrder(
        t(s, dir, "documents"), col("doc_id"),
        TextOps.fingerprint(col("text")), shards = 8, salt = 7L)
        .select(col("id").as("doc_id"), col("shard"), col("rank"))),

    // The end-to-end cleaning pipeline a pretraining run actually executes,
    // composed from gated pieces: Gopher-style signal filters (row-local,
    // evaluated at the scan) -> exact-substring span dedup on the survivors
    // -> exact dedup of the reassembled text. Every stage keeps the
    // corpus-sized shuffles hash-keyed (span hash, text fingerprint).
    "q_corpus_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val filtered = docs.filter(
        TextOps.tokenCount(col("text")) >= 20 &&
          TextOps.distinctTokenFrac(col("text")) >= 0.45)
      val spanned = DedupOps.spanDedup(filtered, "doc_id", "text", 5)
        .filter(col("n_kept") > 0)
      DedupOps.exactDedup(spanned, "doc_id", col("text_clean"))
    }),

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

    // ------------------------------------------- sample preparation
    "q_chunk_tokens" -> ((s, dir) =>
      PrepOps.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, overlap = 8)),

    "q_pack_sequences" -> ((s, dir) =>
      PrepOps.packGreedy(t(s, dir, "documents"), "doc_id", "text",
        budgetTokens = 512, buckets = 8)),

    // Gated projection stringifies the int8 vector (comma-joined): the
    // driver's pandas comparator cannot sort array cells. quantizeInt8
    // itself still returns the real ARRAY<INT> column.
    "q_embed_quantize" -> ((s, dir) =>
      PrepOps.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("qvec"), x => x.cast("string")), ",")
            .as("qvec_str"))),

    // Z-order (Morton) clustering key over the 2-D (partkey, suppkey)
    // access pattern — the lakehouse OPTIMIZE-ZORDER layout key. Pure
    // codegen'd bit arithmetic, zero shuffles; file-skipping effect
    // quantified in PrepOpsSpec (an aligned 2-D box touches 1 contiguous
    // key bucket vs one stripe per x under lexicographic order).
    "q_zorder" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        PrepOps.zorderKey(col("l_partkey"), col("l_suppkey")).as("zkey"))),

    // Hilbert clustering key over the same access pattern: no diagonal
    // jumps (consecutive curve positions are grid neighbors), so bbox
    // predicates touch fewer contiguous key runs than under the Morton
    // key in aggregate (PrepOpsSpec measures the box sweep). The
    // stateful per-bit walk is one codegen'd expression; the oracle
    // unrolls the identical walk level by level.
    "q_hilbert_layout" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        PrepOps.hilbertKey(col("l_partkey"), col("l_suppkey")).as("hkey"))),

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

    // Two-pass heavy hitters: a Misra-Gries sketch (bounded buffers — the
    // shuffle is partitions x capacity counters no matter how many distinct
    // keys exist) yields a GUARANTEED candidate superset of every key with
    // count > N/1025; an exact count restricted to the broadcast candidates
    // then makes the output exact — so the gated result is deterministic
    // and fully oracled even though any MG summary's surviving-counter set
    // is split-order-dependent. At a billion distinct keys this replaces a
    // full groupBy-every-key shuffle with kilobytes.
    "q_heavy_hitters" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val sk = orders.agg(
        graft.agg.FrequentItems.freqSketch(col("o_custkey"), 1024).as("mg"),
        count(lit(1)).as("total"))
      val cands = sk
        .select(explode(col("mg")).as("e"), col("total"))
        .select(col("e.key").as("o_custkey"), col("total"))
      orders.join(broadcast(cands), "o_custkey")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), max(col("total")).as("total"))
        .filter(col("n_orders") * 1024 > col("total"))
        .select(col("o_custkey"), col("n_orders"))
    }),

    // Count-min sketch point-frequency estimates (SketchOps) — the
    // fixed-space complement to q_heavy_hitters' Misra-Gries top-k. w=256
    // is deliberately tight for ~1000 live keys so collisions HAPPEN and
    // the min-fold does real work; the oracle replays every counter and
    // gates est >= exact per probe (overcount is exact-valued, never a
    // statistical bound, because the hash family is deterministic).
    "q_cms_freq" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val probes = s.range(1, 201).toDF("probe")
      val sketch = SketchOps.cmsSketch(orders, col("o_custkey"), w = 256, d = 3)
      val est = SketchOps.cmsEstimate(sketch, probes, col("probe"), w = 256, d = 3)
      // the exact leg stays probe-bounded: broadcast-semi the corpus down
      // to probed keys FIRST, so the verification frame never grows with
      // the key universe (the sketch exists precisely because that
      // universe is too big to groupBy)
      val exact = orders
        .join(broadcast(probes.select(col("probe").as("ck"))),
          col("o_custkey").cast("long") === col("ck"))
        .groupBy("ck").agg(count(lit(1)).as("exact_count"))
      est.join(broadcast(exact), col("probe") === col("ck"), "left")
        .select(col("probe").as("probe_key"), col("cms_count"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"),
          (col("cms_count") - coalesce(col("exact_count"), lit(0L)))
            .as("overcount"))
    }),

    // KMV set algebra (SketchOps.kmvIntersect): |A union B| and
    // |A intersect B| estimated from the two k-long sketches ALONE —
    // the optimizer's join-cardinality / overlap primitive. A = customers
    // with orders, B = one market segment; the exact legs ride one
    // full-outer on distinct keys purely for the gate's comparison.
    "q_kmv_join_card" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("key"))
      val b = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("key"))
      val sk = SketchOps.kmvIntersect(a, col("key"), b, col("key"), k = 64)
      val ex = a.distinct().withColumnRenamed("key", "ak")
        .join(b.distinct().withColumnRenamed("key", "bk"),
          col("ak") === col("bk"), "full")
        .agg(count(col("ak")).as("exact_a"), count(col("bk")).as("exact_b"),
          count(lit(1)).as("exact_union"),
          sum(when(col("ak").isNotNull && col("bk").isNotNull, 1L)
            .otherwise(0L)).as("exact_inter"))
      sk.crossJoin(broadcast(ex)) // 1-row x 1-row
    }),

    // KMV distinct sketch (SketchOps.kmvDistinct) — the third sketch leg:
    // Misra-Gries answers "which keys are hot", CMS "how often is key x",
    // KMV "how many distinct keys" — and unlike the HLL++ in
    // q_approx_distinct (gated within 5%), every KMV number is
    // deterministic, so the oracle pins the k-th order-statistic hash and
    // the estimate bit-for-bit. Grouped by (month, status): F/O cells
    // hold > k distinct custkeys (estimate branch), the rare 'P' cells
    // fewer (exact small-set branch) — both paths live at every SF.
    // KMV as a STREAMED summary, driver-gated: the event feed split into
    // 3 "micro-batch" segments, one sketch per segment, and a merged row
    // folded from the segment sketches alone (k-smallest of the union of
    // k-smallest — the monoid a streaming ingest applies per trigger and
    // a lake applies per partition). The oracle computes every segment
    // AND the merged row from the raw feed, so a hash match proves
    // merge(sketches) == sketch(union) exactly — the mergeable-summary
    // law itself, not a recomputation. SketchStreamSpec carries the live
    // streamed==batch differential for the same aggregate.
    "q_kmv_stream" -> ((s, dir) =>
      SketchOps.kmvSegmented(
        RefQueries.events(s, dir),
        segCol = pmod(col("event_id"), lit(3)),
        keyCol = col("user_id"), k = 64)),

    "q_kmv_distinct" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val month = expr("year(o_orderdate) * 12 + month(o_orderdate)")
      val sk = SketchOps.kmvDistinct(
        o, Seq("part_month" -> month.cast("long"),
          "status" -> col("o_orderstatus")),
        col("o_custkey"), k = 64)
      val exact = o
        .groupBy(month.cast("long").as("m2"), col("o_orderstatus").as("s2"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      sk.join(broadcast(exact),
          col("part_month") === col("m2") && col("status") === col("s2"))
        .select(col("part_month"), col("status"), col("n_kept"),
          col("kth_hash"), col("est_distinct"), col("n_exact"),
          (col("est_distinct") / col("n_exact").cast("double"))
            .as("est_ratio"))
    }),

    // ------------------------------------------------------- vocabulary
    "q_vocab_topk" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.tokens(lower(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100)),

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

    // Leakage-safe grouped k-fold: every member of a near-dup cluster
    // lands in the SAME fold (fold = portable hash of the component id),
    // so no fold ever evaluates on a near-copy of another fold's
    // training doc — the grouped-CV discipline plain random splits
    // break. Components reuse the proven Jaccard-pair machinery.
    "q_group_kfold" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.ngramJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = 0.2)
      GraphOps.componentsOf(docs, "doc_id", pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("component"),
          (DedupOps.portableShingleHash(col("component").cast("string")) % 5)
            .cast("int").as("fold"))
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

    // ------------------------------------------------------ event stream
    "q_events_hourly" -> ((s, dir) =>
      EventOps.hourlyStats(RefQueries.events(s, dir))),

    // Watermark late-data accounting: per hour, how many events a
    // 10-minute watermark would drop and their total lateness — the
    // prefix-max over arrival order runs as the two-phase distributed
    // scan (bucket maxima -> metadata-sized cross-bucket prefix ->
    // per-bucket parallel windows), never a global sort. The synthetic
    // feed arrives perfectly ordered (n_late would be identically 0), so
    // the gate plants deterministic ingest disorder: arrival order
    // reverses each 16-event block (a bijection both engines compute),
    // modeling multi-partition interleave — inter-event gaps make real
    // late drops fire. The oracle is the naive single-window
    // formulation — hash equality proves the distributed scan computes
    // the same watermark at every record.
    "q_late_data" -> ((s, dir) =>
      EventOps.lateDataReport(RefQueries.events(s, dir),
        delayUs = 600000000L,
        arrival = expr("event_id DIV 16 * 16 + 15 - event_id % 16"))),

    "q_sessionize" -> ((s, dir) =>
      EventOps.sessionStats(RefQueries.events(s, dir), gapMinutes = 30)),

    // Sliding (hopping) event-time windows — 1h length, 15min hop: each
    // event lands in exactly 4 windows via the native `window()` Expand
    // (row-local replication, ONE (type, window) shuffle; the same
    // aggregate runs watermarked as a stream). The oracle replicates each
    // event to its 4 aligned window starts with a range() cross join.
    "q_events_sliding" -> ((s, dir) =>
      EventOps.slidingStats(RefQueries.events(s, dir))),

    // Native session_window twin of q_sessionize: the built-in merging
    // session aggregate (ONE user-keyed shuffle; also the streaming form
    // with watermarked state expiry) vs the lag+cumsum island build.
    // Microsecond-exact on both sides: Spark merges while the gap is
    // < 30 min and stamps end = last_ts + gap; the oracle reproduces the
    // exact >= rule and arithmetic in epoch microseconds.
    "q_session_window" -> ((s, dir) =>
      RefQueries.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"))),

    // Time-weighted mean per user (piecewise-constant hold between
    // events): integer cents x integer microsecond durations keep the
    // accumulator reduction-order-proof; one user-keyed Exchange shared
    // by the lead window and the aggregate.
    "q_time_weighted_avg" -> ((s, dir) =>
      EventOps.timeWeightedAvg(RefQueries.events(s, dir))),

    // Retry-storm / double-fire collapse: (user, type) events within 30 s
    // of their predecessor merge into one burst row. Both window passes
    // share one keyed Exchange; integer-microsecond gaps only.
    "q_collapse_bursts" -> ((s, dir) =>
      EventOps.collapseBursts(RefQueries.events(s, dir), gapUs = 30000000L)),

    // Next-event training pairs: context = up to 3 preceding event types
    // per user, oldest first. One keyed Exchange; bounded ROWS frame.
    "q_seq_windows" -> ((s, dir) =>
      EventOps.sequenceWindows(RefQueries.events(s, dir), ctxLen = 3)),

    // First-order Markov transitions: exact pair counts + one portable
    // conditional-probability division per (prev, next) row.
    "q_transition_matrix" -> ((s, dir) =>
      EventOps.transitionMatrix(RefQueries.events(s, dir))),

    // Exact 7-day rolling distinct users per day: each active day covers
    // [a, min(a+6, next-1)] (disjoint by construction), so the count is
    // a bounded row-local explode + one tiny day-keyed aggregate — never
    // a W-wide range self-join or a windowed collect_set over the fact.
    "q_rolling_dau" -> ((s, dir) =>
      EventOps.rollingActiveUsers(RefQueries.events(s, dir), windowDays = 7)),

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

    // Vocabulary coverage curve (tokenizer sizing): top-40 token types
    // and the cumulative share of running tokens they cover, on the
    // exact x10^6 grid. Corpus explode collapses map-side into a
    // vocab-sized frame; the rank window sorts the VOCAB, not the
    // corpus.
    "q_vocab_coverage" -> ((s, dir) =>
      TextOps.vocabCoverage(t(s, dir, "documents"), col("text"), k = 40)),

    // Did the language mix shift per source? Per-cell chi-square terms
    // as exact integer rationals with one closing division each (a
    // double Σ over cells would be reduction-order-dependent; summing
    // is the consumer's one cheap step).
    "q_chisq" -> ((s, dir) =>
      ProfileOps.chiSquareCells(
        t(s, dir, "documents"), col("source"), col("lang"))
        .select(col("a").as("source"), col("b").as("lang"),
          col("o"), col("e"), col("chi_term"))),

    // Byte-concentration per source: exact rank-formulation Gini in
    // int64 with one closing division.
    "q_gini" -> ((s, dir) =>
      ProfileOps.giniByGroup(
        t(s, dir, "documents"), col("source"), col("n_chars"))
        .select(col("group").as("source"), col("n"), col("total"),
          col("gini"))),

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

    // Quantity-revenue coupling per return flag: exact integer power
    // sums, then the fixed double chain (dollars, not cents — the
    // Σy² headroom note on corrByGroup).
    "q_correlation" -> ((s, dir) =>
      ProfileOps.corrByGroup(
        t(s, dir, "lineitem"), col("l_returnflag"),
        col("l_quantity"), round(col("l_extendedprice")).cast("long"))
        .select(col("group").as("l_returnflag"), col("n"), col("r"))),

    // Point-in-time join: latest click at-or-before each error, per user.
    // One union + one window shuffle — never a range cross product.
    "q_asof_join" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts").as("click_ts"), col("click_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
      JoinOps.asofJoin(errors, clicks,
        keys = Seq("user_id"), tsLeft = "ts", tsRight = "click_ts",
        payloadCols = Seq("click_id"))
        .select(col("error_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"),
          col("click_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("clicked_at"))
    }),

    // The NATIVE as-of join (custom LogicalPlan -> SparkStrategy ->
    // SparkPlan, plans/AsofJoinPlan.scala): same query as q_asof_join,
    // same DuckDB ASOF oracle — a green row proves the whole-operator
    // extension path end to end. One O(1)-state merge pass per
    // co-partitioned sorted partition; AsofJoinPlanSpec pins the
    // 2-Exchange plan and the equivalence with the composed operator.
    "q_asof_native" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id").as("c_uid"), col("ts").as("click_ts"),
          col("click_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
      graft.plans.AsofJoinPlan.asofJoin(errors, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("c_uid"),
        leftTime = "ts", rightTime = "click_ts")
        .select(col("error_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"),
          col("click_id"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("clicked_at"))
    }),

    // Keyed interval join (the stream-stream join's batch semantics —
    // streamed==batch is EventOpsSpec-verified): each error paired with
    // the same user's clicks in the preceding 30 minutes.
    "q_clicks_before_errors" -> ((s, dir) =>
      EventOps.clicksBeforeErrors(RefQueries.events(s, dir), withinMinutes = 30)),

    // Stream-static enrichment (lookup-table decoration; streamed==batch
    // is EventOpsSpec-verified): dimension side broadcast, fact side never
    // shuffled — the per-event cost at 100 TB is a hash probe.
    "q_events_enriched" -> ((s, dir) =>
      EventOps.enrichEvents(RefQueries.events(s, dir), t(s, dir, "customer"))),

    // Fixed-iteration PageRank over the customer<->supplier trade graph,
    // in 64-bit fixed point: every reduction is an integer sum, so ranks
    // are bit-identical under any partitioning AND exactly reproducible
    // by the oracle's unrolled integer recurrence (a float PageRank could
    // not be hash-compared across engines). Per iteration the edge list
    // stays put (hash-partitioned once); only the node-sized rank table
    // moves — the iterative-graph scale shape.
    // Node encoding: customers are 2k, suppliers 2k+1 — provably disjoint
    // at ANY scale (an additive offset like suppkey + 1e6 silently merges
    // nodes once custkeys cross the offset, and the oracle, sharing the
    // encoding, could never catch it).
    "q_pagerank" -> ((s, dir) => {
      val e = custSuppPairs(s, dir)
      val edges = e.select(col("cust").as("src"), col("supp").as("dst"))
        .union(e.select(col("supp").as("src"), col("cust").as("dst")))
      GraphOps.pageRank(edges, "src", "dst", iters = 5)
    }),

    // Personalized PageRank (random walk with restart): teleport mass
    // returns to ONE seed customer, so scores localize around its
    // suppliers and co-purchasing customers — the graph-recommender
    // candidate generator. Unreached nodes stay at exact 0; the oracle
    // unrolls the same seeded recurrence.
    "q_ppr" -> ((s, dir) => {
      val e = custSuppPairs(s, dir)
      val edges = e.select(col("cust").as("src"), col("supp").as("dst"))
        .union(e.select(col("supp").as("src"), col("cust").as("dst")))
      GraphOps.personalizedPageRank(
        edges, "src", "dst", seeds = Seq(2L), iters = 3)
    }),

    // HITS hubs & authorities (Kleinberg) on the directed
    // customer->supplier graph — customers are pure hubs, suppliers pure
    // authorities, so both sides of the alternating recurrence carry
    // real mass. Exact fixed point with max-normalization (no sqrt/L2 —
    // nonneg toward-zero division, portable); the oracle unrolls all 3
    // rounds including each round's 1-row max.
    "q_hits" -> ((s, dir) =>
      GraphOps.hits(
        custSuppPairs(s, dir).select(
          col("cust").as("src"), col("supp").as("dst")),
        "src", "dst", iters = 3)),

    // Canonical PageRank semantics on the DIRECTED customer->supplier
    // graph: every supplier is dangling (no out-edges), so this exercises
    // the redistribute-dangling-mass mode hard — its rank mass re-enters
    // the recurrence as an exact integer share each iteration, and the
    // oracle unrolls the same scalar term per round.
    "q_pagerank_dangling" -> ((s, dir) => {
      val e = custSuppPairs(s, dir)
        .select(col("cust").as("src"), col("supp").as("dst"))
      GraphOps.pageRank(e, "src", "dst", iters = 3, redistributeDangling = true)
    }),

    // Per-node triangle counts over the part co-occurrence graph (parts
    // appearing in the same order). Degree-ordered orientation bounds the
    // wedge join by O(sqrt(m)) out-degrees — hub-degree-proof — while
    // the oracle counts the same triangles with the plain id-ordered
    // three-way join (equivalent result, only viable at oracle scale).
    // Co-occurrence pairs are generated ROW-LOCALLY from each order's
    // sorted part set (groupBy + nested transform) instead of an
    // items-on-items self-join: no join, no broadcast of a corpus-sized
    // side, and one less distinct — measured 1.8 s -> 1.5 s warm for the
    // edge stage, and the at-scale shape no longer depends on the item
    // table fitting anywhere.
    "q_triangles" -> ((s, dir) =>
      GraphOps.triangleCounts(partCooccurrenceEdges(s, dir), "u", "v")),

    // k-core of the customer-supplier interaction graph (disjoint
    // even/odd node encoding, as q_pagerank): the coreness filter that
    // drops weakly-attached nodes a raw degree cut keeps. rounds=8 is
    // past fixpoint on this graph (rounds-invariance pinned in
    // GraphOpsSpec); the oracle unrolls the identical 8 synchronous
    // peel rounds.
    "q_kcore" -> ((s, dir) => {
      val e = custSuppPairs(s, dir)
        .select(col("cust").as("u"), col("supp").as("v"))
      GraphOps.kCoreNodes(e, "u", "v", k = 40, rounds = 8)
        .select(col("node"), col("degree"))
    }),

    // Market-basket co-occurrence: unordered part pairs bought together
    // in >= 3 orders. Basket-local pair generation under the
    // maxBasketSize skew guard — never an unbounded item self-join.
    "q_cooccurrence" -> ((s, dir) =>
      GraphOps.cooccurrencePairs(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minCount = 3L)
        .select(col("item_a"), col("item_b"), col("n_baskets"))),

    // Association rules (Agrawal et al. SIGMOD'93) over order->brand
    // baskets: support/confidence/lift, directional. Pair explosion is
    // row-local after ONE basket-keyed collect_set shuffle (baskets are
    // small; the corpus-sized self-join is the rejected plan); the brand
    // dimension joins in broadcast. Confidence/lift are single IEEE
    // divisions of exact longs — engine-portable.
    "q_assoc_rules" -> ((s, dir) =>
      AssocOps.assocRules(
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")),
            col("l_partkey") === col("p_partkey")),
        basketCol = col("l_orderkey"),
        itemCol = col("p_brand"),
        minSupportCnt = 50L)),

    // Deterministic synchronous LPA (4 rounds, neighbor-majority, min
    // label on ties) over the part co-occurrence graph: splits the
    // connected graph into cohesive groups where components can't. The
    // oracle unrolls the identical 4 rounds. The label frame is
    // memoized like the edge tables: q_modularity scores the SAME
    // partition, so the 4 LPA rounds run once per catalog sweep, not
    // twice.
    "q_communities" -> ((s, dir) => partCommunities(s, dir)),

    // Quality score of the LPA partition: exact integer rational
    // Σ(4·m·e_c - d_c²) / 4m² — one portable closing division. The
    // oracle replays the identical rounds then the same integer
    // algebra.
    "q_modularity" -> ((s, dir) =>
      GraphOps.modularity(partCooccurrenceEdges(s, dir), "u", "v",
        partCommunities(s, dir))),

    // First-touch funnel signup -> view -> click -> purchase: ONE shuffle
    // (conditional min per user), then a global single-row reduction —
    // sequence analytics with no self-joins (a per-stage join chain would
    // shuffle the event table once per stage).
    "q_funnel" -> ((s, dir) => {
      val firsts = RefQueries.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("t1"),
          min(when(col("event_type") === "view", col("ts"))).as("t2"),
          min(when(col("event_type") === "click", col("ts"))).as("t3"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t4"))
      val s1 = col("t1").isNotNull
      val s2 = s1 && col("t2") >= col("t1")
      val s3 = s2 && col("t3") >= col("t2")
      val s4 = s3 && col("t4") >= col("t3")
      firsts.agg(
        sum(when(s1, 1L).otherwise(0L)).as("n_signup"),
        sum(when(s2, 1L).otherwise(0L)).as("n_view"),
        sum(when(s3, 1L).otherwise(0L)).as("n_click"),
        sum(when(s4, 1L).otherwise(0L)).as("n_purchase"))
    }),

    // Cohort retention: cohort = first active day per user; one row per
    // (cohort day, day offset 0..6) with distinct active users. The
    // (user, day) distinct is the only corpus-sized shuffle; the cohort
    // table is user-sized.
    "q_cohort_retention" -> ((s, dir) => {
      val days = RefQueries.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val firsts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      days.join(firsts, "user_id")
        .select(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
        .filter(col("day_offset") <= 6)
        .groupBy(col("cohort"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
    }),

    // EWMA drop/spike detection over the per-type daily volume series —
    // the feed-health monitor a pipeline runs over its own meters.
    // Integer fixed point (256-scaled, α = 1/4) via a keyed ordered fold
    // (flatMapSortedGroups): the recurrence is sequential per key but
    // the series is meter-sized (one row per key×day) — keys
    // parallelize, state is O(1). The oracle unrolls the identical
    // recurrence as a recursive CTE (the q_pagerank discipline).
    "q_anomaly_ewma" -> ((s, dir) => {
      val daily = RefQueries.events(s, dir)
        .groupBy(col("event_type").as("key"), to_date(col("ts")).as("ord"))
        .agg(count(lit(1)).as("x"))
      EventOps.ewmaAnomalies(daily)
        .select(col("key").as("event_type"),
          date_format(col("ord"), "yyyy-MM-dd").as("day"),
          col("x").as("n"), col("ewma"), col("anomaly"))
    }),

    // Seasonal-naive backtest with MASE on daily per-type revenue: the
    // forecast-accuracy readout production monitors report. Gap-aware
    // value-range lags (a missing day yields no forecast, never a
    // shifted season); exact fixed-point cents so the error sums are
    // merge-order-proof; MASE one closing division.
    "q_forecast_backtest" -> ((s, dir) => {
      val daily = RefQueries.events(s, dir)
        .groupBy(col("event_type").as("key"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("x"))
      EventOps.seasonalBacktest(daily, season = 7)
        .withColumnRenamed("key", "event_type")
    }),

    // CUSUM level-shift detection on daily per-type volumes — the
    // persistent-drift complement to q_anomaly_ewma's spike test: int64
    // fold per key over ONE keyed Exchange, oracle replays the identical
    // recurrence in a recursive CTE.
    "q_cusum_shift" -> ((s, dir) => {
      val daily = RefQueries.events(s, dir)
        .groupBy(col("event_type").as("key"), to_date(col("ts")).as("ord"))
        .agg(count(lit(1)).as("x"))
      EventOps.cusumShifts(daily, slack = 4L, threshold = 40L)
        .select(col("key").as("event_type"),
          date_format(col("ord"), "yyyy-MM-dd").as("day"),
          col("x").as("n"), col("s_hi"), col("s_lo"), col("alarm"))
    }),

    // Snapshot diff (dataset versioning): v2 = the corpus after a policy
    // change (drop docs under 20 tokens, truncate to 40). The full-outer
    // join carries only (id, sha256) — never the text — so diffing two
    // 100 TB snapshots moves 40 bytes per doc; the oracle compares the
    // texts directly, proving the hash comparison classifies identically.
    "q_dataset_diff" -> ((s, dir) => {
      val v1 = t(s, dir, "documents")
      val v2 = v1
        .filter(TextOps.tokenCount(col("text")) >= 20)
        .select(col("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 40), " ").as("text"))
      // presence flags key added/removed on doc_id existence, NOT on hash
      // NULLness — a NULL text must not masquerade as a missing row (the
      // oracle keys on doc_id presence; sha2(NULL) is NULL). Two NULL
      // texts compare NULL = NULL -> not-true -> 'changed' on BOTH
      // engines, so the hash path stays oracle-consistent.
      val h1 = v1.select(col("doc_id"), sha2(col("text"), 256).as("h1"),
        lit(true).as("in_v1"))
      val h2 = v2.select(col("doc_id"), sha2(col("text"), 256).as("h2"),
        lit(true).as("in_v2"))
      h1.join(h2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("in_v1").isNull, "added")
            .when(col("in_v2").isNull, "removed")
            .when(col("h1") === col("h2"), "unchanged")
            .otherwise("changed").as("status"))
    }),

    // Per-language median quality gate (CCNet-style percentile filter):
    // keep docs at or above their language's lower-median quality. The
    // median is RANK-based (k-th smallest, k = (n+1) div 2) — pure
    // selection, no interpolation arithmetic, so it is bit-portable
    // across engines where interpolated quantiles differ in last-ulp
    // rounding. One window shuffle by lang for the medians (lang-sized
    // result, broadcast back); the corpus itself is never re-shuffled.
    "q_quality_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.qualityScore(col("text")).as("quality"))
      val wr = Window.partitionBy(col("lang"))
        .orderBy(col("quality"), col("doc_id"))
      val wn = Window.partitionBy(col("lang"))
      val medians = docs
        .withColumn("rn", row_number().over(wr))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("lang"), col("quality").as("med"))
      docs.join(broadcast(medians), "lang")
        .filter(col("quality") >= col("med"))
        .select(col("doc_id"), col("lang"), col("quality"))
    }),

    // SCD2 dimension build (slowly-changing dimension, type 2): collapse
    // each user's event-type history into validity intervals — a row per
    // CHANGE, valid_from/valid_to half-open, NULL valid_to = current.
    // Both windows share the user_id partitioning and (ts, event_id)
    // order, so Spark plans ONE Exchange + one sort for the lag, and the
    // post-filter lead reuses the layout.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val changes = RefQueries.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes.select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(lead(col("ts"), 1).over(w), "yyyy-MM-dd HH:mm:ss")
          .as("valid_to"))
    }),

    // Range (interval) join: clicks inside the first 5 minutes of any hour
    // that saw an error. Bucketed equi-join on the hour id + residual
    // predicate — a raw range condition is a nested-loop join in Spark.
    "q_range_join" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val ranges = ev.filter(col("event_type") === "error")
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("r_start"))
        .distinct()
        .withColumn("r_end", col("r_start") + 300)
      val points = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          unix_timestamp(col("ts")).as("p_ts"))
      JoinOps.rangeJoin(points, ranges, "p_ts", "r_start", "r_end",
        bucketWidth = 3600)
        .groupBy(col("r_start"))
        .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
    }),

    // The SAME query as q_range_join written as the NAIVE inequality join
    // — no JoinOps.rangeJoin, no manual bucketing — executed with
    // plans/RangeJoinBucketRule active, which rewrites it to the bucketed
    // equi-join at the logical level. Gates the optimizer rule end to end:
    // the oracle is the plain predicate join, so a green row proves the
    // rewrite is result-identical. Runs on an isolated newSession() (own
    // SQLConf, shared context) so the width conf and rule never leak into
    // other catalog queries' plans.
    "q_range_join_sql" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.experimental.extraOptimizations = Seq(graft.plans.RangeJoinBucketRule)
      s2.conf.set(graft.plans.RangeJoinBucketRule.WidthKey, "3600")
      // session-scoped confs do not all survive newSession(): re-pin the
      // ones this query needs from the parent
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s2.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.sql.shuffle.partitions"))
      val ev = RefQueries.events(s2, dir)
      val ranges = ev.filter(col("event_type") === "error")
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("r_start"))
        .distinct()
        .withColumn("r_end", col("r_start") + 300)
      val points = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          unix_timestamp(col("ts")).as("p_ts"))
      points.join(ranges,
          col("p_ts") >= col("r_start") && col("p_ts") < col("r_end"))
        .groupBy(col("r_start"))
        .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
    }),

    // Interval-overlap join (interval × interval, vs q_range_join's
    // point-in-interval): same-customer orders whose 15-day service
    // windows collide. Both sides bucket-replicated, true-overlap
    // residual, and each pair emitted ONLY in the bucket of
    // max(starts) — exactly-once with zero dedup shuffle. The oracle is
    // the naive inequality self-join, so the gate proves the bucketed
    // plan loses and invents nothing.
    "q_interval_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_custkey").as("cust"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("s"))
      val a = o.select(col("cust"), col("o_orderkey").as("a_id"),
        col("s").as("a_start"), (col("s") + 15).as("a_end"))
      val b = o.select(col("cust"), col("o_orderkey").as("b_id"),
        col("s").as("b_start"), (col("s") + 15).as("b_end"))
      JoinOps.intervalJoin(a, b, "a_start", "a_end", "b_start", "b_end",
        bucketWidth = 15, keys = Seq("cust"))
        .filter(col("a_id") < col("b_id"))
        .select(col("cust"), col("a_id"), col("b_id"),
          (least(col("a_end"), col("b_end")) -
            greatest(col("a_start"), col("b_start"))).as("overlap_days"))
    }),

    // Last-touch attribution: each purchase credits the latest click/view
    // of the same user within the preceding 2 hours (inclusive), NULLs
    // when there is none — the marketing-analytics shape of the as-of
    // join (one user-keyed window pass, never a range cross product).
    "q_attribution" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts").as("touch_ts"),
          col("event_id").as("touch_id"), col("event_type").as("channel"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      JoinOps.asofJoin(purchases, touches,
        keys = Seq("user_id"), tsLeft = "ts", tsRight = "touch_ts",
        payloadCols = Seq("touch_id", "channel"),
        tolerance = Some("2 hours"))
        .select(col("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("touch_id"), col("channel"))
    }),

    // Removal-list anti join, Bloom-pruned: definite keeps stream from the
    // scan with zero shuffle; only sketch "maybes" take the exact anti
    // join. Bit-identical to a plain left_anti for any fpp.
    "q_bloom_anti" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val removals = docs.filter(col("n_chars") < 150)
        .select(col("doc_id").as("rm_id"))
      JoinOps.bloomAntiJoin(
        docs.select(col("doc_id"), col("source")), "doc_id",
        removals, "rm_id", expectedItems = 1 << 16)
    }),

    // Fuzzy entity matching (SymSpell deletion-neighborhood blocking +
    // exact levenshtein verify): candidates join on 8-byte variant
    // hashes, never all-pairs — the oracle IS the all-pairs predicate
    // join, so the gate proves blocking completeness, not just parity.
    "q_fuzzy_join" -> ((s, dir) =>
      JoinOps.fuzzySelfPairs(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name")),

    // Entity resolution end-to-end (EntityOps.goldenRecords): each
    // customer becomes 1-2 dirty "feed observations" (evens get a copy
    // with one deterministically-deleted character), the blocked matcher
    // + connected components re-discover which observations are the same
    // real-world entity, and survivorship merges each cluster into one
    // golden record (longest-name winner with lineage, max-completeness
    // acct). An 8-hex avalanche tag in the observation key keeps distinct
    // customers >1 edit apart (bare c_name values are digit-neighbors —
    // lev 1 — and would transitively chain the whole table into one
    // entity), so clusters stay entity-sized — the over-linking control
    // the Scaladoc prescribes.
    "q_entity_golden" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ck"),
        concat(col("c_name"), lit(" "),
          format_string("%08x",
            col("c_custkey").cast("long") * 2654435761L % 4294967296L))
          .as("nm"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val base = c.select((col("ck") * 2).as("rid"), col("nm").as("obs_name"),
        col("cents").as("acct_cents"), lit(0).as("is_dirty"))
      val p = (col("ck") % 10 + 10).cast("int")
      val dirty = c.filter(col("ck") % 2 === 0).select(
        (col("ck") * 2 + 1).as("rid"),
        concat(col("nm").substr(lit(1), p - 1),
          col("nm").substr(p + 1, length(col("nm")))).as("obs_name"),
        lit(0L).as("acct_cents"), lit(1).as("is_dirty"))
      graft.ops.EntityOps.goldenRecords(
        base.unionByName(dirty), "rid", "obs_name",
        Seq(count(lit(1)).as("n_members"),
          sum(col("is_dirty")).cast("long").as("n_dirty"),
          max(col("acct_cents")).as("acct_cents")))
    }),

    // ------------------------------------- sort / top-k / window (engine
    // completeness; the reference needs none of these, SURVEY §2.5)
    "q_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // Multi-level aggregation: ROLLUP with grouping ids.
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("gid"))),

    // Non-hierarchical GROUPING SETS through the SQL surface (rollup's
    // DataFrame twin is q_rollup): per-status and per-priority subtotals
    // in ONE pass — Spark expands to a single Expand + hash aggregate,
    // never two scans.
    "q_grouping_sets" -> ((s, dir) => {
      // isolated newSession(): the temp view must not leak into (or
      // clobber anything in) the caller's shared session catalog
      val s2 = s.newSession()
      s2.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.sql.shuffle.partitions"))
      t(s2, dir, "orders").createOrReplaceTempView("orders_gs")
      s2.sql("""
        SELECT o_orderstatus, o_orderpriority,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
            AS total_value,
          CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT)
            AS gid
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""")
    }),

    // Complex-type surface: array higher-order functions (transform /
    // filter / aggregate / zip_with / array_sort / slice / element_at)
    // with exact integer math so every engine agrees bit-for-bit. These
    // HOF lambdas run interpreted per element — fine for a breadth
    // demonstration; the engine's HOT text paths use codegen'd
    // expressions instead (TextOps + expr/*, see PERF.md).
    "q_complex_types" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val lens = transform(toks, t => length(t))
      val head5 = slice(lens, 1, 5)
      // ANSI mode makes element_at THROW on an out-of-range index — an
      // empty/whitespace-only text row would kill the query while the
      // DuckDB twin's toks[1] quietly yields NULL; guard to match
      def atOrNull(arr: Column, i: Int) =
        when(size(arr) > 0, element_at(arr, i))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(filter(toks, t => length(t) >= 5)).as("n_long"),
        aggregate(lens, lit(0L), (acc, x) => acc + x).as("total_tok_chars"),
        array_max(lens).as("max_tok_len"),
        atOrNull(toks, 1).as("first_tok"),
        atOrNull(toks, -1).as("last_tok"),
        atOrNull(array_sort(toks), 1).as("min_tok"),
        // comma-joined, not raw arrays: the driver's pandas comparator
        // cannot sort array-typed cells (gated queries emit scalars only)
        array_join(transform(head5, x => x.cast("string")), ",")
          .as("head_lens"),
        array_join(transform(
          zip_with(head5, reverse(head5), (a, b) => a + b),
          x => x.cast("string")), ",").as("sym_lens"))
    }),

    // Set operations over key sets.
    "q_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val buyers = t(s, dir, "orders").select(col("o_custkey").as("key")).distinct()
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"))
      val nonBuyers = c.select(col("c_custkey").as("key")).except(buyers)
      building.intersect(buyers).withColumn("src", lit("building_buyer"))
        .union(nonBuyers.withColumn("src", lit("never_ordered")))
    }),

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

    // Semi-structured: JSON property extraction + aggregation over the
    // extracted key (reference has no JSON; engine completeness).
    "q_events_json" -> ((s, dir) =>
      RefQueries.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(
          count(col("k")).as("n"),
          sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max"))),

    // Classic analytics shapes (pricing summary + join-heavy top-k),
    // money math in exact fixed point (cents x basis-point units) so sums
    // are reproducible under any merge order.
    "q_tpch_q1" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") < lit("1999-01-01"))
        .withColumn("price_c", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("disc_pc", round(col("l_discount") * 100).cast("long"))
        .withColumn("tax_pc", round(col("l_tax") * 100).cast("long"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          (sum(col("price_c")).cast("double") / 100).as("sum_base_price"),
          (sum(col("price_c") * (lit(100L) - col("disc_pc"))).cast("double") / 10000)
            .as("sum_disc_price"),
          (sum(col("price_c") * (lit(100L) - col("disc_pc")) * (lit(100L) + col("tax_pc")))
            .cast("double") / 1000000).as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (sum(col("price_c")).cast("double") / count(lit(1)) / 100).as("avg_price"),
          (sum(col("disc_pc")).cast("double") / count(lit(1)) / 100).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    "q_tpch_q3" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") >= lit("1996-01-01"))
        .withColumn("rev_u", revU)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .agg((sum(col("rev_u")).cast("double") / 10000).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: six-way join with the local-supplier condition
    // (c_nationkey == s_nationkey). Join planning for 100 TB: nation and
    // region are tiny dimensions — broadcast explicitly; supplier/customer
    // grow with SF, so they stay shuffle joins and AQE may still promote
    // them at small scale. Revenue in exact fixed point.
    "q_tpch_q5" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
      val li = t(s, dir, "lineitem")
        .withColumn("rev_u", revU)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("rev_u")).cast("double") / 10000).as("revenue"))
    }),

    // TPC-H Q18 shape (heavy groups): aggregate-then-semi-join. The HAVING
    // aggregate collapses lineitem to heavy orders BEFORE any join, so the
    // join's build side is the small filtered aggregate (broadcast-able at
    // any SF) — never orders x lineitem first. Quantities are integral
    // doubles: sums are exact and merge-order-proof.
    "q_tpch_q18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      t(s, dir, "orders")
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Skew-resistant join as a gated component: the salted plan spreads
    // each hot o_custkey over 8 salt buckets (customer side replicated
    // 8x) — the RESULT is identical to the plain equi-join, which is what
    // the oracle checks; the spread is visible in the shuffle key, not
    // the rows. Aggregated to per-customer order value in exact cents.
    "q_salted_join" -> ((s, dir) =>
      JoinOps.saltedJoin(
        t(s, dir, "orders")
          .withColumn("price_c", round(col("o_totalprice") * 100).cast("long")),
        t(s, dir, "customer").select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        keys = Seq("o_custkey"), saltBuckets = 8)
        .groupBy(col("o_custkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("price_c")).cast("double") / 100).as("total_value"))),

    // TPC-H Q4 shape (order-priority checking): date-filtered orders
    // EXISTS-semi-joined to a filtered fact table, then a tiny groupBy.
    // The semi join never duplicates orders (no distinct needed) and
    // carries only the join key from lineitem. (The synthetic lineitem
    // has no commit/receipt dates; the returned-lines predicate keeps
    // the identical plan shape.)
    "q_tpch_q4" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-07-01") &&
          col("o_orderdate") < lit("1995-10-01"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Pivot (long -> wide): per-source doc counts by language through the
    // native pivot operator — one partial-aggregated shuffle keyed by
    // source, values fixed at plan time (never an extra pass to discover
    // them, which is what `pivot(col)` without values costs).
    "q_pivot" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      t(s, dir, "documents")
        .groupBy(col("source")).pivot("lang", langs).count()
        .select(col("source") +:
          langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
    }),

    // Unpivot/melt (wide -> long), the inverse shape: per-flag fixed-point
    // measures fan out to (flag, metric, value) rows. Row-local Expand
    // after one partial-aggregated shuffle — melting N columns never
    // re-scans the fact table N times (the UNION-of-selects formulation
    // the oracle uses would, without a shared CTE).
    "q_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"),
          count(lit(1)).as("n_rows"))
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price_cents"), col("n_rows")),
        "metric", "value")
    }),

    // TPC-H Q14 shape (promo revenue): fact-to-dimension join on partkey
    // plus a conditional-sum ratio. part scales with SF so it is NOT
    // force-broadcast (AQE promotes it at small SF); the percentage is a
    // ratio of two exact fixed-point sums — IEEE division of integral
    // doubles, so the float result is engine-exact.
    "q_tpch_q14" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .withColumn("rev_u", revU)
      li.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("rev_u")).otherwise(0L)).cast("double") /
          sum(col("rev_u")).cast("double")).as("promo_revenue_pct"))
    }),

    // Window-function breadth beyond the running frame: lag/lead (value
    // carry, no arithmetic -> float-exact), rank with a deterministic
    // tie-break, ntile. ONE Exchange by o_custkey serves all four
    // functions (both windows share the partition key, so Spark plans a
    // single shuffle + two sorts).
    "q_window_funcs" -> ((s, dir) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
        lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
        rank().over(byPrice).as("price_rank"),
        ntile(4).over(byDate).as("date_quartile"))
    }),

    // TPC-H Q7 shape (volume shipping between two nations): the
    // cross-table nation-pair disjunction CANNOT be pushed below the join
    // by Catalyst (it references both sides), so the scalable plan
    // pre-filters BOTH dimension paths to the two nations via inner joins
    // against the broadcast filtered nation table — the big fact shuffles
    // carry only rows that can possibly match — and keeps just the
    // mixed-pair residual after the join.
    "q_tpch_q7" -> ((s, dir) => {
      val picked = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_7"))
      val n1 = picked.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = picked.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .withColumn("rev_u", revU)
      li.join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg((sum(col("rev_u")).cast("double") / 10000).as("revenue"))
    }),

    // TPC-H Q10 shape (returned-item reporting): quarter of orders joined
    // to returned lines, revenue per customer, top 20. Revenue is exact
    // fixed point so DESC ordering (and therefore the LIMIT cut) is
    // engine-identical; nation is the only force-broadcast dimension —
    // customer grows with SF and stays a shuffle join.
    "q_tpch_q10" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .withColumn("rev_u", revU)
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-10-01") &&
          col("o_orderdate") < lit("1996-01-01"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg((sum(col("rev_u")).cast("double") / 10000).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates): three
    // brand/size/quantity conjunct groups OR'd together. Catalyst factors
    // the part-only disjunction below the join (plan-audited in PERF.md),
    // so the part scan prunes before the shuffle even though the full
    // predicate needs both sides.
    "q_tpch_q19" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("rev_u", revU)
      val joined = li.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      val picked =
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      joined.filter(picked)
        .agg((sum(col("rev_u")).cast("double") / 10000).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting), adapted to the
    // synthetic schema (no receipt/commit dates): a supplier's returned
    // lines in finished multi-supplier orders where NO other supplier
    // returned — the same semi-join + anti-join pair on the fact table.
    // Scale plan: the semi/anti probes carry only (orderkey, suppkey);
    // the count aggregates by suppkey BEFORE the supplier name join, so
    // the name join's left side is at most |supplier| rows.
    "q_tpch_q21" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val fOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val l2 = li.select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"))
      l1.join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(l2, col("l_orderkey") === col("lo2") && col("l_suppkey") =!= col("ls2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("lo3") && col("l_suppkey") =!= col("ls3"),
          "left_anti")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("nw"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        // re-group by NAME: the oracle groups by s_name, and nothing in
        // the schema makes names unique — suppliers sharing a name must
        // merge (the input to this agg is at most |supplier| rows)
        .groupBy(col("s_name"))
        .agg(sum(col("nw")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // TPC-H Q22 shape (global sales opportunity): customers in a fixed
    // nation set with above-average positive balance and no RECENT orders
    // (every synthetic customer has some order, so the recency filter
    // keeps the anti-join non-vacuous). The scalar average is a 1-row
    // aggregate broadcast, the no-orders test is a left_anti carrying only
    // the 8-byte custkey (the date filter pushes to the orders scan), and
    // balances compare in exact cents so the cut is engine-identical.
    "q_tpch_q22" -> ((s, dir) => {
      val sel = t(s, dir, "customer")
        .filter(col("c_nationkey").isin(3, 7, 13, 17, 23))
        .withColumn("bal_c", round(col("c_acctbal") * 100).cast("long"))
      val avgBal = sel.filter(col("bal_c") > 0)
        .agg((sum(col("bal_c")).cast("double") / count(lit(1))).as("avg_c"))
      sel.join(broadcast(avgBal))
        .filter(col("bal_c").cast("double") > col("avg_c"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          (sum(col("bal_c")).cast("double") / 100).as("totacctbal"))
    }),

    // Time-based sliding aggregate (RANGE frame): 7-day trailing order
    // value per customer-day. RANGE BETWEEN 6 PRECEDING on the day
    // ordinal — a value-based frame, unlike q_window_running's ROWS
    // frame — so gaps in the calendar shrink the window instead of
    // reaching further back. ONE Exchange total: pre-partitioning by
    // customer alone satisfies BOTH the (custkey, day) group-by
    // clustering and the window's partitioning, where the naive plan
    // shuffles twice (QueryPlanSpec pins the single-Exchange shape; the
    // trade is shuffling raw order rows instead of per-day partials —
    // ~1 row per customer-day here, negligible combine loss).
    "q_moving_avg" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .repartition(col("o_custkey"))
        .groupBy(col("o_custkey"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01")).as("day_ord"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("day_c"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_ord"))
        .rangeBetween(-6, 0)
      daily.select(col("o_custkey"), col("day_ord"),
        (sum(col("day_c")).over(w).cast("double") / 100).as("trailing_7d"))
    }),

    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        // exact fixed-point running sum: merge-order-proof
        (sum(round(col("o_totalprice") * 100).cast("long")).over(w).cast("double") / 100)
          .as("running_total"))
    }),

    // TPC-H Q6 (forecasting revenue): the pure scan-filter-scalar-agg
    // shape — all three predicates push to the parquet scan, the agg is a
    // 2-column map-side partial + 1-row final. At 100 TB this query IS
    // its scan; cents x bps fixed point keeps the sum exact.
    "q_tpch_q6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
          col("l_quantity") < 24)
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
          round(col("l_discount") * 100).cast("long")).cast("double") / 10000)
          .as("revenue"))),

    // TPC-H Q8 (national market share): the widest join in the catalog —
    // lineitem x orders x customer x supplier x part x nation x region.
    // Dimension legs broadcast; the share ratio divides two exact
    // fixed-point sums per year.
    "q_tpch_q8" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("rev_u", revU)
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
      val asiaCust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
            .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("cn_key"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"))
      val suppNation = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      li.join(broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_2", col("rev_u")).otherwise(0L))
          .cast("double") /
          sum(col("rev_u")).cast("double")).as("mkt_share"))
    }),

    // TPC-H Q12 shape (shipping-delay audit; the synthetic schema has no
    // commit/receipt dates or shipmode, so "late" = shipped > 30 days
    // after ordering and the bucket is order priority): join + interval
    // date arithmetic in the predicate + two-bucket conditional agg per
    // year. The date filter cannot push below the join (it references
    // both sides) — it runs as the join residual.
    "q_tpch_q12" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))),

    // TPC-H Q13 (customer order-count distribution): left OUTER join so
    // zero-order customers count, then a second aggregation over the
    // first — the histogram-of-group-sizes shape. Both shuffles are
    // 8-byte keyed; the priority filter stands in for the comment filter
    // (no o_comment in the synthetic schema).
    "q_tpch_q13" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_custkey"), col("o_orderkey"))
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q15 (top supplier): revenue view + equality with its max.
    // The view is CACHED (it is supplier-sized — tiny at any SF) so the
    // aggregate feeds BOTH the max (1-row broadcast) and the probe from
    // one materialization; without it the two legs' subtly different
    // pushed filters defeat exchange reuse and lineitem scans twice
    // (verified in the static plan).
    "q_tpch_q15" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .withColumn("rev_u", revU)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("rev_u")).as("total_u"))
        .cache()
      val mx = rev.agg(max(col("total_u")).as("max_u"))
      rev.join(broadcast(mx), col("total_u") === col("max_u"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("total_u").cast("double") / 10000).as("total_revenue"))
    }),

    // TPC-H Q17 (small-quantity revenue): per-part average-quantity
    // threshold applied back to the same lines. The correlated scalar
    // subquery becomes ONE aggregate joined back (broadcast — part-sized);
    // the threshold test `5 * qty * cnt < sum` is integer-valued double
    // arithmetic on both engines, so no division enters the predicate.
    "q_tpch_q17" -> ((s, dir) => {
      // cached: the filtered leg feeds BOTH the per-part stats and the
      // probe — without it lineitem scans twice (same double-scan q15's
      // view cache fixes; the brand+size cut keeps the cache tiny)
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_brand") === "Brand#9" && col("p_size") === 5)
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .cache()
      val stats = li.groupBy(col("l_partkey").as("ag_key"))
        .agg(sum(col("l_quantity")).as("qty_sum"), count(lit(1)).as("qty_cnt"))
      li.join(broadcast(stats), col("l_partkey") === col("ag_key"))
        .filter(col("l_quantity") * 5 * col("qty_cnt") < col("qty_sum"))
        .agg((sum(round(col("l_extendedprice") * 100).cast("long"))
          .cast("double") / 700).as("avg_yearly"))
    }),

    // TPC-H Q2 shape (minimum-cost supplier in a region), adapted: the
    // synthetic schema has no partsupp table, so the part-supplier cost
    // relation is DERIVED from lineitem — the min observed unit price per
    // (part, supplier) in exact cents (IEEE double division is
    // engine-identical, and min is merge-order-proof). Scale plan: the
    // derivation is ONE map-side-combined aggregate over the fact table;
    // everything downstream is pair-sized. The per-part minimum joins
    // back on (part, cost) — argmin-by-join, no fact-sized Window — and
    // nation/region/part dimensions broadcast.
    "q_tpch_q2" -> ((s, dir) => {
      val ps = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(round(col("l_extendedprice") * 100 / col("l_quantity"))
          .cast("long")).as("cost_c"))
      // cached: the region-scoped relation feeds BOTH the per-part min
      // and the argmin probe — one fact scan, not two (q15 discipline);
      // it is pair-sized (distinct part-supplier pairs), far below fact
      val rps = ps
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .cache()
      val mn = rps.groupBy(col("l_partkey").as("mk"))
        .agg(min(col("cost_c")).as("min_c"))
      rps.join(mn, col("l_partkey") === col("mk") && col("cost_c") === col("min_c"))
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO" &&
            col("p_size").between(10, 20))),
          col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_brand"), (col("cost_c").cast("double") / 100).as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q9 shape (product profit by nation and year), adapted: cost
    // comes from the part's retail price (no partsupp supplycost). Profit
    // stays in ONE exact integer unit — revenue in cents x basis points,
    // cost scaled by 100 into the same 1e-4-dollar grid — so grouped sums
    // are merge-order-proof and the /10000 happens after the aggregate.
    // The name filter prunes the fact at its FIRST join (broadcast part
    // projection), so later joins carry only profitable-part lines.
    "q_tpch_q9" -> ((s, dir) => {
      val red = t(s, dir, "part").filter(col("p_name").like("red %"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("cost_c"))
      t(s, dir, "lineitem")
        .withColumn("rev_u", revU)
        .join(broadcast(red), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg((sum(col("rev_u") -
            col("cost_c") * 100 * round(col("l_quantity")).cast("long"))
          .cast("double") / 10000).as("sum_profit"))
    }),

    // TPC-H Q11 shape (important-stock identification), adapted: a
    // part's "value" is the summed extended price shipped by ONE
    // nation's suppliers (no partsupp availqty). The value table is
    // CACHED (part-sized) so it feeds both the scalar total (1-row
    // broadcast) and the threshold probe from one materialization — the
    // q15 view-cache discipline; the fraction test is exact integer
    // (value*1000 > total), no division in the predicate.
    "q_tpch_q11" -> ((s, dir) => {
      val natSupp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val value = t(s, dir, "lineitem")
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"),
          "left_semi")
        .groupBy(col("l_partkey").as("p_key"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("value_c"))
        .cache()
      val tot = value.agg(sum(col("value_c")).as("total_c"))
      value.join(broadcast(tot))
        .filter(col("value_c") * 1000 > col("total_c"))
        .select(col("p_key"), (col("value_c").cast("double") / 100).as("part_value"))
        .orderBy(col("value_c").desc, col("p_key"))
    }),

    // TPC-H Q16 shape (supplier-relationship count by part attribute),
    // adapted: the relation is the DISTINCT (part, supplier) pairs
    // observed in lineitem; "complaint" suppliers are the
    // negative-balance ones, removed by an anti-join carrying only the
    // 8-byte suppkey. The distinct pair table is pair-sized before the
    // part join, and the count-distinct re-shuffles only qualifying
    // pairs keyed by the 3-attribute group.
    "q_tpch_q16" -> ((s, dir) => {
      val pairs = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      pairs
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t(s, dir, "part").filter(col("p_brand") =!= "Brand#9" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 shape (excess-stock suppliers), adapted: a supplier
    // qualifies when their 1996 shipped quantity of some 'red' part
    // exceeds HALF that part's total across suppliers (no partsupp
    // availqty to compare against). The per-(part, supplier) aggregate is
    // CACHED (pair-sized after the name+year cut) and re-aggregated for
    // per-part totals — one fact scan feeds both sides of the >half
    // test; suppliers attach by semi-join so the supplier table is never
    // row-multiplied; quantities sum as exact integers.
    "q_tpch_q20" -> ((s, dir) => {
      val red = t(s, dir, "part").filter(col("p_name").like("red %"))
        .select(col("p_partkey"))
      val sq = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .join(broadcast(red), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("supp_qty"))
        .cache()
      val pq = sq.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("supp_qty")).as("part_qty"))
      val qualifying = sq.join(broadcast(pq), col("l_partkey") === col("pk"))
        .filter(col("supp_qty") * 2 > col("part_qty"))
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name")
            .isin("NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // Point-in-time (time-travel) enrichment against an SCD2 dimension —
    // the feature-store join that prevents training-serving leakage: each
    // purchase is labeled with the browsing state the user was in AT
    // purchase time (the validity interval containing ts), never a later
    // state. Because SCD2 segments tile each user's timeline, interval
    // containment IS the as-of join on segment starts — ONE user-keyed
    // shuffle via JoinOps.asofJoin, no interval replication. Ties: a
    // state change at exactly purchase time counts (right-before-left at
    // equal ts), and coincident changes resolve to the max (ts, state)
    // struct — both pinned by the oracle's rank ordering.
    "q_pit_join" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val states = ev
        .filter(col("event_type").isin("view", "click", "error"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("ts").as("state_ts"),
          col("event_type").as("state"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      JoinOps.asofJoin(purchases, states, Seq("user_id"), "ts", "state_ts",
        Seq("state"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          coalesce(col("state"), lit("none")).as("state_at_purchase"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("state_ts")))
            .as("state_age_secs"))
    }),

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

    // Linear multi-touch attribution: every touch in the 2h window
    // before a purchase splits the purchase value evenly (1/n credit) —
    // the complement of q_attribution's last-touch rule. The interval
    // rides the user equi-join as residual; the per-purchase count is a
    // window over MATCH-sized rows (bounded by touches-per-purchase);
    // credit divides exact cents, so the doubles are engine-identical.
    "q_attribution_multi" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_user"), col("ts").as("touch_ts"),
          col("event_id").as("touch_id"), col("event_type").as("channel"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
      val joined = purchases.join(touches,
        col("user_id") === col("t_user") &&
          col("touch_ts") <= col("ts") &&
          col("touch_ts") >= col("ts") - expr("INTERVAL 2 HOURS"))
      val w = Window.partitionBy(col("purchase_id"))
      joined
        .withColumn("n_touches", count(lit(1)).over(w))
        .select(col("purchase_id"), col("touch_id"), col("channel"),
          col("n_touches"),
          (col("cents").cast("double") / 100 / col("n_touches")).as("credit"))
    }),

    // Missing-value imputation by last-observation-carried-forward
    // (LOCF): a deterministic 30% of readings masked out, refilled from
    // the latest PRECEDING non-null — ONE user-keyed window with an
    // ignore-nulls last(), the canonical gap-fill of sensor/feature
    // pipelines. Gaps before the first observation stay NULL: no
    // look-ahead, the leakage discipline.
    "q_impute_locf" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("event_id"), col("ts"),
          when(pmod(col("event_id"), lit(10)) < 3,
            lit(null).cast("double")).otherwise(col("value")).as("masked"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ev_ts"),
          col("masked"),
          last(col("masked"), ignoreNulls = true).over(w).as("filled"),
          (col("masked").isNull).cast("int").as("was_masked"))
    }),

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

    // Gopher-style document-quality rules (Rae et al. 2021, Appendix A)
    // — the published pretraining filter bundle, evaluated in EXACT
    // integer arithmetic (every ratio threshold as a cross-product, no
    // float compare): word-count bounds; mean word length <= 4.5
    // (10*sum-of-token-lengths <= 45*words); symbol-to-char ratio <= 10%
    // (10*punct <= chars); at least one stopword. The word-count and
    // word-length cuts are calibrated so BOTH branches fire on the
    // synthetic corpus at every SF (the q_anomaly_ewma discipline); the
    // symbol rule is kept at the published threshold even though this
    // corpus has no punctuation. Row-local, zero shuffles — a 100 TB
    // quality pass is a pure map.
    "q_gopher_rules" -> ((s, dir) => {
      val (rWords, rLen, rSym, rStop) = gopherRules
      t(s, dir, "documents").select(col("doc_id"),
        rWords.as("r_words"), rLen.as("r_word_len"),
        rSym.as("r_symbol"), rStop.as("r_stopword"),
        (rWords * rLen * rSym * rStop).as("passes"))
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

    // CUBE completes the grouping-analytics family (rollup, grouping
    // sets, pivot/unpivot): all 4 aggregation levels of (returnflag,
    // linestatus) in ONE Expand pass over the fact — never one scan per
    // level.
    "q_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"))),

    // Incremental aggregation maintenance (materialized-view delta
    // merge): the base partials and the delta batch's partials merge
    // WITHOUT rescanning the base — counts and sums are monoids, so
    // maintenance is groupBy-sum over the union of partials (the same
    // merge Spark's partial/final aggregation does inside one query,
    // lifted across snapshots). The oracle recomputes from scratch over
    // the full table: hash equality IS the maintenance-correctness
    // proof.
    "q_incr_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def partials(df: DataFrame) = df
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val base = partials(o.filter(col("o_orderdate") < lit("2000-01-01")))
      val delta = partials(o.filter(col("o_orderdate") >= lit("2000-01-01")))
      base.unionByName(delta)
        .groupBy(col("o_custkey"))
        .agg(sum(col("n_orders")).as("n_orders"),
          (sum(col("cents")).cast("double") / 100).as("total_spend"))
    }),

    // Bounded-hop BFS over the customer<->supplier trade graph (shortest
    // hop counts from customer 1) — Pregel-style frontier expansion:
    // the edge list partitions by src ONCE and is cached; each round
    // moves only frontier-sized rows (join, distinct, anti-join against
    // visited), so round cost tracks the frontier, not the graph.
    // Nodes use the q_pagerank disjoint encoding (cust*2, supp*2+1).
    "q_shortest_hops" -> ((s, dir) => {
      val pairsDf = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * lit(2L)).as("cust"),
          (col("l_suppkey") * lit(2L) + lit(1L)).as("supp"))
        .distinct()
      val edges = pairsDf.select(col("cust").as("src"), col("supp").as("dst"))
        .union(pairsDf.select(col("supp").as("src"), col("cust").as("dst")))
      GraphOps.bfsHops(edges, "src", "dst", Seq(2L), maxHops = 3)
    }),

    // WEIGHTED shortest distances within 3 legs (Bellman-Ford in the
    // min-plus semiring — q_shortest_hops counts hops; this costs them):
    // synthetic deterministic edge weights ((src + dst) mod 7 + 1), so
    // cheaper multi-hop detours can genuinely beat direct edges and the
    // oracle replays every relaxation exactly.
    "q_shortest_paths" -> ((s, dir) => {
      val pairsDf = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * lit(2L)).as("cust"),
          (col("l_suppkey") * lit(2L) + lit(1L)).as("supp"))
        .distinct()
      val edges = pairsDf.select(col("cust").as("src"), col("supp").as("dst"))
        .union(pairsDf.select(col("supp").as("src"), col("cust").as("dst")))
        .withColumn("w", (col("src") + col("dst")) % 7 + 1)
      GraphOps.shortestPathsWeighted(
        edges, "src", "dst", "w", Seq(2L), rounds = 3)
    }),

    // Stream-stream interval join (conversion-path assembly): purchases
    // matched to the same user's clicks within the 2 hours before the
    // purchase. Registered in batch semantics; the SAME EventOps function
    // runs watermarked as a Structured Streaming stream-stream join whose
    // per-side state retention Spark derives from the time bound
    // (streamed==batch in EventOpsSpec). Batch scale shape: ONE
    // user-keyed shuffle with the interval as join residual.
    "q_stream_join" -> ((s, dir) => {
      val ev = RefQueries.events(s, dir)
      EventOps.clickPurchaseJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"))
    }),

    // Small-file compaction plan (lakehouse OPTIMIZE): bin-pack a file
    // listing into ~30 KB merge groups per source. The listing here is
    // DERIVED from the corpus (16 content-keyed shards per source with
    // their byte volumes) standing in for a lake's file index; the plan
    // itself is LakeOps.planCompaction — deterministic sorted cumulative
    // packing over a metadata-sized frame (ONE partition-keyed window;
    // partitions parallelize). writeSharded executes the planned bins.
    "q_compaction_plan" -> ((s, dir) => {
      val listing = t(s, dir, "documents")
        .groupBy(col("source"), pmod(col("doc_id"), lit(16)).as("shard"))
        .agg(sum(col("n_chars")).as("bytes"))
      LakeOps.planCompaction(listing, "source", "shard", "bytes",
          targetBytes = 30000)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"))
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

    // Vocabulary-coverage report: per-source out-of-vocabulary token rate
    // against a frozen lexicon (the tokenizer-drift health check run
    // before training). Token ops are row-local (whitespace tokens,
    // literal IN-list membership); ONE source-keyed aggregate; the rate
    // divides two exact longs so the double is engine-identical.
    "q_oov_rate" -> ((s, dir) => {
      val vocab = qualityLexicon.keys.toSeq.sorted
      val toks = TextOps.tokens(lower(col("text")))
      // oov = total - in-vocab hits, with the hit count a codegen'd
      // set-probe loop — the filter() HOF form runs interpreted per token
      val hits = graft.expr.TokenExprs.tokenSetHits(toks, vocab)
      t(s, dir, "documents")
        .select(col("source"), size(toks).as("nt"),
          (size(toks) - hits).as("no"))
        .groupBy(col("source"))
        .agg(sum(col("nt")).as("n_tokens"), sum(col("no")).as("n_oov"))
        .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
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

    // Adamic-Adar link scores over the customer->supplier bipartite
    // graph: top-20 supplier pairs by shared-customer evidence, hub
    // customers (deg > 64) excluded BEFORE adjacency collection — the
    // wedge-center degree cap that bounds both memory and the deg²
    // wedge fanout (and which the oracle applies identically). Inverse
    // log2 weights are exact integer divisions on Log2Fixed.
    "q_link_predict" -> ((s, dir) =>
      EstimatorOps.adamicAdarTopK(custSuppPairs(s, dir),
        "cust", "supp", maxCenterDegree = 64L, k = 20)),

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

    // Zipf exponent of the token-frequency head: top-128 tokens via a
    // distributed heap (never a vocabulary sort), log-log OLS in 2^-8
    // fixed point — composes zipfFit's heap + Log2Fixed + olsTrend.
    // slope_micro ≈ −10^6·s is the number a tokenizer designer reads.
    "q_zipf_fit" -> ((s, dir) =>
      ModelOps.zipfFit(t(s, dir, "documents"), col("text"), topRanks = 128)),

    // Good-Turing frequency-of-frequencies over word BIGRAMS (the
    // corpus's unigram vocab is closed — bigrams carry the open tail an
    // LM actually smooths): N_r for r = 1..10, adjusted counts
    // r* = (r+1)·N_{r+1}/N_r, and the unseen-mass estimate P₀ = N₁/N —
    // "how much vocabulary is still missing". Two bounded collapses
    // (vocab, then counts-of-counts); totals ride the looDeltas
    // whole-frame window, nothing corpus-sized moves twice.
    "q_good_turing" -> ((s, dir) => {
      val w = TextOps.tokens(lower(col("text")))
      val n1 = greatest(size(w) - 1, lit(0))
      val bigrams = zip_with(slice(w, lit(1), n1), slice(w, lit(2), n1),
        (a, b) => concat(a, lit(" "), b))
      EstimatorOps.goodTuring(
        t(s, dir, "documents").select(bigrams.as("bg")), col("bg"), maxR = 10)
    }),

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

    // PMI collocations (Church & Hanks 1990): the adjacent pairs that
    // co-occur far above chance — multiword units a tokenizer/phrase
    // miner promotes. Exact Log2Fixed algebra over the bigram count
    // frame; marginals and N never re-scan the corpus; k-row heap cut.
    "q_pmi_collocations" -> ((s, dir) =>
      TextOps.pmiCollocations(t(s, dir, "documents"), minCount = 5L, k = 50)),

    // Corpus entropy RATE: bigram conditional entropy H(Y|X) — how
    // predictable the next token is (boilerplate scores low). The
    // undivided fixed-point sum discipline of q_source_kl; one closing
    // division for the bits readout.
    "q_entropy_rate" -> ((s, dir) =>
      TextOps.bigramCondEntropy(t(s, dir, "documents"))),

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

    // Herfindahl concentration of the corpus by source — the "is this
    // dominated by a few sources" number (and 1/HHI = effective source
    // count) a mixture planner reads; pre-truncated micro shares keep
    // the sum order-free.
    "q_source_hhi" -> ((s, dir) =>
      ProfileOps.concentration(t(s, dir, "documents"), col("source")))
  )

  /** Shared daily series for the trend pair (`q_ols_trend`,
    * `q_theilsen`): per (event_type, day) mean value in cents —
    * `sum div count`, nonnegative toward-zero on both engines — with
    * x = days since the table's literal epoch (2024-01-01, TESTDATA's
    * fixed event window) so the regression moments' ×10^6 products stay
    * far inside int64 at any scale factor.
    */
  private def trendDaily(s: SparkSession, dir: String): DataFrame =
    RefQueries.events(s, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type").as("g"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("x"))
      .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
        .as("y"))

  // ------------------------------------------------------------ oracle SQL

  private val S = TextOps.Sql

  /** Shared daily-series CTE for the trend-pair oracles — mirrors
    * [[trendDaily]]: per (event_type, day) mean cents (`//` with
    * nonnegative operands = Spark `div`), x anchored to the literal
    * 2024-01-01 epoch.
    */
  private val trendDailySql: String =
    """d AS (
      |  SELECT event_type AS g,
      |    CAST(date_diff('day', DATE '2024-01-01', dt) AS BIGINT) AS x, y
      |  FROM (
      |    SELECT event_type, CAST(ts AS DATE) AS dt,
      |      CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*)
      |        AS BIGINT) AS y
      |    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      |    GROUP BY event_type, CAST(ts AS DATE)))""".stripMargin

  /** Unrolled integer-PageRank recurrence over the cust<->supp trade
    * graph — mirrors [[graft.ops.GraphOps.pageRank]]'s fixed-point
    * arithmetic step for step. DuckDB `//` and Spark `div` are both
    * truncating integer division for the nonnegative operands here, and
    * all sums are integer sums, so the two engines agree bit for bit; the
    * iteration count is a literal because SQL has no loop — each round is
    * its own CTE reading the previous one.
    */
  /** Unrolled HITS replay: per round an authority aggregate + 1-row max
    * normalize, then the hub half — mirrors [[GraphOps.hits]] exactly
    * (scale 2^20; `//` operands nonnegative, so either DuckDB division
    * semantics matches Java's toward-zero `div`).
    */
  private def hitsOracle(iters: Int): String = {
    val scale = 1L << 20
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS (SELECT e.dst AS node, CAST(sum(h.v) AS BIGINT) AS v
         |  FROM eraw e JOIN h${i - 1} h ON h.node = e.src GROUP BY e.dst),
         |a$i AS (SELECT node,
         |  CAST(v * $scale // (SELECT max(v) FROM ar$i) AS BIGINT) AS v
         |  FROM ar$i),
         |hr$i AS (SELECT e.src AS node, CAST(sum(a.v) AS BIGINT) AS v
         |  FROM eraw e JOIN a$i a ON a.node = e.dst GROUP BY e.src),
         |h$i AS (SELECT node,
         |  CAST(v * $scale // (SELECT max(v) FROM hr$i) AS BIGINT) AS v
         |  FROM hr$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT DISTINCT CAST(2 * o_custkey AS BIGINT) AS src,
       |    CAST(2 * l_suppkey + 1 AS BIGINT) AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |nodes AS (SELECT src AS node FROM eraw UNION SELECT dst FROM eraw),
       |h0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nodes),
       |$rounds
       |SELECT n.node, coalesce(h.v, 0) AS hub_fp, coalesce(a.v, 0) AS auth_fp
       |FROM nodes n
       |LEFT JOIN h$iters h ON h.node = n.node
       |LEFT JOIN a$iters a ON a.node = n.node""".stripMargin
  }

  private def pageRankOracle(iters: Int, dangling: Boolean = false): String = {
    // per round: optional dangling share d$i (sum of the previous ranks
    // over nodes with no out-edges, integer-divided by n), then the rank
    // recurrence — mirrors GraphOps.pageRank(redistributeDangling = ...)
    val rounds = (1 to iters).map { i =>
      val shareCte =
        if (dangling)
          s"""d$i AS (SELECT coalesce(sum(rank), 0) // (SELECT n FROM p) AS share
             |  FROM r${i - 1} WHERE node NOT IN (SELECT src FROM deg)),
             |""".stripMargin
        else ""
      val contrib =
        if (dangling) s"(coalesce(s.s, 0) + (SELECT share FROM d$i))"
        else "coalesce(s.s, 0)"
      s"""${shareCte}r$i AS (SELECT n.node,
         |  (SELECT base FROM p) + (85 * $contrib) // 100 AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(r.rank // d.outdeg) AS s
         |    FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r${i - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON n.node = s.dst)""".stripMargin
    }.mkString(",\n")
    // customers 2k, suppliers 2k+1: disjoint at any scale (an additive
    // offset merges nodes once keys outgrow it — and the shared encoding
    // would hide that from the hash compare)
    val eraw =
      """eraw AS (
        |  SELECT DISTINCT CAST(2 * o_custkey AS BIGINT) AS src,
        |    CAST(2 * l_suppkey + 1 AS BIGINT) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""".stripMargin
    val edges =
      if (dangling) "edges AS (SELECT src, dst FROM eraw)"
      else "edges AS (SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw)"
    s"""WITH $eraw,
       |$edges,
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |p AS (SELECT CAST(1000000000000 AS BIGINT) // count(*) AS init,
       |  (CAST(1000000000000 AS BIGINT) // count(*)) * 15 // 100 AS base,
       |  CAST(count(*) AS BIGINT) AS n
       |  FROM nodes),
       |r0 AS (SELECT node, (SELECT init FROM p) AS rank FROM nodes),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank_fp FROM r$iters""".stripMargin
  }

  /** Seeded (personalized) PageRank replay — the [[pageRankOracle]]
    * recurrence with teleport mass restricted to the seed set: init and
    * base are `scale/|seeds|`-derived on seeds and 0 elsewhere.
    */
  private def pprOracle(seeds: Seq[Long], iters: Int): String = {
    val seedList = seeds.distinct.sorted.mkString("(", ", ", ")")
    val nSeeds = seeds.distinct.length
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         |  (CASE WHEN n.node IN $seedList THEN (SELECT base FROM p)
         |        ELSE 0 END) + (85 * coalesce(s.s, 0)) // 100 AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(r.rank // d.outdeg) AS s
         |    FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r${i - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON n.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT DISTINCT CAST(2 * o_custkey AS BIGINT) AS src,
       |    CAST(2 * l_suppkey + 1 AS BIGINT) AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw),
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |p AS (SELECT CAST(1000000000000 AS BIGINT) // $nSeeds AS init,
       |  (CAST(1000000000000 AS BIGINT) // $nSeeds) * 15 // 100 AS base),
       |r0 AS (SELECT node,
       |  CASE WHEN node IN $seedList THEN (SELECT init FROM p)
       |       ELSE CAST(0 AS BIGINT) END AS rank FROM nodes),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank_fp FROM r$iters""".stripMargin
  }

  /** DuckDB twin of [[GraphOps.kCoreNodes]]: the same `rounds`
    * synchronous Matula-Beck peel rounds, unrolled (degree aggregate ->
    * keep-set -> edge restriction per round), over the identical
    * canonical simple-graph edge list. Any rounds at or past fixpoint
    * yields the true k-core in both engines, so the unroll depth only
    * has to MATCH the Spark side, which it does by construction.
    */
  private def kCoreSql(k: Int, rounds: Int): String = {
    // AS MATERIALIZED: each round's CTEs are referenced 2-3x; inlining
    // would re-expand the whole prefix per reference (3^rounds parquet
    // scans — observed as a "too many open files" blow-up at rounds=8).
    val peels = (0 until rounds).map { i =>
      s"""d${i + 1} AS MATERIALIZED (SELECT node, count(*) AS n FROM (
         |  SELECT u AS node FROM e$i UNION ALL SELECT v FROM e$i) GROUP BY node),
         |k${i + 1} AS MATERIALIZED (SELECT node FROM d${i + 1} WHERE n >= $k),
         |e${i + 1} AS MATERIALIZED (SELECT u, v FROM e$i
         |  WHERE u IN (SELECT node FROM k${i + 1})
         |    AND v IN (SELECT node FROM k${i + 1}))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT
       |    least(CAST(2 * o_custkey AS BIGINT), CAST(2 * l_suppkey + 1 AS BIGINT)) AS u,
       |    greatest(CAST(2 * o_custkey AS BIGINT), CAST(2 * l_suppkey + 1 AS BIGINT)) AS v
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |$peels
       |SELECT node, CAST(n AS BIGINT) AS degree FROM (
       |  SELECT node, count(*) AS n FROM (
       |    SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds)
       |  GROUP BY node) WHERE n >= $k""".stripMargin
  }

  /** DuckDB twin of [[GraphOps.labelPropagation]] on the part
    * co-occurrence graph: the same `rounds` synchronous label updates,
    * unrolled (neighbor-label count -> per-node argmax with the
    * identical ties-to-smallest-label rule), MATERIALIZED against
    * exponential CTE inlining as [[kCoreSql]].
    */
  private def lpaSql(
      rounds: Int,
      extraCtes: String = "",
      finalSelect: String = null): String = {
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT b.node, l.label, count(*) AS cnt
         |  FROM bid b JOIN l${i - 1} l ON b.nbr = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (
         |      PARTITION BY node ORDER BY cnt DESC, label) AS rn FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val fin = Option(finalSelect).getOrElse(
      s"SELECT node, CAST(label AS BIGINT) AS label FROM l$rounds")
    s"""WITH it AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS item
       |  FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.item AS u, b.item AS v
       |  FROM it a JOIN it b
       |    ON a.l_orderkey = b.l_orderkey AND a.item < b.item),
       |bid AS MATERIALIZED (
       |  SELECT u AS node, v AS nbr FROM e0
       |  UNION ALL SELECT v, u FROM e0),
       |l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM bid),
       |$steps$extraCtes
       |$fin""".stripMargin
  }

  /** [[lpaSql]] extended with the modularity closing algebra of
    * [[graft.ops.GraphOps.modularity]]: the same exact integer rational
    * Σ(4·m·e_c − d_c²) / 4m² over the round-`rounds` LPA labels.
    */
  private def modularitySql(rounds: Int): String = {
    val num = "sum(4 * (SELECT m FROM mm) * coalesce(ec, 0) - dc * dc)"
    lpaSql(rounds,
      extraCtes = s""",
        |lab AS MATERIALIZED (SELECT node, label FROM l$rounds),
        |mm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
        |le AS MATERIALIZED (
        |  SELECT la.label AS la, lb.label AS lb
        |  FROM e0 JOIN lab la ON e0.u = la.node
        |          JOIN lab lb ON e0.v = lb.node),
        |intra AS (SELECT la AS label, CAST(count(*) AS BIGINT) AS ec
        |          FROM le WHERE la = lb GROUP BY la),
        |degc AS (SELECT label, CAST(count(*) AS BIGINT) AS dc FROM (
        |  SELECT la AS label FROM le UNION ALL SELECT lb FROM le)
        |  GROUP BY label)""".stripMargin,
      finalSelect = s"""SELECT (SELECT m FROM mm) AS m_edges,
        |  CAST($num AS BIGINT) AS q_num,
        |  CAST($num AS DOUBLE) /
        |    (4.0 * (SELECT m FROM mm) * (SELECT m FROM mm)) AS q
        |FROM degc LEFT JOIN intra USING (label)""".stripMargin)
  }

  /** DuckDB twin of the literal-centroid IVF search (q_sim_ivf_literal):
    * per-vector dots against the K=4 inlined centroids, sequential-CASE
    * argmax for the corpus assignment (ties -> lowest cid, matching the
    * struct-max tie-break in [[IvfOps.assignmentCol]]), the query's
    * second probe as the argmax over the complement, then the standard
    * cosine + window top-k over candidates from the probed lists only.
    */
  /** An exact double literal for oracle SQL. A bare decimal like
    * `0.19102453383572876` is typed DECIMAL by DuckDB, and its
    * decimal-to-double conversion computes int/10^scale in double
    * arithmetic — DOUBLE-ROUNDED, up to 1 ulp off the correctly-rounded
    * parse of the same digits (found via q_pca_project, whose projected
    * scores expose the literal dot directly; the assignment-only users
    * are ulp-robust but ride the same fix). The string cast routes
    * through the correctly-rounded parser, so the shortest-repr
    * round-trip is bit-exact. */
  private def dlit(d: Double): String = s"CAST('$d' AS DOUBLE)"

  /** Literal-centroid dot product in DuckDB: the K centroid weight lists
    * are inlined, the fold order matches [[SimilarityOps.Sql.dot]].
    */
  private def dotLit(c: Array[Double]): String = {
    val ws = c.map(dlit).mkString("[", ", ", "]")
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(" +
      s"range(1, len(embedding) + 1), i -> CAST(embedding[i] AS DOUBLE) * ($ws)[i])), " +
      s"(acc, v) -> acc + v)"
  }

  /** Sequential-CASE argmax over `d<i>` columns; ties -> lowest cid,
    * matching the struct-max tie-break in [[IvfOps.assignmentCol]].
    */
  private def argmaxSql(ids: Seq[Int]): String =
    ids.init.zipWithIndex.map { case (c, idx) =>
      val rest = ids.drop(idx + 1)
      s"WHEN ${rest.map(r => s"d$c >= d$r").mkString(" AND ")} THEN $c"
    }.mkString("CASE ", " ", s" ELSE ${ids.last} END")

  private def ivfLiteralOracle: String = {
    val cents = IvfOps.literalCentroids(4, 64)
    def argmax(ids: Seq[Int]): String = argmaxSql(ids)
    val all = 0 until 4
    val p2 = all.map(p =>
      s"WHEN $p THEN ${argmax(all.filterNot(_ == p))}")
      .mkString("CASE p1 ", " ", " END")
    val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
    s"""WITH a AS (
       |  SELECT vec_id, embedding,
       |${cents.zipWithIndex.map { case (c, i) => s"    ${dotLit(c)} AS d$i" }
        .mkString(",\n")}
       |  FROM embeddings),
       |c AS (SELECT vec_id, embedding, ${argmax(all)} AS cid FROM a),
       |qp AS (SELECT vec_id, embedding, d0, d1, d2, d3,
       |         ${argmax(all)} AS p1
       |       FROM a WHERE vec_id < 10),
       |q AS (SELECT vec_id, embedding, p1, $p2 AS p2 FROM qp)
       |SELECT query_id, rank, corpus_id, cosine FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY $cos DESC, c.vec_id) AS rank
       |  FROM q JOIN c ON c.cid IN (q.p1, q.p2)
       |  WHERE $cos IS NOT NULL)
       |WHERE rank <= 10""".stripMargin
  }

  /** DuckDB twin of centroid-parameterized SemDeDup: inlined-centroid
    * argmax assignment, within-cluster cosine pairs at the threshold,
    * then min-label transitive closure via a recursive CTE
    * (reach(node, r) holds "r reaches node"; min(r) per node is the
    * component's min id — exactly [[graft.ops.GraphOps.componentsOf]]).
    * Serves both the frozen-literal variant (q_semdedup_literal) and —
    * since round 8 — the TRAINED variant (q_semdedup), whose centroids
    * arrive from the engine's deterministic training via
    * [[TrainedExport]] as exact shortest-repr double literals.
    */
  private def semDedupCentroidOracle(
      cents: Array[Array[Double]], threshold: Double): String = {
    val cos = SimilarityOps.Sql.cosine("x.embedding", "y.embedding")
    s"""WITH RECURSIVE a AS (
       |  SELECT vec_id, embedding,
       |${cents.zipWithIndex.map { case (c, i) => s"    ${dotLit(c)} AS d$i" }
        .mkString(",\n")}
       |  FROM embeddings),
       |c AS (SELECT vec_id, embedding, ${argmaxSql(cents.indices)} AS cid FROM a),
       |p AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM c x JOIN c y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |  WHERE $cos >= $threshold),
       |e AS (SELECT id_a AS u, id_b AS v FROM p
       |      UNION ALL SELECT id_b, id_a FROM p),
       |reach(node, r) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node)
       |SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS rep_id,
       |       CAST(CASE WHEN node = min(r) THEN 1 ELSE 0 END AS INT) AS keep
       |FROM reach GROUP BY node""".stripMargin
  }

  private def semDedupLiteralOracle: String =
    semDedupCentroidOracle(IvfOps.literalCentroids(4, 64), 0.35)

  /** DuckDB twin of the float IVF cosine search under ARBITRARY centroid
    * literals at any k/nprobe — the q_sim_ivf_literal machinery
    * generalized for the trained export: per-vector dots against every
    * inlined centroid, sequential-CASE argmax for the corpus assignment
    * (ties -> lowest cid, matching [[IvfOps.assignmentCol]]), the
    * query's nprobe probe set by (dot DESC, cid) row_number (matching
    * [[IvfOps.probesCol]]'s struct-sort tie-break), then the standard
    * candidates-only cosine + window top-k.
    */
  private def ivfCentroidOracle(
      cents: Array[Array[Double]], nprobe: Int, topK: Int): String = {
    val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
    val probeBranches = cents.indices.map(i =>
      s"      SELECT vec_id, embedding, $i AS pcid, d$i AS d FROM a " +
        s"WHERE vec_id < 10").mkString("\n      UNION ALL\n")
    s"""WITH a AS (
       |  SELECT vec_id, embedding,
       |${cents.zipWithIndex.map { case (c, i) => s"    ${dotLit(c)} AS d$i" }
        .mkString(",\n")}
       |  FROM embeddings),
       |c AS (SELECT vec_id, embedding, ${argmaxSql(cents.indices)} AS cid FROM a),
       |pr AS (
       |  SELECT vec_id, embedding, pcid FROM (
       |    SELECT vec_id, embedding, pcid, row_number()
       |      OVER (PARTITION BY vec_id ORDER BY d DESC, pcid) AS prn
       |    FROM (
       |$probeBranches))
       |  WHERE prn <= $nprobe)
       |SELECT query_id, rank, corpus_id, cosine FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, $cos AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY $cos DESC, c.vec_id) AS rank
       |  FROM pr q JOIN c ON c.cid = q.pcid
       |  WHERE $cos IS NOT NULL)
       |WHERE rank <= $topK""".stripMargin
  }

  /** DuckDB twin of the portable-family MinHash pipeline at any
    * geometry: the shingle hashes, the affine permutation constants, the
    * band keys, and the verify arithmetic are generated from the SAME
    * Scala constants as the Spark side
    * ([[graft.ops.DedupOps.portablePerm]]), so the whole
    * MinHash -> banded LSH -> exact-Jaccard-verify path hash-compares.
    * `verified = false` stops at the DISTINCT candidate pairs
    * (q_dedup_minhash); `true` adds the exact-Jaccard verification
    * (q_dedup_minhash_verified at 32/8/4, q_dedup_minhash_portable at
    * 16/4/4).
    */
  private def minhashPortableOracle(
      numHashes: Int, bands: Int, rowsPerBand: Int,
      verified: Boolean): String = {
    val p = DedupOps.PortableHashPrime
    val k = 3
    require(bands * rowsPerBand <= numHashes)
    val shingle = s"array_to_string(w[i:i+${k - 1}], ' ')"
    val hash = s"CAST(('0x' || substring(md5($shingle), 1, 15)) AS BIGINT) % $p"
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rowsPerBand).map { r =>
        val (a, bb) = DedupOps.portablePerm(b * rowsPerBand + r)
        s"CAST(list_min(list_transform(hs, x -> (x * $a + $bb) % $p)) AS VARCHAR)"
      }.mkString(" || ',' || ")
      s"  SELECT doc_id, $b AS band,\n    $key AS bkey FROM sh"
    }.mkString("\n  UNION ALL\n")
    val base =
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(w) - ${k - 2}), i -> $hash)) AS hs
         |  FROM toks WHERE len(w) >= $k),
         |bands AS (
         |$bandSelects),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)""".stripMargin
    if (!verified) s"$base\nSELECT id_a, id_b FROM cand"
    else
      s"""$base,
         |v AS (
         |  SELECT id_a, id_b,
         |    CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS intersection,
         |    CAST(len(a.hs) AS BIGINT) AS n_a, CAST(len(b.hs) AS BIGINT) AS n_b
         |  FROM cand JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b)
         |SELECT id_a, id_b, intersection, n_a, n_b,
         |  CAST(intersection AS DOUBLE)/(n_a + n_b - intersection) AS jaccard
         |FROM v
         |WHERE CAST(intersection AS DOUBLE)/(n_a + n_b - intersection) >= 0.2""".stripMargin
  }

  /** Shared CTE body for the PQ oracles: per-vector subspace distances
    * to every literal-codebook centroid (`d` — the same expressions serve
    * as the corpus argmin input AND the query lookup table), codes via a
    * lowest-on-ties CASE argmin, and the ADC distance as an
    * explicitly-left-associated sum of `m` CASE lookups — term for term
    * the Spark plan's fold order, so doubles match bit for bit.
    */
  private def pqCtes(m: Int, ksub: Int, dsub: Int): String = {
    val cb = PqOps.literalCodebook(m, ksub, dsub)
    def subDist(j: Int, c: Int): String =
      (0 until dsub).map { d =>
        val t = s"(CAST(embedding[${j * dsub + d + 1}] AS DOUBLE) - (${cb(j)(c)(d)}))"
        s"($t * $t)"
      }.mkString(" + ")
    val dcols = (for (j <- 0 until m; c <- 0 until ksub)
      yield s"    ${subDist(j, c)} AS d_${j}_$c").mkString(",\n")
    def argmin(j: Int): String = {
      val ids = 0 until ksub
      ids.init.zipWithIndex.map { case (c, idx) =>
        val rest = ids.drop(idx + 1)
        s"WHEN ${rest.map(r => s"d_${j}_$c <= d_${j}_$r").mkString(" AND ")} THEN $c"
      }.mkString("CASE ", " ", s" ELSE ${ids.last} END")
    }
    val codes = (0 until m).map(j => s"${argmin(j)} AS c_$j").mkString(", ")
    val luts = (for (j <- 0 until m; c <- 0 until ksub)
      yield s"d_${j}_$c AS qd_${j}_$c").mkString(", ")
    val adc = (0 until m).map { j =>
      val arms = (0 until ksub).map(c => s"WHEN $c THEN q.qd_${j}_$c").mkString(" ")
      s"(CASE e.c_$j $arms END)"
    }.mkString(" + ")
    s"""d AS (
       |  SELECT vec_id, embedding,
       |$dcols
       |  FROM embeddings),
       |enc AS (SELECT vec_id AS corpus_id, $codes FROM d),
       |q AS (SELECT vec_id AS query_id, $luts FROM d WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, e.corpus_id, $adc AS adc_dist
       |  FROM enc e CROSS JOIN q),
       |pqtop AS (
       |  SELECT query_id, rank, corpus_id, adc_dist FROM (
       |    SELECT query_id, corpus_id, adc_dist,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc_dist, corpus_id) AS rank
       |    FROM scored)
       |  WHERE rank <= 10)""".stripMargin
  }

  /** DuckDB twin of the PQ encode + ADC search (q_sim_pq_literal). */
  private def pqLiteralOracle: String =
    s"""WITH ${pqCtes(4, 8, 16)}
       |SELECT query_id, rank, corpus_id, adc_dist FROM pqtop""".stripMargin

  /** DuckDB twin of the ANN recall gate (q_ann_recall): re-derives the
    * exact cosine top-10 (the q_sim_topk statement) and the PQ-ADC
    * top-10 ([[pqCtes]]) and counts their per-query overlap.
    */
  private def annRecallOracle: String = {
    val cos = SimilarityOps.Sql.cosine("q.embedding", "c.embedding")
    s"""WITH ${pqCtes(4, 8, 16)},
       |exact AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cos DESC, c.vec_id) AS rank
       |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10
       |    WHERE $cos IS NOT NULL)
       |  WHERE rank <= 10),
       |h AS (
       |  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM exact e JOIN pqtop p
       |    ON e.query_id = p.query_id AND e.corpus_id = p.corpus_id
       |  GROUP BY e.query_id)
       |SELECT qq.vec_id AS query_id,
       |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10 AS recall_at_10
       |FROM embeddings qq LEFT JOIN h ON h.query_id = qq.vec_id
       |WHERE qq.vec_id < 10""".stripMargin
  }

  /** DuckDB twin of the full IVF-PQ index (q_sim_ivfpq_literal). The
    * coarse assignment and nprobe selection reuse the
    * [[ivfLiteralOracle]] argmax pattern; the residual PQ stages are
    * generated PER LIST BRANCH (`UNION ALL` over cid) with the
    * `centroid + codebook` constants FOLDED into each branch's distance
    * literals — bit-exact vs the Spark side's two-step subtraction
    * because every operand is a float-widened double minus small
    * integers (each subtraction exact in double).
    */
  private def ivfPqLiteralOracle: String = {
    val (m, ksub, dsub) = (4, 8, 16)
    val nLists = 4
    val cents = IvfOps.literalCentroids(nLists, 64)
    val cb = PqOps.literalCodebook(m, ksub, dsub)
    def distCols(prefix: String, listCent: Array[Double]): String =
      (for (s <- 0 until m; c <- 0 until ksub) yield {
        val sum = (0 until dsub).map { d =>
          val w = listCent(s * dsub + d) + cb(s)(c)(d)
          val t = s"(CAST(embedding[${s * dsub + d + 1}] AS DOUBLE) - ($w))"
          s"($t * $t)"
        }.mkString(" + ")
        s"      $sum AS ${prefix}_${s}_$c"
      }).mkString(",\n")
    def argmin(prefix: String, s: Int): String = {
      val ids = 0 until ksub
      ids.init.zipWithIndex.map { case (c, idx) =>
        val rest = ids.drop(idx + 1)
        s"WHEN ${rest.map(r => s"${prefix}_${s}_$c <= ${prefix}_${s}_$r").mkString(" AND ")} THEN $c"
      }.mkString("CASE ", " ", s" ELSE ${ids.last} END")
    }
    val all = 0 until nLists
    val p2 = all.map(p => s"WHEN $p THEN ${argmaxSql(all.filterNot(_ == p))}")
      .mkString("CASE p1 ", " ", " END")
    val encBranches = all.map { j =>
      val codes = (0 until m).map(s => s"${argmin("d", s)} AS c_$s").mkString(", ")
      s"""  SELECT corpus_id, cid, $codes FROM (
         |    SELECT vec_id AS corpus_id, cid,
         |${distCols("d", cents(j))}
         |    FROM c WHERE cid = $j)""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val lutBranches = all.map { j =>
      s"""  SELECT query_id, cid,
         |${distCols("qd", cents(j))}
         |  FROM probes WHERE cid = $j""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val adc = (0 until m).map { s =>
      val arms = (0 until ksub).map(c => s"WHEN $c THEN q.qd_${s}_$c").mkString(" ")
      s"(CASE e.c_$s $arms END)"
    }.mkString(" + ")
    s"""WITH a AS (
       |  SELECT vec_id, embedding,
       |${cents.zipWithIndex.map { case (c, i) => s"    ${dotLit(c)} AS d$i" }
          .mkString(",\n")}
       |  FROM embeddings),
       |c AS (SELECT vec_id, embedding, ${argmaxSql(all)} AS cid FROM a),
       |enc AS (
       |$encBranches),
       |qp AS (SELECT vec_id, embedding, d0, d1, d2, d3,
       |         ${argmaxSql(all)} AS p1
       |       FROM a WHERE vec_id < 10),
       |q2 AS (SELECT vec_id, embedding, p1, $p2 AS p2 FROM qp),
       |probes AS (
       |  SELECT vec_id AS query_id, embedding, p1 AS cid FROM q2
       |  UNION ALL
       |  SELECT vec_id AS query_id, embedding, p2 AS cid FROM q2),
       |qlut AS (
       |$lutBranches),
       |scored AS (
       |  SELECT q.query_id, e.corpus_id, $adc AS adc_dist
       |  FROM enc e JOIN qlut q ON e.cid = q.cid)
       |SELECT query_id, rank, corpus_id, adc_dist FROM (
       |  SELECT query_id, corpus_id, adc_dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, corpus_id) AS rank
       |  FROM scored)
       |WHERE rank <= 10""".stripMargin
  }

  /** DuckDB twin of the frozen-merge BPE apply (q_bpe_encode): a
    * recursive CTE replaying [[graft.expr.BpeCodec]]'s exact priority
    * loop per word — find the LOWEST-ranked merge pair present, replace
    * ALL its left-to-right non-overlapping occurrences, repeat until no
    * rule applies. Words are space-joined symbol strings; the
    * double-space trick (`replace(sym,' ','  ')` then matching
    * `' a  b '`) makes plain non-regex `replace` perform exactly the
    * non-overlapping full-symbol merge (adjacent occurrences don't share
    * boundary spaces). Merge literals come from the same Scala constant
    * as the Spark side ([[bpeFrozenMerges]]).
    */
  private def bpeEncodeOracle: String = {
    def esc(s: String) = s.replace("'", "''")
    val vals = bpeFrozenMerges.zipWithIndex
      .map { case ((a, b), i) => s"($i, '${esc(a)}', '${esc(b)}')" }
      .mkString(", ")
    val toks = S.tokens("lower(text)")
    val padded = "' ' || replace(e.sym, ' ', '  ') || ' '"
    s"""WITH RECURSIVE
       |m(rank, a, b) AS (VALUES $vals),
       |toks AS (
       |  SELECT doc_id, unnest($toks) AS w,
       |         generate_subscripts($toks, 1) AS ord
       |  FROM documents),
       |words AS (
       |  SELECT doc_id, ord,
       |    array_to_string(list_transform(range(1, len(w)+1), i -> w[i:i]), ' ') AS sym
       |  FROM toks),
       |enc(doc_id, ord, sym) AS (
       |  SELECT doc_id, ord, sym FROM words
       |  UNION ALL
       |  SELECT e.doc_id, e.ord,
       |    trim(replace(replace($padded,
       |      ' ' || mm.a || '  ' || mm.b || ' ',
       |      ' ' || mm.a || mm.b || ' '), '  ', ' '))
       |  FROM enc e JOIN m mm ON mm.rank = (
       |    SELECT min(m2.rank) FROM m m2
       |    WHERE strpos($padded, ' ' || m2.a || '  ' || m2.b || ' ') > 0)),
       |fin AS (
       |  SELECT doc_id, ord, sym FROM enc e
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM m m2
       |    WHERE strpos($padded, ' ' || m2.a || '  ' || m2.b || ' ') > 0)),
       |agg AS (
       |  SELECT doc_id,
       |    CAST(sum(len(string_split(sym, ' '))) AS INTEGER) AS n_pieces,
       |    string_agg(replace(sym, ' ', '|'), '|' ORDER BY ord) AS pieces_str
       |  FROM fin GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(a.n_pieces, 0) AS n_pieces,
       |       COALESCE(a.pieces_str, '') AS pieces_str
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** Shared CTE chain computing the portable 60-bit SimHash signature:
    * 60 per-bit sign sums over the md5-60bit token hash, then the bit
    * assembly — all generated with the same bit weights as the Spark
    * fold. Ends with `sg(doc_id, simhash)`.
    */
  private def simhashSigCtes: String = {
    val bits = 60
    val sums = (0 until bits).map(j =>
      s"    sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s_$j")
      .mkString(",\n")
    val sig = (0 until bits).map(j =>
      s"(CASE WHEN s_$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(${S.tokens("text")}) AS t FROM documents),
       |h AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h FROM tok),
       |s AS (
       |  SELECT doc_id,
       |$sums
       |  FROM h GROUP BY doc_id),
       |sg AS (SELECT doc_id, $sig AS simhash FROM s)""".stripMargin
  }

  /** DuckDB twin of the portable SimHash signature (q_dedup_simhash).
    */
  private def simhashPortableOracle: String =
    s"""WITH $simhashSigCtes
       |SELECT doc_id, simhash FROM sg""".stripMargin

  /** DuckDB twin of the SimHash near-dup pairing (q_simhash_neardup):
    * the NAIVE all-pairs Hamming predicate — the hash-compare against
    * Spark's pigeonhole chunk join is the completeness proof.
    */
  /** DuckDB twin of [[graft.ops.MultimodalOps.pHashStub]] over the
    * documents-derived media table: payload bytes are the raw text's
    * ASCII codes, so per-block byte sums replay as per-block char-code
    * sums; bit i = [64·s_i > Σs] is exact integer algebra on both
    * engines, and bit 63 enters as the int64 MIN literal (two's
    * complement — a positive 2^63 literal would overflow BIGINT).
    */
  /** The planted CDC changelog shared by `q_merge_upsert` and
    * `q_cdc_view`: snapshot = keys with `o_orderkey % 4 < 3`; changes =
    * an update (%4==0, seq 1), a tombstone (%4==1), an out-of-snapshot
    * insert (%4==3) and a second-version update (%8==0, seq 2) — unique
    * (key, seq) pairs, as real CDC logs guarantee, so the max_by fold
    * is tie-free on every engine.
    */
  private def cdcFeed(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("total_cents"))
    val snapshot = base.filter(col("o_orderkey") % 4 < 3)
    val changes =
      base.filter(col("o_orderkey") % 4 === 0).select(
          col("o_orderkey"), col("o_custkey"),
          lit("X").as("o_orderstatus"),
          (col("total_cents") + 100).as("total_cents"),
          lit(1L).as("seq"), lit("U").as("op"))
        .unionByName(base.filter(col("o_orderkey") % 4 === 1).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("total_cents"), lit(1L).as("seq"), lit("D").as("op")))
        .unionByName(base.filter(col("o_orderkey") % 4 === 3).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("total_cents"), lit(1L).as("seq"), lit("U").as("op")))
        .unionByName(base.filter(col("o_orderkey") % 8 === 0).select(
          col("o_orderkey"), col("o_custkey"),
          lit("Y").as("o_orderstatus"),
          (col("total_cents") + 200).as("total_cents"),
          lit(2L).as("seq"), lit("U").as("op")))
    (snapshot, changes)
  }

  /** DuckDB replay of the ENTIRE lattice k-means — quantization,
    * seeding, every Lloyd round (assignment argmin + truncating-division centroid
    * update, empty-cluster carryover) and the final assignment — with
    * the rounds unrolled as CTEs. All arithmetic is integer-exact on
    * both engines. The centroid update must divide toward zero like
    * Java's Long `/`, but DuckDB's integer `//` rounding direction is
    * ENVIRONMENT-DEPENDENT (1.0.0 truncates toward zero, newer builds
    * floor-divide — the two differ by one on negative sums). The oracle
    * therefore sign-splits the division so its operands are always
    * nonnegative: `CASE WHEN sv >= 0 THEN sv // n ELSE -((-sv) // n)
    * END` is toward-zero under EITHER `//` semantics (n = count > 0).
    * Ties break on (dist2, j) = the expression's strict-< first-minimum.
    */
  private def kmeansLatticeCtes(
      k: Int, iters: Int, dims: Int, trainWhere: String = "TRUE"): String = {
    def distExpr(qv: String, cv: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, $dims + 1), i -> ($qv[i] - $cv[i]) * ($qv[i] - $cv[i]))), " +
        s"(a, b) -> a + b)"
    // `src` = qt (the training subset) for the Lloyd rounds, q (the full
    // corpus) for the final assignment — with trainWhere = TRUE the two
    // coincide and this is the original whole-corpus training replay;
    // a narrower predicate replays FAISS add-after-train (train on the
    // base segment, assign everything).
    def assignCte(name: String, src: String, centsCte: String) =
      s"""$name AS (
         |  SELECT vec_id, qv, j, dist2, row_number()
         |    OVER (PARTITION BY vec_id ORDER BY dist2, j) AS rn
         |  FROM (SELECT $src.vec_id, $src.qv, c.j,
         |          ${distExpr(s"$src.qv", "c.qv")} AS dist2
         |        FROM $src CROSS JOIN $centsCte c))""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${assignCte(s"a$r", "qt", s"c${r - 1}")},
         |w$r AS (SELECT vec_id, qv, j FROM a$r WHERE rn = 1),
         |n$r AS (SELECT j, count(*) AS n FROM w$r GROUP BY j),
         |u$r AS (SELECT w$r.j, t.range AS d, w$r.qv[t.range + 1] AS v
         |        FROM w$r CROSS JOIN range(0, $dims) t),
         |s$r AS (SELECT j, d, sum(v) AS sv FROM u$r GROUP BY j, d),
         |c$r AS (
         |  SELECT s$r.j, list(CASE WHEN s$r.sv >= 0 THEN s$r.sv // n$r.n
         |                          ELSE -((-s$r.sv) // n$r.n) END
         |                     ORDER BY s$r.d) AS qv
         |  FROM s$r JOIN n$r ON s$r.j = n$r.j GROUP BY s$r.j
         |  UNION ALL
         |  SELECT j, qv FROM c${r - 1}
         |  WHERE j NOT IN (SELECT j FROM w$r))""".stripMargin
    }.mkString(",\n")
    s"""q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${LatticeKmeans.Scale} + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |qt AS (SELECT vec_id, qv FROM q WHERE $trainWhere),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, qv
       |  FROM (SELECT vec_id, qv FROM qt ORDER BY vec_id LIMIT $k)),
       |$rounds,
       |${assignCte("fin", "q", s"c$iters")}""".stripMargin
  }

  /** The final projection CASTs dist2 back to BIGINT explicitly. In
    * DuckDB 1.0.0 this is a no-op (the lambda fold is BIGINT), but
    * `fin.dist2` is the ONE value path the headline exposes that the
    * green lattice queries (`q_semdedup_lattice`, `q_sim_ivf_lattice` —
    * which embed these same CTEs and pass at the driver) never emit; if
    * a different driver DuckDB widens the fold's result type, pandas
    * renders HUGEINT as float64 and the comparator's stringify turns
    * `123` into `123.0` — a hash mismatch with identical values and
    * matching column names, which is precisely the two-round-old red
    * row's signature. The cast pins the wire type under EITHER
    * behavior without touching the values (dist2 < 2^50, exact in
    * every candidate type). */
  private def kmeansLatticeOracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT vec_id, CAST(j AS INTEGER) AS cluster,
       |       CAST(dist2 AS BIGINT) AS dist2
       |FROM fin WHERE rn = 1""".stripMargin

  /** Bisection oracles for the `q_kmeans_lattice_*` debug stages: the
    * SAME kmeansLatticeCtes SQL text as the headline oracle, selecting
    * one intermediate CTE each (quantized input / round-1 winners /
    * per-round centroid matrices), list cells exploded to scalars so the
    * driver comparator never sees an array. */
  private def kmeansLatticeQuantOracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT q.vec_id, CAST(t.range AS INTEGER) AS d,
       |       CAST(q.qv[t.range + 1] AS BIGINT) AS coord
       |FROM q CROSS JOIN range(0, $dims) t""".stripMargin

  private def kmeansLatticeAssign1Oracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT vec_id, CAST(j AS INTEGER) AS cluster FROM w1""".stripMargin

  private def kmeansLatticeCentsOracle(
      k: Int, iters: Int, dims: Int, round: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT CAST(c.j AS INTEGER) AS j, CAST(t.range AS INTEGER) AS d,
       |       CAST(c.qv[t.range + 1] AS BIGINT) AS coord
       |FROM c$round c CROSS JOIN range(0, $dims) t""".stripMargin

  /** Stage "fd": EVERY (vec, final centroid) squared distance — the raw
    * lambda-fold values of the headline's `fin` subquery, not just the
    * argmin winner. If the driver's red row is a genuine value
    * divergence in `distExpr` (rather than a result-type widening), this
    * stage is red and localizes it; if only the headline was red for
    * dtype reasons, this stage is green alongside the cast-pinned
    * headline. */
  private def kmeansLatticeFinDistOracle(
      k: Int, iters: Int, dims: Int): String =
    s"""WITH ${kmeansLatticeCtes(k, iters, dims)}
       |SELECT vec_id, CAST(j AS INTEGER) AS j,
       |       CAST(dist2 AS BIGINT) AS dist2
       |FROM fin""".stripMargin

  /** Engine side of the `_c{1,2}` stages: [[LatticeKmeans.trainRounds]]
    * run with the headline query's parameters, one snapshot exploded to
    * (j, d, coord) rows. The collect is k x dims-bounded (4 x 64). */
  private def latticeCentroidFrame(
      s: SparkSession, dir: String, round: Int): DataFrame = {
    val rounds =
      LatticeKmeans.trainRounds(t(s, dir, "embeddings"), k = 4, iters = 2)
    val rows = for {
      (c, j) <- rounds.lift(round).getOrElse(Array.empty).zipWithIndex.toSeq
      (v, d) <- c.zipWithIndex.toSeq
    } yield (j, d, v)
    import s.implicits._
    rows.toDF("j", "d", "coord")
  }

  /** Fully-oracled SemDeDup: the lattice training replay above, then
    * within-cluster pairs by the integer cosine test
    * (`dot >= 0 AND den^2*dot^2 >= num^2*|a|^2*|b|^2` on the
    * PairScale-quantized vectors — pure BIGINT algebra), then the
    * min-id transitive closure as a recursive CTE (the
    * q_semdedup_literal machinery).
    */
  private def semDedupLatticeOracle(
      k: Int, iters: Int, dims: Int, tauNum: Long, tauDen: Long): String = {
    def dotExpr(a: String, b: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, $dims + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    s"""WITH RECURSIVE ${kmeansLatticeCtes(k, iters, dims)},
       |qs AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${LatticeKmeans.PairScale} + 0.5) AS BIGINT)) AS qs
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |asg AS (
       |  SELECT fin.vec_id, fin.j AS cid, qs.qs,
       |    ${dotExpr("qs.qs", "qs.qs")} AS n2
       |  FROM fin JOIN qs ON fin.vec_id = qs.vec_id WHERE fin.rn = 1),
       |p AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM asg x JOIN asg y
       |    ON x.cid = y.cid AND x.vec_id < y.vec_id
       |  WHERE x.n2 > 0 AND y.n2 > 0
       |    AND ${dotExpr("x.qs", "y.qs")} >= 0
       |    AND ${tauDen * tauDen} * ${dotExpr("x.qs", "y.qs")} * ${dotExpr("x.qs", "y.qs")}
       |        >= ${tauNum * tauNum} * x.n2 * y.n2),
       |e AS (SELECT id_a AS u, id_b AS v FROM p
       |      UNION ALL SELECT id_b, id_a FROM p),
       |reach(node, r) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.node)
       |SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS rep_id,
       |       CAST(CASE WHEN node = min(r) THEN 1 ELSE 0 END AS INT) AS keep
       |FROM reach GROUP BY node""".stripMargin
  }

  /** Fully-oracled IVF/L2 search on the lattice: training replay, corpus
    * assignment (`fin`), per-query probe ranking, candidates-only join,
    * exact-integer dist2 top-k — all BIGINT.
    */
  private def ivfLatticeOracle(
      k: Int, iters: Int, dims: Int, nprobe: Int, topK: Int,
      trainWhere: String = "TRUE"): String = {
    def dotExpr(a: String, b: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, $dims + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    s"""WITH ${kmeansLatticeCtes(k, iters, dims, trainWhere)},
       |asg AS (
       |  SELECT vec_id AS corpus_id, qv, j AS cid,
       |    ${dotExpr("qv", "qv")} AS cn2
       |  FROM fin WHERE rn = 1),
       |qf AS (
       |  SELECT vec_id AS query_id, qv, ${dotExpr("qv", "qv")} AS qn2
       |  FROM q WHERE vec_id < 10),
       |pr AS (
       |  SELECT query_id, qv, qn2, j AS cid, row_number()
       |    OVER (PARTITION BY query_id ORDER BY d2, j) AS prn
       |  FROM (SELECT qf.query_id, qf.qv, qf.qn2, c.j,
       |          qf.qn2 + ${dotExpr("c.qv", "c.qv")}
       |            - 2 * ${dotExpr("qf.qv", "c.qv")} AS d2
       |        FROM qf CROSS JOIN c$iters c)),
       |sc AS (
       |  SELECT pr.query_id, a.corpus_id,
       |    pr.qn2 + a.cn2 - 2 * ${dotExpr("pr.qv", "a.qv")} AS dist2
       |  FROM pr JOIN asg a ON a.cid = pr.cid WHERE pr.prn <= $nprobe),
       |r AS (
       |  SELECT query_id, corpus_id, dist2, row_number()
       |    OVER (PARTITION BY query_id ORDER BY dist2, corpus_id) AS rnk
       |  FROM sc)
       |SELECT query_id, CAST(rnk AS INT) AS rank, corpus_id, dist2
       |FROM r WHERE rnk <= $topK""".stripMargin
  }

  /** DuckDB replay of the greedy farthest-point coreset: the rounds
    * unrolled, each one a min-over-chosen distance aggregate and a
    * (md DESC, vec_id) LIMIT 1 pick — exactly the Spark loop's
    * TakeOrdered per round.
    */
  private def coresetOracle(m: Int, dims: Int): String = {
    def distExpr(a: String, b: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, $dims + 1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), " +
        s"(x, y) -> x + y)"
    val rounds = (2 to m).map { r =>
      s"""md$r AS MATERIALIZED (
         |  SELECT q.vec_id, q.qv, min(${distExpr("q.qv", "c.qv")}) AS md
         |  FROM q CROSS JOIN ch${r - 1} c
         |  WHERE q.vec_id NOT IN (SELECT vec_id FROM ch${r - 1})
         |  GROUP BY q.vec_id, q.qv),
         |s$r AS (SELECT vec_id, md FROM md$r ORDER BY md DESC, vec_id LIMIT 1),
         |ch$r AS (SELECT vec_id, qv FROM ch${r - 1}
         |         UNION ALL
         |         SELECT q.vec_id, q.qv FROM q JOIN s$r ON q.vec_id = s$r.vec_id)""".stripMargin
    }.mkString(",\n")
    val out = (2 to m).map { r =>
      s"UNION ALL SELECT CAST($r AS INT), vec_id, md FROM s$r"
    }.mkString("\n")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * ${LatticeKmeans.Scale} + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |ch1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
       |$rounds
       |SELECT CAST(1 AS INT) AS sel_rank, vec_id, CAST(NULL AS BIGINT) AS min_dist2
       |FROM ch1
       |$out""".stripMargin
  }

  /** Shared sample-replay CTEs for the audio oracles: every PCM sample
    * of every clip regenerated in HUGEINT mod-2^64 SQL via the splitmix
    * rounds ([[RefQueries.mixSql]]), then re-centered to signed 16-bit
    * exactly as [[graft.ops.AudioOps.sampleAt]] does
    * (`(m % 65536) - 32768` == `(m & 0xffff) - 32768`).
    */
  /** Shared winnowing-selection CTEs (k=4, w=8 — MUST match the
    * registered queries' parameters): normalize to the formatting-free
    * space, code points, k-gram polynomial hashes, min per w-window
    * (slices clamp at the end exactly like the expression's final
    * windows), distinct selected values. `range()` ends are exclusive:
    * gram positions run 1 .. len(codes)-k+1 = range(1, len(codes)-2) at
    * k=4; window starts run 1 .. max(nGrams-w+1, 1) =
    * range(1, greatest(len(grams)-6, 2)) at w=8.
    */
  /** SQL replay of [[graft.ops.SelectionOps.log2Fixed]] over a 1-column
    * CTE `valsCte(v)`: msb from the binary string length (bin() has no
    * leading zeros), then the 20 mantissa-squaring rounds UNROLLED as
    * chained CTEs — pure int64 shifts/compares, bit-identical to the
    * driver loop. Emits `lg(v, lg)`. */
  private def log2FixedSql(valsCte: String): String = {
    val steps = (0 until graft.ops.SelectionOps.LogFracBits).map { i =>
      val bit = 1L << (graft.ops.SelectionOps.LogFracBits - 1 - i)
      s"""s${i + 1} AS (
         |  SELECT v, msb,
         |    CASE WHEN sq >= 2147483648 THEN sq >> 1 ELSE sq END AS m,
         |    frac + CASE WHEN sq >= 2147483648 THEN $bit ELSE 0 END AS frac
         |  FROM (SELECT v, msb, frac, (m * m) >> 30 AS sq FROM s$i))""".stripMargin
    }.mkString(",\n")
    s"""s0 AS (
       |  SELECT v, length(bin(v)) - 1 AS msb,
       |    CASE WHEN length(bin(v)) - 1 >= 30
       |         THEN v >> (length(bin(v)) - 1 - 30)
       |         ELSE v << (30 - (length(bin(v)) - 1)) END AS m,
       |    CAST(0 AS BIGINT) AS frac
       |  FROM $valsCte),
       |$steps,
       |lg AS (SELECT v, msb * 1048576 + frac AS lg
       |       FROM s${graft.ops.SelectionOps.LogFracBits})""".stripMargin
  }

  /** Full from-scratch DSIR replay: portable md5 token bucketing, the
    * smoothed target/raw counts, [[log2FixedSql]] over every needed
    * value, the per-bucket weight, and the per-doc fold. */
  private def dsirOracle(buckets: Int): String = {
    val p = DedupOps.PortableHashPrime
    val hash =
      s"(CAST(('0x' || substring(md5(tk), 1, 15)) AS BIGINT) % $p) % $buckets"
    s"""WITH toksl AS (
       |  SELECT doc_id, lang, ${S.tokens("lower(text)")} AS w FROM documents),
       |tok AS (
       |  SELECT doc_id, lang = 'en' AS is_t, unnest(w) AS tk FROM toksl),
       |bk AS (SELECT doc_id, is_t, CAST($hash AS BIGINT) AS b FROM tok),
       |bc AS (
       |  SELECT b, CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t,
       |    CAST(count(*) AS BIGINT) AS r
       |  FROM bk GROUP BY b),
       |tot AS (SELECT CAST(sum(t) AS BIGINT) AS nt,
       |               CAST(sum(r) AS BIGINT) AS nr FROM bc),
       |vals AS (
       |  SELECT DISTINCT v FROM (
       |    SELECT t + 1 AS v FROM bc
       |    UNION ALL SELECT r + 1 FROM bc
       |    UNION ALL SELECT nt + $buckets FROM tot
       |    UNION ALL SELECT nr + $buckets FROM tot)),
       |${log2FixedSql("vals")},
       |wb AS (
       |  SELECT bc.b, (lt.lg - lr.lg) + (lnr.lg - lnt.lg) AS w
       |  FROM bc CROSS JOIN tot
       |  JOIN lg lt ON lt.v = bc.t + 1
       |  JOIN lg lr ON lr.v = bc.r + 1
       |  JOIN lg lnt ON lnt.v = tot.nt + $buckets
       |  JOIN lg lnr ON lnr.v = tot.nr + $buckets),
       |ds AS (
       |  SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(wb.w) AS BIGINT) AS dsir_fixed
       |  FROM bk JOIN wb ON wb.b = bk.b GROUP BY bk.doc_id)
       |SELECT d.doc_id,
       |  coalesce(ds.n_tokens, 0) AS n_tokens,
       |  coalesce(ds.dsir_fixed, 0) AS dsir_fixed
       |FROM documents d LEFT JOIN ds USING (doc_id)""".stripMargin
  }

  /** Shared CTEs for the substring-span dedup oracles: k-token window
    * rolling hashes (the proven [[TextOps.Sql.fingerprint]] polynomial
    * over the space-joined window), corpus-wide window counts, and the
    * gaps-and-islands merge of duplicated-window positions into maximal
    * spans — the same algebra as [[graft.ops.DedupOps.duplicateSpans]].
    */
  private def dupSpanCtes(k: Int): String =
    s"""toksd AS (
       |  SELECT doc_id, ${S.tokens("lower(text)")} AS w FROM documents),
       |gw AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |    ${S.fingerprint(s"array_to_string(w[i:i+${k - 1}], ' ')")} AS h
       |  FROM toksd, LATERAL unnest(range(1, len(w) - ${k - 2})) r(i)
       |  WHERE len(w) >= $k),
       |dh AS (SELECT h FROM gw GROUP BY h HAVING count(*) >= 2),
       |hp AS (
       |  SELECT doc_id, pos,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM gw JOIN dh USING (h)),
       |isl AS (
       |  SELECT doc_id, pos,
       |    sum(CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM hp),
       |sp AS (
       |  SELECT doc_id, island,
       |    CAST(min(pos) AS BIGINT) AS span_start,
       |    CAST(max(pos) + $k AS BIGINT) AS span_end
       |  FROM isl GROUP BY doc_id, island)""".stripMargin

  private def winnowCtes: String =
    """n AS (
      |  SELECT doc_id,
      |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    list_transform(list_filter(string_split(s, ''), ch -> len(ch) > 0),
      |      ch -> CAST(ord(ch) AS BIGINT)) AS codes
      |  FROM n),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(range(1, len(codes) - 2),
      |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT), codes[i:i+3]),
      |             (a, x) -> (a * 31 + x) % 1000000007)) AS grams
      |  FROM c WHERE len(codes) >= 4),
      |sel AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(grams) - 6, 2)),
      |      j -> list_min(grams[j:j+7]))) AS fps
      |  FROM g)""".stripMargin

  /** Shared content-defined-chunking CTEs: payload bytes (= ASCII text
    * codes — `mediaFromDocuments` encodes the text), the 256-entry gear
    * table regenerated in HUGEINT splitmix SQL, the windowed rolling
    * hash at every full-window position (a 16-wide position self-join —
    * the oracle pays the quadratic window so the engine's O(n)
    * incremental update is independently checked), anchors, and chunk
    * rows with the house polynomial chunk hash.
    */
  private def cdcCtes: String = {
    val W = MultimodalOps.Cdc.Window
    s"""pay AS (
       |  SELECT doc_id, list_transform(
       |    list_filter(string_split(text, ''), ch -> len(ch) > 0),
       |    ch -> CAST(ord(ch) AS BIGINT)) AS bytes
       |  FROM documents WHERE text IS NOT NULL),
       |gear AS (SELECT b, (am % 32768)::BIGINT AS g FROM (
       |  SELECT t.range AS b,
       |    ${RefQueries.mixSql("a",
            s"t.range::HUGEINT * 2654435761 + ${MultimodalOps.Cdc.GearSalt}")}
       |  FROM range(0, 256) t)),
       |pos AS (SELECT doc_id, i, bytes[i + 1] AS byte
       |        FROM pay, LATERAL unnest(range(0, len(bytes))) r(i)),
       |hw AS (
       |  SELECT p.doc_id, p.i,
       |    CAST(sum(g.g * (1::BIGINT << (q.i - p.i + ${W - 1}))) AS BIGINT) AS h
       |  FROM pos p
       |  JOIN pos q ON q.doc_id = p.doc_id AND q.i BETWEEN p.i - ${W - 1} AND p.i
       |  JOIN gear g ON g.b = q.byte
       |  WHERE p.i >= ${W - 1}
       |  GROUP BY p.doc_id, p.i),
       |ends AS (SELECT DISTINCT doc_id, i FROM (
       |  SELECT doc_id, i FROM hw
       |  WHERE ((h // ${1 << MultimodalOps.Cdc.AnchorShift})
       |         % ${MultimodalOps.Cdc.AnchorMask + 1}) = 0
       |  UNION ALL
       |  SELECT doc_id, len(bytes) - 1 AS i FROM pay WHERE len(bytes) > 0)),
       |ch AS (
       |  SELECT doc_id, i AS e,
       |    coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), -1) + 1 AS s,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS idx
       |  FROM ends),
       |chk AS (
       |  SELECT ch.doc_id AS media_id, CAST(idx AS INT) AS chunk_idx,
       |    CAST(s AS INT) AS "start", CAST(e - s + 1 AS INT) AS len,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), p.bytes[s + 1:e + 1]),
       |      (a, x) -> (a * 31 + x) % 1000000007) AS chash
       |  FROM ch JOIN pay p ON p.doc_id = ch.doc_id)""".stripMargin
  }

  private def audioCtes: String =
    s"""d AS (SELECT doc_id, (doc_id % ${AudioOps.SeedGroups})::HUGEINT AS seed
       |      FROM documents),
       |px AS (SELECT doc_id, seed, t.range AS i
       |       FROM d CROSS JOIN range(0, ${AudioOps.NSamples}) t),
       |m AS (SELECT doc_id, i,
       |  ${RefQueries.mixSql("a", s"seed * ${AudioOps.SeedMult} + i")}
       |  FROM px),
       |x AS (SELECT doc_id, i, (am % 65536)::BIGINT - 32768 AS smp FROM m)""".stripMargin

  private def phashCtes: String = {
    val pow2 = (0 until 63).map(i => (1L << i).toString) :+
      Long.MinValue.toString
    s"""ph_c AS (
       |  SELECT doc_id AS media_id,
       |    list_transform(list_filter(string_split(text, ''),
       |      ch -> len(ch) > 0), ch -> CAST(ord(ch) AS BIGINT)) AS codes
       |  FROM documents),
       |ph_s AS (
       |  SELECT media_id, len(codes) // 64 AS w, codes FROM ph_c),
       |ph_b AS (
       |  SELECT media_id,
       |    list_transform(range(0, 64), i -> CASE WHEN w = 0
       |      THEN CAST(0 AS BIGINT)
       |      ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        codes[i*w+1 : i*w+w]), (a, x) -> a + x) END) AS ss
       |  FROM ph_s),
       |ph_t AS (
       |  SELECT media_id, ss,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), ss),
       |      (a, x) -> a + x) AS tot
       |  FROM ph_b),
       |ph AS (
       |  SELECT media_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(0, 64), i ->
       |        CASE WHEN 64 * ss[i+1] > tot
       |          THEN ([${pow2.mkString(", ")}])[i+1]
       |          ELSE CAST(0 AS BIGINT) END)),
       |      (a, x) -> a + x) AS phash
       |  FROM ph_t)""".stripMargin
  }

  private def simhashNearDupOracle: String =
    s"""WITH $simhashSigCtes
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5""".stripMargin

  /** The static catalog plus the dynamically-built trained-centroid
    * oracles (present once the float-training queries have run in this
    * JVM — always the case in the driver's Verify pass, which dumps
    * oracleSql AFTER executing every query). */
  def oracleSql: Map[String, String] =
    staticOracleSql ++
      TrainedExport.get("float_k8_i2").map { cents =>
        Map(
          "q_sim_ivf_topk" -> ivfCentroidOracle(cents, nprobe = 4, topK = 10),
          "q_semdedup" -> semDedupCentroidOracle(cents, threshold = 0.35))
      }.getOrElse(Map.empty[String, String]) ++
      TrainedExport.get("pca_m4").map { packed =>
        Map("q_pca_project" ->
          pcaProjectOracle(packed.dropRight(1), packed.last))
      }.getOrElse(Map.empty[String, String])

  /** DuckDB twin of the PCA projection under the exported literal model:
    * per-component sequential-fold dot minus the mean-offset literal —
    * the exact IEEE chain of [[graft.ops.PcaOps.project]]. */
  private def pcaProjectOracle(
      comps: Array[Array[Double]], offs: Array[Double]): String = {
    val cols = comps.zipWithIndex.map { case (c, j) =>
      s"  ${dotLit(c)} - ${dlit(offs(j))} AS pc${j + 1}"
    }.mkString(",\n")
    s"""SELECT vec_id,
       |$cols
       |FROM embeddings
       |WHERE embedding IS NOT NULL AND len(embedding) = 64""".stripMargin
  }

  /** CTE list of the soft-dedup weight replay (3-gram Jaccard pairs,
    * recursive min-label components, cluster sizes) — shared by the
    * `q_dedup_weights` and `q_ess_weights` oracles, mirroring
    * [[dedupWeightsFrame]].
    */
  private lazy val dedupWeightsCtes: String =
    s"""toks AS (
       |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
       |  FROM toks WHERE len(w) >= 3),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |good AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
       |  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.2),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM good
       |  UNION SELECT id_b, id_a FROM good),
       |reach(n, r) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n),
       |comp AS (SELECT n, min(r) AS component FROM reach GROUP BY n),
       |asg AS (
       |  SELECT d.doc_id,
       |    CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.n),
       |cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM asg GROUP BY component)""".stripMargin

  private lazy val dedupWeightsSelect: String =
    """SELECT asg.doc_id, asg.component, cs.cluster_size,
      |  1000000 // cs.cluster_size AS weight_micro
      |FROM asg JOIN cs USING (component)""".stripMargin

  private val staticOracleSql: Map[String, String] = Map(
    "q_sim_ivf_literal" -> ivfLiteralOracle,
    "q_semdedup_literal" -> semDedupLiteralOracle,
    "q_dedup_minhash" ->
      minhashPortableOracle(32, 8, 4, verified = false),
    "q_dedup_minhash_verified" ->
      minhashPortableOracle(32, 8, 4, verified = true),
    "q_dedup_minhash_portable" ->
      minhashPortableOracle(16, 4, 4, verified = true),
    "q_dedup_simhash" -> simhashPortableOracle,
    "q_simhash_neardup" -> simhashNearDupOracle,

    "q_media_phash" ->
      s"""WITH $phashCtes
         |SELECT media_id, phash FROM ph""".stripMargin,

    "q_media_neardup" ->
      s"""WITH $phashCtes
         |SELECT a.media_id AS id_a, b.media_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
         |FROM ph a JOIN ph b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3""".stripMargin,

    "q_cdc_chunks" ->
      s"""WITH $cdcCtes
         |SELECT media_id, chunk_idx, "start", len, chash FROM chk""".stripMargin,

    "q_cdc_dedup" ->
      s"""WITH $cdcCtes,
         |m AS (SELECT *, CASE media_id % 3 WHEN 0 THEN 'image'
         |        WHEN 1 THEN 'audio' ELSE 'video' END AS modality FROM chk),
         |u AS (SELECT modality, chash, CAST(count(*) AS BIGINT) AS refs,
         |        CAST(min(len) AS BIGINT) AS clen
         |      FROM m GROUP BY 1, 2)
         |SELECT modality,
         |  CAST(sum(refs) AS BIGINT) AS total_chunks,
         |  CAST(count(*) AS BIGINT) AS unique_chunks,
         |  CAST(sum(refs * clen) AS BIGINT) AS total_bytes,
         |  CAST(sum(clen) AS BIGINT) AS unique_bytes,
         |  CAST(sum(clen) AS DOUBLE) / CAST(sum(refs * clen) AS DOUBLE)
         |    AS dedup_ratio
         |FROM u GROUP BY modality""".stripMargin,

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
    "q_bpe_encode" -> bpeEncodeOracle,
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

    "q_lake_layout" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST((count(*) + 39) // 40 AS BIGINT) AS n_files
        |FROM documents GROUP BY source""".stripMargin,

    "q_lake_layout2" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST((count(*) + 24) // 25 AS BIGINT) AS n_files
        |FROM documents GROUP BY source, lang""".stripMargin,

    // Same cascade and audit in plain SQL; every residual must be 0.
    "q_erasure" ->
      """WITH doomed AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 10 = 3),
        |ca AS (SELECT * FROM customer
        |       WHERE c_custkey NOT IN (SELECT c_custkey FROM doomed)),
        |oa AS (SELECT * FROM orders
        |       WHERE o_custkey NOT IN (SELECT c_custkey FROM doomed)),
        |dord AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT c_custkey FROM doomed)),
        |la AS (SELECT * FROM lineitem
        |       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM dord))
        |SELECT 'customer' AS table_name,
        |  CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_before,
        |  CAST((SELECT count(*) FROM ca) AS BIGINT) AS n_after,
        |  CAST((SELECT count(*) FROM customer)
        |    - (SELECT count(*) FROM ca) AS BIGINT) AS n_erased,
        |  CAST((SELECT count(*) FROM ca
        |    WHERE c_custkey IN (SELECT c_custkey FROM doomed))
        |    AS BIGINT) AS n_residual
        |UNION ALL
        |SELECT 'orders',
        |  CAST((SELECT count(*) FROM orders) AS BIGINT),
        |  CAST((SELECT count(*) FROM oa) AS BIGINT),
        |  CAST((SELECT count(*) FROM orders)
        |    - (SELECT count(*) FROM oa) AS BIGINT),
        |  CAST((SELECT count(*) FROM oa
        |    WHERE o_custkey IN (SELECT c_custkey FROM doomed)) AS BIGINT)
        |UNION ALL
        |SELECT 'lineitem',
        |  CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        |  CAST((SELECT count(*) FROM la) AS BIGINT),
        |  CAST((SELECT count(*) FROM lineitem)
        |    - (SELECT count(*) FROM la) AS BIGINT),
        |  CAST((SELECT count(*) FROM la
        |    WHERE l_orderkey IN (SELECT o_orderkey FROM dord)) AS BIGINT)
        |""".stripMargin,

    // Re-joins the RAW parquet: a hash match proves the bucketed
    // round-trip lost and changed nothing.
    "q_bucket_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS DOUBLE) / 10000 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q_zone_map" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS zone,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS min_ship,
        |  strftime(max(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS max_ship,
        |  CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS max_cents,
        |  CASE WHEN max(CAST(l_shipdate AS DATE)) >= DATE '1996-02-01'
        |        AND min(CAST(l_shipdate AS DATE)) <= DATE '1996-04-30'
        |    THEN 1 ELSE 0 END AS touch_ship,
        |  CASE WHEN max(CAST(round(l_extendedprice * 100) AS BIGINT)) >= 9000000
        |        AND min(CAST(round(l_extendedprice * 100) AS BIGINT)) <= 9100000
        |    THEN 1 ELSE 0 END AS touch_cents
        |FROM lineitem GROUP BY 1""".stripMargin,

    // The Bloom pruning decisions replayed bit-for-bit: the same
    // splitmix64 chain in HUGEINT mod-2^64 SQL (RefQueries.mixSql), the
    // same (hash >>> 1) % mBits positions, the same all-k-bits pass rule.
    "q_bloom_index" ->
      s"""WITH o AS (
         |  SELECT o_orderkey AS key,
         |    year(CAST(o_orderdate AS DATE)) * 12
         |      + month(CAST(o_orderdate AS DATE)) AS part
         |  FROM orders),
         |js(j) AS (VALUES (0), (1), (2)),
         |kb AS (
         |  SELECT part, key, j,
         |  ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761 + j")}
         |  FROM o CROSS JOIN js),
         |bits AS (SELECT DISTINCT part, (am // 2) % 65536 AS pos FROM kb),
         |pr AS (SELECT t.range AS probe FROM range(1, 201) t
         |       UNION ALL
         |       SELECT t.range
         |       FROM range(1000000000001, 1000000000201) t),
         |pb AS (
         |  SELECT probe, j,
         |  ${RefQueries.mixSql("b", "probe::HUGEINT * 2654435761 + j")}
         |  FROM pr CROSS JOIN js),
         |pbits AS (SELECT probe, j, (bm // 2) % 65536 AS pos FROM pb),
         |cand AS (
         |  SELECT p.probe, b.part
         |  FROM pbits p JOIN bits b ON b.pos = p.pos
         |  GROUP BY p.probe, b.part
         |  HAVING count(DISTINCT p.j) = 3),
         |truth AS (
         |  SELECT key, part, CAST(count(*) AS BIGINT) AS nr
         |  FROM o GROUP BY 1, 2),
         |hits AS (
         |  SELECT c.probe,
         |    CAST(count(*) AS BIGINT) AS n_true_parts,
         |    CAST(sum(t.nr) AS BIGINT) AS n_rows
         |  FROM cand c JOIN truth t ON t.part = c.part AND t.key = c.probe
         |  GROUP BY 1),
         |cc AS (
         |  SELECT probe, CAST(count(*) AS BIGINT) AS n_candidate_parts
         |  FROM cand GROUP BY 1),
         |np AS (
         |  SELECT CAST(count(DISTINCT part) AS BIGINT) AS n_parts_total
         |  FROM o)
         |SELECT pr.probe AS probe_key,
         |  coalesce(cc.n_candidate_parts, 0) AS n_candidate_parts,
         |  coalesce(hits.n_true_parts, 0) AS n_true_parts,
         |  coalesce(hits.n_rows, 0) AS n_rows,
         |  np.n_parts_total
         |FROM pr LEFT JOIN cc ON cc.probe = pr.probe
         |LEFT JOIN hits ON hits.probe = pr.probe
         |CROSS JOIN np""".stripMargin,

    // From-scratch Bloom build over the FULL table (same HUGEINT
    // splitmix replay as q_bloom_index), emitting every (probe, part)
    // pruning decision: the OR-monoid guarantees the engine's
    // base-build + delta-merge index equals this, and the hash compare
    // enforces it bit for bit.
    "q_index_refresh_bloom" ->
      s"""WITH o AS (
         |  SELECT o_orderkey AS key,
         |    year(CAST(o_orderdate AS DATE)) * 12
         |      + month(CAST(o_orderdate AS DATE)) AS part
         |  FROM orders),
         |js(j) AS (VALUES (0), (1), (2)),
         |kb AS (
         |  SELECT part, key, j,
         |  ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761 + j")}
         |  FROM o CROSS JOIN js),
         |bits AS (SELECT DISTINCT part, (am // 2) % 65536 AS pos FROM kb),
         |pr AS (SELECT t.range AS probe FROM range(1, 201) t
         |       UNION ALL
         |       SELECT t.range
         |       FROM range(1000000000001, 1000000000201) t),
         |pb AS (
         |  SELECT probe, j,
         |  ${RefQueries.mixSql("b", "probe::HUGEINT * 2654435761 + j")}
         |  FROM pr CROSS JOIN js),
         |pbits AS (SELECT probe, j, (bm // 2) % 65536 AS pos FROM pb)
         |SELECT p.probe, CAST(b.part AS BIGINT) AS part
         |FROM pbits p JOIN bits b ON b.pos = p.pos
         |GROUP BY p.probe, b.part
         |HAVING count(DISTINCT p.j) = 3""".stripMargin,

    // Same portable rolling fingerprint; DuckDB's bit_xor is the same
    // order-free 64-bit fold.
    "q_partition_hash" ->
      s"""SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
         |  bit_xor(${S.fingerprint("text")}) AS fp_xor
         |FROM documents GROUP BY 1, 2""".stripMargin,

    // Every per-shard splitmix score regenerated in HUGEINT mod-2^64 SQL
    // (`m // 2` == the Spark side's sign-clearing >>> 1); argmax via
    // row_number (score DESC, s ASC) = the expression's first-maximum.
    "q_rendezvous_shard" ->
      s"""WITH d AS (SELECT doc_id FROM documents),
         |h AS (SELECT doc_id, s, am // 2 AS score
         |      FROM (SELECT d.doc_id, t.range AS s,
         |        ${RefQueries.mixSql("a",
              s"doc_id::HUGEINT * 2654435761 + (${LakeOps.RendezvousSaltBase} + t.range)")}
         |        FROM d CROSS JOIN range(0, 9) t)),
         |a8 AS (SELECT doc_id, s AS shard8 FROM (
         |  SELECT doc_id, s, row_number()
         |    OVER (PARTITION BY doc_id ORDER BY score DESC, s) AS rn
         |  FROM h WHERE s < 8) WHERE rn = 1),
         |a9 AS (SELECT doc_id, s AS shard9 FROM (
         |  SELECT doc_id, s, row_number()
         |    OVER (PARTITION BY doc_id ORDER BY score DESC, s) AS rn
         |  FROM h) WHERE rn = 1)
         |SELECT d.doc_id, CAST(shard8 AS INT) AS shard8,
         |  CAST(shard9 AS INT) AS shard9,
         |  CAST(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END AS INT) AS moved
         |FROM d JOIN a8 USING (doc_id) JOIN a9 USING (doc_id)""".stripMargin,

    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        |  FROM orders),
        |snap AS (
        |  SELECT *, CAST(-1 AS BIGINT) AS seq, 'U' AS op
        |  FROM base WHERE o_orderkey % 4 < 3),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
        |    total_cents + 100 AS total_cents, CAST(1 AS BIGINT) AS seq,
        |    'U' AS op
        |  FROM base WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, total_cents, 1, 'D'
        |  FROM base WHERE o_orderkey % 4 = 1
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, total_cents, 1, 'U'
        |  FROM base WHERE o_orderkey % 4 = 3
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'Y', total_cents + 200, 2, 'U'
        |  FROM base WHERE o_orderkey % 8 = 0),
        |w AS (
        |  SELECT *, row_number()
        |    OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM (SELECT * FROM snap UNION ALL SELECT * FROM chg))
        |SELECT o_orderkey, o_custkey, o_orderstatus, total_cents
        |FROM w WHERE rn = 1 AND op <> 'D'""".stripMargin,

    // Same changelog, same winner-per-key semantics — the bootstrap
    // snapshot enters as seq -1 'U' rows (below every change seq, as
    // Long.MinValue is on the Spark side).
    "q_cdc_view" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        |  FROM orders),
        |snap AS (
        |  SELECT *, CAST(-1 AS BIGINT) AS seq, 'U' AS op
        |  FROM base WHERE o_orderkey % 4 < 3),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
        |    total_cents + 100 AS total_cents, CAST(1 AS BIGINT) AS seq,
        |    'U' AS op
        |  FROM base WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, total_cents, 1, 'D'
        |  FROM base WHERE o_orderkey % 4 = 1
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, total_cents, 1, 'U'
        |  FROM base WHERE o_orderkey % 4 = 3
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'Y', total_cents + 200, 2, 'U'
        |  FROM base WHERE o_orderkey % 8 = 0),
        |w AS (
        |  SELECT *, row_number()
        |    OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM (SELECT * FROM snap UNION ALL SELECT * FROM chg))
        |SELECT o_orderkey, o_custkey, o_orderstatus, total_cents
        |FROM w WHERE rn = 1 AND op <> 'D'""".stripMargin,

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
    "q_text_stats" ->
      s"""SELECT doc_id,
         | CAST(${S.tokenCount("text")} AS INTEGER) AS n_tokens,
         | CAST(length(text) AS INTEGER) AS n_chars_actual,
         | CAST(${S.punctCount("text")} AS INTEGER) AS n_punct,
         | ${S.tokenEstimate("text")} AS n_subword_est,
         | ${S.qualityScore("text")} AS quality
         |FROM documents""".stripMargin,

    "q_text_langid" ->
      s"SELECT doc_id, ${S.langId("text")} AS lang_pred FROM documents",

    // Same subword estimate, same exact sums, one closing division.
    "q_fertility" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
         |  CAST(sum(${S.tokenEstimate("text")}) AS BIGINT) AS n_subwords,
         |  CASE WHEN sum(${S.tokenEstimate("text")}) > 0
         |    THEN CAST(sum(length(text)) AS DOUBLE)
         |      / CAST(sum(${S.tokenEstimate("text")}) AS BIGINT)
         |  END AS chars_per_subword
         |FROM documents GROUP BY lang""".stripMargin,

    // Same heuristic, same cell counts, same one-division rate.
    "q_lang_confusion" ->
      s"""WITH p AS (
         |  SELECT lang, ${S.langId("text")} AS lang_pred FROM documents),
         |c AS (
         |  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2)
         |SELECT lang, lang_pred, n,
         |  CAST(n AS DOUBLE)
         |    / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE) AS rate
         |FROM c""".stripMargin,

    // Same fingerprint, exact distinct on both engines.
    "q_dup_rate" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT ${S.fingerprint("text")}) AS BIGINT)
         |    AS n_unique,
         |  1.0 - CAST(count(DISTINCT ${S.fingerprint("text")}) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS dup_rate
         |FROM documents GROUP BY source""".stripMargin,

    // String shingles stand in for the hashed index (the q_dedup_ngram
    // convention); length(bin(df)) - 1 is the same integer bucket.
    "q_shingle_df_hist" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |d AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY s)
         |SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_bucket,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(df) AS BIGINT) AS n_postings,
         |  CAST(sum(df * df) AS BIGINT) AS candidate_volume
         |FROM d GROUP BY 1""".stripMargin,

    "q_text_fingerprint" ->
      s"SELECT doc_id, ${S.fingerprint("text")} AS fp FROM documents",

    // DuckDB's NATIVE nfc_normalize vs the JVM's java.text.Normalizer —
    // both pinned by the Unicode conformance suite, so the composed
    // strings hash-compare byte for byte. chr(768)/chr(776) are the same
    // U+0300/U+0308 combining marks the Spark side plants.
    "q_text_nfc" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(text,
        |      'a', 'a' || chr(768), 'g'), 'o', 'o' || chr(776), 'g') AS r
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(r) AS text_nfc,
        |  CAST(length(r) AS BIGINT) AS n_raw,
        |  CAST(length(nfc_normalize(r)) AS BIGINT) AS n_nfc
        |FROM raw""".stripMargin,

    // Independent utf8proc implementation (strip_accents) vs the
    // engine's NFD + Mn-strip — hash-compared on the planted domain.
    "q_text_fold" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(text,
        |      'a', 'a' || chr(768), 'g'), 'e', chr(233), 'g') AS r
        |  FROM documents)
        |SELECT doc_id, strip_accents(r) AS text_folded,
        |  CAST(length(r) AS BIGINT) AS n_raw,
        |  CAST(length(strip_accents(r)) AS BIGINT) AS n_folded
        |FROM raw""".stripMargin,

    // Same normalized space-delimited contains per literal entity.
    "q_dict_tag" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    ' ' || trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) || ' ' AS t
        |  FROM documents)
        |SELECT doc_id, entity
        |FROM n, (VALUES ('spark'), ('stream'), ('hash value'),
        |         ('table part')) AS e(entity)
        |WHERE contains(t, ' ' || entity || ' ')""".stripMargin,

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

    // Same two-regexp chain with the 'g' flag; both engines' [^a-z0-9\s]
    // and \s classes agree on ASCII input.
    "q_text_normalize" ->
      s"""SELECT doc_id, text_norm,
         |  CAST(length(text_norm) AS BIGINT) AS n_chars_norm
         |FROM (
         |  SELECT doc_id,
         |    trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS text_norm
         |  FROM documents)""".stripMargin,

    "q_repetition" ->
      s"""SELECT doc_id,
         | ${S.distinctTokenFrac("text")} AS distinct_token_frac,
         | ${S.dupNgramFrac("text", 2)} AS dup_bigram_frac,
         | ${S.dupNgramFrac("text", 3)} AS dup_trigram_frac
         |FROM documents""".stripMargin,

    // Independent formulation: the model is a joined CTE here where the
    // Spark side walks a literal hash table — same counts, same floor
    // divisions, so the integer scores match exactly.
    "q_lm_score" ->
      s"""WITH norm AS (
         |  SELECT doc_id,
         |    '_' || regexp_replace(lower(text), '\\s+', '_', 'g') || '_' AS t
         |  FROM documents),
         |idx AS (SELECT doc_id, t, unnest(range(1, length(t))) AS i FROM norm),
         |big AS (SELECT doc_id, substr(t, i, 2) AS b FROM idx),
         |cnt AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY b),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
         |model AS (SELECT b, CAST(c * 1000000 // n AS BIGINT) AS ppm FROM cnt, tot),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(ppm) AS BIGINT) AS lm_sum_ppm
         |  FROM big JOIN model USING (b) GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, lm_sum_ppm,
         |  CAST(lm_sum_ppm // n_bigrams AS BIGINT) AS lm_avg_ppm
         |FROM agg""".stripMargin,

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

    "q_quality_classifier" -> {
      val vals = qualityLexicon.toSeq.sortBy(_._1)
        .map { case (k, v) => s"('$k', CAST($v AS BIGINT))" }.mkString(", ")
      s"""WITH w(tok, wt) AS (VALUES $vals),
         |toks AS (
         |  SELECT doc_id, unnest(${S.tokens("lower(text)")}) AS tok FROM documents),
         |m AS (
         |  SELECT doc_id, CAST(COALESCE(sum(wt), 0) AS BIGINT) AS margin
         |  FROM toks LEFT JOIN w USING (tok) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(${S.tokenCount("d.text")} AS INTEGER) AS n_tokens,
         |  COALESCE(m.margin, 0) AS margin,
         |  CAST(CASE WHEN COALESCE(m.margin, 0) >= 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM documents d LEFT JOIN m USING (doc_id)""".stripMargin
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

    "q_dedup_exact" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source, row_number() OVER (
         |    PARTITION BY array_to_string(${S.tokens("lower(text)")}, ' ')
         |    ORDER BY doc_id) AS rn
         |  FROM documents) WHERE rn = 1""".stripMargin,

    // Strings where the Spark side uses 8-byte hashes (the documented
    // dedup trade); same batch/corpus split, same k=3 shingles, same
    // integer-count Jaccard.
    "q_dedup_incremental" ->
      s"""WITH inc AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 = 0),
         |ex AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 <> 0),
         |exk AS (SELECT DISTINCT array_to_string(${S.tokens("lower(text)")}, ' ') AS nk FROM ex),
         |surv AS (
         |  SELECT doc_id, source, text FROM inc
         |  WHERE array_to_string(${S.tokens("lower(text)")}, ' ') NOT IN (SELECT nk FROM exk)),
         |wi AS (SELECT doc_id, ${S.tokens("text")} AS w FROM surv),
         |we AS (SELECT doc_id, ${S.tokens("text")} AS w FROM ex),
         |shi AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM wi WHERE len(w) >= 3),
         |she AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM we WHERE len(w) >= 3),
         |szi AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shi GROUP BY doc_id),
         |sze AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM she GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS i
         |  FROM shi a JOIN she b ON a.s = b.s GROUP BY 1, 2),
         |near AS (
         |  SELECT DISTINCT ia FROM inter
         |  JOIN szi ON ia = szi.doc_id JOIN sze ON ib = sze.doc_id
         |  WHERE CAST(i AS DOUBLE) / (szi.n + sze.n - i) >= 0.2)
         |SELECT doc_id, source FROM surv
         |WHERE doc_id NOT IN (SELECT ia FROM near)""".stripMargin,

    // The Spark side anti-joins on xxhash64(lower(text)); the oracle uses
    // plain string equality — the hash-compare proves the 8-byte-key plan
    // changes nothing. Same synthesized arrival order (doc_id % 7, doc_id).
    "q_dedup_ingest" ->
      s"""WITH inc AS (
         |  SELECT doc_id, source, lower(text) AS k, doc_id % 7 AS arrival
         |  FROM documents WHERE doc_id % 3 = 0),
         |ex AS (
         |  SELECT DISTINCT lower(text) AS k
         |  FROM documents WHERE doc_id % 3 <> 0),
         |surv AS (SELECT * FROM inc WHERE k NOT IN (SELECT k FROM ex))
         |SELECT doc_id, source FROM (
         |  SELECT doc_id, source, row_number() OVER (
         |    PARTITION BY k ORDER BY arrival, doc_id) AS rn
         |  FROM surv) WHERE rn = 1""".stripMargin,

    // Independent formulation: spans as STRINGS + windows (the Spark side
    // groups 8-byte span hashes and joins — same winners modulo 2^-64
    // collisions, the documented exact-dedup trade).
    "q_dedup_spans" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |grams AS (
         |  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+4], ' ') AS g
         |  FROM toks, LATERAL unnest(range(1, len(w) - 3)) r(i)),
         |marked AS (
         |  SELECT doc_id, pos,
         |    count(*) OVER (PARTITION BY g) AS c,
         |    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
         |  FROM grams),
         |cov AS (
         |  SELECT doc_id, pos + j AS tpos
         |  FROM (SELECT doc_id, pos FROM marked WHERE c > 1 AND rn > 1),
         |       LATERAL unnest(range(0, 5)) rr(j)),
         |tok_pos AS (
         |  SELECT doc_id, unnest(w) AS tok, unnest(range(0, len(w))) AS pos
         |  FROM toks),
         |kept AS (
         |  SELECT t.doc_id, t.tok, t.pos
         |  FROM tok_pos t LEFT JOIN cov c
         |    ON c.doc_id = t.doc_id AND c.tpos = t.pos
         |  WHERE c.doc_id IS NULL),
         |agg AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id,
         |  coalesce(a.text_clean, '') AS text_clean,
         |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(len(t.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped
         |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // Exact replay of the winnowing selection (normalize -> k-gram
    // polynomial hashes -> window min -> distinct) with list
    // comprehensions; range() end is exclusive, so counts shift by one
    // vs Spark's inclusive sequence().
    "q_winnowing" ->
      s"""WITH $winnowCtes
         |SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM sel""".stripMargin,

    // Same selection, then the df-capped posting self-join in plain SQL.
    "q_winnow_pairs" ->
      s"""WITH $winnowCtes,
         |fp AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
         |df AS (SELECT fp, count(*) AS df FROM fp GROUP BY fp),
         |kept AS (SELECT f.doc_id, f.fp FROM fp f
         |         JOIN df ON df.fp = f.fp WHERE df.df <= 64)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(count(*) AS BIGINT) AS shared
         |FROM kept a JOIN kept b
         |  ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 8""".stripMargin,

    // Exact line-equality semantics (the Spark side dfs by 8-byte line
    // hashes — same result modulo 2^-64 collisions, the documented trade).
    "q_line_dedup" ->
      """WITH built AS (
        |  SELECT doc_id,
        |    concat('== ', source, ' news ==', chr(10),
        |           'lang ', lang, ' @ ', source, chr(10),
        |           'promo ', CAST(doc_id % 97 AS VARCHAR), chr(10),
        |           'ref ', CAST(doc_id % 997 AS VARCHAR), chr(10),
        |           text, chr(10),
        |           '(c) all rights reserved') AS text
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    unnest(range(len(string_split(text, chr(10))))) AS pos
        |  FROM built),
        |df AS (SELECT line, count(DISTINCT doc_id) AS c
        |       FROM lines GROUP BY line)
        |SELECT l.doc_id,
        |  string_agg(l.line, chr(10) ORDER BY l.pos) AS text_clean,
        |  CAST(count(*) AS BIGINT) AS n_lines_kept
        |FROM lines l JOIN df ON l.line = df.line
        |WHERE df.c <= 8
        |GROUP BY l.doc_id""".stripMargin,

    // Same all-pairs string-shingle formulation as q_dedup_ngram at the
    // prefix query's threshold: the oracle knows nothing about prefixes,
    // Overlap coefficient over the same string-shingle formulation; the
    // only change vs q_dedup_ngram is the min-side denominator.
    "q_dedup_containment" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS intersection
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, intersection, sa.n AS n_a, sb.n AS n_b,
         |  CAST(intersection AS DOUBLE)/least(sa.n, sb.n) AS containment
         |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         |WHERE CAST(intersection AS DOUBLE)/least(sa.n, sb.n) >= 0.8""".stripMargin,

    // Every maximal duplicated span's boundaries, bit for bit.
    "q_dup_spans" ->
      s"""WITH ${dupSpanCtes(8)}
         |SELECT doc_id, span_start, span_end,
         |  span_end - span_start AS span_tokens
         |FROM sp""".stripMargin,

    // Same CTEs; per-doc scrub report with the x10^6 integer-grid
    // duplicated fraction (nonneg // nonneg — division-direction-proof).
    "q_dup_span_stats" ->
      s"""WITH ${dupSpanCtes(8)},
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens
         |  FROM sp GROUP BY doc_id),
         |tc AS (
         |  SELECT doc_id,
         |    CAST(len(${S.tokens("lower(text)")}) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT tc.doc_id, tc.n_tokens,
         |  coalesce(agg.n_spans, 0) AS n_spans,
         |  coalesce(agg.dup_tokens, 0) AS dup_tokens,
         |  CASE WHEN tc.n_tokens > 0
         |    THEN coalesce(agg.dup_tokens, 0) * 1000000 // tc.n_tokens
         |    ELSE 0 END AS dup_micro
         |FROM tc LEFT JOIN agg USING (doc_id)""".stripMargin,

    // Same string-shingle formulation; shingle -> min(doc_id), join back,
    // one exact division and one exact IEEE subtraction per doc.
    "q_novelty" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |fs AS (SELECT s, min(doc_id) AS first_id FROM sh GROUP BY s)
         |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN first_id < sh.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_seen_before,
         |  1.0 - CAST(sum(CASE WHEN first_id < sh.doc_id THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
         |FROM sh JOIN fs ON sh.s = fs.s GROUP BY sh.doc_id""".stripMargin,

    // so a green row proves the prefix filter dropped NO qualifying pair.
    "q_dedup_prefix" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS intersection
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, intersection, sa.n AS n_a, sb.n AS n_b,
         |  CAST(intersection AS DOUBLE)/(sa.n + sb.n - intersection) AS jaccard
         |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         |WHERE CAST(intersection AS DOUBLE)/(sa.n + sb.n - intersection) >= 0.5""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS intersection
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, intersection, sa.n AS n_a, sb.n AS n_b,
         |  CAST(intersection AS DOUBLE)/(sa.n + sb.n - intersection) AS jaccard
         |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         |WHERE CAST(intersection AS DOUBLE)/(sa.n + sb.n - intersection) >= 0.2""".stripMargin,

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.2),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM good
         |  UNION SELECT id_b, id_a FROM good),
         |reach(n, r) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
         |  UNION
         |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n),
         |comp AS (SELECT n, min(r) AS component FROM reach GROUP BY n)
         |SELECT d.doc_id,
         |  CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.n""".stripMargin,

    // Same component CTEs; the weight is 10^6 DIV cluster size (nonneg
    // integer division — direction-proof).
    "q_dsir_score" -> dsirOracle(buckets = 4096),

    // Entropy replay: same (doc, token) counts, same unrolled integer
    // log2, same single direction-proof (nonnegative) division.
    "q_token_entropy" ->
      s"""WITH tokse AS (
         |  SELECT doc_id, ${S.tokens("lower(text)")} AS w FROM documents),
         |tc AS (
         |  SELECT doc_id, tk, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, unnest(w) AS tk FROM tokse) GROUP BY 1, 2),
         |tote AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS n_types
         |  FROM tc GROUP BY doc_id),
         |vals AS (
         |  SELECT DISTINCT v FROM (
         |    SELECT c AS v FROM tc UNION ALL SELECT n FROM tote)),
         |${log2FixedSql("vals")},
         |hsum AS (
         |  SELECT tc.doc_id,
         |    CAST(sum(tc.c * (la.lg - lb.lg)) AS BIGINT) AS hs
         |  FROM tc JOIN tote USING (doc_id)
         |  JOIN lg la ON la.v = tote.n
         |  JOIN lg lb ON lb.v = tc.c
         |  GROUP BY tc.doc_id)
         |SELECT d.doc_id,
         |  coalesce(tote.n, 0) AS n_tokens,
         |  coalesce(tote.n_types, 0) AS n_types,
         |  CASE WHEN coalesce(tote.n, 0) > 0 THEN hsum.hs // tote.n
         |       ELSE 0 END AS entropy_fixed
         |FROM documents d
         |LEFT JOIN tote USING (doc_id) LEFT JOIN hsum USING (doc_id)""".stripMargin,

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

    // Same component CTEs; representative = row_number 1 by
    // (token count DESC, doc_id).
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.2),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM good
         |  UNION SELECT id_b, id_a FROM good),
         |reach(n, r) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
         |  UNION
         |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n),
         |comp AS (SELECT n, min(r) AS component FROM reach GROUP BY n),
         |asg AS (
         |  SELECT d.doc_id,
         |    CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
         |    CAST(len(${S.tokens("d.text")}) AS BIGINT) AS n_tokens
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.n)
         |SELECT doc_id, component, n_tokens,
         |  CAST(CASE WHEN row_number() OVER (PARTITION BY component
         |    ORDER BY n_tokens DESC, doc_id) = 1 THEN 1 ELSE 0 END AS INT) AS keep
         |FROM asg""".stripMargin,

    // Same component CTEs as q_dedup_clusters; fold = the portable md5
    // hash of the component's decimal string, mod 5.
    "q_group_kfold" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.2),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM good
         |  UNION SELECT id_b, id_a FROM good),
         |reach(n, r) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
         |  UNION
         |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n),
         |comp AS (SELECT n, min(r) AS component FROM reach GROUP BY n),
         |asg AS (
         |  SELECT d.doc_id,
         |    CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.n)
         |SELECT doc_id, component,
         |  CAST((CAST(('0x' || substring(md5(CAST(component AS VARCHAR)), 1, 15))
         |    AS BIGINT) % ${DedupOps.PortableHashPrime}) % 5 AS INT) AS fold
         |FROM asg""".stripMargin,

    "q_dedup_weights" ->
      s"""WITH RECURSIVE $dedupWeightsCtes
         |$dedupWeightsSelect""".stripMargin,

    // The Kish ESS fold over the identical weight CTEs: exact long
    // sums, one multiply, two divisions — same IEEE order as the engine.
    "q_ess_weights" ->
      s"""WITH RECURSIVE $dedupWeightsCtes,
         |w AS ($dedupWeightsSelect)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(weight_micro) AS BIGINT) AS sum_w_micro,
         |  CAST(sum(weight_micro * weight_micro) AS BIGINT) AS sum_w2,
         |  (CAST(sum(weight_micro) AS DOUBLE) * CAST(sum(weight_micro) AS DOUBLE))
         |    / CAST(sum(weight_micro * weight_micro) AS DOUBLE) AS ess,
         |  ((CAST(sum(weight_micro) AS DOUBLE) * CAST(sum(weight_micro) AS DOUBLE))
         |    / CAST(sum(weight_micro * weight_micro) AS DOUBLE))
         |    / CAST(count(*) AS DOUBLE) AS ess_ratio
         |FROM w""".stripMargin,

    "q_chunk_tokens" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |c AS (
         |  SELECT doc_id, w,
         |    unnest(range(0, CAST(floor((len(w) - 1) / 24.0) AS BIGINT) + 1)) AS chunk_idx
         |  FROM toks WHERE len(w) > 0)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  array_to_string(w[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' ') AS chunk_text,
         |  CAST(least(32, len(w) - chunk_idx*24) AS BIGINT) AS n_tokens
         |FROM c""".stripMargin,

    "q_pack_sequences" ->
      s"""SELECT doc_id, doc_id % 8 AS bucket,
         |  CAST(floor(coalesce(sum(n_tokens) OVER (
         |    PARTITION BY doc_id % 8 ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT)
         |    AS pack_id,
         |  n_tokens
         |FROM (SELECT doc_id, CAST(${S.tokenCount("text")} AS BIGINT) AS n_tokens
         |      FROM documents)""".stripMargin,

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

    "q_zorder" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${PrepOps.zorderKeySql("l_partkey", "l_suppkey")} AS zkey
         |FROM lineitem""".stripMargin,

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

    "q_hilbert_layout" ->
      PrepOps.hilbertKeySqlQuery(
        "l_partkey", "l_suppkey", "lineitem",
        carry = Seq("l_orderkey", "l_linenumber"), keyAlias = "hkey"),

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

    "q_dedup_apply" ->
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))) AS s
         |  FROM toks WHERE len(w) >= 3),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |good AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.2),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM good
         |  UNION SELECT id_b, id_a FROM good),
         |reach(n, r) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
         |  UNION
         |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n),
         |comp AS (SELECT n, min(r) AS component FROM reach GROUP BY n)
         |SELECT d.doc_id, d.source
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.n
         |WHERE coalesce(c.component, d.doc_id) = d.doc_id""".stripMargin,

    "q_corpus_stats" ->
      s"""SELECT source, lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(${S.tokenCount("text")}) AS BIGINT) AS n_tokens,
         |  CAST(sum(${S.piiCount("text")}) AS BIGINT) AS n_pii,
         |  min(${S.qualityScore("text")}) AS min_quality,
         |  max(${S.qualityScore("text")}) AS max_quality
         |FROM documents GROUP BY source, lang""".stripMargin,

    "q_top_terms" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${S.tokens("lower(text)")}) AS token
         |  FROM documents),
         |dfreq AS (
         |  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tok GROUP BY token),
         |tfreq AS (
         |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY doc_id, token),
         |scored AS (
         |  SELECT doc_id, token, tf, df,
         |    CAST(tf AS DOUBLE) / df AS score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY CAST(tf AS DOUBLE) / df DESC, token) AS rank
         |  FROM tfreq JOIN dfreq USING (token))
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df, score
         |FROM scored WHERE rank <= 3""".stripMargin,

    "q_corpus_clean" ->
      s"""WITH filtered AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE ${S.tokenCount("text")} >= 20
         |    AND ${S.distinctTokenFrac("text")} >= 0.45),
         |toks AS (
         |  SELECT doc_id, ${S.tokens("text")} AS w FROM filtered),
         |grams AS (
         |  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+4], ' ') AS g
         |  FROM toks, LATERAL unnest(range(1, len(w) - 3)) r(i)),
         |marked AS (
         |  SELECT doc_id, pos,
         |    count(*) OVER (PARTITION BY g) AS c,
         |    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
         |  FROM grams),
         |cov AS (
         |  SELECT doc_id, pos + j AS tpos
         |  FROM (SELECT doc_id, pos FROM marked WHERE c > 1 AND rn > 1),
         |       LATERAL unnest(range(0, 5)) rr(j)),
         |tok_pos AS (
         |  SELECT doc_id, unnest(w) AS tok, unnest(range(0, len(w))) AS pos
         |  FROM toks),
         |kept AS (
         |  SELECT t.doc_id, t.tok, t.pos
         |  FROM tok_pos t LEFT JOIN cov c
         |    ON c.doc_id = t.doc_id AND c.tpos = t.pos
         |  WHERE c.doc_id IS NULL),
         |agg AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id),
         |spanned AS (
         |  SELECT t.doc_id,
         |    coalesce(a.text_clean, '') AS text_clean,
         |    CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
         |    CAST(len(t.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped
         |  FROM toks t LEFT JOIN agg a USING (doc_id)
         |  WHERE coalesce(a.n_kept, 0) > 0)
         |SELECT doc_id, text_clean, n_kept, n_dropped FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY text_clean ORDER BY doc_id) AS rn
         |  FROM spanned) WHERE rn = 1""".stripMargin,

    "q_split_train_val" ->
      s"""SELECT doc_id,
         |  CASE WHEN ${S.fingerprint("text")} % 100 < 90 THEN 'train'
         |       WHEN ${S.fingerprint("text")} % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "q_pii_redact" ->
      s"""SELECT doc_id, ${S.redactPii("text")} AS clean_text,
         | CAST(${S.piiCount("text")} AS INTEGER) AS n_pii
         |FROM documents""".stripMargin,

    "q_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest(${S.tokens("lower(text)")}) AS w FROM documents),
         |chs AS (SELECT list_filter(string_split(w, ''), c -> len(c) > 0) AS ch FROM w),
         |p AS (
         |  SELECT unnest(list_transform(range(1, len(ch)), i -> ch[i] || ' ' || ch[i + 1])) AS pair
         |  FROM chs WHERE len(ch) >= 2)
         |SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY pair
         |ORDER BY n DESC, pair LIMIT 50""".stripMargin,

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

    // Same rational arithmetic and the same left-assoc evaluation order as
    // the Spark side — every op is IEEE-exactly-rounded, so the double
    // scores hash-match bit-for-bit.
    // Independent formulation: token array slices compared as strings —
    // the oracle never builds postings or joins.
    "q_phrase_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("lower(text)")} AS w FROM documents)
         |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos
         |FROM toks, LATERAL unnest(range(1, len(w) - 1)) r(i)
         |WHERE array_to_string(w[i:i+2], ' ') = 'slow hash batch'""".stripMargin,

    // Full-corpus phrase replay (the q_phrase_search oracle) + the
    // segment flag: green means the refreshed (base build + delta
    // append) postings lake answers exactly like a from-scratch index.
    "q_index_refresh" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${S.tokens("lower(text)")} AS w FROM documents)
         |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS from_delta
         |FROM toks, LATERAL unnest(range(1, len(w) - 1)) r(i)
         |WHERE array_to_string(w[i:i+2], ' ') = 'slow hash batch'""".stripMargin,

    // The ledger assertion is deterministic by construction: base and
    // delta1 refreshed, delta2 deliberately left out.
    "q_index_staleness" ->
      """SELECT * FROM (VALUES
        |  ('postings', 'base',   CAST(1 AS INT)),
        |  ('postings', 'delta1', CAST(1 AS INT)),
        |  ('postings', 'delta2', CAST(0 AS INT))) t(kind, segment, covered)""".stripMargin,

    "q_bm25_search" ->
      s"""WITH d AS (
         |  SELECT doc_id,
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
         |  FROM d)
         |SELECT doc_id, score FROM (
         |  SELECT doc_id,
         |         ((n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.25) / (tf0 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |       + ((n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.25) / (tf1 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |       + ((n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.25) / (tf2 + 1.25 * (0.25 + 0.75 * dl / (sumdl / n)))
         |         AS score
         |  FROM d, s)
         |WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

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

    // The sketch is an implementation detail on the Spark side (candidate
    // generation only); the exact-verify pass makes the contract pure SQL.
    "q_heavy_hitters" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) * 1024 > (SELECT count(*) FROM orders)""".stripMargin,

    // Every CMS counter regenerated in HUGEINT splitmix SQL, then the
    // same min-fold — the estimate values themselves are gated, and with
    // them the est >= exact guarantee (overcount would go negative on a
    // hash-family or fold bug and break the hash compare).
    "q_cms_freq" ->
      s"""WITH o AS (SELECT o_custkey AS key FROM orders),
         |js(j) AS (VALUES (0), (1), (2)),
         |cells AS (
         |  SELECT j, (am // 2) % 256 AS bucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT key, j,
         |    ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761 + j")}
         |    FROM o CROSS JOIN js)
         |  GROUP BY 1, 2),
         |pr AS (SELECT t.range AS probe FROM range(1, 201) t),
         |pc AS (
         |  SELECT probe, j, (bm // 2) % 256 AS bucket
         |  FROM (SELECT probe, j,
         |    ${RefQueries.mixSql("b", "probe::HUGEINT * 2654435761 + j")}
         |    FROM pr CROSS JOIN js)),
         |est AS (
         |  SELECT probe, min(coalesce(c.cnt, 0)) AS cms_count
         |  FROM pc LEFT JOIN cells c ON c.j = pc.j AND c.bucket = pc.bucket
         |  GROUP BY 1),
         |ex AS (SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS exact_count
         |       FROM orders GROUP BY 1)
         |SELECT e.probe AS probe_key,
         |  CAST(e.cms_count AS BIGINT) AS cms_count,
         |  coalesce(x.exact_count, 0) AS exact_count,
         |  CAST(e.cms_count - coalesce(x.exact_count, 0) AS BIGINT) AS overcount
         |FROM est e LEFT JOIN ex x ON x.ck = e.probe""".stripMargin,

    // Order statistics and set memberships of both sketches replayed
    // exactly; the union/intersection estimates are the same IEEE op
    // chains on them.
    "q_kmv_join_card" ->
      s"""WITH ah AS (
         |  SELECT DISTINCT (am // 2) AS u
         |  FROM (SELECT
         |    ${RefQueries.mixSql("a", "o_custkey::HUGEINT * 2654435761")}
         |    FROM orders)),
         |ka AS (SELECT u FROM (
         |  SELECT u, row_number() OVER (ORDER BY u) AS rk FROM ah)
         |  WHERE rk <= 64),
         |b0 AS (SELECT c_custkey AS key FROM customer
         |       WHERE c_mktsegment = 'AUTOMOBILE'),
         |bh AS (
         |  SELECT DISTINCT (bm // 2) AS u
         |  FROM (SELECT
         |    ${RefQueries.mixSql("b", "key::HUGEINT * 2654435761")}
         |    FROM b0)),
         |kb AS (SELECT u FROM (
         |  SELECT u, row_number() OVER (ORDER BY u) AS rk FROM bh)
         |  WHERE rk <= 64),
         |m AS (SELECT u FROM (
         |  SELECT u, row_number() OVER (ORDER BY u) AS rk FROM
         |    (SELECT DISTINCT u FROM
         |      (SELECT u FROM ka UNION ALL SELECT u FROM kb)))
         |  WHERE rk <= 64),
         |ms AS (SELECT CAST(count(*) AS BIGINT) AS n_kept_union,
         |              max(u) AS max_u FROM m),
         |cm AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM m
         |       WHERE u IN (SELECT u FROM ka)
         |         AND u IN (SELECT u FROM kb)),
         |ad AS (SELECT DISTINCT o_custkey AS k1 FROM orders),
         |bd AS (SELECT DISTINCT key AS k2 FROM b0),
         |ex AS (SELECT
         |    CAST(count(k1) AS BIGINT) AS exact_a,
         |    CAST(count(k2) AS BIGINT) AS exact_b,
         |    CAST(count(*) AS BIGINT) AS exact_union,
         |    CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
         |        THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
         |  FROM ad FULL JOIN bd ON k1 = k2)
         |SELECT ms.n_kept_union,
         |  CASE WHEN ms.n_kept_union >= 64
         |       THEN CAST(ms.max_u AS BIGINT) END AS kth_union,
         |  CASE WHEN ms.n_kept_union >= 64
         |       THEN 63.0 * (9223372036854775808.0 / CAST(ms.max_u AS DOUBLE))
         |       ELSE CAST(ms.n_kept_union AS DOUBLE) END AS union_est,
         |  cm.n_common,
         |  CASE WHEN ms.n_kept_union > 0
         |       THEN (CAST(cm.n_common AS DOUBLE)
         |             / CAST(ms.n_kept_union AS DOUBLE)) * union_est
         |       ELSE 0.0 END AS inter_est,
         |  ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_inter
         |FROM ms CROSS JOIN cm CROSS JOIN ex""".stripMargin,

    // The k-th order statistic of the distinct hash set, replayed in
    // HUGEINT SQL; the estimate is the same two correctly-rounded IEEE
    // ops (divide, then multiply) on it.
    // Per-segment k-smallest AND the merged row computed from the raw
    // feed — matching them against the Spark side's sketch-only fold IS
    // the mergeable-summary proof.
    "q_kmv_stream" -> {
      val k = 64
      s"""WITH e AS (
         |  SELECT CAST(event_id % 3 AS VARCHAR) AS segment,
         |    user_id AS key
         |  FROM events),
         |m AS (
         |  SELECT DISTINCT segment, (am // 2) AS u
         |  FROM (SELECT segment,
         |    ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761")}
         |    FROM e)),
         |a AS (
         |  SELECT segment, u FROM m
         |  UNION
         |  SELECT 'merged', u FROM m),
         |r AS (
         |  SELECT segment, u, row_number() OVER (
         |    PARTITION BY segment ORDER BY u) AS rk
         |  FROM a),
         |cnt AS (
         |  SELECT segment, CAST(count(*) AS BIGINT) AS n_all
         |  FROM a GROUP BY 1),
         |kth AS (
         |  SELECT segment, CAST(u AS BIGINT) AS kth_hash
         |  FROM r WHERE rk = $k)
         |SELECT c.segment,
         |  CAST(least(c.n_all, $k) AS BIGINT) AS n_kept,
         |  k2.kth_hash,
         |  CASE WHEN k2.kth_hash IS NULL THEN CAST(c.n_all AS DOUBLE)
         |       ELSE ${k - 1}.0 * (9223372036854775808.0
         |              / CAST(k2.kth_hash AS DOUBLE))
         |  END AS est_distinct
         |FROM cnt c
         |LEFT JOIN kth k2 ON k2.segment = c.segment""".stripMargin
    },

    "q_kmv_distinct" ->
      s"""WITH o AS (
         |  SELECT CAST(year(CAST(o_orderdate AS DATE)) * 12
         |           + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS part_month,
         |    o_orderstatus AS status, o_custkey AS key
         |  FROM orders),
         |m AS (
         |  SELECT DISTINCT part_month, status, (am // 2) AS u
         |  FROM (SELECT part_month, status,
         |    ${RefQueries.mixSql("a", "key::HUGEINT * 2654435761")}
         |    FROM o)),
         |r AS (
         |  SELECT part_month, status, u, row_number() OVER (
         |    PARTITION BY part_month, status ORDER BY u) AS rk
         |  FROM m),
         |cnt AS (
         |  SELECT part_month, status, CAST(count(*) AS BIGINT) AS n_all
         |  FROM m GROUP BY 1, 2),
         |kth AS (
         |  SELECT part_month, status, CAST(u AS BIGINT) AS kth_hash
         |  FROM r WHERE rk = 64),
         |ex AS (
         |  SELECT part_month, status,
         |    CAST(count(DISTINCT key) AS BIGINT) AS n_exact
         |  FROM o GROUP BY 1, 2)
         |SELECT c.part_month, c.status,
         |  CAST(least(c.n_all, 64) AS BIGINT) AS n_kept,
         |  k.kth_hash,
         |  CASE WHEN k.kth_hash IS NULL THEN CAST(c.n_all AS DOUBLE)
         |       ELSE 63.0 * (9223372036854775808.0 / CAST(k.kth_hash AS DOUBLE))
         |  END AS est_distinct,
         |  e.n_exact,
         |  est_distinct / CAST(e.n_exact AS DOUBLE) AS est_ratio
         |FROM cnt c
         |LEFT JOIN kth k ON k.part_month = c.part_month AND k.status = c.status
         |JOIN ex e ON e.part_month = c.part_month AND e.status = c.status""".stripMargin,

    "q_vocab_topk" ->
      s"""SELECT token, CAST(count(*) AS BIGINT) AS tf,
         | CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |FROM (SELECT doc_id, unnest(${S.tokens("lower(text)")}) AS token
         |      FROM documents)
         |GROUP BY token ORDER BY tf DESC, token LIMIT 100""".stripMargin,

    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |errors AS (
        |  SELECT event_id AS error_id, user_id, ts
        |  FROM events WHERE event_type = 'error')
        |SELECT error_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
        |  c.click_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS clicked_at
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.click_ts""".stripMargin,

    // Same ASOF semantics checked against the NATIVE physical operator.
    "q_asof_native" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |errors AS (
        |  SELECT event_id AS error_id, user_id, ts
        |  FROM events WHERE event_type = 'error')
        |SELECT error_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
        |  c.click_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS clicked_at
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.click_ts""".stripMargin,

    "q_clicks_before_errors" ->
      """SELECT e.event_id AS error_id, e.user_id, c.event_id AS click_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id
        |  AND e.event_type = 'error' AND c.event_type = 'click'
        |  AND c.ts >= e.ts - INTERVAL 30 MINUTE AND c.ts <= e.ts""".stripMargin,

    "q_events_enriched" ->
      """SELECT e.event_id, e.user_id, e.event_type,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ev_ts,
        |  c.c_name AS user_name, c.c_nationkey AS user_nation,
        |  c.c_mktsegment AS user_segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    "q_pagerank" -> pageRankOracle(iters = 5),

    // Plain id-ordered triangle enumeration (u < v < w) — equivalent to
    // the Spark side's degree-ordered orientation, which finds each
    // triangle exactly once too.
    "q_triangles" ->
      """WITH n AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM n a JOIN n b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |       JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |nodes AS (SELECT unnest([a, b, c]) AS node FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM nodes GROUP BY node""".stripMargin,

    "q_pagerank_dangling" -> pageRankOracle(iters = 3, dangling = true),

    "q_hits" -> hitsOracle(iters = 3),

    "q_ppr" -> pprOracle(seeds = Seq(2L), iters = 3),

    "q_kcore" -> kCoreSql(k = 40, rounds = 8),

    // Basket-local pair join on the distinct (order, part) set — the
    // oracle needs no skew guard at its scale.
    "q_cooccurrence" ->
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS bk, CAST(l_partkey AS BIGINT) AS item
        |  FROM lineitem)
        |SELECT a.item AS item_a, b.item AS item_b,
        |  CAST(count(*) AS BIGINT) AS n_baskets
        |FROM it a JOIN it b ON a.bk = b.bk AND a.item < b.item
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    // Independent formulation: basket-keyed self-join pair counts (the
    // Spark side explodes row-locally — same pairs); confidence/lift are
    // the same single divisions of the same exact longs.
    "q_assoc_rules" ->
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS bk, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM it),
        |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM it GROUP BY item),
        |pc AS (
        |  SELECT a.item AS antecedent, b.item AS consequent,
        |    CAST(count(*) AS BIGINT) AS pair_cnt
        |  FROM it a JOIN it b ON a.bk = b.bk AND a.item <> b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 50)
        |SELECT pc.antecedent, pc.consequent, pc.pair_cnt,
        |  ia.cnt AS ante_cnt, ca.cnt AS cons_cnt, n.n_baskets,
        |  CAST(pc.pair_cnt AS DOUBLE) / CAST(ia.cnt AS DOUBLE) AS confidence,
        |  CAST(pc.pair_cnt * n.n_baskets AS DOUBLE)
        |    / CAST(ia.cnt * ca.cnt AS DOUBLE) AS lift
        |FROM pc
        |JOIN ic ia ON ia.item = pc.antecedent
        |JOIN ic ca ON ca.item = pc.consequent
        |CROSS JOIN n""".stripMargin,

    "q_communities" -> lpaSql(rounds = 4),

    "q_modularity" -> modularitySql(rounds = 4),

    "q_transition_matrix" ->
      """WITH pr AS (
        |  SELECT user_id, event_type, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, event_type AS next_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
        |      FROM c GROUP BY prev_type)
        |SELECT c.prev_type, next_type, n,
        |  CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) AS p
        |FROM c JOIN t ON c.prev_type = t.prev_type""".stripMargin,

    // Independent formulation: the W-wide range join the Spark plan
    // refuses to run — correct at oracle scale, and a hash match proves
    // the disjoint-interval explode counts every (user, day) exactly once.
    "q_rolling_dau" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM active)
        |SELECT d.day AS day,
        |  CAST(count(DISTINCT CASE WHEN a.day = d.day THEN a.user_id END)
        |    AS BIGINT) AS dau,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS dau_w
        |FROM days d JOIN active a ON a.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day""".stripMargin,

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

    // Same ranking (count desc, token asc) and exact x10^6 cumulative
    // grid over the type counts.
    "q_vocab_coverage" ->
      s"""WITH tok AS (
         |  SELECT unnest(${S.tokens("lower(text)")}) AS token
         |  FROM documents),
         |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
         |      FROM tok GROUP BY token),
         |r AS (SELECT token, n,
         |  CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
         |    AS rank,
         |  CAST(sum(n) OVER (ORDER BY n DESC, token
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
         |  CAST(sum(n) OVER () AS BIGINT) AS total
         |  FROM c)
         |SELECT rank, token, n, cum_n,
         |  CAST((cum_n * 1000000) // total AS BIGINT) AS cum_micro
         |FROM r WHERE rank <= 40""".stripMargin,

    // Window list() honors the bounded ROWS frame; an empty frame yields
    // NULL -> coalesce to '' matching Spark's empty-array array_join.
    "q_seq_windows" ->
      """SELECT user_id, event_id,
        |  coalesce(array_to_string(list(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '|'), '') AS context,
        |  event_type AS target
        |FROM events""".stripMargin,

    "q_quality_filter" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, ${S.qualityScore("text")} AS quality
         |  FROM documents),
         |m AS (
         |  SELECT lang, quality AS med FROM (
         |    SELECT lang, quality,
         |      row_number() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS rn,
         |      count(*) OVER (PARTITION BY lang) AS n
         |    FROM q)
         |  WHERE rn = (n + 1) // 2)
         |SELECT doc_id, q.lang, quality
         |FROM q JOIN m ON q.lang = m.lang
         |WHERE quality >= med""".stripMargin,

    "q_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM ev
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(lead(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id),
        |    '%Y-%m-%d %H:%M:%S') AS valid_to
        |FROM ch""".stripMargin,

    "q_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t2,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t3,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_signup,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 >= t1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2
        |    AND t4 >= t3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |FROM f""".stripMargin,

    "q_cohort_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |firsts AS (SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |  CAST(day - cohort AS INTEGER) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM days JOIN firsts USING (user_id)
        |WHERE day - cohort <= 6
        |GROUP BY 1, 2""".stripMargin,

    // same 256-scaled integer recurrence, unrolled as a recursive CTE
    // keyed by the per-type day index
    // Same value-range window lags over the same exact cents grid.
    "q_forecast_backtest" ->
      """WITH d0 AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, d, x,
        |  max(x) OVER (PARTITION BY event_type ORDER BY d
        |    RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS xs,
        |  max(x) OVER (PARTITION BY event_type ORDER BY d
        |    RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS xn
        |  FROM d0)
        |SELECT event_type,
        |  CAST(count(xs) AS BIGINT) AS n_eval,
        |  CAST(sum(abs(x - xs)) AS BIGINT) AS sae_seasonal,
        |  CAST(count(xn) AS BIGINT) AS n_naive,
        |  CAST(sum(abs(x - xn)) AS BIGINT) AS sae_naive,
        |  CASE WHEN count(xs) > 0 AND sum(abs(x - xn)) > 0
        |    THEN CAST(sum(abs(x - xs)) * count(xn) AS DOUBLE)
        |       / CAST(count(xs) * sum(abs(x - xn)) AS DOUBLE) END AS mase
        |FROM s GROUP BY event_type""".stripMargin,

    "q_anomaly_ewma" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY day) AS i
        |  FROM d0),
        |r AS (
        |  SELECT event_type, day, x, i, 256 * x AS ewma, 0 AS anomaly
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.event_type, d.day, d.x, d.i,
        |    (3 * r.ewma + 256 * d.x) // 4,
        |    CASE WHEN 256 * d.x * 4 > 5 * r.ewma
        |           OR 256 * d.x * 5 < 4 * r.ewma THEN 1 ELSE 0 END
        |  FROM r JOIN d ON d.event_type = r.event_type AND d.i = r.i + 1)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(x AS BIGINT) AS n, CAST(ewma AS BIGINT) AS ewma,
        |  CAST(anomaly AS INTEGER) AS anomaly
        |FROM r""".stripMargin,

    // Identical recurrence, mu carried through the recursion; slack=4,
    // threshold=40 mirror the registered parameters.
    "q_cusum_shift" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY day) AS i
        |  FROM d0),
        |r AS (
        |  SELECT event_type, day, x, i, x AS mu,
        |    CAST(0 AS BIGINT) AS s_hi, CAST(0 AS BIGINT) AS s_lo,
        |    0 AS alarm
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.event_type, d.day, d.x, d.i, r.mu,
        |    greatest(CAST(0 AS BIGINT), r.s_hi + (d.x - r.mu) - 4),
        |    greatest(CAST(0 AS BIGINT), r.s_lo + (r.mu - d.x) - 4),
        |    CASE WHEN greatest(CAST(0 AS BIGINT), r.s_hi + (d.x - r.mu) - 4) > 40
        |           OR greatest(CAST(0 AS BIGINT), r.s_lo + (r.mu - d.x) - 4) > 40
        |      THEN 1 ELSE 0 END
        |  FROM r JOIN d ON d.event_type = r.event_type AND d.i = r.i + 1)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(x AS BIGINT) AS n, CAST(s_hi AS BIGINT) AS s_hi,
        |  CAST(s_lo AS BIGINT) AS s_lo, CAST(alarm AS INTEGER) AS alarm
        |FROM r""".stripMargin,

    "q_dataset_diff" ->
      s"""WITH toks AS (
         |  SELECT doc_id, text, ${S.tokens("text")} AS w FROM documents),
         |v2 AS (
         |  SELECT doc_id, array_to_string(w[1:40], ' ') AS text2
         |  FROM toks WHERE len(w) >= 20)
         |SELECT coalesce(d.doc_id, v.doc_id) AS doc_id,
         |  CASE WHEN d.doc_id IS NULL THEN 'added'
         |       WHEN v.doc_id IS NULL THEN 'removed'
         |       WHEN v.text2 = d.text THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM documents d FULL JOIN v2 v ON d.doc_id = v.doc_id""".stripMargin,

    "q_range_join" ->
      """WITH ranges AS (
        |  SELECT DISTINCT
        |    CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS r_start
        |  FROM events WHERE event_type = 'error'),
        |points AS (
        |  -- floor, not cast: epoch() is fractional and CAST rounds while
        |  -- Spark's unix_timestamp truncates
        |  SELECT event_id AS click_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT r_start,
        |  CAST(count(*) AS BIGINT) AS n_clicks,
        |  min(click_id) AS first_click
        |FROM points JOIN ranges
        |  ON p_ts >= r_start AND p_ts < r_start + 300
        |GROUP BY r_start""".stripMargin,

    // each event replicated to its 4 aligned hop starts — the unrolled
    // form of the native sliding-window Expand
    "q_events_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS f
        |  FROM events),
        |w AS (
        |  SELECT event_type, value, f - 900 * i.i AS w_start
        |  FROM e CROSS JOIN (SELECT unnest(range(4)) AS i) i)
        |SELECT event_type, w_start,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q_skew_report" ->
      """WITH c AS (
        |  SELECT l_suppkey AS key, count(*) AS cnt
        |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT key, cnt, row_number() OVER (ORDER BY cnt, key) AS r,
        |    count(*) OVER () AS n
        |  FROM c),
        |h AS (
        |  SELECT string_agg(key || ':' || cnt, ',' ORDER BY cnt DESC, key DESC)
        |    AS hot_keys
        |  FROM (SELECT key, cnt FROM c ORDER BY cnt DESC, key DESC LIMIT 5)),
        |s AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n_keys,
        |    CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    CAST(max(cnt) AS BIGINT) AS max_cnt,
        |    CAST(max(CASE WHEN r = (n + 1) // 2 THEN cnt END) AS BIGINT)
        |      AS p50_cnt,
        |    CAST(max(CASE WHEN r = (99 * n + 99) // 100 THEN cnt END) AS BIGINT)
        |      AS p99_cnt
        |  FROM r)
        |SELECT n_keys, n_rows, max_cnt, p50_cnt, p99_cnt,
        |  CAST(max_cnt // greatest(p50_cnt, 1) AS BIGINT) AS skew_ratio,
        |  hot_keys
        |FROM s CROSS JOIN h""".stripMargin,

    "q_score_calibrate" ->
      s"""SELECT doc_id, lang,
         |  CAST(${S.tokenCount("text")} AS INTEGER) AS score,
         |  percent_rank() OVER (PARTITION BY lang
         |    ORDER BY ${S.tokenCount("text")}) AS cal
         |FROM documents""".stripMargin,

    // the naive inequality self-join the bucketed plan must reproduce
    "q_interval_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS cust, o_orderkey AS id,
        |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS s
        |  FROM orders)
        |SELECT a.cust AS cust, a.id AS a_id, b.id AS b_id,
        |  CAST(least(a.s + 15, b.s + 15) - greatest(a.s, b.s) AS BIGINT)
        |    AS overlap_days
        |FROM o a JOIN o b ON a.cust = b.cust AND a.id < b.id
        |  AND a.s < b.s + 15 AND b.s < a.s + 15""".stripMargin,

    // window formulation of the as-of-with-tolerance: rank touches per
    // purchase by (ts DESC, payload DESC) inside the 2h window — the
    // DESC payload matches asofJoin's greatest-tuple tie resolution
    "q_attribution" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id AS touch_id, event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view')),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.purchase_id, t.touch_id, t.channel,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |      ORDER BY t.ts DESC, t.touch_id DESC, t.channel DESC) AS rn
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND t.ts <= p.ts AND t.ts >= p.ts - INTERVAL 2 HOUR)
        |SELECT p.purchase_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  j.touch_id, j.channel
        |FROM p LEFT JOIN j ON j.purchase_id = p.purchase_id AND j.rn = 1""".stripMargin,

    // identical semantics to q_range_join — the Spark side differs only in
    // HOW the plan gets its bucketed shape (optimizer rule vs explicit op)
    "q_range_join_sql" ->
      """WITH ranges AS (
        |  SELECT DISTINCT
        |    CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS r_start
        |  FROM events WHERE event_type = 'error'),
        |points AS (
        |  SELECT event_id AS click_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT r_start,
        |  CAST(count(*) AS BIGINT) AS n_clicks,
        |  min(click_id) AS first_click
        |FROM points JOIN ranges
        |  ON p_ts >= r_start AND p_ts < r_start + 300
        |GROUP BY r_start""".stripMargin,

    "q_bloom_anti" ->
      """SELECT doc_id, source FROM documents
        |WHERE doc_id NOT IN (
        |  SELECT doc_id FROM documents WHERE n_chars < 150)""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1995-07-01' AND o_orderdate < '1995-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,

    "q_pivot" ->
      """SELECT source,
        |  CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
        |  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
        |  CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
        |  CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
        |  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
        |FROM documents GROUP BY source""".stripMargin,

    "q_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_price_cents,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price_cents', sum_price_cents FROM w
        |UNION ALL
        |SELECT l_returnflag, 'n_rows', n_rows FROM w""".stripMargin,

    // Matcher replayed through the SAME SymSpell deletion-neighborhood
    // blocking (variant-STRING equality join + exact levenshtein verify
    // on candidates only) + recursive-CTE components + the same windowed
    // survivorship order. The all-pairs formulation this blocking equals
    // is proven twice elsewhere: q_fuzzy_join's driver oracle IS the
    // all-pairs predicate join, and EntityOpsSpec re-proves it on the
    // exact q_entity_golden observation frame at sf0.001. The previous
    // all-pairs oracle here cost 1 346 s at sf0.1 in DuckDB (PERF.md) —
    // O(n²) levenshtein evals that dominated every scale sweep; the
    // blocked replay is O(n·len + candidates), seconds at sf0.1.
    "q_entity_golden" ->
      """WITH RECURSIVE c AS (
        |  SELECT c_custkey AS ck,
        |    c_name || ' '
        |      || printf('%08x', (c_custkey * 2654435761) % 4294967296) AS nm,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |recs AS (
        |  SELECT ck * 2 AS rid, nm AS obs_name, cents AS acct_cents,
        |    0 AS is_dirty
        |  FROM c
        |  UNION ALL
        |  SELECT ck * 2 + 1,
        |    substr(nm, 1, (ck % 10 + 10) - 1)
        |      || substr(nm, ck % 10 + 10 + 1, length(nm)),
        |    CAST(0 AS BIGINT), 1
        |  FROM c WHERE ck % 2 = 0),
        |vr AS (
        |  SELECT rid, unnest(list_distinct(list_append(
        |    list_transform(range(1, length(obs_name) + 1),
        |      i -> substr(obs_name, 1, i - 1)
        |           || substr(obs_name, i + 1, length(obs_name))),
        |    obs_name))) AS vh
        |  FROM recs),
        |cand AS (
        |  SELECT DISTINCT a.rid AS u, b.rid AS w
        |  FROM vr a JOIN vr b ON a.vh = b.vh AND a.rid < b.rid),
        |pairs AS (
        |  SELECT cd.u, cd.w AS v
        |  FROM cand cd
        |  JOIN recs ra ON ra.rid = cd.u
        |  JOIN recs rb ON rb.rid = cd.w
        |  WHERE levenshtein(ra.obs_name, rb.obs_name) <= 1),
        |edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        |reach(n, r) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
        |  UNION
        |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n),
        |comp AS (SELECT n, min(r) AS component FROM reach GROUP BY n),
        |tagged AS (
        |  SELECT r.*, coalesce(cp.component, r.rid) AS entity_id
        |  FROM recs r LEFT JOIN comp cp ON cp.n = r.rid),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY entity_id
        |    ORDER BY length(obs_name) DESC, obs_name DESC, rid) AS rn
        |  FROM tagged),
        |agg AS (
        |  SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(sum(is_dirty) AS BIGINT) AS n_dirty,
        |    CAST(max(acct_cents) AS BIGINT) AS acct_cents
        |  FROM tagged GROUP BY 1)
        |SELECT a.entity_id, a.n_members, a.n_dirty, a.acct_cents,
        |  r.obs_name AS name, r.rid AS src_rid
        |FROM agg a JOIN ranked r
        |  ON r.entity_id = a.entity_id AND r.rn = 1""".stripMargin,

    // The all-pairs formulation the Spark side's blocking must equal.
    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    "q_quantiles" ->
      """SELECT l_returnflag,
        | quantile_cont(cents, 0.5) / 100 AS p50,
        | quantile_cont(cents, 0.9) / 100 AS p90,
        | quantile_cont(cents, 0.99) / 100 AS p99
        |FROM (SELECT l_returnflag,
        |        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |      FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin,

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

    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        | event_type,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Naive global-window watermark replay (the formulation the engine's
    // two-phase prefix scan must equal), over the same block-16-reversed
    // planted arrival order.
    "q_late_data" ->
      """WITH e AS (
        |  SELECT event_id // 16 * 16 + 15 - event_id % 16 AS arrival,
        |    epoch_us(ts) AS ts_us FROM events),
        |s AS (
        |  SELECT ts_us, max(ts_us) OVER (ORDER BY arrival
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen
        |  FROM e),
        |l AS (
        |  SELECT ts_us,
        |    CASE WHEN seen IS NOT NULL AND ts_us < seen - 600000000
        |         THEN 1 ELSE 0 END AS late,
        |    CASE WHEN seen IS NOT NULL AND ts_us < seen - 600000000
        |         THEN seen - 600000000 - ts_us ELSE 0 END AS lateness
        |  FROM s)
        |SELECT ts_us // 3600000000 * 3600000000 AS window_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(late) AS BIGINT) AS n_late,
        |  CAST(sum(lateness) AS BIGINT) AS late_us_sum
        |FROM l GROUP BY 1""".stripMargin,

    "q_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sess GROUP BY 1, 2""".stripMargin,

    // session_window semantics, microsecond-exact: a session extends
    // while the inter-event gap is STRICTLY under 30 min (>= gap starts
    // a new one), and the window end is last_ts + gap.
    "q_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
        |  CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    // Integer cents x integer microsecond durations — both sums are exact
    // int64 reductions, then the same two-division chain as the Spark
    // side ((num/den)/100, each correctly rounded).
    "q_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) - epoch_us(ts) AS dur_us
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(dur_us) AS BIGINT) AS span_us,
        |  CAST(sum(cents * dur_us) AS DOUBLE) / CAST(sum(dur_us) AS DOUBLE)
        |    / 100.0 AS twa_value
        |FROM e WHERE dur_us IS NOT NULL GROUP BY user_id""".stripMargin,

    // Same lag-flag-and-running-sum sessionization in integer
    // microseconds; burst_id's HUGEINT window sum casts back to BIGINT.
    "q_collapse_bursts" ->
      """WITH x AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id)) AS gap
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    sum(CASE WHEN gap IS NULL OR gap > 30000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS burst_id
        |  FROM x)
        |SELECT user_id, event_type, CAST(burst_id AS BIGINT) AS burst_id,
        |  CAST(min(us) AS BIGINT) AS start_us,
        |  CAST(count(*) AS BIGINT) AS n_collapsed
        |FROM b GROUP BY user_id, event_type, burst_id""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
        |   AS total_value,
        | CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INTEGER)
        |   AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,

    "q_complex_types" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |l AS (
         |  SELECT doc_id, toks,
         |    list_transform(toks, t -> CAST(len(t) AS INTEGER)) AS lens,
         |    list_transform(toks, t -> CAST(len(t) AS INTEGER))[1:5] AS head5
         |  FROM tk)
         |SELECT doc_id,
         |  CAST(len(toks) AS INTEGER) AS n_tokens,
         |  CAST(len(list_filter(toks, t -> len(t) >= 5)) AS INTEGER) AS n_long,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(toks, t -> CAST(len(t) AS BIGINT))),
         |    (a, b) -> a + b) AS BIGINT) AS total_tok_chars,
         |  CAST(list_max(lens) AS INTEGER) AS max_tok_len,
         |  toks[1] AS first_tok,
         |  toks[-1] AS last_tok,
         |  list_sort(toks)[1] AS min_tok,
         |  array_to_string(
         |    list_transform(head5, x -> CAST(x AS VARCHAR)), ',') AS head_lens,
         |  array_to_string(list_transform(range(1, len(head5) + 1),
         |    i -> CAST(CAST(head5[i] + head5[len(head5) - i + 1] AS INTEGER)
         |              AS VARCHAR)), ',') AS sym_lens
         |FROM l""".stripMargin,

    "q_set_ops" ->
      """SELECT key, 'building_buyer' AS src FROM (
        |  SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders)
        |UNION ALL
        |SELECT key, 'never_ordered' AS src FROM (
        |  SELECT c_custkey AS key FROM customer
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders)""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_events_json" ->
      """SELECT event_type,
        | CAST(count(k) AS BIGINT) AS n,
        | CAST(sum(k) AS BIGINT) AS k_sum,
        | CAST(min(k) AS INTEGER) AS k_min,
        | CAST(max(k) AS INTEGER) AS k_max
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,

    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(price_c) AS DOUBLE)/100 AS sum_base_price,
        | CAST(sum(price_c * (100 - disc_pc)) AS DOUBLE)/10000 AS sum_disc_price,
        | CAST(sum(price_c * (100 - disc_pc) * (100 + tax_pc)) AS DOUBLE)/1000000 AS sum_charge,
        | sum(l_quantity)/count(*) AS avg_qty,
        | CAST(sum(price_c) AS DOUBLE)/count(*)/100 AS avg_price,
        | CAST(sum(disc_pc) AS DOUBLE)/count(*)/100 AS avg_disc,
        | CAST(count(*) AS BIGINT) AS count_order
        |FROM (
        |  SELECT *,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount*100) AS BIGINT) AS disc_pc,
        |    CAST(round(l_tax*100) AS BIGINT) AS tax_pc
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01')
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,

    // the salt only changes the physical shuffle; the logical join result
    // is the plain equi-join
    "q_salted_join" ->
      """SELECT o_custkey, c_mktsegment,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2""".stripMargin,

    "q_tpch_q14" ->
      """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END) AS DOUBLE)
        |     / CAST(sum(rev_u) AS DOUBLE) AS promo_revenue_pct
        |FROM (
        |  SELECT l_partkey,
        |    CAST(round(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_u
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01') li
        |JOIN part ON l_partkey = p_partkey""".stripMargin,

    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS orderdate, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 300) big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_moving_avg" ->
      """WITH daily AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER)
        |      AS day_ord,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS day_c
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, day_ord,
        |  CAST(sum(day_c) OVER (PARTITION BY o_custkey ORDER BY day_ord
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
        |    AS trailing_7d
        |FROM daily""".stripMargin,

    "q_window_running" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
        |   AS running_total
        |FROM orders""".stripMargin,

    // lag/lead carry values unchanged (no float arithmetic); rank and
    // ntile are integer — all four engine-exact under the deterministic
    // orderings.
    "q_window_funcs" ->
      """SELECT o_orderkey, o_custkey,
        | lag(o_totalprice, 1) OVER w_date AS prev_price,
        | lead(o_totalprice, 1) OVER w_date AS next_price,
        | CAST(rank() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_rank,
        | CAST(ntile(4) OVER w_date AS INTEGER) AS date_quartile
        |FROM orders
        |WINDOW w_date AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INTEGER) AS l_year,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-10-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_tpch_q19" ->
      """SELECT
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q_tpch_q22" ->
      """WITH sel AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer WHERE c_nationkey IN (3, 7, 13, 17, 23)),
        |avg_bal AS (
        |  SELECT CAST(sum(bal_c) AS DOUBLE) / count(*) AS avg_c
        |  FROM sel WHERE bal_c > 0)
        |SELECT c_nationkey AS cntrycode,
        |  CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(bal_c) AS DOUBLE) / 100 AS totacctbal
        |FROM sel, avg_bal
        |WHERE CAST(bal_c AS DOUBLE) > avg_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |  * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.04 AND l_discount <= 0.06
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_2' THEN rev_u ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(rev_u) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT l_orderkey, l_partkey, l_suppkey,
        |    CAST(round(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_u
        |  FROM lineitem) li
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "q_tpch_q12" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey, sum(
        |    CAST(round(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS total_u
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_u AS DOUBLE) / 10000 AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_u = (SELECT max(total_u) FROM rev)""".stripMargin,

    "q_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#9' AND p_size = 5),
        |stats AS (
        |  SELECT l_partkey AS ag_key, sum(l_quantity) AS qty_sum,
        |    CAST(count(*) AS BIGINT) AS qty_cnt
        |  FROM li GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |  / 700 AS avg_yearly
        |FROM li JOIN stats ON l_partkey = ag_key
        |WHERE l_quantity * 5 * qty_cnt < qty_sum""".stripMargin,

    "q_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100 / l_quantity) AS BIGINT)) AS cost_c
        |  FROM lineitem GROUP BY 1, 2),
        |rps AS (
        |  SELECT ps.*, s_name, s_acctbal, n_name
        |  FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'),
        |mn AS (SELECT l_partkey AS mk, min(cost_c) AS min_c FROM rps GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  CAST(cost_c AS DOUBLE) / 100 AS supply_cost
        |FROM rps JOIN mn ON l_partkey = mk AND cost_c = min_c
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'PROMO' AND p_size BETWEEN 10 AND 20
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "q_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |       * (100 - CAST(round(l_discount*100) AS BIGINT))
        |     - CAST(round(p_retailprice*100) AS BIGINT) * 100
        |       * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 10000 AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red %'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,

    "q_tpch_q11" ->
      """WITH val AS (
        |  SELECT l_partkey AS p_key,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_c
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |  GROUP BY 1),
        |tot AS (SELECT sum(value_c) AS total_c FROM val)
        |SELECT p_key, CAST(value_c AS DOUBLE) / 100 AS part_value
        |FROM val, tot WHERE value_c * 1000 > total_c
        |ORDER BY value_c DESC, p_key""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND NOT EXISTS (SELECT 1 FROM supplier
        |                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q20" ->
      """WITH sq AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(round(l_quantity) AS BIGINT)) AS supp_qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
        |  GROUP BY 1, 2),
        |pq AS (SELECT l_partkey AS pk, sum(supp_qty) AS part_qty FROM sq GROUP BY 1)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
        |  AND EXISTS (SELECT 1 FROM sq JOIN pq ON l_partkey = pk
        |              WHERE l_suppkey = s_suppkey AND supp_qty * 2 > part_qty)
        |ORDER BY s_name""".stripMargin,

    // Tie parity with asofJoin: right-before-left at equal ts (state_ts
    // <= ts inclusive), coincident changes resolve to the max (state_ts,
    // state) struct — hence the (state_ts DESC, state DESC) rank.
    // state_age in whole seconds: epoch_us // 1e6 == Spark's
    // unix_timestamp floor on these post-epoch instants.
    "q_pit_join" ->
      """WITH st0 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events WHERE event_type IN ('view', 'click', 'error')),
        |states AS (SELECT user_id, ts AS state_ts, event_type AS state
        |           FROM st0 WHERE prev IS NULL OR prev <> event_type),
        |p AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT p.event_id, p.user_id, p.ts, s.state_ts, s.state,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY s.state_ts DESC NULLS LAST, s.state DESC) AS rn
        |  FROM p LEFT JOIN states s
        |    ON p.user_id = s.user_id AND s.state_ts <= p.ts)
        |SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  coalesce(state, 'none') AS state_at_purchase,
        |  epoch_us(ts) // 1000000 - epoch_us(state_ts) // 1000000
        |    AS state_age_secs
        |FROM m WHERE rn = 1""".stripMargin,

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

    "q_attribution_multi" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id AS touch_id, event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view')),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.purchase_id, t.touch_id, t.channel, p.cents,
        |    count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND t.ts <= p.ts AND t.ts >= p.ts - INTERVAL 2 HOUR)
        |SELECT purchase_id, touch_id, channel, n_touches,
        |  CAST(cents AS DOUBLE) / 100 / n_touches AS credit
        |FROM j""".stripMargin,

    "q_impute_locf" ->
      """SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ev_ts,
        |  masked,
        |  last_value(masked IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  CAST(masked IS NULL AS INTEGER) AS was_masked
        |FROM (SELECT user_id, event_id, ts,
        |        CASE WHEN event_id % 10 < 3 THEN NULL ELSE value END AS masked
        |      FROM events)""".stripMargin,

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

    "q_gopher_rules" -> {
      val toks = S.tokens("lower(text)")
      val sumLen = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($toks, t -> CAST(len(t) AS BIGINT))), (a, b) -> a + b)"
      val stops = TextOps.Sql.stopwordHits("text",
        Seq("the", "a", "of", "and", "to", "in", "is", "it"))
      s"""SELECT doc_id,
         |  CAST(nw >= 3 AND nw <= 50 AS INTEGER) AS r_words,
         |  CAST(nw > 0 AND suml >= nw AND suml * 10 <= nw * 45 AS INTEGER)
         |    AS r_word_len,
         |  CAST(np * 10 <= nc AS INTEGER) AS r_symbol,
         |  CAST(stops >= 1 AS INTEGER) AS r_stopword,
         |  CAST(nw >= 3 AND nw <= 50 AS INTEGER)
         |    * CAST(nw > 0 AND suml >= nw AND suml * 10 <= nw * 45 AS INTEGER)
         |    * CAST(np * 10 <= nc AS INTEGER)
         |    * CAST(stops >= 1 AS INTEGER) AS passes
         |FROM (SELECT doc_id,
         |        CAST(len($toks) AS BIGINT) AS nw,
         |        $sumLen AS suml,
         |        CAST(length(text) AS BIGINT) AS nc,
         |        CAST(${S.punctCount("text")} AS BIGINT) AS np,
         |        $stops AS stops
         |      FROM documents)""".stripMargin
    },

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

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

    "q_incr_agg" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
        |    AS total_spend
        |FROM orders GROUP BY 1""".stripMargin,

    // Recursive walk with per-level dedup (UNION, not UNION ALL — path
    // counts would explode combinatorially); min(hops) per node IS the
    // BFS distance.
    "q_shortest_hops" ->
      """WITH RECURSIVE
        |pairs AS (SELECT DISTINCT o_custkey * 2 AS cust,
        |            l_suppkey * 2 + 1 AS supp
        |          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT cust AS src, supp AS dst FROM pairs
        |      UNION ALL SELECT supp, cust FROM pairs),
        |walk(node, hops) AS (
        |  SELECT CAST(2 AS BIGINT) AS node, 0 AS hops
        |  UNION
        |  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
        |  WHERE w.hops < 3)
        |SELECT node, min(hops) AS hops FROM walk GROUP BY node""".stripMargin,

    // Same min-plus recursion with the hop counter bounding rounds; the
    // modular weight regenerates row-locally on both engines.
    "q_shortest_paths" ->
      """WITH RECURSIVE
        |pairs AS (SELECT DISTINCT o_custkey * 2 AS cust,
        |            l_suppkey * 2 + 1 AS supp
        |          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst, (src + dst) % 7 + 1 AS w FROM (
        |  SELECT cust AS src, supp AS dst FROM pairs
        |  UNION ALL SELECT supp, cust FROM pairs)),
        |walk(node, d, h) AS (
        |  SELECT CAST(2 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d, 0 AS h
        |  UNION ALL
        |  SELECT e.dst, w.d + e.w, w.h + 1 FROM walk w JOIN e ON e.src = w.node
        |  WHERE w.h < 3)
        |SELECT node, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY node""".stripMargin,

    "q_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.user_id,
        |  epoch_us(p.ts) // 1000000 - epoch_us(c.ts) // 1000000 AS gap_secs
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 2 HOUR AND c.ts <= p.ts""".stripMargin,

    "q_compaction_plan" ->
      """WITH listing AS (
        |  SELECT source, doc_id % 16 AS shard,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2),
        |binned AS (
        |  SELECT source, shard, bytes,
        |    CAST((sum(bytes) OVER (PARTITION BY source
        |      ORDER BY bytes DESC, shard) - bytes) // 30000 AS BIGINT) AS bin
        |  FROM listing)
        |SELECT source, bin, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes
        |FROM binned GROUP BY 1, 2""".stripMargin,

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

    "q_oov_rate" -> {
      val vocab = qualityLexicon.keys.toSeq.sorted
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(no) AS BIGINT) AS n_oov,
         |  CAST(sum(no) AS DOUBLE) / CAST(sum(nt) AS DOUBLE) AS oov_rate
         |FROM (SELECT source, len(${S.tokens("lower(text)")}) AS nt,
         |        len(list_filter(${S.tokens("lower(text)")},
         |          tk -> NOT list_contains($vocab, tk))) AS no
         |      FROM documents)
         |GROUP BY source""".stripMargin
    },

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

    // From-scratch Adamic-Adar replay: distinct bipartite edges, center
    // degrees, log2FixedSql over the (bounded) distinct degree values,
    // the identical hub cutoff, wedges via the center self-join (viable
    // at oracle scale; the engine emits them row-locally), integer
    // floor-division weights (positive operands: DuckDB // == Spark div).
    "q_link_predict" ->
      s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS ctr,
         |    l_suppkey * 2 + 1 AS leaf
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |dg AS (SELECT ctr, count(*) AS deg FROM e GROUP BY ctr),
         |vals AS (SELECT DISTINCT deg AS v FROM dg WHERE deg BETWEEN 2 AND 64),
         |${log2FixedSql("vals")},
         |w AS (SELECT dg.ctr, ${EstimatorOps.AaMicroNum} // lg.lg AS wm
         |      FROM dg JOIN lg ON lg.v = dg.deg
         |      WHERE dg.deg BETWEEN 2 AND 64),
         |wg AS (SELECT a.leaf AS node_a, b.leaf AS node_b, w.wm
         |       FROM e a JOIN e b ON a.ctr = b.ctr AND a.leaf < b.leaf
         |       JOIN w ON w.ctr = a.ctr)
         |SELECT node_a::BIGINT AS node_a, node_b::BIGINT AS node_b,
         |  CAST(count(*) AS BIGINT) AS n_common,
         |  CAST(sum(wm) AS BIGINT) AS aa_micro
         |FROM wg GROUP BY node_a, node_b
         |ORDER BY aa_micro DESC, node_a, node_b LIMIT 20""".stripMargin,

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

    // Heap replay (ORDER BY f DESC, tk LIMIT 128), log2FixedSql over
    // ranks ∪ frequencies, the >> 12 truncation, then the q_ols_trend
    // sign-split moment algebra.
    "q_zipf_fit" ->
      s"""WITH fr AS (SELECT tk, CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT unnest(${S.tokens("lower(text)")}) AS tk
         |        FROM documents) GROUP BY tk),
         |top AS (SELECT tk, f FROM fr ORDER BY f DESC, tk LIMIT 128),
         |rk AS (SELECT f, CAST(row_number() OVER (ORDER BY f DESC, tk)
         |         AS BIGINT) AS rank FROM top),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT f AS v FROM rk UNION ALL SELECT rank FROM rk)),
         |${log2FixedSql("vals")},
         |pts AS (SELECT lr.lg >> 12 AS x, lf.lg >> 12 AS y
         |        FROM rk JOIN lg lr ON lr.v = rk.rank
         |        JOIN lg lf ON lf.v = rk.f),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
         |        sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
         |      FROM pts),
         |f2 AS (SELECT n, sx, sy,
         |         (n * sxy - sx * sy) * 1000000 AS num,
         |         n * sxx - sx * sx AS den
         |       FROM m),
         |sl AS (SELECT n, sx, sy, den,
         |         CASE WHEN den > 0 THEN
         |           CASE WHEN num >= 0 THEN num // den
         |                ELSE -((-num) // den) END
         |         END AS slope_micro
         |       FROM f2)
         |SELECT n AS n_ranks, CAST(slope_micro AS BIGINT) AS slope_micro,
         |  CAST(CASE WHEN den > 0 THEN
         |    CASE WHEN sy * 1000000 - slope_micro * sx >= 0
         |         THEN (sy * 1000000 - slope_micro * sx) // n
         |         ELSE -((-(sy * 1000000 - slope_micro * sx)) // n) END
         |  END AS BIGINT) AS intercept_micro
         |FROM sl""".stripMargin,

    // Bigram build (1-based list indexing over range(1, len)), then
    // counts-of-counts from scratch; every division nonnegative `//`.
    "q_good_turing" ->
      s"""WITH tw AS (SELECT ${S.tokens("lower(text)")} AS w FROM documents),
         |fr AS (SELECT tk, CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT w[i] || ' ' || w[i + 1] AS tk
         |        FROM tw, unnest(range(1, len(w))) AS u(i)) GROUP BY tk),
         |cc AS (SELECT f AS r, CAST(count(*) AS BIGINT) AS n_r
         |       FROM fr GROUP BY f),
         |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
         |          CAST(sum(n_r) AS BIGINT) AS vocab,
         |          CAST(coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0)
         |            AS BIGINT) AS n1
         |        FROM cc)
         |SELECT cc.r, cc.n_r,
         |  CAST(coalesce(nx.n_r, 0) AS BIGINT) AS n_r_next,
         |  tot.n_tokens, tot.vocab,
         |  CAST(((cc.r + 1) * coalesce(nx.n_r, 0) * 1000000) // cc.n_r
         |    AS BIGINT) AS r_star_micro,
         |  CAST((tot.n1 * 1000000) // tot.n_tokens AS BIGINT)
         |    AS p_unseen_micro
         |FROM cc LEFT JOIN cc nx ON nx.r = cc.r + 1 CROSS JOIN tot
         |WHERE cc.r <= 10""".stripMargin,

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

    // Bigram counts via 1-based list indexing, positional marginals,
    // log2FixedSql over counts ∪ marginals ∪ N, the identical heap cut.
    "q_pmi_collocations" ->
      s"""WITH tw AS (SELECT ${S.tokens("lower(text)")} AS w FROM documents),
         |bc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy FROM (
         |    SELECT w[i] AS x, w[i + 1] AS y
         |    FROM tw, unnest(range(1, len(w))) AS u(i)) GROUP BY x, y),
         |mx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x
         |       FROM bc GROUP BY x),
         |my AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y
         |       FROM bc GROUP BY y),
         |tot AS (SELECT CAST(coalesce(sum(c_xy), 0) AS BIGINT) AS n_pairs
         |        FROM bc),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT c_xy AS v FROM bc WHERE c_xy >= 5
         |    UNION ALL SELECT c_x FROM mx
         |    UNION ALL SELECT c_y FROM my
         |    UNION ALL SELECT n_pairs FROM tot WHERE n_pairs >= 1)),
         |${log2FixedSql("vals")},
         |sc AS (SELECT bc.x, bc.y, bc.c_xy, mx.c_x, my.c_y,
         |         lxy.lg + ln.lg - lx.lg - ly.lg AS pmi_fixed
         |       FROM bc JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
         |       JOIN lg lxy ON lxy.v = bc.c_xy
         |       JOIN lg lx ON lx.v = mx.c_x
         |       JOIN lg ly ON ly.v = my.c_y
         |       JOIN lg ln ON ln.v = tot.n_pairs
         |       WHERE bc.c_xy >= 5)
         |SELECT x, y, c_xy, c_x, c_y, CAST(pmi_fixed AS BIGINT) AS pmi_fixed
         |FROM sc ORDER BY pmi_fixed DESC, x, y LIMIT 50""".stripMargin,

    // Same bigram/marginal CTEs; the undivided fixed-point sum and the
    // single closing division.
    "q_entropy_rate" ->
      s"""WITH tw AS (SELECT ${S.tokens("lower(text)")} AS w FROM documents),
         |bc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy FROM (
         |    SELECT w[i] AS x, w[i + 1] AS y
         |    FROM tw, unnest(range(1, len(w))) AS u(i)) GROUP BY x, y),
         |mx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x
         |       FROM bc GROUP BY x),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT c_xy AS v FROM bc UNION ALL SELECT c_x FROM mx)),
         |${log2FixedSql("vals")},
         |j AS (SELECT bc.c_xy, lx.lg AS lgx, lxy.lg AS lgxy
         |      FROM bc JOIN mx USING (x)
         |      JOIN lg lxy ON lxy.v = bc.c_xy
         |      JOIN lg lx ON lx.v = mx.c_x),
         |hsum AS (SELECT CAST(coalesce(sum(c_xy), 0) AS BIGINT) AS n_pairs,
         |         CAST(coalesce(sum(c_xy * (lgx - lgxy)), 0) AS BIGINT)
         |           AS h_num_fixed
         |       FROM j),
         |cx AS (SELECT CAST(count(*) AS BIGINT) AS n_contexts FROM mx)
         |SELECT hsum.n_pairs, cx.n_contexts, hsum.h_num_fixed,
         |  CASE WHEN hsum.n_pairs > 0
         |       THEN CAST(hsum.h_num_fixed AS DOUBLE)
         |          / CAST(hsum.n_pairs * 1048576 AS DOUBLE) END AS h_bits
         |FROM hsum, cx""".stripMargin,

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
         |FROM per, tot""".stripMargin
  )
}
