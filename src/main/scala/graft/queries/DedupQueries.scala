package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, AudioOps, ComponentStore, ContaminationOps, DedupOps, EstimatorOps, ExperimentOps, GraphOps, IndexOps, IvfOps, JoinOps, LakeOps, LatticeKmeans, LmOps, ModelOps, MultimodalOps, PcaOps, PqOps, PrepOps, PrivacyOps, ProfileOps, SamplingOps, SearchOps, SimilarityOps, SketchOps, TextOps}
import graft.ops.Lineage.LineageOps
import graft.streaming.{EventOps, IngestDedupStream}

import QueryShared._

/** Deduplication: exact/ngram/minhash/simhash/spans/CDC, cluster weights, entity resolution.
  *
  * Domain slice of the gated catalog (split out of PipelineQueries
  * in round 9); assembled and exposed by [[PipelineQueries]].
  */
private[queries] object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Component-store lifecycle (ComponentStore): the near-dup component
    // artifact is built ONCE per ingested segment and persisted — base +
    // delta + idempotent delta re-run inside the query, oracled against
    // the from-scratch recursive-CTE components over the WHOLE corpus
    // (the even/odd split cuts real clusters across the two segments, so
    // the label-contraction merge path is what the hash gate certifies).
    "q_components_refresh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = java.nio.file.Files
        .createTempDirectory("graft_comp_").toString
      ComponentStore.refresh(docs.filter(col("doc_id") % 2 === 0), store, "base")
      ComponentStore.refresh(docs.filter(col("doc_id") % 2 =!= 0), store, "delta1")
      ComponentStore.refresh(docs.filter(col("doc_id") % 2 =!= 0), store, "delta1") // idempotent re-run
      ComponentStore.assignment(s, store)
    }),

    // q_dedup_weights riding the artifact: same exact weight grid, but
    // the expensive pair + components work happened at INGEST (the
    // memoized shared store — QueryShared.componentStore — plays the
    // ingest; the rider is one cluster-sized aggregate + one slim
    // join). Oracle identical to q_dedup_weights.
    "q_dedup_weights_artifact" -> ((s, dir) =>
      ComponentStore.weights(s, componentStore(s, dir))),

    // The ESS fold riding the artifact (same exact-long Kish algebra as
    // q_ess_weights, off ComponentStore.weights). Oracle identical.
    "q_ess_weights_artifact" -> ((s, dir) =>
      ComponentStore.weights(s, componentStore(s, dir)).agg(
        count(lit(1)).as("n_docs"),
        sum(col("weight_micro")).as("sum_w_micro"),
        sum(col("weight_micro") * col("weight_micro")).as("sum_w2"))
        .withColumn("ess",
          (col("sum_w_micro").cast("double") *
            col("sum_w_micro").cast("double")) / col("sum_w2").cast("double"))
        .withColumn("ess_ratio", col("ess") / col("n_docs").cast("double"))),

    // Dedup APPLIED off the artifact: representatives are the fixpoint
    // rows (doc_id == component) of the stored assignment — the cleaned
    // corpus without re-pairing anything. Oracle identical to
    // q_dedup_apply.
    "q_dedup_apply_artifact" -> ((s, dir) => {
      val reps = ComponentStore.assignment(s, componentStore(s, dir))
        .filter(col("doc_id") === col("component"))
        .select(col("doc_id"))
      t(s, dir, "documents").join(reps, "doc_id")
        .select(col("doc_id"), col("source"))
    }),

    // q_group_kfold riding the artifact: leakage-safe folds from the
    // stored assignment — no shingling or component iteration at split
    // time. Oracle identical to q_group_kfold.
    "q_group_kfold_artifact" -> ((s, dir) =>
      ComponentStore.assignment(s, componentStore(s, dir))
        .select(col("doc_id"), col("component"),
          (DedupOps.portableShingleHash(col("component").cast("string")) % 5)
            .cast("int").as("fold"))),

    // Fuzzy entity matching (SymSpell deletion-neighborhood blocking +
    // exact levenshtein verify): candidates join on 8-byte variant
    // hashes, never all-pairs — the oracle IS the all-pairs predicate
    // join, so the gate proves blocking completeness, not just parity.
    "q_fuzzy_join" -> ((s, dir) =>
      JoinOps.fuzzySelfPairs(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name")),

    // Blocking-quality report (reduction ratio / pairs completeness /
    // pairs quality) of the deletion-neighborhood candidate generator
    // against PLANTED truth: every even customer gets a one-char-deleted
    // dirty observation (the q_entity_golden feed), truth = those
    // (base, dirty) pairs. Candidates run the portable md5 variant-hash
    // family so the UNVERIFIED candidate count itself is
    // collision-faithfully replayable (the q_dedup_minhash_portable
    // discipline).
    "q_blocking_eval" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ck"),
        concat(col("c_name"), lit(" "),
          format_string("%08x",
            col("c_custkey").cast("long") * 2654435761L % 4294967296L))
          .as("nm"))
      val p = (col("ck") % 10 + 10).cast("int")
      val obs = c.select((col("ck") * 2).as("rid"), col("nm").as("obs"))
        .unionByName(c.filter(col("ck") % 2 === 0).select(
          (col("ck") * 2 + 1).as("rid"),
          concat(col("nm").substr(lit(1), p - 1),
            col("nm").substr(p + 1, length(col("nm")))).as("obs")))
      val truth = c.filter(col("ck") % 2 === 0).select(
        (col("ck") * 2).as("id1"), (col("ck") * 2 + 1).as("id2"))
      JoinOps.blockingEval(obs, "rid", "obs", truth,
        DedupOps.portableShingleHash)
    }),

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

    // Fellegi-Sunter probabilistic linkage: customer vs a deterministic
    // dirty copy (hash-corrupted segment for 1/5 of records, +1-dollar
    // balance jitter for 1/4). Blocking on (nation, thousand-dollar
    // bucket) is the candidate generator — never all-pairs; u-weights
    // from the dirty side's exact frequency moments; pair weights are
    // fixed-point log2 sums (no libm, no floats). q_entity_golden
    // resolves entities deterministically; this puts each candidate on
    // a calibrated log-odds scale instead of a similarity cliff.
    "q_fs_link" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("id"),
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val h = SamplingOps.portableAffine(col("id"))
      val dirty = base.select(col("id"), col("nation"),
        when(h % 5 === 0, lit("UNKNOWN")).otherwise(col("seg")).as("seg"),
        (col("cents") + when(h % 4 === 0, 100L).otherwise(0L)).as("cents"))
      // shift keeps the bucket math on nonnegative operands (toward-zero
      // vs floor division never differs)
      def prep(df: DataFrame) = df.select(col("id"), col("nation"),
        expr("(cents + 100000L) div 1000").as("blk"),
        col("seg"),
        expr("(cents + 100000L) div 100").as("bal"))
      graft.ops.LinkageOps.fsLink(prep(base), prep(dirty), "id", "id",
        blockCols = Seq("nation", "blk"), compareCols = Seq("seg", "bal"))
    }),

    // Pairwise precision/recall/F1 + Adjusted Rand Index of the SimHash
    // pigeonhole near-dup clustering against the exact 3-gram Jaccard
    // components — the approximate-detector-vs-reference grade where
    // cluster IDs are arbitrary but pair agreement is not. One
    // contingency aggregate; marginals as partitioned windows on the
    // cell frame; ARI in decimal-128.
    "q_cluster_eval" -> ((s, dir) => {
      // Both clusterings start from the same corpus tokenization (SimHash
      // explodes tokens; the Jaccard reference shingles the SAME token
      // arrays), so tokenize ONCE and cut lineage (guide §2.4 — share the
      // common subtree): one documents scan + one regex split feed both
      // legs instead of two of each. The truth leg reads the component
      // labels directly (the q_dedup_weights cluster-size join adds no
      // information to (doc_id, component) — every comp row matches its
      // size row exactly once — so it is dead work here).
      val toked = t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
        .cutLineage()
      val simPairs = DedupOps.simhashNearDupPairs(
        DedupOps.portableSimhashTokens(toked, "doc_id", col("__toks")),
        bits = 60, maxHamming = 5)
      val pred = GraphOps.componentsOf(toked, "doc_id", simPairs,
        "id_a", "id_b")
        .select(col("node").as("doc_id"), col("component").as("p"))
      val jacPairs = DedupOps.ngramJaccardPairsTokens(
        toked, "doc_id", col("__toks"), k = 3, threshold = 0.2)
      val truth = GraphOps.componentsOf(toked, "doc_id", jacPairs,
        "id_a", "id_b")
        .select(col("node").as("doc_id"), col("component").as("tg"))
      EstimatorOps.clusteringPairEval(
        pred.join(truth, "doc_id"), col("p"), col("tg"))
    }),
  )

  private val oracleSql0: Map[String, String] = Map(
    "q_dedup_minhash" ->
      minhashPortableOracle(32, 8, 4, verified = false),
    "q_dedup_minhash_verified" ->
      minhashPortableOracle(32, 8, 4, verified = true),
    "q_dedup_minhash_portable" ->
      minhashPortableOracle(16, 4, 4, verified = true),
    "q_dedup_simhash" -> simhashPortableOracle,
    "q_simhash_neardup" -> simhashNearDupOracle,

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

    // Full FS replay: the same dirty copy (affine hash corruption), the
    // exact second frequency moments, every log a lg-join over the
    // unrolled fixed-point log2, null-safe agreement, blocked join.
    "q_fs_link" ->
      s"""WITH base AS (
         |  SELECT CAST(c_custkey AS BIGINT) AS id,
         |    CAST(c_nationkey AS BIGINT) AS nation,
         |    c_mktsegment AS seg,
         |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
         |  FROM customer),
         |dirty AS (
         |  SELECT id, nation,
         |    CASE WHEN h % 5 = 0 THEN 'UNKNOWN' ELSE seg END AS seg,
         |    cents + CASE WHEN h % 4 = 0 THEN 100 ELSE 0 END AS cents
         |  FROM (SELECT *,
         |      (((id % 999999937) * 2654435761 + 104729) % 999999937) AS h
         |    FROM base)),
         |al AS (SELECT id AS a_id, nation, (cents + 100000) // 1000 AS blk,
         |    seg AS seg_a, (cents + 100000) // 100 AS bal_a FROM base),
         |bl AS (SELECT id AS b_id, nation, (cents + 100000) // 1000 AS blk,
         |    seg AS seg_b, (cents + 100000) // 100 AS bal_b FROM dirty),
         |mm AS (SELECT CAST((SELECT count(*) FROM bl) AS BIGINT) AS n,
         |    CAST((SELECT sum(c * c) FROM
         |      (SELECT count(*) AS c FROM bl GROUP BY seg_b)) AS BIGINT)
         |      AS ss_seg,
         |    CAST((SELECT sum(c * c) FROM
         |      (SELECT count(*) AS c FROM bl GROUP BY bal_b)) AS BIGINT)
         |      AS ss_bal),
         |vals AS (SELECT DISTINCT v FROM (
         |    SELECT 950000 * n * n AS v FROM mm
         |    UNION ALL SELECT 1000000 * ss_seg FROM mm
         |    UNION ALL SELECT 1000000 * ss_bal FROM mm
         |    UNION ALL SELECT 50000 * n * n FROM mm
         |    UNION ALL SELECT 1000000 * (n * n - ss_seg) FROM mm
         |    UNION ALL SELECT 1000000 * (n * n - ss_bal) FROM mm)
         |  WHERE v >= 1),
         |${QueryShared.log2FixedSql("vals")},
         |w AS (SELECT
         |    (SELECT lg FROM lg, mm WHERE lg.v = 950000 * mm.n * mm.n)
         |      - (SELECT lg FROM lg, mm WHERE lg.v = 1000000 * mm.ss_seg)
         |      AS wa_seg,
         |    CASE WHEN (SELECT ss_seg < n * n FROM mm) THEN
         |      (SELECT lg FROM lg, mm WHERE lg.v = 50000 * mm.n * mm.n)
         |        - (SELECT lg FROM lg, mm
         |           WHERE lg.v = 1000000 * (mm.n * mm.n - mm.ss_seg)) END
         |      AS wd_seg,
         |    (SELECT lg FROM lg, mm WHERE lg.v = 950000 * mm.n * mm.n)
         |      - (SELECT lg FROM lg, mm WHERE lg.v = 1000000 * mm.ss_bal)
         |      AS wa_bal,
         |    CASE WHEN (SELECT ss_bal < n * n FROM mm) THEN
         |      (SELECT lg FROM lg, mm WHERE lg.v = 50000 * mm.n * mm.n)
         |        - (SELECT lg FROM lg, mm
         |           WHERE lg.v = 1000000 * (mm.n * mm.n - mm.ss_bal)) END
         |      AS wd_bal)
         |SELECT a_id, b_id,
         |  CAST(seg_a IS NOT DISTINCT FROM seg_b AS INT) AS agree_seg,
         |  CAST(bal_a IS NOT DISTINCT FROM bal_b AS INT) AS agree_bal,
         |  CAST(CASE WHEN seg_a IS NOT DISTINCT FROM seg_b
         |         THEN wa_seg ELSE wd_seg END
         |    + CASE WHEN bal_a IS NOT DISTINCT FROM bal_b
         |         THEN wa_bal ELSE wd_bal END AS BIGINT) AS weight_fx
         |FROM al JOIN bl USING (nation, blk) CROSS JOIN w""".stripMargin,

    // The planted base+dirty feed, every self+deletion variant under
    // the portable md5 hash (collision-faithful), the same candidate
    // equi-join, exact ×10⁶ metric intdivs.
    "q_blocking_eval" ->
      s"""WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS ck,
         |    c_name || ' '
         |      || printf('%08x', (c_custkey * 2654435761) % 4294967296)
         |      AS nm
         |  FROM customer),
         |obs AS (
         |  SELECT ck * 2 AS rid, nm AS s FROM c
         |  UNION ALL
         |  SELECT ck * 2 + 1,
         |    substring(nm, 1, CAST(ck % 10 + 10 AS INT) - 1)
         |      || substring(nm, CAST(ck % 10 + 10 AS INT) + 1, length(nm))
         |  FROM c WHERE ck % 2 = 0),
         |vh AS (SELECT DISTINCT rid,
         |    CAST(('0x' || substring(md5(v), 1, 15)) AS BIGINT)
         |      % ${DedupOps.PortableHashPrime} AS h
         |  FROM (SELECT rid, unnest(list_prepend(s,
         |      list_transform(range(1, length(s) + 1),
         |        i -> substring(s, 1, i - 1)
         |          || substring(s, i + 1, length(s))))) AS v
         |    FROM obs) q),
         |cand AS (SELECT DISTINCT a.rid AS id1, b.rid AS id2
         |  FROM vh a JOIN vh b ON a.h = b.h AND a.rid < b.rid),
         |tp AS (SELECT ck * 2 AS id1, ck * 2 + 1 AS id2 FROM c
         |       WHERE ck % 2 = 0),
         |cm AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
         |    CAST(coalesce(sum(CASE WHEN tp.id1 IS NOT NULL THEN 1 END), 0)
         |      AS BIGINT) AS n_matched
         |  FROM cand LEFT JOIN tp
         |    ON cand.id1 = tp.id1 AND cand.id2 = tp.id2),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM tp),
         |nr AS (SELECT CAST(count(rid) AS BIGINT) AS n_rows FROM obs)
         |SELECT n_rows,
         |  CAST(n_rows * (n_rows - 1) // 2 AS BIGINT) AS total_pairs,
         |  n_cand, n_true, n_matched,
         |  CASE WHEN n_rows > 1 THEN CAST(1000000 - (1000000 * n_cand)
         |    // (n_rows * (n_rows - 1) // 2) AS BIGINT) END AS rr_micro,
         |  CASE WHEN n_true > 0 THEN
         |    CAST((1000000 * n_matched) // n_true AS BIGINT) END AS pc_micro,
         |  CASE WHEN n_cand > 0 THEN
         |    CAST((1000000 * n_matched) // n_cand AS BIGINT) END AS pq_micro
         |FROM cm CROSS JOIN nt CROSS JOIN nr""".stripMargin,

    // The dedupWeights (Jaccard truth) CTEs next to the naive-Hamming
    // SimHash pairs closed into min-label components (prediction);
    // marginals as partitioned windows on the cell frame, HUGEINT ARI
    // moments, the identical fixed closing chain.
    "q_cluster_eval" ->
      s"""WITH RECURSIVE $dedupWeightsCtes,
         |$simhashSigCtes,
         |ndp AS (SELECT a.doc_id AS u, b.doc_id AS v
         |        FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |        WHERE bit_count(xor(a.simhash, b.simhash)) <= 5),
         |edges2 AS (SELECT u, v FROM ndp UNION SELECT v, u FROM ndp),
         |reach2(n, r) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges2) t2
         |  UNION
         |  SELECT e.v, reach2.r FROM reach2 JOIN edges2 e ON e.u = reach2.n),
         |comp2 AS (SELECT n, min(r) AS component FROM reach2 GROUP BY n),
         |asg2 AS (SELECT d.doc_id,
         |    CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
         |  FROM documents d LEFT JOIN comp2 c ON d.doc_id = c.n),
         |pa AS (SELECT asg2.component AS p, asg.component AS t
         |       FROM asg2 JOIN asg USING (doc_id)),
         |cell AS (SELECT p, t, CAST(count(*) AS BIGINT) AS nij
         |         FROM pa GROUP BY p, t),
         |cw AS (SELECT nij,
         |    CAST(sum(nij) OVER (PARTITION BY p) AS BIGINT) AS ai,
         |    CAST(sum(nij) OVER (PARTITION BY t) AS BIGINT) AS bj
         |  FROM cell),
         |m AS (SELECT
         |    CAST(coalesce(sum(nij), 0) AS BIGINT) AS n,
         |    CAST(coalesce(sum(nij * (nij - 1)), 0) AS BIGINT) AS sij2,
         |    CAST(coalesce(sum(nij * (ai - 1)), 0) AS BIGINT) AS sa2,
         |    CAST(coalesce(sum(nij * (bj - 1)), 0) AS BIGINT) AS sb2
         |  FROM cw),
         |ff AS (SELECT *,
         |    CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) AS c2d FROM m),
         |gg AS (SELECT *,
         |    c2d * CAST(sij2 AS HUGEINT)
         |      - CAST(sa2 AS HUGEINT) * CAST(sb2 AS HUGEINT) AS arinum,
         |    c2d * CAST(sa2 + sb2 AS HUGEINT)
         |      - 2 * CAST(sa2 AS HUGEINT) * CAST(sb2 AS HUGEINT) AS ariden
         |  FROM ff)
         |SELECT n, CAST(sij2 // 2 AS BIGINT) AS pairs_both,
         |  CAST(sa2 // 2 AS BIGINT) AS pairs_pred,
         |  CAST(sb2 // 2 AS BIGINT) AS pairs_true,
         |  CASE WHEN sa2 > 0
         |    THEN CAST((1000000 * sij2) // sa2 AS BIGINT) END
         |    AS precision_micro,
         |  CASE WHEN sb2 > 0
         |    THEN CAST((1000000 * sij2) // sb2 AS BIGINT) END
         |    AS recall_micro,
         |  CASE WHEN sa2 + sb2 > 0
         |    THEN CAST((2000000 * sij2) // (sa2 + sb2) AS BIGINT) END
         |    AS f1_micro,
         |  CASE WHEN ariden > 0 THEN ${dlit(2.0)} * CAST(arinum AS DOUBLE)
         |    / CAST(ariden AS DOUBLE) END AS ari
         |FROM gg""".stripMargin,
  )

  // The artifact-riding variants compute bit-identical results to their
  // from-scratch twins, so the oracle SQL is shared verbatim; the
  // refresh lifecycle itself gates against the whole-corpus components.
  val oracleSql: Map[String, String] = oracleSql0 ++ Map(
    "q_components_refresh" ->
      s"""WITH RECURSIVE $dedupWeightsCtes
         |SELECT doc_id, component FROM asg""".stripMargin,
    "q_dedup_weights_artifact" -> oracleSql0("q_dedup_weights"),
    "q_ess_weights_artifact" -> oracleSql0("q_ess_weights"),
    "q_dedup_apply_artifact" -> oracleSql0("q_dedup_apply"),
    "q_group_kfold_artifact" -> oracleSql0("q_group_kfold"))
}
