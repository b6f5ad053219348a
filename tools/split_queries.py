#!/usr/bin/env python3
"""One-shot mechanical splitter for queries/PipelineQueries.scala (round 9):
10k lines -> QueryShared.scala (helpers + oracle builders) + 9 domain files,
with PipelineQueries reduced to the assembled catalog maps. Behavior-neutral:
entry text is moved verbatim; the assembled keySets are asserted unchanged.
Dev tool only — not part of the Scala library."""
import re
import sys
from pathlib import Path

SRC = Path("src/main/scala/graft/queries/PipelineQueries.scala")
OUT = SRC.parent

DOMAINS = {
    "text": "TextQueries", "dedup": "DedupQueries", "sim": "SimQueries",
    "lake": "LakeQueries", "cur": "CurationQueries", "stream": "StreamQueries",
    "graph": "GraphQueries", "stats": "StatsQueries", "rel": "RelationalQueries",
}
DOC = {
    "text": "Text analysis: language id, quality scoring, tokenization, BPE, vocab/LM statistics.",
    "dedup": "Deduplication: exact/ngram/minhash/simhash/spans/CDC, cluster weights, entity resolution.",
    "sim": "Embedding similarity and ANN (IVF/PQ/LSH/k-means), plus multimodal/audio payload ops.",
    "lake": "Lake layout and serving: bucketing, z-order, indexes, sketches, CDC apply, erasure.",
    "cur": "Corpus curation: sampling, mixture planning, selection scores, privacy, data quality.",
    "stream": "Event streams and time: windows, sessions, as-of/interval joins, drift and anomaly.",
    "graph": "Graph analytics: pagerank/HITS/PPR, k-core, triangles, communities, link prediction.",
    "stats": "Statistics and evaluation: experiment tests, rank stats, estimators, small models.",
    "rel": "Relational coverage: the TPC-H suite plus pivot/rollup/window/set-op surfaces.",
}

EXPLICIT = {
    # text
    **{n: "text" for n in """q_lang_confusion q_fertility q_pii_redact q_repetition
        q_lm_score q_quality_classifier q_token_entropy q_chunk_tokens q_pack_sequences
        q_corpus_clean q_corpus_stats q_top_terms q_oov_rate q_zipf_fit q_good_turing
        q_pmi_collocations q_entropy_rate q_dict_tag q_phrase_search q_bm25_search
        q_gopher_rules q_quality_filter""".split()},
    # dedup
    **{n: "dedup" for n in """q_dup_rate q_shingle_df_hist q_text_fingerprint q_line_dedup
        q_simhash_neardup q_winnowing q_winnow_pairs q_cdc_chunks q_cdc_dedup q_ess_weights
        q_novelty q_group_kfold q_fuzzy_join q_entity_golden q_dup_spans q_dup_span_stats""".split()},
    # sim
    **{n: "sim" for n in """q_knn_classify q_ann_recall q_matryoshka_recall q_maxsim_topk
        q_bitext_mine q_hard_negatives q_two_stage_rerank q_mmr_rerank q_hybrid_rrf
        q_coreset_sample q_pca_project q_semdedup q_semdedup_literal q_semdedup_lattice
        q_audio_features q_audio_dup q_audio_neardup q_media_phash q_media_neardup
        q_multimodal_features q_multimodal_frames""".split()},
    # lake
    **{n: "lake" for n in """q_bucket_join q_zone_map q_bloom_index q_partition_hash
        q_rendezvous_shard q_zorder q_hilbert_layout q_merge_upsert q_cdc_view q_scd2
        q_compaction_plan q_erasure q_incr_agg q_dataset_diff q_salted_join q_bloom_anti
        q_cms_freq q_heavy_hitters q_skew_report""".split()},
    # curation
    **{n: "cur" for n in """q_split_train_val q_train_order q_curriculum q_mixture_plan
        q_mixture_resample q_token_mixture q_budget_select q_dsir_score q_source_kl
        q_source_overlap q_source_hhi q_decontaminate q_pareto_frontier q_corpus_curate
        q_curate_report q_profile q_benford q_score_calibrate q_k_anonymity q_dp_counts
        q_randomized_response q_target_encode q_winsorize q_mad_outliers q_standardize
        q_judge_agreement q_fleiss_kappa q_loo_source q_neg_samples q_qnorm
        q_drift_buckets""".split()},
    # stream
    **{n: "stream" for n in """q_late_data q_sessionize q_session_window q_time_weighted_avg
        q_collapse_bursts q_seq_windows q_transition_matrix q_rolling_dau q_funnel
        q_cohort_retention q_anomaly_ewma q_forecast_backtest q_cusum_shift q_asof_join
        q_asof_native q_pit_join q_clicks_before_errors q_stream_join q_range_join
        q_range_join_sql q_interval_join q_impute_locf q_events_json q_attribution
        q_attribution_multi""".split()},
    # graph
    **{n: "graph" for n in """q_cooccurrence q_assoc_rules q_communities q_modularity
        q_link_predict q_triangles q_kcore q_hits q_ppr""".split()},
    # stats
    **{n: "stats" for n in """q_ab_test q_srm q_cuped q_chisq q_gini q_correlation
        q_bootstrap_ci q_conformal q_mrr q_map_eval q_ndcg q_ols_trend q_theilsen
        q_nb_classify q_bt_ratings q_mann_whitney q_ks_test q_auc q_permutation_test
        q_stratified_effect q_equidepth q_quantiles q_approx_quantiles q_approx_distinct
        q_count_distinct q_bitmap_distinct""".split()},
    # relational
    **{n: "rel" for n in """q_topk_orders q_rollup q_cube q_grouping_sets q_pivot q_unpivot
        q_window_funcs q_window_running q_moving_avg q_complex_types q_set_ops""".split()},
}
PREFIX = [
    ("q_text_", "text"), ("q_bpe_", "text"), ("q_vocab_", "text"),
    ("q_dedup_", "dedup"), ("q_kmeans_lattice", "sim"), ("q_sim_", "sim"),
    ("q_embed_", "sim"), ("q_events_", "stream"), ("q_tpch_", "rel"),
    ("q_pagerank", "graph"), ("q_shortest_", "graph"), ("q_sample_", "cur"),
    ("q_dq_", "cur"), ("q_lake_", "lake"), ("q_index_", "lake"),
    ("q_kmv_", "lake"), ("q_hll_", "stats"),
]


def classify(name):
    if name in EXPLICIT:
        return EXPLICIT[name]
    for p, d in PREFIX:
        if name.startswith(p):
            return d
    raise SystemExit(f"unclassified query: {name}")


def close_of(lines, start):
    for i in range(start + 1, len(lines)):
        if lines[i] == "  )":
            return i
    raise SystemExit("no map close found")


def split_entries(lines, mstart, mend):
    """Return (name, block_lines) per entry; comments attach forward."""
    starts = [i for i in range(mstart + 1, mend)
              if re.match(r'    "(\w+)" ->', lines[i])]
    blocks = []
    for k, s in enumerate(starts):
        b = s
        while b - 1 > mstart and (lines[b - 1].lstrip().startswith("//")
                                  or lines[b - 1].strip() == ""):
            b -= 1
        blocks.append((re.match(r'    "(\w+)" ->', lines[s]).group(1), b, s))
    out = []
    for k, (name, b, _s) in enumerate(blocks):
        end = blocks[k + 1][1] if k + 1 < len(blocks) else mend
        chunk = [l for l in lines[b:end]]
        while chunk and chunk[-1].strip() == "":
            chunk.pop()
        if not chunk[-1].rstrip().endswith(","):
            chunk[-1] = chunk[-1].rstrip() + ","
        out.append((name, chunk))
    return out


def main():
    lines = SRC.read_text().split("\n")
    qstart = next(i for i, l in enumerate(lines) if l.startswith("  val queries:"))
    qend = close_of(lines, qstart)
    ostart = next(i for i, l in enumerate(lines)
                  if l.startswith("  private val staticOracleSql:"))
    oend = close_of(lines, ostart)
    objline = next(i for i, l in enumerate(lines)
                   if l.startswith("object PipelineQueries {"))
    preamble = lines[: next(i for i, l in enumerate(lines) if l.startswith("/**"))]
    head_helpers = lines[objline + 1: qstart]
    # trim blank tail/lead
    while head_helpers and head_helpers[-1].strip() == "":
        head_helpers.pop()

    # mid region between the two maps: pull out `def oracleSql` (stays),
    # everything else goes to QueryShared
    mid = lines[qend + 1: ostart]
    dstart = next(i for i, l in enumerate(mid)
                  if l.startswith("  def oracleSql: Map[String, String]"))
    b = dstart
    while b - 1 >= 0 and (mid[b - 1].lstrip().startswith(("*", "/**", "*/"))
                          or mid[b - 1].strip() == ""):
        b -= 1
    e = next(i for i in range(dstart + 1, len(mid))
             if re.match(r"^  (/\*\*|private|def |val |lazy )", mid[i]))
    oracle_def = mid[b:e]
    mid_helpers = mid[:b] + mid[e:]

    qentries = split_entries(lines, qstart, qend)
    oentries = split_entries(lines, ostart, oend)
    assert [n for n, _ in qentries] and [n for n, _ in oentries]
    tail = lines[oend + 1:]
    assert [l for l in tail if l.strip()] == ["}"], tail

    def strip_private(ls):
        return [re.sub(r"^  private (lazy val|def|val|object|var) ", r"  \1 ", l)
                for l in ls]

    imports = "\n".join(preamble).rstrip() + "\n"

    shared = (
        imports + "\n"
        + "/** Shared fixtures, memoized frames, and oracle-SQL builders used by\n"
        + "  * the domain query catalogs (mechanically extracted from the former\n"
        + "  * 10k-line PipelineQueries in round 9 — entry text moved verbatim,\n"
        + "  * behavior unchanged).\n  */\n"
        + "private[queries] object QueryShared {\n"
        + "\n".join(strip_private(head_helpers + mid_helpers)).rstrip() + "\n}\n")
    (OUT / "QueryShared.scala").write_text(shared)

    for d, obj in DOMAINS.items():
        qs = [c for n, c in qentries if classify(n) == d]
        os_ = [c for n, c in oentries if classify(n) == d]
        body = (
            imports + "\nimport QueryShared._\n\n"
            + f"/** {DOC[d]}\n  *\n"
            + "  * Domain slice of the gated catalog (split out of PipelineQueries\n"
            + "  * in round 9); assembled and exposed by [[PipelineQueries]].\n  */\n"
            + f"private[queries] object {obj} {{\n\n"
            + "  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(\n"
            + "\n".join("\n".join(c) for c in qs)
            + "\n  )\n\n"
            + "  val oracleSql: Map[String, String] = Map(\n"
            + "\n".join("\n".join(c) for c in os_)
            + "\n  )\n}\n")
        (OUT / f"{obj}.scala").write_text(body)

    order = list(DOMAINS.values())
    assembled_q = " ++\n      ".join(f"{o}.queries" for o in order)
    assembled_o = " ++\n      ".join(f"{o}.oracleSql" for o in order)
    pq = (
        imports + "\nimport QueryShared._\n\n"
        + "/** Training-data pipeline operators (dedup, similarity search,\n"
        + "  * multimodal, text analysis, event streams) as driver-checkable\n"
        + "  * queries — the assembled catalog. The entries live in the domain\n"
        + "  * files (TextQueries, DedupQueries, ...); shared fixtures and\n"
        + "  * oracle builders in [[QueryShared]].\n  */\n"
        + "object PipelineQueries {\n\n"
        + "  val queries: Map[String, (SparkSession, String) => DataFrame] =\n"
        + f"    {assembled_q}\n\n"
        + "\n".join(oracle_def) + "\n\n"
        + "  private val staticOracleSql: Map[String, String] =\n"
        + f"    {assembled_o}\n"
        + "}\n")
    SRC.write_text(pq)
    print("wrote", len(DOMAINS) + 2, "files;",
          len(qentries), "query entries,", len(oentries), "oracle entries")
    for d, obj in DOMAINS.items():
        nq = sum(1 for n, _ in qentries if classify(n) == d)
        no = sum(1 for n, _ in oentries if classify(n) == d)
        nl = len((OUT / f"{obj}.scala").read_text().split("\n"))
        print(f"  {obj:22s} {nq:4d} queries {no:4d} oracles {nl:6d} lines")


if __name__ == "__main__":
    sys.exit(main())
