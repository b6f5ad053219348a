package graft

/** Catalog-wide physical-plan audit: every registered query's plan is
  * scanned for the two operators that do not survive a 100× scale-up —
  * CartesianProduct and BroadcastNestedLoopJoin — so a regression that
  * slips a cross product into ANY query fails the suite loudly, not just
  * the handful of queries with individual pins in QueryPlanSpec.
  *
  * Queries on the allowlist use the operator DELIBERATELY, each for a
  * reason reviewed in its Scaladoc: a broadcast brute-force baseline
  * whose gated scale path is a separate query, a 1-row scalar attach
  * (BNLJ over a single aggregate row is a broadcast of one row), or a
  * bounded query-set cross. The allowlist is exact — an addition that
  * needs the operator must be added HERE with its justification.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** query -> why a cartesian/BNLJ is the intended plan there. */
  private val allowed: Map[String, String] = Map(
    "q_embed_neardup" -> "broadcast brute-force baseline; scale path is q_embed_neardup_lsh",
    "q_sim_topk" -> "broadcast query set x corpus is the stated brute baseline; scale paths q_sim_lsh_topk / q_sim_ivf_topk",
    "q_knn_classify" -> "broadcast support set is the kNN contract (support fits memory by definition)",
    "q_sim_ivf_pq" -> "bounded probe-set cross, PQ-coded lists",
    "q_ivf_recall" -> "recall gate compares the bounded probe set against both paths",
    "q_pagerank_dangling" -> "1-row dangling-mass scalar attach per round",
    "q_mixture_plan" -> "1-row weight-total attach to the sources frame",
    "q_token_mixture" -> "1-row weight-total attach to the sources frame (same shape as q_mixture_plan)",
    "q_neg_samples" -> "1-row domain-bounds attach before the row-local affine draw",
    "q_decontaminate" -> "benchmark shingle set is broadcast by contract",
    "q_retrieval_serve" -> "bounded query set crossed with pruned index lists",
    "q_hybrid_rrf" -> "bounded query set; both legs end in per-task top-k heaps",
    "q_ann_recall" -> "recall gate crosses the bounded query set with both ANN paths",
    "q_matryoshka_recall" -> "recall gate crosses the bounded query set at both dims (brute baseline x2)",
    "q_ndcg" -> "two 1-row eval frames (DCG, n_rel) cross at the end; ranking legs are heap-bounded",
    "q_erasure" -> "per-table audit legs cross three 1-row count frames; the erases themselves are keyed anti joins",
    "q_bm25_search" -> "1-row corpus-stats attach (N, avgdl) before row-local scoring",
    "q_rm3_expand" -> "the q_bm25_search 1-row stats attach, twice (orig scoring + feedback scoring); expansion terms/weights join KEYED on token",
    "q_kneser_ney" -> "1-row N1+(..) total attach to the distinct-bigram frame",
    "q_isotonic_fit" -> "PAV minimax self-joins over the <=11-row bin frame (bounded metadata cross by construction)",
    "q_assortativity" -> "1-row node-count attach to the 1-row moments frame",
    "q_sim_pq_literal" -> "bounded probe set crossed with literal PQ codebooks",
    "q_tpch_q11" -> "1-row scalar threshold (sum x fraction) attach — canonical Q11 shape",
    "q_tpch_q22" -> "1-row scalar average attach; the anti join probes by key (pinned in QueryPlanSpec)",
    "q_bloom_index" -> "1-row n_parts_total attach; the index/probe joins themselves are plan-time broadcasts (pinned in QueryPlanSpec)",
    "q_kmv_join_card" -> "the whole point: two 1-row k-long sketches cross (plus the 1-row exact-legs frame for the gate's comparison)",
    "q_assoc_rules" -> "1-row n_baskets attach to the vocabulary-sized rule frame",
    "q_bitext_mine" -> "broadcast source (query) side x target corpus — the stated mining shape; ANN candidates bound the frame at scale",
    "q_hits" -> "1-row max-normalizer attach per round (the pagerank dangling-share shape)",
    "q_maxsim_topk" -> "broadcast query vectors x corpus vectors — the ColBERT serving shape; ANN bounds candidates at scale",
    "q_hard_negatives" -> "broadcast query set x corpus with the class test as the residual — the q_sim_topk brute shape; ANN swaps in as the candidate generator at scale",
    "q_two_stage_rerank" -> "stage 1 is the q_sim_topk broadcast front scan (16-dim); stage 2 is candidate-bounded joins — the funnel serving shape",
    "q_source_kl" -> "1-row grand-total attach to the vocabulary-sized (source, token) frame",
    "q_hll_estimate" -> "the 1-row exact-distinct eval frame crosses the 1-row register-summary frame (q_kmv_join_card gate shape)",
    "q_hll_sources" -> "1-row sketch-summary frame crosses the 1-row exact-counts frame (q_hll_estimate shape)",
    "q_nb_classify" -> "classes x range(64) cross builds the DENSE bucket-count model grid (bounded by construction: buckets x classes, never corpus-sized); scoring joins it by bucket as a broadcast",
    "q_pmi_collocations" -> "1-row total-bigram-count attach to the vocab-bounded pair frame (the q_bm25_search N/avgdl shape)",
    "q_permutation_test" -> "1-row observed-difference attach to the reps-sized replicate frame (the q_kmv_join_card gate shape)",
    "q_vocab_coverage" -> "1-row occurrence-total attach to the k-row top frame (q_bm25_search shape); the round-9 rewrite cut the full-vocab SinglePartition rank window to a per-task heap",
    "q_js_divergence" -> "1-row token-totals attach to the vocabulary-sized count frame (the q_source_kl shape)",
    "q_fs_link" -> "1-row m/u-weight attach to the blocked pair stream; the candidate generator is the blocking equi-join",
    "q_burstiness" -> "1-row doc-count attach to the k-row top frame (q_vocab_coverage shape)",
    "q_keyness" -> "1-row token-totals attach to the vocabulary-sized count frame (the q_source_kl shape)",
    "q_blocking_eval" -> "three 1-row eval frames (candidate/matched, truth count, row count) cross at the end — the q_erasure audit shape; the candidate generator itself is the variant-key equi-join",
    "q_rbo" -> "the q_bm25_search 1-row corpus-stats attach (N, avgdl) inside ranking A; the RBO fold itself is a keyed join of two k-row frames")

  test("no unlisted query plans a CartesianProduct or BroadcastNestedLoopJoin") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val stale = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan.toString
      val hasCross = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (hasCross && !allowed.contains(name)) offenders += name
      if (!hasCross && allowed.contains(name)) stale += name
    }
    assert(offenders.isEmpty,
      s"unreviewed cross/nested-loop joins in: ${offenders.mkString(", ")} — " +
        "either fix the plan or allowlist it here with a justification")
    assert(stale.isEmpty,
      s"allowlist rows no longer needed (plan improved — delete them): " +
        stale.mkString(", "))
  }
}
