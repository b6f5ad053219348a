package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword relevance search over a document corpus: BM25-shaped scoring
  * with a RATIONAL idf (`(N - df + 0.5) / (df + 0.5)`, no logarithm).
  *
  * Why no `ln`: the ranking behavior (rare terms weigh more, tf saturates
  * at k1, long docs are penalized via b) is preserved, and every operation
  * is IEEE-exactly-rounded (+,-,*,/ only) — so the score is bit-identical
  * across engines and libm versions. `ln`-based idf differs in the last
  * ulp between libms, which silently flips near-tie ranks between a
  * cluster and a laptop; at 100 TB reproducibility wins over textbook
  * constants. Defaults k1 = 1.25, b = 0.75 are exact binary fractions so
  * `k1 + 1` and `1 - b` are themselves exact on every engine.
  *
  * Scale shape (two passes over the corpus, zero wide shuffles):
  *  1. one ReduceAggregate → a SINGLE stats row (N, Σdl, per-term df) —
  *     partial aggregation means the "shuffle" is one row per task;
  *  2. broadcast that row back (1-row cross join), score each doc
  *     row-locally inside whole-stage codegen, and take the global top-k
  *     via TakeOrderedAndProject (per-task k-row heaps, never a full sort).
  * In production the stats row is computed once per corpus snapshot and
  * reused across queries.
  */
object SearchOps {

  /** Occurrences of the literal `term` in a token array. Row-local, and
    * deliberately NOT `size(filter(toks, _ === term))`: higher-order
    * lambdas run interpreted per element, while `array_remove` is a
    * codegen'd expression — the whole tf computation stays inside
    * whole-stage codegen on the corpus scan.
    */
  def termTf(toks: Column, term: String): Column =
    size(toks) - size(array_remove(toks, term))

  /** Top-k documents for `terms` by rational-idf BM25.
    * Output: (doc_id, score), score descending, doc_id ascending on ties.
    */
  /** Rational-idf BM25 score of `terms` for EVERY document — the
    * scoring half of [[bm25TopK]], exposed for consumers that rerank or
    * mix rather than cut (RM3, hybrid fusion). One corpus pass + a
    * 1-row stats broadcast; the per-doc score is a fixed left-assoc
    * chain over exact counts, so it is engine-identical.
    * Output: (doc_id, score) for all docs (zero-match docs score 0).
    */
  def bm25Scores(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      terms: Seq[String],
      k1: Double = 1.25,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val tfCols = terms.indices.map(i => s"__tf$i")
    val base = docs
      .select(idCol.as("doc_id"), TextOps.tokens(lower(textCol)).as("__toks"))
      .select(
        col("doc_id") +: size(col("__toks")).cast("double").as("__dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            termTf(col("__toks"), t).cast("double").as(tfCols(i))
          }: _*)
    val statCols =
      count(lit(1)).cast("double").as("__n") +:
        sum(col("__dl")).as("__sumdl") +: // integral doubles: exact, order-proof
        terms.indices.map(i =>
          sum((col(tfCols(i)) > 0).cast("long")).cast("double").as(s"__df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("__sumdl") / col("__n")
    val score = terms.indices.map { i =>
      val tf = col(tfCols(i))
      val df = col(s"__df$i")
      val idf = (col("__n") - df + lit(0.5)) / (df + lit(0.5))
      idf * (tf * lit(k1 + 1)) / (tf + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / avgdl))
    }.reduce(_ + _) // fixed left-assoc order: same sum on every engine
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
  }

  def bm25TopK(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.25,
      b: Double = 0.75): DataFrame =
    bm25Scores(docs, idCol, textCol, terms, k1, b)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** RM3-style pseudo-relevance-feedback query expansion, fully
    * join-based (NO driver collect — the expansion terms stay a frame):
    *
    *   1. feedback docs = [[bm25TopK]] top `fbDocs` for the literal
    *      query terms;
    *   2. expansion terms = top `fbTerms` feedback-corpus tokens by
    *      occurrence count (len ≥ 3, query terms excluded; ties break
    *      on the token) — a feedback-bounded frame;
    *   3. each term's RM3 weight is its exact ×10⁶ share of the
    *      selected feedback mass (`tf·10⁶ DIV Σtf` — nonneg intdiv);
    *   4. final score = floor(orig_bm25·10⁶) + Σ occurrences' weights —
    *      BOTH exact longs (the bm25 double is a fixed engine-identical
    *      chain, its floor exact; the expansion side never leaves the
    *      integer grid, so the cross-term sum is order-proof).
    *
    * Scale shape: two corpus passes (scoring + the token explode); the
    * feedback doc list, term list, and weights are all ≤fbDocs/fbTerms
    * rows and BROADCAST onto the explode — no row shuffle beyond the
    * per-doc aggregates. At 100 TB the explode rides the (amortized)
    * postings table instead of re-tokenizing.
    *
    * Output: top `k` by (final_micro desc, doc_id):
    * `(doc_id, orig_micro, exp_micro, final_micro)`.
    */
  def rm3Expand(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      terms: Seq[String],
      fbDocs: Int = 10,
      fbTerms: Int = 5,
      k: Int = 20): DataFrame = {
    require(fbDocs > 0 && fbTerms > 0 && k > 0, "rm3 sizes must be positive")
    val fb = bm25TopK(docs, idCol, textCol, terms, fbDocs)
      .select(col("doc_id"))
    val toks = docs.select(idCol.as("doc_id"),
      explode(TextOps.tokens(lower(textCol))).as("tk"))
    val fbTf = toks.join(broadcast(fb), "doc_id")
      .filter(length(col("tk")) >= 3 && !col("tk").isInCollection(terms))
      .groupBy(col("tk")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tk")).limit(fbTerms)
    val wt = fbTf
      .withColumn("tot", sum(col("tf")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("tk"), expr("tf * 1000000 DIV tot").as("w_micro"))
    val expScore = toks.join(broadcast(wt), "tk")
      .groupBy(col("doc_id")).agg(sum(col("w_micro")).as("exp_micro"))
    val orig = bm25Scores(docs, idCol, textCol, terms)
      .select(col("doc_id"),
        floor(col("score") * lit(1000000.0)).cast("long").as("orig_micro"))
    orig.join(expScore, Seq("doc_id"), "left")
      .select(col("doc_id"), col("orig_micro"),
        coalesce(col("exp_micro"), lit(0L)).as("exp_micro"))
      .withColumn("final_micro", col("orig_micro") + col("exp_micro"))
      .filter(col("final_micro") > 0L)
      .orderBy(col("final_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Positional postings: one `(doc_id, pos, token)` row per token
    * occurrence — the inverted-index layout phrase and proximity queries
    * run against. ONE corpus explode; at 100 TB this table is built once
    * (partitioned/bucketed by token) and amortized over every query.
    */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(TextOps.tokens(lower(col(textCol)))).as(Seq("pos", "token")))

  /** Exact-phrase search over positional postings — the classic
    * inverted-index phrase query: term i of the phrase must appear at
    * `pos = anchor + i`, so the phrase is an m-way equi-join on
    * `(doc_id, pos - i)` with each leg pre-filtered to ONE token's
    * postings. Candidate volume after leg i is bounded by the rarest
    * prefix term's df — the planner (or a df-ordered rewrite) never
    * touches documents missing any term; a `contains()` scan would read
    * every byte of every document instead. Returns one row per
    * occurrence: `(doc_id, pos)` = the phrase's anchor position.
    */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val legs = phrase.zipWithIndex.map { case (term, i) =>
      postings.filter(col("token") === lit(term))
        .select(col("doc_id"), (col("pos") - i).as("anchor"))
    }
    legs.reduce(_.join(_, Seq("doc_id", "anchor")))
      .select(col("doc_id"), col("anchor").cast("long").as("pos"))
  }

  /** Per-depth contribution suffix sums for [[rboMin]] — the ×10⁶
    * pre-rounded literal table (the q_ndcg gain-table discipline:
    * computed ONCE here, shared verbatim by plan and oracle so both
    * engines sum the identical integers). `suffix(d) = Σ_{e=d..k}
    * (1−p)·p^{e−1}/e` — an item present in both rankings with worse
    * position d contributes exactly this to RBO_min.
    */
  def rboSuffixMicro(k: Int, p: Double): Seq[Long] =
    (1 to k).map(d => math.round(1e6 *
      (d to k).map(e => (1 - p) * math.pow(p, e - 1) / e).sum))

  /** Rank-biased overlap, lower bound (Webber et al. TOIS 2010) between
    * two top-k rankings — "how much do these two rankers agree?",
    * top-weighted and defined WITHOUT relevance labels (the ranker-drift
    * readout next to the labeled MRR/MAP/nDCG family; swap a scorer and
    * read one number). RBO_min telescopes per shared item: an item at
    * positions (pa, pb) contributes the [[rboSuffixMicro]] literal at
    * depth `max(pa, pb)`, so the whole metric is ONE keyed join of two
    * k-row frames plus an exact integer sum — no per-depth set
    * intersection materializes.
    *
    * Inputs are k-row frames with columns `(id, pos)`, pos 1-based
    * dense (the caller's heap-bounded ranking — the
    * [[graft.ops.TextOps.vocabCoverage]] discipline keeps building them
    * sort-free).
    *
    * Output (1 row): `(k, n_common, rbo_min_micro)`.
    */
  def rboMin(rankA: DataFrame, rankB: DataFrame, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 1024, s"bad k: $k")
    require(p > 0 && p < 1, s"bad p: $p")
    val suffix = rboSuffixMicro(k, p)
    val a = rankA.select(col("id"), col("pos").cast("long").as("pa"))
    val b = rankB.select(col("id"), col("pos").cast("long").as("pb"))
    val weights = array(suffix.map(lit): _*)
    a.join(b, "id")
      .select(element_at(weights,
        greatest(col("pa"), col("pb")).cast("int")).as("w"))
      .agg(
        count(lit(1)).as("n_common"),
        coalesce(sum(col("w")), lit(0L)).as("rbo_min_micro"))
      .select(lit(k.toLong).as("k"), col("n_common"),
        col("rbo_min_micro"))
  }
}
