package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language identification
  * (stopword-hit heuristic) and document fingerprinting (rolling hash).
  *
  * All pure `Column` compositions (codegen'd, no UDFs) — they run inside
  * whole-stage codegen and scale to any partition count with zero shuffles;
  * each is row-local.
  */
object TextOps {

  /** Whitespace tokens, empty tokens dropped (so leading/trailing/double
    * whitespace never yields phantom tokens).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Character array of a string (empty-string artifacts of `split("")`
    * dropped). Shared by the BPE symbol initialization paths.
    */
  def chars(text: Column): Column =
    filter(split(text, ""), c => length(c) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Syllable proxy: vowel-GROUP count over the lowercased text (each
    * maximal `[aeiou]+` run ≈ one syllable nucleus — the standard cheap
    * estimator). Counted portably as the length delta between
    * collapsing runs to one char and deleting them — no dialect-
    * divergent regex counting construct. Row-local, codegen'd.
    */
  def vowelGroups(text: Column): Column =
    (length(regexp_replace(lower(text), "[aeiou]+", "#")) -
      length(regexp_replace(lower(text), "[aeiou]+", ""))).cast("long")

  /** Sentence-terminator runs (`[.!?]+` counted like [[vowelGroups]]) —
    * "..." and "?!" end ONE sentence. Row-local, codegen'd.
    */
  def sentenceCount(text: Column): Column =
    (length(regexp_replace(text, "[.!?]+", "#")) -
      length(regexp_replace(text, "[.!?]+", ""))).cast("long")

  /** Flesch reading ease + Flesch–Kincaid grade per document — the
    * readability gate a curation pipeline uses alongside
    * [[qualityScore]] (quality says "is it text", readability says "for
    * whom"). Inputs are the three exact counts (words = whitespace
    * tokens, sentences = terminator runs clamped to ≥1 so headless text
    * is one sentence, syllables = [[vowelGroups]]); both scores close
    * as fixed IEEE chains over the exact longs with the published
    * literal coefficients, so they replay bit-for-bit. Zero-word docs
    * yield NULL scores. Row-local end to end — at 100 TB this is its
    * own scan, nothing else.
    *
    * Output: `(id, n_words, n_sentences, n_syllables, flesch, fk_grade)`.
    */
  def readability(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val out = docs.select(idCol.as("id"),
      tokenCount(textCol).cast("long").as("n_words"),
      greatest(sentenceCount(textCol), lit(1L)).as("n_sentences"),
      vowelGroups(textCol).as("n_syllables"))
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    out.select(col("id"), col("n_words"), col("n_sentences"),
      col("n_syllables"),
      when(col("n_words") > 0L,
        lit(206.835) - lit(1.015) * wps - lit(84.6) * spw).as("flesch"),
      when(col("n_words") > 0L,
        lit(0.39) * wps + lit(11.8) * spw - lit(15.59)).as("fk_grade"))
  }

  /** Canonical text normalization (the pre-dedup/pre-tokenize cleanup
    * pass): lowercase, strip every character outside [a-z0-9] and
    * whitespace, collapse whitespace runs to single spaces, trim. Pure
    * row-local regexp chain (codegen'd, zero shuffles at any scale); the
    * two character classes avoid dialect-divergent regex constructs so
    * the DuckDB oracle is the same chain with the 'g' flag.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""),
      "\\s+", " "))

  /** Dictionary tagging — weak labeling against a broadcast-literal
    * entity lexicon (the NER-lite every curation pipeline runs: product
    * names, site names, topic keywords). Matching is word-boundary exact
    * on the normalized text: entity "new york" matches "...in New York!"
    * but not "newyorker" — implemented as a space-delimited contains
    * over ' '+norm+' ', one codegen'd scan per entity, all ROW-LOCAL
    * (zero shuffles; at 100 TB this is its scan, like [[normalizeText]]).
    * Multi-token entities must be pre-normalized by the caller (lowercase
    * alnum + single spaces) — enforced.
    *
    * Output: one (doc_id, entity) row per matched entity (docs with no
    * match emit nothing).
    */
  def dictionaryTag(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      entities: Seq[String]): DataFrame = {
    require(entities.nonEmpty, "empty entity lexicon")
    entities.foreach { e =>
      require(e.nonEmpty && e == e.toLowerCase.replaceAll("[^a-z0-9\\s]", "")
        .replaceAll("\\s+", " ").trim,
        s"entity '$e' must be normalized (lowercase alnum, single spaces)")
    }
    val padded = concat(lit(" "), normalizeText(col(textCol)), lit(" "))
    val matched = array(entities.map(e =>
      when(padded.contains(s" $e "), lit(e))): _*)
    docs.select(col(idCol).as("doc_id"),
        explode(filter(matched, _.isNotNull)).as("entity"))
  }

  /** Characters (code points) that are neither ASCII-alphanumeric nor
    * whitespace. Codegen'd byte walk ([[graft.expr.PunctCount]]) — the
    * `length - length(regexp_replace(...))` spec form materializes a
    * replaced copy of every document (46x slower measured; it remains the
    * DuckDB oracle formulation and the parity pin in TextOpsSpec).
    */
  def punctCount(text: Column): Column =
    graft.expr.TextExprs.punctCount(text)

  /** BPE-ish subword count estimate: alphanumeric runs contribute
    * ceil(len/4) pieces (≈ 4 chars/token), every other non-space char is one
    * piece. A cheap, deterministic stand-in for a real tokenizer's count.
    */
  def tokenEstimate(text: Column): Column =
    graft.expr.TokenExprs.subwordEstimate(tokens(text))

  /** Stopword-hit count: how many tokens (lowercased) are in `words`.
    * Codegen'd hash-set loop ([[graft.expr.TokenSetHits]]) — the
    * `filter` + `array_contains` HOF form evaluated interpreted per token
    * per language list.
    */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    graft.expr.TokenExprs.tokenSetHits(tokens(lower(text)), words)

  /** Tiny per-language stopword lists for the language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "en", "es", "un", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "ne", "pas"))

  /** [[langId]] over an ALREADY-LOWERCASED token array. Stage the tokens
    * through a named column when computing several signals per document:
    * the argmax when-chain references each score in its guard AND in
    * `greatest`, and `when`-guarded subtrees are excluded from
    * subexpression elimination — with inline `tokens(lower(text))` the
    * full tokenization re-runs per reference (~9x per doc here).
    */
  def langIdOfTokens(wl: Column): Column = {
    val scores = langStopwords.map { case (lang, ws) =>
      lang -> graft.expr.TokenExprs.tokenSetHits(wl, ws)
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, score), els) =>
      when(best > 0 && score === best, lit(lang)).otherwise(els)
    }
  }

  /** N-gram-free language ID: argmax of stopword hits, ties broken by list
    * order, "und" (undetermined) when no list scores a hit — mirroring the
    * reference's undetermined cloud-mask convention (flag -1 for status 0,
    * `aggregate_functions.py:156-158`).
    */
  def langId(text: Column): Column = langIdOfTokens(tokens(lower(text)))

  /** Characteristic character trigrams per language (top distinguishing
    * trigrams, spaces shown as '_').
    */
  val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "he_", "ing", "_th", "and", "ion"),
    "es" -> Seq("_de", "os_", "_la", "ión", "es_", "que"),
    "de" -> Seq("der", "ein", "sch", "ich", "und", "en_"),
    "fr" -> Seq("es_", "_de", "le_", "ent", "ion", "que"))

  /** Count of characteristic-trigram occurrences of one language in the
    * normalized text (lowercased, whitespace -> '_').
    */
  def trigramHits(text: Column, trigrams: Seq[String]): Column = {
    val norm = concat(lit("_"),
      regexp_replace(lower(text), "\\s+", "_"), lit("_"))
    trigrams.map { t =>
      // occurrence count = (len - len(text without t)) / 3
      ((length(norm) - length(regexp_replace(norm, java.util.regex.Pattern.quote(t), ""))) / 3)
        .cast("long")
    }.reduce(_ + _)
  }

  /** n-gram language ID: argmax of characteristic-trigram hit counts (the
    * spec'd n-gram heuristic; [[langId]] is the cheaper stopword variant).
    * Same tie-break and "und" conventions as [[langId]].
    */
  def langIdNgram(text: Column): Column = {
    val scores = langTrigrams.map { case (lang, ts) => lang -> trigramHits(text, ts) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, score), els) =>
      when(best > 0 && score === best, lit(lang)).otherwise(els)
    }
  }

  /** PII surface forms scrubbed by [[redactPii]]. Kept to patterns whose
    * semantics agree across regex dialects (no lookarounds/backrefs).
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\d[\\d\\- ]{6,}\\d" -> "<NUM>") // phone-ish digit runs (7+ with -/space)

  /** Scrub common PII surface forms (emails, URLs, long digit runs) —
    * chained codegen'd `regexp_replace`, row-local, zero shuffles: the
    * shape of a 100 TB scrub pass is a pure map over the scan.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }

  /** How many PII matches [[redactPii]] would replace (audit metric). */
  def piiCount(text: Column): Column =
    piiPatterns.map { case (re, _) => regexp_count(text, lit(re)) }
      .reduce(_ + _)

  /** [[qualityScore]] over a pre-tokenized array (see [[langIdOfTokens]]
    * for why staging matters: `nTok` sits inside `when` guards, so an
    * inline tokenization re-runs per reference).
    */
  def qualityScoreOf(text: Column, w: Column): Column = {
    val nChars = charCount(text).cast("double")
    val nTok = size(w).cast("double")
    val lenScore = least(nChars / 200.0, lit(1.0))
    val meanWordLen = when(nTok > 0, nChars / nTok).otherwise(lit(0.0))
    val shapeScore = when(meanWordLen >= 3 && meanWordLen <= 10, 1.0).otherwise(0.5)
    val punctRatio = when(nChars > 0, punctCount(text).cast("double") / nChars).otherwise(lit(1.0))
    (lenScore + shapeScore + (lit(1.0) - punctRatio)) / 3
  }

  /** Heuristic quality score in [0,1]:
    * mean of (length score, word-shape score, 1 - punctuation ratio).
    * Deterministic double arithmetic — identical on any engine.
    */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))

  /** Space-joined n-grams of an ALREADY-TOKENIZED array, empty when it has
    * fewer than `n` tokens. Take this form (and the other `*OfTokens`
    * variants) when computing several signals over one document: tokenize
    * once into a named column, then derive — `when`-guarded trees defeat
    * Spark's subexpression elimination, so the text-based conveniences
    * below re-tokenize per signal (measured 8x slower for the 3-signal
    * repetition query).
    */
  def ngramsOfTokens(w: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Type-token ratio of a token array (1.0 for empty — an empty doc has
    * no repetition). Low values flag keyword-stuffed or looping text (the
    * Gopher "fraction of unique words" rule).
    */
  def distinctFracOfTokens(w: Column): Column =
    when(size(w) > 0,
      size(array_distinct(w)).cast("double") / size(w).cast("double"))
      .otherwise(lit(1.0))

  /** Fraction of n-grams that repeat an earlier n-gram (1 − distinct/total;
    * 0.0 for an empty n-gram array) — the Gopher/C4-style duplicate-n-gram
    * repetition signal used to drop boilerplate and degenerate generations
    * from pretraining corpora. Pure integer counts + one IEEE division:
    * bit-identical on any engine.
    */
  def dupFracOfNgrams(g: Column): Column =
    when(size(g) > 0,
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g).cast("double"))
      .otherwise(lit(0.0))

  /** [[ngramsOfTokens]] over freshly tokenized text. */
  def tokenNgrams(text: Column, n: Int): Column =
    ngramsOfTokens(tokens(text), n)

  /** [[distinctFracOfTokens]] over freshly tokenized text. */
  def distinctTokenFrac(text: Column): Column =
    distinctFracOfTokens(tokens(text))

  /** [[dupFracOfNgrams]] over freshly tokenized text. */
  def dupNgramFrac(text: Column, n: Int): Column =
    dupFracOfNgrams(tokenNgrams(text, n))

  /** Linear text-classifier margin: Σ weight(token) over lowercased
    * tokens (with multiplicity; out-of-vocabulary tokens score 0) — the
    * apply step of a fastText-style quality classifier whose weights were
    * trained offline. The lexicon ships as a plan-time literal probed by
    * the codegen'd [[graft.expr.TokenWeightSum]] hash table, so scoring
    * 100 TB is a pure map: zero joins, zero shuffles, integer-exact.
    */
  def classifierMargin(text: Column, weights: Map[String, Long]): Column =
    graft.expr.WeightExprs.tokenWeightSum(tokens(lower(text)), weights)

  /** Rolling polynomial fingerprint of the normalized text (lowercase,
    * whitespace collapsed to single spaces):
    * `h = fold(codepoints, 0, (acc, c) => (acc*31 + c) mod 1e9+7)`.
    * Stable across engines: the fold order is the character order and the
    * modulus keeps every intermediate exactly representable. The fold is
    * the codegen'd [[graft.expr.RollingFingerprint]] loop — the earlier
    * split+aggregate HOF form ran its lambda interpreted per character.
    */
  def fingerprint(text: Column): Column =
    graft.expr.TextFingerprintExprs.rollingFingerprint(
      concat_ws(" ", tokens(lower(text))))

  /** Per-document Shannon entropy of the token distribution (bits, in
    * exact 2^-20 fixed point) — the repetition/diversity quality signal
    * (low entropy = chant-like repetition; high = diverse vocabulary):
    * `H = Σ_t (c_t / n) * log2(n / c_t)
    *    = (Σ_t c_t * (L(n) - L(c_t))) DIV n`
    * with L = the codegen'd [[graft.expr.MathExprs.log2Fixed]] — a pure
    * integer logarithm, so the score is bit-identical on every engine
    * (a float `ln` would tie the gate to a libm) and the DuckDB oracle
    * replays it from scratch. The dividend is nonnegative (L is
    * monotone, c_t <= n), so the single integer division is
    * direction-proof.
    *
    * Scale shape: one (doc, token)-keyed count (map-side combined), one
    * doc-keyed fold — both corpus-shaped shuffles a per-doc vocabulary
    * profile fundamentally needs; nothing collects.
    *
    * Output: (doc_id, n_tokens, n_types, entropy_fixed); token-free
    * docs report zeros.
    */
  def tokenEntropy(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.expr.MathExprs.log2Fixed
    val tc = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("tk"))
      .groupBy(col("doc_id"), col("tk"))
      .agg(count(lit(1)).as("c"))
    val tot = tc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"))
    val hs = tc.join(tot.select(col("doc_id"), col("n")), "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * (log2Fixed(col("n")) - log2Fixed(col("c"))))
        .as("hs"))
    docs.select(col(idCol).as("doc_id"))
      .join(tot, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"))
      .join(hs, Seq("doc_id"), "left")
      .withColumn("entropy_fixed",
        when(col("n_tokens") > 0, expr("hs DIV n_tokens"))
          .otherwise(lit(0L)))
      .drop("hs")
  }

  /** Corpus-wide adjacent-token pair counts `(x, y, c_xy)` — the shared
    * frame under [[pmiCollocations]] and [[bigramCondEntropy]]: ONE
    * explode pass collapsing map-side into the (vocab²-bounded, in
    * practice far sparser) bigram count table. Pairs come from
    * `zip_with(w[1..n-1], w[2..n])` — row-local, no self-join.
    */
  def bigramCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = tokens(lower(col(textCol)))
    val n1 = greatest(size(w) - 1, lit(0))
    val pairs = zip_with(slice(w, lit(1), n1), slice(w, lit(2), n1),
      (a, b) => struct(a.as("x"), b.as("y")))
    docs.select(explode(pairs).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("c_xy"))
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990) —
    * the adjacent pairs that co-occur far above chance ("new york"-style
    * multiword units a tokenizer/phrase-miner wants): top `k` bigrams
    * with `c_xy ≥ minCount` by
    *
    *   pmi_fixed = L(c_xy) + L(N) − L(c_x·) − L(c_·y)     (L = log2Fixed)
    *
    * with positional marginals (x as left token, y as right) and N the
    * total bigram count — exact integer algebra end to end; the
    * min-count floor is the standard guard against PMI's rare-pair
    * bias.
    *
    * Scale shape: marginals and N derive from the bigram COUNT frame
    * (vocab-bounded — never a corpus re-scan): two broadcast joins plus
    * one 1-row N attach; the final cut is a k-row TakeOrdered heap.
    */
  def pmiCollocations(
      docs: DataFrame, minCount: Long = 5L, k: Int = 50): DataFrame = {
    import graft.expr.MathExprs.log2Fixed
    val bc = bigramCounts(docs)
    val mx = bc.groupBy("x").agg(sum(col("c_xy")).as("c_x"))
    val my = bc.groupBy("y").agg(sum(col("c_xy")).as("c_y"))
    val tot = bc.agg(coalesce(sum(col("c_xy")), lit(0L)).as("n_pairs"))
    bc.filter(col("c_xy") >= minCount)
      .join(broadcast(mx), Seq("x"))
      .join(broadcast(my), Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        (log2Fixed(col("c_xy")) + log2Fixed(col("n_pairs")) -
          log2Fixed(col("c_x")) - log2Fixed(col("c_y"))).as("pmi_fixed"))
      .orderBy(col("pmi_fixed").desc, col("x"), col("y"))
      .limit(k)
  }

  /** Corpus bigram conditional entropy H(Y|X) — the entropy RATE of the
    * token stream under a first-order model, the corpus-level
    * repetitiveness/compressibility signal ([[tokenEntropy]]'s unigram
    * form says how diverse the vocabulary is; this says how predictable
    * the NEXT token is — boilerplate-heavy corpora score low):
    *
    *   h_num_fixed = Σ_xy c_xy·(L(c_x·) − L(c_xy))   (exact int64 sum)
    *   h_bits      = h_num_fixed / (N·2^20)          (one division)
    *
    * the [[ProfileOps.tokenKlByGroup]] undivided-sum discipline. ONE
    * row: `(n_pairs, n_contexts, h_num_fixed, h_bits)`.
    */
  def bigramCondEntropy(docs: DataFrame): DataFrame = {
    import graft.expr.MathExprs.log2Fixed
    val bc = bigramCounts(docs)
    val mx = bc.groupBy("x").agg(sum(col("c_xy")).as("c_x"))
    bc.join(broadcast(mx), Seq("x"))
      .agg(
        coalesce(sum(col("c_xy")), lit(0L)).as("n_pairs"),
        countDistinct(col("x")).as("n_contexts"),
        coalesce(sum(col("c_xy") *
          (log2Fixed(col("c_x")) - log2Fixed(col("c_xy")))), lit(0L))
          .as("h_num_fixed"))
      .withColumn("h_bits",
        when(col("n_pairs") > 0,
          col("h_num_fixed").cast("double") /
            (col("n_pairs") * lit(1048576L)).cast("double")))
  }

  /** Vocabulary coverage curve — the tokenizer-sizing diagnostic: for the
    * top `k` token types by frequency, the cumulative share of ALL token
    * occurrences they cover ("a 32k vocab covers 97.2% of running
    * tokens"). Ranking is deterministic (count desc, token asc ties);
    * shares live on the exact x10^6 integer grid (`cum_n x 10^6 div
    * total`), so the curve is engine-portable.
    *
    * Scale shape: one corpus-sized explode collapses through a map-side-
    * combined type count into a VOCAB-sized frame; the top-k cut is a
    * per-task heap (TakeOrderedAndProject — the vocab frame is NEVER
    * globally sorted: until round 9 the rank window ran SinglePartition
    * over every distinct type, a few million rows in one task at web
    * scale), the rank/cumulative window runs over the K-SIZED survivor
    * frame, and the occurrence total attaches as a 1-row broadcast. The
    * corpus is scanned once, shuffled once (type key).
    *
    * Output: (rank, token, n, cum_n, cum_micro), rank <= k.
    */
  def vocabCoverage(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val types = df
      .select(explode(tokens(lower(text))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = types.agg(sum(col("n")).as("__total"))
    // (n desc, token) is a strict total order (token is the group key),
    // so limit-k == the old rank<=k filter, but plans as per-task heaps
    val topk = types.orderBy(col("n").desc, col("token")).limit(k)
    val byFreq = Window.orderBy(col("n").desc, col("token"))
    topk
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .withColumn("cum_micro", expr("(cum_n * 1000000) div __total"))
      .select(col("rank"), col("token"), col("n"), col("cum_n"),
        col("cum_micro"))
  }

  /** Term burstiness (Church & Gale 1995): variance-to-mean ratio of a
    * term's per-document counts — clumped terms (VMR ≫ 1, names, topic
    * words) vs evenly-spread function words (VMR ≈ 1, Poisson-like).
    * A pure-df weighting misprices bursty terms; this is the diagnostic
    * that says WHICH terms need it, and a boilerplate detector reads
    * high-VMR high-df terms as template fragments.
    *
    *   VMR = (N·Σc² − (Σc)²) / (N·Σc)
    *
    * over ALL N docs (zeros included — the totals formulation needs no
    * zero rows): exact int64 numerator/denominator, ONE closing IEEE
    * division. Top-k terms by total frequency, tie-broken by token —
    * a strict total order, so limit-k plans as per-task heaps (the
    * [[vocabCoverage]] discipline).
    *
    * Scale shape: one explode + ONE (token, doc)-keyed aggregate, one
    * token-keyed moment aggregate, a k-bounded TakeOrdered; N attaches
    * as a 1-row broadcast. Output:
    * `(token, tf, df, vmr)` for the k highest-tf terms.
    */
  def termBurstiness(
      docs: DataFrame, k: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val perDoc = docs
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("c"))
    val moments = perDoc.groupBy(col("token")).agg(
      sum(col("c")).as("tf"),
      sum(col("c") * col("c")).as("sumsq"),
      count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    moments
      .orderBy(col("tf").desc, col("token")).limit(k)
      .crossJoin(broadcast(nDocs))
      .select(col("token"), col("tf"), col("df"),
        when(col("tf") > 0L,
          (col("__n") * col("sumsq") - col("tf") * col("tf")).cast("double") /
            (col("__n") * col("tf")).cast("double")).as("vmr"))
  }

  /** Keyness by Dunning (1993) log-likelihood ratio — the standard
    * "which terms DISTINGUISH slice A from slice B" statistic (corpus
    * linguistics' G², the grown-up version of naive frequency ratios,
    * robust at low counts where PMI and ratios explode). Emitted per
    * token in fixed-point log2 units (G²·2²⁰/ln2·... — a monotone
    * rescaling of G²; thresholds calibrate on it directly):
    *
    *   llr_fx = 2·( a·[L(a·(A+B)) − L((a+b)·A)]
    *              + b·[L(b·(A+B)) − L((a+b)·B)] )
    *
    * — each O·log2(O/E) term cleared of divisions, L the fixed-point
    * [[graft.expr.Log2Fixed]], all int64 (value contract:
    * `count·(A+B)` fits int64 — per-slice token totals below ~2·10⁹;
    * ANSI raises loudly on breach). Zero-count sides contribute 0, so
    * single-slice tokens stay finite. `enriched_in` says which slice
    * over-represents the token (exact cross-product comparison, no
    * division).
    *
    * Scale shape: the q_source_kl shape — one explode + ONE token-keyed
    * conditional-sum aggregate, 1-row totals broadcast, row-local
    * algebra. Output per token with `a+b >= minCount`:
    * `(token, c_a, c_b, llr_fx, enriched_in)`.
    */
  def keynessLlr(
      docs: DataFrame, isA: Column, isB: Column, minCount: Long = 1L,
      textCol: String = "text"): DataFrame = {
    import graft.expr.MathExprs.log2Fixed
    val tok = docs
      .select(isA.cast("boolean").as("ia"), isB.cast("boolean").as("ib"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("ia") || col("ib"))
      .groupBy(col("token"))
      .agg(sum(when(col("ia"), 1L).otherwise(0L)).as("a"),
        sum(when(col("ib"), 1L).otherwise(0L)).as("b"))
      .filter(col("a") + col("b") >= minCount)
    val totals = tok.agg(
      coalesce(sum(col("a")), lit(0L)).as("na"),
      coalesce(sum(col("b")), lit(0L)).as("nb"))
    tok.crossJoin(broadcast(totals))
      .select(col("token"), col("a").as("c_a"), col("b").as("c_b"),
        (lit(2L) * (
          when(col("a") > 0L, col("a") *
            (log2Fixed(col("a") * (col("na") + col("nb"))) -
              log2Fixed((col("a") + col("b")) * col("na")))).otherwise(0L) +
          when(col("b") > 0L, col("b") *
            (log2Fixed(col("b") * (col("na") + col("nb"))) -
              log2Fixed((col("a") + col("b")) * col("nb")))).otherwise(0L)))
          .as("llr_fx"),
        when(col("a") * col("nb") > col("b") * col("na"), lit("a"))
          .otherwise(lit("b")).as("enriched_in"))
  }

  /** Character class scored as "code-like" by [[codeSignals]] — braces,
    * brackets, punctuation-operators, and quotes: dense in source code
    * and serialized JSON, near-absent in prose. One literal shared with
    * the oracle.
    */
  val CodeSymbolClass: String = "[{}()\\[\\];=<>:\"]"

  /** score ≥ this ×10⁶ density ⇒ classified code. */
  val CodeThresholdMicro: Long = 150000L

  /** Code-vs-prose signal per row — the corpus-separation step every
    * LLM data pipeline runs before mixing (code wants different
    * tokenization, dedup, and sampling weights than prose). Pure
    * row-local counting: `n_sym` (chars in [[CodeSymbolClass]]) and
    * `n_digit` counted by the length-after-removal identity, the
    * weighted density `score = 10⁶·(3·n_sym + n_digit) DIV n_char`
    * exact intdiv (symbols weigh 3: a single `{};` line outvotes a
    * digit-y prose sentence), and the verdict against
    * [[CodeThresholdMicro]]. Zero joins, zero shuffles — a 100 TB
    * classification is a pure map. Empty/NULL texts are dropped (they
    * classify as nothing).
    *
    * Output: `(id, kind, n_char, n_sym, n_digit, score_micro, is_code)`.
    */
  def codeSignals(
      df: DataFrame, id: Column, kind: Column, text: Column): DataFrame = {
    val base = df.select(id.as("id"), kind.as("kind"), text.as("tx"))
      .filter(col("tx").isNotNull && length(col("tx")) > 0)
    base.select(col("id"), col("kind"),
      length(col("tx")).cast("long").as("n_char"),
      (length(col("tx")) -
        length(regexp_replace(col("tx"), CodeSymbolClass, "")))
        .cast("long").as("n_sym"),
      (length(col("tx")) -
        length(regexp_replace(col("tx"), "[0-9]", "")))
        .cast("long").as("n_digit"))
      .withColumn("score_micro",
        expr("(1000000 * (3 * n_sym + n_digit)) DIV n_char"))
      .withColumn("is_code",
        (col("score_micro") >= CodeThresholdMicro).cast("int"))
  }

  /** Lexical-diversity profile per group — the vocabulary-richness
    * readout next to [[graft.ops.ModelOps.heapsFit]]'s growth curve:
    * type-token ratio (×10⁶ intdiv, exact), Simpson's repeat
    * probability `D = Σc·(c−1)/(N·(N−1))` (the chance two random tokens
    * are the same type), and Yule's K `= 10⁴·(Σc² − N)/N²` (D's
    * length-robust classic twin). The two N²-scale readouts close as
    * fixed double chains over exact-long moments (their ×10⁶ integer
    * forms would overflow int64 at corpus N); TTR stays pure intdiv.
    *
    * Scale shape: one (group, token) count aggregate, one group-grain
    * fold — both map-side combined; output is group-bounded.
    *
    * Output: `(source, n_tokens, n_types, ttr_micro, simpson, yule_k)`.
    */
  def lexicalDiversity(
      docs: DataFrame, group: Column, text: Column): DataFrame = {
    val tok = docs
      .select(group.cast("string").as("g"),
        explode(tokens(lower(text))).as("w"))
      .filter(col("g").isNotNull)
    val types = tok.groupBy(col("g"), col("w")).agg(count(lit(1)).as("c"))
    val m = types.groupBy(col("g")).agg(
      coalesce(sum(col("c")), lit(0L)).as("n_tokens"),
      count(lit(1)).as("n_types"),
      coalesce(sum(col("c") * (col("c") - 1L)), lit(0L)).as("rep2"),
      coalesce(sum(col("c") * col("c")), lit(0L)).as("s2"))
    m.select(col("g").as("source"), col("n_tokens"), col("n_types"),
      when(col("n_tokens") > 0L,
        expr("(1000000 * n_types) DIV n_tokens")).as("ttr_micro"),
      when(col("n_tokens") > 1L, col("rep2").cast("double") /
        (col("n_tokens").cast("double") *
          (col("n_tokens") - 1L).cast("double"))).as("simpson"),
      when(col("n_tokens") > 0L,
        lit(10000.0) * (col("s2") - col("n_tokens")).cast("double") /
          (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
        .as("yule_k"))
  }

  object Sql {
    /** DuckDB equivalents (same semantics, same evaluation order). */
    def tokens(c: String): String =
      s"list_filter(regexp_split_to_array($c, '\\s+'), t -> len(t) > 0)"
    def tokenCount(c: String): String = s"len(${tokens(c)})"
    def vowelGroups(c: String): String =
      s"length(regexp_replace(lower($c), '[aeiou]+', '#', 'g')) - " +
        s"length(regexp_replace(lower($c), '[aeiou]+', '', 'g'))"
    def sentenceCount(c: String): String =
      s"length(regexp_replace($c, '[.!?]+', '#', 'g')) - " +
        s"length(regexp_replace($c, '[.!?]+', '', 'g'))"
    def punctCount(c: String): String =
      s"length($c) - length(regexp_replace($c, '[^a-zA-Z0-9\\s]', '', 'g'))"
    def tokenEstimate(c: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(${tokens(c)}, " +
        s"w -> CAST(ceil(CAST(length(w) AS DOUBLE)/4) AS BIGINT))), (a, b) -> a + b)"
    def stopwordHits(c: String, words: Seq[String]): String = {
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(${tokens(s"lower($c)")}, t -> list_contains($arr, t)))"
    }
    def langId(c: String): String = {
      val scores = langStopwords.map { case (l, ws) => l -> stopwordHits(c, ws) }
      val best = scores.map(_._2).mkString("greatest(", ", ", ")")
      scores.reverse.foldLeft("'und'") { case (els, (lang, score)) =>
        s"CASE WHEN $best > 0 AND $score = $best THEN '$lang' ELSE $els END"
      }
    }
    def qualityScore(c: String): String = {
      val nChars = s"CAST(length($c) AS DOUBLE)"
      val nTok = s"CAST(${tokenCount(c)} AS DOUBLE)"
      val lenScore = s"least($nChars / 200.0, 1.0)"
      val meanWordLen = s"CASE WHEN $nTok > 0 THEN $nChars / $nTok ELSE 0.0 END"
      val shapeScore = s"CASE WHEN $meanWordLen >= 3 AND $meanWordLen <= 10 THEN 1.0 ELSE 0.5 END"
      val punctRatio = s"CASE WHEN $nChars > 0 THEN CAST(${punctCount(c)} AS DOUBLE) / $nChars ELSE 1.0 END"
      s"($lenScore + $shapeScore + (1.0 - $punctRatio)) / 3"
    }
    /** Matches Spark's regexp_count sum: both engines count non-overlapping
      * leftmost matches; [[piiPatterns]] avoid dialect-divergent constructs.
      */
    def piiCount(c: String): String =
      piiPatterns.map { case (re, _) =>
        s"len(regexp_extract_all($c, '${re.replace("'", "''")}'))"
      }.mkString("(", " + ", ")")
    /** Same chained replacement as [[TextOps.redactPii]]; DuckDB needs the
      * explicit 'g' flag for replace-all (Spark's regexp_replace default).
      */
    def redactPii(c: String): String =
      piiPatterns.foldLeft(c) { case (acc, (re, tag)) =>
        s"regexp_replace($acc, '${re.replace("'", "''")}', '$tag', 'g')"
      }
    /** `range(1, len-n+2)` is empty whenever len < n, so the guard matches
      * the Spark side's `size >= n` without an explicit CASE on length.
      */
    def tokenNgrams(c: String, n: Int): String =
      s"list_transform(range(1, len(${tokens(c)}) - ${n - 2}), " +
        s"i -> array_to_string((${tokens(c)})[i:i+${n - 1}], ' '))"
    def distinctTokenFrac(c: String): String = {
      val w = tokens(c)
      s"CASE WHEN len($w) > 0 THEN CAST(len(list_distinct($w)) AS DOUBLE) / CAST(len($w) AS DOUBLE) ELSE 1.0 END"
    }
    def dupNgramFrac(c: String, n: Int): String = {
      val g = tokenNgrams(c, n)
      s"CASE WHEN len($g) > 0 THEN 1.0 - CAST(len(list_distinct($g)) AS DOUBLE) / CAST(len($g) AS DOUBLE) ELSE 0.0 END"
    }
    def fingerprint(c: String): String = {
      val norm = s"array_to_string(${tokens(s"lower($c)")}, ' ')"
      val codes = s"list_transform(list_filter(string_split($norm, ''), ch -> len(ch) > 0), ch -> CAST(ord(ch) AS BIGINT))"
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $codes), (acc, x) -> (acc * 31 + x) % 1000000007)"
    }
  }
}
