package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram language-model quality scoring — the CCNet-style
  * "perplexity filter" shape used to rank web text for pretraining
  * corpora, in two phases that mirror how it deploys at 100 TB:
  *
  *  1. '''train''' (once per corpus snapshot): one scan that counts char
  *     bigrams. The key space is charset²-bounded, so the groupBy shuffle
  *     carries ≤ tasks × distinct-bigrams rows after map-side partial
  *     aggregation — independent of corpus size.
  *  2. '''score''' (the 100 TB pass): the model is a bounded literal table
  *     shipped in the plan (the IVF-centroid pattern) and probed by a
  *     codegen'd string walk ([[graft.expr.CharBigramWeightSum]]) — a pure
  *     map over the scan, zero joins, zero shuffles.
  *
  * Probabilities are fixed-point parts-per-million (floor(count·10⁶ /
  * total)) and scores are integer sums of them, so training and scoring
  * are bit-portable across engines and merge orders (no ln/exp — libm
  * last-ulp divergence is the reason scores are rational, not log-space;
  * ranking by Σp is monotone enough for a quality filter).
  */
object LmOps {

  val PpmScale = 1000000L

  /** Normalization shared by train and score: lowercase, whitespace runs
    * to '_', '_' sentinels on both ends (so word-boundary bigrams exist
    * even for single-char texts).
    */
  def normText(text: Column): Column =
    concat(lit("_"), regexp_replace(lower(text), "\\s+", "_"), lit("_"))

  /** Training pass: normalized-char-bigram counts over the corpus. The
    * bigram array is the codegen'd [[graft.expr.CharBigrams]] loop — the
    * `transform(sequence(...), i -> substr(...))` formulation evaluates
    * its lambda interpreted per character, and feeding it `normText(text)`
    * un-staged would additionally re-run the regexp normalization per
    * element (O(len²) regexps/doc; measured 4x on this pass even staged).
    */
  def trainCharBigrams(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(graft.expr.WeightExprs.charBigrams(normText(text))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))

  /** Fixed-point model: bigram -> floor(count · 10⁶ / total). The table is
    * charset²-bounded (a few hundred entries on real text), so collecting
    * it to the driver is the broadcast-small-model pattern, not a
    * scalability leak.
    */
  def ppmModel(counts: DataFrame): Map[String, Long] =
    toPpm(counts.collect().map(r => r.getString(0) -> r.getLong(1)))

  private def toPpm(counts: Seq[(String, Long)]): Map[String, Long] = {
    val total = counts.iterator.map(_._2).sum
    // empty corpus -> empty model (every bigram scores the 0 OOV floor):
    // training must degrade, not throw, when an upstream filter matched
    // nothing
    if (total == 0) Map.empty
    else counts.iterator.map { case (b, c) => b -> c * PpmScale / total }.toMap
  }

  /** The scale form of train: ONE [[graft.agg.CharBigramCountsAgg]]
    * aggregation — each task walks its documents in place and forwards a
    * single charset²-bounded count buffer, where [[trainCharBigrams]]'
    * `explode + groupBy` shuffles a row per corpus CHARACTER (measured
    * 5x on the 200k-doc scale bench). Same exact integer counts, so the
    * resulting model is identical.
    */
  def trainModelPpm(docs: DataFrame, text: Column): Map[String, Long] = {
    val arr = docs
      .agg(graft.agg.BigramFunctions.charBigramCounts(normText(text)).as("m"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    toPpm(arr.map(r => r.getString(0) -> r.getLong(1)))
  }

  /** Score every document: n_bigrams, Σ ppm(bigram), and the integer mean.
    * Row-local; unseen bigrams contribute 0 (the out-of-vocabulary floor).
    */
  def scoreDocs(docs: DataFrame, id: Column, text: Column, model: Map[String, Long]): DataFrame =
    docs.select(id.as("doc_id"), normText(text).as("__t"))
      .select(
        col("doc_id"),
        (length(col("__t")) - 1).cast("long").as("n_bigrams"),
        graft.expr.WeightExprs.charBigramWeightSum(col("__t"), model).as("lm_sum_ppm"))
      .withColumn("lm_avg_ppm", expr("lm_sum_ppm div n_bigrams"))

  /** Interpolated Kneser-Ney WORD-bigram probabilities — the smoothing
    * every n-gram LM actually ships (the char-bigram PPM above is a
    * quality filter; this is the LM): absolute discount D = 3/4 held as
    * an exact rational, continuation counts instead of raw unigrams for
    * the backoff mass. Clearing denominators,
    *
    *   P_KN(w|v) = [max(4·c(vw) − 3, 0)·N₁₊(··) + 3·N₁₊(v·)·N₁₊(·w)]
    *               / (4·c(v)·N₁₊(··))
    *
    * — exact-long numerator and denominator, ONE closing division, so
    * the table replays bit-for-bit. Value contract:
    * `4·c(v)·N₁₊(··) < 2^63` (context count × distinct-bigram count).
    *
    * Scale shape: one bigram explode + ONE (v,w)-keyed map-side-combined
    * aggregate; c(v) / N₁₊(v·) / N₁₊(·w) are windows PARTITIONED by v
    * or w over the distinct-bigram frame (never SinglePartition);
    * N₁₊(··) is a 1-row broadcast; top-k closes as
    * TakeOrderedAndProject. Output: the `k` highest-count bigrams,
    * `(v, w, c_vw, c_v, n1p_v, n1p_w, n1pp, p_kn)` ordered by
    * (c_vw desc, v, w).
    */
  def knBigramTable(docs: DataFrame, text: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = TextOps.tokens(lower(text))
    val pairs = docs
      .select(toks.as("__toks"))
      .select(posexplode(slice(col("__toks"), lit(1),
        greatest(size(col("__toks")) - 1, lit(0)))).as(Seq("__i", "v")),
        col("__toks"))
      .select(col("v"),
        element_at(col("__toks"), col("__i") + 2).as("w"))
    val big = pairs.groupBy(col("v"), col("w"))
      .agg(count(lit(1)).as("c_vw"))
    val wV = Window.partitionBy(col("v"))
    val wW = Window.partitionBy(col("w"))
    val m = big
      .withColumn("c_v", sum(col("c_vw")).over(wV))
      .withColumn("n1p_v", count(lit(1)).over(wV))
      .withColumn("n1p_w", count(lit(1)).over(wW))
    val tot = big.agg(count(lit(1)).as("n1pp"))
    val num = greatest(lit(4L) * col("c_vw") - 3L, lit(0L)) * col("n1pp") +
      lit(3L) * col("n1p_v") * col("n1p_w")
    val den = lit(4L) * col("c_v") * col("n1pp")
    m.crossJoin(broadcast(tot))
      .select(col("v"), col("w"), col("c_vw"), col("c_v"),
        col("n1p_v"), col("n1p_w"), col("n1pp"),
        (num.cast("double") / den.cast("double")).as("p_kn"))
      .orderBy(col("c_vw").desc, col("v"), col("w"))
      .limit(k)
  }
}
