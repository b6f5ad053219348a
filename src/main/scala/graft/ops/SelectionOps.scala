package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR — Xie et al., NeurIPS
  * 2023): score every raw document by how target-like its hashed-token
  * distribution is, `score(d) = Σ_tokens log(p_target(bucket) /
  * p_raw(bucket))` — the standard quality-targeted selection pass LLM
  * pretraining pipelines run between dedup and mixing.
  *
  * Engine-exact formulation: probabilities are add-1-smoothed ratios of
  * INTEGER bucket counts, and the log rides [[log2Fixed]] — an integer
  * fixed-point base-2 logarithm (msb + 20 fractional bits by repeated
  * squaring, pure int64 ops) — so the whole score is exact integer
  * algebra that the DuckDB oracle replays from scratch: token bucketing
  * (the md5 portable family), bucket counts, every log2Fixed iteration
  * (unrolled SQL), and the per-doc sum. Unlike float ln scores, the
  * result is bit-identical on every engine and under every layout.
  *
  * Scale shape: ONE token-explode pass collapses into a `buckets`-sized
  * count table (map-side combined); the weight table is bucket-bounded
  * (driver-computed logs over <= 2·buckets+2 values) and re-enters the
  * plan as ONE literal array — scoring is a second corpus scan with a
  * row-local fold, zero shuffles. The corpus is never joined to itself
  * and nothing corpus-sized reaches the driver.
  */
object SelectionOps {

  /** Fractional bits of [[log2Fixed]]. */
  val LogFracBits = 20

  /** Integer fixed-point log2: `round-down(log2(v) * 2^20)` computed with
    * pure int64 arithmetic — msb via leading zeros, then 20 rounds of
    * mantissa squaring (the classic binary-logarithm recurrence; the
    * mantissa lives in [2^30, 2^31) so every square fits int64). Accuracy
    * ~2^-20 and, more importantly, REPLAYABLE: the DuckDB oracle unrolls
    * the same 20 iterations in SQL. Requires v >= 1.
    */
  def log2Fixed(v: Long): Long = {
    require(v >= 1, s"log2Fixed needs v >= 1, got $v")
    graft.expr.Log2Fixed.eval(v)
  }

  /** Portable token -> bucket assignment (the md5 family of
    * [[DedupOps.portableShingleHash]], reduced to `buckets`). */
  def tokenBucket(token: Column, buckets: Int): Column =
    DedupOps.portableShingleHash(token) % buckets

  /** Per-document DSIR scores against the `target` document predicate.
    *
    * weight(b) = [L(t_b + 1) − L(r_b + 1)] + [L(N_r + B) − L(N_t + B)]
    * with L = [[log2Fixed]], t/r the target/raw bucket token counts,
    * N the totals, B the add-1 mass — i.e. the fixed-point log of the
    * smoothed probability ratio. score(d) = Σ_tokens weight(bucket).
    *
    * Output: (id, n_tokens, dsir_fixed) — dsir_fixed in 2^-20 log2
    * units; positive = more target-like. Token-free docs score 0.
    */
  def dsirScores(
      docs: DataFrame,
      target: Column,
      buckets: Int = 4096,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), s"bad buckets: $buckets")
    val toks = TextOps.tokens(lower(col(textCol)))
    val counts = docs
      .select(target.as("is_t"), explode(toks).as("tk"))
      .select(col("is_t"), tokenBucket(col("tk"), buckets).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("t"),
        count(lit(1)).as("r"))
      .collect() // buckets-bounded (<= 4096 rows) — the model, not the corpus
    val t = new Array[Long](buckets)
    val r = new Array[Long](buckets)
    counts.foreach { row =>
      val b = row.getLong(0).toInt
      t(b) = row.getLong(1); r(b) = row.getLong(2)
    }
    val nT = t.sum; val nR = r.sum
    val const = log2Fixed(nR + buckets) - log2Fixed(nT + buckets)
    val w = Array.tabulate(buckets)(b =>
      log2Fixed(t(b) + 1) - log2Fixed(r(b) + 1) + const)
    val warr = typedLit(w.toSeq)
    docs.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      aggregate(
        transform(toks, tk => element_at(warr, (tokenBucket(tk, buckets) + 1).cast("int"))),
        lit(0L), (acc, x) => acc + x).as("dsir_fixed"))
  }
}
