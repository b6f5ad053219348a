package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.MathExprs.log2Fixed

/** Probabilistic record linkage (Fellegi & Sunter 1969) — scoring
  * blocked candidate pairs by per-field agreement weights
  * `log2(m/u)` / `log2((1−m)/(1−u))`, the standard entity-linkage
  * machinery (Splink, dedupe.io) for joining records WITHOUT a shared
  * key: two customer files, a CRM vs an order feed, a crawl vs a
  * registry.
  *
  * [[EntityOps.goldenRecords]] and `q_fuzzy_join` resolve entities by
  * deterministic similarity; this adds the PROBABILISTIC layer — every
  * pair gets a calibrated match weight, so downstream picks a threshold
  * on an interpretable log-odds scale instead of a similarity cliff.
  *
  * Engine-exact: u-probabilities (P(agree | random pair)) come from the
  * exact second frequency moment of each compare field —
  * `u_f = Σ_v c_v² / N²` — and the field weights are fixed-point
  * [[graft.expr.Log2Fixed]] differences of exact longs:
  *
  *   wa_f = L(m_micro·N²) − L(10⁶·Σc²)          agreement
  *   wd_f = L((10⁶−m_micro)·N²) − L(10⁶·(N²−Σc²))  disagreement
  *
  * (m is the documented match-agreement prior, micro-scaled; a full EM
  * fit would estimate it, but the prior form is what production linkers
  * run first). No libm, no floats — pair weights are exact int64 sums,
  * bit-identical on any engine. Value contract: `10⁶·N²` must fit int64
  * (N ≲ 3·10⁶ records per linked slice; ANSI raises loudly on breach —
  * shard bigger files by block first).
  *
  * Scale shape: the candidate generator is the BLOCKING equi-join —
  * never all-pairs (the MinHash-LSH discipline applied to linkage);
  * u-moments are one value-keyed aggregate per compare field collapsing
  * to 1-row frames; weights are a 1-row broadcast onto the pair stream;
  * scoring is row-local. At 100 TB the cost is the blocked join, which
  * is exactly the cost of any linkage that doesn't compare everything
  * with everything.
  */
object LinkageOps {

  /** Score all blocked candidate pairs between `a` and `b`.
    *
    * Both frames must carry `blockCols` and `compareCols` under the same
    * names; `idColA`/`idColB` name each side's record id. Agreement is
    * null-safe equality (two NULLs agree — absent-vs-absent is evidence
    * of sameness under the m/u model, matching SQL's
    * IS NOT DISTINCT FROM). A compare field constant across ALL of `b`
    * (u = 1) has NULL disagreement weight — disagreeing with a constant
    * is outside the model; its pairs score NULL, surfacing the
    * degenerate field loudly rather than silently.
    *
    * Output: one row per candidate pair —
    * `(a_id, b_id, agree_<f> ... , weight_fx)` with `weight_fx` the
    * summed fixed-point (2⁻²⁰) log2 match weight.
    */
  def fsLink(
      a: DataFrame, b: DataFrame, idColA: String, idColB: String,
      blockCols: Seq[String], compareCols: Seq[String],
      mMicro: Long = 950000L): DataFrame = {
    require(blockCols.nonEmpty, "blocking is mandatory — never all-pairs")
    require(compareCols.nonEmpty, "need at least one compare field")
    require(mMicro > 0L && mMicro < 1000000L, s"bad mMicro: $mMicro")
    val nb = b.agg(count(lit(1)).as("fs_n"))
    val moments = compareCols.map { f =>
      b.groupBy(col(f)).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") * col("c")), lit(0L)).as(s"fs_ss_$f"))
    }
    val params = moments.foldLeft(nb)((acc, m) => acc.crossJoin(m))
    val n2 = col("fs_n") * col("fs_n")
    val weights = params.select(col("fs_n") +: compareCols.flatMap { f =>
      val ss = col(s"fs_ss_$f")
      Seq(
        (log2Fixed(lit(mMicro) * n2) -
          log2Fixed(lit(1000000L) * ss)).as(s"fs_wa_$f"),
        when(ss < n2,
          log2Fixed(lit(1000000L - mMicro) * n2) -
            log2Fixed(lit(1000000L) * (n2 - ss))).as(s"fs_wd_$f"))
    }: _*)
    val aSel = a.select(col(idColA).as("a_id") +: blockCols.map(col) ++:
      compareCols.map(f => col(f).as(s"${f}_a")): _*)
    val bSel = b.select(col(idColB).as("b_id") +: blockCols.map(col) ++:
      compareCols.map(f => col(f).as(s"${f}_b")): _*)
    val pairs = aSel.join(bSel, blockCols).crossJoin(broadcast(weights))
    val weight = compareCols.map { f =>
      when(col(s"${f}_a") <=> col(s"${f}_b"), col(s"fs_wa_$f"))
        .otherwise(col(s"fs_wd_$f"))
    }.reduce(_ + _)
    pairs.select(col("a_id") +: col("b_id") +:
      compareCols.map(f =>
        (col(s"${f}_a") <=> col(s"${f}_b")).cast("int").as(s"agree_$f")) :+
      weight.as("weight_fx"): _*)
  }
}
