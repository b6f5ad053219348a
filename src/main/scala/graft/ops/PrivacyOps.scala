package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy mechanisms for releasable aggregates.
  *
  * [[randomizedResponse]] is the one-bit randomized response (Warner
  * 1965 — the mechanism RAPPOR builds on): each respondent reports
  * their true bit with probability p = 3/4, the flipped bit otherwise,
  * giving per-response plausible deniability (local differential
  * privacy at eps = ln(p/(1-p)) = ln 3); the server recovers an
  * UNBIASED population estimate from the noisy sum:
  * `n1_hat = (4*sum_reported - n) / 2` for p = 3/4. The estimate is
  * emitted as `est_x2 = 4*sum_reported - n` (twice the estimate) so the
  * whole aggregate stays in exact integer arithmetic — no floats, no
  * libm, engine-portable.
  *
  * The flip coin here is a DETERMINISTIC stand-in — the portable
  * md5-family hash of the respondent id (the [[DedupOps]] oracle-able
  * family). In production the coin is CLIENT-SIDE true randomness (that
  * is what makes the mechanism private); the server never sees it, and
  * the server-side ESTIMATOR — this exact aggregate — is identical
  * either way. The deterministic coin is what lets the full pipeline
  * replay bit-for-bit in tests and oracles, and the simulation also
  * carries the TRUE count per group so the estimator's error is
  * observable (a real deployment has no such column, by design).
  *
  * Scale shape: one map-side-combining aggregate over the table; the
  * report is group-sized. The md5 coin is row-local.
  */
object PrivacyOps {

  /** Deterministic respondent coin in [0, 4): portable hash of the id
    * (domain-separated), reduced mod 4. `< 3` = report truthfully.
    */
  def coin(id: Column): Column =
    DedupOps.portableShingleHash(concat(lit("rr:"), id.cast("string"))) % 4

  /** Per-group randomized-response aggregate over a 0/1 `bit` column:
    * (group, n, true_cnt, sum_reported, est_x2). `est_x2/2` estimates
    * `true_cnt` unbiasedly over the coin distribution.
    */
  def randomizedResponse(
      df: DataFrame,
      idCol: Column,
      bitCol: Column,
      groupCol: Column): DataFrame = {
    val b = bitCol.cast("long")
    df.select(
      groupCol.as("grp"),
      b.as("b"),
      when(coin(idCol) < 3, b).otherwise(lit(1L) - b).as("r"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("b")).as("true_cnt"),
        sum(col("r")).as("sum_reported"))
      .withColumn("est_x2", lit(4L) * col("sum_reported") - col("n"))
  }

  // --------------------------------------- discrete-Laplace noisy counts

  /** Two-sided-geometric (discrete Laplace) pmf with α = 1/2 — the
    * ε = ln 2 mechanism for sensitivity-1 counting queries (Ghosh-
    * Roughgarden-Sundararajan 2009: the UNIVERSALLY optimal mechanism
    * for counts). P(0) = 1/3, P(±k) = (1/3)·2^-k; the ladder covers
    * k = −6..5 (mass 1 − 1/64) and the uncovered 1/64 of the uniform
    * draw — both true tails — lands on +6: a ≈0.08 expected-value bias,
    * far under the mechanism's noise scale and identical on every
    * engine. The CDF ladder is computed ONCE here in a fixed operation
    * order and shipped to both engines as identical double literals.
    */
  val DiscreteLaplaceCdf: Array[(Int, Double)] = {
    val ks = (-6 to 5).toArray
    val pmf = ks.map(k => (1.0 / 3.0) * math.pow(0.5, math.abs(k)))
    val cdf = pmf.scanLeft(0.0)(_ + _).tail
    ks.zip(cdf)
  }

  /** Per-group counts with deterministic discrete-Laplace noise — the
    * central-DP release shape for a histogram of group sizes (ε = ln 2
    * per group under parallel composition; groups partition the rows).
    * The noise draw is the portable md5 coin of the GROUP KEY (domain-
    * separated by `salt`), pushed through [[DiscreteLaplaceCdf]] — a
    * deterministic stand-in for the curator's secret randomness, same
    * contract as [[coin]]: production swaps in true randomness; the
    * release arithmetic (and this exact aggregate) is identical, and
    * determinism is what lets tests and oracles replay the release
    * bit-for-bit. True counts ride along for error observability (a
    * real release omits them, by design).
    *
    * Scale shape: ONE map-side-combined count; hash, ladder, and the
    * clip-at-zero are group-row-local.
    */
  def dpCounts(df: DataFrame, groupCol: Column, salt: String): DataFrame = {
    // raw 60-bit md5 value (NOT the mod-prime reduction — the ladder
    // needs uniform [0,1) at full width); >> 7 leaves 53 exact bits
    val h = conv(substring(md5(
      concat(lit(s"dp:$salt:"), col("grp").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val u = shiftrightunsigned(h, 7).cast("double") / lit(9007199254740992.0)
    val noise = DiscreteLaplaceCdf.reverse
      .foldLeft(lit(6L)) {
        case (els, (k, t)) => when(u < lit(t), lit(k.toLong)).otherwise(els)
      }
    df.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise", noise)
      .withColumn("n_dp", greatest(lit(0L), col("n_true") + col("noise")))
  }
}
