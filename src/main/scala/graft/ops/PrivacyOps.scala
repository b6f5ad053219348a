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
}
