package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.MathExprs

/** Time-to-event (survival) analysis and sequential/panel experiment
  * readouts over right-censored unit lifetimes — the retention /
  * conversion-latency machinery of a training-data or product-event
  * pipeline: Kaplan-Meier life tables, the two-group log-rank test,
  * group-sequential (Pocock) A/B monitoring, and the two-period
  * difference-in-differences estimator.
  *
  * Reference scope note: the reference engine (MODIS_Aggregation) has no
  * statistics beyond its grid aggregations — this module is part of the
  * mandated large-scale-pipeline extension, same discipline as
  * [[ExperimentOps]]: exact-integer cores, fixed-order IEEE closing
  * chains, every logarithm the replayable fixed-point
  * [[graft.expr.Log2Fixed]] (never libm), so each query hash-matches a
  * from-scratch DuckDB replay.
  *
  * Scale shape: subject frames collapse through ONE map-side-combined
  * value-keyed aggregate (distinct durations, not subjects); all
  * cumulative "at risk" counts ride [[ExperimentOps.prefixByValue]]'s
  * two-phase bucketed prefix scan — no SinglePartition window ever
  * touches an unbounded duration domain.
  */
object SurvivalOps {

  /** Pocock two-sided 5% critical value for K=4 looks, squared
    * (z = 2.361). A shared literal — computed nowhere — so both engines
    * compare against the identical double (the [[ExperimentOps.MwZ2Crit]]
    * convention).
    */
  val PocockZ2CritK4: Double = 5.574321

  /** Kaplan-Meier life table over right-censored durations.
    *
    * `subjects` carries one row per unit; `duration` (long, >= 0) is the
    * observed time, `event` is 1 when the unit experienced the event at
    * `duration` and 0 when it was censored there. Output: one row per
    * distinct duration `t` with
    *   - `n_risk`  — units with duration >= t (exact long),
    *   - `d` / `c` — events / censorings at exactly t (exact longs),
    *   - `hazard_micro` — `d·10⁶ div n_risk`, the discrete hazard as an
    *     exact integer division (both engines truncate toward zero),
    *   - `cumhaz_micro` — the Nelson-Aalen cumulative hazard
    *     `Σ_{i≤t} d_i·10⁶ div n_i` (exact prefix of the exact hazards —
    *     the standard estimator alongside KM, free on the same scan),
    *   - `km_log2fx` — the Kaplan-Meier LOG-survival
    *     `log2(Ŝ(t)) · 2²⁰ ≈ Σ_{i≤t} [L(n_i−d_i) − L(n_i)]` with L the
    *     fixed-point [[graft.expr.Log2Fixed]] — exact integer in/out, so
    *     the cumulative product needs no engine-dependent float fold;
    *     NULL from the first time where everyone at risk dies (Ŝ = 0,
    *     log undefined) — `km_zero` = 1 marks those rows.
    *
    * Scale shape: one value-keyed aggregate (map-side combined) over
    * subjects, then TWO [[ExperimentOps.prefixByValue]] passes over the
    * distinct-duration frame — the first turns "units leaving at t" into
    * "units at risk at t", the second accumulates the log-survival
    * increments. Both are bucketed two-phase scans; an unbounded
    * duration domain degrades to more buckets, never a one-task sort.
    */
  def kmLifeTable(subjects: DataFrame, duration: Column, event: Column): DataFrame = {
    val subj = subjects
      .select(duration.cast("long").as("v"), event.cast("long").as("e"))
      .filter(col("v").isNotNull && col("v") >= 0L && col("e").isin(0L, 1L))
    val byv = subj.groupBy("v").agg(
      count(lit(1)).as("cnt"), sum(col("e")).as("d"))
    val risk = ExperimentOps.prefixByValue(byv, Seq("cnt"))
      .select(col("v"), col("cnt"), col("d"),
        (col("tot_cnt") - col("pre_cnt")).as("n_risk"))
    // Log-survival increment at t: 0 when no deaths; L(n−d) − L(n) when
    // survivors remain; 0 (with the `dead` flag raised) when d == n_risk,
    // so sum() never swallows a NULL and extinction is tracked exactly.
    val withInc = risk.select(col("v"), col("cnt"), col("d"), col("n_risk"),
      expr("d * 1000000L div n_risk").as("hz"),
      when(col("d") === 0L || col("d") === col("n_risk"), lit(0L))
        .otherwise(MathExprs.log2Fixed(col("n_risk") - col("d")) -
          MathExprs.log2Fixed(col("n_risk"))).as("dlog"),
      (col("d") === col("n_risk") && col("d") > 0L).cast("long").as("dead"))
    ExperimentOps.prefixByValue(withInc, Seq("hz", "dlog", "dead"))
      .select(col("v").as("t"), col("n_risk"), col("d"),
        (col("cnt") - col("d")).as("c"),
        col("hz").as("hazard_micro"),
        (col("pre_hz") + col("hz")).as("cumhaz_micro"),
        when(col("pre_dead") + col("dead") === 0L,
          col("pre_dlog") + col("dlog")).as("km_log2fx"),
        ((col("pre_dead") + col("dead")) > 0L).cast("int").as("km_zero"))
  }

  /** Two-group log-rank test, emitted as per-event-time terms (the
    * q_chisq convention: each row closes its own divisions in a fixed
    * IEEE chain; the scalar statistic
    * `z² = (Σ term_oe)² / Σ term_var` is the consumer's one cheap fold,
    * so no cross-time double summation order needs pinning).
    *
    * At each time t with d > 0 deaths: `term_oe = d_a − d·n_a/n` (the
    * observed-minus-expected group-A deaths under H₀) and
    * `term_var = d·(n−d)·n_a·(n−n_a) / (n²·(n−1))` (the hypergeometric
    * variance). Both close as all-double fixed chains — the welchT
    * overflow discipline: `d·n_a` as a long product would overflow int64
    * at corpus scale.
    *
    * Scale shape: identical to [[kmLifeTable]] — one value-keyed
    * aggregate, one two-phase prefix scan for the at-risk counts.
    */
  def logRankTerms(
      subjects: DataFrame, duration: Column, event: Column,
      isA: Column): DataFrame = {
    val subj = subjects.select(
      duration.cast("long").as("v"), event.cast("long").as("e"),
      isA.cast("boolean").as("a"))
      .filter(col("v").isNotNull && col("v") >= 0L &&
        col("e").isin(0L, 1L) && col("a").isNotNull)
    val byv = subj.groupBy("v").agg(
      count(lit(1)).as("cnt"),
      sum(col("a").cast("long")).as("cnt_a"),
      sum(col("e")).as("d"),
      sum(when(col("a"), col("e")).otherwise(0L)).as("d_a"))
    val risk = ExperimentOps.prefixByValue(byv, Seq("cnt", "cnt_a"))
      .select(col("v").as("t"), col("d"), col("d_a"),
        (col("tot_cnt") - col("pre_cnt")).as("n"),
        (col("tot_cnt_a") - col("pre_cnt_a")).as("n_a"))
      .filter(col("d") > 0L)
    val dD = col("d").cast("double")
    val nD = col("n").cast("double")
    val naD = col("n_a").cast("double")
    risk.select(col("t"), col("n"), col("n_a"), col("d"), col("d_a"),
      (col("d_a").cast("double") - dD * naD / nD).as("term_oe"),
      when(col("n") > 1L,
        dD * (col("n") - col("d")).cast("double") * naD *
          (col("n") - col("n_a")).cast("double") /
          (nD * nD * (col("n") - 1L).cast("double"))).as("term_var"))
  }

  /** Group-sequential A/B monitoring: the pooled two-proportion z² of
    * [[ExperimentOps.abTest]] evaluated at each of K interim looks, each
    * compared against a constant Pocock boundary — the "peek K times
    * without inflating α" discipline an always-on experiment dashboard
    * needs.
    *
    * `units` carries one row per experiment unit; `entryDay` is the day
    * the unit entered observation, `convDay` the day it converted (NULL
    * = never). At look day L only units with `entryDay <= L` are in the
    * denominator and only conversions with `convDay <= L` count —
    * cumulative by construction, so the K looks are a consistent
    * monotone filtration of one assignment.
    *
    * Output: one row per look — exact-long `(n_a, x_a, n_b, x_b)`, the
    * fixed-chain `z2`, `crossed` (z² >= `z2Crit`), and `stop_look` (the
    * FIRST crossing look, broadcast onto every row; NULL = never stops).
    *
    * Scale shape: units map-side explode ×K (the permutationTest
    * replicate shape) and collapse through ONE partial-aggregated
    * groupBy(look) — the Exchange moves K·partials, never units. The
    * stop_look window runs over the K-row look frame (hypothesis-bounded,
    * the q_fdr_bh argument).
    */
  def seqMonitor(
      units: DataFrame, idCol: Column, entryDay: Column, convDay: Column,
      looks: Seq[Long], z2Crit: Double = PocockZ2CritK4): DataFrame = {
    require(looks.nonEmpty && looks == looks.sorted && looks.distinct == looks,
      s"looks must be sorted distinct: $looks")
    val armed = units.select(
      ExperimentOps.armOf(idCol, 2).as("arm"),
      entryDay.cast("long").as("entry"), convDay.cast("long").as("conv"))
      .filter(col("entry").isNotNull)
    val perLook = armed
      .select(col("arm"), col("entry"), col("conv"),
        explode(array(looks.map(lit(_)): _*)).as("look"))
      .filter(col("entry") <= col("look"))
      .groupBy(col("look"))
      .agg(
        count(when(col("arm") === 0, 1L)).as("n_a"),
        count(when(col("arm") === 1, 1L)).as("n_b"),
        sum(when(col("arm") === 0 && col("conv") <= col("look"), 1L)
          .otherwise(0L)).as("x_a"),
        sum(when(col("arm") === 1 && col("conv") <= col("look"), 1L)
          .otherwise(0L)).as("x_b"))
    val ra = col("x_a").cast("double") / col("n_a").cast("double")
    val rb = col("x_b").cast("double") / col("n_b").cast("double")
    val pool = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val z2 = (ra - rb) * (ra - rb) /
      (pool * (lit(1.0) - pool) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double")))
    val scored = perLook.select(col("look"),
      col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      when(col("n_a") > 0L && col("n_b") > 0L &&
        col("x_a") + col("x_b") > 0L &&
        col("x_a") + col("x_b") < col("n_a") + col("n_b"), z2).as("z2"))
    val lookFrame = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored.select(col("look"), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      col("z2"),
      coalesce((col("z2") >= z2Crit).cast("int"), lit(0)).as("crossed"),
      min(when(col("z2") >= z2Crit, col("look"))).over(lookFrame)
        .as("stop_look"))
  }

  /** Two-period difference-in-differences over a balanced unit-period
    * panel: `cells` carries one row per (unit, period) with the treated
    * flag, the post-period flag, and the outcome `y` (exact long —
    * cents). Output is ONE row: the four cell counts and sums (exact
    * longs), the four means (one correctly-rounded division each), and
    * `did = (m_t_post − m_t_pre) − (m_c_post − m_c_pre)` — a fixed
    * four-term double chain over already-closed means, the
    * stratifiedEffect consumer-fold discipline.
    *
    * Scale shape: ONE map-side-combined aggregate to a single summary
    * row; the Exchange moves 8 longs per partition.
    */
  def did(cells: DataFrame, isTreat: Column, isPost: Column, y: Column): DataFrame = {
    val v = cells.select(
      isTreat.cast("boolean").as("tr"), isPost.cast("boolean").as("po"),
      y.cast("long").as("y"))
      .filter(col("tr").isNotNull && col("po").isNotNull && col("y").isNotNull)
    def cell(tr: Boolean, po: Boolean, sfx: String) = Seq(
      count(when(col("tr") === tr && col("po") === po, 1L)).as(s"n_$sfx"),
      sum(when(col("tr") === tr && col("po") === po, col("y")).otherwise(0L))
        .as(s"s_$sfx"))
    val cells8 = cell(true, false, "t_pre") ++ cell(true, true, "t_post") ++
      cell(false, false, "c_pre") ++ cell(false, true, "c_post")
    val sums = v.agg(cells8.head, cells8.tail: _*)
    def mean(sfx: String) = when(col(s"n_$sfx") > 0L,
      col(s"s_$sfx").cast("double") / col(s"n_$sfx").cast("double"))
    sums.select(
      col("n_t_pre"), col("s_t_pre"), col("n_t_post"), col("s_t_post"),
      col("n_c_pre"), col("s_c_pre"), col("n_c_post"), col("s_c_post"),
      mean("t_pre").as("m_t_pre"), mean("t_post").as("m_t_post"),
      mean("c_pre").as("m_c_pre"), mean("c_post").as("m_c_post"),
      ((mean("t_post") - mean("t_pre")) -
        (mean("c_post") - mean("c_pre"))).as("did"))
  }
}
