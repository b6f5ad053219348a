package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "know your corpus" report every
  * large-scale ingest runs before (and after) a pipeline: per column, the
  * row count, null count, exact distinct cardinality, and stringified
  * min/max. The reference prints per-variable fill/valid-range summaries
  * when reading granules (`aggregate_functions.py` attribute handling);
  * this is the same contract generalized to any table.
  *
  * Two formulations with different scale trade-offs:
  *
  *   - [[profile]] (exact): a UNION of per-column single-column
  *     aggregates. Each leg's parquet scan prunes to ONE column, so the
  *     total bytes read across all legs equal one full-width scan, and
  *     each `count(DISTINCT c)` plans as partial-dedup per partition →
  *     a shuffle of DISTINCT VALUES only (never rows). Legs are
  *     independent — on a cluster they run concurrently.
  *   - [[profileApprox]] (scale path): ONE pass, ONE pruned scan, zero
  *     row shuffle — every column's count/nulls/min/max plus an HLL
  *     `approx_count_distinct` buffer ride a single partial/final global
  *     aggregate. At 100 TB exact dedup of a high-cardinality column
  *     (doc ids: every value distinct) shuffles the full key set;
  *     the HLL buffer is constant-size per column no matter the
  *     cardinality. ProfileOpsSpec pins approx-vs-exact relative error.
  */
object ProfileOps {

  /** Exact profile: one output row per requested column:
    * `(col_name, n_rows, n_null, n_distinct, min_val, max_val)`.
    * min/max are computed on the native type (so numeric columns order
    * numerically, not lexically) and stringified afterwards.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    cols.map { c =>
      df.select(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
    }.reduce(_.unionByName(_))
  }

  /** Single-pass approximate profile: same shape as [[profile]] but
    * `n_distinct` is HLL-estimated (`rsd` relative error) and all columns
    * share one aggregate over one scan. The frame stays distributed until
    * the final K-row result.
    */
  def profileApprox(
      df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dst_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    // Pivot the 1-row wide aggregate to K rows with a row-local stack —
    // no shuffle; the aggregate result is a single row.
    val legs = cols.map { c =>
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_null"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(legs: _*)).as("p")).select(col("p.*"))
  }

  /** Robust outlier report per group: median + MAD (median absolute
    * deviation) of an integer fixed-point column, and the count of points
    * with `|x - med| > scaleNumer/10000 · MAD` (pass 44780 for the
    * conventional 3·1.4826·σ-consistent rule; the factor arrives as an
    * exact integer ratio so both engines multiply the same literals).
    * MAD-based flags survive the heavy tails that wreck mean/std rules —
    * one wild sensor value moves a mean arbitrarily but the median not
    * at all.
    *
    * Exactness: `cents` is int64; the group median interpolates to the
    * half grid and deviations to the quarter grid — all exact binary
    * fractions, so both medians, every deviation, and the single
    * comparison multiply are bit-portable.
    *
    * Scale shape: three group-keyed passes (median → MAD over
    * deviations → outlier count), the group-sized median/MAD frames
    * hash-joined back — Spark broadcasts them when small. Exact medians
    * sort each group once per pass; at billion-row groups swap
    * `percentile` for `approx_percentile` (the q_quantiles trade).
    * Output: (group, n, med, mad, n_outliers).
    */
  def madOutliers(
      df: DataFrame,
      groupCol: Column,
      centsCol: Column,
      scaleNumer: Long = 44780L): DataFrame = {
    val base = df.select(groupCol.as("group"), centsCol.as("__c"))
    val meds = base.groupBy(col("group"))
      .agg(percentile(col("__c"), lit(0.5)).as("med"))
    // broadcast the GROUP-sized frames explicitly: the static estimate for
    // a percentile aggregate is unknown-large while a small fact scan
    // estimates under the broadcast threshold, so the planner broadcast
    // the CORPUS side instead (q_mad_outliers' plan shipped the 20 MiB
    // event projection and streamed the 5-row median frame past it) —
    // and at corpus scale that mis-pick degrades to shuffling the fact
    // by group. The hint keeps the fact side a pure map at any scale.
    val dev = base.join(broadcast(meds), "group")
      .withColumn("__dev", abs(col("__c").cast("double") - col("med")))
    val mads = dev.groupBy(col("group"))
      .agg(percentile(col("__dev"), lit(0.5)).as("mad"))
    // threshold as an exact integer ratio: dev·10000 > numer·mad is one
    // correctly-rounded multiply per side — engine-portable, no 1.4826
    // rounding drift
    dev.join(broadcast(mads), "group")
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("__dev") * 10000.0 > col("mad") * scaleNumer.toDouble, 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Join/group-key skew report — the diagnostic you run BEFORE deciding
    * whether a 100 TB join needs [[JoinOps.saltedJoin]]: one row with
    * the key cardinality, total rows, max/median/p99 group sizes, the
    * max/median skew ratio, and the top-`k` hottest keys (as a
    * `"key:count"` CSV so the report row stays flat).
    *
    * Scale shape: the per-key count is the only corpus-sized shuffle
    * (map-side combined). Everything after runs on the KEY-sized frame:
    * the hot-key list is a bounded partial top-k aggregate and the
    * rank-based percentiles pay one key-sized sort — rank selection, not
    * interpolation, so the report is integer-exact and engine-portable.
    */
  /** Pearson chi-square contingency terms for two categorical columns —
    * the statistical-DQ check for "did lang mix shift per source" /
    * "are these two attributes independent". Per cell: observed count,
    * expected count under independence, and the chi-square term
    * (o − e)²/e; the test statistic is the sum of terms and the
    * degrees-of-freedom is (|rows|−1)(|cols|−1) — both left to the
    * consumer, because a double Σ over cells is reduction-order-
    * dependent while each TERM is engine-portable: computed as the
    * rational (o·N − r·c)² / (N·r·c) — exact int64 numerator and
    * denominator, ONE correctly-rounded closing division (same for
    * e = r·c/N). Headroom: needs (o·N − r·c)² < 2^63, i.e. cell·N
    * products below ~3·10^9 — past that, pre-aggregate or go
    * DECIMAL(38).
    *
    * Scale shape: one map-side-combined cell count (the only
    * corpus-sized shuffle), then margins via two tiny windows over the
    * CELL frame (|A|·|B| rows) — the input is scanned once.
    *
    * Output: (a, b, o, e, chi_term).
    */
  def chiSquareCells(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
    val wA = org.apache.spark.sql.expressions.Window.partitionBy(col("a"))
    val wB = org.apache.spark.sql.expressions.Window.partitionBy(col("b"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    cells
      .withColumn("r", sum(col("o")).over(wA))
      .withColumn("c", sum(col("o")).over(wB))
      .withColumn("n", sum(col("o")).over(wAll))
      .withColumn("__dev", col("o") * col("n") - col("r") * col("c"))
      .select(col("a"), col("b"), col("o"),
        ((col("r") * col("c")).cast("double") / col("n").cast("double"))
          .as("e"),
        ((col("__dev") * col("__dev")).cast("double") /
          (col("n") * col("r") * col("c")).cast("double")).as("chi_term"))
  }

  /** Gini concentration coefficient of a non-negative integer measure
    * within each group — "how unevenly are the bytes/tokens spread over
    * this source's documents" (0 = perfectly even, →1 = one document
    * holds everything). The corpus-balance number a mixture plan
    * ([[SamplingOps.temperatureMixturePlan]]) is usually reacting to.
    *
    * Exact rank formulation over values sorted ascending with ranks
    * 1..n: G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) — every sum is
    * int64 (reduction-order-proof; needs n·Σx < 2^63) and the single
    * closing division is one correctly-rounded IEEE op, so the score is
    * bit-portable. Ties are harmless: exchanging equal values across
    * adjacent ranks leaves Σ i·x_i unchanged.
    *
    * Scale shape: ONE group-keyed window sort (rank) feeding one
    * map-side-combined aggregate on the same key — single Exchange.
    * Groups with Σx = 0 report NULL (concentration is undefined).
    *
    * Output: (group, n, total, gini).
    */
  def giniByGroup(df: DataFrame, groupCol: Column, xCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__x"), col("__rk"))
    df.select(groupCol.as("__g"), xCol.cast("long").as("__x"),
        monotonically_increasing_id().as("__rk"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col("__g").as("group"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__ixsum"))
      .select(col("group"), col("n"), col("total"),
        when(col("total") > 0L,
          (lit(2L) * col("__ixsum") - (col("n") + 1L) * col("total"))
            .cast("double") / (col("n") * col("total")).cast("double"))
          .as("gini"))
  }

  /** Shared ln 2 literal for converting fixed-point log2 readouts to
    * nats — computed nowhere (the [[ExperimentOps.MwZ2Crit]] contract).
    */
  val Ln2: Double = 0.6931471805599453

  /** G-test of independence (likelihood-ratio χ²) over a contingency
    * table with LITERAL axes — [[chiSquareCells]]' omnibus companion,
    * preferred at low expected counts where Pearson's (O−E)²/E terms
    * explode: `G = 2·Σ O·ln(O·N/(R·C))`. Float-free core: each cell
    * term `O·(lg(O·N) − lg(R·C))` runs on the codegen'd fixed-point
    * log2 (the [[theilByGroup]] / keyness machinery), accumulates in
    * DECIMAL(38,0), and `g_log2fx = 2·Σterms` is an exact integer. The
    * nats readout multiplies by the shared [[Ln2]] literal over 2^20 —
    * ONE fixed double chain — and compares to the caller's χ²_df
    * literal. With both level lists literal, df = (|A|−1)·(|B|−1) is a
    * plan constant; `significant` is NULL unless every listed level is
    * populated on both axes (df would shift otherwise, the
    * kruskalWallis guard). Empty cells contribute exactly 0 (the
    * O·ln O → 0 limit).
    *
    * Scale shape: ONE map-side-combined cell count over the corpus;
    * marginals as partitioned windows on the (|A|·|B|)-bounded cell
    * frame; a 1-row fold. Value contract: `n·max(O) < 2^63` for the lg
    * arguments.
    *
    * Output: `(n, df, g_log2fx, g_nats, significant)`.
    */
  def gTest(
      df: DataFrame, aCol: Column, bCol: Column,
      aLevels: Seq[String], bLevels: Seq[String],
      chi2Crit: Double): DataFrame = {
    require(aLevels.size >= 2 && bLevels.size >= 2, "gTest needs 2x2+")
    require(aLevels.distinct.size == aLevels.size &&
      bLevels.distinct.size == bLevels.size, "duplicate levels")
    val dec = "decimal(38,0)"
    val cells = df
      .select(aCol.cast("string").as("a"), bCol.cast("string").as("b"))
      .filter(col("a").isInCollection(aLevels) &&
        col("b").isInCollection(bLevels))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val wA = org.apache.spark.sql.expressions.Window.partitionBy(col("a"))
    val wB = org.apache.spark.sql.expressions.Window.partitionBy(col("b"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val marg = cells
      .withColumn("r", sum(col("o")).over(wA))
      .withColumn("c", sum(col("o")).over(wB))
      .withColumn("nn", sum(col("o")).over(wAll))
    val term = col("o").cast(dec) *
      (graft.expr.MathExprs.log2Fixed(col("o") * col("nn")) -
        graft.expr.MathExprs.log2Fixed(col("r") * col("c"))).cast(dec)
    val m = marg.agg(
      coalesce(max(col("nn")), lit(0L)).as("n"),
      countDistinct(col("a")).as("ka"),
      countDistinct(col("b")).as("kb"),
      coalesce(sum(term), lit(0L).cast(dec)).as("num"))
    val g2fx = (lit(2L).cast(dec) * col("num")).cast("long")
    val gNats = g2fx.cast("double") * Ln2 / 1048576.0
    val allLevels = col("ka") === aLevels.size.toLong &&
      col("kb") === bLevels.size.toLong
    m.select(
      col("n"),
      lit(((aLevels.size - 1) * (bLevels.size - 1)).toLong).as("df"),
      g2fx.as("g_log2fx"), gNats.as("g_nats"),
      when(allLevels, (gNats >= chi2Crit).cast("int")).as("significant"))
  }

  /** Theil T inequality index of a positive measure within each group —
    * [[giniByGroup]]'s information-theoretic twin on the identical
    * frame: `T = Σ (x_i/X)·ln(x_i·n/X)` (0 = perfectly even,
    * ln n = one row holds everything), the decomposable index a mixture
    * planner prefers when it wants between/within additivity. Reported
    * in fixed-point log2 units (×2^20) with NO libm: the per-row term
    * `x·(lg(x·n) − lg(X))` runs on the codegen'd
    * [[graft.expr.MathExprs.log2Fixed]], terms accumulate in
    * DECIMAL(38,0) (x·lg products outgrow int64 at corpus scale), and
    * the single closing division is a sign-split intdiv by X
    * (division-direction-proof; fixed-point flooring can push a
    * near-zero sum marginally negative). Nats = theil_log2fx · ln 2 /
    * 2^20, left to the consumer (the bucketDrift no-libm discipline).
    *
    * Rows with x ≤ 0 are excluded (x·ln x → 0 mass; zero rows carry
    * nothing). Value contract: `n·max(x) < 2^63` (the welchT bound) for
    * the lg argument.
    *
    * Scale shape: one partitioned totals window over the measure frame,
    * row-local lg terms, one group fold — single Exchange on the group
    * key.
    *
    * Output: `(group, n, total, theil_log2fx)`.
    */
  def theilByGroup(
      df: DataFrame, groupCol: Column, xCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val dec = "decimal(38,0)"
    val base = df.select(groupCol.as("g"), xCol.cast("long").as("x"))
      .filter(col("g").isNotNull && col("x") > 0L)
      .withColumn("nn", count(lit(1)).over(w))
      .withColumn("tot", sum(col("x")).over(w))
    val term = col("x").cast(dec) *
      (graft.expr.MathExprs.log2Fixed(col("x") * col("nn")) -
        graft.expr.MathExprs.log2Fixed(col("tot"))).cast(dec)
    base.groupBy(col("g").as("group")).agg(
      max(col("nn")).as("n"), max(col("tot")).as("total"),
      coalesce(sum(term), lit(0L).cast(dec)).as("num"))
      .select(col("group"), col("n"), col("total"),
        expr("""CASE WHEN num >= 0 THEN CAST(num DIV total AS BIGINT)
               ELSE -CAST((-num) DIV total AS BIGINT) END""")
          .as("theil_log2fx"))
  }

  /** Lorenz curve at deciles per group — the CURVE behind
    * [[giniByGroup]]'s scalar: for each decile k, the exact share of
    * the group's total mass held by the bottom k/10 of its rows
    * ("the bottom 70% of src3's documents hold 31% of its bytes").
    * Same exact-rank machinery as the Gini: rows rank ascending by
    * (value, row-id tiebreak) under a GROUP-PARTITIONED window,
    * cumulative mass rides the same window, the decile boundary row is
    * rank `(k·n) DIV 10`, and shares land exactly on the ×10⁶ grid.
    * Deciles whose boundary rank is 0 (n < 10) report share 0.
    *
    * Scale shape: one group-keyed window sort + one keyed join of the
    * 10-per-group boundary frame back onto the ranked rows — single
    * Exchange each, groups parallelize.
    *
    * Output: `(group, decile, boundary_rank, share_micro)` — 10 rows
    * per group with any mass.
    */
  def lorenzDeciles(
      df: DataFrame, groupCol: Column, xCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("x"), col("rk"))
    val ranked = df
      .select(groupCol.as("g"), xCol.cast("long").as("x"),
        monotonically_increasing_id().as("rk"))
      .filter(col("g").isNotNull && col("x").isNotNull)
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("x")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    val totals = ranked.groupBy(col("g")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("total"))
    val bounds = totals
      .select(col("g"), col("n"), col("total"),
        explode(sequence(lit(1), lit(10))).as("decile"))
      .withColumn("boundary_rank", expr("(decile * n) DIV 10"))
    bounds
      .join(ranked.select(col("g"), col("r").as("boundary_rank"),
        col("cum")), Seq("g", "boundary_rank"), "left")
      .select(col("g").as("group"), col("decile").cast("long").as("decile"),
        col("boundary_rank"),
        when(col("total") > 0L,
          coalesce(expr("(1000000 * cum) DIV total"), lit(0L)))
          .as("share_micro"))
  }

  /** Distribution drift of a numeric measure between a BASELINE slice
    * and the current slice, over FROZEN literal bucket boundaries (the
    * continuous-variable counterpart of [[chiSquareCells]]; the PSI /
    * KS-style report a feed monitor tracks day over day). Per bucket:
    * counts and exact fractions on both sides plus the fraction delta —
    * the PSI log terms are left to the consumer, because ln is not
    * correctly rounded on every engine/libm while counts, single
    * divisions, and one subtraction are bit-portable.
    *
    * Bucketing is ROW-LOCAL: bucket = Σ_i [x >= bnd_i] over the literal
    * interior boundaries (a codegen'd integer chain, no lookup join) —
    * B boundaries make B+1 buckets; values below every boundary land in
    * bucket 0, values past the last in bucket B, and drift INTO those
    * edge buckets is exactly the tail-shift signal. One map-side-
    * combined (bucket, side) count is the only corpus-sized shuffle;
    * totals ride a window over the bucket frame.
    *
    * Output: (bucket, base_n, cur_n, base_frac, cur_frac, frac_diff).
    */
  def bucketDrift(
      df: DataFrame,
      isBaseline: Column,
      xCol: Column,
      boundaries: Seq[Double]): DataFrame = {
    require(boundaries.nonEmpty, "need >= 1 interior boundary")
    require(boundaries == boundaries.sorted,
      s"boundaries must ascend: $boundaries")
    val bucket = boundaries.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(xCol >= b, 1L).otherwise(0L)
    }
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    df.select(bucket.as("bucket"), isBaseline.as("__base"))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("__base"), 1L).otherwise(0L)).as("base_n"),
        sum(when(!col("__base"), 1L).otherwise(0L)).as("cur_n"))
      .withColumn("__bt", sum(col("base_n")).over(wAll))
      .withColumn("__ct", sum(col("cur_n")).over(wAll))
      .select(col("bucket"), col("base_n"), col("cur_n"),
        (col("base_n").cast("double") / col("__bt").cast("double"))
          .as("base_frac"),
        (col("cur_n").cast("double") / col("__ct").cast("double"))
          .as("cur_frac"))
      .withColumn("frac_diff", col("cur_frac") - col("base_frac"))
  }

  /** Exact Pearson correlation of two integer-valued measures per group
    * (feature-drift / redundancy profiling: "is quantity still
    * price-linked per return flag"). Computed from the five integer
    * power sums (n, Σx, Σy, Σxy, Σx², Σy²) — one map-side-combined
    * aggregate, merge-order-proof — then the closed form
    * r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))
    * with every n·S and S·S product taken in DOUBLE (each sum cast
    * once, then a FIXED chain of correctly-rounded IEEE ops mirrored
    * token for token in the oracle) — n·Σy² routinely exceeds int64
    * under ANSI mode, and the double chain, while it can cancel, is
    * DETERMINISTIC and engine-identical, which is the property the
    * gate needs. Built-in `corr` is a float running accumulation —
    * reduction-order-dependent — which is why it is not used.
    * Headroom: the power SUMS themselves must fit int64
    * (n·max(x²) < 2^63 — pre-scale the measure, e.g. dollars not
    * cents, for wide-range columns); beyond, DECIMAL(38).
    * Degenerate groups (either variance 0) report NULL.
    *
    * Output: (group, n, r).
    */
  def corrByGroup(
      df: DataFrame,
      groupCol: Column,
      xCol: Column,
      yCol: Column): DataFrame = {
    val s = df.select(groupCol.as("group"),
        xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    def d(c: Column) = c.cast("double")
    val vx = d(col("n")) * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val vy = d(col("n")) * d(col("__syy")) - d(col("__sy")) * d(col("__sy"))
    s.select(col("group"), col("n"),
      when(vx > 0.0 && vy > 0.0,
        (d(col("n")) * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))) /
          sqrt(vx * vy)).as("r"))
  }

  /** Spearman rank correlation (tie-aware, via midranks) — the monotone
    * dependence readout [[corrByGroup]]'s Pearson can't give on skewed
    * or outlier-ridden metrics. Exact core: CENTERED DOUBLED midranks
    * `d = 2·pre + cnt − n` per distinct value (integers; they sum to 0
    * exactly for any tie profile, so the three Pearson moments collapse
    * to Σdxdy, Σdx², Σdy² with no mean subtraction), accumulated in
    * DECIMAL(38,0) (Σd² ≤ n³ outgrows int64 past ~10⁶ rows; 128-bit
    * sums are exact to 10³⁸ and both engines convert the same integer
    * to the same double), one closing ρ = Σdxdy/√(Σdx²·Σdy²) chain.
    *
    * Scale shape: per axis ONE value-keyed aggregate + the
    * [[ExperimentOps.prefixByValue]] two-phase bucketed scan (no
    * SinglePartition window over either value domain), value-keyed
    * joins back, one 1-row closing aggregate.
    *
    * Output: `(n, rho)`.
    */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val v = df.select(xCol.cast("long").as("xv"), yCol.cast("long").as("yv"))
      .filter(col("xv").isNotNull && col("yv").isNotNull)
    def centered(c: String): DataFrame = {
      val byv = v.select(col(c).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      ExperimentOps.prefixByValue(byv, Seq("cnt"))
        .select(col("v").as(c),
          (lit(2L) * col("pre_cnt") + col("cnt") - col("tot_cnt"))
            .as(s"d_$c"))
    }
    val r = v.join(centered("xv"), "xv").join(centered("yv"), "yv")
    val agg = r.agg(count(lit(1)).as("n"),
      sum((col("d_xv") * col("d_yv")).cast("decimal(38,0)")).as("sxy"),
      sum((col("d_xv") * col("d_xv")).cast("decimal(38,0)")).as("sxx"),
      sum((col("d_yv") * col("d_yv")).cast("decimal(38,0)")).as("syy"))
    agg.select(col("n"),
      when(col("sxx") > 0 && col("syy") > 0,
        col("sxy").cast("double") /
          sqrt(col("sxx").cast("double") * col("syy").cast("double")))
        .as("rho"))
  }

  def skewReport(df: DataFrame, keyCol: Column, topK: Int = 5): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt"), col("key"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    // NULL keys are dropped: they never match an inner join, and a null
    // group would poison the hot-key strings
    val ranked = df.filter(keyCol.isNotNull)
      .groupBy(keyCol.cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
      // rank + total share ONE SinglePartition pass over the KEY-sized
      // frame (row_number's global window) — the bound of this op: for
      // billion-key frames trade the exact percentiles for
      // approx_percentile and keep the rest
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
    // rank selection (k-th smallest): lower median and ceil(0.99 n) —
    // integer-exact, no interpolation; hottest keys are ranks n, n-1, …
    // (ties resolve to the greater key, mirrored by the oracle's
    // ORDER BY cnt DESC, key DESC)
    val hotLegs = (0 until topK).map(i =>
      max(when(col("r") === col("n") - i,
        concat(col("key"), lit(":"), col("cnt")))).as(s"__h$i"))
    val aggs = Seq(
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"),
      max(when(col("r") === expr("(n + 1) div 2"), col("cnt"))).as("p50_cnt"),
      max(when(col("r") === expr("(99 * n + 99) div 100"), col("cnt")))
        .as("p99_cnt")) ++ hotLegs
    ranked
      .agg(max(col("n")).as("n_keys"), aggs: _*)
      .select(col("n_keys"), col("n_rows"), col("max_cnt"),
        col("p50_cnt"), col("p99_cnt"),
        expr("max_cnt div greatest(p50_cnt, 1L)").as("skew_ratio"),
        concat_ws(",", (0 until topK).map(i => col(s"__h$i")): _*)
          .as("hot_keys"))
  }

  /** Cohen's kappa between two binary raters — chance-corrected
    * agreement, the standard check before trusting automated labelers
    * (two heuristic quality filters, or an LLM judge against a gold
    * rater): raw agreement po is inflated whenever both raters lean the
    * same way, κ = (po − pe)/(1 − pe) subtracts the chance floor.
    *
    * Exact arithmetic end to end: the four confusion cells and both
    * marginals are longs from ONE map-side-combined aggregate (a single
    * Exchange of one partial row per task); κ itself is the integer
    * rational `(n·(n11+n00) − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0))`
    * with one closing double division. Constant raters (pe = 1) and
    * empty input yield NULL κ. A NULL rater value is an ABSTENTION — the
    * row is dropped from both marginals (standard pairwise-complete
    * agreement); a NON-null value outside {0, 1} raises — a silently
    * coerced rater would fabricate agreement.
    *
    * Output (one row): `(n, n11, n10, n01, n00, po, pe, kappa)`.
    */
  /** Per-group KL divergence of the token distribution from the corpus
    * distribution — the mixture-drift diagnostic ("which source's
    * language moved away from the blend?"), in exact 2^-20 log2 fixed
    * point: for group s with token counts c_t, total n_s, corpus counts
    * C_t, total N,
    * `kl_sum = Σ_t c_t * ((L(c_t) + L(N)) - (L(n_s) + L(C_t)))`
    * = n_s * KL(P_s || P_corpus) in 2^-20 bits — emitted UNDIVIDED so no
    * integer division (whose direction would matter on the slightly-
    * negative sums fixed-point error can produce) enters the gate. The
    * corpus includes every group, so C_t > 0 wherever c_t > 0 — no
    * smoothing needed. L = the codegen'd integer
    * [[graft.expr.MathExprs.log2Fixed]]; the whole statistic replays in
    * SQL from scratch.
    *
    * Scale shape: one (group, token) count (map-side combined), corpus
    * counts derived from THAT vocabulary-sized frame (never a second
    * corpus pass), the 1-row grand total broadcast back. Output:
    * (group, n_tokens, kl_sum_fixed).
    */
  def tokenKlByGroup(
      docs: DataFrame,
      group: Column,
      textCol: String = "text"): DataFrame = {
    import graft.expr.MathExprs.log2Fixed
    val st = docs
      .select(group.as("grp"),
        explode(TextOps.tokens(lower(col(textCol)))).as("tk"))
      .groupBy(col("grp"), col("tk"))
      .agg(count(lit(1)).as("c"))
    val ct = st.groupBy(col("tk")).agg(sum(col("c")).as("ctot"))
    val ns = st.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val nn = st.agg(sum(col("c")).as("nt")) // 1-row grand total
    st.join(ct, "tk")
      .join(ns, "grp")
      .crossJoin(broadcast(nn))
      .select(col("grp"),
        col("n"),
        (col("c") * ((log2Fixed(col("c")) + log2Fixed(col("nt"))) -
          (log2Fixed(col("n")) + log2Fixed(col("ctot"))))).as("term"))
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n_tokens"), sum(col("term")).as("kl_sum_fixed"))
      .select(col("grp").as("group"), col("n_tokens"), col("kl_sum_fixed"))
  }

  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    def dom(c: Column, side: String) = {
      when(c.isin(0L, 1L), c).otherwise(raise_error(concat(
        lit(s"cohenKappa: rater $side outside {0,1}: "), c.cast("string"))))
    }
    val cells = df
      .select(raterA.cast("long").as("a0"), raterB.cast("long").as("b0"))
      .filter(col("a0").isNotNull && col("b0").isNotNull)
      .select(dom(col("a0"), "A").as("a"), dom(col("b0"), "B").as("b"))
    val m = cells.agg(
      count(lit(1)).as("n"),
      coalesce(sum((col("a") * col("b"))), lit(0L)).as("n11"),
      coalesce(sum(col("a") * (lit(1L) - col("b"))), lit(0L)).as("n10"),
      coalesce(sum((lit(1L) - col("a")) * col("b")), lit(0L)).as("n01"),
      coalesce(sum((lit(1L) - col("a")) * (lit(1L) - col("b"))), lit(0L))
        .as("n00"))
    val a1 = col("n11") + col("n10")
    val b1 = col("n11") + col("n01")
    val chance = a1 * b1 + (col("n") - a1) * (col("n") - b1)
    val num = col("n") * (col("n11") + col("n00")) - chance
    val den = col("n") * col("n") - chance
    m.select(
      col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      when(col("n") > 0,
        (col("n11") + col("n00")).cast("double") / col("n")).as("po"),
      when(col("n") > 0,
        chance.cast("double") / (col("n") * col("n"))).as("pe"),
      when(den > 0, num.cast("double") / den.cast("double")).as("kappa"))
  }

  /** Herfindahl-Hirschman concentration of a group column — the
    * one-number "is this corpus dominated by a few sources?" readout a
    * mixture planner checks before weighting (HHI = Σ share², and
    * 1/HHI is the effective number of equally-sized sources). Shares
    * are pre-truncated micro integers (`c·10^6 div N` — the defined
    * semantics both engines replay exactly), so the sum is order-free:
    *
    *   hhi_micro ≈ 10^6·Σ share²      effective = 10^12 / hhi_micro
    *
    * ONE map-side-combined count; totals ride the [[graft.ops
    * .EstimatorOps.looDeltas]] whole-frame window over the groups-sized
    * frame. NULL group keys count as their own group (a real source
    * bucket in practice). Output ONE row:
    * `(n_units, n_groups, hhi_micro, effective_groups_micro)`.
    */
  def concentration(df: DataFrame, group: Column): DataFrame = {
    val per = df.groupBy(group.as("g")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy()
    per
      .withColumn("n", sum(col("c")).over(w))
      .withColumn("share_micro", expr("(c * 1000000) div n"))
      .agg(
        coalesce(sum(col("c")), lit(0L)).as("n_units"),
        count(lit(1)).as("n_groups"),
        coalesce(expr("sum(share_micro * share_micro) div 1000000"),
          lit(0L)).as("hhi_micro"))
      .withColumn("effective_groups_micro",
        when(col("hhi_micro") > 0,
          expr("1000000000000 div hhi_micro")))
  }

  /** Fleiss' kappa for THREE binary raters (Fleiss 1971) — chance-
    * corrected agreement when more than two automated judges vote on
    * every item (the multi-rater extension of [[cohenKappa]]). With
    * c_i = the item's positive-vote count (0..3):
    *
    *   P_i  = (c_i² + (3−c_i)² − 3) / 6          per-item agreement
    *   P̄    = A / (6N)          with A = Σ_i (c_i² + (3−c_i)² − 3)
    *   P̄_e  = (S² + (3N−S)²) / (9N²)             with S = Σ_i c_i
    *   κ    = (3N·A − 2B) / (18N² − 2B)          with B = S² + (3N−S)²
    *
    * — one exact-integer rational (the ×18N² clearing keeps every term
    * a product of longs) with a single closing IEEE division, the
    * [[cohenKappa]] discipline. Degenerate panels (P̄_e = 1: every vote
    * identical) yield NULL κ. ONE map-side-combined aggregate; int64
    * holds the clearing up to N ≈ 7·10^8 items — beyond that, lift the
    * closing algebra (not the corpus pass) to DECIMAL(38,0).
    *
    * Raters outside {0,1} fail loudly (the [[cohenKappa]] domain guard);
    * items where any rater is NULL are excluded.
    */
  def fleissKappa3(
      df: DataFrame, r1: Column, r2: Column, r3: Column): DataFrame = {
    def dom(c: Column, side: String) =
      when(c.isin(0L, 1L), c).otherwise(raise_error(concat(
        lit(s"fleissKappa3: rater $side outside {0,1}: "), c.cast("string"))))
    val c = df
      .select(r1.cast("long").as("a0"), r2.cast("long").as("b0"),
        r3.cast("long").as("c0"))
      .filter(col("a0").isNotNull && col("b0").isNotNull && col("c0").isNotNull)
      .select((dom(col("a0"), "1") + dom(col("b0"), "2") +
        dom(col("c0"), "3")).as("c"))
    val m = c.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("c")), lit(0L)).as("s"),
      coalesce(sum(col("c") * col("c") +
        (lit(3L) - col("c")) * (lit(3L) - col("c")) - lit(3L)), lit(0L))
        .as("a"))
    val b = col("s") * col("s") +
      (lit(3L) * col("n") - col("s")) * (lit(3L) * col("n") - col("s"))
    val num = lit(3L) * col("n") * col("a") - lit(2L) * b
    val den = lit(18L) * col("n") * col("n") - lit(2L) * b
    m.select(
      col("n").as("n_items"), col("s").as("s_sum"), col("a").as("a_sum"),
      when(col("n") > 0,
        col("a").cast("double") / (lit(6L) * col("n")).cast("double"))
        .as("p_bar"),
      when(col("n") > 0,
        b.cast("double") / (lit(9L) * col("n") * col("n")).cast("double"))
        .as("p_e"),
      when(den > 0, num.cast("double") / den.cast("double")).as("kappa"))
  }

  /** Exact weighted median per group — the robust location statistic
    * (token-weighted document length, quantity-weighted price) that a
    * plain median misreports whenever weights are uneven. Lower weighted
    * median: the smallest value v whose inclusive cumulative weight
    * reaches half the group total (`2·cum(v) >= W`) — pure selection,
    * no interpolation arithmetic, so the answer is a value FROM the
    * data and bit-portable by construction (the q_quality_filter
    * discipline).
    *
    * Scale shape: ONE (group, value)-keyed map-side-combined aggregate
    * collapses rows to the distinct-value frame; the cumulative weights
    * ride [[ExperimentOps.prefixByValueGrouped]] — the two-phase
    * bucketed scan partitioned by group, so no SinglePartition window
    * touches any value domain, grouped or not; the closing argmin is a
    * groups-sized aggregate. Rows with non-positive weight are excluded
    * (a zero-weight row must not shift the median).
    *
    * Output per group: `(group, w_median, w_total, n_upper)` — `n_upper`
    * counts the distinct values from the median upward (the filtered
    * frame's size; a free selectivity diagnostic).
    */
  def weightedMedianByGroup(
      df: DataFrame, group: Column, value: Column,
      weight: Column): DataFrame = {
    val byv = df
      .select(group.as("g"), value.cast("long").as("v"),
        weight.cast("long").as("w0"))
      .filter(col("g").isNotNull && col("v").isNotNull && col("w0") > 0L)
      .groupBy(col("g"), col("v"))
      .agg(sum(col("w0")).as("w"))
    ExperimentOps.prefixByValueGrouped(byv, Seq("g"), Seq("w"))
      .filter(lit(2L) * (col("pre_w") + col("w")) >= col("tot_w"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("w_median"), max(col("tot_w")).as("w_total"),
        count(lit(1)).as("n_upper"))
      .select(col("g").as("group"), col("w_median"), col("w_total"),
        col("n_upper"))
  }

  /** Jensen-Shannon divergence between the token distributions of two
    * document slices — the SYMMETRIC, always-finite drift readout
    * [[tokenKlByGroup]] cannot give (KL blows up on tokens absent from
    * the reference; JS's mixture midpoint never does, which is why
    * mixture planners and drift monitors prefer it).
    *
    * Engine-exact: with integer token counts a_t/b_t and totals A/B,
    * each side's undivided contribution is
    *
    *   a_t · [L(a_t) − L(A) − L(a_t·B + b_t·A) + L(2·A·B)]
    *
    * (the `p·log2(p/m)` term cleared of divisions), L the fixed-point
    * [[graft.expr.Log2Fixed]] — exact int64 in/out, summed exactly; the
    * closing `js_bits = ((sa/A) + (sb/B)) / 2 / 2²⁰` is one fixed IEEE
    * chain. Zero-count sides contribute nothing (their multiplier is 0),
    * so JS stays finite on disjoint vocabularies by construction.
    * Value contract: `a_t·B + b_t·A` and `2·A·B` must fit int64 —
    * per-slice token totals below ~2·10⁹ (slice-vs-slice audits); ANSI
    * mode raises loudly on breach.
    *
    * Scale shape: one explode + ONE token-keyed map-side-combined
    * aggregate with conditional sums (never a per-slice self-join);
    * totals are a 1-row broadcast; the term sum is a second 1-row
    * aggregate. Output ONE row:
    * `(n_a, n_b, vocab, js_a_fixed, js_b_fixed, js_bits)`.
    */
  def tokenJsDivergence(
      docs: DataFrame, isA: Column, isB: Column,
      textCol: String = "text"): DataFrame = {
    import graft.expr.MathExprs.log2Fixed
    val tok = docs
      .select(isA.cast("boolean").as("ia"), isB.cast("boolean").as("ib"),
        explode(TextOps.tokens(lower(col(textCol)))).as("tk"))
      .filter(col("ia") || col("ib"))
      .groupBy(col("tk"))
      .agg(sum(when(col("ia"), 1L).otherwise(0L)).as("a"),
        sum(when(col("ib"), 1L).otherwise(0L)).as("b"))
    val totals = tok.agg(
      coalesce(sum(col("a")), lit(0L)).as("na"),
      coalesce(sum(col("b")), lit(0L)).as("nb"))
    val terms = tok.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        when(col("a") > 0L, col("a") *
          ((log2Fixed(col("a")) - log2Fixed(col("na"))) -
            log2Fixed(col("a") * col("nb") + col("b") * col("na")) +
            log2Fixed(lit(2L) * col("na") * col("nb"))))
          .otherwise(0L).as("ta"),
        when(col("b") > 0L, col("b") *
          ((log2Fixed(col("b")) - log2Fixed(col("nb"))) -
            log2Fixed(col("a") * col("nb") + col("b") * col("na")) +
            log2Fixed(lit(2L) * col("na") * col("nb"))))
          .otherwise(0L).as("tb"))
    terms
      .groupBy(col("na"), col("nb"))
      .agg(count(lit(1)).as("vocab"),
        coalesce(sum(col("ta")), lit(0L)).as("js_a_fixed"),
        coalesce(sum(col("tb")), lit(0L)).as("js_b_fixed"))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("vocab"),
        col("js_a_fixed"), col("js_b_fixed"),
        when(col("na") > 0L && col("nb") > 0L,
          (col("js_a_fixed").cast("double") / col("na").cast("double") +
            col("js_b_fixed").cast("double") / col("nb").cast("double")) /
            lit(2.0) / lit(1048576.0)).as("js_bits"))
  }

  /** Weight-of-evidence encoding + information value — the risk-modeling
    * categorical readout ("how strongly does this category separate the
    * label, and how much signal does the whole column carry"). Base-2
    * WOE on the exact fixed-point grid: with +1 Laplace cells
    * (`sp = pos+1`, `sn = neg+1`, `SP = P+k`, `SN = N+k`, k = category
    * count — smoothed probabilities still sum to 1),
    *
    *   woe_fixed = (L(sp) − L(SP)) − (L(sn) − L(SN))
    *
    * L the 2²⁰ fixed-point [[graft.expr.Log2Fixed]] — exact int64 on
    * both engines. The IV folds exactly too: the category term
    * `(sp/SP − sn/SN)·woe` clears to the integer
    * `(sp·SN − sn·SP)·woe_fixed` over the shared denominator `SP·SN`,
    * so `iv_bits` closes as ONE fixed IEEE chain over exact-long sums.
    * Value contract: `max(pos)·N` and the iv product must fit int64 —
    * category×label totals below ~2·10⁹ (the [[tokenJsDivergence]]
    * slice bound); ANSI mode raises on breach.
    *
    * Scale shape: ONE category-keyed map-side-combined aggregate, then
    * margins/totals as windows over the CATEGORY-bounded frame (the
    * [[chiSquareCells]] precedent — never the row domain).
    *
    * Output per category:
    * `(category, n_pos, n_neg, woe_fixed, woe_bits, iv_bits)` — iv_bits
    * (the column-level IV, base 2) repeated per row.
    */
  def woeIv(df: DataFrame, category: Column, label: Column): DataFrame = {
    import graft.expr.MathExprs.log2Fixed
    val wAll = Window.partitionBy()
    val cat = df
      .select(category.cast("string").as("category"),
        label.cast("boolean").as("y"))
      .filter(col("category").isNotNull && col("y").isNotNull)
      .groupBy(col("category"))
      .agg(sum(col("y").cast("long")).as("n_pos"),
        sum((!col("y")).cast("long")).as("n_neg"))
    val m = cat
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("sp", col("n_pos") + 1L)
      .withColumn("sn", col("n_neg") + 1L)
      .withColumn("tp", sum(col("n_pos")).over(wAll) + col("k"))
      .withColumn("tn", sum(col("n_neg")).over(wAll) + col("k"))
      .withColumn("woe_fixed",
        (log2Fixed(col("sp")) - log2Fixed(col("tp"))) -
          (log2Fixed(col("sn")) - log2Fixed(col("tn"))))
      .withColumn("iv_term",
        (col("sp") * col("tn") - col("sn") * col("tp")) * col("woe_fixed"))
    m.withColumn("iv_fixed", sum(col("iv_term")).over(wAll))
      .select(col("category"), col("n_pos"), col("n_neg"), col("woe_fixed"),
        (col("woe_fixed").cast("double") / lit(1048576.0)).as("woe_bits"),
        (col("iv_fixed").cast("double") /
          (col("tp") * col("tn")).cast("double") / lit(1048576.0))
          .as("iv_bits"))
  }

  /** Mutual information between two categorical columns (base 2), with
    * both marginal entropies and the normalized MI — the dependence
    * readout [[chiSquareCells]]' per-cell terms can't give as ONE
    * comparable scalar ("how much does source tell you about lang").
    * Everything exact until the last divisions: with cell counts o,
    * margins r/c, total n,
    *
    *   mi_fixed = Σ_cells o·(L(o·n) − L(r·c))
    *   hx_fixed = Σ_cells o·(L(n) − L(r))   (= Σ_x r·(L(n)−L(r)))
    *
    * L the fixed-point [[graft.expr.Log2Fixed]] — int64 sums, order-
    * proof; `mi_bits = mi_fixed/n/2²⁰` and `nmi = mi_bits/min(h_bits)`
    * close as fixed IEEE chains. Value contract: `o·n < 2^63` (cell ×
    * corpus products — the [[tokenJsDivergence]] bound).
    *
    * Scale shape: ONE (x,y)-keyed map-side-combined aggregate collapses
    * the corpus to the cell frame; margins are windows over that
    * bounded frame; the fold is a 1-row aggregate.
    *
    * Output: `(n, cells, mi_fixed, mi_bits, hx_bits, hy_bits, nmi)`.
    */
  def mutualInfo(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    import graft.expr.MathExprs.log2Fixed
    val cells = df
      .select(xCol.cast("string").as("x"), yCol.cast("string").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("o"))
    val m = cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("x"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val agg = m.agg(
      max(col("n")).as("n"), count(lit(1)).as("cells"),
      sum(col("o") * (log2Fixed(col("o") * col("n")) -
        log2Fixed(col("r") * col("c")))).as("mi_fixed"),
      sum(col("o") * (log2Fixed(col("n")) - log2Fixed(col("r"))))
        .as("hx_fixed"),
      sum(col("o") * (log2Fixed(col("n")) - log2Fixed(col("c"))))
        .as("hy_fixed"))
    val miBits = col("mi_fixed").cast("double") / col("n").cast("double") /
      lit(1048576.0)
    val hxBits = col("hx_fixed").cast("double") / col("n").cast("double") /
      lit(1048576.0)
    val hyBits = col("hy_fixed").cast("double") / col("n").cast("double") /
      lit(1048576.0)
    agg.select(col("n"), col("cells"), col("mi_fixed"),
      miBits.as("mi_bits"), hxBits.as("hx_bits"), hyBits.as("hy_bits"),
      when(least(hxBits, hyBits) > 0.0, miBits / least(hxBits, hyBits))
        .as("nmi"))
  }

  /** Cramér's V — the [0,1] effect-size scalar over the contingency
    * table ("HOW dependent are these columns", where χ² only grows with
    * n). Uses the identity `χ² = Σ o²·N/(r·c) − N`: the OBSERVED cells
    * carry the whole sum, so the zero cells a groupBy can never emit
    * are covered exactly (each contributes only its `e` to the −N
    * term). The cross-cell fold closes deterministically on the exact
    * ×10⁶ grid: each cell's term is ONE fixed IEEE chain over exact
    * longs (engine-identical), `floor(term·10⁶)` is an exact multiply +
    * floor, the micro longs sum order-free, and the −N·10⁶ correction
    * is integer algebra. Truncation can land an independent table a few
    * micro BELOW zero — clamped at 0 (χ² is non-negative by
    * definition). V = √(χ²/(n·min(r−1,c−1))) is two more correctly-
    * rounded ops. Truncation bias < cells·10⁻⁶ — a diagnostic-grade
    * grid, documented in the column name.
    *
    * Scale shape: one (a,b)-keyed map-side-combined aggregate to the
    * cell frame, margins as windows over that bounded frame (the
    * [[chiSquareCells]] precedent), a 1-row closing fold with two
    * distinct-counts over the cell frame.
    *
    * Output: `(n, r_cats, c_cats, chi2_micro, chi2, v)`.
    */
  def cramersV(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
    val m = cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("a"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("b"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val term = col("o").cast("double") * col("o").cast("double") *
      col("n").cast("double") /
      (col("r").cast("double") * col("c").cast("double"))
    val f = m.select(col("a"), col("b"), col("o"), col("n"),
      floor(term * lit(1000000.0)).cast("long").as("t_micro"))
    val agg = f.agg(
      sum(col("o")).as("n"),
      countDistinct(col("a")).as("r_cats"),
      countDistinct(col("b")).as("c_cats"),
      sum(col("t_micro")).as("s_micro"))
    val chi2Micro = greatest(col("s_micro") - col("n") * 1000000L, lit(0L))
    val minDim = least(col("r_cats"), col("c_cats")) - 1L
    agg.select(col("n"), col("r_cats"), col("c_cats"),
      chi2Micro.as("chi2_micro"),
      (chi2Micro.cast("double") / lit(1000000.0)).as("chi2"),
      when(minDim > 0L && col("n") > 0L,
        sqrt(chi2Micro.cast("double") / lit(1000000.0) /
          (col("n") * minDim).cast("double"))).as("v"))
  }

  /** Exact grouped TRIMMED mean — the robust location between the mean
    * (breaks on one outlier) and the median (throws away magnitude):
    * drop the lowest and highest `trimPpm`·10⁻⁶ of POSITIONS per group,
    * average the rest. Positional trimming with deterministic ties:
    * from the distinct-value frame's exclusive prefix counts, each
    * value contributes `min(hi, pre+cnt) − max(lo, pre)` kept copies
    * (lo = n·trimPpm DIV 10⁶ positions cut per tail, hi = n − lo) —
    * pure integer interval intersection, so which "copies" of a tied
    * value are kept can't depend on any engine's sort. Exact-long kept
    * sums, ONE closing division.
    *
    * Scale shape: one (group, value)-keyed map-side-combined aggregate,
    * cumulative counts on [[ExperimentOps.prefixByValueGrouped]] (the
    * grouped two-phase bucketed scan — no SinglePartition window), a
    * group-sized closing aggregate.
    *
    * Output per group: `(group, n, n_kept, kept_sum, t_mean)`.
    */
  def trimmedMeanByGroup(
      df: DataFrame, group: Column, value: Column,
      trimPpm: Long = 100000L): DataFrame = {
    require(trimPpm >= 0 && trimPpm < 500000L,
      s"trim fraction must be in [0, 0.5): $trimPpm ppm")
    val byv = df
      .select(group.as("g"), value.cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
      .groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = ExperimentOps.prefixByValueGrouped(byv, Seq("g"), Seq("cnt"))
    val lo = expr(s"tot_cnt * $trimPpm DIV 1000000")
    val hi = col("tot_cnt") - lo
    val kept = greatest(
      least(hi, col("pre_cnt") + col("cnt")) - greatest(lo, col("pre_cnt")),
      lit(0L))
    cum.select(col("g"), col("v"), col("tot_cnt"), kept.as("kept"))
      .groupBy(col("g"))
      .agg(max(col("tot_cnt")).as("n"),
        sum(col("kept")).as("n_kept"),
        sum(col("kept") * col("v")).as("kept_sum"))
      .select(col("g").as("group"), col("n"), col("n_kept"), col("kept_sum"),
        when(col("n_kept") > 0L,
          col("kept_sum").cast("double") / col("n_kept").cast("double"))
          .as("t_mean"))
  }

  /** Huber M-estimator of location per group — the robust mean that,
    * unlike trimming, DOWNWEIGHTS outliers smoothly instead of
    * discarding a fixed fraction: IRLS with weights
    * `w = min(1, k/|x−μ|)`, μ₀ = the exact grouped lower median,
    * `iters` fixed refits. Everything stays on the integer grid: the
    * weight is the ×10⁶ micro value `min(10⁶, k·10⁶ DIV |x−μ|)`
    * (nonnegative intdiv — engine-portable), the refit
    * `μ' = Σ(w·x) DIV Σw` is a SIGNED toward-zero division (Spark DIV
    * semantics; oracles must sign-split), so every iterate is an exact
    * long in value units and the whole trajectory replays bit-for-bit.
    * Value contract: `Σ|w·x| < 2^63` — 10⁶ × cents × group rows below
    * ~9·10⁹ at the hottest group; ANSI raises on breach.
    *
    * Scale shape: the median rides the grouped two-phase scan; each
    * iteration is ONE broadcast join of the group-sized μ frame onto
    * the rows + ONE map-side-combined aggregate — `iters+1` corpus
    * passes, no row shuffle beyond the group aggregates.
    *
    * Output per group: `(group, n, mu_median, mu_huber, w_sum_micro)`.
    */
  def huberMeanByGroup(
      df: DataFrame, group: Column, value: Column, k: Long,
      iters: Int = 2): DataFrame = {
    require(k > 0, s"huber k must be positive: $k")
    require(iters >= 1 && iters <= 8, s"iters out of range: $iters")
    val rows = df
      .select(group.as("g"), value.cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
    val med = weightedMedianByGroup(rows, col("g"), col("v"), lit(1L))
      .select(col("group").as("g"), col("w_median").as("mu0"))
    val n = rows.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val init = med
    val last = (1 to iters).foldLeft(init.withColumnRenamed("mu0", "mu")) {
      case (muF, _) =>
        val j = rows.join(broadcast(muF), "g")
        val dev = abs(col("v") - col("mu"))
        val w = when(dev <= k, lit(1000000L))
          .otherwise(expr(s"${k * 1000000L}L DIV abs(v - mu)"))
        j.select(col("g"), col("v"), w.as("w"))
          .groupBy(col("g"))
          .agg(sum(col("w") * col("v")).as("wx"), sum(col("w")).as("ws"))
          .select(col("g"),
            expr("CASE WHEN wx >= 0 THEN wx DIV ws ELSE -((-wx) DIV ws) END")
              .as("mu"),
            col("ws"))
    }
    n.join(med, "g").join(last.select(col("g"), col("mu"), col("ws")), "g")
      .select(col("g").as("group"), col("n"), col("mu0").as("mu_median"),
        col("mu").as("mu_huber"), col("ws").as("w_sum_micro"))
  }

  /** Brown–Forsythe test (Levene with median centers) — "are the group
    * SPREADS equal?", the variance-homogeneity gate that decides whether
    * pooled-variance methods are even admissible on a segmented metric.
    * Robust form: deviations are taken from each group's exact lower
    * MEDIAN (the [[weightedMedianByGroup]] selection with unit weights —
    * a value FROM the data, so `|v − med|` stays an exact long), then
    * the deviations feed [[ExperimentOps.anovaF]] verbatim: a large F on
    * |deviations| = unequal spreads.
    *
    * Scale shape: the medians ride the grouped two-phase bucketed
    * prefix scan (no SinglePartition window), land as a k-row broadcast
    * joined back onto the rows, and the ANOVA is one aggregate pass —
    * two corpus passes total, both shuffle-light.
    *
    * Output: the [[ExperimentOps.anovaF]] row over the deviations.
    */
  def brownForsythe(
      df: DataFrame, group: Column, value: Column,
      groups: Seq[String]): DataFrame = {
    val rows = df
      .select(group.cast("string").as("g"), value.cast("long").as("v"))
      .filter(col("g").isInCollection(groups) && col("v").isNotNull)
    val med = weightedMedianByGroup(rows, col("g"), col("v"), lit(1L))
      .select(col("group").as("g"), col("w_median").as("med"))
    val dev = rows.join(broadcast(med), "g")
      .select(col("g"), abs(col("v") - col("med")).as("d"))
    ExperimentOps.anovaF(dev, col("g"), col("d"), groups)
  }

  // ------------------------------------------- functional-dependency scan

  /** Functional-dependency / candidate-key profiling over a LITERAL list
    * of column pairs — "does A determine B in this data?", the schema-
    * inference readout behind key discovery, join-safety checks, and
    * denormalization audits. For each declared `lhs → rhs`: the number
    * of distinct lhs values, how many of them map to more than one rhs
    * (the violating values), the worst fan-out, the row mass sitting
    * under violations, and the verdict.
    *
    * Scale shape: ONE pass — each row explodes into its k pair legs
    * (k literal, values stringified row-locally for a uniform schema),
    * ONE map-side-combined groupBy((pair, lhs-value)) collapses the
    * corpus to value grain with an exact distinct-rhs count, and a
    * second pair-grain aggregate folds the k summary rows. No per-pair
    * rescan, no corpus self-join. NULL lhs values are excluded (an FD
    * is a statement about present keys); NULL rhs values don't count as
    * a determination (count-distinct ignores them on both engines).
    *
    * Output per pair: `(lhs, rhs, n_lhs_values, n_violating,
    * max_rhs_per_lhs, rows_in_violation, holds)`.
    */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdProfile needs at least one pair")
    require(pairs.distinct.size == pairs.size, "duplicate FD pairs")
    val legs = pairs.map { case (l, r) =>
      struct(lit(l).as("lhs"), lit(r).as("rhs"),
        col(l).cast("string").as("lv"), col(r).cast("string").as("rv"))
    }
    val x = df.select(explode(array(legs: _*)).as("e"))
      .select(col("e.lhs").as("lhs"), col("e.rhs").as("rhs"),
        col("e.lv").as("lv"), col("e.rv").as("rv"))
      .filter(col("lv").isNotNull)
    val byValue = x.groupBy(col("lhs"), col("rhs"), col("lv")).agg(
      countDistinct(col("rv")).as("nd"), count(lit(1)).as("cnt"))
    byValue.groupBy(col("lhs"), col("rhs")).agg(
      count(lit(1)).as("n_lhs_values"),
      coalesce(sum((col("nd") > 1L).cast("long")), lit(0L))
        .as("n_violating"),
      max(col("nd")).as("max_rhs_per_lhs"),
      coalesce(sum(when(col("nd") > 1L, col("cnt")).otherwise(0L)),
        lit(0L)).as("rows_in_violation"))
      .withColumn("holds", (col("n_violating") === 0L).cast("int"))
  }
}
