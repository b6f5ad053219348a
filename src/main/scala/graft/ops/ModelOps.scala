package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.MathExprs
import graft.ops.Lineage.LineageOps

/** Lightweight statistical models a curation pipeline fits IN the
  * engine, next to the data — trend fits over telemetry, a hashed
  * multinomial Naive Bayes text classifier, and a Bradley-Terry
  * pairwise-preference leaderboard (the aggregation behind LLM "arena"
  * rankings).
  *
  * Shared discipline (the [[EstimatorOps]] contract): every fit is
  * closed-form or a FIXED number of unrolled fixed-point rounds, all
  * arithmetic is exact integer algebra — divisions are Java `div`
  * (toward zero; the oracle sign-splits so either DuckDB `//` semantics
  * matches), logarithms ride [[graft.expr.Log2Fixed]] — so every model
  * replays bit-for-bit in DuckDB SQL. No floats touch a merge boundary.
  *
  * Scale shapes: each fit reduces the corpus in ONE map-side-combined
  * pass to a bounded frame (groups × moments, buckets × classes,
  * players × players) and iterates — if at all — on that bounded frame
  * only. The corpus is never joined to itself and nothing corpus-sized
  * reaches the driver.
  */
object ModelOps {

  /** Fixed-point scale for micro-valued slopes/ratings: 10^6. */
  val Micro = 1000000L

  // --------------------------------------------------------- OLS trend fit

  /** Per-group simple linear regression `y ≈ a + b·x` in closed form
    * from one pass of integer moments `(n, Σx, Σy, Σxx, Σxy)`:
    *
    *   slope_micro     = (n·Σxy − Σx·Σy) · 10^6  div  (n·Σxx − Σx²)
    *   intercept_micro = (Σy·10^6 − slope_micro·Σx)  div  n
    *   pred_next_micro = intercept_micro + slope_micro·(max(x)+1)
    *
    * All moments are exact longs; both divisions are toward-zero (the
    * oracle sign-splits). Groups with zero x-variance get NULL fit
    * columns. `x` must be a small-domain long (e.g. day index — callers
    * anchor dates to a literal epoch so the ×10^6 products stay far
    * inside int64); `y` an integer measurement (cents / micro units).
    *
    * Scale shape: ONE map-side-combined aggregate over the fact — the
    * textbook "regression is five sums" decomposition; everything after
    * is per-group column algebra on the groups-sized frame.
    */
  def olsTrend(df: DataFrame, group: Column, x: Column, y: Column): DataFrame =
    df.select(group.as("g"), x.cast("long").as("x"), y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        max(col("x")).as("xmax"))
      .withColumn("num",
        (col("n") * col("sxy") - col("sx") * col("sy")) * lit(Micro))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_micro", when(col("den") > 0, expr("num div den")))
      .withColumn("intercept_micro",
        when(col("den") > 0,
          expr(s"(sy * ${Micro}L - slope_micro * sx) div n")))
      .withColumn("pred_next_micro",
        col("intercept_micro") + col("slope_micro") * (col("xmax") + 1L))
      .select(col("g"), col("n").as("n_points"), col("slope_micro"),
        col("intercept_micro"), col("pred_next_micro"))

  /** Zipf-law fit of the token frequency head: rank the `topRanks` most
    * frequent tokens (a distributed top-k heap, never a vocabulary
    * sort), then regress log₂(freq) on log₂(rank) with [[olsTrend]] —
    * `slope_micro ≈ −10^6·s`, the Zipf exponent a tokenizer/mixture
    * designer reads. Both logs ride [[graft.expr.Log2Fixed]] truncated
    * to 8 fractional bits (`>> 12`): at k = 128 ranks that caps every
    * OLS moment product inside int64 FOR ANY DATA (x ≤ 2^11, y ≤ 2^14
    * even at 10^12 corpus tokens), and the 2^-8 quantization is far
    * below the fit's own head-vs-tail model error. The rank window runs
    * over the k-bounded heap output only.
    */
  def zipfFit(docs: DataFrame, text: Column, topRanks: Int = 128): DataFrame = {
    require(topRanks >= 8 && topRanks <= 4096, s"bad topRanks: $topRanks")
    val freq = docs.select(explode(TextOps.tokens(lower(text))).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("f"))
    val top = freq.orderBy(col("f").desc, col("tk")).limit(topRanks)
    val pts = top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("f").desc, col("tk"))))
      .select(lit("zipf").as("g"),
        shiftright(MathExprs.log2Fixed(col("rank").cast("long")), 12).as("x"),
        shiftright(MathExprs.log2Fixed(col("f")), 12).as("y"))
    olsTrend(pts, col("g"), col("x"), col("y"))
      .select(col("n_points").as("n_ranks"),
        col("slope_micro"), col("intercept_micro"))
  }

  /** Heaps'-law fit of vocabulary growth — `V(n) ≈ K·n^β`, the exponent
    * that predicts how a tokenizer's type inventory (and OOV rate)
    * scales with corpus size: regress log₂(cumulative types) on
    * log₂(cumulative tokens) along the deterministic doc_id corpus
    * order. The growth curve is sampled at POWER-OF-TWO document ranks
    * (plus the final doc): ≤ log₂(docs)+1 checkpoints — log-spaced, the
    * natural design for a log-log fit, and it caps the OLS moments
    * inside int64 FOR ANY corpus size (the [[zipfFit]] `topRanks`
    * discipline, made data-independent). Logs ride
    * [[graft.expr.Log2Fixed]] `>> 12`; the fit is [[olsTrend]]'s exact
    * sign-split intdiv algebra, so `beta_micro ≈ 10⁶·β` replays
    * bit-for-bit.
    *
    * Scale shape: one corpus explode feeds BOTH per-doc token counts
    * and token first-seen docs (token-keyed min — map-side combined);
    * the cumulative scans ride [[ExperimentOps.prefixByValue]] over the
    * doc frame (two-phase, no SinglePartition window); the checkpoint
    * filter leaves a ≤64-row frame for the closing OLS.
    *
    * Output: `(n_checkpoints, beta_micro, intercept_micro)`.
    */
  def heapsFit(docs: DataFrame, idCol: Column, text: Column): DataFrame = {
    val tok = docs.select(idCol.cast("long").as("d"),
      explode(TextOps.tokens(lower(text))).as("tk"))
    val perDocTokens = tok.groupBy(col("d")).agg(count(lit(1)).as("toks"))
    val perDocNew = tok.groupBy(col("tk")).agg(min(col("d")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("newt"))
    val perDoc = perDocTokens.join(perDocNew, Seq("d"), "left")
      .select(col("d").as("v"), col("toks"),
        coalesce(col("newt"), lit(0L)).as("newt"), lit(1L).as("one"))
    val cum = ExperimentOps.prefixByValue(perDoc, Seq("toks", "newt", "one"))
    val r = col("pre_one") + 1L
    val pts = cum
      .select(r.as("r"), (col("pre_toks") + col("toks")).as("ct"),
        (col("pre_newt") + col("newt")).as("cv"), col("tot_one"))
      .filter((col("r").bitwiseAND(col("r") - 1L) === 0L ||
        col("r") === col("tot_one")) && col("ct") > 0L && col("cv") > 0L)
      .select(lit("heaps").as("g"),
        shiftright(MathExprs.log2Fixed(col("ct")), 12).as("x"),
        shiftright(MathExprs.log2Fixed(col("cv")), 12).as("y"))
    olsTrend(pts, col("g"), col("x"), col("y"))
      .select(col("n_points").as("n_checkpoints"),
        col("slope_micro").as("beta_micro"), col("intercept_micro"))
  }

  // ----------------------------------------- Theil-Sen / Mann-Kendall

  /** Robust per-group trend over a BOUNDED series (calendar-bounded
    * daily aggregates — group size is capped by the date window, never
    * by corpus size, and `maxPoints` enforces that contract loudly):
    * Mann-Kendall's S statistic (Σ sign(y_j − y_i) over ordered pairs)
    * and the Theil-Sen slope = the lower-median of the pairwise slopes
    * `(y_j − y_i)·10^6 div (x_j − x_i)` (toward-zero; deterministic
    * (slope, x_i, x_j) tie-break).
    *
    * Scale shape: the series collapses to ONE sorted array per group
    * (size ≤ maxPoints by contract), pairs are emitted ROW-LOCALLY from
    * that array (the [[EstimatorOps.adamicAdarTopK]] wedge shape — no
    * self-join), and the median window partitions by group over ≤
    * maxPoints² pair rows.
    */
  def theilSen(
      df: DataFrame, group: Column, x: Column, y: Column,
      maxPoints: Int = 128): DataFrame = {
    val pts = df
      .select(group.as("g"), x.cast("long").as("x"), y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("g")
      .agg(sort_array(collect_list(struct(col("x"), col("y")))).as("ps"))
      .withColumn("ps",
        when(size(col("ps")) <= maxPoints, col("ps"))
          .otherwise(raise_error(concat(
            lit(s"theilSen: group series exceeds $maxPoints points: "),
            col("g").cast("string")))))
    val pairs = pts
      .select(col("g"), size(col("ps")).as("n_points"),
        explode(flatten(transform(col("ps"), (p, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))),
            q => struct(p.getField("x").as("xi"), p.getField("y").as("yi"),
              q.getField("x").as("xj"), q.getField("y").as("yj")))))).as("pr"))
      .select(col("g"), col("n_points"),
        col("pr.xi").as("xi"), col("pr.yi").as("yi"),
        col("pr.xj").as("xj"), col("pr.yj").as("yj"))
      .filter(col("xj") > col("xi")) // distinct x only: ties carry no slope
      .withColumn("dy", col("yj") - col("yi"))
      .withColumn("s_micro", expr("(dy * 1000000) div (xj - xi)"))
    val w = Window.partitionBy("g")
      .orderBy(col("s_micro"), col("xi"), col("xj"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("g")
      .agg(max(col("n_points")).as("n_points"),
        count(lit(1)).as("n_pairs"),
        sum(signum(col("dy")).cast("long")).as("s_stat"),
        max(when(col("rn") === expr("(np + 1) div 2"),
          col("s_micro"))).as("slope_micro"))
  }

  // ------------------------------------------- hashed multinomial NB

  /** Hashed-feature multinomial Naive Bayes over tokenized text — the
    * classic cheap lang/quality classifier curation pipelines train on
    * a labeled slice and sweep over the corpus. Features are portable
    * md5 token buckets ([[SelectionOps.tokenBucket]] — the hashing
    * trick, so the model is `buckets × classes` no matter the
    * vocabulary); scores are exact fixed-point log-likelihoods on
    * [[graft.expr.Log2Fixed]]:
    *
    *   score(d, c) = Σ_tokens L(cnt(bucket, c) + 1) − n_tok·L(tot_c + B)
    *
    * (add-1 smoothing; the class prior is deliberately uniform — the
    * usual choice when the labeled slice's class mix is not trusted).
    * Prediction is the (score, class) argmax with the class-ascending
    * tie-break. Returns the test-split confusion matrix
    * `(label_true, label_pred, n_docs)`.
    *
    * Scale shape: training is ONE token-explode pass collapsing
    * map-side into the buckets×classes count grid (bounded, broadcast);
    * scoring is a second explode pass joined to the broadcast grid,
    * folded per (doc, class) map-side; the argmax window partitions by
    * doc over `classes` rows.
    */
  def naiveBayesConfusion(
      docs: DataFrame, id: Column, label: Column, text: Column,
      isTrain: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 16), s"bad buckets: $buckets")
    val base = docs
      .select(id.as("rid"), label.as("lbl"), text.as("txt"), isTrain.as("tr"))
      .filter(col("lbl").isNotNull && col("txt").isNotNull)
    val tok = base.select(col("rid"), col("lbl"), col("tr"),
      explode(TextOps.tokens(lower(col("txt")))).as("tk"))
      .withColumn("b", SelectionOps.tokenBucket(col("tk"), buckets))
    val classes = base.filter(col("tr")).select(col("lbl").as("cls")).distinct()
    // dense buckets×classes grid: absent cells must still carry their
    // add-1 smoothing mass, so the grid is built dense and left-joined
    val counts = tok.filter(col("tr"))
      .groupBy(col("b"), col("lbl").as("cls"))
      .agg(count(lit(1)).as("cnt"))
    val grid = classes
      .crossJoin(spark(docs).range(buckets).select(col("id").as("b")))
      .join(counts, Seq("b", "cls"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("lg_cnt1", MathExprs.log2Fixed(col("cnt") + 1L))
    val totals = grid.groupBy("cls")
      .agg(sum(col("cnt")).as("tot"))
      .withColumn("lg_tot", MathExprs.log2Fixed(col("tot") + buckets.toLong))
      .select(col("cls"), col("lg_tot"))
    val scored = tok.filter(!col("tr"))
      .join(broadcast(grid.select(col("b"), col("cls"), col("lg_cnt1"))), Seq("b"))
      .groupBy(col("rid"), col("lbl"), col("cls"))
      .agg(sum(col("lg_cnt1")).as("sum_lg"), count(lit(1)).as("n_tok"))
      .join(broadcast(totals), Seq("cls"))
      .withColumn("score", col("sum_lg") - col("n_tok") * col("lg_tot"))
    val wArg = Window.partitionBy("rid")
      .orderBy(col("score").desc, col("cls").asc)
    scored
      .withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .groupBy(col("lbl").as("label_true"), col("cls").as("label_pred"))
      .agg(count(lit(1)).as("n_docs"))
  }

  private def spark(df: DataFrame) = df.sparkSession

  // --------------------------------------------- Bradley-Terry ratings

  /** Rating scale: ratings live in [1, 2^20] fixed point. */
  val BtScale = 1L << 20

  /** Bradley-Terry strength ratings from a pairwise win table — the
    * model behind chess Elo aggregates and LLM arena leaderboards —
    * fitted with `iters` unrolled minorization-maximization rounds
    * (Hunter 2004) in exact fixed point:
    *
    *   d_i   = Σ_j  n_ij · S²  div  (π_i + π_j)      (S = 2^20)
    *   π_i'  = max(1,  W_i · S²  div  d_i)
    *   π_i'' = max(1,  π_i' · S  div  max_k(π_k'))   (max-normalize)
    *
    * Every operand is a nonnegative long (toward-zero division matches
    * either DuckDB `//` semantics — the [[GraphOps.hits]] convention),
    * the floor at 1 keeps winless players in-domain, and the per-round
    * MAX normalization pins the scale so rounds are comparable.
    *
    * Input `battles`: one row per unordered player pair,
    * `(pa, pb, n_games, wins_a)` with `pa < pb`. Output: one row per
    * player, `(player, games, wins, rating_fx)` — rating_fx in 2^-20
    * units of the round-`iters` normalized strength.
    *
    * Scale shape: the pair table is players²-bounded (the corpus
    * reduced to it BEFORE this fit); every round is two joins and a
    * map-side-combined sum on that bounded frame, lineage cut per round
    * (the iterative-op discipline).
    */
  /** Deterministic pairwise "battles" from a scored corpus: rows are
    * matched into id-contiguous buckets of `bucketWidth` (bucket size
    * is bounded BY CONSTRUCTION at any corpus size — `id div width`,
    * never `id mod k`), every cross-player pair inside a bucket is one
    * game, and the higher `score` wins (tie → the lower id). Output one
    * row per unordered player pair: `(pa, pb, n_games, wins_a)` with
    * `pa < pb` — [[bradleyTerry]]'s input contract. In production the
    * battles table comes from real judgments (human prefs / LLM judge);
    * this builder is the deterministic stand-in that makes the full fit
    * replayable.
    *
    * Scale shape: pairs are emitted ROW-LOCALLY from each bucket's
    * ≤ `bucketWidth` collected rows (the [[theilSen]] array shape), and
    * collapse map-side into the players²-bounded win table.
    */
  def lengthBattles(
      rows: DataFrame, id: Column, player: Column, score: Column,
      bucketWidth: Int = 8): DataFrame = {
    require(bucketWidth >= 2 && bucketWidth <= 64, s"bad width: $bucketWidth")
    val pairs = rows
      .select(id.cast("long").as("i"), player.as("pl"),
        score.cast("long").as("sc"))
      .filter(col("i").isNotNull && col("pl").isNotNull && col("sc").isNotNull)
      .withColumn("bkt", expr(s"i div ${bucketWidth}L"))
      .groupBy("bkt")
      .agg(sort_array(collect_list(struct(col("i"), col("pl"), col("sc"))))
        .as("rs"))
      .select(explode(flatten(transform(col("rs"), (p, ix) =>
        transform(slice(col("rs"), ix + 2, size(col("rs"))),
          q => struct(
            p.getField("pl").as("pl_a"), q.getField("pl").as("pl_b"),
            // arrays sort by (i, ...) so p.i < q.i: ties go to p
            (p.getField("sc") >= q.getField("sc")).as("a_wins")))))).as("m"))
      .select(col("m.pl_a"), col("m.pl_b"), col("m.a_wins"))
      .filter(col("pl_a") =!= col("pl_b"))
    pairs
      .select(
        least(col("pl_a"), col("pl_b")).as("pa"),
        greatest(col("pl_a"), col("pl_b")).as("pb"),
        when(col("pl_a") <= col("pl_b"), col("a_wins").cast("long"))
          .otherwise(lit(1L) - col("a_wins").cast("long")).as("wa"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_games"), sum(col("wa")).as("wins_a"))
  }

  def bradleyTerry(battles: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 16, s"bad iters: $iters")
    val sym = battles.select(
        col("pa").as("p"), col("pb").as("q"),
        col("n_games").cast("long").as("n"),
        col("wins_a").cast("long").as("w"))
      .unionByName(battles.select(
        col("pb").as("p"), col("pa").as("q"),
        col("n_games").cast("long").as("n"),
        (col("n_games") - col("wins_a")).cast("long").as("w")))
      .cutLineage()
    val players = sym.groupBy("p")
      .agg(sum(col("n")).as("games"), sum(col("w")).as("wins"))
      .cutLineage()
    val s2 = BtScale * BtScale
    var pi = players.select(col("p"), lit(BtScale).as("pi"))
    for (_ <- 1 to iters) {
      val d = sym
        .join(pi, Seq("p"))
        .join(pi.select(col("p").as("q"), col("pi").as("pi_q")), Seq("q"))
        .groupBy("p")
        .agg(sum(expr(s"(n * ${s2}L) div (pi + pi_q)")).as("den"))
      val raw = players.select(col("p"), col("wins"))
        .join(d, Seq("p"))
        .select(col("p"),
          greatest(lit(1L), expr(s"(wins * ${s2}L) div den")).as("pi_raw"))
        .cutLineage()
      val mx = raw.agg(max(col("pi_raw")).as("mx"))
      pi = raw.crossJoin(broadcast(mx))
        .select(col("p"),
          // floor at 1 AFTER normalizing too: a winless player's rating
          // would otherwise round to 0 and zero a later round's divisor
          greatest(lit(1L), expr(s"(pi_raw * ${BtScale}L) div mx")).as("pi"))
        .cutLineage()
    }
    players.join(pi, Seq("p"))
      .select(col("p").as("player"), col("games"), col("wins"),
        col("pi").as("rating_fx"))
  }

  // ------------------------------------------- autocorrelation function

  /** Sample autocorrelation of a daily metric series at lags 1..maxLag,
    * plus the Durbin-Watson statistic — the "is yesterday predictive of
    * today / are the residuals serially dependent?" readout behind every
    * telemetry trend fit ([[olsTrend]] assumes independent errors; this
    * measures how wrong that is). The series is the grouped daily sum of
    * a cents metric, ordered by day; observed days are treated as
    * consecutive (a business series skips quiet days).
    *
    * Exact core: with all of `n, S=Σx, Σx², Σx·x₊ₗ, H_l, T_l` (head/tail
    * sums of each lag-pair window) accumulated as DECIMAL(38,0) exact
    * integers (the [[graft.ops.ProfileOps.spearman]] 128-bit-moment
    * discipline), the mean-centered sums multiply out float-free:
    *
    *   n²·num_l = n²·Σx·x₊ₗ − n·S·(H_l+T_l) + (n−l)·S²
    *   n²·den   = n²·Σx²    − n·S²
    *
    * so acf_l = num_l/den and DW = Σ(Δx)²/den close as single divisions
    * of exact 128-bit integers cast to double — engine-identical.
    * Value contract: `n²·Σx² < 10^38` (daily totals to ~10^12 cents on a
    * 30-year calendar) — decimal overflow raises, never wraps.
    *
    * Scale shape: the corpus collapses through ONE map-side-combined
    * day-keyed aggregate; every window after that runs on the
    * CALENDAR-BOUNDED daily frame (the [[ExperimentOps.bhFdr]]
    * metadata-frame contract — thousands of rows, not corpus rows), and
    * the lag columns share one window spec. Output is maxLag rows.
    *
    * Output per lag: `(lag, n_pairs, acf, dw)` — dw only on the lag-1
    * row (it is a lag-1 statistic).
    */
  def acfSeries(
      df: DataFrame, day: Column, cents: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"bad maxLag: $maxLag")
    val daily = df
      .select(day.cast("date").as("dt"), cents.cast("long").as("c"))
      .filter(col("dt").isNotNull && col("c").isNotNull)
      .groupBy(unix_date(col("dt")).cast("long").as("d"))
      .agg(sum(col("c")).as("x"))
    val w = Window.orderBy(col("d"))
    val dec = "decimal(38,0)"
    val lagged = daily.select(
      col("x") +: (1 to maxLag).map(l =>
        lag(col("x"), l).over(w).as(s"x_$l")): _*)
    val perLag = (1 to maxLag).flatMap { l =>
      val xl = col(s"x_$l")
      Seq(
        count(xl).as(s"np_$l"),
        coalesce(sum((col("x").cast(dec)) * xl.cast(dec)), lit(0L).cast(dec))
          .as(s"cross_$l"),
        coalesce(sum(when(xl.isNotNull, col("x")).cast(dec)),
          lit(0L).cast(dec)).as(s"t_$l"),
        coalesce(sum(xl.cast(dec)), lit(0L).cast(dec)).as(s"h_$l"))
    }
    val aggCols = Seq(
      count(lit(1)).as("n"),
      coalesce(sum(col("x").cast(dec)), lit(0L).cast(dec)).as("s"),
      coalesce(sum(col("x").cast(dec) * col("x").cast(dec)),
        lit(0L).cast(dec)).as("sxx"),
      coalesce(sum((col("x") - col("x_1")).cast(dec) *
        (col("x") - col("x_1")).cast(dec)), lit(0L).cast(dec))
        .as("sd2")) ++ perLag
    val m = lagged.agg(aggCols.head, aggCols.tail: _*)
    val nDec = col("n").cast(dec)
    val den = nDec * nDec * col("sxx") - nDec * col("s") * col("s")
    val dw = when(den > 0, (nDec * nDec * col("sd2")).cast("double") /
      den.cast("double"))
    val rows = (1 to maxLag).map { l =>
      val num = nDec * nDec * col(s"cross_$l") -
        nDec * col("s") * (col(s"h_$l") + col(s"t_$l")) +
        (nDec - l) * col("s") * col("s")
      struct(
        lit(l).as("lag"), col(s"np_$l").as("n_pairs"),
        when(den > 0 && col(s"np_$l") > 0L,
          num.cast("double") / den.cast("double")).as("acf"),
        (if (l == 1) dw else lit(null).cast("double")).as("dw"))
    }
    m.select(explode(array(rows: _*)).as("r"))
      .select(col("r.lag").as("lag"), col("r.n_pairs").as("n_pairs"),
        col("r.acf").as("acf"), col("r.dw").as("dw"))
  }

  // ------------------------------------------------- Hill tail index

  /** Hill estimator of a heavy-tail exponent — "how fat is the tail of
    * this metric?": `α = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎)` over the k largest
    * order statistics ([[zipfFit]]'s rank-frequency twin for a VALUE
    * distribution — spend, file sizes, degree). α ≈ 1 is Zipf-like,
    * α > 2 has finite variance; a revenue or quota planner reads this
    * before trusting any mean.
    *
    * Float-free core: the top k+1 VALUES arrive via a per-task heap
    * (`orderBy.limit` → TakeOrderedAndProject, the
    * [[graft.ops.TextOps.vocabCoverage]] discipline — never a corpus
    * sort), the log sum `T = Σ lg(x₍ᵢ₎) − k·lg(x₍ₖ₊₁₎)` is exact in
    * fixed-point log2 (tie order at the boundary cannot change it: the
    * top-k value MULTISET is unique), `h_log2fx = T DIV k` is exact
    * intdiv, and α closes as ONE fixed double chain with the shared
    * [[graft.ops.ProfileOps.Ln2]] literal: `α = k·2^20 / (T·ln2)`.
    * Nonpositive values are excluded (no defined log); fewer than k+1
    * survivors yield NULLs.
    *
    * Scale shape: one filter + one heap-bounded TakeOrdered; every
    * window after runs on the (k+1)-row survivor frame.
    *
    * Output (1 row): `(n_top, k, x_threshold, h_log2fx, alpha)`.
    */
  def hillTailIndex(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 4096, s"bad k: $k")
    val v = df.select(value.cast("long").as("x")).filter(col("x") > 0L)
    val top = v.orderBy(col("x").desc).limit(k + 1)
    val w = Window.orderBy(col("x").desc)
    val ranked = top
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("lg", graft.expr.MathExprs.log2Fixed(col("x")))
    val m = ranked.agg(
      count(lit(1)).as("n_top"),
      coalesce(sum(when(col("r") <= k.toLong, col("lg"))), lit(0L))
        .as("sum_lg"),
      coalesce(max(when(col("r") === (k + 1).toLong, col("lg"))), lit(0L))
        .as("lg_thr"),
      coalesce(max(when(col("r") === (k + 1).toLong, col("x"))), lit(0L))
        .as("x_thr"))
    val t = col("sum_lg") - lit(k.toLong) * col("lg_thr")
    val ok = col("n_top") === (k + 1).toLong && t > 0L
    m.select(
      col("n_top"), lit(k.toLong).as("k"), col("x_thr").as("x_threshold"),
      when(ok, expr(s"(sum_lg - $k * lg_thr) DIV $k")).as("h_log2fx"),
      when(ok, lit((k.toLong * 1048576L).toDouble) /
        (t.cast("double") * ProfileOps.Ln2)).as("alpha"))
  }

  // ------------------------------------------- single changepoint scan

  /** Optimal single changepoint of a daily cents series (binary
    * segmentation, first split) — "did the level shift, and when?":
    * the split maximizing the between-segment sum-of-squares gain
    * `S₁²/n₁ + S₂²/n₂` (the pooled `S²/n` term is split-invariant and
    * reported alongside). The complement to [[graft.ops.ExperimentOps]]'
    * CUSUM monitor: CUSUM flags drift online; this localizes the break
    * exactly, offline.
    *
    * Engine-exact argmax with NO floats anywhere: every candidate's
    * score lands on a FIXED S-normalized ×2^20 grid —
    * `score_fx = (A·2^20) DIV (D·S)` with `A = S₁²·n₂ + S₂²·n₁` in
    * DECIMAL(38,0) and `D = n₁·n₂` — S is split-invariant, so the
    * (score desc, day asc) ranking is integer-deterministic on any
    * engine (a double score would make the argmax an ulp lottery), and
    * the normalized readout (units: cents·2^20) fits int64 for daily
    * totals to ~10^12 cents. Value contract: the metric is NONNEGATIVE
    * with S > 0 (an all-zero or refund-dominated series has no defined
    * split; such inputs yield an empty frame, never a sign-dependent
    * division).
    *
    * Scale shape: one day-keyed corpus collapse, then every window runs
    * on the CALENDAR-BOUNDED daily frame (the [[acfSeries]] contract).
    *
    * Output (1 row): `(n_days, split_d, n_left, n_right, sum_left,
    * sum_right, score_fx, base_fx)` — `split_d` = last epoch-day of the
    * LEFT segment; gain = score_fx − base_fx (≥ 0 up to the shared
    * flooring; base_fx = (S·2^20) DIV n is the no-split score on the
    * same grid).
    */
  def changepointScan(
      df: DataFrame, day: Column, cents: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = df
      .select(day.cast("date").as("dt"), cents.cast("long").as("c"))
      .filter(col("dt").isNotNull && col("c").isNotNull)
      .groupBy(unix_date(col("dt")).cast("long").as("d"))
      .agg(sum(col("c")).as("x"))
    val byD = Window.orderBy(col("d"))
    val wAll = Window.partitionBy()
    val scanned = daily
      .withColumn("i", row_number().over(byD).cast("long"))
      .withColumn("s1", sum(col("x")).over(
        byD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("x")).over(wAll))
      .filter(col("i") < col("n") && col("s") > 0L)
    val cand = scanned.select(
      col("d"), col("i"), col("n"), col("s"), col("s1"),
      expr(s"""CAST(((CAST(s1 AS $dec) * CAST(s1 AS $dec)
              |  * CAST(n - i AS $dec)
              |  + CAST(s - s1 AS $dec) * CAST(s - s1 AS $dec)
              |  * CAST(i AS $dec)) * 1048576)
              | DIV (CAST(i AS $dec) * CAST(n - i AS $dec)
              |      * CAST(s AS $dec)) AS BIGINT)""".stripMargin)
        .as("score_fx"))
    val byScore = Window.orderBy(col("score_fx").desc, col("d"))
    cand.withColumn("rk", row_number().over(byScore))
      .filter(col("rk") === 1)
      .select(
        col("n").as("n_days"), col("d").as("split_d"),
        col("i").as("n_left"), (col("n") - col("i")).as("n_right"),
        col("s1").as("sum_left"), (col("s") - col("s1")).as("sum_right"),
        col("score_fx"),
        expr(s"CAST((CAST(s AS $dec) * 1048576) DIV n AS BIGINT)")
          .as("base_fx"))
  }

  // ------------------------------------------- day-of-week seasonality

  /** Day-of-week seasonal index of a daily cents metric — the weekly
    * shape behind [[acfSeries]]' lag-7 spike: `idx_d = mean(day-of-week
    * d) / grand daily mean`, exact on the ×10⁶ grid (DECIMAL(38,0)
    * numerator `10⁶·S_d·n`, int64 denominator `n_d·S`, one intdiv — all
    * operands nonnegative, direction-proof). Day-of-week is pure
    * integer calendar math — `(epoch_day + 4) mod 7`, 0 = Sunday — so
    * both engines bucket identically with no locale/calendar surface.
    *
    * Scale shape: the corpus collapses through ONE day-keyed aggregate
    * (map-side combined); the dow rollup and the 1-row totals attach
    * run on the 7-row frame.
    *
    * Output: `(dow, n_days, cents, idx_micro)` — dow 0..6, 0 = Sunday.
    */
  def seasonalIndex(df: DataFrame, day: Column, cents: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = df
      .select(day.cast("date").as("dt"), cents.cast("long").as("c"))
      .filter(col("dt").isNotNull && col("c").isNotNull)
      .groupBy(unix_date(col("dt")).cast("long").as("d"))
      .agg(sum(col("c")).as("x"))
    val byDow = daily
      .withColumn("dow", pmod(col("d") + 4L, lit(7L)))
      .groupBy(col("dow")).agg(
        count(lit(1)).as("n_days"), sum(col("x")).as("cents"))
    val wAll = Window.partitionBy()
    byDow
      .withColumn("n", sum(col("n_days")).over(wAll))
      .withColumn("s", sum(col("cents")).over(wAll))
      .select(col("dow"), col("n_days"), col("cents"),
        when(col("s") > 0L, expr(
          s"""CAST((CAST(1000000 AS $dec) * CAST(cents AS $dec)
             | * CAST(n AS $dec)) DIV (n_days * s) AS BIGINT)"""
            .stripMargin)).as("idx_micro"))
  }
}
