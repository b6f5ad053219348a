package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.{BloomExprs, Log2Fixed, MathExprs}
import graft.ops.Lineage.LineageOps

/** Estimation & evaluation primitives a curation pipeline runs next to
  * its aggregates: a DETERMINISTIC HyperLogLog (register-exact, so the
  * sketch state itself is oracle-checkable — unlike
  * `approx_count_distinct`, whose HLL++ buffer is engine-private),
  * Adamic-Adar co-neighbor link scores, a Poisson bootstrap confidence
  * interval, split-conformal prediction intervals, and an exact
  * distributed k-th order statistic (the selection primitive conformal
  * calibration needs at corpus scale, where "sort everything and take
  * row k" is not a plan).
  *
  * Shared discipline: every randomized step rides the splitmix64 family
  * ([[graft.expr.BloomExprs.splitmixHash]]) and every logarithm rides
  * [[graft.expr.Log2Fixed]] — both replay bit-for-bit in DuckDB HUGEINT
  * SQL, so the whole module is hash-oracle-able end to end.
  */
object EstimatorOps {

  // ------------------------------------------------------------ HyperLogLog

  /** Register count exponent: 2^8 = 256 registers (~6.5% rel. error). */
  val HllP = 8

  /** rho values are clipped here so the harmonic sum stays exact:
    * Σ 2^(41−rho) over 256 registers plus the zero-register mass is
    * < 2^50 — inside int64 AND losslessly representable as an IEEE
    * double. A register with rho > 41 contributes 2^-41 instead of
    * 2^-rho: absolute error < 2^-41 per register, unobservable next to
    * the sketch's 6.5% standard error, and identical on every engine.
    */
  val RhoCap = 41

  /** alpha_256 * 256^2 * 2^41 — the estimate's numerator, computed ONCE
    * here (fixed operation order) and shipped to both engines as the
    * same IEEE double literal.
    */
  val HllAlphaNum: Double =
    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 2199023255552.0

  /** HLL register table of `key` under hash `salt`: one row per occupied
    * register, `(idx, rho)` with idx the hash's top 8 bits and rho the
    * 1-based leading-zero rank of the remaining 56 (rho = 57 when they
    * are all zero). The register table IS the sketch: constant-size
    * (≤ 256 rows) no matter the corpus, mergeable by `max(rho)` per
    * `idx` — the map-side combine does exactly that, so the shuffle is
    * register-sized. msb comes from [[Log2Fixed]] (integer-only,
    * codegen'd), never from float log.
    */
  def hllRegisters(df: DataFrame, key: Column, salt: Int): DataFrame =
    hllRegistersBy(df, lit(0L), key, salt).drop("g")

  /** Per-group register tables in ONE corpus pass: `(g, idx, rho)`,
    * ≤ 256 rows per group. Grouped sketches are how set algebra runs at
    * scale — per-source registers merge into any union's registers by
    * `max(rho)` per idx (one register-sized shuffle), never by
    * re-scanning the corpus.
    */
  def hllRegistersBy(
      df: DataFrame, group: Column, key: Column, salt: Int): DataFrame = {
    val h = BloomExprs.splitmixHash(key.cast("long"), salt)
    val lowMask = (1L << 56) - 1
    df.select(group.as("g"),
        shiftrightunsigned(h, 56).as("idx"),
        h.bitwiseAND(lit(lowMask)).as("w"))
      .select(col("g"), col("idx"),
        when(col("w") === 0L, lit(57L))
          .otherwise(lit(56L) -
            shiftright(MathExprs.log2Fixed(col("w")), 20)).as("rho"))
      .groupBy("g", "idx").agg(max(col("rho")).as("rho"))
  }

  /** Fold a register table into the raw HLL estimate, ONE row:
    * `(m, v_zero, s_scaled, est_raw)` where `s_scaled` is the exact
    * integer harmonic sum Σ 2^(RhoCap − min(rho, RhoCap)) with every
    * absent register contributing 2^RhoCap, and
    * `est_raw = HllAlphaNum / s_scaled` — a single correctly-rounded
    * IEEE division of exactly-representable operands. The small-range
    * linear-counting correction is deliberately NOT applied: it needs a
    * float ln; callers below the ~640-distinct regime should use the
    * exact KMV sketch ([[SketchOps]]) instead.
    */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val zeroMass = 1L << RhoCap
    registers
      .agg(
        count(lit(1)).as("present"),
        coalesce(sum(expr(
          s"shiftleft(CAST(1 AS BIGINT), CAST($RhoCap - least(rho, $RhoCap) AS INT))")),
          lit(0L)).as("sp"))
      .select(
        lit(256L).as("m"),
        (lit(256L) - col("present")).as("v_zero"),
        (col("sp") + (lit(256L) - col("present")) * lit(zeroMass))
          .as("s_scaled"))
      .withColumn("est_raw", lit(HllAlphaNum) / col("s_scaled").cast("double"))
  }

  // ----------------------------------------------- Good-Turing frequencies

  /** Good-Turing frequency-of-frequencies readout over an array-of-keys
    * column (unigram tokens, bigrams, shingles — whatever unit the
    * caller's LM smooths): for r = 1..`maxR`, the count-of-counts N_r,
    * the adjusted count
    * `r* = (r+1)·N_{r+1} / N_r` (micro fixed point, toward-zero — both
    * operands nonnegative), and the corpus-constant unseen-mass
    * estimate `P₀ = N₁/N` — the number that answers "how much
    * vocabulary is this corpus still missing", which a tokenizer/
    * mixture designer reads before freezing a vocab.
    *
    * Scale shape: one explode pass collapses to the vocabulary-sized
    * frequency table, a second to the counts-of-counts table (bounded
    * by the number of DISTINCT frequencies, O(√tokens)); totals ride a
    * bounded whole-frame window over that table ([[looDeltas]] shape —
    * no corpus re-scan, no 1-row cross), and the N_{r+1} lookup is a
    * self-join on the same bounded frame.
    */
  def goodTuring(docs: DataFrame, keys: Column, maxR: Int = 10): DataFrame = {
    require(maxR >= 1 && maxR <= 1000, s"bad maxR: $maxR")
    val freq = docs
      .select(explode(keys).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("f"))
    val cc = freq.groupBy(col("f").as("r")).agg(count(lit(1)).as("n_r"))
    val w = Window.partitionBy()
    cc
      .withColumn("n_tokens", sum(col("r") * col("n_r")).over(w))
      .withColumn("vocab", sum(col("n_r")).over(w))
      .withColumn("n1",
        coalesce(sum(when(col("r") === 1L, col("n_r"))).over(w), lit(0L)))
      .filter(col("r") <= maxR)
      .join(broadcast(cc.select((col("r") - 1L).as("r"),
        col("n_r").as("n_r_next"))), Seq("r"), "left")
      .withColumn("n_r_next", coalesce(col("n_r_next"), lit(0L)))
      .select(col("r"), col("n_r"), col("n_r_next"),
        col("n_tokens"), col("vocab"),
        expr("((r + 1) * n_r_next * 1000000) div n_r").as("r_star_micro"),
        expr("(n1 * 1000000) div n_tokens").as("p_unseen_micro"))
  }

  // ------------------------------------------- leave-one-group-out deltas

  /** Data-ablation planning: for every group, the corpus mean of `value`
    * WITHOUT that group — `(T − T_g)/(N − N_g)` from one group-keyed
    * aggregate plus grand totals over the group-count-sized frame (a
    * bounded whole-frame window, no corpus re-scan, no 1-row cross
    * join). The classic cheap proxy for leave-one-source-out influence:
    * exact integer totals, one IEEE division per mean, `delta =
    * mean_without − mean_all`. Groups owning the whole corpus get a
    * NULL `mean_without`.
    */
  def looDeltas(df: DataFrame, group: Column, value: Column): DataFrame = {
    val w = Window.partitionBy()
    df.groupBy(group.as("g"))
      .agg(sum(value.cast("long")).as("t_g"), count(lit(1)).as("n_g"))
      .withColumn("t_all", sum(col("t_g")).over(w))
      .withColumn("n_all", sum(col("n_g")).over(w))
      .select(col("g"), col("n_g"),
        (col("t_all").cast("double") / col("n_all").cast("double"))
          .as("mean_all"),
        when(col("n_all") > col("n_g"),
          (col("t_all") - col("t_g")).cast("double") /
            (col("n_all") - col("n_g")).cast("double")).as("mean_without"))
      .withColumn("delta", col("mean_without") - col("mean_all"))
  }

  // --------------------------------------------- Adamic-Adar link scores

  /** Numerator of the inverse-log weight: 10^6 * 2^20, so
    * `w_micro = num div log2Fixed(deg)` is ~10^6/log2(deg) as an exact
    * integer division both engines replay.
    */
  val AaMicroNum = 1048576000000L

  /** Adamic-Adar co-neighbor scores over a bipartite edge set
    * `(center, leaf)`: every leaf pair sharing a center scores
    * Σ_centers 10^6 / log2(deg(center)) — the classic link-prediction /
    * item-similarity weight (Adamic & Adar 2003), with log2 riding
    * [[Log2Fixed]] so the score is exact integer algebra.
    *
    * Scale shape: wedge pairs are emitted ROW-LOCALLY from each
    * center's sorted leaf set (the [[graft.queries.PipelineQueries]]
    * co-occurrence shape) — never a leaf-on-leaf self-join — and
    * centers are degree-capped BEFORE their adjacency is collected, so
    * a hub center can neither materialize an unbounded array nor emit
    * deg² wedges. The cap is part of the operator's semantics (hub
    * centers carry the least AA weight anyway) and the oracle applies
    * the identical cutoff. Output: top-`k` `(node_a, node_b, n_common,
    * aa_micro)` by score, ties broken on the pair.
    */
  def adamicAdarTopK(
      edges: DataFrame, centerCol: String, leafCol: String,
      maxCenterDegree: Long, k: Int): DataFrame = {
    // the distinct frame feeds BOTH legs (degree weights + the adjacency
    // join); left as a plain plan the optimizer compiled the 2-Exchange
    // distinct subtree TWICE (exchange reuse does not fire across the
    // aggregate/join boundary here — q_link_predict's executed plan
    // carried two identical corpus-sized distinct stages). Materialize it
    // once; both legs then read the checkpoint, and AQE sees exact stats
    // for the weight join.
    val e = edges
      .select(col(centerCol).as("ctr"), col(leafCol).as("leaf")).distinct()
      .cutLineage()
    val centerW = e.groupBy("ctr").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2L && col("deg") <= maxCenterDegree)
      .withColumn("lg", MathExprs.log2Fixed(col("deg")))
      .select(col("ctr"), expr(s"${AaMicroNum}L div lg").as("w_micro"))
    val adj = e.join(centerW, "ctr")
      .groupBy(col("ctr"), col("w_micro"))
      .agg(sort_array(collect_set(col("leaf"))).as("ls"))
    adj
      .select(col("w_micro"),
        explode(flatten(transform(col("ls"), (x, i) =>
          transform(slice(col("ls"), i + 2, size(col("ls"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("node_a"), col("p.b").as("node_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("w_micro")).as("aa_micro"))
      .orderBy(col("aa_micro").desc, col("node_a"), col("node_b"))
      .limit(k)
  }

  // ------------------------------------------------- Poisson bootstrap CI

  /** Cumulative Poisson(1) CDF at k = 0..6 — the threshold ladder that
    * turns one uniform draw into a bootstrap replication weight
    * (weights ≥ 7 are folded into 7; P ≈ 8·10^-5). Computed once in a
    * fixed operation order; the oracle receives these exact doubles as
    * literals.
    */
  val PoissonCdf1: Array[Double] = {
    val e1 = math.exp(-1.0)
    val fact = Array(1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0)
    fact.map(f => e1 / f).scanLeft(0.0)(_ + _).tail
  }

  /** Poisson bootstrap (the resampling scheme that DISTRIBUTES: each row
    * draws an independent Poisson(1) replication weight per replicate,
    * so no replicate ever needs a global with-replacement shuffle) of
    * the mean of `cents`, with a deterministic splitmix-keyed draw per
    * `(id, replicate)`. Output ONE row: `(n_reps, point_mean, ci_lo,
    * ci_hi)` — point from a weight-1 pseudo-replicate, lo/hi the
    * `loRank`/`hiRank`-th order statistics of the replicate means.
    *
    * Scale shape: the explode multiplies rows by `reps+1` but collapses
    * map-side into `reps+1` partial-agg groups — the shuffle carries
    * O(reps × partitions) rows; the order-statistic window runs on the
    * reps-sized frame (bounded by construction). Means are
    * `(Σ w·cents)/(Σ w)/100` — two correctly-rounded IEEE divisions of
    * exact longs, engine-portable.
    */
  def poissonBootstrapCi(
      rows: DataFrame, id: Column, cents: Column,
      reps: Int, loRank: Int, hiRank: Int, salt: Int): DataFrame = {
    require(reps >= 2 && loRank >= 1 && hiRank <= reps && loRank < hiRank,
      s"bad bootstrap ranks: reps=$reps lo=$loRank hi=$hiRank")
    val h = BloomExprs.splitmixHash(
      col("id") * lit(1000003L) + col("r"), salt)
    val u = shiftrightunsigned(h, 11).cast("double") /
      lit(9007199254740992.0)
    val ladder = PoissonCdf1.zipWithIndex.reverse
      .foldLeft(lit(7L)) { case (els, (t, i)) =>
        when(u < lit(t), lit(i.toLong)).otherwise(els)
      }
    val perRep = rows
      .select(id.cast("long").as("id"), cents.cast("long").as("c"))
      .withColumn("r", explode(sequence(lit(-1), lit(reps - 1))))
      .withColumn("w", when(col("r") === -1L, lit(1L)).otherwise(ladder))
      .groupBy("r")
      .agg(sum(col("w") * col("c")).as("sc"), sum(col("w")).as("sw"))
      .select(col("r"),
        when(col("sw") > 0L,
          col("sc").cast("double") / col("sw").cast("double") / lit(100.0))
          .as("mean"))
    // one window over reps+1 rows (bounded by construction): the point
    // pseudo-replicate sorts first, bootstrap replicates by mean
    val rk = row_number().over(Window.orderBy(
      (col("r") =!= -1L).asc, col("mean").asc_nulls_last, col("r").asc))
    perRep.withColumn("rk", rk).agg(
      lit(reps.toLong).as("n_reps"),
      max(when(col("rk") === 1, col("mean"))).as("point_mean"),
      max(when(col("rk") === loRank + 1, col("mean"))).as("ci_lo"),
      max(when(col("rk") === hiRank + 1, col("mean"))).as("ci_hi"))
  }

  // ------------------------------------- distributed k-th order statistic

  /** Exact k-th smallest value of long column `c` (1-based rank, ties
    * counted) without a global sort: three bounded passes — a 2^16-wide
    * coarse bucket histogram, a 16-wide sub-bucket histogram inside the
    * selected coarse bucket, then value counts over the ≤16 distinct
    * values of the selected sub-bucket. Every driver collect is
    * histogram-sized (guarded), never row-sized; callers scanning the
    * frame repeatedly should persist it. Arithmetic shifts preserve
    * order for negatives too, so the domain is all of int64. Returns
    * None when the frame has fewer than `k` rows.
    */
  def kthSmallest(df: DataFrame, c: String, k: Long): Option[Long] = {
    require(k >= 1, s"kthSmallest needs k >= 1, got $k")
    def locate(hist: Array[(Long, Long)], kk: Long): Option[(Long, Long)] = {
      var rem = kk
      var i = 0
      while (i < hist.length) {
        val (b, n) = hist(i)
        if (rem <= n) return Some((b, rem))
        rem -= n
        i += 1
      }
      None
    }
    def hist(d: DataFrame, bucket: Column): Array[(Long, Long)] = {
      val rows = d.filter(col(c).isNotNull)
        .groupBy(bucket.as("b")).agg(count(lit(1)).as("n"))
        .orderBy("b").collect()
      require(rows.length <= (1 << 20),
        s"selection histogram exceeds ${1 << 20} buckets — widen the bucket shifts")
      rows.map(r => (r.getLong(0), r.getLong(1)))
    }
    for {
      (b1, k1) <- locate(hist(df, shiftright(col(c), 16)), k)
      in1 = df.filter(shiftright(col(c), 16) === b1)
      (b2, k2) <- locate(hist(in1, shiftright(col(c), 4)), k1)
      (v, _) <- locate(hist(in1.filter(shiftright(col(c), 4) === b2), col(c)), k2)
    } yield v
  }

  // ------------------------------------------------------ split conformal

  /** Split-conformal prediction interval (Papadopoulos et al. 2002 /
    * Vovk): fit a trivial per-group mean model on the calibration
    * split, take `q_hat` = the ceil((n+1)·0.9)-th smallest calibration
    * residual (capped at n — the finite-sample infinite-interval case),
    * and report coverage of `|y − pred| ≤ q_hat` on the held-out split;
    * by the conformal guarantee that coverage concentrates at ≥ 90%.
    *
    * All-integer residuals (cents; pred is an integer division), the
    * order statistic via [[kthSmallest]] (three bounded passes, no
    * global sort), the group model a broadcast-sized table. Output ONE
    * row: `(n_cal, k_rank, q_hat_cents, n_test, covered, coverage)`.
    */
  def splitConformal(
      rows: DataFrame, group: Column, yCents: Column,
      isCalib: Column): DataFrame = {
    val base = rows.select(
      group.as("g"), yCents.cast("long").as("y"), isCalib.as("cal"))
    val preds = base.filter(col("cal")).groupBy("g")
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
      .select(col("g"), expr("sy div n").as("pred"))
    val resid = base.join(broadcast(preds), Seq("g"))
      .select(col("cal"), abs(col("y") - col("pred")).as("r"))
      // null labels (nulled-input sweeps) carry no residual — excluded
      // from calibration ranks AND test coverage, mirrored in the oracle
      .filter(col("r").isNotNull)
      .persist()
    try {
      val calib = resid.filter(col("cal"))
      val nCal = calib.count()
      val k = math.min(((nCal + 1L) * 9L + 9L) / 10L, nCal)
      val qHat = if (nCal == 0L) None else kthSmallest(calib, "r", k)
      val qLit = qHat.map(lit(_)).getOrElse(lit(null).cast("long"))
      resid.filter(!col("cal")).agg(
        lit(nCal).as("n_cal"),
        lit(k).as("k_rank"),
        qLit.as("q_hat_cents"),
        count(lit(1)).as("n_test"),
        sum((col("r") <= qLit).cast("long")).as("covered"))
        .withColumn("coverage",
          when(col("n_test") > 0L,
            col("covered").cast("double") / col("n_test").cast("double")))
    } finally resid.unpersist(blocking = false)
  }

  // ------------------------------------------------- capture-recapture

  /** Chapman capture-recapture estimate of a hidden population size —
    * "how many distinct users/entities exist, counting only what two
    * independent observation windows saw?" (the ecology estimator,
    * routinely abused for corpus questions: how many near-dup clusters
    * exist given two detectors; how many active users given two
    * sampling days). With `n1`/`n2` the units seen in each capture and
    * `m` seen in both, the bias-corrected Chapman estimator
    *
    *   N̂ = (n1+1)·(n2+1) DIV (m+1) − 1
    *
    * is exact intdiv on exact longs. The observed union `n_seen` rides
    * along, as does the estimator's implied undercount
    * `unseen_hat = N̂ − n_seen` (floored at 0 — Chapman can land under
    * the union when overlap is near-total).
    *
    * Scale shape: ONE unit-keyed aggregate collapses the event corpus to
    * per-unit capture flags (map-side combined), one 1-row fold after —
    * the [[graft.ops.ExperimentOps.abTest]] two-aggregate contract. No
    * distinct-join, no corpus shuffle beyond the unit collapse.
    *
    * Output: `(n1, n2, m_both, n_seen, n_hat, unseen_hat)`.
    */
  def captureRecapture(
      df: DataFrame, unit: Column, inCapture1: Column,
      inCapture2: Column): DataFrame = {
    val perUnit = df
      .select(unit.as("u"), inCapture1.cast("boolean").as("c1"),
        inCapture2.cast("boolean").as("c2"))
      .filter(col("u").isNotNull)
      .groupBy(col("u"))
      .agg(max(coalesce(col("c1"), lit(false))).as("in1"),
        max(coalesce(col("c2"), lit(false))).as("in2"))
      .filter(col("in1") || col("in2"))
    val m = perUnit.agg(
      coalesce(sum(col("in1").cast("long")), lit(0L)).as("n1"),
      coalesce(sum(col("in2").cast("long")), lit(0L)).as("n2"),
      coalesce(sum((col("in1") && col("in2")).cast("long")), lit(0L))
        .as("m_both"),
      count(lit(1)).as("n_seen"))
    val nHat = expr("(n1 + 1) * (n2 + 1) DIV (m_both + 1) - 1")
    m.select(
      col("n1"), col("n2"), col("m_both"), col("n_seen"),
      nHat.as("n_hat"),
      greatest(lit(0L), nHat - col("n_seen")).as("unseen_hat"))
  }

  // --------------------------------------------- clustering-vs-truth eval

  /** Pairwise evaluation of a predicted clustering against a reference
    * clustering — the metric that grades a near-dup detector against
    * ground truth at corpus scale, where per-item label matching is
    * meaningless (cluster IDs are arbitrary) but PAIR agreement is not:
    * precision/recall/F1 over same-cluster pairs, plus the
    * chance-corrected Adjusted Rand Index.
    *
    * Everything reduces to three pair-sum moments off ONE contingency
    * aggregate: with `nij` the (pred, truth) cell counts, the DOUBLED
    * pair sums `sij2 = Σ nij·(nij−1)`, `sa2 = Σ ai·(ai−1)` and
    * `sb2 = Σ bj·(bj−1)` are exact longs — and the marginals attach to
    * the cell frame as PARTITIONED windows (`ai` over pred, `bj` over
    * truth), so `sa2 = Σ_cells nij·(ai−1)` needs no second shuffle and
    * no 1-row cross join. Precision/recall/F1 land exactly on the ×10⁶
    * grid (`f1 = 2·sij2/(sa2+sb2)` — the doubled sums cancel); ARI
    * closes as ONE fixed double chain over DECIMAL(38,0) products
    * (`sa2·sb2 ≤ n⁴` outgrows int64 past ~55k rows):
    *
    *   ARI = 2·(C2d·sij2 − sa2·sb2) / (C2d·(sa2+sb2) − 2·sa2·sb2),
    *   C2d = n·(n−1)
    *
    * Scale shape: one corpus-grain groupBy(pred, truth), then windows
    * and folds on the CELL frame (bounded by cluster-pair count). The
    * ARI denominator is 0 only when both clusterings are trivial
    * (all-singletons or one-cluster) — NULL then. Value contract for
    * the ×10⁶ grid: `10⁶·Σ size² < 2^63` (doubled pair mass to ~9×10¹²
    * — holds whenever cluster sizes are bounded, the near-dup regime;
    * ANSI mode raises loudly on breach, and the decimal ARI itself has
    * no such bound).
    *
    * Output: `(n, pairs_both, pairs_pred, pairs_true, precision_micro,
    * recall_micro, f1_micro, ari)`.
    */
  def clusteringPairEval(
      assign: DataFrame, pred: Column, truth: Column): DataFrame = {
    val a = assign.select(pred.as("p"), truth.as("t"))
      .filter(col("p").isNotNull && col("t").isNotNull)
    val cell = a.groupBy(col("p"), col("t")).agg(count(lit(1)).as("nij"))
    val wp = Window.partitionBy(col("p"))
    val wt = Window.partitionBy(col("t"))
    val cw = cell
      .withColumn("ai", sum(col("nij")).over(wp))
      .withColumn("bj", sum(col("nij")).over(wt))
    val m = cw.agg(
      coalesce(sum(col("nij")), lit(0L)).as("n"),
      coalesce(sum(col("nij") * (col("nij") - 1L)), lit(0L)).as("sij2"),
      coalesce(sum(col("nij") * (col("ai") - 1L)), lit(0L)).as("sa2"),
      coalesce(sum(col("nij") * (col("bj") - 1L)), lit(0L)).as("sb2"))
    val dec = "decimal(38,0)"
    val c2d = (col("n") * (col("n") - 1L)).cast(dec)
    val ariNum = c2d * col("sij2").cast(dec) -
      col("sa2").cast(dec) * col("sb2").cast(dec)
    val ariDen = c2d * (col("sa2") + col("sb2")).cast(dec) -
      lit(2L).cast(dec) * col("sa2").cast(dec) * col("sb2").cast(dec)
    m.select(
      col("n"),
      expr("sij2 DIV 2").as("pairs_both"),
      expr("sa2 DIV 2").as("pairs_pred"),
      expr("sb2 DIV 2").as("pairs_true"),
      when(col("sa2") > 0L, expr("(1000000 * sij2) DIV sa2"))
        .as("precision_micro"),
      when(col("sb2") > 0L, expr("(1000000 * sij2) DIV sb2"))
        .as("recall_micro"),
      when(col("sa2") + col("sb2") > 0L,
        expr("(2000000 * sij2) DIV (sa2 + sb2)")).as("f1_micro"),
      when(ariDen > 0,
        lit(2.0) * ariNum.cast("double") / ariDen.cast("double")).as("ari"))
  }
}
