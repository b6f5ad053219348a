package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Every operator here
  * is a pure row-local predicate or a bounded top-k — no RNG state, no
  * `rand()` (whose per-partition seeding makes results depend on the
  * partition layout, i.e. NOT reproducible across cluster sizes). At
  * 100 TB, "reproducible sample" means: re-running the job on different
  * hardware, executor counts, or input splits selects the SAME rows.
  */
object SamplingOps {

  /** Keep-predicate selecting `numerator/denominator` of rows keyed by a
    * content hash: `pmod(xxhash64(key), denom) < num`. Row-local (no
    * shuffle), reproducible under any partitioning, and consistent across
    * datasets — the same key always lands on the same side, so a document
    * and its derived rows (chunks, embeddings) are sampled together when
    * keyed identically.
    */
  def hashKeep(key: Column, numerator: Int, denominator: Int): Column = {
    require(denominator > 0 && numerator >= 0 && numerator <= denominator,
      s"bad sample rate $numerator/$denominator")
    pmod(xxhash64(key), lit(denominator.toLong)) < numerator.toLong
  }

  /** [[hashKeep]] with an ANSI-portable affine hash instead of xxhash64:
    * `h = ((key mod p) * A + B) mod p` over the prime p = 999999937 with
    * A = 2654435761 (Knuth's multiplicative constant), then
    * `h mod denominator < numerator`. The inner `key mod p` keeps every
    * intermediate below 2^61 for ANY long key (no overflow at
    * trillion-row id ranges, ANSI-safe), and the whole predicate is
    * expressible verbatim in any SQL engine — this is the oracle-able
    * twin. Weaker avalanche than xxhash64 (an affine map, not a mixer):
    * fine for rate sampling keyed by ids; prefer [[hashKeep]] when the
    * key is adversarial or clustered content.
    */
  def portableHashKeep(key: Column, numerator: Int, denominator: Int): Column = {
    require(denominator > 0 && numerator >= 0 && numerator <= denominator,
      s"bad sample rate $numerator/$denominator")
    val p = 999999937L
    pmod(
      pmod(key.cast("long"), lit(p)) * lit(2654435761L) + lit(104729L),
      lit(p)) % denominator < numerator
  }

  /** Uniform deterministic sample of ~`numerator/denominator` keyed by
    * `key` (see [[hashKeep]]; `portable = true` swaps in
    * [[portableHashKeep]]).
    */
  def hashSample(df: DataFrame, key: Column, numerator: Int, denominator: Int,
      portable: Boolean = false): DataFrame =
    df.filter(
      if (portable) portableHashKeep(key, numerator, denominator)
      else hashKeep(key, numerator, denominator))

  /** Stratified deterministic sample: per-stratum keep rates in
    * `percentByStratum` (0-100, applied as `id % 100 < pct`), `defaultPercent`
    * for unlisted strata. Uses the row id rather than a hash so the exact
    * same predicate is expressible in any ANSI engine (the oracle story);
    * for content-keyed reproducibility across datasets prefer [[hashKeep]]
    * on a stable key. Row-local — no shuffle, no per-stratum pass: one
    * predicate evaluates all strata (vs `df.stat.sampleBy`, which is
    * rand()-seeded per partition and not layout-stable).
    */
  def stratifiedExact(
      df: DataFrame,
      idCol: Column,
      stratumCol: Column,
      percentByStratum: Map[String, Int],
      defaultPercent: Int): DataFrame = {
    val pct = percentByStratum.toSeq.sortBy(_._1)
      .foldRight(lit(defaultPercent)) { case ((s, p), els) =>
        when(stratumCol === s, lit(p)).otherwise(els)
      }
    df.filter(pmod(idCol.cast("long"), lit(100L)) < pct.cast("long"))
  }

  /** Exactly-k uniform sample without a global sort: order by a content
    * hash and take k. Physically a `TakeOrderedAndProject` — each task
    * keeps a k-row heap, the driver merges #tasks * k rows; nothing close
    * to a full-data sort/shuffle at any scale. Deterministic for a fixed
    * dataset (ties on the 64-bit hash broken by the hash of the full
    * struct are astronomically unlikely; the k-th boundary is stable).
    */
  def hashTopK(df: DataFrame, key: Column, k: Int): DataFrame =
    df.withColumn("__hk", xxhash64(key))
      .orderBy(col("__hk"))
      .limit(k)
      .drop("__hk")

  /** Exactly-k-per-group deterministic sample: the k rows of each group
    * with the HIGHEST (scoreCol, lowest id tie-break) — rank them by a
    * content hash/fingerprint for an unbiased-but-reproducible draw.
    * Returns (group, id, rank), rank 1..k (gaps only when a group has
    * fewer than k rows).
    *
    * Rides [[graft.agg.TopKByScoreAgg]] two-phase aggregation: each map
    * task forwards at most k pairs per group, so the shuffle carries
    * groups x k x partitions rows — a `row_number` window would shuffle
    * and per-partition-sort EVERY row. The per-group selection question at
    * corpus scale (billions of rows, thousands of groups) is exactly where
    * the bounded-buffer aggregate beats the window.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: Column,
      scoreCol: Column,
      idCol: Column,
      k: Int): DataFrame =
    df.groupBy(groupCol.as("group"))
      .agg(graft.agg.TopKFunctions.topKByScore(
        scoreCol.cast("double"), idCol.cast("long"), k).as("__top"))
      .select(col("group"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("group"), col("__e.id").as("id"),
        (col("__p") + 1).cast("long").as("rank"))

  /** The portable affine hash as a VALUE in [0, p): the building block of
    * [[portableHashKeep]], exposed so weighted sampling can use the same
    * ANSI-expressible pseudo-uniform draw.
    */
  def portableAffine(key: Column): Column = {
    val p = 999999937L
    pmod(pmod(key.cast("long"), lit(p)) * lit(2654435761L) + lit(104729L), lit(p))
  }

  /** Weighted sampling without replacement, exactly k per group
    * (Efraimidis & Spirtakis 2006, "A-ES"): each row draws a deterministic
    * pseudo-uniform u in (0,1) from [[portableAffine]] of its id and gets
    * priority `ln(u) / w`; the k highest priorities per group are the
    * sample. Selection probabilities are proportional to `w` without
    * replacement — the standard one-pass weighted reservoir, made
    * layout-reproducible by replacing the RNG with the content hash.
    *
    * Scale shape: the draw and priority are row-local; the per-group top-k
    * rides [[graft.agg.TopKByScoreAgg]] (each map task forwards at most k
    * rows per group — no window, no full sort). Rows with w <= 0 are
    * excluded (A-ES is undefined there).
    *
    * Determinism note: `ln` is not guaranteed correctly-rounded, so two
    * priorities within ~1 ulp could order differently across engines; with
    * continuous hash-driven priorities the collision probability is
    * ~n²·2⁻⁵⁰ per group. The priority itself is NOT emitted (only ranks),
    * so outputs stay engine-comparable.
    * Output: (group, id, rank), rank 1..k.
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      groupCol: Column,
      weightCol: Column,
      idCol: Column,
      k: Int): DataFrame = {
    val p = 999999937L
    val u = (portableAffine(idCol) + 1).cast("double") / (p + 1).toDouble
    topKPerGroup(
      df.filter(weightCol > 0),
      groupCol,
      log(u) / weightCol.cast("double"),
      idCol,
      k)
  }

  /** Data mixing: resample each source to a target weight. Weight w means
    * every row appears `floor(w)` times plus one extra copy for a
    * deterministic `w - floor(w)` fraction of rows — so w = 2.5 duplicates
    * every row twice and a reproducible half of them a third time, and
    * w = 0.25 keeps a quarter. Appends a `copy` column (0-based replica
    * index) so downstream shuffling/packing can distinguish replicas.
    *
    * This is the pretraining mixture step (upweight curated sources,
    * downweight crawl): at 100 TB it is a pure row-local map — a chained
    * `when` resolves the weight (no join), `sequence` + `explode` emits
    * the copies, and the fractional keep is the same id-modulus predicate
    * as [[stratifiedExact]] (layout-invariant, ANSI-expressible for the
    * oracle; key by a content hash upstream if ids are not stable).
    * Weights should be exact binary fractions (x.0/.25/.5/.75…) so
    * `floor`/`round` are exact in IEEE arithmetic on every engine.
    */
  /** Temperature-flattened mixture PLAN: given a per-source corpus and a
    * total row budget, allocate each source floor(budget · w_g / Σw)
    * rows with w_g = sqrt(n_g) — the α = 0.5 temperature that upweights
    * small sources relative to proportional sampling without letting one
    * giant crawl dominate (multilingual/multi-source pretraining's
    * standard mix). Allocations are capped at n_g (no oversampling here;
    * compose with [[mixtureResample]] for >1× epochs).
    *
    * Exactness/portability: n_g are exact counts; sqrt is the ONE
    * correctly-rounded float op, immediately quantized to an integer
    * milli-weight `floor(1000·sqrt(n_g))` — from there everything is
    * int64 arithmetic (sum, product, integer division), so the result is
    * reduction-order-proof and engine-portable. A float Σw would NOT be:
    * double summation order varies by engine and layout. α is fixed at
    * 0.5 deliberately: a general pow(n, α) is not correctly rounded on
    * every libm, sqrt is. Headroom: budget · w_milli needs
    * budget · 1000·sqrt(max n_g) < 2^63 — fine to ~10^12-row sources.
    *
    * Scale shape: ONE map-side-combined count per source, then integer
    * arithmetic on the sources-sized frame against a broadcast 1-row
    * total. Output: (source, n_docs, w_milli, alloc).
    */
  def temperatureMixturePlan(
      df: DataFrame,
      sourceCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    val counts = df.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_milli",
        floor(sqrt(col("n_docs").cast("double")) * 1000.0).cast("long"))
    val total = counts.agg(sum(col("w_milli")).as("__wsum"))
    counts.crossJoin(broadcast(total))
      .withColumn("__num", lit(budget) * col("w_milli"))
      // SQL `div`: exact int64 division — a double `/` would lose
      // precision past 2^53 and truncate differently per engine
      .withColumn("__alloc", expr("__num div __wsum"))
      .select(col("source"), col("n_docs"), col("w_milli"),
        least(col("n_docs"), col("__alloc")).as("alloc"))
  }

  /** Token-budget mixture allocation — the planning step BEFORE
    * [[mixtureResample]]: given explicit per-source mixture weights (on
    * an exact x10^6 integer grid) and a total training-token budget,
    * compute what each source must contribute and whether it has to be
    * oversampled (epochs > 1) to meet it. This is the arithmetic a
    * data-mixture spec ("30% web, 20% code, ...") turns into before
    * anyone samples a row.
    *
    * All integer: `target = budget x w div Σw`,
    * `epochs_micro = target x 10^6 div available` (>10^6 means the
    * source repeats). One corpus scan collapses to a sources-sized frame
    * (map-side-combined token sum); everything after is row-local
    * arithmetic against a broadcast 1-row weight total — the
    * [[temperatureMixturePlan]] shape with explicit weights and
    * token-denominated availability.
    *
    * Output: (source, available_tokens, w_micro, target_tokens,
    * epochs_micro, oversampled).
    */
  def tokenMixturePlan(
      df: DataFrame,
      sourceCol: Column,
      text: Column,
      weightsMicro: Map[String, Long],
      defaultMicro: Long,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be > 0, got $budgetTokens")
    val ws = weightsMicro.values.toSeq :+ defaultMicro
    require(ws.forall(_ >= 0), "mixture weights must be >= 0")
    // both products must stay within Long: budget x w, then target x 10^6
    require(budgetTokens <= Long.MaxValue / math.max(ws.max, 1L),
      s"budget x max weight overflows Long")
    require(budgetTokens <= Long.MaxValue / 1000000L,
      s"budget x 10^6 (the epochs grid) overflows Long")
    val avail = df.groupBy(sourceCol.as("source"))
      .agg(sum(TextOps.tokenCount(text)).as("available_tokens"))
    val w = weightsMicro.toSeq.sortBy(_._1)
      .foldRight(lit(defaultMicro)) { case ((s, x), els) =>
        when(col("source") === s, lit(x)).otherwise(els)
      }
    val withW = avail.withColumn("w_micro", w)
    val total = withW.agg(sum(col("w_micro")).as("__wsum"))
    withW.crossJoin(broadcast(total))
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * w_micro) div __wsum"))
      .withColumn("epochs_micro",
        when(col("available_tokens") > 0,
          expr("(target_tokens * 1000000) div available_tokens")))
      .withColumn("oversampled",
        (col("epochs_micro") > 1000000L).cast("int"))
      .select(col("source"), col("available_tokens"), col("w_micro"),
        col("target_tokens"), col("epochs_micro"), col("oversampled"))
  }

  def mixtureResample(
      df: DataFrame,
      sourceCol: Column,
      idCol: Column,
      weightBySource: Map[String, Double],
      defaultWeight: Double = 1.0,
      modulus: Int = 1000): DataFrame = {
    require(weightBySource.values.forall(_ >= 0) && defaultWeight >= 0,
      "mixture weights must be >= 0")
    // the fractional keep is an integer 1/modulus grid — reject weights it
    // cannot represent exactly (w = 1.0625 at modulus 1000 would silently
    // keep 6.3% instead of 6.25%)
    (weightBySource.values.toSeq :+ defaultWeight).foreach { w =>
      val permille = (w - math.floor(w)) * modulus
      require(math.abs(permille - math.rint(permille)) < 1e-9,
        s"weight $w is not representable on the 1/$modulus grid; " +
          s"use multiples of 1/$modulus or raise modulus")
    }
    val w = weightBySource.toSeq.sortBy(_._1)
      .foldRight(lit(defaultWeight)) { case ((s, x), els) =>
        when(sourceCol === s, lit(x)).otherwise(els)
      }
    val fw = floor(w)
    val whole = fw.cast("long")
    val fracPermille = round((w - fw) * modulus).cast("long")
    val keepExtra = when(
      pmod(idCol.cast("long") * 7919L + 13L, lit(modulus.toLong)) < fracPermille, 1L)
      .otherwise(0L)
    val copies = whole + keepExtra
    df.withColumn("copy",
      explode(when(copies > 0L, sequence(lit(0L), copies - 1L))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Budget-constrained best-first selection — "take the highest-quality
    * documents until the token budget is spent": exactly the rows whose
    * running weight, in (score DESC, id ASC) order, stays within
    * `budget`. Semantically identical to a global sort + running-sum
    * window, but that plan funnels the WHOLE corpus through one sorted
    * task chain — the classic 100 TB selection-killer. Instead:
    *
    *   1. ONE aggregation of per-score-class weight sums (score classes
    *      move, not rows — the integral score's value domain bounds the
    *      table, like a histogram);
    *   2. the driver walks the descending class table (a
    *      broadcast-threshold-sized collect): classes that fit entirely
    *      are IN, the first that doesn't is the boundary;
    *   3. one filtered pass emits better-than-boundary rows shuffle-free;
    *      ONLY the boundary class (a single score value) pays an exact
    *      id-ordered running sum for the remaining budget.
    *
    * Weights must be non-negative (validated from the same class
    * aggregate — a negative weight makes the running sum non-monotone and
    * the prefix semantics ill-defined); score must be integral (exact
    * class equality); rows whose score or weight is NULL are excluded
    * (an unscorable row cannot be ranked). Returns
    * `(idCol, score, weight)`.
    */
  def selectByBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: Column,
      weightCol: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val scored = df.select(col(idCol),
      scoreCol.cast("long").as("score"), weightCol.cast("long").as("weight"))
      .filter(col("score").isNotNull && col("weight").isNotNull)
    val classes = scored.groupBy(col("score"))
      .agg(sum(col("weight")).as("cw"), min(col("weight")).as("mw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)(Ordering[Long].reverse)
    classes.find(_._3 < 0).foreach { case (s, _, mw) =>
      throw new IllegalArgumentException(
        s"negative weight $mw in score class $s — prefix semantics need non-negative weights")
    }
    var cum = 0L
    var boundary: Option[(Long, Long)] = None // (score, remaining budget)
    val it = classes.iterator
    var walking = true
    while (walking && it.hasNext) {
      val (s, cw, _) = it.next()
      if (cum + cw <= budget) cum += cw
      else { boundary = Some((s, budget - cum)); walking = false }
    }
    boundary match {
      case None => scored // every class fits
      case Some((bScore, remaining)) =>
        val full = scored.filter(col("score") > bScore)
        // the window spans ONE score class — bounded unless the score is
        // degenerate (every doc identical), in which case no partitioning
        // of this problem avoids ordering that class
        val runWin = Window.orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val part = scored.filter(col("score") === bScore)
          .withColumn("__cum", sum(col("weight")).over(runWin))
          .filter(col("__cum") <= remaining)
          .drop("__cum")
        full.unionByName(part)
    }
  }
}
