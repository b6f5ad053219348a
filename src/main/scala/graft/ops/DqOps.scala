package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking (the Deequ/Great-Expectations gate a
  * production ingest runs before accepting a batch): declarative row
  * predicates plus key-uniqueness, evaluated in ONE pass, reported as one
  * row per rule. The reference performs the same kind of admission checks
  * when reading granules — fill-value screening and valid-range guards
  * per variable (`aggregate_functions.py` attribute handling) — here
  * generalized to arbitrary tables.
  *
  * Scale shape: every row predicate is a conditional partial sum riding a
  * single scan + single global aggregate (zero row shuffles — the same
  * plan as [[ProfileOps.profileApprox]]); key-uniqueness rides the same
  * pass as `count - count_distinct` (the distinct-value shuffle moves
  * VALUES of the key, never rows). The K-row report pivots row-locally.
  */
object DqOps {

  /** One row per rule: `(rule, n_rows, n_violations, status)` with
    * status 'pass' when the violation count is zero, else 'fail'.
    *
    * @param rules       (name, predicate-that-must-HOLD) pairs; a NULL
    *                    predicate result counts as a violation (the
    *                    Deequ convention: unknown is not compliant).
    * @param uniqueKeys  column names that must be globally unique;
    *                    each contributes a rule `unique_<col>` whose
    *                    violation count is `n_rows - n_distinct` (0 when
    *                    unique; NULL keys count toward violations since
    *                    count_distinct ignores them).
    */
  def check(
      df: DataFrame,
      rules: Seq[(String, Column)],
      uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "no constraints given")
    val allNames = rules.map(_._1) ++ uniqueKeys.map(k => s"unique_$k")
    require(allNames.distinct == allNames,
      s"constraint names collide (rule names and unique_<key> must be " +
        s"pairwise distinct): ${allNames.mkString(", ")}")
    require(allNames.forall(n => !n.contains(".") && !n.contains("`")),
      "constraint names must not contain '.' or '`' (column resolution)")
    val predAggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$name")
    }
    val uniqAggs = uniqueKeys.map { k =>
      (count(lit(1)) - count_distinct(col(k))).as(s"__v_unique_$k")
    }
    val one = df.agg(count(lit(1)).as("__rows"),
      (predAggs ++ uniqAggs): _*)
    val legs = allNames.map { n =>
      struct(lit(n).as("rule"), col("__rows").as("n_rows"),
        coalesce(col(s"__v_$n"), lit(0L)).as("n_violations"),
        when(coalesce(col(s"__v_$n"), lit(0L)) === 0L, "pass")
          .otherwise("fail").as("status"))
    }
    one.select(explode(array(legs: _*)).as("r")).select(col("r.*"))
  }

  /** Referential-integrity check (Deequ's `hasReferentialIntegrity`):
    * how many child rows reference a key absent from the parent. Same
    * report row shape as [[check]] so results union into one gate table.
    * A NULL foreign key counts as a violation (unknown is not compliant —
    * the [[check]] convention; SQL's nullable-FK semantics would be a
    * `fk IS NOT NULL` pre-filter by the caller).
    *
    * Scale shape: the parent contributes DISTINCT KEYS ONLY (dimension
    * -sized after the dedup — AQE broadcasts it when it fits); the child
    * side aggregates to one row with map-side partials, so nothing
    * child-sized ever shuffles when the key set broadcasts. For a
    * parent too big to broadcast, [[JoinOps.bloomAnti]] is the gated
    * probabilistic-prefilter path (q_bloom_anti).
    */
  def checkReferential(
      child: DataFrame,
      fk: Column,
      parent: DataFrame,
      pk: Column,
      name: String): DataFrame = {
    val keys = parent.select(pk.as("__pk")).distinct()
      .withColumn("__present", lit(1L))
    child.select(fk.as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__present").isNull, 1L).otherwise(0L)).as("__v"))
      .select(lit(name).as("rule"), col("__n").as("n_rows"),
        coalesce(col("__v"), lit(0L)).as("n_violations"),
        when(coalesce(col("__v"), lit(0L)) === 0L, "pass")
          .otherwise("fail").as("status"))
  }

  /** Continuous data-quality monitoring: [[check]] per event-time
    * tumbling window — the ingest-time twin a streaming pipeline runs to
    * catch a bad upstream deploy within one window instead of at the next
    * batch audit. Same conditional-partial-sum shape, so the aggregate is
    * incrementally mergeable and runs UNCHANGED as a Structured Streaming
    * query (`watermark` bounds state; in batch it is a no-op and results
    * are identical — pinned streamed==batch in DqOpsSpec). Key-uniqueness
    * is deliberately absent here: exact `count_distinct` is not an
    * incremental aggregate (streaming would need the dedup-then-count
    * form [[graft.streaming.EventOps.streamingDedup]] provides).
    *
    * Output: `(win_start, rule, n_rows, n_violations, status)`.
    */
  def checkWindowed(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      rules: Seq[(String, Column)],
      watermark: Option[String] = None): DataFrame = {
    require(rules.nonEmpty, "no constraints given")
    val src = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val aggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$name")
    }
    val one = src
      .groupBy(window(col(tsCol), windowDuration).as("win"))
      .agg(count(lit(1)).as("__rows"), aggs: _*)
    val legs = rules.map(_._1).map { n =>
      struct(lit(n).as("rule"), col("__rows").as("n_rows"),
        col(s"__v_$n").as("n_violations"),
        when(col(s"__v_$n") === 0L, "pass").otherwise("fail").as("status"))
    }
    one.select(
      date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
      explode(array(legs: _*)).as("r"))
      .select(col("win_start"), col("r.*"))
  }

  /** Benford's-law expected first-digit frequencies, log10(1 + 1/d) on a
    * fixed micro-unit grid (×10⁶, pre-rounded constants — libm log10 is
    * not correctly rounded, so computing them in-query would tie the
    * result to an engine's math library; the q_bm25 "rational idf"
    * discipline).
    */
  val benfordMicro: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit audit — the classic fabricated-numbers screen
    * for financial/measurement columns: naturally occurring multi-scale
    * magnitudes follow P(d) = log10(1 + 1/d); flat or hand-entered data
    * does not, and the per-digit deviation localizes WHICH digits are
    * off. `values` must be a positive integral column (zero/negative/
    * NULL rows are dropped and reported via n_total).
    *
    * Output: EXACTLY one row per leading digit 1-9 — a digit with zero
    * occurrences (the strongest fabrication signal) still emits its row
    * with `n = 0`, `obs_micro = 0`, `delta_micro = -exp_micro`, so
    * callers never have to infer deviation from an absent row. Columns:
    * `(digit, n, obs_micro, exp_micro, delta_micro)` — observed and
    * expected shares on the same exact ×10⁶ integer grid
    * (`n × 10⁶ ÷ total` in integer division, so every value is
    * engine-portable). On empty input all shares are 0. The 9-row share
    * step rides a window over the 9-row digit frame (k-bounded, same
    * shape as q_transition_matrix's totals).
    */
  def benford(df: DataFrame, values: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = df
      .select(values.cast("long").as("v"))
      .filter(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("int").as("digit"))
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
    // anchor on the literal 1-9 frame so zero-count digits emit a row
    val expected = (1 to 9).map(d => (d, benfordMicro(d)))
      .toDF("digit", "exp_micro")
    expected
      .join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("cnt"), lit(0L)))
      .withColumn("__total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      // integer `div`, not `/`: the share must live on the exact grid
      .withColumn("obs_micro",
        when(col("__total") === 0L, lit(0L))
          .otherwise(expr("(n * 1000000) div __total")))
      .withColumn("delta_micro", col("obs_micro") - col("exp_micro"))
      .select(col("digit"), col("n"), col("obs_micro"), col("exp_micro"),
        col("delta_micro"))
  }
}
