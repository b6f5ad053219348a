package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
