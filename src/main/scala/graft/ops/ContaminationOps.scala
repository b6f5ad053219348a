package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.TextExprs

/** Eval-set decontamination: score every training document by the fraction
  * of its distinct word k-shingles that also occur in a benchmark corpus —
  * the standard contamination signal used to drop test-set leakage from
  * pretraining data.
  *
  * Scale shape: the benchmark side (eval sets — thousands of documents,
  * not billions) collapses to ONE row holding its sorted distinct
  * shingle-hash set via map-side-deduped `collect_set`, broadcast to every
  * executor. The corpus side is then a PURE MAP over the scan: row-local
  * codegen'd [[graft.expr.ShingleHashes]] (sorted distinct set per doc)
  * merged against the broadcast set by the codegen'd linear
  * [[graft.expr.SortedIntersectCount]] walk. Zero shuffles of the corpus,
  * no join explosion, cost O(|doc shingles| + |bench shingles|) per row.
  * 100 TB of corpus scans at I/O speed; only the benchmark aggregation
  * (tiny) exchanges data.
  */
object ContaminationOps {

  /** All distinct shingle hashes of `textCol`, sorted ascending, as a
    * single-row DataFrame (column `__bench_sh`). Kept separate so callers
    * can cache/reuse one benchmark set across many corpus passes.
    */
  def benchmarkShingleSet(bench: DataFrame, textCol: String, k: Int): DataFrame =
    bench
      .select(TextExprs.shingleHashes(TextOps.tokens(col(textCol)), k).as("__sh"))
      .where(col("__sh").isNotNull)
      .select(explode(col("__sh")).as("__h"))
      .agg(sort_array(collect_set(col("__h"))).as("__bench_sh"))

  /** `docs` with an appended `contamination` column in [0,1]: the fraction
    * of the document's distinct k-shingles found in `bench`. NULL for
    * documents with fewer than `k` tokens (they have no shingles).
    */
  def contaminationScores(
      docs: DataFrame,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"shingle size must be >= 1, got $k")
    docs
      // staged: the shingle set is non-cheap and referenced twice below —
      // a named column keeps it computed once per row
      .withColumn("__dh", TextExprs.shingleHashes(TextOps.tokens(col(textCol)), k))
      .crossJoin(broadcast(benchmarkShingleSet(bench, benchTextCol, k)))
      .withColumn("contamination",
        TextExprs.sortedIntersectCount(col("__dh"), col("__bench_sh")).cast("double") /
          size(col("__dh")).cast("double"))
      .drop("__dh", "__bench_sh")
  }

  /** Pairwise shingle-overlap matrix between corpus slices (sources,
    * domains, dumps): for every slice pair a < b, the number of distinct
    * word k-shingles they share, each side's distinct-shingle count, and
    * the Jaccard overlap — the corpus-level leakage/redundancy audit that
    * decides which slices to down-weight or re-deduplicate.
    *
    * Scale shape: one distinct over (slice, 8-byte shingle hash) — the
    * shuffle carries the DISTINCT slice-shingle pairs, never occurrences —
    * then a self-equi-join on the hash whose fan-out per shingle is
    * bounded by slices-per-shingle² ≤ |slices|² (slices are dozens to
    * thousands, not corpus-sized), and a groupBy on slice pairs whose
    * result is ≤ |slices|². Per-slice sizes are a tiny aggregate,
    * broadcast back. No strings shuffle anywhere.
    */
  def overlapMatrix(
      docs: DataFrame,
      sliceCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"shingle size must be >= 1, got $k")
    val idx = docs
      .select(col(sliceCol).as("slice"),
        explode(TextExprs.shingleHashes(TextOps.tokens(col(textCol)), k)).as("h"))
      .distinct()
    val sizes = idx.groupBy(col("slice")).agg(count(lit(1)).as("n"))
    idx.as("a")
      .join(idx.as("b"), col("a.h") === col("b.h") && col("a.slice") < col("b.slice"))
      .groupBy(col("a.slice").as("src_a"), col("b.slice").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("slice").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("slice").as("src_b"), col("n").as("n_b"))), "src_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .select(col("src_a"), col("src_b"), col("n_common"),
        col("n_a"), col("n_b"), col("jaccard"))
  }
}
