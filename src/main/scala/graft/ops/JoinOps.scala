package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed keys at scale.
  *
  * Spark's AQE rewrites skewed SORT-MERGE joins at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`), but only after a stage
  * materializes, only for SMJ/shuffled-hash, and only when one side's
  * partitions exceed the skew thresholds. Explicit salting is the
  * deterministic-plan alternative: spread each hot key over `saltBuckets`
  * reducers by appending a synthetic salt to the join key, replicating the
  * (smaller) other side to every salt value. The result set is IDENTICAL
  * to the plain join for any salt assignment — salt only changes row
  * routing — so correctness never depends on the salt function.
  */
object JoinOps {

  /** Equi-join `skewed` with `other` on `keys`, spreading each key of the
    * skewed side over `saltBuckets` shuffle partitions. `other` is
    * replicated `saltBuckets`x (use the SMALLER side there; replication is
    * the price of de-skewing).
    *
    * The salt is derived from `monotonically_increasing_id()` — stable
    * under task retry (partition-index based), needs no data inspection,
    * and uniform by construction.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    // right/full outer would emit each UNMATCHED replicated `other` row
    // once per salt value — reject join types whose semantics the
    // replication breaks
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    val s = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val o = other.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    s.join(o, keys :+ "__salt", joinType).drop("__salt")
  }
}
