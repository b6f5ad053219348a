package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.BloomExprs

/** Count-min sketch — frequency estimation in fixed space (Cormode &
  * Muthukrishnan 2005), the streaming/scale answer to "how often does key
  * x occur?" when the key universe is too large for an exact groupBy.
  *
  * The sketch is a `d x w` counter grid: row `j` counts keys by hash
  * `h_j(key)`; an estimate reads one counter per row and takes the MIN.
  * Estimates NEVER undercount, and overcount only by colliding keys'
  * mass (<= 2N/w with probability 1 - (1/2)^d) — both properties are
  * deterministic given the hash family, and the family here is the same
  * oracle-replayable splitmix64 chain as the Bloom index
  * ([[graft.expr.BloomBitPos]]), so a DuckDB oracle gates the exact
  * counter values AND the estimate=min fold, not a statistical bound.
  *
  * Scale shape: building is one map-side-combined aggregate whose output
  * is sketch-sized (<= d*w rows) regardless of input rows; estimating is
  * a broadcast join of probe hash coordinates against that frame. No
  * corpus-sized shuffle anywhere — the 100 TB path is the same plan.
  */
object SketchOps {

  /** Build the `d x w` counter grid over `keyCol`: one row per non-empty
    * `(j, bucket)` cell (empty cells are implicit zeros — the frame stays
    * minimal under skew, `d*w` rows at worst).
    */
  def cmsSketch(df: DataFrame, keyCol: Column, w: Int, d: Int): DataFrame = {
    require(w > 0, s"width must be positive, got $w")
    require(d >= 1 && d <= 16, s"depth must be in [1, 16], got $d")
    val coords = (0 until d).map(j =>
      struct(lit(j).as("j"),
        BloomExprs.bitPos(keyCol.cast("long"), j, w).as("bucket")))
    df.select(explode(array(coords: _*)).as("c"))
      .select(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each probe: `est = min_j grid[j][h_j(p)]`
    * (missing cells read 0). `sketch` and `probes` are both tiny, so the
    * whole lookup is broadcast joins.
    */
  def cmsEstimate(
      sketch: DataFrame, probes: DataFrame, probeCol: Column,
      w: Int, d: Int): DataFrame = {
    val coords = (0 until d).map(j =>
      struct(lit(j).as("j"),
        BloomExprs.bitPos(col("probe"), j, w).as("bucket")))
    probes.select(probeCol.cast("long").as("probe"))
      .select(col("probe"), explode(array(coords: _*)).as("c"))
      .select(col("probe"), col("c.j").as("j"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }
}
