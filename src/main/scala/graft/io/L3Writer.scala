package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.engine.GridAggregation
import graft.model.JobConfig

/** L3 gridded sink (S4, reference `addGridEntry`
  * `aggregate_functions.py:413-453` + sink loop `:724-757`).
  *
  * Primary sink is Parquet of the grid frame — one row per cell with
  * `lat_idx/lon_idx/lat_center/lon_center` plus all statistic columns; the
  * dense (lat, lon) array layout of the reference's HDF5 is a presentation
  * concern left to consumers (the grid is at most tens of thousands of
  * rows — driver-small — while the engine output stays distributed).
  *
  * Reference packing/naming rules reproduced:
  *   - int-packing `round(value/scale + offset)` with NaN/Inf/NULL -> fill
  *     (`:428-435`);
  *   - counts and histograms stay integer (scale 1, `:424-427`);
  *   - `Cloud_Fraction*` datasets are forced to scale 1e-4, offset 0,
  *     fill -9999 (`:741-744`);
  *   - `_1km` is stripped from output dataset names (`:745-748`);
  *   - an existing output path is a hard error — the reference's
  *     output-exists shell guard (S5, `:610-617`) becomes
  *     `SaveMode.ErrorIfExists`.
  */
object L3Writer {

  final case class Packing(scale: Double, offset: Double, fill: Long)

  val DefaultCloudFractionPacking: Packing = Packing(1e-4, 0.0, -9999L)

  /** Int-pack one statistic column: `round(v/scale + offset)`, non-finite
    * and NULL to `fill`.
    */
  def pack(v: Column, p: Packing): Column =
    when(v.isNull || isnan(v) || v === Double.PositiveInfinity ||
      v === Double.NegativeInfinity, lit(p.fill))
      .otherwise(round(v / p.scale + p.offset).cast("long"))

  /** Output name for a statistic column: strip `_1km`. */
  def outputName(col: String): String = col.replace("_1km", "")

  /** Apply packing + naming to a grid frame. `packings` maps statistic
    * column name -> packing; unlisted columns pass through unpacked
    * (counts, histograms, indexes). Cloud-fraction columns default to the
    * forced reference packing when not explicitly listed.
    */
  def packGrid(grid: DataFrame, packings: Map[String, Packing]): DataFrame = {
    val outCols = grid.columns.map { c =>
      val p = packings.get(c).orElse {
        if (c.startsWith("cloud_fraction") &&
          !c.endsWith("_Pixel_Counts") && c != "GRID_Counts")
          Some(DefaultCloudFractionPacking)
        else None
      }
      p.fold(col(c).as(outputName(c)))(pk => pack(col(c), pk).as(outputName(c)))
    }
    grid.select(outCols.toIndexedSeq: _*)
  }

  /** Write the L3 grid. Default mode reproduces the reference's
    * "output already exists" abort.
    */
  def write(
      grid: DataFrame,
      cfg: JobConfig,
      path: String,
      packings: Map[String, Packing] = Map.empty,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    packGrid(GridAggregation.withGridIndexes(grid, cfg), packings)
      // single file: the grid is <= grid_lat*grid_lon rows (tiny by design)
      .coalesce(1)
      .write.mode(mode).parquet(path)

  /** Axis vectors `lat_bnd`/`lon_bnd` (cell-center coordinates, reference
    * `:532-536`, `:728-733`) — driver-side tiny frames.
    */
  def latBounds(cfg: JobConfig): Seq[Double] =
    (0 until cfg.grid.gridLat).map(i =>
      cfg.grid.region.latMin + cfg.grid.latGap / 2 + i * cfg.grid.latGap)
  def lonBounds(cfg: JobConfig): Seq[Double] =
    (0 until cfg.grid.gridLon).map(i =>
      cfg.grid.region.lonMin + cfg.grid.lonGap / 2 + i * cfg.grid.lonGap)
}
