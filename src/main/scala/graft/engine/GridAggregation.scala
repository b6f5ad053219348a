package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.StatsPlan
import graft.expr.GridExprs
import graft.model.JobConfig

/** The engine's one canonical pipeline (reference query lifecycle, SURVEY §3):
  *
  *   pixels -> region filter -> cell-id derive -> groupBy(cell) ->
  *   monoid aggregates -> finalize -> L3 grid frame
  *
  * Declared entirely with the DataFrame API so Catalyst handles predicate
  * pushdown, column pruning and two-phase (partial/final) hash aggregation —
  * the distributed-merge semantics the reference hand-rolls in its MPI/Dask
  * drivers (A10) fall out of `HashAggregateExec` for free.
  *
  * Scale notes (100 TB target): the single shuffle is keyed by `cell` —
  * at the canonical 1x1-degree global grid that is <= 64,800 groups x a few
  * hundred bytes of buffer per variable, so the shuffle after map-side
  * partial aggregation is tiny regardless of input volume (SURVEY §4). No
  * driver-side materialization happens here; only the final grid (<= 64,800
  * rows) is ever small enough to collect, and that is the sink's decision.
  */
object GridAggregation {

  /** Column roles the pixel frame must provide. */
  final case class PixelCols(
      lat: String = "lat",
      lon: String = "lon",
      granule: String = "granule_id",
      cmFlag: String = "cm_flag")

  /** Filter to region, derive the grid cell id, drop out-of-grid pixels
    * (reference P3 + P5, `aggregate_functions.py:297-363`).
    */
  def withCell(pixels: DataFrame, cfg: JobConfig, cols: PixelCols = PixelCols()): DataFrame = {
    val lat = col(cols.lat)
    val lon = col(cols.lon)
    val g = cfg.grid
    pixels
      .filter(GridExprs.inRegion(lat, lon, g.region))
      .withColumn("cell", GridExprs.cellId(lat, lon, g))
      .filter(GridExprs.cellInGrid(col("cell"), g))
  }

  /** Per-cell statistics for all configured variables (A1-A7). One shuffle,
    * keyed by cell; everything before it is map-side.
    */
  def aggregate(pixels: DataFrame, cfg: JobConfig, cols: PixelCols = PixelCols()): DataFrame = {
    require(cfg.vars.nonEmpty, "JobConfig.vars must not be empty")
    val cellged = withCell(pixels, cfg, cols)
    val partials = cfg.vars.flatMap(v => StatsPlan.partialAggs(v, cfg.stats))
    val grouped = cellged.groupBy(col("cell")).agg(partials.head, partials.tail: _*)
    val outs = col("cell") +: cfg.vars.flatMap(v => StatsPlan.finalizeCols(v, cfg.stats))
    grouped.select(outs: _*)
  }

  /** Cloud-fraction two-level aggregation (reference A9,
    * `aggregate_functions.py:365-380`): per (cell, granule) compute
    * `TOT = #(0 <= flag <= 3)`, `CLD = #(0 <= flag <= 1)`,
    * `Fraction = CLD/TOT`; then per cell:
    *
    *   - Mean = sum(CLD)/sum(TOT)  (pixel-weighted, NOT mean of fractions)
    *   - Min/Max over the per-granule fractions
    *   - Pixel_Counts = sum(TOT)
    *   - GRID_Counts = #granules contributing >= 1 determined pixel (A8)
    *
    * Two `groupBy`s = granule-level partials then a tiny cell-keyed merge —
    * the same shape as the reference's per-granule pre-aggregation, and the
    * second shuffle carries only (cells x granules-per-cell) rows.
    */
  def cloudFraction(pixels: DataFrame, cfg: JobConfig, cols: PixelCols = PixelCols()): DataFrame = {
    val cm = col(cols.cmFlag)
    val perGranule = withCell(pixels, cfg, cols)
      .groupBy(col("cell"), col(cols.granule))
      .agg(
        sum(when(cm >= 0 && cm <= 3, 1L).otherwise(0L)).as("tot_pix"),
        sum(when(cm >= 0 && cm <= 1, 1L).otherwise(0L)).as("cld_pix"))
      // TOT==0 -> NULL fraction (reference 0/0 -> NaN, skipped by min/max)
      .withColumn("fraction", col("cld_pix") / nullif(col("tot_pix"), lit(0L)))
    perGranule
      .groupBy(col("cell"))
      .agg(
        min(col("fraction")).as("cloud_fraction_Minimum"),
        max(col("fraction")).as("cloud_fraction_Maximum"),
        (sum(col("cld_pix")) / nullif(sum(col("tot_pix")), lit(0L)))
          .as("cloud_fraction_Mean"),
        sum(col("tot_pix")).as("cloud_fraction_Pixel_Counts"),
        count(when(col("tot_pix") > 0, 1)).as("GRID_Counts"))
  }

  /** Granule-coverage count per cell for one variable (reference A8,
    * `GRID_Counts`, `aggregate_functions.py:245-247`): the number of
    * granules that contributed at least one non-null pixel of `varName`.
    *
    * (Reference quirk: its single shared GRID_Counts buffer is incremented
    * once per VARIABLE per granule visit, so with k variables it holds k
    * times the coverage. The engine exposes the per-variable count — the
    * meaningful semantic; multiply by k for bit parity.)
    */
  def gridCounts(pixels: DataFrame, cfg: JobConfig, varName: String,
      cols: PixelCols = PixelCols()): DataFrame =
    withCell(pixels, cfg, cols)
      .groupBy(col("cell"), col(cols.granule))
      .agg(count(col(varName)).as("n"))
      .filter(col("n") > 0)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("GRID_Counts"))

  /** 1-D histogram with REFERENCE QUIRK PARITY (`aggregate_functions.py:
    * 259-260`): the reference accumulates a granule's pixels into a cell's
    * histogram ONLY when that granule contributed MORE THAN ONE pixel
    * (`all_val.size == 1` falls into a branch that adds nothing — counting
    * NaN pixels in the size check). The engine's default histograms count
    * every pixel (the sane semantic, SURVEY §7.4); this variant reproduces
    * the quirk for golden-matching against reference output.
    *
    * Plan shape: two-level — per (cell, granule) bin counts + pixel count,
    * drop single-pixel granule-cells, merge per cell. Both aggregations are
    * partial/final hash aggregates; the second input is granule-level
    * partials (tiny).
    */
  def histogramQuirk(
      pixels: DataFrame,
      cfg: JobConfig,
      varName: String,
      edges: Seq[Double],
      cols: PixelCols = PixelCols()): DataFrame = {
    // two-phase: per (cell, granule) the histogram buffer + the TOTAL pixel
    // count (including out-of-range and null — numpy's .size counts NaNs),
    // drop single-pixel granule-cells, explode bins, merge per cell.
    // Two hash-partition shuffles, no window sort; the second input is
    // granule-level partials (tiny).
    withCell(pixels, cfg, cols)
      .groupBy(col("cell"), col(cols.granule))
      .agg(
        count(lit(1)).as("granule_pix"),
        graft.agg.HistogramFunctions.histogram1d(col(varName), edges).as("h"))
      .filter(col("granule_pix") > 1)
      .select(col("cell"), posexplode(col("h")).as(Seq("bin", "n")))
      .filter(col("n") > 0)
      .groupBy(col("cell"), col("bin"))
      .agg(sum(col("n")).as("bin_count"))
  }

  /** Expand the flat cell id into grid indices and cell-center coordinates
    * for the L3 sink (reference reshape + meshgrid,
    * `aggregate_functions.py:532-536`, `:701-716`).
    */
  def withGridIndexes(agged: DataFrame, cfg: JobConfig): DataFrame = {
    val g = cfg.grid
    agged
      .withColumn("lat_idx", GridExprs.latIdx(col("cell"), g))
      .withColumn("lon_idx", GridExprs.lonIdx(col("cell"), g))
      .withColumn("lat_center", GridExprs.cellLat(col("cell"), g))
      .withColumn("lon_center", GridExprs.cellLon(col("cell"), g))
  }
}
