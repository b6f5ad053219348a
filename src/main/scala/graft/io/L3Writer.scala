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

  /** CF attribute set for every output dataset, mirroring the reference's
    * HDF5 attrs (`addGridEntry`, `aggregate_functions.py:446-453`, and the
    * axis/GRID_Counts datasets `:727-741`):
    *
    *   - axis datasets: `units=degrees`, `long_name=*_boundaries`;
    *   - `GRID_Counts`: `units=none`, `long_name=grid_point_counts`;
    *   - counts/histograms: integer, `scale_factor=1, add_offset=0`
    *     (`:424-427`);
    *   - `cloud_fraction*`: forced `scale=1e-4, offset=0, fill=-9999`
    *     (`:438-444`);
    *   - packed statistics: the packing's scale/offset/fill plus the
    *     variable's units/long_name from `varAttrs`;
    *   - every gridded dataset's dims are labelled lat_bnd/lon_bnd
    *     (`:447-448`).
    */
  def cfAttrs(
      outCols: Seq[String],
      packings: Map[String, Packing],
      varAttrs: Map[String, PixelSource.VarAttrs]): Map[String, Map[String, String]] = {
    val axis = Map(
      "lat_bnd" -> Map("units" -> "degrees", "long_name" -> "Latitude_boundaries"),
      "lon_bnd" -> Map("units" -> "degrees", "long_name" -> "Longitude_boundaries"))
    val data = outCols.filterNot(Set("cell", "lat_idx", "lon_idx", "lat_center", "lon_center"))
      .map { c =>
        val base = Map("dims" -> "lat_bnd,lon_bnd")
        val a = varAttrs.collectFirst { case (v, at) if c.startsWith(v) => at }
        val body =
          if (c == "GRID_Counts")
            Map("units" -> "none", "long_name" -> "grid_point_counts")
          else if (c.contains("Pixel_Counts") || c.contains("Histogram_Counts") ||
            c.contains("Jhisto_vs_"))
            Map("units" -> a.fold("none")(_.units), "long_name" -> a.fold("")(_.longName),
              "scale_factor" -> "1.0", "add_offset" -> "0.0",
              "_FillValue" -> a.fold("-9999.0")(_.fillValue.toString))
          else {
            val p = packings.get(c).orElse {
              if (c.startsWith("cloud_fraction")) Some(DefaultCloudFractionPacking) else None
            }
            Map("units" -> a.fold("none")(_.units), "long_name" -> a.fold("")(_.longName),
              "scale_factor" -> p.fold(a.fold(1.0)(_.scaleFactor))(_.scale).toString,
              "add_offset" -> p.fold(a.fold(0.0)(_.addOffset))(_.offset).toString,
              "_FillValue" -> p.fold(a.fold(-9999.0)(_.fillValue))(_.fill.toDouble).toString)
          }
        outputName(c) -> (base ++ body)
      }.toMap
    axis ++ data
  }

  /** Full L3 export in the reference's HDF5 SHAPE (no HDF5 library exists
    * in this environment, so the container is a directory):
    *
    *   `path/grid/`     packed grid parquet (one row per cell)
    *   `path/lat_bnd/`  latitude axis parquet (lat_idx, lat_bnd)
    *   `path/lon_bnd/`  longitude axis parquet (lon_idx, lon_bnd)
    *   `path/cf_attrs.json`  per-dataset CF attributes ([[cfAttrs]])
    *
    * A consumer (or a thin h5py script outside this sandbox) can assemble
    * the exact reference file from these four pieces; every value, name,
    * packing rule and attribute matches `aggregate_functions.py:413-453`,
    * `:724-757`.
    */
  def writeL3(
      grid: DataFrame,
      cfg: JobConfig,
      path: String,
      packings: Map[String, Packing] = Map.empty,
      varAttrs: Map[String, PixelSource.VarAttrs] = Map.empty,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    if (mode == SaveMode.ErrorIfExists && new java.io.File(path).exists())
      throw new IllegalStateException(
        s"output path $path already exists (reference output-exists guard)")
    val spark = grid.sparkSession
    import spark.implicits._
    val indexed = GridAggregation.withGridIndexes(grid, cfg)
    val packed = packGrid(indexed, packings)
    packed.coalesce(1).write.mode(mode).parquet(s"$path/grid")
    latBounds(cfg).zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("lat_idx", "lat_bnd")
      .coalesce(1).write.mode(mode).parquet(s"$path/lat_bnd")
    lonBounds(cfg).zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("lon_idx", "lon_bnd")
      .coalesce(1).write.mode(mode).parquet(s"$path/lon_bnd")
    // attrs are derived from PRE-packing names (packings/varAttrs keys);
    // cfAttrs emits them under the output (_1km-stripped) dataset names
    val attrs = cfAttrs(indexed.columns.toSeq, packings, varAttrs)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json = attrs.toSeq.sortBy(_._1).map { case (ds, kv) =>
      q(ds) + ": " + kv.toSeq.sortBy(_._1)
        .map { case (k, v) => q(k) + ": " + q(v) }.mkString("{", ", ", "}")
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "cf_attrs.json"), json)
  }
}
