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

  private val IndexCols = Set("cell", "lat_idx", "lon_idx", "lat_center", "lon_center")

  /** Full L3 export as a REAL netCDF-3 classic file — the binary,
    * self-describing equivalent of the reference's HDF5 sink
    * (`aggregate_functions.py:724-757`), openable by any netCDF consumer.
    *
    * Layout mirrors the reference file exactly:
    *   - `lat_bnd`/`lon_bnd` axis variables (cell centers, `:727-733`),
    *     which are also the DIMENSION names of every gridded variable —
    *     netCDF's native form of the reference's `dims[i].label` calls;
    *   - one dense `[lat_bnd, lon_bnd]` variable per statistic, int-packed
    *     by [[packGrid]] with `_1km` stripped (`:745-748`), cloud-fraction
    *     scaling forced (`:741-744`);
    *   - 1-D/2-D histograms as `[lat_bnd, lon_bnd, <name>_bin(_x/_y)]`
    *     variables (the reference's `reshape([lat, lon, bins...])`,
    *     `:704-717`), zero-filled where no pixels fell;
    *   - per-variable `units`, `long_name`, `_FillValue`, `scale_factor`,
    *     `add_offset` attributes ([[cfAttrs]] = reference `:446-453`).
    *
    * Cells absent from the (possibly sparse) grid frame surface as
    * `_FillValue` for packed statistics and 0 for counts/histograms —
    * the reference's init values (`+inf -> fill` / zeros) after packing.
    *
    * The grid is collected to the driver: at most gridLat x gridLon cells
    * (64,800 at 1 degree) — the same driver-small bound the reference's
    * `h5py` writes rely on; the distributed output path is [[writeL3]].
    * netCDF-3 classic has no 64-bit integer type, so packed/count values
    * must fit Int32 (checked; the reference's own packing guarantees it
    * for every canonical variable).
    */
  def writeNetcdf(
      grid: DataFrame,
      cfg: JobConfig,
      path: String,
      packings: Map[String, Packing] = Map.empty,
      varAttrs: Map[String, PixelSource.VarAttrs] = Map.empty,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    import NetCDF3._
    val file = new java.io.File(path)
    if (file.exists()) {
      if (mode == SaveMode.ErrorIfExists)
        throw new IllegalStateException(
          s"output path $path already exists (reference output-exists guard)")
      if (mode == SaveMode.Ignore) return
    }
    val nLat = cfg.grid.gridLat
    val nLon = cfg.grid.gridLon
    val indexed = GridAggregation.withGridIndexes(grid, cfg)
    val packed = packGrid(indexed, packings)
    val rows = packed.collect()
    val schema = packed.schema
    val attrs = cfAttrs(indexed.columns.toSeq, packings, varAttrs)

    def attD(name: String, key: String, dflt: Double): Double =
      attrs.get(name).flatMap(_.get(key)).map(_.toDouble).getOrElse(dflt)
    def isCount(c: String) = c == "GRID_Counts" || c.contains("Pixel_Counts")
    def checkedInt(c: String, v: Long): Int = {
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"$c: packed value $v exceeds netCDF-3 classic Int32 range")
      v.toInt
    }
    def cellOf(r: org.apache.spark.sql.Row): Int = {
      val lat = r.getAs[Number]("lat_idx").intValue()
      val lon = r.getAs[Number]("lon_idx").intValue()
      require(lat >= 0 && lat < nLat && lon >= 0 && lon < nLon,
        s"grid index ($lat, $lon) outside ${nLat}x$nLon")
      lat * nLon + lon
    }
    // bin counts for histogram columns, from the job spec (output names
    // are _1km-stripped, so match on stripped var names too)
    def varFor(c: String): Option[graft.model.VarSpec] =
      cfg.vars.find(v => c.startsWith(outputName(v.name)))

    val dims = scala.collection.mutable.ArrayBuffer(
      Dim("lat_bnd", nLat), Dim("lon_bnd", nLon))
    def dimId(d: Dim): Int = {
      val i = dims.indexWhere(_.name == d.name)
      if (i >= 0) { require(dims(i).length == d.length,
        s"dim ${d.name} redefined with a different length"); i }
      else { dims += d; dims.length - 1 }
    }

    def commonAtts(c: String, fillAsInt: Boolean): Seq[Att] = {
      val m = attrs.getOrElse(c, Map.empty)
      Seq(
        m.get("units").map(u => Att("units", CharAtt(u))),
        m.get("long_name").filter(_.nonEmpty).map(l => Att("long_name", CharAtt(l))),
        m.get("_FillValue").map { f =>
          if (fillAsInt) Att("_FillValue", IntAtt(Seq(f.toDouble.toInt)))
          else Att("_FillValue", DoubleAtt(Seq(f.toDouble)))
        },
        m.get("scale_factor").map(s => Att("scale_factor", DoubleAtt(Seq(s.toDouble)))),
        m.get("add_offset").map(o => Att("add_offset", DoubleAtt(Seq(o.toDouble))))
      ).flatten
    }

    import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, FloatType, IntegerType, LongType}
    val dataVars: Seq[Var] = schema.fields.filterNot(f => IndexCols(f.name)).map { f =>
      val c = f.name
      f.dataType match {
        case LongType | IntegerType =>
          val init = if (isCount(c)) 0 else attD(c, "_FillValue", -9999.0).toInt
          val dense = Array.fill(nLat * nLon)(init)
          rows.foreach { r =>
            if (!r.isNullAt(r.fieldIndex(c)))
              dense(cellOf(r)) = checkedInt(c, r.getAs[Number](c).longValue())
          }
          Var(c, Seq(0, 1), NcInt, commonAtts(c, fillAsInt = true), dense)
        // DecimalType: user parquet (DuckDB/Hive writers) routinely types
        // arithmetic results DECIMAL; stats over them surface here too
        case DoubleType | FloatType | _: DecimalType =>
          val init = attD(c, "_FillValue", -9999.0)
          val dense = Array.fill(nLat * nLon)(init)
          rows.foreach { r =>
            if (!r.isNullAt(r.fieldIndex(c)))
              dense(cellOf(r)) = r.getAs[Number](c).doubleValue()
          }
          Var(c, Seq(0, 1), NcDouble, commonAtts(c, fillAsInt = false), dense)
        case ArrayType(ArrayType(LongType | IntegerType, _), _) =>
          val v = varFor(c)
          val bx = v.map(_.binEdges.size - 1)
          val by = v.flatMap(_.joint).map(_.jointEdges.size - 1)
          val sample = rows.iterator.map(r => r.fieldIndex(c) -> r)
            .collectFirst { case (i, r) if !r.isNullAt(i) =>
              r.getSeq[scala.collection.Seq[Long]](i) }
          val nx = bx.orElse(sample.map(_.size)).getOrElse(
            throw new IllegalArgumentException(s"$c: cannot infer bin count"))
          val ny = by.orElse(sample.map(_.head.size)).getOrElse(
            throw new IllegalArgumentException(s"$c: cannot infer joint bin count"))
          val dense = new Array[Int](nLat * nLon * nx * ny)
          rows.foreach { r =>
            val i = r.fieldIndex(c)
            if (!r.isNullAt(i)) {
              val base = cellOf(r) * nx * ny
              val m = r.getSeq[scala.collection.Seq[Long]](i)
              require(m.size == nx && m.forall(_.size == ny),
                s"$c: ragged 2-D histogram (${m.size} x ?) != $nx x $ny")
              var x = 0
              while (x < nx) {
                var y = 0
                while (y < ny) {
                  dense(base + x * ny + y) = checkedInt(c, m(x)(y)); y += 1
                }
                x += 1
              }
            }
          }
          val dx = dimId(Dim(s"${c}_bin_x", nx))
          val dy = dimId(Dim(s"${c}_bin_y", ny))
          Var(c, Seq(0, 1, dx, dy), NcInt, commonAtts(c, fillAsInt = true), dense)
        case ArrayType(LongType | IntegerType, _) =>
          val nb = varFor(c).map(_.binEdges.size - 1).orElse {
            rows.iterator.map(r => r.fieldIndex(c) -> r)
              .collectFirst { case (i, r) if !r.isNullAt(i) => r.getSeq[Long](i).size }
          }.getOrElse(
            throw new IllegalArgumentException(s"$c: cannot infer bin count"))
          val dense = new Array[Int](nLat * nLon * nb)
          rows.foreach { r =>
            val i = r.fieldIndex(c)
            if (!r.isNullAt(i)) {
              val base = cellOf(r) * nb
              val h = r.getSeq[Long](i)
              require(h.size == nb, s"$c: histogram length ${h.size} != $nb")
              var x = 0
              while (x < nb) { dense(base + x) = checkedInt(c, h(x)); x += 1 }
            }
          }
          val db = dimId(Dim(s"${c}_bin", nb))
          Var(c, Seq(0, 1, db), NcInt, commonAtts(c, fillAsInt = true), dense)
        case other =>
          throw new IllegalArgumentException(
            s"$c: unsupported grid column type $other for netCDF export")
      }
    }.toSeq

    val axisVars = Seq(
      Var("lat_bnd", Seq(0), NcDouble,
        Seq(Att("units", CharAtt("degrees")),
          Att("long_name", CharAtt("Latitude_boundaries"))),
        latBounds(cfg).toArray),
      Var("lon_bnd", Seq(1), NcDouble,
        Seq(Att("units", CharAtt("degrees")),
          Att("long_name", CharAtt("Longitude_boundaries"))),
        lonBounds(cfg).toArray))

    NetCDF3.write(NcFile(dims.toSeq, Seq.empty, axisVars ++ dataVars), path)
  }

  /** Full L3 export as a REAL `.h5` file — the reference's LITERAL output
    * container (`aggregate_functions.py:724` `h5py.File(output_dir+l3name,
    * 'w')`; per-dataset writes `addGridEntry` `:413-453`, sink loop
    * `:726-757`), produced by the pure-JVM [[HDF5]] codec.
    *
    * Dataset-for-dataset parity with the reference file:
    *   - `lat_bnd`/`lon_bnd`: float64 cell-center axes with
    *     `units=degrees`, `long_name=*_boundaries` (`:727-733`);
    *   - `GRID_Counts`: int64 `[lat, lon]` coverage counts (`:736`);
    *   - one dataset per statistic, `_1km` stripped (`:745-748`):
    *     counts/histograms int64 unscaled (`:424-427`); packed statistics
    *     int64 via [[packGrid]]; `Cloud_Fraction*` statistics FLOAT64 at
    *     the forced 1e-4 scaling WITHOUT the integer cast — the reference's
    *     CF branch (`:438-444`) assigns `tmp_data` before `astype`, so the
    *     file genuinely holds unrounded `value/1e-4` doubles;
    *   - 1-D/2-D histograms as native `[lat, lon, bins(, bins)]` int64
    *     datasets (the reference's `reshape`, `:704-717`);
    *   - per-dataset `units`/`long_name`/`_FillValue`/`scale_factor`/
    *     `add_offset` attributes ([[cfAttrs]] = `:446-453`) plus a
    *     `DIMENSION_LABELS` fixed-string attribute labelling the first two
    *     dims `lat_bnd`/`lon_bnd` — the file-format footprint of the
    *     reference's `dims[i].label` calls (`:447-448`).
    *
    * One reference quirk NOT reproduced: the sink loop writes
    * `GRID_Counts`' `units`/`long_name` onto `PC` — at that point still
    * the `lon_bnd` dataset (`:736-741`) — so the genuine reference file
    * mislabels `lon_bnd` and leaves `GRID_Counts` attribute-less. This
    * export follows the evident intent (attrs on `GRID_Counts`), matching
    * [[writeNetcdf]] and `cf_attrs.json`.
    *
    * Same driver-small bound as [[writeNetcdf]]: the grid is at most
    * gridLat x gridLon cells; the distributed output path is [[writeL3]].
    * Unlike netCDF-3 classic, HDF5 carries int64 natively, so no Int32
    * range check applies.
    */
  def writeH5(
      grid: DataFrame,
      cfg: JobConfig,
      path: String,
      packings: Map[String, Packing] = Map.empty,
      varAttrs: Map[String, PixelSource.VarAttrs] = Map.empty,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    import HDF5._
    val file = new java.io.File(path)
    if (file.exists()) {
      if (mode == SaveMode.ErrorIfExists)
        throw new IllegalStateException(
          s"output path $path already exists (reference output-exists guard)")
      if (mode == SaveMode.Ignore) return
    }
    val nLat = cfg.grid.gridLat
    val nLon = cfg.grid.gridLon
    val indexed = GridAggregation.withGridIndexes(grid, cfg)
    val packed = packGrid(indexed, packings)
    val packedRows = packed.collect()
    val attrs = cfAttrs(indexed.columns.toSeq, packings, varAttrs)

    def attD(name: String, key: String, dflt: Double): Double =
      attrs.get(name).flatMap(_.get(key)).map(_.toDouble).getOrElse(dflt)
    def isCount(c: String) = c == "GRID_Counts" || c.contains("Pixel_Counts")
    def cellOf(r: org.apache.spark.sql.Row): Int = {
      val lat = r.getAs[Number]("lat_idx").intValue()
      val lon = r.getAs[Number]("lon_idx").intValue()
      require(lat >= 0 && lat < nLat && lon >= 0 && lon < nLon,
        s"grid index ($lat, $lon) outside ${nLat}x$nLon")
      lat * nLon + lon
    }
    def varFor(c: String): Option[graft.model.VarSpec] =
      cfg.vars.find(v => c.startsWith(outputName(v.name)))
    // float64 CF datasets (the reference's un-cast branch); the packed
    // frame already holds them as longs, so re-derive from the RAW grid
    def isFloatCf(c: String) =
      c.startsWith("cloud_fraction") && !isCount(c) && c != "GRID_Counts"
    lazy val rawRows = indexed.collect()
    lazy val rawSchema = indexed.schema

    def labels(rank: Int): Att =
      Att("DIMENSION_LABELS",
        StrArrayAtt(Seq("lat_bnd", "lon_bnd").padTo(rank, "")))
    def commonAtts(c: String, rank: Int, fillAsLong: Boolean): Seq[Att] = {
      val m = attrs.getOrElse(c, Map.empty)
      Seq(
        Some(labels(rank)),
        m.get("units").map(u => Att("units", StrAtt(u))),
        m.get("long_name").filter(_.nonEmpty).map(l => Att("long_name", StrAtt(l))),
        m.get("_FillValue").map { f =>
          if (fillAsLong) Att("_FillValue", LongAtt(f.toDouble.toLong))
          else Att("_FillValue", DoubleAtt(f.toDouble))
        },
        m.get("scale_factor").map(s => Att("scale_factor", DoubleAtt(s.toDouble))),
        m.get("add_offset").map(o => Att("add_offset", DoubleAtt(o.toDouble)))
      ).flatten
    }

    import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, FloatType, IntegerType, LongType}
    val dataSets: Seq[Dataset] = packed.schema.fields
      .filterNot(f => IndexCols(f.name)).map { f =>
        val c = f.name
        if (isFloatCf(c)) {
          // reference CF branch: value/1e-4 + 0 as float64, NaN/NULL -> fill
          val p = packings.getOrElse(c,
            if (c.startsWith("cloud_fraction")) DefaultCloudFractionPacking
            else Packing(1.0, 0.0, -9999L))
          val fill = p.fill.toDouble
          val dense = Array.fill(nLat * nLon)(fill)
          val rawIdx = rawSchema.fieldIndex(c)
          rawRows.foreach { r =>
            if (!r.isNullAt(rawIdx)) {
              val v = r.getAs[Number](c).doubleValue()
              dense(cellOf(r)) =
                if (v.isNaN || v.isInfinite) fill else v / p.scale + p.offset
            }
          }
          Dataset(c, Seq(nLat, nLon), H5Float64,
            commonAtts(c, 2, fillAsLong = false), dense)
        } else f.dataType match {
          case LongType | IntegerType =>
            val init = if (isCount(c)) 0L else attD(c, "_FillValue", -9999.0).toLong
            val dense = Array.fill(nLat * nLon)(init)
            packedRows.foreach { r =>
              if (!r.isNullAt(r.fieldIndex(c)))
                dense(cellOf(r)) = r.getAs[Number](c).longValue()
            }
            Dataset(c, Seq(nLat, nLon), H5Int64,
              commonAtts(c, 2, fillAsLong = true), dense)
          // DecimalType: user parquet (DuckDB/Hive writers) routinely
          // types arithmetic results DECIMAL
          case DoubleType | FloatType | _: DecimalType =>
            val init = attD(c, "_FillValue", -9999.0)
            val dense = Array.fill(nLat * nLon)(init)
            packedRows.foreach { r =>
              if (!r.isNullAt(r.fieldIndex(c)))
                dense(cellOf(r)) = r.getAs[Number](c).doubleValue()
            }
            Dataset(c, Seq(nLat, nLon), H5Float64,
              commonAtts(c, 2, fillAsLong = false), dense)
          case ArrayType(ArrayType(LongType | IntegerType, _), _) =>
            val v = varFor(c)
            val bx = v.map(_.binEdges.size - 1)
            val by = v.flatMap(_.joint).map(_.jointEdges.size - 1)
            val sample = packedRows.iterator.map(r => r.fieldIndex(c) -> r)
              .collectFirst { case (i, r) if !r.isNullAt(i) =>
                r.getSeq[scala.collection.Seq[Long]](i) }
            val nx = bx.orElse(sample.map(_.size)).getOrElse(
              throw new IllegalArgumentException(s"$c: cannot infer bin count"))
            val ny = by.orElse(sample.map(_.head.size)).getOrElse(
              throw new IllegalArgumentException(s"$c: cannot infer joint bin count"))
            val dense = new Array[Long](nLat * nLon * nx * ny)
            packedRows.foreach { r =>
              val i = r.fieldIndex(c)
              if (!r.isNullAt(i)) {
                val base = cellOf(r) * nx * ny
                val m = r.getSeq[scala.collection.Seq[Long]](i)
                require(m.size == nx && m.forall(_.size == ny),
                  s"$c: ragged 2-D histogram (${m.size} x ?) != $nx x $ny")
                var x = 0
                while (x < nx) {
                  var y = 0
                  while (y < ny) { dense(base + x * ny + y) = m(x)(y); y += 1 }
                  x += 1
                }
              }
            }
            Dataset(c, Seq(nLat, nLon, nx, ny), H5Int64,
              commonAtts(c, 4, fillAsLong = true), dense)
          case ArrayType(LongType | IntegerType, _) =>
            val nb = varFor(c).map(_.binEdges.size - 1).orElse {
              packedRows.iterator.map(r => r.fieldIndex(c) -> r)
                .collectFirst { case (i, r) if !r.isNullAt(i) => r.getSeq[Long](i).size }
            }.getOrElse(
              throw new IllegalArgumentException(s"$c: cannot infer bin count"))
            val dense = new Array[Long](nLat * nLon * nb)
            packedRows.foreach { r =>
              val i = r.fieldIndex(c)
              if (!r.isNullAt(i)) {
                val base = cellOf(r) * nb
                val h = r.getSeq[Long](i)
                require(h.size == nb, s"$c: histogram length ${h.size} != $nb")
                var x = 0
                while (x < nb) { dense(base + x) = h(x); x += 1 }
              }
            }
            Dataset(c, Seq(nLat, nLon, nb), H5Int64,
              commonAtts(c, 3, fillAsLong = true), dense)
          case other =>
            throw new IllegalArgumentException(
              s"$c: unsupported grid column type $other for HDF5 export")
        }
      }.toSeq

    val axes = Seq(
      Dataset("lat_bnd", Seq(nLat), H5Float64,
        Seq(Att("units", StrAtt("degrees")),
          Att("long_name", StrAtt("Latitude_boundaries"))),
        latBounds(cfg).toArray),
      Dataset("lon_bnd", Seq(nLon), H5Float64,
        Seq(Att("units", StrAtt("degrees")),
          Att("long_name", StrAtt("Longitude_boundaries"))),
        lonBounds(cfg).toArray))

    HDF5.write(H5File(axes ++ dataSets), path)
  }
}
