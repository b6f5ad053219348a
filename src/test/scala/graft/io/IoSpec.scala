package graft.io

import java.nio.file.{Files, Path}
import java.time.LocalDate

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._

class IoSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- GranuleCatalog

  private def touch(dir: Path, names: String*): Unit =
    names.foreach(n => Files.createFile(dir.resolve(n)))

  test("hourPrefixes expands the range plus the 3h next-day spill") {
    val ps = GranuleCatalog.hourPrefixes(
      LocalDate.of(2008, 1, 1), LocalDate.of(2008, 1, 2))
    assert(ps.length == 48 + 3)
    assert(ps.take(24).forall(_._2 == 1))
    assert(ps.slice(24, 48).forall(_._2 == 2))
    assert(ps.takeRight(3) == Seq((2008, 3, "00"), (2008, 3, "01"), (2008, 3, "02")))
    // year rollover
    val ny = GranuleCatalog.hourPrefixes(
      LocalDate.of(2008, 12, 31), LocalDate.of(2008, 12, 31))
    assert(ny.takeRight(3).forall(p => p._1 == 2009 && p._2 == 1))
  }

  test("pairedCatalog pairs by acquisition key and flags unpaired files") {
    val dataDir = Files.createTempDirectory("myd06")
    val geoDir = Files.createTempDirectory("myd03")
    touch(dataDir,
      "MYD06_L2.A2008001.0005.061.x.hdf",
      "MYD06_L2.A2008001.0100.061.x.hdf",
      "MYD06_L2.A2008002.0200.061.x.hdf") // spill-hour granule of day 2
    touch(geoDir,
      "MYD03.A2008001.0005.061.x.hdf",
      "MYD03.A2008001.0100.061.x.hdf",
      "MYD03.A2008002.0200.061.x.hdf")
    val cat = GranuleCatalog.pairedCatalog(
      spark,
      dataDir.toString, "MYD06_L2.A", geoDir.toString, "MYD03.A",
      LocalDate.of(2008, 1, 1), LocalDate.of(2008, 1, 1))
      .orderBy($"granule_id").collect()
    assert(cat.length == 3)
    assert(cat.map(_.getString(0)).toSeq ==
      Seq("A2008001.0005", "A2008001.0100", "A2008002.0200"))
    assert(cat.map(_.getInt(1)).toSeq == Seq(1, 1, 2))
    assert(cat.map(_.getInt(2)).toSeq == Seq(0, 1, 2))

    // unpaired geolocation file -> strict mode aborts like the reference
    touch(dataDir, "MYD06_L2.A2008001.0500.061.x.hdf")
    intercept[IllegalArgumentException] {
      GranuleCatalog.pairedCatalog(
        spark, dataDir.toString, "MYD06_L2.A", geoDir.toString, "MYD03.A",
        LocalDate.of(2008, 1, 1), LocalDate.of(2008, 1, 1))
    }
  }

  // ---------------------------------------------------------- ConfigScans

  test("parseDataPaths reads the two-section whitespace csv") {
    val lines = Seq(
      "Data_input_path                File_prefix_name",
      "/data/myd06/                   MYD06_L2.A",
      "/data/myd03/                   MYD03.A",
      "Data_output_path               File_prefix_name",
      "/out/                          MYD08_L3")
    val ((d, dp), (g, gp), (o, op)) = ConfigScans.parseDataPaths(lines)
    assert((d, dp) == ("/data/myd06/", "MYD06_L2.A"))
    assert((g, gp) == ("/data/myd03/", "MYD03.A"))
    assert((o, op) == ("/out/", "MYD08_L3"))
  }

  test("parseVariables + parseJointSpecs resolve names, edges and joint index") {
    val vars = ConfigScans.parseVariables(Seq(
      "Variable_name                Intervals",
      "Cloud_Top_Pressure           50.0,150.0,1050.0",
      "cloud_fraction_CM            0.0,0.5,1.0"))
    assert(vars.map(_.name) == Seq("Cloud_Top_Pressure", "cloud_fraction_CM"))
    assert(vars.head.binEdges == Seq(50.0, 150.0, 1050.0))

    val joined = ConfigScans.parseJointSpecs(Seq(
      "Variable_name      Joint_Variable_name  Variable_Index  Joint_Intervals",
      "Cloud_Top_Pressure cloud_fraction       1               0.25,0.75,0.975"),
      vars)
    val j = joined.head.joint.get
    assert(j.jointVar == "cloud_fraction_CM") // index 1 resolved to name
    assert(j.jointEdges == Seq(0.25, 0.75, 0.975))
    assert(joined(1).joint.isEmpty)
  }

  // ------------------------------------------------------------- L3Writer

  test("pack applies scale/offset and maps non-finite to fill") {
    val p = L3Writer.Packing(0.01, 100.0, -9999L)
    val out = Seq[java.lang.Double](2.5, Double.NaN, null, Double.PositiveInfinity)
      .toDF("v").select(L3Writer.pack($"v", p).as("p")).as[Long].collect()
    assert(out.toSeq == Seq(350L, -9999L, -9999L, -9999L)) // 2.5/0.01+100
  }

  test("packGrid forces cloud-fraction packing and strips _1km") {
    val grid = Seq((1L, 0.5, 3.0, 7L)).toDF(
      "cell", "cloud_fraction_Mean", "Cloud_Top_Pressure_1km_Mean", "GRID_Counts")
    val out = L3Writer.packGrid(grid,
      Map("Cloud_Top_Pressure_1km_Mean" -> L3Writer.Packing(0.1, 0.0, -1)))
    assert(out.columns.toSeq ==
      Seq("cell", "cloud_fraction_Mean", "Cloud_Top_Pressure_Mean", "GRID_Counts"))
    val r = out.collect().head
    assert(r.getLong(1) == 5000L) // 0.5 / 1e-4
    assert(r.getLong(2) == 30L) //   3.0 / 0.1
    assert(r.getLong(3) == 7L) //    counts pass through
  }

  test("write refuses to overwrite an existing path (output-exists guard)") {
    val cfg = JobConfig(grid = GridSpec(Region(0, 10, 0, 10), 5.0, 5.0))
    val grid = Seq((0L, 1.0)).toDF("cell", "v_Mean")
    val out = Files.createTempDirectory("l3").resolve("out").toString
    L3Writer.write(grid, cfg, out)
    val files = spark.read.parquet(out)
    assert(files.columns.contains("lat_idx") && files.count() == 1)
    intercept[Exception] { L3Writer.write(grid, cfg, out) }
    L3Writer.write(grid, cfg, out, mode = SaveMode.Overwrite) // explicit opt-in
  }

  test("decodePacked applies fill->NULL then (raw-offset)*scale, attrs round-trip") {
    val attrs = PixelSource.VarAttrs(
      units = "hPa", longName = "Cloud Top Pressure",
      fillValue = -32768, scaleFactor = 0.1, addOffset = -15000.0)
    val df = PixelSource.withDecodedVar(
      Seq(-32768.0, 0.0, 5000.0).toDF("ctp"), "ctp", attrs)
    val out = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(1500.0), Some(2000.0)))
    // metadata survives and parses back
    assert(PixelSource.readAttrs(df, "ctp").contains(attrs))
  }

  test("axis bounds are cell centers") {
    val cfg = JobConfig(grid = GridSpec(Region(-90, 90, -180, 180), 1.0, 1.0))
    val lats = L3Writer.latBounds(cfg)
    assert(lats.length == 180 && lats.head == -89.5 && lats.last == 89.5)
    val lons = L3Writer.lonBounds(cfg)
    assert(lons.length == 360 && lons.head == -179.5 && lons.last == 179.5)
  }

  test("writeL3 exports grid + axis frames + CF attrs in the reference shape") {
    val cfg = JobConfig(grid = GridSpec(Region(-90, 90, -180, 180), 30.0, 30.0))
    val grid = Seq(
      (0L, 812.5, 10L, 0.25),
      (13L, 401.0, 4L, 0.5))
      .toDF("cell", "Cloud_Top_Pressure_1km_Mean",
        "Cloud_Top_Pressure_1km_Pixel_Counts", "cloud_fraction_Mean")
    val ctpAttrs = PixelSource.VarAttrs(
      units = "hPa", longName = "Cloud Top Pressure",
      fillValue = -32768, scaleFactor = 0.1, addOffset = -15000.0)
    val out = Files.createTempDirectory("l3x").resolve("out").toString
    L3Writer.writeL3(grid, cfg,
      out, packings = Map("Cloud_Top_Pressure_1km_Mean" -> L3Writer.Packing(0.1, -15000.0, -32768L)),
      varAttrs = Map("Cloud_Top_Pressure_1km" -> ctpAttrs))

    // axis frames equal the reference meshgrid (aggregate_functions.py:532-536)
    val lats = spark.read.parquet(s"$out/lat_bnd").orderBy($"lat_idx")
      .select($"lat_bnd").as[Double].collect().toSeq
    assert(lats == (0 until 6).map(i => -90.0 + 15.0 + i * 30.0))
    val lons = spark.read.parquet(s"$out/lon_bnd").orderBy($"lon_idx")
      .select($"lon_bnd").as[Double].collect().toSeq
    assert(lons == (0 until 12).map(i => -180.0 + 15.0 + i * 30.0))

    // grid is packed and renamed; indexes present for the dense pivot
    val g = spark.read.parquet(s"$out/grid")
    assert(g.columns.contains("Cloud_Top_Pressure_Mean") &&
      g.columns.contains("lat_idx") && g.columns.contains("lon_idx"))
    val packedMean = g.orderBy($"cell").select($"Cloud_Top_Pressure_Mean")
      .as[Long].collect()
    assert(packedMean.head == math.round(812.5 / 0.1 + -15000.0))

    // CF attrs: forced cloud-fraction packing, counts integer, var attrs
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "cf_attrs.json")))
    assert(json.contains("\"cloud_fraction_Mean\"") && json.contains("1.0E-4"))
    assert(json.contains("\"Cloud_Top_Pressure_Mean\"") && json.contains("hPa"))
    assert(json.contains("\"Cloud_Top_Pressure_Pixel_Counts\""))
    assert(json.contains("\"scale_factor\": \"1.0\"")) // counts stay integer
    assert(json.contains("\"lat_bnd\"") && json.contains("Latitude_boundaries"))
    assert(json.contains("\"dims\": \"lat_bnd,lon_bnd\""))

    // output-exists guard applies to the whole container
    intercept[Exception] { L3Writer.writeL3(grid, cfg, out) }
  }

  test("writeNetcdf emits the reference-shaped binary L3 file (netCDF-3 classic)") {
    import graft.io.NetCDF3._
    // 6 x 12 grid (30-degree cells) with a scalar stat, counts, a 3-bin
    // histogram and a 2x3 joint histogram; cells 0=(0,0) and 13=(1,1)
    val cfg = JobConfig(
      grid = GridSpec(Region(-90, 90, -180, 180), 30.0, 30.0),
      vars = Seq(VarSpec("Cloud_Top_Pressure_1km",
        binEdges = Seq(0.0, 300.0, 700.0, 1100.0),
        joint = Some(JointSpec("Cloud_Top_Temperature_1km", Seq(180.0, 240.0, 280.0, 310.0))))))
    val grid = Seq(
      (0L, 812.5, 10L, 0.25, Seq(1L, 2L, 7L),
        Seq(Seq(1L, 0L, 2L), Seq(0L, 3L, 4L), Seq(5L, 0L, 0L))),
      (13L, 401.0, 4L, 0.5, Seq(0L, 4L, 0L),
        Seq(Seq(0L, 1L, 0L), Seq(2L, 0L, 1L), Seq(0L, 0L, 6L))))
      .toDF("cell", "Cloud_Top_Pressure_1km_Mean",
        "Cloud_Top_Pressure_1km_Pixel_Counts", "cloud_fraction_Mean",
        "Cloud_Top_Pressure_1km_Histogram_Counts",
        "Cloud_Top_Pressure_1km_Jhisto_vs_Cloud_Top_Temperature_1km")
    val ctpAttrs = PixelSource.VarAttrs(
      units = "hPa", longName = "Cloud Top Pressure",
      fillValue = -32768, scaleFactor = 0.1, addOffset = -15000.0)
    val out = Files.createTempDirectory("nc").resolve("l3.nc").toString
    L3Writer.writeNetcdf(grid, cfg, out,
      packings = Map("Cloud_Top_Pressure_1km_Mean" ->
        L3Writer.Packing(0.1, -15000.0, -32768L)),
      varAttrs = Map("Cloud_Top_Pressure_1km" -> ctpAttrs))

    val nc = NetCDF3.read(out)
    // dims: the two axes plus the histogram bin dims, _1km stripped
    assert(nc.dims.take(2) == Seq(Dim("lat_bnd", 6), Dim("lon_bnd", 12)))
    assert(nc.dims.contains(Dim("Cloud_Top_Pressure_Histogram_Counts_bin", 3)))
    assert(nc.dims.contains(
      Dim("Cloud_Top_Pressure_Jhisto_vs_Cloud_Top_Temperature_bin_x", 3)))
    assert(nc.dims.contains(
      Dim("Cloud_Top_Pressure_Jhisto_vs_Cloud_Top_Temperature_bin_y", 3)))

    def v(name: String): Var = nc.vars.find(_.name == name).getOrElse(
      fail(s"variable $name missing: ${nc.vars.map(_.name)}"))

    // axis variables are the cell centers with the reference attrs
    assert(v("lat_bnd").data.asInstanceOf[Array[Double]].toSeq ==
      (0 until 6).map(i => -90.0 + 15.0 + i * 30.0))
    assert(v("lon_bnd").data.asInstanceOf[Array[Double]].toSeq ==
      (0 until 12).map(i => -180.0 + 15.0 + i * 30.0))
    assert(v("lat_bnd").atts.contains(Att("long_name", CharAtt("Latitude_boundaries"))))

    // packed mean: cell 0 -> dense [0], cell 13 -> dense [1*12 + 1];
    // everything else the fill value
    val mean = v("Cloud_Top_Pressure_Mean")
    assert(mean.dimIds == Seq(0, 1) && mean.ncType == NcInt)
    val md = mean.data.asInstanceOf[Array[Int]]
    assert(md(0) == math.round(812.5 / 0.1 + -15000.0).toInt)
    assert(md(13) == math.round(401.0 / 0.1 + -15000.0).toInt)
    assert(md(1) == -32768 && md.count(_ != -32768) == 2)
    assert(mean.atts.contains(Att("_FillValue", IntAtt(Seq(-32768)))))
    assert(mean.atts.contains(Att("scale_factor", DoubleAtt(Seq(0.1)))))
    assert(mean.atts.contains(Att("units", CharAtt("hPa"))))

    // counts: absent cells are 0, not fill
    val cnt = v("Cloud_Top_Pressure_Pixel_Counts").data.asInstanceOf[Array[Int]]
    assert(cnt(0) == 10 && cnt(13) == 4 && cnt.sum == 14)

    // forced cloud-fraction packing (reference :741-744)
    val cf = v("cloud_fraction_Mean")
    assert(cf.data.asInstanceOf[Array[Int]](0) == 2500)
    assert(cf.atts.contains(Att("scale_factor", DoubleAtt(Seq(1e-4)))))
    assert(cf.atts.contains(Att("_FillValue", IntAtt(Seq(-9999)))))

    // histogram: [lat, lon, bin] dense layout, zero elsewhere
    val h = v("Cloud_Top_Pressure_Histogram_Counts")
    assert(h.dimIds.length == 3)
    val hd = h.data.asInstanceOf[Array[Int]]
    assert(hd.slice(0, 3).toSeq == Seq(1, 2, 7))
    assert(hd.slice(13 * 3, 13 * 3 + 3).toSeq == Seq(0, 4, 0))
    assert(hd.sum == 1 + 2 + 7 + 4)

    // joint histogram: [lat, lon, bin_x, bin_y], row-major x then y
    val j = v("Cloud_Top_Pressure_Jhisto_vs_Cloud_Top_Temperature")
    assert(j.dimIds.length == 4)
    val jd = j.data.asInstanceOf[Array[Int]]
    assert(jd.slice(0, 9).toSeq == Seq(1, 0, 2, 0, 3, 4, 5, 0, 0))
    assert(jd.slice(13 * 9, 13 * 9 + 9).toSeq == Seq(0, 1, 0, 2, 0, 1, 0, 0, 6))
    assert(jd.sum == (1 + 2 + 3 + 4 + 5) + (1 + 2 + 1 + 6))

    // the file really is netCDF-3 classic: magic bytes + re-write identity
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(out))
    assert(bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F' && bytes(3) == 1)
    assert(NetCDF3.toBytes(nc).toSeq == bytes.toSeq)

    // output-exists guard
    intercept[Exception] { L3Writer.writeNetcdf(grid, cfg, out) }
  }

  test("writeH5 emits the reference's literal .h5 container (HDF5 classic)") {
    import graft.io.HDF5._
    // same fixture as the netCDF test: 6 x 12 grid, scalar stat, counts,
    // 3-bin histogram, 3x3 joint histogram, cells 0 and 13 populated
    val cfg = JobConfig(
      grid = GridSpec(Region(-90, 90, -180, 180), 30.0, 30.0),
      vars = Seq(VarSpec("Cloud_Top_Pressure_1km",
        binEdges = Seq(0.0, 300.0, 700.0, 1100.0),
        joint = Some(JointSpec("Cloud_Top_Temperature_1km", Seq(180.0, 240.0, 280.0, 310.0))))))
    val grid = Seq(
      (0L, 812.5, 10L, 0.25, Seq(1L, 2L, 7L),
        Seq(Seq(1L, 0L, 2L), Seq(0L, 3L, 4L), Seq(5L, 0L, 0L))),
      (13L, 401.0, 4L, 0.5, Seq(0L, 4L, 0L),
        Seq(Seq(0L, 1L, 0L), Seq(2L, 0L, 1L), Seq(0L, 0L, 6L))))
      .toDF("cell", "Cloud_Top_Pressure_1km_Mean",
        "Cloud_Top_Pressure_1km_Pixel_Counts", "cloud_fraction_Mean",
        "Cloud_Top_Pressure_1km_Histogram_Counts",
        "Cloud_Top_Pressure_1km_Jhisto_vs_Cloud_Top_Temperature_1km")
    val ctpAttrs = PixelSource.VarAttrs(
      units = "hPa", longName = "Cloud Top Pressure",
      fillValue = -32768, scaleFactor = 0.1, addOffset = -15000.0)
    val out = Files.createTempDirectory("h5").resolve("l3.h5").toString
    L3Writer.writeH5(grid, cfg, out,
      packings = Map("Cloud_Top_Pressure_1km_Mean" ->
        L3Writer.Packing(0.1, -15000.0, -32768L)),
      varAttrs = Map("Cloud_Top_Pressure_1km" -> ctpAttrs))

    val h5 = HDF5.read(out)
    def d(name: String): Dataset = h5.datasets.find(_.name == name).getOrElse(
      fail(s"dataset $name missing: ${h5.datasets.map(_.name)}"))

    // axis datasets: float64 cell centers with the reference attrs
    assert(d("lat_bnd").dtype == H5Float64)
    assert(d("lat_bnd").data.asInstanceOf[Array[Double]].toSeq ==
      (0 until 6).map(i => -90.0 + 15.0 + i * 30.0))
    assert(d("lon_bnd").data.asInstanceOf[Array[Double]].toSeq ==
      (0 until 12).map(i => -180.0 + 15.0 + i * 30.0))
    assert(d("lat_bnd").atts.contains(Att("long_name", StrAtt("Latitude_boundaries"))))

    // packed mean: int64 dense [lat, lon] with _1km stripped
    val mean = d("Cloud_Top_Pressure_Mean")
    assert(mean.dims == Seq(6, 12) && mean.dtype == H5Int64)
    val md = mean.data.asInstanceOf[Array[Long]]
    assert(md(0) == math.round(812.5 / 0.1 + -15000.0))
    assert(md(13) == math.round(401.0 / 0.1 + -15000.0))
    assert(md(1) == -32768L && md.count(_ != -32768L) == 2)
    assert(mean.atts.contains(Att("_FillValue", LongAtt(-32768L))))
    assert(mean.atts.contains(Att("scale_factor", DoubleAtt(0.1))))
    assert(mean.atts.contains(Att("units", StrAtt("hPa"))))
    assert(mean.atts.contains(Att("DIMENSION_LABELS",
      StrArrayAtt(Seq("lat_bnd", "lon_bnd")))),
      "dims[i].label footprint (reference :447-448)")

    // counts: int64, absent cells 0
    val cnt = d("Cloud_Top_Pressure_Pixel_Counts").data.asInstanceOf[Array[Long]]
    assert(cnt(0) == 10L && cnt(13) == 4L && cnt.sum == 14L)

    // Cloud_Fraction: FLOAT64 at forced 1e-4 scaling, UNROUNDED — the
    // reference's CF branch skips the astype(int) (:438-444)
    val cf = d("cloud_fraction_Mean")
    assert(cf.dtype == H5Float64, "reference CF datasets are float64")
    val cfd = cf.data.asInstanceOf[Array[Double]]
    assert(cfd(0) == 0.25 / 1e-4 && cfd(13) == 0.5 / 1e-4)
    assert(cfd(1) == -9999.0 && cfd.count(_ != -9999.0) == 2)
    assert(cf.atts.contains(Att("scale_factor", DoubleAtt(1e-4))))
    assert(cf.atts.contains(Att("_FillValue", DoubleAtt(-9999.0))))

    // histograms: native N-D int64 datasets (the reference's reshape)
    val h = d("Cloud_Top_Pressure_Histogram_Counts")
    assert(h.dims == Seq(6, 12, 3) && h.dtype == H5Int64)
    val hd = h.data.asInstanceOf[Array[Long]]
    assert(hd.slice(0, 3).toSeq == Seq(1L, 2L, 7L))
    assert(hd.slice(13 * 3, 13 * 3 + 3).toSeq == Seq(0L, 4L, 0L))
    assert(hd.sum == 14L)

    val j = d("Cloud_Top_Pressure_Jhisto_vs_Cloud_Top_Temperature")
    assert(j.dims == Seq(6, 12, 3, 3))
    val jd = j.data.asInstanceOf[Array[Long]]
    assert(jd.slice(0, 9).toSeq == Seq(1L, 0L, 2L, 0L, 3L, 4L, 5L, 0L, 0L))
    assert(jd.slice(13 * 9, 13 * 9 + 9).toSeq == Seq(0L, 1L, 0L, 2L, 0L, 1L, 0L, 0L, 6L))

    // grid content matches the writeL3 parquet path through the container:
    // every packed non-CF cell value equals the parquet grid's value
    val pq = Files.createTempDirectory("h5pq").resolve("l3").toString
    L3Writer.writeL3(grid, cfg, pq,
      packings = Map("Cloud_Top_Pressure_1km_Mean" ->
        L3Writer.Packing(0.1, -15000.0, -32768L)),
      varAttrs = Map("Cloud_Top_Pressure_1km" -> ctpAttrs))
    val gridPq = spark.read.parquet(s"$pq/grid")
      .select("lat_idx", "lon_idx", "Cloud_Top_Pressure_Mean")
      .collect()
    gridPq.foreach { r =>
      val cell = r.getAs[Number]("lat_idx").intValue() * 12 +
        r.getAs[Number]("lon_idx").intValue()
      assert(md(cell) == r.getAs[Long]("Cloud_Top_Pressure_Mean"))
    }

    // the file really is HDF5: signature + re-write identity
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(out))
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'H' && bytes(2) == 'D' && bytes(3) == 'F')
    assert(HDF5.toBytes(h5).toSeq == bytes.toSeq)

    // output-exists guard
    intercept[Exception] { L3Writer.writeH5(grid, cfg, out) }
  }
}
