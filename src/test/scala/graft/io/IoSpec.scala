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
}
