package graft.examples

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.ModisEngine
import graft.io.{ConfigScans, GranuleCatalog, L3Writer, PixelSource}
import graft.model._

/** End-to-end example of the reference workflow on synthetic data: config
  * CSV scans -> granule catalog (glob + pair) -> pixel frame -> daily L3
  * aggregation (stats + histogram + cloud fraction, day-definition
  * corrected) -> packed L3 parquet sink. Mirrors the reference's serial
  * driver (`examples/local_execution/MODIS_Aggregation_Local.py`) end to
  * end; the granule *contents* are synthesized because the reference repo
  * ships no HDF blobs (`.MISSING_LARGE_BLOBS`).
  *
  * Run: `sbt "runMain graft.examples.ModisDemo /tmp/modis_demo"`
  */
object ModisDemo {
  def main(args: Array[String]): Unit = {
    val work = Paths.get(args.headOption.getOrElse("/tmp/modis_demo"))
    val dataDir = Files.createDirectories(work.resolve("myd06"))
    val geoDir = Files.createDirectories(work.resolve("myd03"))
    val outPath = work.resolve("l3_out").toString

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("modis-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.GraftFunctions.registerAll(spark) // SQL surface: vec_dot/hist1d/hist2d

    // --- 1. config scans (S6): the reference's three CSVs ---------------
    val ((_, dataPrefix), (_, geoPrefix), _) = ConfigScans.parseDataPaths(Seq(
      "Data_input_path                File_prefix_name",
      s"$dataDir/                     MYD06_L2.A",
      s"$geoDir/                      MYD03.A",
      "Data_output_path               File_prefix_name",
      s"$outPath/                     MYD08_L3"))
    val vars = ConfigScans.parseJointSpecs(
      Seq("Variable_name Joint_Variable_name Variable_Index Joint_Intervals",
        "Cloud_Top_Pressure Temperature 1 180.0,240.0,310.0"),
      ConfigScans.parseVariables(Seq(
        "Variable_name                Intervals",
        "Cloud_Top_Pressure           200.0,500.0,800.0,1100.0",
        "Cloud_Top_Temperature        180.0,220.0,260.0,310.0",
        "cloud_fraction_CM            0.0,0.25,0.5,0.75,1.0")))
    val cfg = JobConfig(
      grid = GridSpec(Region(-90, 90, -180, 180), 10.0, 10.0),
      stats = StatSwitches.All,
      vars = vars)

    // --- 2. granule catalog (S1 + J1): fake granule files on disk -------
    val hours = Seq("0005", "0500", "1200", "1800", "2355")
    for (h <- hours) {
      Files.createFile(dataDir.resolve(s"MYD06_L2.A2008001.$h.061.x.hdf"))
      Files.createFile(geoDir.resolve(s"MYD03.A2008001.$h.061.x.hdf"))
    }
    Files.createFile(dataDir.resolve("MYD06_L2.A2008002.0100.061.x.hdf"))
    Files.createFile(geoDir.resolve("MYD03.A2008002.0100.061.x.hdf"))
    val catalog = GranuleCatalog.pairedCatalog(
      spark, dataDir.toString, dataPrefix, geoDir.toString, geoPrefix,
      LocalDate.of(2008, 1, 1), LocalDate.of(2008, 1, 1))
    println(s"[demo] catalog: ${catalog.count()} paired granules")
    catalog.show(truncate = false)

    // --- 3. pixel frame: synthetic granule scan (S2/S3 stand-in) --------
    // One real deployment converts HDF granules to parquet once; here we
    // synthesize a deterministic swath per catalog entry.
    val pixels = catalog
      .select($"granule_id", $"day_of_year", $"hour")
      .crossJoin(spark.range(0, 4000).toDF("pix"))
      .select(
        $"granule_id", $"day_of_year", $"hour",
        ($"pix" / 64).cast("int").as("row"),
        ($"pix" % 64).cast("int").as("col"),
        (pmod(hash($"granule_id", $"pix"), lit(17000)) / 100.0 - 85.0).as("lat"),
        (pmod(hash($"pix", $"granule_id"), lit(35000)) / 100.0 - 175.0).as("lon"),
        pmod(hash($"pix") + $"hour", lit(8)).cast("int").as("cm_byte"),
        // packed-int variables, HDF style: decoded below (fill -> NULL,
        // (raw - add_offset) * scale_factor), attrs carried as Metadata
        when(pmod(hash($"pix", lit(9)), lit(50)) === 0, lit(-32768.0))
          .otherwise(pmod(hash($"granule_id", $"pix", lit(1)), lit(9000)).cast("double"))
          .as("Cloud_Top_Pressure"),
        (pmod(hash($"granule_id", $"pix", lit(2)), lit(13000)) / 100.0 + 180.0)
          .as("Cloud_Top_Temperature"))
      .withColumn("cm_flag", graft.expr.GridExprs.cloudMaskFlag($"cm_byte"))
    val decoded = PixelSource.withDecodedVar(pixels, "Cloud_Top_Pressure",
      PixelSource.VarAttrs(units = "hPa", longName = "Cloud Top Pressure",
        fillValue = -32768.0, scaleFactor = 0.1, addOffset = -2000.0))

    // --- 4. aggregate + pack + sink (A1-A9, S4, S5) ---------------------
    val l3 = ModisEngine.dailyL3(decoded, cfg, dayWindow = Some((1, 2)))
    L3Writer.write(l3, cfg, outPath,
      packings = Map("Cloud_Top_Pressure_Mean" -> L3Writer.Packing(0.1, 0.0, -9999)))

    // binary sink: the reference-shaped netCDF-3 classic file
    L3Writer.writeNetcdf(l3, cfg, s"$outPath.nc",
      packings = Map("Cloud_Top_Pressure_Mean" -> L3Writer.Packing(0.1, 0.0, -9999)))
    val nc = graft.io.NetCDF3.read(s"$outPath.nc")
    println(s"[demo] netCDF L3: ${nc.vars.map(_.name).mkString(", ")}")

    // binary sink: the reference's LITERAL .h5 container
    L3Writer.writeH5(l3, cfg, s"$outPath.h5",
      packings = Map("Cloud_Top_Pressure_Mean" -> L3Writer.Packing(0.1, 0.0, -9999)))
    val h5 = graft.io.HDF5.read(s"$outPath.h5")
    println(s"[demo] HDF5 L3: ${h5.datasets.map(_.name).mkString(", ")}")

    // plot sink: the legacy CLI's displayOutput half — contourf-style
    // jet PNG of the cloud-fraction grid (cfa.py's savefig)
    graft.io.GridPlot.displayOutput(l3, cfg, "cloud_fraction_Mean",
      s"$outPath.png", cellPx = 8)
    println(s"[demo] PNG plot: $outPath.png " +
      s"(${new java.io.File(s"$outPath.png").length()} bytes)")

    val back = spark.read.parquet(outPath)
    println(s"[demo] L3 grid rows: ${back.count()} (grid ${cfg.grid.gridLat}x${cfg.grid.gridLon})")
    back.orderBy($"cell").show(5, truncate = false)
    // SQL-text access to the custom aggregates on the same pixel frame
    decoded.createOrReplaceTempView("pixels")
    val sqlHist = spark.sql(
      """SELECT hist1d(Cloud_Top_Pressure, array(0.0D, 300.0D, 700.0D, 1100.0D)) AS h
        |FROM pixels""".stripMargin).collect().head.getSeq[Long](0)
    println(s"[demo] SQL hist1d over all pixels: ${sqlHist.mkString("[", ",", "]")}")
    println("[demo] OK")
    spark.stop()
  }
}
