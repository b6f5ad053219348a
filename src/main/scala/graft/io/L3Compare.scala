package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's golden-output COMPARISON workflow
  * (`examples/result_comparison/plot_comparison.ipynb`,
  * `plot_comparison_abs.ipynb` — SURVEY §5's de-facto acceptance test):
  * load two L3 grids (the engine's own `.h5` and the official NASA
  * product), decode each with the CF scale/offset/fill rules, optionally
  * flip the official grid's latitude axis (`np.flip(..., 0)`), and
  * compute absolute and relative difference maps plus their summary
  * statistics.
  *
  * Decode semantics: the notebook reads through netCDF4 with
  * auto-scaling ON (values arrive as `raw*scale + offset`) and then
  * applies `((x - offset) / scale - offset) * scale` — the first half
  * UNDOES the library's auto-scaling back to raw, the second half is the
  * HDF4 convention `(raw - offset) * scale` (the same double-transform
  * appears in `read_MODIS`, `aggregate_functions.py:137-138`). This
  * reader hands back RAW stored values ([[HDF5.read]] never
  * auto-scales), so the equivalent decode from raw is exactly
  * `(raw - offset) * scale` with fill mapped to NaN first — pinned
  * against the notebook's algebra in L3CompareSpec.
  *
  * Scale shape: L3 grids are driver-small BY DESIGN (<= 64,800 cells x a
  * few stats — SURVEY §4's dense-grid note), so the file decode is
  * driver-side and the frames are parallelized for everything after —
  * the same boundary [[L3Writer]] draws in the write direction.
  */
object L3Compare {

  /** Decoded (rows, cols, values-in-row-major) of one 2-D dataset:
    * fill -> NaN, then `(raw - add_offset) * scale_factor` (absent attrs
    * default to offset 0 / scale 1 — the committed golden CF grids carry
    * none and decode as identity). `flipLat` reverses the row axis (the
    * notebook's `np.flip(grid, 0)` for the official product's
    * north-first latitude order).
    */
  def decodedGrid(
      path: String,
      dataset: String,
      flipLat: Boolean = false): (Int, Int, Array[Double]) = {
    val f = HDF5.read(path)
    val d = f.datasets.find(_.name == dataset).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no dataset '$dataset' (has: ${f.datasets.map(_.name).sorted.mkString(", ")})"))
    require(d.dims.length == 2, s"$dataset: expected a 2-D grid, got ${d.dims}")
    val Seq(nLat, nLon) = d.dims
    def att(n: String): Option[Double] = d.atts.find(_.name == n).map(_.value).collect {
      case HDF5.DoubleAtt(v) => v
      case HDF5.LongAtt(v) => v.toDouble
    }
    val scale = att("scale_factor").getOrElse(1.0)
    val offset = att("add_offset").getOrElse(0.0)
    val fill = att("_FillValue")
    val raw: Array[Double] = d.data match {
      case a: Array[Double] => a
      case a: Array[Long] => a.map(_.toDouble)
      case other => throw new IllegalStateException(other.getClass.toString)
    }
    val decoded = raw.map { x =>
      if (fill.exists(f => f == x || (f.isNaN && x.isNaN))) Double.NaN
      else (x - offset) * scale
    }
    val out =
      if (!flipLat) decoded
      else Array.tabulate(nLat * nLon) { i =>
        decoded((nLat - 1 - i / nLon) * nLon + i % nLon)
      }
    (nLat, nLon, out)
  }

  /** One decoded grid as a `(lat_idx, lon_idx, value)` frame (value NULL
    * where the cell is fill), plus its (nLat, nLon) shape — exposed so
    * callers ([[diff]]) can shape-check without re-reading and
    * re-decoding the file.
    */
  def gridFrameWithShape(
      spark: SparkSession,
      path: String,
      dataset: String,
      flipLat: Boolean = false): (DataFrame, Int, Int) = {
    import spark.implicits._
    val (nLat, nLon, v) = decodedGrid(path, dataset, flipLat)
    val df = v.toSeq.zipWithIndex.map { case (x, i) =>
      (i / nLon, i % nLon, if (x.isNaN) None else Some(x))
    }.toDF("lat_idx", "lon_idx", "value")
    (df, nLat, nLon)
  }

  /** One decoded grid as a `(lat_idx, lon_idx, value)` frame (value NULL
    * where the cell is fill).
    */
  def gridFrame(
      spark: SparkSession,
      path: String,
      dataset: String,
      flipLat: Boolean = false): DataFrame =
    gridFrameWithShape(spark, path, dataset, flipLat)._1

  /** Difference map of two decoded grids (the notebook's third panel
    * row): per cell `a`, `b`, `abs_diff = a - b`, `rel_diff = (a-b)/a`
    * (NULL where either side is fill, and rel NULL where `a == 0`).
    * Shapes must match.
    */
  def diff(
      spark: SparkSession,
      pathA: String,
      datasetA: String,
      pathB: String,
      datasetB: String,
      flipLatB: Boolean = false): DataFrame = {
    val (a, aLat, aLon) = gridFrameWithShape(spark, pathA, datasetA)
    val (b, bLat, bLon) = gridFrameWithShape(spark, pathB, datasetB, flipLatB)
    require(aLat == bLat && aLon == bLon,
      s"grid shapes differ: ${aLat}x$aLon vs ${bLat}x$bLon")
    a.join(b.withColumnRenamed("value", "b_value"), Seq("lat_idx", "lon_idx"))
      .select(col("lat_idx"), col("lon_idx"),
        col("value").as("a"), col("b_value").as("b"),
        (col("value") - col("b_value")).as("abs_diff"),
        when(col("value") =!= 0.0,
          (col("value") - col("b_value")) / col("value")).as("rel_diff"))
  }

  /** Acceptance summary over a difference map (the
    * `plot_comparison_abs.ipynb` per-statistic reading): cell counts,
    * mean/max |abs| and |rel| over jointly-defined cells.
    */
  def diffSummary(d: DataFrame): DataFrame =
    d.agg(
      count(lit(1)).as("n_cells"),
      count(col("abs_diff")).as("n_joint"),
      avg(abs(col("abs_diff"))).as("mean_abs_diff"),
      max(abs(col("abs_diff"))).as("max_abs_diff"),
      avg(abs(col("rel_diff"))).as("mean_rel_diff"),
      max(abs(col("rel_diff"))).as("max_rel_diff"),
      sum(when(col("abs_diff") === 0.0, 1L).otherwise(0L)).as("n_exact_equal"))
}
