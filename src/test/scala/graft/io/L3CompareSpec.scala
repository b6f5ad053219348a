package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's §5 comparison workflow ([[L3Compare]]) driven over
  * the two COMMITTED golden artifacts — the same pair of files the
  * reference's `plot_comparison.ipynb` class of notebooks loads — plus
  * a decode pin against our own writer's scale/offset packing.
  */
class L3CompareSpec extends SparkSpec {

  private val dir = "/root/reference/resources/data/sample_output_data"
  private val h5 = s"$dir/output_final.hdf5"
  private val nc = s"$dir/MYD08_D3.A2008001CloudFraction.nc"

  test("decodedGrid: golden CF grids decode as identity (no CF attrs)") {
    val (nLat, nLon, a) = L3Compare.decodedGrid(h5, "CF")
    assert(nLat == 180 && nLon == 360)
    assert(a.count(!_.isNaN) == 1776)

    val (bLat, bLon, b) = L3Compare.decodedGrid(nc, "__xarray_dataarray_variable__")
    assert(bLat == 180 && bLon == 360)
    // the .nc carries _FillValue = NaN; every stored value is real
    assert(b.forall(x => !x.isNaN && x >= 0.0 && x <= 1.0))
  }

  test("flipLat reverses the latitude axis (the notebook's np.flip(grid, 0))") {
    val (nLat, nLon, plain) = L3Compare.decodedGrid(nc, "__xarray_dataarray_variable__")
    val (_, _, flipped) = L3Compare.decodedGrid(nc, "__xarray_dataarray_variable__",
      flipLat = true)
    for (i <- 0 until nLat; j <- Seq(0, nLon / 2, nLon - 1))
      assert(flipped(i * nLon + j) == plain((nLat - 1 - i) * nLon + j))
  }

  test("diff of the two goldens: 64800 cells, 1776 jointly defined, sane summary") {
    val d = L3Compare.diff(spark, h5, "CF", nc, "__xarray_dataarray_variable__")
    val s = L3Compare.diffSummary(d).head()
    assert(s.getLong(0) == 64800)
    // h5 defines 1776 cells; the nc defines all -> joint = 1776
    assert(s.getLong(1) == 1776)
    // cloud fractions live in [0,1]: |a-b| <= 1 everywhere
    assert(s.getDouble(3) <= 1.0 + 1e-12)
    assert(s.getDouble(2) >= 0.0)
    // the grids are different runs but not unrelated: some cells agree
    assert(s.getLong(6) > 0, "expected some exactly-equal cells")
    // per-cell algebra: abs_diff really is a - b on a defined cell
    val row = d.filter(col("abs_diff").isNotNull).orderBy("lat_idx", "lon_idx").head()
    assert(row.getDouble(4) == row.getDouble(2) - row.getDouble(3))
  }

  test("decode inverts our own writer's scale/offset packing (HDF4 convention)") {
    val out = java.nio.file.Files.createTempDirectory("l3cmp").resolve("t.h5").toString
    // pack the way addGridEntry does: raw = data/scale + offset, NaN -> fill
    val scale = 1e-4
    val offset = 0.0
    val fill = -9999.0
    val data = Array(0.25, 0.5, Double.NaN, 1.0)
    val raw = data.map(x => if (x.isNaN) fill else x / scale + offset)
    HDF5.write(HDF5.H5File(Seq(HDF5.Dataset(
      "cloud_fraction_Mean", Seq(2, 2), HDF5.H5Float64,
      Seq(HDF5.Att("scale_factor", HDF5.DoubleAtt(scale)),
        HDF5.Att("add_offset", HDF5.DoubleAtt(offset)),
        HDF5.Att("_FillValue", HDF5.DoubleAtt(fill))),
      raw))), out)
    val (_, _, back) = L3Compare.decodedGrid(out, "cloud_fraction_Mean")
    // (raw - offset) * scale restores the physical value; fill -> NaN
    assert(back(0) == 0.25 && back(1) == 0.5 && back(3) == 1.0)
    assert(back(2).isNaN)
  }
}
