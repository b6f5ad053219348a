package graft.io

import org.scalatest.funsuite.AnyFunSuite

import HDF5._

/** Reads the reference's two COMMITTED golden artifacts with the
  * pure-JVM [[HDF5]] reader — the de-facto golden outputs SURVEY §5
  * names (`examples/result_comparison/plot_comparison.ipynb` loads
  * them for the NASA-product comparison):
  *
  *   - `resources/data/sample_output_data/output_final.hdf5` — written
  *     by h5py 2.x (superblock v0, version-1 object headers with
  *     continuation blocks, vlen-string attributes in a global heap);
  *     the legacy cloud-fraction pipeline's output (`cfa.py:59-71`
  *     writes CF + lat_bnd/lon_bnd axes).
  *   - `resources/data/sample_output_data/MYD08_D3.A2008001CloudFraction.nc`
  *     — despite the `.nc` name, a netCDF-4 file, i.e. HDF5 with
  *     version-2 "OHDR" object headers, compact link messages, and
  *     dimension-scale placeholder datasets (netcdf 4.6.2 / HDF5 1.10
  *     per its `_NCProperties`).
  *
  * Until round 6 the reader parsed only its own writer's subset and
  * failed on both files (`BufferUnderflowException`); these tests pin
  * dataset inventory (names/shapes/dtypes), the CF attribute sets, and
  * physically-sane decoded values for each.
  */
class GoldenInteropSpec extends AnyFunSuite {

  private val dir = "/root/reference/resources/data/sample_output_data"
  private val h5Path = s"$dir/output_final.hdf5"
  private val ncPath = s"$dir/MYD08_D3.A2008001CloudFraction.nc"

  private def att(d: Dataset, name: String): AttValue =
    d.atts.find(_.name == name).getOrElse(fail(s"${d.name}: no attr $name")).value

  test("golden output_final.hdf5: dataset inventory, attrs, CF value range") {
    val f = HDF5.read(h5Path)
    assert(f.datasets.map(_.name).sorted == Seq("CF", "lat_bnd", "lon_bnd"))

    val cf = f.datasets.find(_.name == "CF").get
    assert(cf.dims == Seq(180, 360))
    assert(cf.dtype == H5Float64)
    // h5py writes the reference's `dims[i].label` calls as a vlen-string
    // DIMENSION_LABELS attribute resolved through the global heap
    assert(att(cf, "DIMENSION_LABELS") == StrArrayAtt(Seq("lat_bnd", "lon_bnd")))

    val lat = f.datasets.find(_.name == "lat_bnd").get
    assert(lat.dims == Seq(181) && lat.dtype == H5Int64)
    assert(att(lat, "units") == StrAtt("degrees"))
    assert(att(lat, "long_name") == StrAtt("Latitude_boundaries"))
    val latV = lat.data.asInstanceOf[Array[Long]]
    assert(latV.head == -90L && latV.last == 90L)
    assert(latV.toSeq == (-90L to 90L).toSeq)

    val lon = f.datasets.find(_.name == "lon_bnd").get
    assert(lon.dims == Seq(360) && lon.dtype == H5Int64)
    assert(att(lon, "units") == StrAtt("degrees"))
    assert(att(lon, "long_name") == StrAtt("Longitude_boundaries"))
    val lonV = lon.data.asInstanceOf[Array[Long]]
    assert(lonV.toSeq == (-180L to 179L).toSeq)

    // the CF grid is a sparse partial run: 1776 defined cells, every
    // one a physical cloud fraction in [0, 1], the rest NaN
    val v = cf.data.asInstanceOf[Array[Double]]
    assert(v.length == 180 * 360)
    val defined = v.filterNot(_.isNaN)
    assert(defined.length == 1776)
    assert(defined.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("golden MYD08_D3 CloudFraction .nc (netCDF-4/OHDR): inventory + values") {
    val f = HDF5.read(ncPath)
    assert(f.datasets.map(_.name).sorted ==
      Seq("__xarray_dataarray_variable__", "dim_0", "dim_1"))

    val cf = f.datasets.find(_.name == "__xarray_dataarray_variable__").get
    assert(cf.dims == Seq(180, 360))
    assert(cf.dtype == H5Float64)
    // h5py writes scalar _FillValue as a rank-1 [1] array; the reader
    // collapses it to the scalar model — and the value is NaN
    att(cf, "_FillValue") match {
      case DoubleAtt(x) => assert(x.isNaN)
      case other => fail(s"_FillValue: $other")
    }
    // every cell defined (uncovered cells carry the legacy pipeline's
    // total==0 guard value 0, `cfa.py:53-56`), all in [0, 1]
    val v = cf.data.asInstanceOf[Array[Double]]
    assert(v.length == 64800)
    assert(v.forall(x => !x.isNaN && x >= 0.0 && x <= 1.0))
    // a partial-swath day: 1624 covered cells whose mean cloud fraction
    // is a physically plausible value
    val covered = v.filter(_ > 0.0)
    assert(covered.length == 1624)
    val mean = covered.sum / covered.length
    assert(mean > 0.3 && mean < 0.9, s"implausible covered-cell mean CF $mean")

    // netCDF dimension-scale placeholders: float32 (widened to f64),
    // data never allocated -> fill-materialized zeros
    for ((name, n) <- Seq(("dim_0", 180), ("dim_1", 360))) {
      val d = f.datasets.find(_.name == name).get
      assert(d.dims == Seq(n))
      assert(d.dtype == H5Float64) // widened from float32
      assert(att(d, "CLASS") == StrAtt("DIMENSION_SCALE"))
      assert(d.data.asInstanceOf[Array[Double]].forall(_ == 0.0))
    }
  }

  test("reader still round-trips the writer's own bytes after the widening") {
    val f = H5File(Seq(
      Dataset("a", Seq(2, 3), H5Float64,
        Seq(Att("units", StrAtt("none")), Att("scale_factor", DoubleAtt(0.01))),
        Array(1.0, 2.0, 3.0, 4.0, 5.0, Double.NaN)),
      Dataset("n", Seq(4), H5Int64, Seq(Att("k", LongAtt(7L))),
        Array(1L, 2L, 3L, 4L))))
    val bytes = toBytes(f)
    val back = fromBytes(bytes)
    assert(toBytes(back).sameElements(bytes))
  }
}
