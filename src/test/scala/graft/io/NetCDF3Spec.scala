package graft.io

import org.scalatest.funsuite.AnyFunSuite

import NetCDF3._

/** Byte-level pins for the pure-JVM netCDF-3 classic writer/reader.
  * The layout is the public spec (netCDF User Guide, Appendix B); with no
  * external netCDF library in this environment, the minimal-file test
  * hand-computes the expected bytes straight from the spec, and the
  * round-trip test pins write -> parse -> re-write byte identity.
  */
class NetCDF3Spec extends AnyFunSuite {

  test("minimal file matches the spec byte for byte (hand-computed)") {
    val f = NcFile(
      dims = Seq(Dim("x", 2)),
      gatts = Seq.empty,
      vars = Seq(Var("v", Seq(0), NcInt, Seq.empty, Array(7, -1))))
    val expect: Array[Byte] = (
      Seq('C'.toInt, 'D'.toInt, 'F'.toInt, 1) ++ // magic, CDF-1
        Seq(0, 0, 0, 0) ++ //                       numrecs = 0
        Seq(0, 0, 0, 0x0A) ++ //                    NC_DIMENSION
        Seq(0, 0, 0, 1) ++ //                       1 dim
        Seq(0, 0, 0, 1) ++ //                       name length 1
        Seq('x'.toInt, 0, 0, 0) ++ //               "x" + pad
        Seq(0, 0, 0, 2) ++ //                       dim length 2
        Seq(0, 0, 0, 0, 0, 0, 0, 0) ++ //           gatts ABSENT
        Seq(0, 0, 0, 0x0B) ++ //                    NC_VARIABLE
        Seq(0, 0, 0, 1) ++ //                       1 var
        Seq(0, 0, 0, 1) ++ //                       name length 1
        Seq('v'.toInt, 0, 0, 0) ++ //               "v" + pad
        Seq(0, 0, 0, 1) ++ //                       ndims = 1
        Seq(0, 0, 0, 0) ++ //                       dimid 0
        Seq(0, 0, 0, 0, 0, 0, 0, 0) ++ //           vatts ABSENT
        Seq(0, 0, 0, 4) ++ //                       NC_INT
        Seq(0, 0, 0, 8) ++ //                       vsize = 8
        Seq(0, 0, 0, 80) ++ //                      begin = header size
        Seq(0, 0, 0, 7) ++ //                       data: 7
        Seq(0xFF, 0xFF, 0xFF, 0xFF) //              data: -1
      ).map(_.toByte).toArray
    assert(toBytes(f).toSeq == expect.toSeq)
  }

  test("write -> parse -> re-write is byte-identical across all types") {
    val f = NcFile(
      dims = Seq(Dim("lat", 2), Dim("lon", 3), Dim("bin", 4)),
      gatts = Seq(
        Att("title", CharAtt("graft L3 grid")),
        Att("version", IntAtt(Seq(3)))),
      vars = Seq(
        Var("lat", Seq(0), NcDouble,
          Seq(Att("units", CharAtt("degrees"))), Array(-45.0, 45.0)),
        Var("counts", Seq(0, 1), NcInt,
          Seq(Att("_FillValue", IntAtt(Seq(-9999)))),
          Array(1, 2, 3, 4, 5, 6)),
        Var("hist", Seq(0, 1, 2), NcShort, Seq.empty,
          Array.tabulate[Short](24)(_.toShort)),
        Var("flags", Seq(1), NcByte, Seq.empty, Array[Byte](1, 0, 1)),
        Var("name", Seq(2), NcChar, Seq.empty, "abcd".getBytes),
        Var("frac", Seq(0), NcFloat,
          Seq(Att("scale_factor", DoubleAtt(Seq(1e-4))),
            Att("valid_range", FloatAtt(Seq(0f, 1f))),
            Att("levels", ShortAtt(Seq(1.toShort, 2.toShort)))),
          Array(0.25f, 0.75f)))
    )
    val bytes = toBytes(f)
    val parsed = fromBytes(bytes)
    assert(toBytes(parsed).toSeq == bytes.toSeq)
    // structural spot checks (odd-length data padded to 4 in the file)
    assert(parsed.dims == f.dims)
    assert(parsed.gatts == f.gatts)
    assert(parsed.vars.map(_.name) == f.vars.map(_.name))
    assert(parsed.vars(1).data.asInstanceOf[Array[Int]].toSeq == Seq(1, 2, 3, 4, 5, 6))
    assert(parsed.vars(3).data.asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 0, 1))
    assert(parsed.vars(5).atts ==
      Seq(Att("scale_factor", DoubleAtt(Seq(1e-4))),
        Att("valid_range", FloatAtt(Seq(0f, 1f))),
        Att("levels", ShortAtt(Seq(1.toShort, 2.toShort)))))
  }

  test("validation rejects shape/type mismatches and bad dim ids") {
    val d = Seq(Dim("x", 2))
    intercept[IllegalArgumentException] {
      toBytes(NcFile(d, Nil, Seq(Var("v", Seq(0), NcInt, Nil, Array(1, 2, 3)))))
    }
    intercept[IllegalArgumentException] {
      toBytes(NcFile(d, Nil, Seq(Var("v", Seq(0), NcInt, Nil, Array(1.0, 2.0)))))
    }
    intercept[IllegalArgumentException] {
      toBytes(NcFile(d, Nil, Seq(Var("v", Seq(1), NcInt, Nil, Array(1, 2)))))
    }
  }

  test("scalar variables (no dims) and empty files are well-formed") {
    val f = NcFile(Nil, Nil, Seq(Var("t", Nil, NcDouble, Nil, Array(3.5))))
    val p = fromBytes(toBytes(f))
    assert(p.vars.head.data.asInstanceOf[Array[Double]].toSeq == Seq(3.5))
    assert(fromBytes(toBytes(NcFile(Nil, Nil, Nil))) == NcFile(Nil, Nil, Nil))
  }
}
