package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.io.HDF5
import graft.io.HDF5._

/** Spark-free property tests of the pure-JVM HDF5 classic codec: any
  * generatable file must parse back logically identical and RE-SERIALIZE
  * byte-identically (the determinism the byte-level HDF5Spec pins on
  * fixed examples, here over randomized names, ranks, dims, types and
  * attribute sets — the padding/sizing edge cases a hand-picked fixture
  * can miss).
  */
object HDF5Props extends Properties("hdf5") {

  private val nameGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 24)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.const('_'), Gen.const('.')))
  } yield cs.mkString

  private val attGen: Gen[Att] = for {
    name <- nameGen
    value <- Gen.oneOf(
      Gen.chooseNum(0, 20).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(cs => StrAtt(cs.mkString))),
      Gen.chooseNum(1, 4).flatMap(k =>
        Gen.listOfN(k, Gen.chooseNum(0, 8).flatMap(n =>
          Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)))
          .map(StrArrayAtt(_))),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(LongAtt(_)),
      Gen.chooseNum(-1e12, 1e12).map(DoubleAtt(_)))
  } yield Att(name, value)

  private val datasetGen: Gen[Dataset] = for {
    name <- nameGen
    rank <- Gen.chooseNum(1, 4)
    dims <- Gen.listOfN(rank, Gen.chooseNum(1, 5))
    nAtts <- Gen.chooseNum(0, 4)
    atts0 <- Gen.listOfN(nAtts, attGen)
    atts = atts0.groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)
    n = dims.product
    isInt <- Gen.oneOf(true, false)
    data <- if (isInt)
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
        .map(_.toArray)
    else Gen.listOfN(n, Gen.chooseNum(-1e9, 1e9)).map(_.toArray)
  } yield
    if (isInt) Dataset(name, dims, H5Int64, atts, data.asInstanceOf[Array[Long]])
    else Dataset(name, dims, H5Float64, atts, data.asInstanceOf[Array[Double]])

  private val fileGen: Gen[H5File] = for {
    n <- Gen.chooseNum(1, 12)
    ds0 <- Gen.listOfN(n, datasetGen)
    // distinct names (a file is a map)
    ds = ds0.groupBy(_.name).map(_._2.head).toSeq
  } yield H5File(ds)

  property("write -> parse is logically lossless") = forAll(fileGen) { f =>
    val back = HDF5.fromBytes(HDF5.toBytes(f))
    val want = f.datasets.sortBy(_.name)
    back.datasets.length == want.length &&
      back.datasets.zip(want).forall { case (r, d) =>
        r.name == d.name && r.dims == d.dims && r.dtype == d.dtype &&
          r.atts == d.atts &&
          ((d.data, r.data) match {
            case (a: Array[Long], b: Array[Long]) => a.sameElements(b)
            case (a: Array[Double], b: Array[Double]) => a.sameElements(b)
            case _ => false
          })
      }
  }

  property("parse -> re-write is byte-identical") = forAll(fileGen) { f =>
    val bytes = HDF5.toBytes(f)
    java.util.Arrays.equals(HDF5.toBytes(HDF5.fromBytes(bytes)), bytes)
  }

  property("signature and EOF invariants hold for any file") =
    forAll(fileGen) { f =>
      val b = HDF5.toBytes(f)
      (b(0) & 0xFF) == 0x89 && b(1) == 'H' && b(2) == 'D' && b(3) == 'F' &&
        java.nio.ByteBuffer.wrap(b, 40, 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong == b.length
    }
}
