package graft.agg

import org.scalatest.funsuite.AnyFunSuite

/** np.histogram bin-semantics parity for the Scala binner (the Column and
  * SQL versions are cross-checked against this via the oracle gate).
  */
class BinningSpec extends AnyFunSuite {

  private val edges = Array(0.0, 1.0, 2.5, 5.0, 10.0)

  /** Straight transcription of np.histogram's rule. */
  private def naive(v: Double, e: Array[Double]): Int = {
    if (v.isNaN || v < e.head || v > e.last) return -1
    if (v == e.last) return e.length - 2 // last bin closed
    var i = 0
    while (i < e.length - 1) {
      if (v >= e(i) && v < e(i + 1)) return i
      i += 1
    }
    -1
  }

  test("left-closed bins, last bin closed, out-of-range dropped") {
    assert(Binning.binIndexScala(0.0, edges) == 0)
    assert(Binning.binIndexScala(0.999, edges) == 0)
    assert(Binning.binIndexScala(1.0, edges) == 1)
    assert(Binning.binIndexScala(10.0, edges) == 3) // closed last edge
    assert(Binning.binIndexScala(10.0001, edges) == -1)
    assert(Binning.binIndexScala(-0.0001, edges) == -1)
    assert(Binning.binIndexScala(Double.NaN, edges) == -1)
  }

  test("binary search matches the naive rule on arbitrary doubles") {
    val rnd = new scala.util.Random(42)
    (1 to 10000).foreach { _ =>
      val v = rnd.nextDouble() * 24 - 12 // straddles the support
      assert(Binning.binIndexScala(v, edges) == naive(v, edges), s"v=$v")
    }
    // dense sweep across the support
    (-100 to 1100).foreach { i =>
      val v = i / 100.0
      assert(Binning.binIndexScala(v, edges) == naive(v, edges), s"v=$v")
    }
  }

  test("exact edge values land in their own bin") {
    edges.dropRight(1).zipWithIndex.foreach { case (e, i) =>
      assert(Binning.binIndexScala(e, edges) == i)
    }
  }
}
