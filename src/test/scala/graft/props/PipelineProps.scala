package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.expr.WinnowFingerprints
import graft.ops.MultimodalOps.Cdc

/** Spark-free property tests of the round-7 algorithmic kernels: the
  * winnowing selection (guarantee + soundness) and content-defined
  * chunking (exact partition, determinism, anchor locality).
  */
object PipelineProps extends Properties("pipeline") {

  private val K = 4
  private val W = 8

  private def winnow(s: String): Set[Long] =
    WinnowFingerprints(Literal(UTF8String.fromString(s), StringType), K, W)
      .eval(null).asInstanceOf[ArrayData].toLongArray.toSet

  private def gramHashes(s: String): Set[Long] =
    s.sliding(K).filter(_.length == K)
      .map(_.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)).toSet

  private val lowerStr: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("winnowing soundness: every fingerprint is one of the string's gram hashes") =
    forAll(lowerStr) { s =>
      winnow(s).subsetOf(gramHashes(s))
    }

  property("winnowing guarantee: shared substring of length w+k-1 forces a common fingerprint") =
    forAll(lowerStr, lowerStr,
      Gen.listOfN(W + K - 1, Gen.alphaLowerChar).map(_.mkString),
      lowerStr, lowerStr) { (a1, a2, shared, b1, b2) =>
      winnow(a1 + shared + a2).intersect(winnow(b1 + shared + b2)).nonEmpty
    }

  property("winnowing is substring-position-independent on the guarantee window") =
    forAll(lowerStr, Gen.listOfN(W + K - 1, Gen.alphaLowerChar).map(_.mkString)) {
      (prefix, shared) =>
        // the shared window's fingerprints survive wherever it lands
        winnow(prefix + shared).intersect(winnow(shared)).nonEmpty
    }

  private val payloadGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 800).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))

  property("cdc chunks partition the payload exactly") =
    forAll(payloadGen) { p =>
      val ch = Cdc.chunksOf(p)
      val contiguous = ch.foldLeft((true, 0)) { case ((ok, at), (s, len, _)) =>
        (ok && s == at && len >= 1, s + len)
      }
      contiguous._1 && contiguous._2 == p.length &&
        (p.nonEmpty || ch.isEmpty)
    }

  property("cdc chunk hashes are the polynomial of the chunk bytes") =
    forAll(payloadGen) { p =>
      Cdc.chunksOf(p).forall { case (s, len, h) =>
        val want = (s until s + len).foldLeft(0L)((a, i) =>
          (a * 31 + (p(i) & 0xff)) % 1000000007L)
        h == want
      }
    }

  private def bytesGen(lo: Int, hi: Int): Gen[Array[Byte]] =
    Gen.chooseNum(lo, hi).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))

  property("cdc anchors are content-local: interior boundaries survive a prepended edit") =
    forAll(bytesGen(64, 800), bytesGen(1, 40)) {
      (p, prefix) =>
        def interiorEnds(bytes: Array[Byte], from: Int): Set[Int] = {
          val ch = Cdc.chunksOf(bytes)
          // drop the forced final end; keep anchor-closed chunk ends
          ch.dropRight(1).map { case (s, len, _) => s + len - 1 }
            .filter(_ >= from).toSet
        }
        val off = prefix.length
        val base = interiorEnds(p, Cdc.Window - 1)
        val shifted = interiorEnds(prefix ++ p, off + Cdc.Window - 1)
          .map(_ - off)
        // every window fully inside p anchors identically in both layouts
        base == shifted
    }
}
