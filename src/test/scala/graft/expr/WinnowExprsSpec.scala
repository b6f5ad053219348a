package graft.expr

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class WinnowExprsSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 8

  /** Independent reference formulation (straight from the SIGMOD'03
    * definition, no shared code with the expression's loop shape).
    */
  private def reference(s: String, k: Int = K, w: Int = W): Seq[Long] = {
    val grams = s.sliding(k).filter(_.length == k)
      .map(_.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L))
      .toVector
    if (grams.isEmpty) Vector.empty
    else {
      val windows = math.max(grams.length - w + 1, 1)
      (0 until windows).map(j => grams.slice(j, j + w).min)
        .distinct.sorted
    }
  }

  private def viaDf(s: String): Seq[Long] =
    Seq(Tuple1(s)).toDF("t")
      .select(WinnowExprs.winnowFingerprints($"t", K, W).as("fp"))
      .collect().head.getSeq[Long](0)

  test("expression matches the independent reference formulation") {
    val inputs = Seq(
      "thequickbrownfoxjumpsoverthelazydog",
      "abcabcabcabcabcabc", // periodic: few distinct grams
      "aaaaaaaaaaaa", // one distinct gram value
      "abcd", // exactly one gram, fewer grams than the window
      "abcdefghij", // grams < w: single clamped window
      "abc", // shorter than k: empty
      "")
    inputs.foreach { s =>
      assert(viaDf(s) == reference(s), s"input: '$s'")
    }
  }

  test("interpreted eval matches codegen") {
    val s = "winnowingfingerprintparitycheckstring"
    val e = WinnowFingerprints(
      Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType), K, W)
    val interp = e.eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
    assert(interp == viaDf(s))
    assert(interp == reference(s))
  }

  test("winnowing guarantee: shared substring >= w + k - 1 chars implies a shared fingerprint") {
    // any shared run of w+k-1 = 11 normalized chars must yield >= 1
    // common selected fingerprint, wherever it lands in either doc
    val shared = "commonstolenpassagehere" // 23 chars, > 11
    val a = "prefixunrelatedalpha" + shared + "suffixalpha"
    val b = "zzzdifferentlead" + shared + "andanothertail"
    val common = viaDf(a).toSet.intersect(viaDf(b).toSet)
    assert(common.nonEmpty)
  }

  test("formatting invariance after normalization") {
    val raw = Seq(
      (1L, "The quick BROWN fox, jumps over the lazy dog!"),
      (2L, "the   quick\nbrown fox jumps-over the (lazy) dog"))
      .toDF("doc_id", "text")
    val fps = graft.ops.DedupOps
      .winnowFingerprints(raw, "doc_id", "text", K, W)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(fps(1L) == fps(2L))
  }

  test("overlap pairs find planted reuse and the df cap drops boilerplate") {
    // 20 docs all carry the same boilerplate; docs 1 and 2 additionally
    // share a long stolen passage. With maxDf well under 20 the
    // boilerplate fingerprints die at the df gate, so ONLY (1,2) pairs.
    val boiler = "standardfooterlegaltextrepeatedeverywhereallrightsreserved"
    val stolen = "uniquestolenparagraphthatappearstwiceonlyhereandnowhereelse"
    val docs = (1L to 20L).map { i =>
      val body =
        if (i <= 2) stolen + s"ownwords$i"
        else s"completelyoriginalcontentnumber$i" + ("x" * i.toInt)
      (i, body + boiler)
    }.toDF("doc_id", "text")
    val fps = graft.ops.DedupOps.winnowFingerprints(docs, "doc_id", "text", K, W)
    val pairs = graft.ops.DedupOps
      .winnowOverlapPairs(fps, minShared = 3L, maxDf = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)))
    assert(pairs((1L, 2L)) >= 3L)
  }
}
