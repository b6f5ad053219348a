package graft.expr

import graft.SparkSpec

class UnicodeExprsSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(UnicodeExprs.nfcNormalize($"t")).collect().head.getString(0)

  test("canonical composition: combining sequences collapse to precomposed forms") {
    assert(nfc("cafe\u0301") == "caf\u00e9") // e + U+0301 -> U+00E9
    assert(nfc("a\u0300") == "\u00e0")
    assert(nfc("o\u0308") == "\u00f6")
    assert(nfc("A\u030a") == "\u00c5")
    // canonical REORDERING: dot-above (ccc 230) typed before dot-below
    // (ccc 220) must sort below-first, compose d + dot-below (U+1E0D),
    // keep the dot-above combining
    assert(nfc("d\u0307\u0323") == "\u1e0d\u0307")
  }

  test("idempotent; ASCII passthrough; null propagates") {
    val ascii = "plain ascii text 123"
    assert(nfc(ascii) == ascii)
    val once = nfc("ga\u0300o\u0308")
    assert(nfc(once) == once)
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(UnicodeExprs.nfcNormalize($"t")).collect().head
    assert(n.isNullAt(0))
  }

  test("the dedup motivation: byte-distinct equal-rendering docs collapse after NFC") {
    val docs = Seq(
      (1L, "caf\u00e9 tables"), // precomposed U+00E9
      (2L, "cafe\u0301 tables") // decomposed e + U+0301, same rendering
    ).toDF("doc_id", "text")
    assert(docs.select($"text").distinct().count() == 2)
    assert(docs.select(UnicodeExprs.nfcNormalize($"text"))
      .distinct().count() == 1)
  }

  test("SQL surface: nfc_normalize registered") {
    graft.GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT nfc_normalize('caf\u00e9')")
      .collect().head.getString(0)
    assert(r == "caf\u00e9")
  }

  test("foldDiacritics: precomposed + combining marks fold; CJK/ASCII untouched") {
    val rows = Seq(
      (1L, "d\u00e9j\u00e0 vu"),        // precomposed e-acute, a-grave
      (2L, "de\u0301ja\u0300 vu"),      // same via combining marks
      (3L, "\u00c5ngstr\u00f6m 42"),    // A-ring, o-diaeresis
      (4L, "plain ascii"),
      (5L, "\u4e2d\u6587 text"))        // CJK has no decomposition
      .toDF("id", "s")
    val got = rows.select($"id", UnicodeExprs.foldDiacritics($"s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "deja vu")
    assert(got(2L) == "deja vu")
    assert(got(3L) == "Angstrom 42")
    assert(got(4L) == "plain ascii")
    assert(got(5L) == "\u4e2d\u6587 text")
    // the match-key motivation: byte-distinct spellings share one key
    assert(rows.filter($"id" <= 2)
      .select(UnicodeExprs.foldDiacritics($"s")).distinct().count() == 1)
  }
}
