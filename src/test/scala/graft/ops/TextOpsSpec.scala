package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("tokens drops empties from messy whitespace") {
    val toks = one[collection.Seq[String]](TextOps.tokens($"t"), "  a  b\tc \n d ")
    assert(toks.toSeq == Seq("a", "b", "c", "d"))
    assert(one[Int](TextOps.tokenCount($"t"), "") == 0)
  }

  test("punctCount counts non-alphanumeric non-space chars") {
    assert(one[Int](TextOps.punctCount($"t"), "a, b! c? 12") == 3)
    assert(one[Int](TextOps.punctCount($"t"), "clean text") == 0)
  }

  test("tokenEstimate: ceil(len/4) per word") {
    // "spark"(2) + "is"(1) + "fantastic"(3)
    assert(one[Long](TextOps.tokenEstimate($"t"), "spark is fantastic") == 6L)
  }

  test("langId picks the language with most stopword hits") {
    assert(one[String](TextOps.langId($"t"), "the cat of the house is big") == "en")
    assert(one[String](TextOps.langId($"t"), "el gato de la casa es grande") == "es")
    assert(one[String](TextOps.langId($"t"), "der hund und die katze ist hier") == "de")
    assert(one[String](TextOps.langId($"t"), "xyzzy plugh") == "und")
  }

  test("langIdNgram scores characteristic trigrams") {
    assert(one[String](TextOps.langIdNgram($"t"),
      "the thing and the other thing") == "en")
    assert(one[String](TextOps.langIdNgram($"t"),
      "der schwarze hund und ich") == "de")
    assert(one[String](TextOps.langIdNgram($"t"), "zzz qqq") == "und")
  }

  test("fingerprint is whitespace/case-normalized and order-sensitive") {
    val a = one[Long](TextOps.fingerprint($"t"), "Hello   World")
    val b = one[Long](TextOps.fingerprint($"t"), "hello world")
    val c = one[Long](TextOps.fingerprint($"t"), "world hello")
    assert(a == b)
    assert(a != c)
    // matches the direct scala fold
    val expect = "hello world".foldLeft(0L)((acc, ch) => (acc * 31 + ch) % 1000000007L)
    assert(a == expect)
  }

  test("qualityScore is in [0,1] and penalizes punctuation soup") {
    val good = one[Double](TextOps.qualityScore($"t"),
      "a perfectly reasonable sentence with normal words here")
    val bad = one[Double](TextOps.qualityScore($"t"), "!!! ??? ### $$$ %%%")
    assert(good > bad)
    assert(good >= 0 && good <= 1 && bad >= 0 && bad <= 1)
  }

  test("redactPii scrubs emails, urls and long digit runs; counts match") {
    val dirty = "write jane.doe+x@corp.example.org or see " +
      "https://example.com/a?b=1 call 555-123-4567 ok"
    val clean = one[String](TextOps.redactPii($"t"), dirty)
    assert(clean == "write <EMAIL> or see <URL> call <NUM> ok")
    assert(one[Int](TextOps.piiCount($"t"), dirty) == 3)
    // clean text passes through untouched, zero count
    val plain = "no personal information in this sentence at all"
    assert(one[String](TextOps.redactPii($"t"), plain) == plain)
    assert(one[Int](TextOps.piiCount($"t"), plain) == 0)
  }
}
