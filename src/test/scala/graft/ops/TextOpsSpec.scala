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

  test("codegen punctCount equals the regex spec form it replaced") {
    val spec = length($"t") - length(regexp_replace($"t", "[^a-zA-Z0-9\\s]", ""))
    val texts = Seq("", "a, b! c? 12", "tabs\tand\nnewlines\f\r ok",
      "éàü non-ascii counts", "mixed: 😀 emoji & dots...", "___---===")
    texts.foreach { s =>
      val both = Seq(s).toDF("t")
        .select(TextOps.punctCount($"t").as("fast"), spec.as("spec"))
        .head()
      // NOTE length() counts code points, so the regex diff counts code
      // points too — the byte walk must agree even on astral chars
      assert(both.getInt(0) == both.getInt(1), s"mismatch on '$s'")
    }
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

  test("normalizeText lowercases, strips symbols, collapses whitespace") {
    val out = Seq(
      "  Hello,   WORLD!!  42\tfoo\nbar  ",
      "***",
      "",
      "already clean text"
    ).toDF("t").select(TextOps.normalizeText($"t")).as[String].collect()
    assert(out(0) == "hello world 42 foo bar")
    assert(out(1) == "") // symbol-only input normalizes to empty
    assert(out(2) == "")
    assert(out(3) == "already clean text")
  }

  test("tokenNgrams windows tokens; short docs yield empty") {
    val g = one[collection.Seq[String]](TextOps.tokenNgrams($"t", 2), "a b a b")
    assert(g.toSeq == Seq("a b", "b a", "a b"))
    assert(one[collection.Seq[String]](TextOps.tokenNgrams($"t", 3), "x y").toSeq.isEmpty)
    assert(one[collection.Seq[String]](TextOps.tokenNgrams($"t", 1), "p q").toSeq == Seq("p", "q"))
  }

  test("repetition signals: distinct-token and duplicate-n-gram fractions") {
    // "a b a b": 4 tokens / 2 distinct; bigrams (a b, b a, a b) -> 1/3 dup;
    // trigrams (a b a, b a b) all distinct -> 0
    assert(one[Double](TextOps.distinctTokenFrac($"t"), "a b a b") == 0.5)
    assert(one[Double](TextOps.dupNgramFrac($"t", 2), "a b a b") == 1.0 - 2.0 / 3.0)
    assert(one[Double](TextOps.dupNgramFrac($"t", 3), "a b a b") == 0.0)
    // degenerate loop is maximally repetitive; varied text is not
    assert(one[Double](TextOps.dupNgramFrac($"t", 2), "spam spam spam spam spam") == 0.75)
    assert(one[Double](TextOps.dupNgramFrac($"t", 2), "all words fresh here today") == 0.0)
    // empty / too-short docs: no repetition by definition
    assert(one[Double](TextOps.distinctTokenFrac($"t"), "") == 1.0)
    assert(one[Double](TextOps.dupNgramFrac($"t", 2), "solo") == 0.0)
  }

  test("dictionaryTag: word boundaries, multi-token entities, normalization") {
    val docs = Seq(
      (1L, "Visited New York, twice!"),      // multi-token + punctuation
      (2L, "the newyorker magazine"),        // no partial/substring match
      (3L, "york new york  new"),            // match anywhere, once per entity
      (4L, "nothing here")).toDF("doc_id", "text")
    val got = TextOps.dictionaryTag(docs, "doc_id", "text",
        Seq("new york", "york"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "new york"), (1L, "york"),
      (3L, "new york"), (3L, "york")), s"got $got")
    // unnormalized entities are rejected loudly
    intercept[IllegalArgumentException] {
      TextOps.dictionaryTag(docs, "doc_id", "text", Seq("New York"))
    }
  }
  test("vocabCoverage: deterministic ranking and exact cumulative shares") {
    import org.apache.spark.sql.functions._
    // occurrences: the 5, cat 3, dog 2 -> total 10
    val docs = Seq("the cat the dog", "the cat THE dog cat the")
      .toDF("text")
    val out = TextOps.vocabCoverage(docs, col("text"), k = 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "the", 5L, 5L, 500000L),
      (2L, "cat", 3L, 8L, 800000L)))
    // ties break on token asc: two types with equal counts rank by name
    val tie = Seq("aa bb aa bb cc").toDF("text")
    val t2 = TextOps.vocabCoverage(tie, col("text"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t2 == Map(1L -> "aa", 2L -> "bb", 3L -> "cc"))
    // k past the vocab just returns the whole curve; last row covers all
    val full = TextOps.vocabCoverage(docs, col("text"), k = 100).collect()
    assert(full.last.getLong(4) == 1000000L)
    // empty input -> empty curve, no division error
    assert(TextOps.vocabCoverage(docs.limit(0), col("text"), 5).count() == 0)
  }

  test("bigramCounts: hand pairs, doc boundaries never pair, layout-invariant") {
    import spark.implicits._
    val docs = Seq("a b a b", "b a", "c").toDF("text")
    val got = TextOps.bigramCounts(docs).as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // doc1: (a,b),(b,a),(a,b); doc2: (b,a); doc3: none
    assert(got == Map(("a", "b") -> 2L, ("b", "a") -> 2L))
    val shuffled = TextOps.bigramCounts(docs.repartition(5))
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(shuffled == got)
  }

  test("pmiCollocations: planted collocation tops the list; min-count floor holds") {
    import spark.implicits._
    // "new york" always adjacent (planted); "the the" frequent but
    // independent-ish filler; rare pair "rare gem" (1 occurrence) must
    // be cut by minCount
    val docs = (1 to 30).map(i =>
      s"new york w$i the x${i % 3} the y$i the z${i % 5} the") ++
      Seq("rare gem")
    val out = TextOps.pmiCollocations(docs.toDF("text"), minCount = 5L, k = 10)
      .collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("x") == "new" && top.getAs[String]("y") == "york",
      s"planted collocation must win: ${out.take(3).mkString(";")}")
    assert(!out.exists(r => r.getAs[String]("x") == "rare"),
      "minCount floor must cut singletons")
    // PMI of a deterministic pair: c_xy = c_x = c_y = 30 ->
    // pmi = L(30) + L(N) - L(30) - L(30) = L(N) - L(30) > 0
    assert(top.getAs[Long]("pmi_fixed") > 0L)
  }

  test("bigramCondEntropy: deterministic stream scores 0; uniform scores log2 k") {
    import spark.implicits._
    // 'a b a b ...': every context predicts its successor exactly ->
    // H(Y|X) = 0
    val det = Seq(("a b " * 50).trim).toDF("text")
    val d = TextOps.bigramCondEntropy(det).collect().head
    assert(d.getAs[Long]("h_num_fixed") == 0L)
    assert(d.getAs[Double]("h_bits") == 0.0)
    // context 'a' followed by c/d equally often -> H = 1 bit exactly
    // (counts are powers of two, so Log2Fixed is exact)
    val unif = Seq(("a c a d " * 16).trim).toDF("text")
    val u = TextOps.bigramCondEntropy(unif).collect().head
    // pairs: (a,c) 16, (a,d) 16, (c,a) 16, (d,a) 15; context a: 32 ->
    // contributions: 16*(L32-L16)*2 = 32*2^20 from 'a'; c,d contexts 0
    assert(u.getAs[Long]("n_contexts") == 3L)
    assert(u.getAs[Long]("h_num_fixed") == 32L * 1048576L)
    // empty corpus: zero row with NULL bits
    val e = TextOps.bigramCondEntropy(det.limit(0)).collect().head
    assert(e.getAs[Long]("n_pairs") == 0L)
    assert(e.isNullAt(e.fieldIndex("h_bits")))
  }

  test("termBurstiness: clumped vs spread terms with identical tf; exact moments") {
    // 'spread' once in each of 4 docs (VMR -> Poisson-ish, < 1 over 8 docs);
    // 'clump' four times in one doc (VMR >> 1); same tf = 4
    val docs = Seq(
      (1L, "clump clump clump clump"), (2L, "spread x"), (3L, "spread y"),
      (4L, "spread z"), (5L, "spread w"), (6L, "pad a"), (7L, "pad b"),
      (8L, "pad c")).toDF("doc_id", "text")
    val got = TextOps.termBurstiness(docs, k = 20)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val n = 8L
    def vmr(counts: Seq[Long]): Double = {
      val tf = counts.sum; val ss = counts.map(c => c * c).sum
      (n * ss - tf * tf).toDouble / (n * tf).toDouble
    }
    assert(got("clump") === ((4L, 1L, vmr(Seq(4L)))))
    assert(got("spread") === ((4L, 4L, vmr(Seq(1L, 1L, 1L, 1L)))))
    assert(got("clump")._3 > 2.0 && got("spread")._3 < 1.0)
  }

  test("termBurstiness: top-k cut is (tf desc, token) deterministic") {
    val docs = Seq((1L, "b b a a c")).toDF("doc_id", "text")
    val got = TextOps.termBurstiness(docs, k = 2).collect().map(_.getString(0))
    assert(got.toSet === Set("a", "b")) // tf 2,2,1 — ties broken by token
  }

  test("keynessLlr: exact scalar replay; planted enrichment; single-slice finite") {
    val docs = Seq(
      ("en", "apple apple apple shared shared only_en"),
      ("en", "apple shared banana"),
      ("de", "banana banana shared shared only_de"),
      ("de", "banana shared apple")).toDF("lang", "text")
    val got = TextOps.keynessLlr(
      docs, col("lang") === "en", col("lang") =!= "en", minCount = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // scalar replay
    val ta = Seq("apple", "apple", "apple", "shared", "shared", "only_en",
      "apple", "shared", "banana")
    val tb = Seq("banana", "banana", "shared", "shared", "only_de",
      "banana", "shared", "apple")
    val (na, nb) = (ta.size.toLong, tb.size.toLong)
    def l(v: Long) = SelectionOps.log2Fixed(v)
    (ta ++ tb).distinct.foreach { t =>
      val (a, b) = (ta.count(_ == t).toLong, tb.count(_ == t).toLong)
      val expected = 2L * (
        (if (a > 0) a * (l(a * (na + nb)) - l((a + b) * na)) else 0L) +
          (if (b > 0) b * (l(b * (na + nb)) - l((a + b) * nb)) else 0L))
      val (gA, gB, gLlr, gIn) = got(t)
      assert((gA, gB) === ((a, b)), s"counts for $t")
      assert(gLlr === expected, s"llr for $t")
      assert(gIn === (if (a * nb > b * na) "a" else "b"), s"side for $t")
    }
    // planted: apple enriched in en, banana in de; both clearly keyed
    assert(got("apple")._4 === "a" && got("banana")._4 === "b")
    // single-slice tokens are finite and keyed to their slice
    assert(got("only_en")._4 === "a" && got("only_en")._3 > 0L)
    // balanced term scores ~0 (within fixed-point truncation slack)
    assert(math.abs(got("shared")._3.toDouble) <
      math.min(got("apple")._3, got("banana")._3).toDouble / 4)
  }

  test("readability: counts and both scores match the hand fixture") {
    val docs = Seq(
      // 6 words, 2 sentences ('...' is one terminator run), syllables:
      // the(1) cat(1) sat(1) down(1) here(2:e-e) now(1) = 7 vowel groups
      (1L, "The cat sat down. Here now..."),
      (2L, "xyz"), // no vowels, no terminator: 1 word, 1 sentence, 0 syl
      (3L, "")).toDF("doc_id", "text")
    val out = TextOps.readability(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 6L)
    assert(r1.getAs[Long]("n_sentences") == 2L)
    assert(r1.getAs[Long]("n_syllables") == 7L)
    val wps = 6.0 / 2.0; val spw = 7.0 / 6.0
    assert(r1.getAs[Double]("flesch") == 206.835 - 1.015 * wps - 84.6 * spw)
    assert(r1.getAs[Double]("fk_grade") == 0.39 * wps + 11.8 * spw - 15.59)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_sentences") == 1L) // clamped, not 0
    assert(r2.getAs[Long]("n_syllables") == 0L)
    // empty text: zero words -> NULL scores
    assert(out(3L).isNullAt(out(3L).fieldIndex("flesch")))
  }

  test("codeSignals: hand-counted symbol/digit densities separate JSON " +
    "from prose; empty and NULL texts dropped") {
    val rows = Seq(
      (1L, "a", Some("""{"k":"v","n":12}""")),
      (2L, "b", Some("plain prose with 1 digit")),
      (3L, "b", Some("")),
      (4L, "b", None))
    val out = TextOps.codeSignals(
      rows.toDF("id", "kind", "tx"), col("id"), col("kind"), col("tx"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.keySet == Set(1L, 2L), "empty/NULL rows dropped")
    val j = out(1L)
    // {"k":"v","n":12} -> 16 chars; syms: { } : : " x6 , = 10; digits 2
    assert(j.getAs[Long]("n_char") == 16L)
    assert(j.getAs[Long]("n_sym") == 10L && j.getAs[Long]("n_digit") == 2L)
    assert(j.getAs[Long]("score_micro") == 1000000L * 32L / 16L)
    assert(j.getAs[Int]("is_code") == 1)
    val p = out(2L)
    assert(p.getAs[Long]("n_sym") == 0L && p.getAs[Long]("n_digit") == 1L)
    assert(p.getAs[Int]("is_code") == 0)
  }

  test("lexicalDiversity == the scalar type-frequency replica") {
    val docs = Seq(
      ("s1", "the cat and the dog and the bird"),
      ("s1", "the cat"),
      ("s2", "every token here is unique"))
    val out = TextOps.lexicalDiversity(
      docs.toDF("src", "text"), col("src"), col("text"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // s1 tokens: the x4, cat x2, and x2, dog, bird -> N=10, V=5
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_tokens") == 10L &&
      s1.getAs[Long]("n_types") == 5L)
    assert(s1.getAs[Long]("ttr_micro") == 500000L)
    val rep2 = 4L * 3 + 2 * 1 + 2 * 1 // sum c(c-1)
    assert(s1.getAs[Double]("simpson") ==
      rep2.toDouble / (10.0 * 9.0))
    val s2sum = 16L + 4 + 4 + 1 + 1 // sum c^2
    assert(s1.getAs[Double]("yule_k") ==
      10000.0 * (s2sum - 10L).toDouble / (10.0 * 10.0))
    // all-unique source: simpson 0, yule 0, TTR 1
    val s2 = out("s2")
    assert(s2.getAs[Long]("ttr_micro") == 1000000L)
    assert(s2.getAs[Double]("simpson") == 0.0 &&
      s2.getAs[Double]("yule_k") == 0.0)
  }
}
