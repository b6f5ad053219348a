package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple apple banana"),
    (3L, "banana banana banana banana"),
    (4L, "cherry plum"),
    (5L, "kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi"),
    (6L, "apple cherry")
  ).toDF("doc_id", "text")

  private def scores(terms: Seq[String]): Map[Long, Double] =
    SearchOps.bm25TopK(docs, $"doc_id", $"text", terms, k = 10)
      .as[(Long, Double)].collect().toMap

  test("bm25TopK matches a scalar reimplementation exactly") {
    val corpus = Map(
      1L -> Seq("apple", "banana", "cherry"),
      2L -> Seq("apple", "apple", "apple", "banana"),
      3L -> Seq("banana", "banana", "banana", "banana"),
      4L -> Seq("cherry", "plum"),
      5L -> Seq.fill(12)("kiwi"),
      6L -> Seq("apple", "cherry"))
    val terms = Seq("apple", "cherry")
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    def expected(toks: Seq[String]): Double = {
      val dl = toks.size.toDouble
      terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = corpus.values.count(_.contains(t)).toDouble
        val idf = (n - df + 0.5) / (df + 0.5)
        idf * (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * dl / avgdl))
      }.reduce(_ + _)
    }
    val got = scores(terms)
    corpus.foreach { case (id, toks) =>
      val e = expected(toks)
      if (e > 0) assert(got(id) == e, s"doc $id: got ${got.get(id)}, want $e")
      else assert(!got.contains(id), s"doc $id should be filtered (score 0)")
    }
  }

  test("rarer terms rank higher and tf saturates") {
    val s = scores(Seq("plum", "banana"))
    // doc 4 has the rare term once; doc 3 has the common term four times
    assert(s(4L) > s(3L), s"rare-term doc must outrank common-term doc: $s")
    // doc 3 (4x banana) still beats doc 1 (1x banana, longer-irrelevant)
    assert(s(3L) > s(1L))
  }

  test("top-k plan uses per-task heaps, not a global sort") {
    val plan = SearchOps.bm25TopK(docs, $"doc_id", $"text", Seq("apple"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row must be broadcast:\n$plan")
  }

  test("phraseSearch finds every occurrence at its exact anchor, nothing else") {
    val corpus = Seq(
      (1L, "the quick brown fox and the quick brown dog"), // anchors 0 and 5
      (2L, "quick brown"), // prefix only — no full phrase
      (3L, "THE Quick BROWN fox"), // case-normalized anchor 0
      (4L, "the brown quick fox"), // all terms, wrong order
      (5L, "the quick quick brown fox") // repeated term breaks adjacency — no hit
    ).toDF("doc_id", "text")
    val postings = SearchOps.positionalPostings(corpus, "doc_id", "text")
    val hits = SearchOps.phraseSearch(postings, Seq("the", "quick", "brown"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 0L), (1L, 5L), (3L, 0L)))

    // single-term degenerate form = that term's postings
    val one = SearchOps.phraseSearch(postings, Seq("fox"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == Set((1L, 3L), (3L, 3L), (4L, 3L), (5L, 4L)))
  }

  test("rm3Expand: feedback terms mined, weighted, and reach new docs") {
    // docs 1-3 match the query and all talk about 'coffee'; doc 10
    // never mentions the query but is pure 'coffee' — RM3 must pull it
    // into the final ranking through the expansion term.
    val docs = Seq(
      (1L, "query term coffee coffee beans"),
      (2L, "query term coffee roast"),
      (3L, "query coffee beans beans"),
      (10L, "coffee coffee coffee beans beans"),
      (11L, "nothing relevant at all here"),
      (12L, "an unrelated document entirely")).toDF("doc_id", "text")
    val out = SearchOps.rm3Expand(docs, col("doc_id"), col("text"),
      Seq("query"), fbDocs = 3, fbTerms = 2, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("orig_micro"), r.getAs[Long]("exp_micro"))).toMap
    // expansion terms are coffee (tf 4) and beans (tf 3) from docs 1-3;
    // weights 4*1e6/7 and 3*1e6/7
    val wCoffee = 4L * 1000000L / 7L
    val wBeans = 3L * 1000000L / 7L
    assert(out.contains(10L), s"expansion must reach doc 10: $out")
    assert(out(10L)._1 == 0L) // no query term
    assert(out(10L)._2 == 3L * wCoffee + 2L * wBeans)
    assert(out(1L)._2 == 2L * wCoffee + 1L * wBeans)
    // never-relevant docs stay out
    assert(!out.contains(11L) && !out.contains(12L))
    // 'term' (len 4, tf 2) lost the tf tie-ranking to beans (tf 3);
    // the query term itself was excluded from expansion
    assert(out(2L)._2 == 1L * wCoffee + 0L)
  }

  test("rboMin: identical rankings sum the full literal table, disjoint " +
    "score 0, and a hand case matches the per-item suffix lookup") {
    import spark.implicits._
    val k = 5
    val suffix = SearchOps.rboSuffixMicro(k, 0.9)
    // suffix sums must be decreasing and start at ~RBO_min of a
    // perfect-overlap depth-1 item
    assert(suffix == suffix.sorted.reverse && suffix.last > 0L)
    val ids = (1L to k.toLong)
    val rank = ids.map(i => (i, i)).toDF("id", "pos")
    val same = SearchOps.rboMin(rank, rank, k).collect().head
    assert(same.getAs[Long]("n_common") == k.toLong)
    assert(same.getAs[Long]("rbo_min_micro") == suffix.sum,
      "identical rankings: every item contributes its own-depth suffix")

    val other = ids.map(i => (i + 100L, i)).toDF("id", "pos")
    val disj = SearchOps.rboMin(rank, other, k).collect().head
    assert(disj.getAs[Long]("n_common") == 0L &&
      disj.getAs[Long]("rbo_min_micro") == 0L)

    // hand case: B reverses A; item at (pa, pb) contributes
    // suffix(max(pa,pb)) = suffix(max depth)
    val rev = ids.map(i => (i, k.toLong + 1 - i)).toDF("id", "pos")
    val rr = SearchOps.rboMin(rank, rev, k).collect().head
    val expect = (1 to k).map(pa => suffix(math.max(pa, k + 1 - pa) - 1)).sum
    assert(rr.getAs[Long]("rbo_min_micro") == expect)
    assert(rr.getAs[Long]("rbo_min_micro") < same.getAs[Long]("rbo_min_micro"))
  }
}
