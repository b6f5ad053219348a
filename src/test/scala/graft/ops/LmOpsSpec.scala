package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("char-bigram training counts match a hand computation") {
    // "_ab_ab_" -> _a ab b_ _a ab b_ ; "_ba_" -> _b ba a_
    val docs = Seq((1L, "ab ab"), (2L, "ba")).toDF("doc_id", "text")
    val counts = LmOps.trainCharBigrams(docs, col("text"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("_a" -> 2L, "ab" -> 2L, "b_" -> 2L,
      "_b" -> 1L, "ba" -> 1L, "a_" -> 1L))
  }

  test("ppm model and scores are exact integer arithmetic") {
    val docs = Seq((1L, "ab ab"), (2L, "ba")).toDF("doc_id", "text")
    val model = LmOps.ppmModel(LmOps.trainCharBigrams(docs, col("text")))
    // total = 9 bigrams; floor(2e6/9) = 222222, floor(1e6/9) = 111111
    assert(model("ab") == 222222L && model("ba") == 111111L)
    val scores = LmOps.scoreDocs(docs, col("doc_id"), col("text"), model)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc1: 6 bigrams all ppm 222222 -> sum 1333332, avg 222222
    // doc2: 3 bigrams all ppm 111111 -> sum 333333, avg 111111
    assert(scores(0) == ((1L, 6L, 1333332L, 222222L)))
    assert(scores(1) == ((2L, 3L, 333333L, 111111L)))
  }

  test("training is layout-invariant (integer counts merge in any order)") {
    val docs = (1L to 200L).map(i => (i, s"doc number $i with some shared text"))
      .toDF("doc_id", "text")
    val one = LmOps.ppmModel(LmOps.trainCharBigrams(docs.coalesce(1), col("text")))
    val many = LmOps.ppmModel(LmOps.trainCharBigrams(docs.repartition(7), col("text")))
    assert(one == many)
  }

  test("aggregate train path equals the explode+groupBy path, layout-invariant") {
    val docs = (1L to 300L).map(i => (i, s"Doc number $i; shared phrase & text!"))
      .toDF("doc_id", "text")
    val viaExplode = LmOps.ppmModel(LmOps.trainCharBigrams(docs, col("text")))
    val viaAgg1 = LmOps.trainModelPpm(docs.coalesce(1), col("text"))
    val viaAggN = LmOps.trainModelPpm(docs.repartition(7), col("text"))
    assert(viaAgg1 == viaExplode)
    assert(viaAggN == viaExplode)
  }

  test("out-of-vocabulary bigrams score 0 and empty text still has the sentinel bigram") {
    val model = Map("_a" -> 10L, "a_" -> 5L)
    val docs = Seq((1L, "a"), (2L, "zz"), (3L, "")).toDF("doc_id", "text")
    val got = LmOps.scoreDocs(docs, col("doc_id"), col("text"), model)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, 15L, 7L)))  // "_a_": _a + a_
    assert(got(1) == ((2L, 3L, 0L, 0L)))   // "_zz_": no hits
    assert(got(2) == ((3L, 1L, 0L, 0L)))   // "__": one bigram, no hit
  }

  test("classifier margin sums lexicon weights with multiplicity") {
    val w = Map("good" -> 2L, "bad" -> -3L)
    val docs = Seq((1L, "Good good BAD x"), (2L, "x y")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      TextOps.classifierMargin(col("text"), w).as("m"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L)))  // 2 + 2 - 3
    assert(got(1) == ((2L, 0L)))
  }
}
