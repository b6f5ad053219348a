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

  test("knBigramTable == the scalar Kneser-Ney replica") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"),
      (4L, "a cat sat")).toDF("doc_id", "text")
    val out = LmOps.knBigramTable(docs, col("text"), 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // scalar replica
    val pairs = Seq(("the", "cat"), ("cat", "sat"), ("the", "cat"),
      ("cat", "ran"), ("the", "dog"), ("dog", "sat"), ("a", "cat"),
      ("cat", "sat"))
    val cvw = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cv = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1pV = cvw.keys.toSeq.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1pW = cvw.keys.toSeq.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n1pp = cvw.size.toLong
    assert(out.size == cvw.size)
    cvw.foreach { case (p @ (v, w), c) =>
      val r = out(p)
      assert(r.getAs[Long]("c_vw") == c, s"c_vw $p")
      assert(r.getAs[Long]("c_v") == cv(v), s"c_v $p")
      assert(r.getAs[Long]("n1p_v") == n1pV(v), s"n1p_v $p")
      assert(r.getAs[Long]("n1p_w") == n1pW(w), s"n1p_w $p")
      val num = math.max(4 * c - 3, 0L) * n1pp + 3 * n1pV(v) * n1pW(w)
      val den = 4 * cv(v) * n1pp
      assert(r.getAs[Double]("p_kn") == num.toDouble / den.toDouble, s"p $p")
    }
    // probabilities over each context sum below 1 (mass reserved for
    // unseen continuations) and above the pure-backoff floor
    val theMass = out.collect { case ((v, _), r) if v == "the" =>
      r.getAs[Double]("p_kn") }.sum
    assert(theMass > 0.5 && theMass < 1.0, s"the-mass $theMass")
  }
}
