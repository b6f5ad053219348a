package graft

import graft.ops.SimilarityOps

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot / hist1d / hist2d are callable from SQL text") {
    GraftFunctions.registerAll(spark)

    val dot = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(dot == 11.0)

    Seq((1L, 0.5, 3.0), (1L, 1.5, 12.0), (2L, 0.7, 8.0))
      .toDF("cell", "v", "y").createOrReplaceTempView("px")
    val h = spark.sql(
      "SELECT cell, hist1d(v, array(0.0D, 1.0D, 2.0D)) AS h FROM px GROUP BY cell")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(h(1L) == Seq(1L, 1L) && h(2L) == Seq(1L, 0L))

    val h2 = spark.sql(
      """SELECT cell, hist2d(v, y, array(0.0D, 1.0D, 2.0D), array(0.0D, 5.0D, 15.0D)) AS h
        |FROM px GROUP BY cell""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Seq[Long]](1)).toMap
    assert(h2(1L) == Seq(Seq(1L, 0L), Seq(0L, 1L)))

    // SQL and Column API agree
    val viaCol = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
      .select(SimilarityOps.dot($"a", $"b")).as[Double].head()
    assert(viaCol == 11.0)
  }

  test("shingle_minhash / shingle_hashes / sorted_intersect_count from SQL text") {
    GraftFunctions.registerAll(spark)
    val sig = spark.sql(
      "SELECT shingle_minhash(array('a','b','c','d'), 2, 4) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 4)
    // set semantics: shingle multiplicity does not change the signature
    val sig2 = spark.sql(
      "SELECT shingle_minhash(array('a','b','a','b'), 2, 4) AS s")
      .collect().head.getSeq[Long](0)
    val sig3 = spark.sql(
      "SELECT shingle_minhash(array('a','b'), 2, 4) AS s")
      .collect().head.getSeq[Long](0)
    // {ab, ba, ab} vs {ab}: different sets -> allowed to differ; but
    // {ab} minima are all present in the superset run's candidates
    assert(sig3.zip(sig2).forall { case (a, b) => b <= a })

    val n = spark.sql(
      """SELECT sorted_intersect_count(
        |  shingle_hashes(array('x','y','z'), 2),
        |  shingle_hashes(array('x','y','q'), 2)) AS n""".stripMargin)
      .collect().head.getLong(0)
    assert(n == 1L) // shared shingle: "x y"
  }

  test("lsh_planes_bucket / freq_sketch from SQL text") {
    GraftFunctions.registerAll(spark)
    import org.apache.spark.sql.functions.col
    // fused bucket from SQL equals the Column-API form
    val df = Seq((1L, Seq(0.5f, -1.0f, 2.0f, 0.25f))).toDF("id", "v")
    df.createOrReplaceTempView("lshv")
    val sqlBucket = spark.sql(
      "SELECT lsh_planes_bucket(v, 0, 8, 4) AS b FROM lshv")
      .collect().head.getLong(0)
    val apiBucket = df.select(
      graft.expr.VectorExprs.lshPlanesBucket(col("v"), 0, 8, 4).as("b"))
      .collect().head.getLong(0)
    assert(sqlBucket == apiBucket)

    // freq_sketch aggregates from SQL; below capacity it is exact
    spark.range(100).selectExpr("id % 5 AS k").createOrReplaceTempView("fsk")
    val est = spark.sql(
      "SELECT freq_sketch(k, 16) AS s FROM fsk")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == (0L until 5L).map(_ -> 20L).toMap)
  }

  test("topk_by_score / vec_sum_fixed from SQL text") {
    GraftFunctions.registerAll(spark)
    spark.range(100).selectExpr("id % 4 AS g", "CAST(id * 37 % 101 AS DOUBLE) AS s", "id")
      .createOrReplaceTempView("tks")
    val top = spark.sql(
      "SELECT g, topk_by_score(s, id, 3) AS t FROM tks GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    // oracle for group 0: ids 0,4,...,96 scored id*37%101, best 3
    val expect0 = (0L until 100L by 4).map(i => (i * 37 % 101).toDouble -> i)
      .sortBy { case (s, i) => (-s, i) }.take(3)
    assert(top(0L) == expect0)

    Seq((1L, Seq(1.5f, -0.25f)), (1L, Seq(0.5f, 1.0f))).toDF("g", "v")
      .createOrReplaceTempView("vsf")
    val vs = spark.sql(
      "SELECT vec_sum_fixed(v, 1000000) AS s FROM vsf")
      .collect().head.getSeq[Long](0)
    assert(vs == Seq(2000000L, 750000L))
    // decimal-literal scale (how SQL users naturally write it) and
    // non-BIGINT ids through topk_by_score must both work (the id keeps
    // its input type — INT stays INT, STRING stays STRING)
    val vsDec = spark.sql(
      "SELECT vec_sum_fixed(v, 1000000.0) AS s FROM vsf")
      .collect().head.getSeq[Long](0)
    assert(vsDec == Seq(2000000L, 750000L))
    val topInt = spark.sql(
      "SELECT topk_by_score(CAST(1.0 AS DOUBLE), CAST(5 AS INT), 1) AS t FROM vsf")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(topInt.map(r => (r.getDouble(0), r.getInt(1))) == Seq((1.0, 5)))
    val topStr = spark.sql(
      "SELECT topk_by_score(CAST(g AS DOUBLE), concat('doc_', g), 2) AS t FROM vsf")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(topStr.map(r => (r.getDouble(0), r.getString(1))) == Seq((1.0, "doc_1")))
  }

  test("rolling_fingerprint / token_set_hits / subword_estimate from SQL text") {
    GraftFunctions.registerAll(spark)
    val fp = spark.sql("SELECT rolling_fingerprint('ab') AS f").as[Long].head()
    assert(fp == (97L * 31 + 98) % 1000000007L)
    val hits = spark.sql(
      "SELECT token_set_hits(array('a','b','a','c'), array('a','c')) AS h")
      .collect().head.getInt(0)
    assert(hits == 3)
    val est = spark.sql(
      "SELECT subword_estimate(array('a','abcde')) AS e").as[Long].head()
    assert(est == 3L) // 1 + 2
  }

  test("hilbert_index from SQL text matches the reference walk") {
    GraftFunctions.registerAll(spark)
    val d = spark.sql("SELECT hilbert_index(5, 11, 4) AS d").as[Long].head()
    assert(d == graft.expr.HilbertIndex.xy2d(4, 5L, 11L))
    // int columns cast through the lng() guard, null propagates
    val rows = spark.sql(
      "SELECT hilbert_index(x, y, 6) AS d FROM VALUES " +
        "(CAST(3 AS INT), CAST(7 AS INT)), (NULL, CAST(1 AS INT)) t(x, y)")
      .collect()
    assert(rows(0).getLong(0) == graft.expr.HilbertIndex.xy2d(6, 3L, 7L))
    assert(rows(1).isNullAt(0))
  }

  test("bloom_bit_pos / splitmix_hash from SQL text match the family") {
    GraftFunctions.registerAll(spark)
    def refMix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val r = spark.sql(
      "SELECT bloom_bit_pos(CAST(42 AS BIGINT), 1, 4096) AS p, " +
        "splitmix_hash(CAST(42 AS BIGINT), 0) AS h").head()
    assert(r.getInt(0) == ((refMix(42L * 2654435761L + 1) >>> 1) % 4096).toInt)
    assert(r.getLong(1) == refMix(42L * 2654435761L))
    // null key propagates through both
    val n = spark.sql(
      "SELECT bloom_bit_pos(CAST(NULL AS BIGINT), 0, 64) AS p, " +
        "splitmix_hash(CAST(NULL AS BIGINT), 0) AS h").head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("GraftExtensions wires the SQL surface (builder route + config-string loadability)") {
    // the production `spark.sql.extensions=graft.GraftExtensions` route
    // loads the class BY NAME through a zero-arg constructor — pin that
    // contract (a rename or lost no-arg ctor would ship silently: the
    // shared-context suite cannot exercise the string end to end, since
    // the conf is only read when a session creates its own context)
    val byName = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    byName(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
    // build a sibling session over the same SparkContext with the
    // extensions config — the zero-code-changes integration path.
    // Clear BOTH active and default sessions: getOrCreate checks the
    // thread-active one first and would silently reuse the shared
    // extension-less session (making this test vacuous whenever an
    // earlier test registered the functions programmatically).
    val prev = org.apache.spark.sql.SparkSession.getDefaultSession
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      // withExtensions, NOT the "spark.sql.extensions" config string: the
      // string is read from the SparkContext conf, so over the suite's
      // pre-existing context it silently never applies (the config-string
      // route works when the session creates the context — production).
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      assert(s2 ne spark, "must be a fresh session, not the shared one")
      val dot = s2.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(dot == 11.0)
      import s2.implicits._
      Seq((1L, 0.5), (1L, 1.5)).toDF("cell", "v").createOrReplaceTempView("px_ext")
      val h = s2.sql(
        "SELECT hist1d(v, array(0.0D, 1.0D, 2.0D)) AS h FROM px_ext GROUP BY cell")
        .collect().head.getSeq[Long](0)
      assert(h == Seq(1L, 1L))
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      prev.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }

  test("weight-table and BPE functions work from SQL text") {
    GraftFunctions.registerAll(spark)
    val m = spark.sql(
      "SELECT token_weight_sum(array('a', 'b', 'a'), array('a', 'x'), " +
        "array(CAST(5 AS BIGINT), CAST(9 AS BIGINT))) AS m")
      .collect().head.getLong(0)
    assert(m == 10L) // a + a, b unknown
    val s = spark.sql(
      "SELECT char_bigram_weight_sum('abab', array('ab', 'ba'), " +
        "array(CAST(3 AS BIGINT), CAST(7 AS BIGINT))) AS s")
      .collect().head.getLong(0)
    assert(s == 13L) // ab ba ab
    val p = spark.sql(
      "SELECT bpe_encode(array('aaab'), array('a', 'a'), array('a', 'b')) AS p")
      .collect().head.getSeq[String](0)
    assert(p == Seq("aa", "ab"))
  }

  test("zorder_key from SQL text equals the Column form") {
    GraftFunctions.registerAll(spark)
    val got = spark.sql("SELECT zorder_key(5, 3) AS z").collect().head.getLong(0)
    // x=101 on even bits -> 10001, y=011 on odd bits -> 001010 -> 27? compute:
    // interleave(5=101, 3=011): bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 27
    assert(got == 27L)
    val viaColumn = Seq((5L, 3L)).toDF("x", "y")
      .select(graft.ops.PrepOps.zorderKey($"x", $"y")).collect().head.getLong(0)
    assert(got == viaColumn)
  }

  test("fold_diacritics / log2_fixed / token_window_hashes from SQL text") {
    GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT fold_diacritics('déjà vu')")
      .head().getString(0) == "deja vu")
    // log2_fixed: exact on powers of two, NULL below domain, INT casts
    assert(spark.sql("SELECT log2_fixed(1024)").head().getLong(0) ==
      10L << 20)
    assert(spark.sql("SELECT log2_fixed(0)").head().isNullAt(0))
    // token_window_hashes: window 'a b' polynomial, literal k enforced
    val h = ((97L * 31 + 32) % 1000000007L * 31 + 98) % 1000000007L
    assert(spark.sql("SELECT token_window_hashes(array('a','b','c'), 2)")
      .head().getSeq[Long](0).head == h)
    // k must be plan-time foldable (a literal column ref is not;
    // length('xx') would constant-fold and pass, so use rand())
    val e = intercept[Exception] {
      spark.sql("SELECT token_window_hashes(array('a','b'), CAST(rand() AS INT) + 2)")
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("hist1d rejects non-literal edges") {
    GraftFunctions.registerAll(spark)
    Seq((1L, 0.5)).toDF("cell", "v").createOrReplaceTempView("px2")
    val e = intercept[Exception] {
      spark.sql("SELECT hist1d(v, array(v, 1.0D)) FROM px2 GROUP BY cell").collect()
    }
    assert(e.getMessage.contains("foldable") || e.getMessage != null)
  }
}
