package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.ops.{DedupOps, SimilarityOps}

/** Edge-case behavior: empty inputs, out-of-region data, degenerate
  * parameters. An engine that crashes on an empty partition does not
  * survive a 1000-executor run where some split is always empty.
  */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val grid = GridSpec(Region(0, 10, 0, 10), 5.0, 5.0)
  private val cfg = JobConfig(grid = grid, vars = Seq(VarSpec("v")))

  test("grid aggregation of an empty frame returns an empty grid") {
    val empty = Seq.empty[(Double, Double, String, Double)]
      .toDF("lat", "lon", "granule_id", "v")
    assert(GridAggregation.aggregate(empty, cfg).count() == 0)
    assert(GridAggregation.cloudFraction(
      empty.withColumn("cm_flag", lit(1)), cfg).count() == 0)
  }

  test("grid aggregation when every pixel is out of region") {
    val out = Seq((99.0, 99.0, "g", 1.0), (-5.0, 3.0, "g", 2.0))
      .toDF("lat", "lon", "granule_id", "v")
    assert(GridAggregation.aggregate(out, cfg).count() == 0)
  }

  test("all-null variable still yields the cell with zero counts") {
    val df = Seq[(Double, Double, String, java.lang.Double)](
      (1.0, 1.0, "g", null)).toDF("lat", "lon", "granule_id", "v")
    val r = GridAggregation.aggregate(df, cfg).collect().head
    assert(r.getLong(r.fieldIndex("v_Pixel_Counts")) == 0L)
    assert(r.isNullAt(r.fieldIndex("v_Minimum")))
    assert(r.isNullAt(r.fieldIndex("v_Mean")))
  }

  test("dedup pipelines on empty and single-doc corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DedupOps.ngramJaccardPairs(empty, "doc_id", "text", 3, 0.5).count() == 0)
    assert(DedupOps.simhash(empty, "doc_id", "text").count() == 0)
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(DedupOps.ngramJaccardPairs(one, "doc_id", "text", 3, 0.5).count() == 0)
    assert(DedupOps.exactDedup(one, "doc_id", col("text")).count() == 1)
    // doc shorter than k produces no shingles and no signature row
    val short = Seq((1L, "two words")).toDF("doc_id", "text")
    assert(DedupOps.minhashSignatures(short, "doc_id", "text", 3, 8).count() == 0)
  }

  test("top-k with k larger than the corpus returns the whole corpus ranked") {
    val vecs = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.bruteForceTopK(vecs.limit(1), vecs, k = 100)
    assert(out.count() == 2)
  }

  test("histogram of values entirely out of range is all zeros") {
    val df = Seq((1L, 99.0), (1L, -5.0)).toDF("cell", "v")
    val h = df.groupBy($"cell")
      .agg(graft.agg.HistogramFunctions.histogram1d($"v", Seq(0.0, 1.0, 2.0)).as("h"))
      .collect().head.getSeq[Long](1)
    assert(h == Seq(0L, 0L))
  }

  test("asofJoin with an empty right side keeps every left row with nulls") {
    import graft.ops.JoinOps
    val l = Seq((1L, 7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "k", "lts")
    val r = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("k", "rts", "v")
    val out = JoinOps.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("v")).collect()
    assert(out.length == 1 && out.head.isNullAt(3) && out.head.isNullAt(4))
  }

  test("rangeJoin handles negative domains (floor semantics below zero)") {
    import graft.ops.JoinOps
    val points = Seq((1L, -5L), (2L, -1L), (3L, 0L), (4L, 3L)).toDF("pid", "p")
    val ranges = Seq((10L, -6L, 0L), (11L, -1L, 4L)).toDF("rid", "s", "e")
    val got = JoinOps.rangeJoin(points, ranges, "p", "s", "e", bucketWidth = 4)
      .select($"pid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // naive truth: -5,-1 in [-6,0); -1,0,3 in [-1,4)
    assert(got == Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L)))
  }

  test("chunkTokens with zero overlap partitions tokens exactly") {
    import graft.ops.PrepOps
    val docs = Seq((1L, (1 to 7).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = PrepOps.chunkTokens(docs, "doc_id", "text", chunkSize = 3, overlap = 0)
      .orderBy($"chunk_idx").collect().map(r => (r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("t1 t2 t3", 3L), ("t4 t5 t6", 3L), ("t7", 1L)))
  }

  test("packGreedy: a doc longer than the budget still lands in exactly one pack") {
    import graft.ops.PrepOps
    val docs = Seq(
      (1L, (1 to 100).map(_ => "w").mkString(" ")), // 100 tokens >> budget 10
      (9L, "w w w")).toDF("doc_id", "text")
    val out = PrepOps.packGreedy(docs, "doc_id", "text", budgetTokens = 10, buckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 0L && out(9L) == 10L) // 100/10 = pack 10 for the next doc
  }

  test("connectedComponents handles a long chain through the distributed path") {
    import graft.ops.GraphOps
    // 400-node chain: worst case for min-label propagation (400 rounds);
    // star contraction converges in O(log n) — this also guards maxRounds
    val chain = (1L until 400L).map(i => (i, i + 1)).toDF("a", "b")
    val got = GraphOps.connectedComponents(chain, "a", "b", smallGraphEdges = -1)
      .agg(countDistinct($"component"), count(lit(1))).collect().head
    assert(got.getLong(0) == 1L && got.getLong(1) == 400L)
  }

  test("text ops survive empty, whitespace-only and multibyte text") {
    import graft.ops.TextOps
    val weird = Seq(
      (1L, ""), (2L, "   \t  \n "), (3L, "héllo wörld ünïcode"),
      (4L, "a"), (5L, "日本語 テキスト です")).toDF("doc_id", "text")
    val out = weird.select($"doc_id",
      TextOps.tokenCount($"text").as("n"),
      TextOps.tokenEstimate($"text").as("est"),
      TextOps.fingerprint($"text").as("fp"),
      TextOps.langId($"text").as("lang"),
      TextOps.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 0 && out(2L).getInt(1) == 0)
    assert(out(1L).getLong(3) == 0L, "empty text fingerprints to 0")
    assert(out(3L).getInt(1) == 3 && out(5L).getInt(1) == 3)
    assert(out.values.forall(r => r.getDouble(5) >= 0 && r.getDouble(5) <= 1))
    // multibyte fingerprints differ (code-point walk, not byte walk)
    assert(out(3L).getLong(3) != out(5L).getLong(3))
  }

  test("mixtureResample and trainingOrder on an empty frame return empty") {
    import graft.ops.{PrepOps, SamplingOps}
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SamplingOps.mixtureResample(
      empty, $"text", $"doc_id", Map("x" -> 2.0)).count() == 0)
    assert(PrepOps.trainingOrder(empty, $"doc_id", lit(0), 4, 1L).count() == 0)
  }

  test("bm25TopK: absent terms yield zero matches; k > corpus returns all matches") {
    import graft.ops.SearchOps
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    assert(SearchOps.bm25TopK(docs, $"doc_id", $"text", Seq("zzz"), 5).count() == 0)
    val all = SearchOps.bm25TopK(docs, $"doc_id", $"text", Seq("beta"), 99)
    assert(all.count() == 2)
  }

  test("incrementalDedup with an empty corpus keeps the whole batch") {
    val batch = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val kept = DedupOps.incrementalDedup(
      batch, emptyCorpus, "doc_id", "text", $"text", k = 3, threshold = 0.5)
    assert(kept.count() == 2)
  }
}
