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
}
