package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{IvfOps, PqOps, SearchOps}

/** End-to-end retrieval example over the synthetic corpus: the OFFLINE
  * path builds a persisted IVF-PQ ANN index (coarse lists as hive
  * partition dirs, PQ codes inside); the ONLINE path serves a query from
  * the pruned index (only probed list directories are read), runs the
  * lexical BM25 leg, and fuses the two rankings with reciprocal-rank
  * fusion. Every stage is a gated operator (q_sim_ivfpq_literal,
  * q_bm25_search, q_hybrid_rrf); this main chains them the way a
  * retrieval service's build and query paths would.
  *
  * Run: `sbt "runMain graft.examples.SearchDemo /root/testdata/sf0.01 /tmp/search_demo"`
  */
object SearchDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/search_demo")

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("search-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // ---- offline: build + persist the ANN index (4 coarse lists, 4x8
    // PQ codebook over the 64-dim vectors — the quantizers a production
    // build trains offline, frozen here as the gated literals)
    val cents = IvfOps.literalCentroids(4, 64)
    val cb = PqOps.literalCodebook(4, 8, 16)
    val indexDir = s"$outDir/index"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val layout = PqOps.writeIndex(embs, indexDir, cents, cb)
    println(s"[search-demo] index: ${layout.size} lists at $indexDir")

    // ---- online: dense leg served from the PERSISTED index — only the
    // probed list directories are read (PartitionFilters)
    val query = embs.filter(col("vec_id") === 0)
    val dense = PqOps.searchIndex(indexDir, query, k = 20, cents, cb, nprobe = 2)
      .select(col("corpus_id").as("doc_id"), col("rank").as("r_vec"))

    // ---- online: lexical leg (corpus stats + row-local scoring + top-k
    // heaps — q_bm25_search's plan)
    val lexical = SearchOps.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("vector", "customer", "stream"), k = 20)
      .withColumn("r_text", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_text"))

    // ---- fuse with RRF (q_hybrid_rrf's arithmetic) and show the top 10
    val fused = dense.join(lexical, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_text")), lit(0.0))).as("rrf"),
        col("r_vec"), col("r_text"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
    println("[search-demo] hybrid top-10 (RRF of index-served dense + BM25):")
    fused.show(10, truncate = false)

    spark.stop()
  }
}
