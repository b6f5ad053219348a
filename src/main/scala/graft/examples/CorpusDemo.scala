package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, PrepOps, SamplingOps, TextOps}

/** End-to-end example of the training-data pipeline on the synthetic
  * documents table: quality/repetition filtering -> exact + near dedup ->
  * source mixture resampling -> epoch training order -> sharded parquet
  * write. Every stage is the gated operator the correctness gate checks;
  * this main just chains them the way a pretraining data job would.
  *
  * Run: `sbt "runMain graft.examples.CorpusDemo /root/testdata/sf0.01 /tmp/corpus_demo"`
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/corpus_demo")

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("corpus-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[corpus-demo] input: ${docs.count()} docs")

    // 1. row-local quality + repetition gate (zero shuffles)
    val filtered = docs
      .withColumn("__q", TextOps.qualityScore(col("text")))
      .withColumn("__rep", TextOps.dupNgramFrac(col("text"), 2))
      .filter(col("__q") >= 0.4 && col("__rep") <= 0.6)
      .drop("__q", "__rep")
    println(s"[corpus-demo] after quality/repetition filters: ${filtered.count()}")

    // 2. exact dedup on the normalized text (8-byte-hash shuffle keys)
    val exact = DedupOps.exactDedup(
      filtered, "doc_id", concat_ws(" ", TextOps.tokens(lower(col("text")))))
    println(s"[corpus-demo] after exact dedup: ${exact.count()}")

    // 3. near-dup clustering: keep each cluster's lowest-id representative
    val pairs = DedupOps.ngramJaccardPairs(exact, "doc_id", "text", k = 3, threshold = 0.5)
    val reps = graft.ops.GraphOps.componentsOf(exact, "doc_id", pairs, "id_a", "id_b")
      .filter(col("node") === col("component"))
      .select(col("node").as("doc_id"))
    val deduped = exact.join(reps, "doc_id")
    println(s"[corpus-demo] after near-dup clustering: ${deduped.count()}")

    // 4. mixture: upweight src0, downweight src1 (row-local replication)
    val mixed = SamplingOps.mixtureResample(
      deduped, col("source"), col("doc_id"), Map("src0" -> 2.0, "src1" -> 0.5))
    println(s"[corpus-demo] after mixture resampling: ${mixed.count()}")

    // 5. epoch-1 training order. Mixture COPIES share a doc_id, so the
    // order key must be the unique (doc, copy) id — otherwise the
    // join-back multiplies replicas.
    val uid = col("doc_id") * 16L + col("copy")
    val keyed = mixed.withColumn("__uid", uid)
    val ordered = PrepOps.trainingOrder(
      keyed, col("__uid"), TextOps.fingerprint(col("text")), shards = 4, salt = 1L)
    ordered.join(keyed.select(col("__uid").as("id"), col("doc_id"), col("text"), col("copy")), Seq("id"))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/epoch1")
    val written = spark.read.parquet(s"$outDir/epoch1").count()
    println(s"[corpus-demo] wrote $written sharded rows to $outDir/epoch1")
    spark.stop()
  }
}
