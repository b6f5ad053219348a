package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an sf1.0-equivalent dataset by replicating the driver's sf0.1
  * tables `xN` (default 10) with per-replica key offsets — the scaling
  * harness behind the PERF.md sf0.1→sf1.0 sweep (a super-linear runtime
  * curve between the two is a plan bug the 2 000-row correctness gate
  * cannot see). Correctness gates NEVER run on this data; it exists only
  * to measure scaling exponents, and it is regenerated on demand (never
  * committed, never written under /root/testdata).
  *
  * Replication contract (replica r = 0 is the identity):
  *   - region/nation: fixed dimensions, copied once.
  *   - customer/supplier/part/orders/lineitem/events: every key column
  *     shifts by `r * (max(key)+1)` so referential integrity holds within
  *     each replica and key cardinality grows 10× (10× users, same time
  *     range — event windows densify, they don't multiply).
  *   - documents: doc_id shifts; for r>0 every whitespace token gets a
  *     `~r` suffix, so each replica is an independent sub-corpus — shingle
  *     document frequency and near-dup cluster sizes stay CONSTANT while
  *     doc count grows 10×, which is how a real corpus grows (replicating
  *     text verbatim would instead fuse clusters across replicas and
  *     manufacture a quadratic pair blowup no real 10× ingest has).
  *   - embeddings: vec_id shifts; the vector is circularly shifted by r
  *     dims (decorrelates replicas, preserving the coordinate
  *     distribution — verbatim copies would be exact cosine-1 neighbors
  *     and explode semantic-dedup pair counts unrealistically).
  *
  * Run: `sbt "runMain graft.examples.MakeScaledData /root/testdata/sf0.1
  * /tmp/sf1.0 10"`
  */
object MakeScaledData {

  def main(args: Array[String]): Unit = {
    val inDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/sf1.0"
    val n = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$inDir/$name.parquet")

    /** Cross-join with replicas 0..n-1 (worker-side explode — no driver
      * materialization), shifting each listed key by r*(max+1). */
    def replicate(df: DataFrame, keys: Seq[String]): DataFrame = {
      val strides = keys.map { k =>
        k -> (df.agg(max(col(k))).head.getLong(0) + 1L)
      }.toMap
      val exploded = df.withColumn("__r", explode(sequence(lit(0), lit(n - 1))))
      keys.foldLeft(exploded) { (d, k) =>
        d.withColumn(k, col(k) + col("__r").cast("long") * strides(k))
      }
    }

    def write(df: DataFrame, name: String, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] wrote $name x$n")
    }

    // entity NAMES must not replicate verbatim: a 10x corpus brings NEW
    // customers, not ten exact copies of each name — verbatim copies
    // inflate every name-blocking bucket 10x and manufacture a quadratic
    // candidate blowup no real ingest has (measured: q_fuzzy_join x13
    // before this fix, x~2.5 after)
    def tagName(c: String) = when(col("__r") === 0, col(c))
      .otherwise(concat(col(c), lit("~"), col("__r")))

    write(tbl("region"), "region", 1)
    write(tbl("nation"), "nation", 1)
    write(replicate(tbl("customer"), Seq("c_custkey"))
      .withColumn("c_name", tagName("c_name")).drop("__r"), "customer", 8)
    write(replicate(tbl("supplier"), Seq("s_suppkey"))
      .withColumn("s_name", tagName("s_name")).drop("__r"), "supplier", 4)
    write(replicate(tbl("part"), Seq("p_partkey")).drop("__r"), "part", 8)
    val ordStride = tbl("orders").agg(max(col("o_orderkey"))).head.getLong(0) + 1L
    write(replicate(tbl("orders"), Seq("o_orderkey", "o_custkey")).drop("__r"),
      "orders", 16)
    // lineitem reuses orders' orderkey stride so FK pairs stay aligned
    val li = tbl("lineitem")
      .withColumn("__r", explode(sequence(lit(0), lit(n - 1))))
    val liK = Seq("l_partkey" -> (tbl("part").agg(max(col("p_partkey")))
        .head.getLong(0) + 1L),
      "l_suppkey" -> (tbl("supplier").agg(max(col("s_suppkey")))
        .head.getLong(0) + 1L),
      "l_orderkey" -> ordStride)
    write(liK.foldLeft(li) { case (d, (k, s)) =>
      d.withColumn(k, col(k) + col("__r").cast("long") * s)
    }.drop("__r"), "lineitem", 32)
    write(replicate(tbl("events"), Seq("event_id", "user_id")).drop("__r"),
      "events", 32)

    val docs = replicate(tbl("documents"), Seq("doc_id"))
      .withColumn("text", when(col("__r") === 0, col("text")).otherwise(
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("~"), col("__r"))))))
      .withColumn("n_chars", length(col("text")))
      .drop("__r")
    write(docs, "documents", 32)

    val dims = tbl("embeddings")
      .agg(max(size(col("embedding")))).head.getInt(0)
    val emb = replicate(tbl("embeddings"), Seq("vec_id"))
      .withColumn("embedding", when(col("__r") === 0, col("embedding"))
        .otherwise(transform(sequence(lit(0), lit(dims - 1)), i =>
          element_at(col("embedding"),
            (pmod(i + col("__r"), lit(dims)) + 1).cast("int")))))
      .drop("__r")
    write(emb, "embeddings", 16)

    spark.stop()
  }
}
