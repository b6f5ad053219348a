package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.ComponentStore

/** Throwaway phase-timing harness for the optimization round — times the
  * sub-steps of a composite query in one warm JVM. Not part of any gate.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the JVM on one full run
    time("warmup full q_components_refresh") {
      graft.SparkEntry.queries("q_components_refresh")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val store = java.nio.file.Files.createTempDirectory("graft_scr_").toString
    time("refresh base (even)") {
      ComponentStore.refresh(docs.filter(col("doc_id") % 2 === 0), store, "base")
    }
    time("refresh delta1 (odd)") {
      ComponentStore.refresh(docs.filter(col("doc_id") % 2 =!= 0), store, "delta1")
    }
    time("refresh delta1 re-run (idempotent no-op)") {
      ComponentStore.refresh(docs.filter(col("doc_id") % 2 =!= 0), store, "delta1")
    }
    time("assignment read + noop") {
      ComponentStore.assignment(spark, store)
        .write.format("noop").mode("overwrite").save()
    }

    // ---- sub-phase dissection of one base-segment refresh ----
    spark.catalog.clearCache()
    val even = docs.filter(col("doc_id") % 2 === 0)
    val store2 = java.nio.file.Files.createTempDirectory("graft_scr2_").toString
    val newIdx = graft.ops.DedupOps.shingleIndexHashed(
      even, "doc_id", "text", 3, None).cache()
    val newSizes = newIdx.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).cache()
    time("  A index build + cache (count)") { newIdx.count() }
    time("  B sizes (count)") { newSizes.count() }
    val edges = time("  C jaccard self-join pairs (plan only)") {
      val inter = newIdx.as("a").join(newIdx.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(newSizes.select(col("doc_id").as("u"), col("n").as("n_u")), "u")
        .join(newSizes.select(col("doc_id").as("v"), col("n").as("n_v")), "v")
        .filter(col("i").cast("double") /
          (col("n_u") + col("n_v") - col("i")) >= 0.2)
        .select(col("u"), col("v"))
    }
    time("  C2 jaccard pairs (count)") { edges.count() }
    val ids = even.select(col("doc_id").cast("long").as("doc_id"))
    val comp = time("  D componentsOf (build+materialize via count)") {
      val c = graft.ops.GraphOps.componentsOf(ids, "doc_id", edges, "u", "v")
        .select(col("node").as("doc_id"), col("component"))
      c.count(); c
    }
    time("  E assignment write (cut + coalesce(4) + overwrite)") {
      import graft.ops.Lineage.LineageOps
      comp.cutLineage().coalesce(4).write.mode("overwrite")
        .parquet(s"$store2/assignment")
    }
    time("  F shingles write (repartition(sb) + partitionBy(64))") {
      newIdx.withColumn("sb", pmod(col("sh"), lit(64L)))
        .repartition(col("sb"))
        .write.partitionBy("sb").mode("append").parquet(s"$store2/shingles")
    }
    time("  G sizes write (coalesce(4))") {
      newSizes.coalesce(4).write.mode("append").parquet(s"$store2/sizes")
    }
    spark.stop()
  }
}
