package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase-timing harness for the optimization round — times the
  * sub-steps of a composite query in one warm JVM. Not part of any gate.
  *
  * Current target: the SymSpell deletion-variant family
  * (q_fuzzy_join / q_entity_golden) — is the O(len²)-bytes variant
  * expression (len substring concats per name) or the
  * distinct+self-join shuffle the dominant cost? ("Not yet optimized"
  * item: a rolling-hash expression is only worth building if the
  * expression dominates.)
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the JVM on one full run
    time("warmup full q_fuzzy_join") {
      noop(graft.SparkEntry.queries("q_fuzzy_join")(spark, dir))
    }

    val base = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long").as("__id"),
        col("c_name").as("__s"))
    val s = col("__s")
    def keyed = base.select(col("__id"),
      explode(array_union(
        array(xxhash64(s)),
        when(length(s) > 0,
          transform(sequence(lit(1), length(s)),
            i => xxhash64(concat(
              s.substr(lit(1), i - 1),
              s.substr(i + 1, length(s) - i)))))
          .otherwise(array().cast("array<bigint>")))).as("__vh"))

    for (rep <- 1 to 3) {
      spark.catalog.clearCache()
      time(s"rep$rep A variant expression only (explode+hash, map-only noop)") {
        noop(keyed)
      }
      time(s"rep$rep B + distinct (adds the dedup shuffle)") {
        noop(keyed.distinct())
      }
      time(s"rep$rep C + self-join on __vh + distinct (candidates)") {
        val k = keyed.distinct()
        noop(k.as("a").join(k.as("b"),
            col("a.__vh") === col("b.__vh") && col("a.__id") < col("b.__id"))
          .select(col("a.__id").as("id1"), col("b.__id").as("id2"))
          .distinct())
      }
      time(s"rep$rep D full fuzzySelfPairs (verify included)") {
        noop(graft.ops.JoinOps.fuzzySelfPairs(
          spark.read.parquet(s"$dir/customer.parquet")
            .select(col("c_custkey"), col("c_name")),
          "c_custkey", "c_name"))
      }
    }
    spark.stop()
  }
}
