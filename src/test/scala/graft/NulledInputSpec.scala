package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** NULL-robustness: real corpora carry nulls — a decode failure leaves a
  * null text, a missing embedding, a null event payload. Every registered
  * query must execute against a copy of the schema where a deterministic
  * ~20% of each NULLABLE payload column is nulled (keys and join columns
  * stay intact — null keys are a data-contract matter, null payloads are
  * weather). Results may legitimately differ; crashing may not.
  */
class NulledInputSpec extends SparkSpec {

  /** payload columns to null per table (never ids / join keys / ts). */
  private val nullable: Map[String, Seq[String]] = Map(
    "documents" -> Seq("text", "lang", "source"),
    "embeddings" -> Seq("embedding"),
    "events" -> Seq("event_type", "value", "props"),
    "orders" -> Seq("o_comment", "o_orderpriority", "o_clerk"),
    "lineitem" -> Seq("l_comment", "l_shipinstruct", "l_shipmode"),
    "customer" -> Seq("c_comment", "c_mktsegment", "c_phone"),
    "supplier" -> Seq("s_comment", "s_phone"),
    "part" -> Seq("p_comment", "p_type", "p_container"),
    "nation" -> Seq("n_comment"),
    "region" -> Seq("r_comment"))

  private lazy val nulledDir: String = {
    val dir = Files.createTempDirectory("nulled_sf").toFile
    dir.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    nullable.foreach { case (t, cols) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val present = cols.filter(df.columns.contains)
      val out = present.foldLeft(df) { (d, c) =>
        // deterministic 20%: hash of the column name + a stable row key
        d.withColumn(c,
          when(pmod(xxhash64(lit(c), col(d.columns.head)), lit(5)) === 0, lit(null))
            .otherwise(col(c)))
      }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.getAbsolutePath
  }

  test("every registered query executes with ~20% null payloads") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, nulledDir).write.mode("overwrite").format("noop").save()
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} " +
            e.getMessage.linesIterator.take(2).mkString(" "))
        }
    }
    assert(broken.isEmpty,
      s"queries that crash on null payloads:\n  ${broken.mkString("\n  ")}")
  }
}
