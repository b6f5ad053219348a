package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Graceful behavior under HEAVY KEY SKEW — the dominant failure mode at
  * 100 TB: one hot user owning half the event stream, one order carrying
  * a mega-basket, boilerplate text duplicated across a third of the
  * corpus, one embedding repeated until an LSH bucket explodes. Every
  * registered query must either EXECUTE to completion or refuse through
  * one of the engine's EXPLICIT skew guards (`raise_error` caps like
  * `maxBucketSize` / `maxBasketSize` / `maxBucketsPerRow`, or a strict
  * contract `require`) — an uncontrolled OOM, analysis error, or NPE
  * fails the suite. Guards FIRING here is the design working: each names
  * its cap and the remediation, instead of letting a hot key take down
  * a stage at scale.
  */
class SkewedInputSpec extends SparkSpec {

  private lazy val skewDir: String = {
    val dir = Files.createTempDirectory("skewed_sf").toFile
    dir.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")

    // untouched dimensions
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders"))
      load(t).write.mode("overwrite").parquet(s"$dir/$t.parquet")

    // events: ~half the stream lands on ONE user
    load("events")
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(2)) === 0, lit(7L))
          .otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // lineitem: ~a quarter of all lines pile onto one order and one
    // supplier (a mega-basket and a hot join key)
    load("lineitem")
      .withColumn("l_orderkey",
        when(pmod(col("l_linenumber") + col("l_orderkey"), lit(4)) === 0,
          lit(1L)).otherwise(col("l_orderkey")))
      .withColumn("l_suppkey",
        when(pmod(col("l_orderkey"), lit(4)) === 1, lit(1L))
          .otherwise(col("l_suppkey")))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // documents: one source owns ~80%, and ~a third of the corpus is the
    // SAME boilerplate text (mass-duplicate hot shingles/buckets)
    load("documents")
      .withColumn("source",
        when(pmod(col("doc_id"), lit(5)) =!= 0, lit("src0"))
          .otherwise(col("source")))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(3)) === 0,
          lit("the same boilerplate text block repeated across the corpus"))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // embeddings: half the vectors are ONE identical point (degenerate
    // LSH bucket / zero-variance cluster)
    val e = load("embeddings")
    val hot = e.filter(col("vec_id") === 0).select(col("embedding"))
      .collect().head.getSeq[Float](0)
    e.withColumn("embedding",
        when(pmod(col("vec_id"), lit(2)) === 0,
          typedLit(hot)).otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir.getAbsolutePath
  }

  /** An exception is an ACCEPTED refusal iff it carries one of the
    * engine's named guard messages (raise_error surfaces as
    * USER_RAISED_EXCEPTION; strict-contract requires surface as
    * IllegalArgumentException with the contract text).
    */
  private def isGuard(e: Throwable): Boolean = {
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => s"${t.getClass.getName}: ${Option(t.getMessage).getOrElse("")}")
      .mkString(" | ")
    Seq("USER_RAISED_EXCEPTION", "maxBucketSize", "maxBasketSize",
      "maxBucketsPerRow", "unpaired", "exceeds", "outside").exists(msgs.contains)
  }

  test("every registered query survives heavy key skew or refuses via a named guard") {
    val refused = scala.collection.mutable.ArrayBuffer.empty[String]
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, skewDir).write.mode("overwrite").format("noop").save()
          None
        } catch {
          case e: Throwable if isGuard(e) => // explicit guard = designed
            refused += name; None
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} " +
            Option(e.getMessage).getOrElse("").linesIterator.take(2)
              .mkString(" "))
        }
    }
    // visibility: which caps actually fired (so a too-broad isGuard
    // pattern can't silently absorb a real regression unnoticed)
    info(s"guard-refused under skew: " +
      (if (refused.isEmpty) "(none — all queries completed)"
       else refused.mkString(", ")))
    assert(broken.isEmpty,
      s"queries that crash (not guard-refuse) under skew:\n  " +
        broken.mkString("\n  "))
  }
}
