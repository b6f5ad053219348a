package graft

import java.nio.file.Files

/** Graceful degradation on EMPTY inputs: a 100 TB pipeline routinely
  * produces empty intermediate tables (a filter that matches nothing, a
  * day with no granules, a source with no documents). Every registered
  * query must ANALYZE AND EXECUTE against a zero-row copy of the whole
  * schema — returning an empty (or small constant) result, never
  * throwing. Driver-side training loops (k-means seeds, BPE vocab,
  * budget thresholds) are the classic offenders: `.collect()` on an
  * empty frame must yield an empty model, not an exception.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("empty_sf").toFile
    dir.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.getAbsolutePath
  }

  test("every registered query executes on a zero-row schema") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, emptyDir).write.mode("overwrite").format("noop").save()
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} " +
            e.getMessage.linesIterator.take(2).mkString(" "))
        }
    }
    assert(broken.isEmpty,
      s"queries that crash on empty input:\n  ${broken.mkString("\n  ")}")
  }
}
