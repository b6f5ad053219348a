package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("bitmapDistinct == count(DISTINCT) on grouped data; nulls skipped") {
    val rows = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", 63L), ("a", 64L),
      ("b", 0L), ("b", 0L), ("b", 1023L),
      ("c", null)
    ).toDF("g", "id")
    val got = rows.groupBy($"g")
      .agg(BitmapDistinct.bitmapDistinct($"id", 1024L).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 4L, "b" -> 2L, "c" -> 0L))
  }

  test("bitmapDistinct is layout-invariant (merge = word OR)") {
    val ids = (0L until 5000L).map(i => (i % 7, (i * i) % 4096))
    val one = ids.toDF("g", "id").repartition(1).groupBy($"g")
      .agg(BitmapDistinct.bitmapDistinct($"id", 4096L).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = ids.toDF("g", "id").repartition(16).groupBy($"g")
      .agg(BitmapDistinct.bitmapDistinct($"id", 4096L).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
    val exact = ids.toDF("g", "id").groupBy($"g")
      .agg(countDistinct($"id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == exact)
  }

  test("bitmapDistinct enforces the id domain contract") {
    val err = intercept[Exception] {
      Seq((1L, 4096L)).toDF("g", "id").groupBy($"g")
        .agg(BitmapDistinct.bitmapDistinct($"id", 4096L).as("n"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("outside [0, 4096)")),
      s"domain violation must surface: ${messages(err)}")
  }
}
