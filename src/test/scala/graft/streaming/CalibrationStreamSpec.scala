package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ExperimentOps

class CalibrationStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed calibration bins == batch, shuffled multi-batch feed") {
    implicit val sqlCtx = spark.sqlContext
    // labels track the score only loosely; includes clamp cases
    val rows = (0 until 600).map { i =>
      val s = ((i * 37) % 13 - 1) * 100000L + (i % 3) * 33333L // some < 0, some > 1e6
      (i % 7 < 3, s)
    }
    val batch = ExperimentOps.calibrationBins(
      rows.toDF("y", "s"), col("y"), col("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val mem = MemoryStream[(Boolean, Long)]
    val q = CalibrationStream.bins(mem.toDS().toDF("y", "s"), col("y"), col("s"))
      .writeStream.format("memory").queryName("cal_bins")
      .outputMode("complete").start()
    try {
      // three deterministically shuffled, unevenly sized batches
      val shuffled = rows.sortBy { case (_, s) => (s * 2654435761L) % 997L }
      mem.addData(shuffled.take(50): _*)
      q.processAllAvailable()
      mem.addData(shuffled.slice(50, 400): _*)
      q.processAllAvailable()
      mem.addData(shuffled.drop(400): _*)
      q.processAllAvailable()
      val streamed = spark.table("cal_bins")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(streamed == batch)
      // state really is bin-bounded: 11 rows, bins 0..10 only
      assert(streamed.keys.forall(b => b >= 0L && b <= 10L))
      assert(streamed.size <= 11)
    } finally q.stop()
  }
}
