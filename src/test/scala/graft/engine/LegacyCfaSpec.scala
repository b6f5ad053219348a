package graft.engine

import graft.SparkSpec

class LegacyCfaSpec extends SparkSpec {
  import spark.implicits._

  test("legacy fixed-grid cf: truncation indexing, clamp at 0, 0/1 guard") {
    // (lat, lon, cm_byte): flag = (byte & 6) >> 1; cloudy iff flag == 0
    val pixels = Seq(
      (0.0, 0.0, 0), //    idx (89, 179); byte 0 -> flag 0 -> cloudy
      (0.4, 0.4, 2), //    same cell (int cast truncates 89.9); flag 1 clear
      (-90.0, -180.0, 1), // negative idx clamped to (0, 0); flag 0 cloudy
      (45.2, -120.7, 6) // idx (134, 58); flag 3 clear
    ).toDF("lat", "lon", "cm_byte")
    val out = LegacyCfa.aggregate(spark, pixels)
    assert(out.count() == 180L * 360) // dense grid
    val m = out.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(m((89, 179)) == (2L, 1L, 0.5))
    assert(m((0, 0)) == (1L, 1L, 1.0))
    assert(m((134, 58)) == (1L, 0L, 0.0))
    assert(m((10, 10)) == (0L, 0L, 0.0)) // untouched cell: 0 / max(0,1)
  }
}
