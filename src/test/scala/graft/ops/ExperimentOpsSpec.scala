package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExperimentOpsSpec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of the portable affine arm split (SamplingOps.portableAffine
    * % 2) — the spec recomputes assignments independently of Catalyst.
    */
  private def arm(id: Long): Int = {
    val p = 999999937L
    (((id % p) * 2654435761L + 104729L) % p % 2L).toInt
  }

  test("armOf: deterministic, matches the JVM twin, both arms populated") {
    val ids = (0L until 200L).toDF("id")
    val got = ids.select(col("id"), ExperimentOps.armOf(col("id"), 2).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    (0L until 200L).foreach(i => assert(got(i) == arm(i), s"id $i"))
    assert(got.values.toSet == Set(0, 1), "both arms must be populated")
  }

  test("abTest: counts, rates, and z match a hand-computed fixture") {
    val units = (0L until 100L).map(i => (i, if (i % 3 == 0) 1L else 0L))
    val out = ExperimentOps.abTest(
      units.toDF("id", "conv"), col("id"), col("conv")).collect().head

    val (a, b) = units.partition { case (i, _) => arm(i) == 0 }
    val (na, nb) = (a.size.toLong, b.size.toLong)
    val (ca, cb) = (a.map(_._2).sum, b.map(_._2).sum)
    assert(out.getLong(0) == na && out.getLong(1) == nb)
    assert(out.getLong(2) == ca && out.getLong(3) == cb)
    val (ra, rb) = (ca.toDouble / na, cb.toDouble / nb)
    assert(out.getDouble(4) == ra && out.getDouble(5) == rb)
    val pool = (ca + cb).toDouble / (na + nb)
    val z = (ra - rb) / math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    assert(out.getDouble(6) == z, "z must be the exact IEEE chain")
  }

  test("abTest: degenerate pools (nobody / everybody converts) give NULL z") {
    Seq(0L, 1L).foreach { c =>
      val out = ExperimentOps.abTest(
        (0L until 50L).map(i => (i, c)).toDF("id", "conv"),
        col("id"), col("conv")).collect().head
      assert(out.isNullAt(6), s"constant conversion $c must yield NULL z")
    }
  }

  test("abTest: empty input yields one all-guarded row, no division error") {
    val out = ExperimentOps.abTest(
      Seq.empty[(Long, Long)].toDF("id", "conv"), col("id"), col("conv"))
      .collect().head
    assert(out.getLong(0) == 0L && out.getLong(1) == 0L)
    assert(out.isNullAt(4) && out.isNullAt(5) && out.isNullAt(6))
  }

  test("abTest: partitioning-invariant (1 vs 8 input partitions)") {
    val units = (0L until 300L).map(i => (i, (i % 7) / 5))
    val one = ExperimentOps.abTest(
      units.toDF("id", "conv").repartition(1), col("id"), col("conv"))
      .collect().head.toSeq
    val eight = ExperimentOps.abTest(
      units.toDF("id", "conv").repartition(8), col("id"), col("conv"))
      .collect().head.toSeq
    assert(one == eight)
  }
}
