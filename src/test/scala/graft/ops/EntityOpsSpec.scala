package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def golden(rows: Seq[(Long, String, Long)]) =
    EntityOps.goldenRecords(
      rows.toDF("rid", "obs_name", "acct"),
      "rid", "obs_name",
      Seq(count(lit(1)).as("n_members"), max($"acct").as("acct")))
      .collect()
      .map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("acct"),
          r.getAs[String]("name"), r.getAs[Long]("src_rid"))))
      .toMap

  test("clusters within edit distance 1 merge; distinct entities do not") {
    val out = golden(Seq(
      (1L, "acme corp xK29", 500L),   // entity A: exact
      (2L, "acme corp xK2", 0L),      //   one char deleted
      (3L, "acme corp xK299", 100L),  //   one char added
      (7L, "zenith ltd Q844", 900L),  // entity B: no neighbor within 1
      (9L, "orbital gmbh 55", 10L),   // entity C: singleton via chain gap
      (10L, "orbital gmbh 555", 20L)))
    assert(out.keySet == Set(1L, 7L, 9L))
    // A: three observations, longest name wins, max-completeness acct
    assert(out(1L) == ((3L, 500L, "acme corp xK299", 3L)))
    // B: singleton falls through the left join (no pair, no component)
    assert(out(7L) == ((1L, 900L, "zenith ltd Q844", 7L)))
    // C: 9 and 10 are distance 1 (one char added) -> merged under min id
    assert(out(9L) == ((2L, 20L, "orbital gmbh 555", 10L)))
  }

  test("survivorship tie-breaks are a total order (rerun-stable)") {
    // same length names inside one entity: lexicographically LAST wins,
    // and among identical names the LOWEST record id is the lineage
    val rows = Seq(
      (4L, "node-aa", 1L), (5L, "node-ab", 2L), (6L, "node-ab", 3L))
    val a = golden(rows)
    val b = golden(rows.reverse)
    assert(a == b)
    assert(a(4L) == ((3L, 3L, "node-ab", 5L)))
  }
}
