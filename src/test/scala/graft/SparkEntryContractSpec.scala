package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: the correctness gate is only as strong as
  * the oracle catalog, so a query silently missing its oracle entry (or an
  * oracle keyed to a nonexistent query) must fail THIS suite, not ship as
  * a weaker rows-only check.
  */
class SparkEntryContractSpec extends AnyFunSuite {

  /** The documented rows-only set — each inherently un-oracle-able
    * (xxhash64 / custom DSv2 source / float k-means training / HLL++
    * sketch / LSH tie-sets), each covered by a substantive ScalaTest.
    * Growing this set is a DELIBERATE act: add the justification to
    * COVERAGE.md when you add a name here.
    */
  private val rowsOnly = Set(
    "q_dedup_minhash", "q_dedup_minhash_verified", "q_dedup_simhash",
    "q_sim_ivf_topk", "q_semdedup", "q_granule_source", "q_bpe_encode")

  test("every query is oracled or documented rows-only; no orphan oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    assert((q -- o) == rowsOnly,
      s"un-oracled queries drifted: got ${(q -- o).toSeq.sorted}")
  }

  test("no duplicate query names across RefQueries and PipelineQueries") {
    import graft.queries.{PipelineQueries, RefQueries}
    val dup = RefQueries.queries.keySet & PipelineQueries.queries.keySet
    assert(dup.isEmpty, s"duplicate names (later map wins silently): $dup")
    val dupO = RefQueries.oracleSql.keySet & PipelineQueries.oracleSql.keySet
    assert(dupO.isEmpty, s"duplicate oracle names: $dupO")
  }

  test("oracle SQL only references the driver's tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude but effective: every FROM/JOIN target must be a known table,
    // a CTE defined in the same statement, or a parenthesized subquery;
    // identifiers followed by '(' are table functions (range(...)), not
    // tables
    val ref = "(?i)(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z0-9_]*+)(?!\\s*\\()".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = "(?i)([a-zA-Z_][a-zA-Z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      ref.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(tables.contains(t) || ctes.contains(t),
          s"$name references unknown table '$t'")
      }
    }
  }
}
