package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): fuzzy-matched observation pairs ->
  * transitive entity clusters -> one GOLDEN RECORD per entity through
  * deterministic survivorship rules — the master-data-management step a
  * curation pipeline runs after ingesting the same real-world entity from
  * multiple dirty feeds.
  *
  * Composition, each stage the already-scale-audited operator:
  *   - matcher: [[JoinOps.fuzzySelfPairs]] — SymSpell deletion-neighborhood
  *     blocking + exact levenshtein <= 1 verify; candidates meet on 8-byte
  *     variant hashes, never all-pairs (the ORACLE is the all-pairs
  *     predicate join, so the gate proves blocking completeness);
  *   - clustering: [[GraphOps.connectedComponents]] — star contraction
  *     above the small-graph threshold, labels = min member id;
  *   - survivorship: one entity-keyed aggregate (algebraic min/max/sum —
  *     map-side combined) plus one PARTITIONED window for the winning
  *     observation (longest name, then lexicographically last, then lowest
  *     id — a total order, so reruns and engines agree on every tie).
  *
  * Two shuffles on entity_id regardless of corpus size; no all-pairs
  * stage anywhere. Over-linking chains (A~B, B~C pulling A,C together) are
  * a DATA property of transitive closure, not an implementation artifact:
  * callers control it through the observation key they match on.
  */
object EntityOps {

  /** Resolve entities among `records` and emit one golden row per entity:
    * `entity_id` (min member id), the caller's `aggs`, and the winning
    * observation's `nameCol` as `name` + `idCol` as `src_rid` (lineage:
    * which record the surviving name came from).
    */
  def goldenRecords(
      records: DataFrame, idCol: String, nameCol: String,
      aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one survivorship aggregate")
    val pairs = JoinOps.fuzzySelfPairs(records, idCol, nameCol)
      .select(col("id1"), col("id2"))
    val comp = GraphOps.connectedComponents(pairs, "id1", "id2")
    val tagged = records
      .join(comp, records(idCol).cast("long") === comp("node"), "left")
      .withColumn("entity_id",
        coalesce(col("component"), records(idCol).cast("long")))
      .drop("node", "component")
    // survivorship total order: most complete first (longest name), then
    // lexicographically last, then lowest record id — deterministic ties
    val w = Window.partitionBy(col("entity_id"))
      .orderBy(length(col(nameCol)).desc, col(nameCol).desc,
        col(idCol).cast("long"))
    val winner = tagged
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("entity_id").as("w_entity"),
        col(nameCol).as("name"), col(idCol).cast("long").as("src_rid"))
    tagged.groupBy(col("entity_id")).agg(aggs.head, aggs.tail: _*)
      .join(winner, col("entity_id") === col("w_entity"))
      .drop("w_entity")
  }
}
