package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal–Imieliński–Swami SIGMOD'93
  * semantics: support / confidence / lift over item pairs) — the classic
  * co-purchase analytics the reference's event/experiment suite stops
  * short of.
  *
  * Scale shape: baskets are SMALL (an order has a handful of lines) while
  * the basket table is HUGE, so pair generation must be row-local — ONE
  * basket-keyed shuffle builds the distinct item set per basket
  * (`collect_set`), then the quadratic-in-basket-size pair explosion
  * happens inside the row, and pair counts collapse through a map-side-
  * combined aggregate over at most |items|² keys. The self-join
  * alternative (basket-keyed equi-join of the item table with itself)
  * shuffles the corpus TWICE and materializes the same pairs as join
  * rows — strictly worse. Item and basket totals reuse the same
  * distinct-items frame; the final rule join runs on vocabulary-sized
  * frames (auto-broadcast).
  *
  * All counts are exact longs; `confidence` and `lift` are single IEEE
  * divisions of exact integers — bit-identical on any engine.
  */
object AssocOps {

  /** Directional rules `antecedent -> consequent` with
    * `pair_cnt >= minSupportCnt`. Input rows are (basket, item)
    * occurrences (duplicates fine — support is per-basket). Returns
    * (antecedent, consequent, pair_cnt, ante_cnt, cons_cnt, n_baskets,
    * confidence, lift).
    */
  def assocRules(
      occurrences: DataFrame,
      basketCol: Column,
      itemCol: Column,
      minSupportCnt: Long): DataFrame = {
    require(minSupportCnt >= 1, s"minSupportCnt must be >= 1, got $minSupportCnt")
    val distinctItems = occurrences
      .select(basketCol.as("basket"), itemCol.as("item"))
      .distinct()

    val itemCnt = distinctItems.groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
    val nBaskets = distinctItems.select(
      count_distinct(col("basket")).as("n_baskets"))

    // row-local pair explosion: items per basket, then (a, c) a != c
    val pairs = distinctItems
      .groupBy(col("basket"))
      .agg(collect_set(col("item")).as("items"))
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("c"))
      .filter(col("a") =!= col("c"))
      .groupBy(col("a"), col("c"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minSupportCnt)

    pairs
      .join(itemCnt.select(col("item").as("a"), col("cnt").as("ante_cnt")), Seq("a"))
      .join(itemCnt.select(col("item").as("c"), col("cnt").as("cons_cnt")), Seq("c"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("a").as("antecedent"),
        col("c").as("consequent"),
        col("pair_cnt"),
        col("ante_cnt"),
        col("cons_cnt"),
        col("n_baskets"),
        (col("pair_cnt").cast("double") / col("ante_cnt").cast("double"))
          .as("confidence"),
        ((col("pair_cnt") * col("n_baskets")).cast("double") /
          (col("ante_cnt") * col("cons_cnt")).cast("double")).as("lift"))
  }
}
