package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[LinkageOps.fsLink]]: scalar replay of the m/u weight algebra,
  * blocking completeness, degenerate-field NULLs, and weight ordering
  * (agreements strictly outrank disagreements).
  */
class LinkageOpsSpec extends SparkSpec {
  import spark.implicits._

  // (id, block, city, ztip)
  private val aRecs = Seq(
    (1L, 1L, "rome", 100L), (2L, 1L, "oslo", 200L),
    (3L, 2L, "rome", 100L), (4L, 2L, "kiel", 300L))
  private val bRecs = Seq(
    (11L, 1L, "rome", 100L), (12L, 1L, "oslo", 250L),
    (13L, 2L, "bern", 100L), (14L, 3L, "kiel", 300L))

  private def run() = LinkageOps.fsLink(
    aRecs.toDF("id", "blk", "city", "ztip"),
    bRecs.toDF("id", "blk", "city", "ztip"),
    "id", "id", blockCols = Seq("blk"), compareCols = Seq("city", "ztip"))
    .orderBy("a_id", "b_id").collect()

  test("blocking completeness: exactly the within-block cross product") {
    val got = run().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- aRecs; b <- bRecs; if a._2 == b._2
    } yield (a._1, b._1)).toSet
    assert(got === expected) // block 3 never pairs
  }

  test("weights replay the exact fixed-point m/u algebra") {
    val n = bRecs.size.toLong
    def ss(f: ((Long, Long, String, Long)) => Any): Long =
      bRecs.groupBy(f).map { case (_, g) => g.size.toLong }
        .map(c => c * c).sum
    def wa(ssf: Long) =
      SelectionOps.log2Fixed(950000L * n * n) -
        SelectionOps.log2Fixed(1000000L * ssf)
    def wd(ssf: Long) =
      SelectionOps.log2Fixed(50000L * n * n) -
        SelectionOps.log2Fixed(1000000L * (n * n - ssf))
    val (ssCity, ssZtip) = (ss(_._3), ss(_._4))
    val byPair = run().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    aRecs.foreach { a =>
      bRecs.filter(_._2 == a._2).foreach { b =>
        val (agC, agZ, w) = byPair((a._1, b._1))
        assert(agC === (if (a._3 == b._3) 1 else 0))
        assert(agZ === (if (a._4 == b._4) 1 else 0))
        val expected =
          (if (a._3 == b._3) wa(ssCity) else wd(ssCity)) +
            (if (a._4 == b._4) wa(ssZtip) else wd(ssZtip))
        assert(w === expected, s"pair ${(a._1, b._1)}")
      }
    }
  }

  test("full agreement outranks any disagreement; weights are calibrated log-odds") {
    val rows = run()
    val full = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
      .map(_.getLong(4))
    val partial = rows.filter(r => r.getInt(2) + r.getInt(3) < 2)
      .map(_.getLong(4))
    assert(full.nonEmpty && partial.nonEmpty)
    assert(full.min > partial.max)
    // agreement weights are positive (m >> u here), disagreement negative
    assert(full.min > 0L)
    assert(rows.filter(r => r.getInt(2) + r.getInt(3) == 0)
      .forall(_.getLong(4) < 0L))
  }

  test("a compare field constant across b yields NULL weight on disagreement") {
    val a = Seq((1L, 1L, "x"), (2L, 1L, "y")).toDF("id", "blk", "f")
    val b = Seq((11L, 1L, "x"), (12L, 1L, "x")).toDF("id", "blk", "f")
    val got = LinkageOps.fsLink(a, b, "id", "id", Seq("blk"), Seq("f"))
      .orderBy("a_id", "b_id").collect()
    // id=1 agrees with both (finite weight); id=2 disagrees (NULL)
    assert(got.filter(_.getLong(0) == 1L).forall(!_.isNullAt(3)))
    assert(got.filter(_.getLong(0) == 2L).forall(_.isNullAt(3)))
  }

  test("null-safe agreement: NULL vs NULL agrees, NULL vs value disagrees") {
    val a = Seq((1L, 1L, Option.empty[String]), (2L, 1L, Some("x")))
      .toDF("id", "blk", "f")
    val b = Seq((11L, 1L, Option.empty[String]), (12L, 1L, Some("y")))
      .toDF("id", "blk", "f")
    val got = LinkageOps.fsLink(a, b, "id", "id", Seq("blk"), Seq("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 11L)) === 1) // NULL <=> NULL
    assert(got((1L, 12L)) === 0)
    assert(got((2L, 11L)) === 0)
  }

  test("partition-count invariance") {
    val a = aRecs.toDF("id", "blk", "city", "ztip")
    val b = bRecs.toDF("id", "blk", "city", "ztip")
    def at(parts: Int) = LinkageOps.fsLink(
      a.repartition(parts), b.repartition(parts), "id", "id",
      Seq("blk"), Seq("city", "ztip"))
      .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    assert(at(1) === at(13))
  }
}
