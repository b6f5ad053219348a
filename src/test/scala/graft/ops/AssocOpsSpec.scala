package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AssocOpsSpec extends SparkSpec {
  import spark.implicits._

  test("assocRules: hand-computed support/confidence/lift; dup occurrences collapse") {
    val occ = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"), // dup x must not double count
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y"),
      (5L, "x"), (5L, "y"), (5L, "z"))
      .toDF("bk", "item")
    val rules = AssocOps.assocRules(occ, $"bk", $"item", minSupportCnt = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))
      .toMap

    // N=5, cnt(x)=4, cnt(y)=4, cnt(z)=2; pairs xy=3, xz=2, yz=1 (filtered)
    assert(rules.keySet == Set(("x", "y"), ("y", "x"), ("x", "z"), ("z", "x")))
    assert(rules(("x", "y")) == (3L, 4L, 4L, 5L, 3.0 / 4, 15.0 / 16))
    assert(rules(("y", "x")) == (3L, 4L, 4L, 5L, 3.0 / 4, 15.0 / 16))
    assert(rules(("x", "z")) == (2L, 4L, 2L, 5L, 2.0 / 4, 10.0 / 8))
    assert(rules(("z", "x")) == (2L, 2L, 4L, 5L, 2.0 / 2, 10.0 / 8))
  }

  test("assocRules: lift above/below 1 separates positive and negative association") {
    // p co-occurs with q always; r avoids both
    val occ = (1L to 8L).flatMap { b =>
      if (b <= 4) Seq((b, "p"), (b, "q")) else Seq((b, "r"))
    }.toDF("bk", "item")
    val rules = AssocOps.assocRules(occ, $"bk", $"item", 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(7)).toMap
    // lift(p->q) = 4*8/(4*4) = 2 > 1; no (p,r) pair exists at all
    assert(rules(("p", "q")) == 2.0)
    assert(!rules.contains(("p", "r")))
  }
}
