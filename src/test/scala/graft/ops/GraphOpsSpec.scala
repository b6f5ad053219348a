package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** smallGraphEdges = -1 forces the distributed star loop; default uses
    * the adaptive driver union-find path. Tests run both.
    */
  private def components(pairs: Seq[(Long, Long)], threshold: Long = 4L << 20): Map[Long, Long] =
    GraphOps.connectedComponents(pairs.toDF("a", "b"), "a", "b",
      smallGraphEdges = threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** In-test oracle: sequential union-find. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // relabel every root to the component MINIMUM (find compresses to the
    // union-order root, which is already the min because we always hang
    // the larger root under the smaller); snapshot keys — find() mutates
    val ks = parent.keys.toVector
    ks.map(k => k -> find(k)).toMap
  }

  for ((label, thr) <- Seq("driver union-find" -> (4L << 20), "distributed star loop" -> -1L)) {

    test(s"[$label] a transitive chain collapses to one component labeled by its minimum") {
      val chain = (1L until 20L).map(i => (i, i + 1))
      val got = components(chain, thr)
      assert(got == (1L to 20L).map(_ -> 1L).toMap)
    }

    test(s"[$label] disjoint components keep separate minimal labels; self-loops ignored") {
      val got = components(Seq((5L, 3L), (3L, 9L), (20L, 21L), (30L, 30L)), thr)
      assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
    }

    test(s"[$label] matches sequential union-find on a pseudo-random graph") {
      // deterministic LCG so the test never flakes
      var seed = 12345L
      def next(n: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (math.abs(seed) % n).toInt }
      val pairs = (1 to 300).map(_ => (next(200).toLong, next(200).toLong)).filter(p => p._1 != p._2)
      assert(components(pairs, thr) == unionFind(pairs))
    }

    test(s"[$label] result is invariant under input partitioning") {
      val pairs = (1L until 50L).map(i => (i, i + 1))
      val df1 = pairs.toDF("a", "b").repartition(1)
      val df8 = pairs.toDF("a", "b").repartition(8)
      val r1 = GraphOps.connectedComponents(df1, "a", "b", smallGraphEdges = thr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val r8 = GraphOps.connectedComponents(df8, "a", "b", smallGraphEdges = thr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(r1 == r8)
    }
  }

  test("componentsOf labels edge-free nodes as singletons") {
    val nodes = (1L to 8L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = GraphOps.componentsOf(nodes, "id", pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("empty edge set yields empty components frame") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(empty, "a", "b").count() == 0)
  }
}
