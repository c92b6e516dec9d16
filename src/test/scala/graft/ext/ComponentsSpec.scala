package graft.ext

import graft.SparkSuite

class ComponentsSpec extends SparkSuite {
  import spark.implicits._

  test("connected components: chains, triangles, singletons") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} (singleton)
    val nodes = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L)).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("a", "b")
    val got = Components.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L))
  }

  test("empty graph yields empty result (no NPE on null sum)") {
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(nodes, edges).count() === 0L)
  }

  test("long path converges in O(log diameter) rounds (pointer jumping)") {
    val n = 30
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    // maxIter=8 ≪ diameter 29: only the pointer jump makes this converge —
    // plain neighbor-min propagation would need 29 rounds and fail here.
    val got = Components.connectedComponents(nodes, edges, maxIter = 8)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 0L), "one path = one component rooted at 0")
  }
}
