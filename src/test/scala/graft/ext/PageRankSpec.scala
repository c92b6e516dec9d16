package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[PageRank]] vs an in-memory reference implementation of the identical
  * integer recurrence, plus structural invariants (mass conservation up to
  * floor loss, determinism, symmetry).
  */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Serial reference: the same floor-division recurrence, driver-side. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val outd = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = edges.map(_._1).toSet
    val n = nodes.size.toLong
    val base = Scale / n
    val teleport = 15L * base / 100
    var rank = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / outd(s) }.sum
      }
      rank = in.map { case (d, s) => d -> (teleport + 85L * s / 100) }
    }
    rank
  }

  /** Path graph 1–2–3–4 symmetrized: end nodes have degree 1, middles 2. */
  private val pathEdges: Seq[(Long, Long)] =
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("matches the serial reference recurrence on a path graph") {
    val got = PageRank.run(pathEdges.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === reference(pathEdges, 5))
    // middles receive mass from two neighbors: strictly higher rank
    assert(got(2L) > got(1L) && got(3L) > got(4L))
    // symmetric graph, symmetric positions: exact ties
    assert(got(1L) === got(4L) && got(2L) === got(3L))
  }

  test("star graph: hub outranks leaves; reference agrees") {
    val star = (2L to 6L).flatMap(l => Seq((1L, l), (l, 1L)))
    val got = PageRank.run(star.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === reference(star, 5))
    assert((2L to 6L).forall(l => got(1L) > got(l)))
    assert((2L to 6L).map(got).distinct.size === 1)
  }

  test("mass is conserved up to deterministic floor loss") {
    val got = PageRank.run(pathEdges.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect()
    val total = got.map(_._2).sum
    // every division floors: total can only fall, and only slightly
    assert(total <= Scale)
    assert(total > Scale - Scale / 1000)
  }

  test("bit-identical across runs and partitionings") {
    val df = pathEdges.toDF("src", "dst")
    val a = PageRank.run(df.repartition(1), iters = 4).as[(Long, Long)].collect().toMap
    val b = PageRank.run(df.repartition(7), iters = 4).as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
