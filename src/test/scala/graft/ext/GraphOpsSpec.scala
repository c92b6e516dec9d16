package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Graph counting primitives ([[GraphOps]]) + the kNN-graph construction
  * ([[Similarity.knnGraph]]).
  */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  private def edges(e: (Long, Long)*) = e.toDF("src", "dst")

  test("mutualEdges keeps only reciprocated pairs, once, oriented src<dst") {
    val directed = edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (4L, 1L))
    val m = GraphOps.mutualEdges(directed).as[(Long, Long)].collect().toSet
    assert(m === Set((1L, 2L), (2L, 3L))) // 1→3 and 4→1 unreciprocated
  }

  test("triangles enumerates each closed wedge exactly once; counts per vertex") {
    // K4 on {1,2,3,4} (4 triangles) plus a pendant 4-5 (no new triangle)
    val und = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val tri = GraphOps.triangles(und).as[(Long, Long, Long)].collect().toSet
    assert(tri === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val per = GraphOps.triangleCounts(und).as[(Long, Long)].collect().toMap
    assert(per === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)) // K4: each vertex in C(3,2)=3
  }

  test("trianglesByDegree: identical triangle set, hub never pivots a wedge") {
    // STAR: hub 0 joined to leaves 1..20, plus ring edges closing a
    // triangle through the hub at every leaf pair (i, i+1). Id
    // orientation makes hub 0 the pivot of ALL C(20,2)=190 wedges; the
    // degree orientation must instead pivot each triangle at one of its
    // degree-3 leaves and give the hub out-degree 0.
    val star = (1L to 20L).map(l => (0L, l)) ++ (1L until 20L).map(l => (l, l + 1))
    val und = edges(star: _*)
    val byDeg = GraphOps.trianglesByDegree(und).as[(Long, Long, Long)].collect().toSet
    val byId = GraphOps.triangles(und).as[(Long, Long, Long)].collect().toSet
    assert(byDeg === byId, "orientation must not change the triangle set")
    assert(byDeg === (1L until 20L).map(l => (0L, l, l + 1)).toSet)
    // the skew claim itself: max out-degree after orientation is bounded
    // (hub deg 20 → all hub edges point INTO it; leaves keep ≤ 3)
    val outDeg = GraphOps.orientByDegree(und)
      .groupBy($"src").agg(count(lit(1)).as("d"))
      .agg(max($"d")).as[Long].head()
    assert(outDeg <= 3, s"wedge pivot fan-out must stay leaf-sized, got $outDeg")
    // K4 + pendant regression set from the id-oriented test, same answer
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    assert(GraphOps.trianglesByDegree(k4).as[(Long, Long, Long)].collect().toSet ===
      GraphOps.triangles(k4).as[(Long, Long, Long)].collect().toSet)
  }

  test("triangle-free graph yields zero triangles") {
    // C5 cycle: no triangles
    val und = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    assert(GraphOps.triangles(und).isEmpty)
    assert(GraphOps.triangleCounts(und).isEmpty)
  }

  test("label propagation: two cliques converge to their min-id labels") {
    // triangle {1,2,3} and triangle {10,11,12} joined by bridge 3-10
    def undirected(e: (Long, Long)*) =
      edges(e ++ e.map(_.swap): _*)
    val g = undirected((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val labels = LabelProp.run(g, 4).as[(Long, Long)].collect().toMap
    // each clique's majority pulls members to the min id in the clique
    assert(labels(1L) === 1L && labels(2L) === 1L)
    assert(Set(labels(11L), labels(12L)).forall(_ <= 10L))
    assert(labels.size === 6)
  }

  test("label propagation round is the majority-neighbor label with (count, -label) argmax") {
    // star: center 5 with neighbors 1,1-labeled after round 1?
    // direct check of one round: node 5's neighbors {1,2,3} all distinct
    // labels count 1 each → tiebreak smallest label = 1
    val g = edges((1L, 5L), (2L, 5L), (3L, 5L), (5L, 1L), (5L, 2L), (5L, 3L))
    val labels = LabelProp.run(g, 1).as[(Long, Long)].collect().toMap
    assert(labels(5L) === 1L)
    assert(labels(1L) === 5L && labels(2L) === 5L && labels(3L) === 5L)
  }

  test("knnGraph: per-src exactly min(k, cluster-1) edges, ranked by falling cosine") {
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 1.7 + d * 0.9)))
    }.toDF("id", "vec")
    val cents = vecs.filter($"id" % 10 === 0)
      .select($"id".as("cid"), $"vec".as("cvec"))
    val g = Similarity.knnGraph(Similarity.assignNearestCentroid(vecs, cents), 3)
      .select($"src", $"dst", $"sim", $"rk")
      .as[(Long, Long, Double, Long)].collect()
    val bySrc = g.groupBy(_._1)
    // ranks dense 1..n, sims non-increasing within src, no self-edges
    bySrc.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to sorted.length))
      assert(sorted.length <= 3)
      assert(sorted.toSeq.sliding(2).forall {
        case Seq(x, y) => x._3 >= y._3
        case _ => true
      })
      assert(rows.forall(_._2 != src))
    }
    // every vector with ≥1 cluster-mate appears as a src
    assert(bySrc.size === 30)
  }

  test("knnGraph top-1 matches brute-force argmax within the cluster") {
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(6)(d => math.cos(i * 2.3 + d)))
    }.toDF("id", "vec")
    val cents = vecs.filter($"id" % 7 === 0).select($"id".as("cid"), $"vec".as("cvec"))
    val assigned = Similarity.assignNearestCentroid(vecs, cents)
    val top1 = Similarity.knnGraph(assigned, 1)
      .select($"src", $"dst").as[(Long, Long)].collect().toMap
    // brute force within each cluster
    val rows = assigned.select($"id", $"cid", $"vec").as[(Long, Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.groupBy(_._2).values.foreach { members =>
      if (members.length > 1) members.foreach { case (id, _, v) =>
        val best = members.filter(_._1 != id)
          .map { case (oid, _, ov) => (oid, cos(v, ov)) }
          .minBy { case (oid, s) => (-s, oid) }._1
        assert(top1(id) === best, s"src=$id")
      }
    }
  }

  test("kCoreRounds equals brute-force peeling; cascade needs multiple rounds; fixpoint is stable") {
    // 5-clique (ids 0-4, all degree 4) + a 4-node path hanging off node 0
    // (5-6-7-8): at k=2 the path peels one node per round FROM THE END
    // (8 first, then 7, then 6, then 5) — a genuine multi-round cascade —
    // while the clique survives untouched.
    val und = (for (i <- 0 until 5; j <- (i + 1) until 5) yield (i.toLong, j.toLong)) ++
      Seq((0L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
    val both = und.toDF("src", "dst")
      .unionAll(und.map(_.swap).toDF("src", "dst"))
    def bruteCore(k: Int): Map[Long, Int] = {
      var adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
      var changed = true
      while (changed) {
        val drop = adj.collect { case (n, es) if es.size < k => n }.toSet
        changed = drop.nonEmpty
        adj = adj.collect { case (n, es) if !drop(n) => n -> (es -- drop) }
      }
      adj.map { case (n, es) => n -> es.size }
    }
    for (k <- Seq(2, 3, 4)) {
      val got = GraphOps.kCoreRounds(both, k, rounds = 8)
        .as[(Long, Long)].collect().map { case (n, d) => n -> d.toInt }.toMap
      assert(got === bruteCore(k), s"k=$k")
      assert(GraphOps.kCoreConverged(both, k, rounds = 8))
    }
    // too few rounds = honest partial peel, NOT converged: after 1 round
    // at k=2 only node 8 is gone, so 7 still shows degree 1
    val partial = GraphOps.kCoreRounds(both, 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(partial.contains(7L) && partial(7L) === 1L)
    assert(!GraphOps.kCoreConverged(both, 2, rounds = 1))
  }

  test("bfsHops: min hop distance, layer by layer, early-out, unreached absent") {
    // path 1-2-3-4-5 plus a branch 2-6, an isolated pair 8-9, and a
    // second seed 6 creating a shorter route to nothing new
    val und = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L), (8L, 9L))
    val both = und.unionAll(und.select($"dst".as("src"), $"src".as("dst")))
    def run(seeds: Seq[Long], hops: Int) =
      GraphOps.bfsHops(both, seeds.toDF("node"), hops)
        .as[(Long, Long)].collect().toMap
    // single seed: exact BFS layers; 8/9 unreached and absent
    assert(run(Seq(1L), 4) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 2L, 4L -> 3L, 5L -> 4L))
    // hop cap truncates honestly
    assert(run(Seq(1L), 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 2L))
    // multi-source: distance is the MIN over seeds
    assert(run(Seq(1L, 5L), 2) ===
      Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 6L -> 2L))
    // early-out past the diameter: extra hop budget changes nothing
    assert(run(Seq(8L), 10) === Map(8L -> 0L, 9L -> 1L))
    // a seed not in the edge list still reports itself at distance 0
    assert(run(Seq(42L), 3) === Map(42L -> 0L))
  }

  test("hits: mutual reinforcement ranks the shared authority first; invariant under layout; L1 ≈ scale") {
    // star-ish bipartite: part 100 bought by ALL three buyers, 101 by two,
    // 102 by one, 103 only by a lone buyer — authority must rank 100 >
    // 101 > 102; hub 1 (buys the most authoritative basket) tops hubs
    val edges = Seq(
      (1L, 100L), (1L, 101L), (1L, 102L),
      (2L, 100L), (2L, 101L),
      (3L, 100L),
      (4L, 103L)
    ).toDF("src", "dst")
    val scale = 1000000000L
    val (hubs, auths) = GraphOps.hits(edges, iters = 2, scale = scale)
    val a = auths.as[(Long, Long)].collect().toMap
    assert(a(100L) > a(101L) && a(101L) > a(102L),
      s"authority order must follow buyer breadth: $a")
    assert(a(102L) > 0 && a(103L) > 0)
    // L1 normalization: floor losses only — within |nodes| of scale
    assert(math.abs(a.values.sum - scale) <= a.size,
      s"authority mass must sum to ~scale: ${a.values.sum}")
    val h = hubs.as[(Long, Long)].collect().toMap
    assert(h(1L) > h(2L) && h(2L) > h(3L), s"hub order must follow basket authority: $h")
    // partition-layout invariance: the integer recurrence is exact
    val (h2, a2) = GraphOps.hits(edges.repartition(7), iters = 2, scale = scale)
    assert(a2.as[(Long, Long)].collect().toMap === a)
    assert(h2.as[(Long, Long)].collect().toMap === h)
  }
}
