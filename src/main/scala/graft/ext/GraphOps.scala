package graft.ext

import graft.plans.ScaleLint.BarrierSyntax

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-iterative graph primitives over edge DataFrames — the counting/
  * structure tier next to the iterative ones ([[Components]] reachability,
  * [[PageRank]] importance). Edges are plain (src, dst) rows; everything
  * here is equi-joins + aggregation, so Catalyst handles distribution and
  * AQE handles skew.
  */
object GraphOps {

  /** Undirected edge set of the MUTUAL pairs in a directed graph: keep
    * {u,v} iff both u→v and v→u exist, emitted once as (src < dst). The
    * standard symmetrization for kNN graphs (mutual-kNN keeps only
    * edges both endpoints agree on — the asymmetric hub edges that make
    * kNN graphs noisy drop out). One self-semi-join on the reversed edge
    * list: shuffle on (src, dst) pairs only. */
  def mutualEdges(directed: DataFrame): DataFrame = {
    val fwd = directed.select(col("src"), col("dst"))
    val rev = fwd.select(col("dst").as("src"), col("src").as("dst"))
    fwd.join(rev, Seq("src", "dst"), "left_semi")
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"))
  }

  /** Exact triangle count over an undirected edge set given as oriented
    * (src < dst) rows. Classic two-join enumeration: wedges a−b−c from
    * e(a,b)⋈e(b,c), closed against e(a,c) with a semi-join — each
    * triangle {a<b<c} counted exactly once by its orientation. Per-vertex
    * triangle participation comes out of the same enumeration
    * ([[triangleCounts]]).
    *
    * Scale shape: the wedge join is keyed on the shared vertex, the
    * closing check on the (a, c) pair — both plain shuffles AQE can
    * re-plan. The id-orientation here is the simplest deterministic
    * choice but is SKEW-FRAGILE: a power-law hub with a small id keeps
    * all its edges outgoing and pivots O(deg²) wedges. Production
    * counting should use [[trianglesByDegree]] — identical output set,
    * lower-degree-endpoint orientation, √|E|-bounded wedge fan-out. */
  def triangles(undirected: DataFrame): DataFrame = {
    val e1 = undirected.select(col("src").as("a"), col("dst").as("b"))
    val e2 = undirected.select(col("src").as("b"), col("dst").as("c"))
    e1.join(e2, Seq("b"))
      .join(undirected.select(col("src").as("a"), col("dst").as("c")),
        Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }

  /** Orient each undirected (src < dst) edge from its LOWER-(degree, id)
    * endpoint — the standard skew hardening for wedge enumeration: after
    * this orientation every vertex's OUT-degree is O(√|E|) (a vertex
    * with out-degree d has d neighbors of degree ≥ its own, so
    * d² ≤ Σdeg = 2|E|), which bounds the wedge join's per-key fan-out no
    * matter how skewed the degree distribution is. Ties break by id, so
    * the orientation is total and deterministic. Output carries the
    * head endpoint's degree (`dstdeg`) so the wedge stage can order
    * neighbor pairs without re-joining degrees. One degree aggregation +
    * two broadcast-or-shuffle equi-joins. */
  def orientByDegree(undirected: DataFrame): DataFrame = {
    val deg = undirected.select(col("src").as("node"))
      .unionAll(undirected.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val srcFirst = (col("sdeg") < col("ddeg")) ||
      (col("sdeg") === col("ddeg") && col("src") < col("dst"))
    undirected
      .join(deg.select(col("node").as("src"), col("deg").as("sdeg")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("ddeg")), Seq("dst"))
      .select(
        when(srcFirst, col("src")).otherwise(col("dst")).as("src"),
        when(srcFirst, col("dst")).otherwise(col("src")).as("dst"),
        when(srcFirst, col("ddeg")).otherwise(col("sdeg")).as("dstdeg"))
  }

  /** Exact triangle enumeration with DEGREE ORIENTATION — the same
    * output set as [[triangles]] (triples re-sorted to id order), but
    * wedges pivot on each triangle's lowest-(degree, id) vertex: in a
    * power-law graph the hot hub becomes a wedge TARGET (in-edges),
    * never a pivot, so no join key fans out past O(√|E|). In every
    * triangle x→y, x→z, y→z of the acyclic orientation, the wedge
    * (y, z) is enumerated once from x (ordered by the carried head
    * degree) and closed by the oriented y→z edge — the counting
    * identity is unchanged, only the orientation key differs. The
    * oriented edge set feeds three plan branches, so it is lazily
    * localCheckpointed (one materialization, no extra job). */
  def trianglesByDegree(undirected: DataFrame): DataFrame = {
    val o = orientByDegree(undirected).barrier()
    val e1 = o.select(col("src").as("x"), col("dst").as("b"), col("dstdeg").as("bdeg"))
    val e2 = o.select(col("src").as("x"), col("dst").as("c"), col("dstdeg").as("cdeg"))
    val wedges = e1.join(e2, Seq("x"))
      .filter(col("bdeg") < col("cdeg") ||
        (col("bdeg") === col("cdeg") && col("b") < col("c")))
    wedges
      .join(o.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"), "left_semi")
      .select(array_sort(array(col("x"), col("b"), col("c"))).as("t"))
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
  }

  /** Per-vertex triangle participation counts (vertices in no triangle
    * absent). */
  def triangleCounts(undirected: DataFrame): DataFrame = {
    val t = triangles(undirected)
    t.select(col("a").as("node"))
      .unionAll(t.select(col("b").as("node")))
      .unionAll(t.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** K-CORE after a FIXED number of peeling rounds: each round drops every
    * node whose current degree is < k (simultaneously — the parallel peel)
    * and the edges touching it. Once the peel reaches its fixpoint,
    * further rounds are no-ops, so with `rounds` ≥ the graph's peel depth
    * this IS the exact k-core; fixing the round count (the q130 PageRank
    * discipline) is what makes a cross-engine oracle possible — DuckDB
    * unrolls the same rounds as chained CTE stages, no recursion
    * semantics to align. Use [[kCoreConverged]] to check the fixpoint.
    *
    * Edges are BOTH-DIRECTION rows of an undirected graph (every {u,v} as
    * u→v and v→u), so degree is one groupBy(src). Scale shape per round:
    * one map-side-combinable degree aggregate + two node-keyed semi-joins;
    * each round's edge set is lazily pinned (iterative-lineage
    * discipline). State is only the shrinking edge list. */
  def kCoreRounds(bothDir: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = bothDir.select(col("src"), col("dst")).barrier()
    // EARLY-OUT at the fixpoint: a round that drops no edge implies every
    // later round is a no-op, so stopping produces the IDENTICAL output at
    // a fraction of the cost — `rounds` bounds the worst case (and the
    // oracle twin, which cannot early-out, stays equal because its extra
    // stages are no-ops on the same fixpoint). The per-round count reads
    // the edge list the round just materialized — no extra pass.
    var prev = e.count()
    var done = prev == 0
    for (_ <- 1 to rounds if !done) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      e = e.join(keep, Seq("src"), "left_semi")
        .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .barrier()
      val c = e.count()
      if (c == prev) done = true else prev = c
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** True iff one more peeling round would change nothing — i.e.
    * [[kCoreRounds]]' output at this round count is the exact k-core. */
  def kCoreConverged(bothDir: DataFrame, k: Int, rounds: Int): Boolean =
    kCoreRounds(bothDir, k, rounds).filter(col("degree") < k).isEmpty

  /** MULTI-SOURCE BFS out to `hops` hops: (node, dist) rows where `dist`
    * is the MINIMUM hop count from any seed (seeds themselves at 0;
    * unreached nodes absent). Frontier expansion, not node-state
    * iteration: each round touches only the edges leaving the CURRENT
    * frontier (one frontier-keyed semi-join), distincts the neighbor set,
    * and anti-joins the visited table — so per-round cost is O(edges
    * incident to the frontier), never O(|V|) state shuffled per round,
    * and a round that discovers nothing short-circuits the rest (the
    * kCoreRounds early-out discipline — safe because BFS layers are
    * monotone: an empty layer implies all later layers are empty).
    * `edges` are directed rows; pass both directions for an undirected
    * reach. Each round's frontier and the growing visited set are lazily
    * pinned so iteration lineage never re-derives a prior layer. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).barrier()
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).barrier()
    var frontier = visited.select(col("node"))
    var done = frontier.isEmpty
    for (h <- 1 to hops if !done) {
      val next = e
        .join(frontier.select(col("node").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(h.toLong))
        .barrier()
      visited = visited.unionAll(next).barrier()
      frontier = next.select(col("node"))
      done = next.isEmpty
    }
    visited
  }

  /** HITS hubs & authorities (Kleinberg, JACM'99) over a directed edge
    * list — the mutual-reinforcement twin of [[PageRank]]: authority(p) =
    * Σ hub(u) over in-edges, hub(u) = Σ authority(p) over out-edges, each
    * vector L1-normalized per half-round. Runs in the q130 integer-
    * micromass discipline so the scores are BIT-EXACT across engines and
    * partitionings: hubs start at scale/|src|, every half-round is one
    * src- or dst-keyed join + keyed sum, and normalization is
    * `x * scale div total` in exact Long arithmetic. Overflow contract:
    * each normalized vector sums to ≤ scale, so every raw sum ≤ scale and
    * every product ≤ scale² — the default 1e9 keeps scale² = 1e18 inside
    * int64 in BOTH engines (DuckDB would throw on overflow, Spark would
    * wrap silently; neither gets the chance). Per half-round cost is
    * O(|E|) — two keyed shuffles — and the 1-row totals broadcast.
    *
    * @return (hubs: (node, hub), authorities: (node, auth)) after `iters`
    *         full rounds; scores in units of `scale`⁻¹. */
  def hits(edges: DataFrame, iters: Int, scale: Long = 1000000000L)
      : (DataFrame, DataFrame) = {
    require(iters >= 1, "need at least one round")
    val e = edges.select(col("src"), col("dst")).distinct().barrier(eager = true)
    // one distinct-src pass serves both the count and the hub init (r18 —
    // the former plan ran the edge-sized distinct aggregation twice)
    val dsrc = e.select(col("src")).distinct().barrier(eager = true)
    val nSrc = dsrc.count()
    require(nSrc >= 1, "empty graph")
    var hubs = dsrc.withColumn("hub", lit(scale / nSrc))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val araw = e.join(hubs, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("araw"))
        .barrier() // feeds the total AND the normalization
      val ta = araw.agg(sum(col("araw")).as("ta"))
      auths = araw.crossJoin(broadcast(ta))
        .select(col("dst"), expr(s"(araw * ${scale}L) div ta").as("auth"))
        .barrier(eager = true)
      val hraw = e.join(auths, Seq("dst"))
        .groupBy(col("src")).agg(sum(col("auth")).as("hraw"))
        .barrier()
      val th = hraw.agg(sum(col("hraw")).as("th"))
      hubs = hraw.crossJoin(broadcast(th))
        .select(col("src"), expr(s"(hraw * ${scale}L) div th").as("hub"))
        .barrier(eager = true)
    }
    (hubs.select(col("src").as("node"), col("hub")),
      auths.select(col("dst").as("node"), col("auth")))
  }
}
