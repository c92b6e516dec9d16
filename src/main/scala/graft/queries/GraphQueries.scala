package graft.queries

import graft.plans.ScaleLint.BarrierSyntax

import graft.{Q, QueryDsl}
import QueryDsl._
import graft.ext.{GraphOps, LabelProp, PageRank, Similarity}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over derived entity graphs ([[graft.ext
  * .PageRank]]); complements the reachability tier ([[graft.ext
  * .Components]]) with importance scoring.
  */
object GraphQueries {

  private val Scale = 1000000000000L
  private val Iters = 5
  private val PprIters = 4

  /** PageRank on the customer–supplier co-purchase graph: nodes are
    * customers (2k) and suppliers (2k+1), with both directions of an edge
    * for every (customer, supplier) pair connected by at least one
    * lineitem — the bipartite authority ranking ("which suppliers anchor
    * the purchase network"). Five damped power-method rounds in exact
    * BIGINT micromass arithmetic (see [[PageRank]] for why integer floor
    * arithmetic is what makes a cross-engine bit-exact oracle possible
    * for an iterative float-natured algorithm); the DuckDB twin unrolls
    * the same five iterations as plain CTE stages with `//` floor
    * division.
    *
    * Scale shape: the edge derivation is one fact-fact equi-join +
    * distinct (shuffle on orderkey, then on the pair); each iteration
    * shuffles only the two-column rank table, with map-side partial sums
    * onto dst. Top-20 with a unique node tiebreak plans as
    * TakeOrderedAndProject.
    */
  val q130PageRank: Q = Q(
    "q130_pagerank",
    (s, dir) => {
      val cs = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cnode"),
          (col("l_suppkey") * 2 + 1).as("snode"))
        .distinct()
      val edges = cs.select(col("cnode").as("src"), col("snode").as("dst"))
        .unionAll(cs.select(col("snode").as("src"), col("cnode").as("dst")))
      PageRank.run(edges, Iters, Scale)
        .select(col("node"),
          when(col("node") % 2 === 0, "customer").otherwise("supplier").as("kind"),
          expr("node div 2").as("key"), col("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
    },
    Some {
      val stages = (1 to Iters).map { i =>
        s"""r$i AS (
        SELECT e.dst AS node,
          CAST((SELECT tp FROM consts)
            + (85 * SUM(r${i - 1}.rank // d.outd)) // 100 AS BIGINT) AS rank
        FROM edges e
        JOIN r${i - 1} ON e.src = r${i - 1}.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      )"""
      }.mkString(", ")
      s"""
      WITH cs AS (
        SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ), edges AS (
        SELECT cnode AS src, snode AS dst FROM cs
        UNION ALL
        SELECT snode AS src, cnode AS dst FROM cs
      ), deg AS (
        SELECT src, COUNT(*) AS outd FROM edges GROUP BY src
      ), consts AS (
        SELECT CAST($Scale // COUNT(*) AS BIGINT) AS base,
          CAST(15 * ($Scale // COUNT(*)) // 100 AS BIGINT) AS tp
        FROM deg
      ), r0 AS (
        SELECT src AS node, (SELECT base FROM consts) AS rank FROM deg
      ), $stages
      SELECT node,
        CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        node // 2 AS key, rank
      FROM r$Iters
      ORDER BY rank DESC, node
      LIMIT 20
    """
    })

  /** The shared embedding→graph derivation: nearest-centroid assignment
    * (every 100th vector as centroid, the catalog's standard protocol)
    * feeding [[Similarity.knnGraph]]. */
  private def knn(s: org.apache.spark.sql.SparkSession, dir: String, k: Int) = {
    val emb = t(s, dir, "embeddings")
    val all = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val cents = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("cvec"))
    Similarity.knnGraph(Similarity.assignNearestCentroid(all, cents), k)
  }

  /** The shared assignment + kNN CTE prefix of the q136/q137 oracles
    * (q128's bit-stable cosine recipe). */
  private val knnCte = """
      WITH c AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
      cents AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
        FROM embeddings WHERE vec_id % 100 = 0),
      assigned AS (
        SELECT id, cid, vec FROM (
          SELECT id, cid, vec, ROW_NUMBER() OVER (PARTITION BY id ORDER BY
            list_dot_product(vec, cvec)
              / (sqrt(list_dot_product(vec, vec)) * sqrt(list_dot_product(cvec, cvec)))
            DESC, cid) AS rn
          FROM c CROSS JOIN cents)
        WHERE rn = 1),
      knn AS (
        SELECT src, dst, sim, rk FROM (
          SELECT a.id AS src, b.id AS dst,
            list_dot_product(a.vec, b.vec)
              / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))) AS sim,
            CAST(ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
              list_dot_product(a.vec, b.vec)
                / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec)))
              DESC, b.id) AS BIGINT) AS rk
          FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.id <> b.id)
        WHERE rk <= 5)"""

  /** K-NEAREST-NEIGHBOR GRAPH over the embedding corpus
    * ([[Similarity.knnGraph]]): per vector its top-5 in-cluster neighbors
    * by exact cosine — the substrate for graph-based corpus analysis and
    * batch graph-ANN construction. Candidates bounded by the
    * nearest-centroid cluster (cost Σ cluster², the √n dial), one
    * cid-keyed self-join + per-src window top-k; deterministic ⇒ the
    * DuckDB twin re-derives assignment, pairs, and ranks exactly. */
  val q136KnnGraph: Q = Q(
    "q136_knn_graph",
    (s, dir) => knn(s, dir, 5),
    Some(s"""$knnCte
      SELECT src, dst, sim, rk FROM knn
    """))

  /** TRIANGLE CENSUS of the mutual-kNN similarity graph
    * ([[GraphOps.mutualEdges]] → [[GraphOps.trianglesByDegree]]):
    * symmetrize the q136 graph to edges both endpoints agree on, then
    * count closed wedges — the local-clustering signal that separates
    * tight semantic groups from hub noise. DEGREE-ORIENTED enumeration
    * (r12): wedges pivot on each triangle's lowest-degree vertex, so a
    * power-law hub in the similarity graph is a wedge target, never a
    * pivot — fan-out bounded O(√|E|) with the SAME exact triple set
    * (spec-pinned), which is why the id-oriented DuckDB twin still
    * matches bit-for-bit. Every count is one exact BIGINT. */
  val q137TriangleCensus: Q = Q(
    "q137_triangle_census",
    (s, dir) => {
      val edges = GraphOps.mutualEdges(knn(s, dir, 5).select(col("src"), col("dst")))
      val tri = GraphOps.trianglesByDegree(edges)
      edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
        .crossJoin(tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
          .agg(countDistinct(col("node")).as("n_tri_nodes")))
    },
    Some(s"""$knnCte,
      edges AS (
        SELECT k1.src, k1.dst FROM knn k1
        JOIN knn k2 ON k1.src = k2.dst AND k1.dst = k2.src
        WHERE k1.src < k1.dst),
      tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM edges e1
        JOIN edges e2 ON e1.dst = e2.src
        JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst)
      SELECT
        (SELECT COUNT(*) FROM edges) AS n_edges,
        (SELECT COUNT(*) FROM tri) AS n_triangles,
        (SELECT COUNT(DISTINCT node) FROM (
          SELECT a AS node FROM tri UNION ALL
          SELECT b FROM tri UNION ALL
          SELECT c FROM tri)) AS n_tri_nodes
    """))

  private val LpIters = 4

  /** LABEL PROPAGATION COMMUNITIES ([[LabelProp]]) on the same
    * customer–supplier co-purchase graph as q130: four synchronous
    * rounds of adopt-the-majority-neighbor-label, deterministic
    * (count-desc, label-asc) tiebreak — the standard cheap community
    * detector for derived entity graphs, here as a pure BIGINT
    * recurrence so the DuckDB twin unrolls the identical rounds as CTE
    * stages. Per round: one src-keyed join of the two-column label
    * table + two keyed aggregations, O(|E|), map-side partials
    * throughout. */
  val q138LabelProp: Q = Q(
    "q138_label_propagation",
    (s, dir) => {
      val cs = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cnode"),
          (col("l_suppkey") * 2 + 1).as("snode"))
        .distinct()
      val edges = cs.select(col("cnode").as("src"), col("snode").as("dst"))
        .unionAll(cs.select(col("snode").as("src"), col("cnode").as("dst")))
      LabelProp.run(edges, LpIters)
        .select(col("node"),
          when(col("node") % 2 === 0, "customer").otherwise("supplier").as("kind"),
          expr("node div 2").as("key"), col("label"))
    },
    Some {
      val stages = (1 to LpIters).map { i =>
        s"""l$i AS (
        SELECT node, label FROM (
          SELECT e.dst AS node, l.label,
            ROW_NUMBER() OVER (PARTITION BY e.dst
              ORDER BY COUNT(*) DESC, l.label) AS rn
          FROM edges e JOIN l${i - 1} l ON e.src = l.node
          GROUP BY e.dst, l.label)
        WHERE rn = 1
      )"""
      }.mkString(", ")
      s"""
      WITH cs AS (
        SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ), edges AS (
        SELECT cnode AS src, snode AS dst FROM cs
        UNION ALL
        SELECT snode AS src, cnode AS dst FROM cs
      ), l0 AS (
        SELECT DISTINCT src AS node, src AS label FROM edges
      ), $stages
      SELECT node,
        CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        node // 2 AS key, label
      FROM l$LpIters
    """
    })

  private val CoreK = 3
  private val CoreRounds = 16

  /** K-CORE of the mutual-kNN similarity graph ([[GraphOps.kCoreRounds]]):
    * peel nodes of degree < 3 until the 3-core remains — the standard
    * "dense semantic neighborhoods" extraction (k-core survives hub noise
    * that triangle counting alone flags). FIXED 16 parallel-peel rounds
    * (the q130 discipline — measured peel depth is 12 at sf0.1, so the
    * fixpoint is reached and the output IS the exact 3-core; past the
    * fixpoint extra rounds are no-ops), which the DuckDB twin unrolls as
    * identical CTE stages. Per round: one degree aggregate + two
    * node-keyed semi-joins over the shrinking edge list — O(|E|) a round,
    * no node-state table. */
  val q179KCore: Q = Q(
    "q179_kcore",
    (s, dir) => {
      val mutual = GraphOps.mutualEdges(
        knn(s, dir, 5).select(col("src"), col("dst")))
      val both = mutual.unionAll(
        mutual.select(col("dst").as("src"), col("src").as("dst")))
      GraphOps.kCoreRounds(both, CoreK, CoreRounds)
    },
    Some {
      // each stage references its predecessor multiple times — MATERIALIZED
      // keeps DuckDB from inlining the chain into a 3^16-way scan blowup
      val stages = (1 to CoreRounds).map { i =>
        s"""k$i AS MATERIALIZED (
        SELECT src FROM e${i - 1} GROUP BY src HAVING COUNT(*) >= $CoreK),
      e$i AS MATERIALIZED (
        SELECT e.src, e.dst FROM e${i - 1} e
        JOIN k$i a ON e.src = a.src
        JOIN k$i b ON e.dst = b.src)"""
      }.mkString(",\n      ")
      s"""$knnCte,
      e0 AS MATERIALIZED (
        SELECT k1.src, k1.dst FROM knn k1
        JOIN knn k2 ON k1.src = k2.dst AND k1.dst = k2.src),
      $stages
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM e$CoreRounds GROUP BY src
    """
    })

  private val BfsHopCount = 3

  /** MULTI-SOURCE BFS REACH ([[GraphOps.bfsHops]]) on the q130
    * customer–supplier co-purchase graph: minimum hop distance from the
    * first five customers (nodes 2k, custkey < 5) out to 3 hops — the
    * "blast radius" primitive behind influence propagation, fraud-ring
    * expansion, and recall-set construction. Hop distances are exact
    * small integers, so the query is FULL-oracle: the DuckDB twin
    * unrolls the same three frontier expansions as MATERIALIZED CTE
    * stages (the q130/q179 fixed-round discipline — BFS layers are
    * deterministic sets, no float anywhere).
    *
    * Scale shape: each round is one frontier-keyed semi-join over the
    * edge list + distinct + anti-join against visited — O(edges incident
    * to the frontier) per round, state only the (node, dist) table; an
    * empty layer short-circuits. Never a |V|×|V| product, no node-state
    * recomputation round-over-round (lazily pinned layers). */
  val q198BfsReach: Q = Q(
    "q198_bfs_reach",
    (s, dir) => {
      val cs = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cnode"),
          (col("l_suppkey") * 2 + 1).as("snode"))
        .distinct()
        .barrier() // feeds edges AND seeds
      val edges = cs.select(col("cnode").as("src"), col("snode").as("dst"))
        .unionAll(cs.select(col("snode").as("src"), col("cnode").as("dst")))
      val seeds = cs.filter(col("cnode") < 10).select(col("cnode").as("node"))
      GraphOps.bfsHops(edges, seeds, BfsHopCount)
        .select(col("node"),
          when(col("node") % 2 === 0, "customer").otherwise("supplier").as("kind"),
          expr("node div 2").as("key"), col("dist"))
    },
    Some {
      val stages = (1 to BfsHopCount).map { i =>
        s"""f$i AS MATERIALIZED (
        SELECT DISTINCT e.dst AS node FROM edges e
        JOIN v${i - 1} ON e.src = v${i - 1}.node
        WHERE e.dst NOT IN (SELECT node FROM v${i - 1})),
      v$i AS MATERIALIZED (
        SELECT node, dist FROM v${i - 1}
        UNION ALL SELECT node, CAST($i AS BIGINT) AS dist FROM f$i)"""
      }.mkString(",\n      ")
      s"""
      WITH cs AS (
        SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ), edges AS (
        SELECT cnode AS src, snode AS dst FROM cs
        UNION ALL
        SELECT snode AS src, cnode AS dst FROM cs
      ), v0 AS MATERIALIZED (
        SELECT DISTINCT cnode AS node, CAST(0 AS BIGINT) AS dist
        FROM cs WHERE cnode < 10
      ),
      $stages
      SELECT node,
        CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        node // 2 AS key, dist
      FROM v$BfsHopCount
    """
    })

  /** PERSONALIZED PageRank from a seed set — rank as proximity to the
    * first three customers over the q130 co-purchase graph: the
    * related-entity / recommendation expansion ("suppliers and customers
    * closest to this account's purchase neighborhood"), where q130's
    * uniform teleport measures global authority. Teleport mass lands only
    * on the seeds, so the rank table holds ONLY nodes the walk has
    * reached — sparse by construction, the property that makes PPR the
    * 100 TB-safe personalization primitive (per round: reached-set ⋈
    * edges + one keyed sum + a seed-sized full-outer merge; never |V|
    * state). Same exact BIGINT micromass recurrence as q130 ⇒ the DuckDB
    * twin unrolls the identical four rounds with `//` and FULL OUTER
    * teleport merges, bit-exact. */
  val q207PersonalizedPagerank: Q = Q(
    "q207_personalized_pagerank",
    (s, dir) => {
      import s.implicits._
      val cs = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cnode"),
          (col("l_suppkey") * 2 + 1).as("snode"))
        .distinct()
      val edges = cs.select(col("cnode").as("src"), col("snode").as("dst"))
        .unionAll(cs.select(col("snode").as("src"), col("cnode").as("dst")))
      val seeds = Seq(2L, 4L, 6L).toDF("node") // customers 1, 2, 3
      PageRank.runPersonalized(edges, seeds, PprIters, Scale)
        .select(col("node"),
          when(col("node") % 2 === 0, "customer").otherwise("supplier").as("kind"),
          expr("node div 2").as("key"), col("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
    },
    Some {
      val stages = (1 to PprIters).map { i =>
        s"""w$i AS (
        SELECT e.dst AS node,
          CAST((85 * SUM(r${i - 1}.rank // d.outd)) // 100 AS BIGINT) AS walk
        FROM edges e
        JOIN r${i - 1} ON e.src = r${i - 1}.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ), r$i AS (
        SELECT COALESCE(w.node, s.node) AS node,
          CAST(COALESCE(w.walk, 0) + COALESCE(s.tele, 0) AS BIGINT) AS rank
        FROM w$i w FULL OUTER JOIN seedt s ON w.node = s.node
      )"""
      }.mkString(", ")
      s"""
      WITH cs AS (
        SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ), edges AS (
        SELECT cnode AS src, snode AS dst FROM cs
        UNION ALL
        SELECT snode AS src, cnode AS dst FROM cs
      ), deg AS (
        SELECT src, COUNT(*) AS outd FROM edges GROUP BY src
      ), sd AS (
        SELECT DISTINCT src AS node FROM edges WHERE src IN (2, 4, 6)
      ), consts AS (
        SELECT CAST($Scale // COUNT(*) AS BIGINT) AS base,
          CAST(15 * ($Scale // COUNT(*)) // 100 AS BIGINT) AS tp
        FROM sd
      ), seedt AS (
        SELECT node, (SELECT tp FROM consts) AS tele FROM sd
      ), r0 AS (
        SELECT node, (SELECT base FROM consts) AS rank FROM sd
      ), $stages
      SELECT node,
        CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        node // 2 AS key, rank
      FROM r$PprIters
      ORDER BY rank DESC, node
      LIMIT 20
    """
    })

  /** HITS AUTHORITIES (Kleinberg, JACM'99) over the customer→part
    * purchase bipartite graph: "which parts do the BROADEST buyers buy"
    * — authority mass flows from hub customers (those buying many
    * authoritative parts), the mutual-reinforcement ranking q130's
    * single-vector damped walk cannot express. [[GraphOps.hits]] runs
    * the q130 integer-micromass discipline (exact Long sums, `div`
    * normalization, scale 1e9 so every product stays inside int64 in
    * both engines) ⇒ FULL oracle: DuckDB unrolls the same two rounds of
    * half-steps in exact BIGINT. Top-20 with the full tiebreak. Scale
    * shape: per half-round one keyed join + keyed sum over |E|, 1-row
    * totals broadcast; never all-pairs. */
  val q241Hits: Q = Q(
    "q241_hits_authorities",
    (s, dir) => {
      val edges = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
      val (_, auths) = GraphOps.hits(edges, iters = 2)
      auths.orderBy(col("auth").desc, col("node"))
        .limit(20)
        .select(col("node").as("part_key"), col("auth"))
    },
    Some("""
      WITH e AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      nsrc AS (SELECT COUNT(DISTINCT src) AS n FROM e),
      h0 AS (
        SELECT src, CAST(1000000000 // (SELECT n FROM nsrc) AS BIGINT) AS hub
        FROM (SELECT DISTINCT src FROM e)),
      a1r AS (SELECT dst, CAST(SUM(hub) AS BIGINT) AS araw
              FROM e JOIN h0 USING (src) GROUP BY dst),
      a1 AS (SELECT dst, CAST(araw * 1000000000 // (SELECT SUM(araw) FROM a1r)
               AS BIGINT) AS auth FROM a1r),
      h1r AS (SELECT src, CAST(SUM(auth) AS BIGINT) AS hraw
              FROM e JOIN a1 USING (dst) GROUP BY src),
      h1 AS (SELECT src, CAST(hraw * 1000000000 // (SELECT SUM(hraw) FROM h1r)
               AS BIGINT) AS hub FROM h1r),
      a2r AS (SELECT dst, CAST(SUM(hub) AS BIGINT) AS araw
              FROM e JOIN h1 USING (src) GROUP BY dst),
      a2 AS (SELECT dst, CAST(araw * 1000000000 // (SELECT SUM(araw) FROM a2r)
               AS BIGINT) AS auth FROM a2r)
      SELECT dst AS part_key, auth FROM a2
      ORDER BY auth DESC, part_key LIMIT 20
    """))

  /** ADAMIC–ADAR LINK PREDICTION — which customer pairs are MOST LIKELY
    * to be connected, given the part co-purchase graph? AA(u,v) =
    * Σ_{p ∈ N(u)∩N(v)} 1/ln(deg(p)) (Adamic & Adar 2003): sharing a RARE
    * part is strong evidence, sharing a hub part is weak — the classic
    * common-neighbor score recommender candidate-generation starts from.
    * (The customer–PART graph, not customer–supplier: parts scale with
    * the data while suppliers stay countable, so part degree is roughly
    * CONSTANT across SF — the graph stays AA-shaped at any scale.)
    *
    * Scale discipline: naive common-neighbor enumeration is
    * Σ_p deg(p)² — one hub part bought by 10⁶ customers is 10¹² pairs.
    * The degree cap (2 ≤ deg ≤ 32) bounds the self-join fan-out at
    * deg·(deg−1)/2 ≤ 496 pairs per part ⇒ O(|E|·cap) total work,
    * and is PRINCIPLED, not just cheap: a deg-10⁶ hub contributes
    * 1/ln(10⁶) ≈ 0.07 per pair — noise — while the cap keeps every
    * high-signal rare neighbor (the q161 frequency-cap rule applied to
    * candidate generation; same reasoning as SymSpell's deletion-key
    * buckets in q112). The degree join is unhinted (parts are
    * data-sized, the q193 rule).
    *
    * Determinism: 1/ln(deg) is one transcendental of an exact integer —
    * identical doubles — rounded @9 into DECIMAL so the per-pair SUM is
    * exact and order-free (the q127 rule); the top-20 has the full
    * unique tiebreak. */
  val q254AdamicAdar: Q = Q(
    "q254_adamic_adar",
    (s, dir) => {
      import graft.plans.ScaleLint.BarrierSyntax
      // cs feeds both the degree aggregate and the member regroup below —
      // pin it once (r18 optimization; the lazy plan evaluated the
      // lineitem⋈orders distinct up to 3×: exchange reuse does not fire
      // across the differently-projected self-join sides it used to feed).
      val cs = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("sk"))
        .distinct()
        .barrier(eager = true)
      val deg = cs.groupBy(col("sk")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2 && col("deg") <= 32)
        .withColumn("term",
          round(lit(1.0) / log(col("deg").cast("double")), 9)
            .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
      // Pair generation as a ONE-SIDED-deg self-join (r19): r18's regroup
      // (sort_array(collect_list) + posexplode/slice) was measured SLOWER
      // than the join at bench scale (driver 2.01 → 3.74 s; same-session
      // A/B regroup 2.9-3.7 vs self-join 2.4-2.5 s) — the array
      // materialization + two explodes cost more than the sk-keyed join
      // they replaced. This self-join attaches deg/term to ONE side only
      // (the r17 form joined the full ec=cs⋈deg on both sides, paying the
      // deg attach twice); the bounded fan-out argument is the degree cap
      // itself (≤ 32 members per surviving sk ⇒ ≤ 496 pairs per join key),
      // identical either way. Same ordered-pair multiset as the oracle's
      // cs⋈deg⋈cs with a.c < b.c.
      val pairs = cs.select(col("sk"), col("c").as("c1"))
        .join(deg, Seq("sk"))
        .join(cs.select(col("sk").as("sk2"), col("c").as("c2")),
          col("sk") === col("sk2") && col("c1") < col("c2"))
        .select(col("term"), col("c1"), col("c2"))
      pairs.groupBy(col("c1"), col("c2"))
        .agg(count(lit(1)).as("n_common"),
          sum(col("term")).cast("double").as("aa_score"))
        .orderBy(col("aa_score").desc, col("c1"), col("c2"))
        .limit(20)
    },
    Some("""
      WITH cs AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS sk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      deg AS (
        SELECT sk, CAST(COUNT(*) AS BIGINT) AS deg,
          CAST(round(1.0 / ln(CAST(COUNT(*) AS DOUBLE)), 9)
            AS DECIMAL(18,9)) AS term
        FROM cs GROUP BY sk
        HAVING COUNT(*) BETWEEN 2 AND 32),
      pairs AS (
        SELECT a.c AS c1, b.c AS c2, d.term
        FROM cs a JOIN deg d ON a.sk = d.sk
        JOIN cs b ON b.sk = d.sk
        WHERE a.c < b.c)
      SELECT c1, c2, CAST(COUNT(*) AS BIGINT) AS n_common,
        CAST(SUM(term) AS DOUBLE) AS aa_score
      FROM pairs GROUP BY c1, c2
      ORDER BY aa_score DESC, c1, c2 LIMIT 20
    """))

  /** kNN-CLASSIFIER EVAL — the label-prediction accuracy of the q136
    * similarity graph: predict each vector's label by MAJORITY VOTE of
    * its 5 nearest in-cluster neighbors (leave-one-out by construction —
    * the kNN graph excludes self-edges), score against the embeddings'
    * ground-truth `label`. The standard embedding-quality probe ("do
    * near neighbors share labels?") that complements q261's NMI
    * (clustering-level) with an instance-level readout. Vote counts are
    * exact integers; the argmax tiebreaks (count desc, label asc) so
    * both engines pick the same winner; accuracy is one integer
    * division. Everything after the q136 kNN pass is |vectors|×k-sized. */
  val q266KnnEval: Q = Q(
    "q266_knn_label_eval",
    (s, dir) => {
      val labels = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val votes = knn(s, dir, 5)
        .join(labels.select(col("vec_id").as("dst"),
          col("label").as("nbr_label")), Seq("dst"))
        .groupBy(col("src"), col("nbr_label"))
        .agg(count(lit(1)).as("votes"))
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("votes").desc, col("nbr_label"))
      val predicted = votes
        .withColumn("rn", row_number().over(wv))
        .filter(col("rn") === 1)
        .select(col("src"), col("nbr_label").as("predicted"))
      predicted
        .join(labels.select(col("vec_id").as("src"),
          col("label").as("truth")), Seq("src"))
        .groupBy(col("truth"))
        .agg(count(lit(1)).as("n"),
          countIf(col("predicted") === col("truth")).as("n_correct"))
        .withColumn("accuracy",
          col("n_correct").cast("double") / col("n").cast("double"))
    },
    Some(s"""$knnCte,
      votes AS (
        SELECT knn.src, CAST(e.label AS BIGINT) AS nbr_label,
          CAST(COUNT(*) AS BIGINT) AS votes
        FROM knn JOIN embeddings e ON knn.dst = e.vec_id
        GROUP BY 1, 2),
      predicted AS (
        SELECT src, nbr_label AS predicted FROM (
          SELECT src, nbr_label,
            ROW_NUMBER() OVER (PARTITION BY src
              ORDER BY votes DESC, nbr_label) AS rn
          FROM votes) WHERE rn = 1)
      SELECT CAST(e.label AS BIGINT) AS truth,
        CAST(COUNT(*) AS BIGINT) AS n,
        ${QueryDsl.oracleCountIf("predicted = CAST(e.label AS BIGINT)")}
          AS n_correct,
        ${QueryDsl.oracleCountIf("predicted = CAST(e.label AS BIGINT)")}
          / CAST(COUNT(*) AS DOUBLE) AS accuracy
      FROM predicted p JOIN embeddings e ON p.src = e.vec_id
      GROUP BY 1
    """))

  val all: Seq[Q] = Seq(q130PageRank, q136KnnGraph, q137TriangleCensus,
    q138LabelProp, q179KCore, q198BfsReach, q207PersonalizedPagerank,
    q241Hits, q254AdamicAdar, q266KnnEval)
}
