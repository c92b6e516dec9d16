package graft.queries

import graft.{Q, QueryDsl}
import QueryDsl._
import graft.ext.PageRank
import org.apache.spark.sql.functions._

/** Iterative graph analytics over derived entity graphs ([[graft.ext
  * .PageRank]]); complements the reachability tier ([[graft.ext
  * .Components]]) with importance scoring.
  */
object GraphQueries {

  private val Scale = 1000000000000L
  private val Iters = 5

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

  val all: Seq[Q] = Seq(q130PageRank)
}
