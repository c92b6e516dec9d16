package graft.ext

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
    * re-plan. The id-orientation here is the deterministic (oracle-
    * matchable) choice; the classic skew hardening — orient each edge
    * from its lower-degree endpoint so no wedge pivot exceeds
    * O(√|E|) fan-out — is a drop-in reorientation of the input when a
    * power-law graph needs it (same counting identity, different
    * orientation key). */
  def triangles(undirected: DataFrame): DataFrame = {
    val e1 = undirected.select(col("src").as("a"), col("dst").as("b"))
    val e2 = undirected.select(col("src").as("b"), col("dst").as("c"))
    e1.join(e2, Seq("b"))
      .join(undirected.select(col("src").as("a"), col("dst").as("c")),
        Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
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
}
