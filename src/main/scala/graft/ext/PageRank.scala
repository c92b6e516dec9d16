package graft.ext

import graft.plans.ScaleLint.BarrierSyntax

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — iterative graph analytics beyond the
  * reachability class [[Components]] covers: a per-node IMPORTANCE score
  * (stationary mass of the damped random walk), the standard centrality
  * measure for entity graphs a training-data pipeline derives (co-purchase
  * / co-occurrence / citation networks), used to weight or filter sources
  * by authority.
  *
  * Arithmetic is INTEGER-EXACT by construction: ranks are BIGINT
  * micromass units (`scale` total ≈ 1.0), every division is a floor
  * division, and every per-iteration sum is a BIGINT sum — associative
  * and order-free, so Spark's partial aggregation over any partitioning
  * produces bit-identical ranks to a serial engine evaluating the same
  * recurrence (the DuckDB oracle re-derives all iterations with `//`).
  * Floating-point PageRank cannot make that promise: the neighbor-sum's
  * rounding depends on reduction order. The floor divisions leak ≤1 unit
  * of mass per (edge + node) per iteration — at `scale`=1e12 a relative
  * error ≤ ~1e-6 for million-edge graphs, far below ranking resolution,
  * and identically reproduced by any engine implementing the same
  * recurrence.
  *
  * Per iteration the plan is: ranks ⋈ edges on src (hash join, shuffles
  * only the rank table — two narrow columns), per-edge floor-div
  * contribution, one keyed sum onto dst (partial agg map-side). Cost is
  * O(|E|) per iteration with no global sorts and no driver data paths;
  * the edge list (with out-degrees attached) is materialized ONCE via
  * localCheckpoint so iterations don't re-derive it, and the rank
  * recurrence chains lazily (a fixed small iteration count keeps the
  * linear plan cheap to analyze; a long-running variant would checkpoint
  * ranks every ~5 rounds exactly as [[Components]] does per-round).
  *
  * Dangling nodes: callers pass a SYMMETRIZED edge list (both directions
  * of each undirected edge) so every node has out-degree ≥ 1 and the
  * walk is ergodic without a dangling-mass redistribution term; the
  * teleport term `(1-d)/n` is folded in as an integer constant.
  */
object PageRank {

  /** Ranks after `iters` damped power-method rounds.
    *
    * @param edges (src: long, dst: long) directed edges; every node that
    *              appears must have out-degree ≥ 1 (symmetrize first).
    * @return (node: long, rank: long) — rank in units of `scale`⁻¹.
    */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // deg holds EXACTLY one row per node (every node has out-degree ≥ 1 by
    // the symmetrization contract), so it IS the node table: pin it once
    // and serve the node count and the rank init from it (r18 — the former
    // plan re-ran a distinct aggregation over the full edge table for each,
    // two extra edge-sized shuffles before the first iteration).
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outd"))
      .barrier(eager = true)
    // one materialization: iterations re-read this, never the base tables.
    // Pinned hash-partitioned + sorted on src (r18, barrierByKey): every
    // iteration's rank join then sees an already co-partitioned, already
    // sorted edge side — the former plan re-shuffled AND re-sorted the full
    // edge table once PER ITERATION (measured in q130's executed plan:
    // 5 SortMergeJoins, each with its own Exchange over the checkpointed
    // RDD). Iterations now shuffle only the two-column rank table, which
    // is the documented scale contract.
    val ew = edges.join(deg, "src").barrierByKey("src")
    val nNodes = deg.count()
    val base = scale / nNodes
    val teleport = (100 - dampingPct) * base / 100 // exact Long arithmetic
    var ranks = deg.select(col("src").as("node"))
      .withColumn("rank", lit(base))
    for (_ <- 1 to iters) {
      ranks = ew.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank div outd").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          (lit(teleport) + expr(s"($dampingPct * s) div 100")).as("rank"))
    }
    ranks
  }

  /** PERSONALIZED PageRank: the damped walk restarts at a SEED SET
    * instead of uniformly — rank becomes proximity-to-the-seeds
    * (recommendation / related-entity expansion), not global authority.
    * Same integer micromass recurrence as [[run]] (bit-exact across
    * engines and partitionings); the teleport term lands only on seeds,
    * so the rank table holds ONLY REACHED nodes and stays SPARSE by
    * construction — PPR mass is local to the seeds' neighborhood, which
    * is exactly why the operator scales: per iteration the plan joins the
    * reached-set rank table (not |V| rows) against the edge list and
    * full-outer-merges the seed teleport back in.
    *
    * @param seeds single-column `node`; restricted to nodes present in
    *              the graph (a seed with no out-edges would strand mass).
    */
  def runPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // same deg-as-node-table reuse as [[run]] (r18): the seed restriction
    // semi-joins the (pinned, node-sized) degree table instead of
    // re-distincting the full edge table.
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outd"))
      .barrier(eager = true)
    // pinned partitioned+sorted on src, exactly as in [[run]] (r18)
    val ew = edges.join(deg, "src").barrierByKey("src")
    val sd = seeds.select(col("node")).distinct()
      .join(deg.select(col("src").as("node")), Seq("node"), "left_semi")
      .barrier(eager = true)
    val nSeeds = sd.count()
    require(nSeeds >= 1, "no seed appears in the graph")
    val base = scale / nSeeds
    val teleport = (100 - dampingPct) * base / 100
    val tele = sd.withColumn("tele", lit(teleport))
    var ranks = sd.withColumn("rank", lit(base))
    for (_ <- 1 to iters) {
      val walked = ew.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank div outd").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          expr(s"($dampingPct * s) div 100").as("walk"))
      ranks = walked.join(tele, Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("walk"), lit(0L)) + coalesce(col("tele"), lit(0L)))
            .as("rank"))
    }
    ranks
  }
}
