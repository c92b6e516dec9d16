package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup-clustering
  * step: near-dup PAIRS ([[Dedup.prefixJaccardPairs]], [[Dedup
  * .minhashNearDups]], [[Similarity.cosineNearDupPairs]]) become canonical
  * GROUPS (component = min doc id reachable), from which one representative
  * per group survives.
  *
  * Algorithm: min-label propagation — every node starts labeled with its own
  * id; each round takes the min of its label and its neighbors' labels;
  * fixpoint = components. Each round is ONE hash join + ONE groupBy (both
  * keyed shuffles), and rounds are bounded by the component diameter —
  * near-dup clusters are dense (diameter 2-4), so a handful of rounds
  * converge. (For adversarial long-chain graphs the alternating small/large-
  * star contraction [Kiveris et al.] converges in O(log²) rounds with the
  * same per-round plan shape — this propagation loop is the right trade for
  * dedup workloads.)
  *
  * Iterative DataFrame loops MUST materialize each round:
  * `localCheckpoint` truncates the lineage so round N's plan doesn't
  * re-execute rounds 1..N-1 (and convergence is detected on the driver from
  * the strictly-decreasing label sum — loop-carried control flow is the one
  * place a driver-side action is the correct tool, unlike a scalar that can
  * stay lazy). On a real cluster, swap `localCheckpoint` for reliable
  * `checkpoint` to survive executor loss.
  */
object Components {

  /** nodes: (id); edges: (a, b) undirected (either orientation). Output:
    * (id, component) for EVERY node — singletons keep their own id. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val undirected = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    // coalesce: sum over zero rows is NULL — an empty corpus must yield an
    // empty result, not an NPE at the convergence check.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val neighborMin = undirected
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a")).agg(min(col("comp")).as("ncomp"))
      val updated = labels
        .join(neighborMin.withColumnRenamed("a", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint()
      val newSum = labelSum(updated)
      converged = newSum == prevSum // labels only ever decrease
      prevSum = newSum
      labels = updated
      it += 1
    }
    labels
  }
}
