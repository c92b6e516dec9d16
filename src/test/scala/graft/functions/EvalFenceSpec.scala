package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[EvalFence]]: value-identical passthrough, and the optimizer property
  * it exists for — a fenced expensive projection referenced by a filter is
  * NOT pushed below the projection (so it evaluates once per row instead
  * of once in the pushed predicate plus once in the projection). */
class EvalFenceSpec extends SparkSuite {
  import spark.implicits._

  private def pairs = Seq(
    (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
    (Seq(1L, 2L), Seq(1L, 2L)),
    (Seq(5L), Seq(6L)),
    (Seq.empty[Long], Seq(1L))
  ).toDF("a", "b")

  test("fenced expression is value-identical to the bare one") {
    val bare = pairs.select(
      SortedJaccard.sortedJaccard(col("a"), col("b")).as("j")).collect()
    val fenced = pairs.select(EvalFence.fence(
      SortedJaccard.sortedJaccard(col("a"), col("b"))).as("j")).collect()
    assert(bare.map(_.getDouble(0)).toSeq == fenced.map(_.getDouble(0)).toSeq)
  }

  test("select+filter results identical with and without the fence") {
    def shape(fence: Boolean) = {
      val j = SortedJaccard.sortedJaccard(col("a"), col("b"))
      pairs.select(col("a"),
          (if (fence) EvalFence.fence(j) else j).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .collect().map(_.getDouble(1)).toSeq.sorted
    }
    assert(shape(fence = true) == shape(fence = false))
  }

  test("fence blocks the filter pushdown that duplicates the expression") {
    val j = SortedJaccard.sortedJaccard(col("a"), col("b"))
    // a range-derived source: a LocalRelation would let the optimizer
    // evaluate the whole projection at plan time and hide the duplication
    val src = spark.range(100).select(
      array(col("id"), col("id") + 1).as("a"),
      array(col("id"), col("id") + 2).as("b"))
    def occurrences(fence: Boolean): Int = {
      val df = src
        .select(col("a"), (if (fence) EvalFence.fence(j) else j).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      df.queryExecution.optimizedPlan.collect { case p =>
        p.expressions.map(_.collect { case _: SortedJaccard => 1 }.sum).sum
      }.sum
    }
    // bare: the >= filter is pushed below the project, duplicating the
    // merge (2 occurrences); fenced: one projection, filter above it
    assert(occurrences(fence = false) >= 2,
      "expected the unfenced shape to duplicate the expression (did the optimizer change?)")
    assert(occurrences(fence = true) == 1)
  }
}
