package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** PCA operator ([[Pca]]): driver-side Jacobi eigen correctness, planted
  * structure recovery, mergeable-moments partition invariance, and
  * fit/transform consistency.
  */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  test("jacobiEigen recovers analytic eigenvalues of a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1 with eigenvectors (1,1)/(1,-1)
    val (values, vectors) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = values.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-9 && math.abs(sorted(1) - 3.0) < 1e-9)
    // eigenvector columns orthonormal
    val dot = vectors(0)(0) * vectors(0)(1) + vectors(1)(0) * vectors(1)(1)
    assert(math.abs(dot) < 1e-9)
  }

  /** 200 deterministic 8-dim vectors whose variance is dominated by one
    * planted direction (unit vector along dims 0+1). */
  private def planted() = {
    val dir = Array(math.sqrt(0.5), math.sqrt(0.5), 0, 0, 0, 0, 0, 0)
    (0 until 200).map { i =>
      val big = ((i * 2654435761L % 1000) / 1000.0 - 0.5) * 10.0 // dominant coordinate
      val v = Array.tabulate(8) { j =>
        val noise = (((i * 31 + j) * 40503L % 997) / 997.0 - 0.5) * 0.1
        (dir(j) * big + noise).toFloat
      }
      (i.toLong, v)
    }.toDF("id", "vec")
  }

  test("fit recovers the planted dominant direction; components orthonormal, eigenvalues descending") {
    val model = Pca.fit(planted(), "vec", d = 8, k = 3)
    assert(model.eigenvalues.length === 3)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      "eigenvalues must come out descending")
    val c1 = model.components(0)
    val align = math.abs(c1(0) * math.sqrt(0.5) + c1(1) * math.sqrt(0.5))
    assert(align > 0.99, s"first component must align with the planted direction: $align")
    // orthonormality
    for (a <- model.components; b <- model.components) {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val expect = if (a eq b) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9)
    }
    // sign normalization: largest-|component| coordinate positive
    for (c <- model.components)
      assert(c(c.indices.maxBy(i => math.abs(c(i)))) > 0)
  }

  test("moments merge is partition-invariant (same model from any layout)") {
    val df = planted()
    val m1 = Pca.fit(df.coalesce(1), "vec", d = 8, k = 2)
    val m7 = Pca.fit(df.repartition(7), "vec", d = 8, k = 2)
    // float sums reassociate across partitions; the model must agree to
    // far tighter than any decision made downstream
    m1.mean.zip(m7.mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    m1.eigenvalues.zip(m7.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-7) }
  }

  test("project centers each row exactly ONCE (HOF barrier holds in the optimized plan)") {
    // The q167/SCALING.md inlining rule applied to PCA: without the
    // checkpoint barrier, CollapseProject inlines the centering zip_with
    // into all k dot products → k re-centerings per row. With the barrier
    // the final plan reads the centered array from the checkpointed scan,
    // so it contains exactly k zip_with nodes (one per dot product) and
    // ZERO centering zip_with — pinned here by counting plan nodes, which
    // is machine-independent where a wall-clock check is not.
    val k = 4
    val model = Pca.fit(planted(), "vec", d = 8, k = k)
    val projected = Pca.project(planted(), "vec", model)
    val plan = projected.queryExecution.optimizedPlan.toString
    val nZip = "zip_with".r.findAllIn(plan).length
    assert(nZip == k, s"expected $k zip_with nodes (dot products only), got $nZip:\n$plan")
    // and the projection still computes the right thing through the barrier
    val row = projected.filter(col("id") === 0L).select(col("pc")).head()
      .getSeq[Double](0)
    assert(row.length == k)
  }

  test("projected first-component variance equals its eigenvalue (fit/transform consistency)") {
    val df = planted()
    val model = Pca.fit(df, "vec", d = 8, k = 2)
    val v = Pca.project(df, "vec", model)
      .select(element_at(col("pc"), 1).as("p1"))
      .agg(var_pop(col("p1"))).as[Double].head()
    assert(math.abs(v - model.eigenvalues(0)) / model.eigenvalues(0) < 1e-6,
      s"pc1 population variance $v vs eigenvalue ${model.eigenvalues(0)}")
  }
}
