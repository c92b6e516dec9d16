package graft.ext

import graft.plans.ScaleLint.BarrierSyntax

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** PCA for embedding columns — the whitening / dimensionality-reduction
  * step of an embedding pipeline (semantic dedup and ANN both improve on
  * decorrelated coordinates; compressed indexes train on the projected
  * space).
  *
  * 100 TB shape, by stage:
  *  1. mean + Gram matrix in ONE pass via a typed [[Aggregator]] whose
  *     buffer is (n, Σx [d], Σxxᵀ [d²]) — d is the MODEL dimension
  *     (64–4096), so the buffer is KBs–MBs and map-side partials merge
  *     associatively; the corpus streams through once, nothing shuffles
  *     but the partial buffers (one per partition).
  *  2. eigen-decomposition of the d×d covariance DRIVER-SIDE (cyclic
  *     Jacobi — symmetric, unconditionally convergent). This is the one
  *     deliberate driver computation in the operator: O(d³) on a matrix
  *     whose size is set by the MODEL, not the data — the same class of
  *     driver math as broadcasting k-means centroids.
  *  3. projection: the top-k eigenvectors ship back as a BROADCAST
  *     literal matrix; each row's projection is k codegen'd
  *     `aggregate(zip_with(...))` dot products — a narrow map, no
  *     shuffle, no UDF.
  *
  * Determinism: Jacobi on the same covariance doubles gives the same
  * rotations in the same sweep order; eigenvector SIGN is normalized
  * (largest-|component| coordinate made positive) so runs and engines
  * can compare projections. Eigen output is still float-path-dependent
  * across ENGINES, so catalog exposure is rows-only + spec (the
  * q31/q34 sketch precedent).
  */
object Pca {

  /** (count, Σx, upper-triangular Σxxᵀ) partial — merge is element-wise
    * addition, the textbook mergeable second-moment sketch. */
  final case class Moments(var n: Long, var sum: Array[Double], var xx: Array[Double])

  private class MomentsAgg(d: Int)
      extends Aggregator[Array[Float], Moments, Moments] {
    def zero: Moments = Moments(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    def reduce(b: Moments, v: Array[Float]): Moments = {
      b.n += 1
      var i = 0
      var t = 0
      while (i < d) {
        val xi = v(i).toDouble
        b.sum(i) += xi
        var j = i
        while (j < d) { b.xx(t) += xi * v(j); t += 1; j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Moments, b: Moments): Moments = {
      a.n += b.n
      var i = 0
      while (i < d) { a.sum(i) += b.sum(i); i += 1 }
      var t = 0
      while (t < a.xx.length) { a.xx(t) += b.xx(t); t += 1 }
      a
    }
    def finish(r: Moments): Moments = r
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Fitted model: per-dimension mean, eigenvalues (descending), and the
    * top-k eigenvectors (rows, unit length, sign-normalized). */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
    components: Array[Array[Double]])

  /** One-pass fit over `vecCol` (Array[Float], fixed dimension `d`). */
  def fit(df: DataFrame, vecCol: String, d: Int, k: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new MomentsAgg(d).toColumn
    val m = df.select(col(vecCol).cast("array<float>")).as[Array[Float]]
      .select(agg).head()
    require(m.n > 1, s"PCA needs > 1 row, got ${m.n}")
    val mean = m.sum.map(_ / m.n)
    // covariance from the packed upper triangle
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m.xx(t) / m.n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(ix => -values(ix)).take(k)
    val comps = order.map { ix =>
      val v = vectors.map(_(ix))
      // sign normalization: the largest-|component| coordinate positive
      val pivot = v.indices.maxBy(p => math.abs(v(p)))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    Model(mean, order.map(values(_)).toArray, comps)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). O(d³) per sweep, a few
    * sweeps to machine precision — driver-side by design (d ≤ a few
    * thousand). */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 50) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project `vecCol` onto the model's top-k components (mean-centered):
    * adds `pcCol` as Array[Double](k). Pure narrow projection — the
    * model travels as literal arrays inside the plan (broadcast by
    * value), each component one codegen'd zip_with/aggregate dot
    * product. */
  def project(df: DataFrame, vecCol: String, model: Model,
      pcCol: String = "pc"): DataFrame = {
    val meanLit = typedlit(model.mean.toSeq)
    // Pin the centered array behind a checkpoint barrier BEFORE the k
    // component lambdas read it (the containmentPairs HOF-inlining rule,
    // SCALING.md): without the barrier CollapseProject inlines the
    // centering zip_with into every dot product, re-centering each row k
    // times — a bounded k× at d=64, real money at d=4096. With the
    // barrier the plan carries exactly one centering per row;
    // PcaSpec pins that by counting zip_with nodes in the final plan.
    val centered = df.withColumn("__pca_centered",
      zip_with(col(vecCol).cast("array<double>"), meanLit, (x, m) => x - m))
      .barrier()
    val comps = model.components.map { comp =>
      aggregate(
        zip_with(col("__pca_centered"), typedlit(comp.toSeq), (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
    }
    centered.withColumn(pcCol, array(comps: _*)).drop("__pca_centered")
  }
}
