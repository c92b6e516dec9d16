package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`), north-star
  * extension. All vector math is built from codegen'd higher-order functions
  * (`zip_with`/`aggregate`/`transform`) — no UDFs, no per-row JVM boxing
  * beyond the array itself.
  *
  * Scale paths:
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set, one scan
  *    of the corpus, per-query top-k. cost O(|corpus|·|queries|·d); the
  *    baseline and the verifier for approximate paths.
  *  - [[lshTopK]] — approximate: random-hyperplane signature buckets the
  *    corpus (one scan), candidates meet in a bucket-keyed shuffle instead
  *    of a cross join. Recall tunable via planes/tables; each table is one
  *    cheap integer key.
  */
object Similarity {

  /** Elementwise ops accumulate left-to-right in doubles — the same order a
    * serial engine uses, so results are bit-stable across engines. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine via the native fused-loop expression ([[graft.functions
    * .CosineSimilarity]]) — bit-identical to `dot/(‖a‖·‖b‖)` in HOFs (same
    * cast + accumulation order), minus the per-element lambda interpretation.
    * [[cosineHof]] is kept as the reference formulation for equality tests. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosineSimilarity(a, b)

  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k neighbors for each query vector.
    * `queries`: (qid, qvec); `corpus`: (id, vec). Self-pairs excluded.
    * The query side is broadcast: the corpus never shuffles for the join;
    * the only wide exchange is the per-qid top-k (tiny: k rows/qid). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    joined
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): derived
    * from (plane, dim) via xxhash64 so every executor materializes identical
    * planes with zero driver state shipped. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001L)) - lit(1000000L)).cast("double") / 1000000.0

  /** Random-hyperplane (SimHash) signature of a vector: one sign bit per
    * plane, packed into a long — the LSH bucket key. Native fused expression
    * ([[graft.functions.HyperplaneSig]]): one primitive loop instead of
    * ~d×nPlanes interpreted HOF lambda evals per row (the corpus-bucketing
    * bottleneck at scale). Bit-identical to [[hyperplaneSignatureHof]],
    * proven in SimilaritySpec. */
  def hyperplaneSignature(vec: Column, nPlanes: Int): Column =
    graft.functions.HyperplaneSig.hyperplaneSig(vec, nPlanes)

  /** Reference HOF formulation of [[hyperplaneSignature]], kept for the
    * native/HOF equality test only — interpreted, do not use in hot paths. */
  def hyperplaneSignatureHof(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1), d => planeComponent(p, d)),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** IVF-Flat approximate top-k — the second ANN scale path (coarse
    * quantization instead of hashing): every corpus vector is assigned to
    * its nearest centroid in ONE scan against the (constant-size,
    * broadcast) centroid set; each query probes its `nProbe` nearest
    * centroids and ranks only those inverted lists with exact cosine.
    *
    * Recall/cost dial: nProbe/|centroids|. At scale |centroids| should grow
    * ~√|corpus| so a list holds ~√n vectors and the probe join reads
    * nProbe·√n candidates per query; the centroid set stays broadcastable
    * for millions of centroids of small dimension. Centroids here are
    * caller-supplied (deterministic samples work; a k-means refinement
    * would drop in without changing the plan shape).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 2): DataFrame = {
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("sim_c", cosine(col("vec"), col("cvec")))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cid"), col("vec")), struct(col("sim_c"), -col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.vec").as("vec"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("sim_c").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("sim_c", cosine(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qvec"), col("cid"))
    val cand = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** Approximate top-k: candidates share a hyperplane-signature bucket with
    * the query; exact cosine ranks within candidates. One corpus scan to
    * bucket, one bucket-keyed join — no cross join at any scale. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 12): DataFrame = {
    val bc = corpus.withColumn("bucket", hyperplaneSignature(col("vec"), nPlanes))
    val bq = queries.withColumn("bucket", hyperplaneSignature(col("qvec"), nPlanes))
    val cand = bc.join(broadcast(bq), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }
}
