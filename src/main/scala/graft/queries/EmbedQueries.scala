package graft.queries

import graft.{Q, QueryDsl}
import QueryDsl._
import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity-search + vector-stats operators over `embeddings`
  * (north-star ANN surface).
  */
object EmbedQueries {

  private def corpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** Brute-force exact cosine top-10 per query vector. Oracle computes the
    * identical left-to-right double accumulation via list_dot_product on
    * DOUBLE[] casts. */
  val q33CosineTopK: Q = Q(
    "q33_cosine_topk",
    (s, dir) => Similarity.bruteForceTopK(corpus(s, dir), queriesDf(s, dir), 10),
    Some("""
      WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
      sims AS (
        SELECT qid, id,
          list_dot_product(qvec, vec)
            / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) AS sim
        FROM c, q WHERE id <> qid
      ),
      ranked AS (
        SELECT qid, id, sim,
          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS BIGINT) AS rank
        FROM sims
      )
      SELECT qid, rank, id, sim FROM ranked WHERE rank <= 10
    """),
    headline = true)

  /** LSH-bucketed approximate top-k (hyperplane signatures). Bucket keys are
    * engine-specific hashes ⇒ rows-only check; recall is property-tested in
    * SimilaritySpec against the brute-force truth. */
  val q34AnnLsh: Q = Q(
    "q34_ann_lsh",
    (s, dir) => Similarity.lshTopK(corpus(s, dir), queriesDf(s, dir), 10, nPlanes = 8),
    None)

  /** IVF-Flat approximate top-k: deterministic sampled centroids, 2-probe.
    * Assignment ties/centroid geometry are engine-specific ⇒ rows-only;
    * recall vs brute force is property-tested in SimilaritySpec. */
  val q56AnnIvf: Q = Q(
    "q56_ann_ivf",
    (s, dir) => {
      val cents = t(s, dir, "embeddings").filter(col("vec_id") % 31 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfTopK(corpus(s, dir), queriesDf(s, dir), cents, 10, nProbe = 2)
    },
    None)

  /** Vector stats: dimension + L2 norm per vector (sequential double
    * accumulation on both engines). */
  val q35VectorStats: Q = Q(
    "q35_vector_stats",
    (s, dir) =>
      t(s, dir, "embeddings").select(
        col("vec_id"),
        col("label").cast("int").as("label"),
        size(col("embedding")).cast("long").as("dim"),
        Similarity.l2Norm(col("embedding")).as("l2_norm")),
    Some("""
      SELECT vec_id, label,
        len(embedding) AS dim,
        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2_norm
      FROM embeddings
    """))

  /** Per-label centroid via posexplode (generator) + exact decimal mean —
    * the elementwise-aggregate shape for embedding analytics. */
  val q36LabelCentroids: Q = Q(
    "q36_label_centroids",
    (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label").cast("int").as("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(
          (sum(col("x").cast("double").cast(DecimalType(28, 12))).cast("double") /
            count(lit(1))).as("centroid"))
        .filter(col("pos") < 8),
    Some("""
      SELECT label, CAST(i - 1 AS BIGINT) AS pos,
        CAST(SUM(CAST(embedding[i]::DOUBLE AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS centroid
      FROM embeddings, generate_series(1, 8) t(i)
      GROUP BY label, i
    """))

  val all: Seq[Q] = Seq(q33CosineTopK, q34AnnLsh, q35VectorStats, q36LabelCentroids, q56AnnIvf)
}
