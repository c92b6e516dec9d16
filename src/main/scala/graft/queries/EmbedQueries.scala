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
      // bounded centroid count (≤64): assignment stays O(64·n) however big
      // the corpus — centroid count is a tuning dial, not data-proportional
      val cents = t(s, dir, "embeddings")
        .filter(col("vec_id") % 31 === 0 && col("vec_id") < 31 * 64)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfTopK(corpus(s, dir), queriesDf(s, dir), cents, 10, nProbe = 2)
    },
    None)

  /** Embedding-cosine near-dup pairs (multi-table hyperplane LSH, exact
    * cosine verify ≥ 0.98) over the corpus ∪ synthesized perturbed dups
    * (all raw embeddings are near-orthogonal random vectors). Buckets are
    * engine-specific hashes ⇒ rows-only; recall vs brute force is
    * property-tested in SimilaritySpec. */
  val q57EmbedNearDup: Q = Q(
    "q57_embed_neardup",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val dups = emb.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + 100000).as("id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") +
            (pmod(col("vec_id") * (i + lit(1)), lit(7)).cast("double") - 3.0) * 0.005)
            .cast("float")).as("vec"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        .unionByName(dups)
      Similarity.cosineNearDupPairs(corpus, threshold = 0.98)
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

  val all: Seq[Q] = Seq(
    q33CosineTopK, q34AnnLsh, q35VectorStats, q36LabelCentroids, q56AnnIvf, q57EmbedNearDup)
}
