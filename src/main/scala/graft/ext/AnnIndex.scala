package graft.ext

import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVF×PQ index as a MAINTAINED ARTIFACT — the production shape of the
  * billion-vector ANN deployment, where q120–q123's inline index builds are
  * the algorithm demo. A deployment trains its quantizers once (offline, on
  * a sample), persists them, and then extends the code table incrementally
  * as vectors arrive — existing vectors are never re-read, and search hits
  * the persisted codes. This module wires [[Similarity]]'s primitives into
  * that flow (the dedup tier's prefix-index loop,
  * [[graft.streaming.StreamPipes.dedupIngest]], is the template):
  *
  * Layout under `base/`:
  *  - `quantizer/` — a [[VersionedTable]]: ONE atomic commit per retrain
  *    generation carrying BOTH the coarse centroids and the residual PQ
  *    codebooks (rows tagged `kind ∈ {centroid, book}`), so a reader can
  *    never observe centroids from one generation with books from another.
  *    Versioned like any table: history, time travel, single-writer commit
  *    markers.
  *  - `index/gen=<G>/batch=<B>/` — the encoded corpus (id, cid, codes),
  *    one parquet shard per ingested micro-batch, partitioned by quantizer
  *    generation. Shards are append-only per generation; a replayed batch
  *    OVERWRITES its own shard with bit-identical content (encoding is a
  *    pure per-row function of the frozen generation-`G` quantizers —
  *    extension == rebuild, spec-pinned in SimilaritySpec), so streaming
  *    replay is idempotent with no read-side dedup.
  *
  * Retraining commits quantizer version G+1 and starts an EMPTY
  * `gen=<G+1>` shard set: the caller backfills by re-encoding the corpus
  * through [[extendBatch]] (extension == rebuild makes that equivalent to
  * a from-scratch build), while generation-G readers are untouched until
  * the switch — the same isolation [[VersionedTable]] gives data commits.
  *
  * 100 TB shape: quantizers are dial-sized (√n centroids, m·ksub book
  * rows — broadcast at any corpus scale); the index is m small ints per
  * vector, the ONLY corpus-proportional artifact; per-batch ingest cost is
  * one broadcast-centroid assignment + one broadcast-book encode over the
  * BATCH alone; search scans nProbe/|lists| of the codes
  * ([[Similarity.ivfPqResidualTopK]]) and never touches raw vectors.
  */
object AnnIndex {

  private def quantizerPath(base: String) = s"$base/quantizer"
  private def genPath(base: String, gen: Long) = s"$base/index/gen=$gen"
  private def shardPath(base: String, gen: Long, batchId: Long) =
    s"${genPath(base, gen)}/batch=$batchId"

  /** Train and commit a new quantizer generation from `sample`
    * ((id, vec), ids dense from 0): coarse centroids = the first
    * `nCentroids` ids (the q92 protocol — a k-means refinement drops in
    * without changing the artifact shape), residual PQ codebooks per the
    * [[Similarity.ivfPqResidual]] seed protocol (oracle-exact; pass
    * `iters > 1` for Lloyd-trained books). Returns the new generation. */
  def train(spark: SparkSession, base: String, sample: DataFrame,
      nCentroids: Int, m: Int, ksub: Int, iters: Int = 1): Long = {
    val cents = sample.filter(col("id") < nCentroids)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val (_, books) = Similarity.ivfPqResidual(sample, cents, m, ksub, iters)
    val qdf = cents.select(lit("centroid").as("kind"),
        col("cid").cast("long").as("cid"),
        lit(null).cast("int").as("subspace"), col("cvec"))
      .unionByName(books.select(lit("book").as("kind"),
        col("cid").cast("long").as("cid"),
        col("subspace").cast("int").as("subspace"), col("cvec")))
    VersionedTable.commit(spark, quantizerPath(base), qdf, "train")
  }

  /** Load the current quantizer generation: (gen, centroids, books, m).
    * `m` is derived from the books (max subspace + 1) — the artifact is
    * self-describing, callers never re-supply training parameters. */
  def quantizer(spark: SparkSession, base: String): (Long, DataFrame, DataFrame, Int) = {
    val gen = VersionedTable.currentVersion(spark, quantizerPath(base))
      .getOrElse(throw new IllegalStateException(
        s"no trained quantizer at $base — run AnnIndex.train first"))
    val q = VersionedTable.readVersion(spark, quantizerPath(base), gen)
    val cents = q.filter(col("kind") === "centroid")
      .select(col("cid"), col("cvec"))
    val books = q.filter(col("kind") === "book")
      .select(col("cid").cast("int").as("cid"), col("subspace"), col("cvec"))
    val m = books.agg(max(col("subspace"))).head.getInt(0) + 1
    (gen, cents, books, m)
  }

  /** Encode `batch` ((id, vec)) against the CURRENT frozen quantizers and
    * write it as that generation's shard `batchId` — the incremental
    * extension step. Idempotent under replay: the shard is overwritten
    * with bit-identical content (pure function of the frozen artifacts).
    * Returns the generation written to. */
  def extendBatch(spark: SparkSession, base: String, batch: DataFrame,
      batchId: Long): Long = {
    val (gen, cents, books, m) = quantizer(spark, base)
    Similarity.ivfPqResidualEncode(batch, cents, books, m)
      .write.mode("overwrite").parquet(shardPath(base, gen, batchId))
    gen
  }

  /** The current generation's full code table (id, cid, codes) — the
    * union of every ingested shard. Throws if nothing was ever ingested
    * into the current generation (fresh retrain awaiting backfill). */
  def readIndex(spark: SparkSession, base: String): DataFrame = {
    val (gen, _, _, _) = quantizer(spark, base)
    spark.read.parquet(genPath(base, gen))
      .select(col("id"), col("cid"), col("codes"))
  }

  /** Residual-ADC top-k over the PERSISTED index
    * ([[Similarity.ivfPqResidualTopK]] with artifacts loaded from disk):
    * search cost is the probed lists' codes only; the raw corpus is never
    * read. `queries`: (qid, qvec). */
  def search(spark: SparkSession, base: String, queries: DataFrame,
      k: Int, nProbe: Int = 2): DataFrame = {
    val (gen, cents, books, m) = quantizer(spark, base)
    val index = spark.read.parquet(genPath(base, gen))
      .select(col("id"), col("cid"), col("codes"))
    Similarity.ivfPqResidualTopK(index, cents, books, queries, m, k, nProbe)
  }

  /** [[search]] + exact re-rank ([[Similarity.refineShortlist]]): the ADC
    * shortlist is re-ranked by true squared-L2 against `corpus`'s raw
    * vectors — fetched for shortlist rows only, never scanned. */
  def searchRefined(spark: SparkSession, base: String, queries: DataFrame,
      corpus: DataFrame, k: Int, nProbe: Int = 2, shortlist: Int = 50): DataFrame =
    Similarity.refineShortlist(
      search(spark, base, queries, shortlist, nProbe)
        .select(col("qid"), col("id")),
      queries, corpus, k)

  /** Drop the SHARDS of every generation older than the current one, and
    * vacuum the quantizer table's old version DATA (commit markers are
    * retained, so quantizer [[graft.sources.VersionedTable.history]]
    * survives — the Delta-VACUUM contract). The current generation is
    * never touched, even mid-backfill; a generation becomes vacuumable
    * the moment a newer quantizer commits, because searches only ever
    * read the current generation. Single-writer assumed, like every
    * VersionedTable mutation. */
  def vacuum(spark: SparkSession, base: String): Unit = {
    val (gen, _, _, _) = quantizer(spark, base)
    val indexDir = new org.apache.hadoop.fs.Path(s"$base/index")
    val fs = indexDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(indexDir)) {
      val GenDir = "^gen=(\\d+)$".r
      fs.listStatus(indexDir).foreach { st =>
        st.getPath.getName match {
          case GenDir(g) if g.toLong < gen => fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
    VersionedTable.vacuum(spark, quantizerPath(base))
  }
}
