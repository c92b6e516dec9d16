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
  *  - `shards/` — a [[VersionedTable]] of (gen, shard-path) rows: the
  *    MANIFEST. Readers list the code table through the manifest's current
  *    snapshot, never by directory listing, which is what makes
  *    [[compact]] an atomic metadata swap (Delta's log-over-files shape,
  *    here built from the same commit-marker machinery every other
  *    versioned artifact in this library already uses): a reader planned
  *    against the pre-compaction manifest keeps reading the old shard
  *    files — they stay on disk until [[vacuum]] — while new readers see
  *    only the compacted shard. Directory listing would instead give a
  *    non-atomic delete-then-read window and double- or zero-counted rows.
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
  * ([[Similarity.ivfPqResidualTopK]]) and never touches raw vectors. The
  * manifest itself is metadata (one short row per shard): its per-commit
  * copy-on-write rewrite is O(shard count), which [[compact]] keeps
  * bounded — the same reason Delta checkpoints its log.
  */
object AnnIndex {

  private def quantizerPath(base: String) = s"$base/quantizer"
  private def shardsPath(base: String) = s"$base/shards"
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

  /** The manifest's current shard paths for generation `gen` (empty if no
    * manifest was ever committed or it has no rows for this generation). */
  private def currentShards(spark: SparkSession, base: String, gen: Long): Seq[String] =
    VersionedTable.read(spark, shardsPath(base)) match {
      case None => Seq.empty
      case Some(df) => df.filter(col("gen") === gen)
        .select(col("shard")).collect().map(_.getString(0)).toSeq.sorted
    }

  /** Commit a new manifest snapshot holding exactly `shards` for `gen`.
    * Rows for OLDER generations are dropped from the current snapshot —
    * search only ever reads the current generation, and the superseded
    * listing survives in the manifest's own history (time travel). */
  private def commitShards(spark: SparkSession, base: String, gen: Long,
      shards: Seq[String], operation: String): Long = {
    import spark.implicits._
    VersionedTable.commit(spark,
      shardsPath(base),
      shards.map(s => (gen, s)).toDF("gen", "shard"),
      operation)
  }

  /** Encode `batch` ((id, vec)) against the CURRENT frozen quantizers,
    * write it as that generation's shard `batchId`, and register the shard
    * in the manifest — the incremental extension step. Idempotent under
    * replay: the shard is overwritten with bit-identical content (pure
    * function of the frozen artifacts) and an already-manifested path is
    * not re-committed. Data precedes metadata (shard write, then manifest
    * commit), the same ordering [[VersionedTable.commit]] itself uses, so
    * a reader can never see a manifested shard without complete data.
    * Returns the generation written to. */
  def extendBatch(spark: SparkSession, base: String, batch: DataFrame,
      batchId: Long): Long = {
    val (gen, cents, books, m) = quantizer(spark, base)
    val shard = shardPath(base, gen, batchId)
    Similarity.ivfPqResidualEncode(batch, cents, books, m)
      .write.mode("overwrite").parquet(shard)
    val existing = currentShards(spark, base, gen)
    if (!existing.contains(shard))
      commitShards(spark, base, gen, existing :+ shard, s"extend batch=$batchId")
    gen
  }

  /** The current generation's full code table (id, cid, codes) — the
    * union of the MANIFESTED shards. Throws if nothing was ever ingested
    * into the current generation (fresh retrain awaiting backfill). */
  def readIndex(spark: SparkSession, base: String): DataFrame = {
    val (gen, _, _, _) = quantizer(spark, base)
    val shards = currentShards(spark, base, gen)
    if (shards.isEmpty) throw new IllegalStateException(
      s"generation $gen at $base has no ingested shards — backfill via extendBatch")
    spark.read.parquet(shards: _*)
      .select(col("id"), col("cid"), col("codes"))
  }

  /** Residual-ADC top-k over the PERSISTED index
    * ([[Similarity.ivfPqResidualTopK]] with artifacts loaded from disk):
    * search cost is the probed lists' codes only; the raw corpus is never
    * read. `queries`: (qid, qvec). */
  def search(spark: SparkSession, base: String, queries: DataFrame,
      k: Int, nProbe: Int = 2): DataFrame = {
    val (_, cents, books, m) = quantizer(spark, base)
    Similarity.ivfPqResidualTopK(readIndex(spark, base), cents, books,
      queries, m, k, nProbe)
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

  /** OPTIMIZE for the code table: rewrite the current generation's
    * manifested shards as `targetFiles` parquet files and atomically swap
    * the manifest to the compacted listing. Streaming ingest accretes one
    * small shard per micro-batch — at scale that is the classic
    * small-file problem (every search pays per-file open/footer cost and
    * the manifest's copy-on-write rewrite grows with shard count);
    * compaction is the standard maintenance answer, exactly as
    * [[graft.plans.Layout]] provides for data tables. The swap is a
    * single manifest commit: in-flight readers planned against the old
    * snapshot keep their files (nothing is deleted here — the superseded
    * shard dirs become garbage that [[vacuum]] collects), new readers see
    * only the compacted shard. Size `targetFiles` so each file lands near
    * the fs block size at the deployment's scale. Returns the number of
    * shards compacted away (0 = nothing to do, no commit made). */
  def compact(spark: SparkSession, base: String, targetFiles: Int = 1): Int = {
    val (gen, _, _, _) = quantizer(spark, base)
    val shards = currentShards(spark, base, gen)
    if (shards.size <= 1) return 0
    // Suffix the dir with the manifest version the swap will commit, so
    // repeated compactions never collide with a live or garbage dir.
    val nextV = VersionedTable.currentVersion(spark, shardsPath(base))
      .getOrElse(-1L) + 1
    val dest = s"${genPath(base, gen)}/compact=$nextV"
    spark.read.parquet(shards: _*)
      .select(col("id"), col("cid"), col("codes"))
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(dest)
    commitShards(spark, base, gen, Seq(dest), s"compact ${shards.size} shards")
    shards.size
  }

  /** Drop the SHARDS of every generation older than the current one, the
    * current generation's UNMANIFESTED shard dirs (garbage superseded by
    * [[compact]]), and the old version DATA of the quantizer and manifest
    * tables (commit markers are retained, so their
    * [[graft.sources.VersionedTable.history]] survives — the Delta-VACUUM
    * contract). The manifested current generation is never touched, even
    * mid-backfill; a generation becomes vacuumable the moment a newer
    * quantizer commits, because searches only ever read the current
    * generation. Single-writer assumed, like every VersionedTable
    * mutation. */
  def vacuum(spark: SparkSession, base: String): Unit = {
    val (gen, _, _, _) = quantizer(spark, base)
    // scheme-insensitive path identity for the liveness check
    val live = currentShards(spark, base, gen)
      .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet
    val indexDir = new org.apache.hadoop.fs.Path(s"$base/index")
    val fs = indexDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(indexDir)) {
      val GenDir = "^gen=(\\d+)$".r
      fs.listStatus(indexDir).foreach { st =>
        st.getPath.getName match {
          case GenDir(g) if g.toLong < gen => fs.delete(st.getPath, true)
          case GenDir(_) => // current generation: sweep unmanifested dirs
            fs.listStatus(st.getPath).foreach { sh =>
              if (!live.contains(sh.getPath.toUri.getPath))
                fs.delete(sh.getPath, true)
            }
          case _ => ()
        }
      }
    }
    VersionedTable.vacuum(spark, quantizerPath(base))
    VersionedTable.vacuum(spark, shardsPath(base))
  }
}
