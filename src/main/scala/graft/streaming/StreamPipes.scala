package graft.streaming

import graft.plans.ScaleLint.BarrierSyntax

import graft.silver.{Merge, TxnSilver}
import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming pipeline stages (SURVEY §2.1 S1-S4, §2.8 ST1-ST7).
  *
  * The reference's Delta streaming sinks/sources map to parquet here (no
  * Delta jar): checkpointed exactly-once file sinks, schema-explicit file
  * sources, foreachBatch for multi-table/merge logic, AvailableNow for
  * batch-over-stream runs. Watermarked windows / session windows /
  * dropDuplicatesWithinWatermark are the north-star stateful additions the
  * reference lacks (SURVEY §2.8 ST7).
  */
object StreamPipes {

  /** Bronze ingest (ref 01:181-189): append streaming sink, partitioned by
    * ingestion_date, checkpointed, AvailableNow. Caller awaits termination. */
  def bronzeSink(bronze: DataFrame, path: String, checkpoint: String): StreamingQuery =
    bronze.writeStream
      .format("parquet")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .option("path", path)
      .partitionBy("ingestion_date")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-read a parquet table (ref 02:199-200; parquet file source needs
    * an explicit schema, unlike Delta). */
  def tableStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.format("parquet").schema(schema).load(path)

  /** Silver foreachBatch (ref 02:97-209): per micro-batch DQ split → enrich
    * → idempotent keyed merge into the silver path + quarantine write.
    * Exactly-once under replay on BOTH sinks: the merge is keyed on
    * transaction_id (re-processing a batch is a no-op), and the quarantine
    * write is scoped to a `batch=<id>` partition directory and overwritten —
    * replaying a micro-batch after a failure between the quarantine write
    * and the checkpoint commit rewrites the same partition instead of
    * appending duplicates. */
  def silverForeachBatch(
      bronzeStream: DataFrame,
      silverPath: String, quarantinePath: String, checkpoint: String,
      clock: java.sql.Timestamp, validMcc: Seq[String]): StreamingQuery =
    bronzeStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val (silverReady, quarantined) = TxnSilver.processBatch(batch, clock, validMcc)
        // 02:124-128; batch-scoped overwrite = idempotent replay
        quarantined.write.mode("overwrite").parquet(s"$quarantinePath/batch=$batchId")
        val merged = VersionedTable.read(spark, silverPath) match {
          case Some(target) =>
            Merge.upsert(target, silverReady, Seq("transaction_id")) // 02:174-181
          case None => silverReady // 02:184 first-batch fallback
        }
        VersionedTable.commit(spark, silverPath, merged)
        ()
      }
      .start()

  /** Streaming DECLARATIVE EXPECTATIONS (r14) — [[graft.ext.Expectations]]
    * as a maintained stream stage, the generalization of
    * [[silverForeachBatch]]'s hand-rolled DQ split to an arbitrary rule
    * set (the managed-ETL `expect_or_drop` surface the reference platform
    * ships as notebook decorators): per micro-batch, one flagging pass,
    * clean rows APPEND to the contract-passing table, violations and the
    * per-rule metrics land in `batch=<id>`-scoped partitions.
    *
    * Exactly-once under replay on all three sinks: clean rows are scoped
    * to `batch=<id>` partition dirs exactly like quarantine/metrics —
    * replaying a micro-batch after a failure between any write and the
    * checkpoint commit OVERWRITES the same partitions instead of
    * appending duplicates (the proven silverForeachBatch discipline). The
    * FLAGGED frame is persisted before the three derived writes so the
    * flagging projection and the dataset-level joins run once, not three
    * times. Dataset-level rules
    * (uniqueness/FK) evaluate WITHIN the micro-batch — cross-batch
    * uniqueness belongs to the keyed-merge tier (dropDuplicates state /
    * [[dedupIngest]]'s persisted index), not a per-batch contract. */
  def expectationsIngest(
      stream: DataFrame,
      rules: Seq[graft.ext.Expectations.Rule],
      cleanPath: String, quarantinePath: String, metricsPath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist the FLAGGED frame, not the raw batch: clean/quarantine/
        // metrics are three consumptions of the same flagging projection +
        // dataset-level joins (uniqueness groupBy, FK join) — caching below
        // the flags would recompute all of that three times per micro-batch
        val r = graft.ext.Expectations.check(batch, rules)
        val cached = r.flagged.persist()
        try {
          r.clean.write.mode("overwrite")
            .parquet(s"$cleanPath/batch=$batchId")
          r.quarantine.write.mode("overwrite")
            .parquet(s"$quarantinePath/batch=$batchId")
          r.metrics.write.mode("overwrite")
            .parquet(s"$metricsPath/batch=$batchId")
        } finally { cached.unpersist(); () }
      }
      .start()

  /** Watermarked event-time hourly aggregate (north-star ST7): late data
    * beyond 10 minutes is dropped; state is bounded by the watermark. */
  def watermarkedHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Session windows with a 30-minute gap (north-star ST7): the streaming
    * twin of [[graft.ext.Sessionize]]. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming dedup bounded by watermark (north-star ST7). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String]): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Watermarked stream-stream join (north-star ST surface): key equality +
    * a bounded event-time range. Both watermarks plus the range condition
    * let the symmetric-hash-join state evict rows once the other side can
    * no longer match them — state stays bounded no matter how long the
    * streams run (the unbounded-state failure mode of an unconstrained
    * stream-stream join). `rightTime` must fall in
    * `[leftTime - lookback, leftTime]`. `joinType` supports `inner` and
    * `left_outer` — outer rows emit null-padded once the watermark proves
    * no match can arrive. */
  def streamStreamJoin(
      left: DataFrame, right: DataFrame,
      key: String, rightKey: String,
      leftTime: String, rightTime: String,
      watermark: String = "10 minutes",
      lookback: String = "5 minutes",
      joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTime, watermark)
      .join(
        right.withWatermark(rightTime, watermark),
        expr(s"$key = $rightKey AND " +
          s"$rightTime BETWEEN $leftTime - interval $lookback AND $leftTime"),
        joinType)

  /** STREAMING corpus ingestion with EXACT near-dup admission — the
    * incremental dedup flow ([[graft.ext.Dedup.incrementalNearDupExact]] +
    * [[graft.ext.Dedup.extendPrefixIndex]]) as a foreachBatch pipeline.
    * Every micro-batch is admitted against the corpus ingested so far via
    * the PERSISTED prefix index (never re-reading earlier corpus text),
    * appended under `corpus/batch=<id>`, and the index is extended and
    * written as versioned snapshots (`postings_v<id>` / `vocab_v<id>`).
    *
    * Replay idempotency: a replayed micro-batch re-reads the index as of
    * the LATEST VERSION STRICTLY BELOW its own batch id — the failed
    * attempt's partial writes are invisible to the decision — and every
    * write is a per-batch-directory overwrite, so re-running batch N
    * rewrites exactly batch N's outputs. `vocab_v<id>` is written last and
    * acts as the version's commit marker.
    *
    * `compactEvery` > 0 runs the maintenance loop every N batches —
    * [[graft.ext.Dedup.compactCorpus]] folds the accreted per-batch
    * corpus dirs into one committed `corpus/compact=<B>` dir, and
    * [[graft.ext.Dedup.vacuumDedupState]] sweeps covered corpus dirs plus
    * index snapshots older than the newest two (two so a replayed batch
    * can still read the version strictly below itself). Uncompacted, a
    * long-running stream accretes one corpus dir + one full index
    * snapshot per micro-batch forever — the exact small-files pathology
    * the ANN shard sweep measured (SCALING.md). Consumers read the
    * corpus via [[graft.ext.Dedup.readCorpus]] (compaction-aware read
    * set), not a raw partition-discovery read of `corpus/`. */
  /** STREAMING ANN-INDEX INGESTION — [[graft.ext.AnnIndex]]'s incremental
    * extension as a foreachBatch pipeline (the [[dedupIngest]] pattern for
    * the vector tier): every micro-batch of (id, vec) rows is encoded
    * against the CURRENT frozen quantizer generation and written as that
    * generation's shard `batch=<id>`. Caller must have run
    * [[graft.ext.AnnIndex.train]] first (the production split: quantizers
    * train offline on a sample; the index extends online forever).
    *
    * Replay idempotency is BATCH-ID KEYED: [[graft.ext.AnnIndex
    * .extendBatch]] skips any batchId already present in the shard
    * manifest (and would re-encode bit-identically even if it didn't —
    * encoding is a pure function of the frozen quantizers; extension ==
    * rebuild, SimilaritySpec), so at-least-once delivery never
    * double-counts a batch, including after compaction folded its shard
    * away. The quantizer's [[graft.sources.VersionedTable]] markers
    * version the only mutable state.
    *
    * `compactEvery` > 0 folds the accreted per-batch shards into one
    * every N batches ([[graft.ext.AnnIndex.compact]]) — the maintenance
    * loop a long-running stream needs: uncompacted, the shard count (and
    * with it every search's per-file open cost and the manifest's own
    * copy-on-write rewrite) grows one per micro-batch without bound.
    * Compaction inside the same foreachBatch keeps the invariant
    * single-writer and is itself replay-safe: the swap is one manifest
    * commit, covered batchIds stay registered, and a replayed trigger
    * either finds one shard (no-op) or compacts again idempotently. */
  def annIngest(
      vectors: DataFrame, basePath: String, checkpoint: String,
      compactEvery: Int = 0): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ext.AnnIndex.extendBatch(batch.sparkSession, basePath, batch, batchId)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.ext.AnnIndex.compact(batch.sparkSession, basePath)
        ()
      }
      .start()

  def dedupIngest(
      docs: DataFrame, basePath: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.9, compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.ext.Dedup
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def vp(v: Long) = s"$basePath/vocab_v$v"
        def pp(v: Long) = s"$basePath/postings_v$v"
        val committed = {
          val base = new org.apache.hadoop.fs.Path(basePath)
          if (!fs.exists(base)) Seq.empty[Long]
          else {
            // strict name match: a stray dir merely PREFIXED "vocab_v"
            // (temp file, future artifact) must be ignored, not crash the
            // micro-batch with a NumberFormatException
            val VocabV = "^vocab_v(\\d+)$".r
            fs.listStatus(base).toSeq.map(_.getPath.getName)
              .collect { case VocabV(v) => v.toLong }
          }
        }
        val (postings, vocab) = committed.filter(_ < batchId).sorted.lastOption match {
          case Some(v) => (spark.read.parquet(pp(v)), spark.read.parquet(vp(v)))
          case None    => Dedup.prefixIndex(batch.limit(0), idCol, textCol, threshold)
        }
        val kept = Dedup.incrementalNearDupExact(
          batch, postings, vocab, idCol, textCol, threshold).barrier(eager = true)
        kept.write.mode("overwrite").parquet(s"$basePath/corpus/batch=$batchId")
        val (p2, v2) = Dedup.extendPrefixIndex(
          kept, postings, vocab, idCol, textCol, threshold)
        p2.write.mode("overwrite").parquet(pp(batchId))
        v2.write.mode("overwrite").parquet(vp(batchId)) // commit marker, last
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          Dedup.compactCorpus(spark, basePath)
          Dedup.vacuumDedupState(spark, basePath)
        }
        ()
      }
      .start()

  /** STREAMING DSIR ADMISSION — [[graft.ext.CorpusOps.importanceWeights]]
    * as an ingest pipeline (the [[dedupIngest]] protocol for the
    * data-selection tier): each micro-batch of documents is scored
    * against the target/background bucket counts ACCUMULATED FROM PRIOR
    * BATCHES (never against its own contents — the online estimator), docs
    * with weight ≥ `threshold` are admitted to `corpus/batch=<id>`, and
    * the counts are extended by the WHOLE batch (admitted or not:
    * background statistics describe what arrived, not what survived;
    * target counts from rows where `targetCol` is true).
    *
    * Replay idempotency is [[dedupIngest]]'s version-below-batch protocol
    * verbatim: scoring reads the newest `counts_v<id>` with id strictly
    * below the current batch, every write is a per-batch-directory
    * overwrite, and `counts_v<id>` is written LAST as the batch's commit
    * marker — a replayed batch re-scores against the same prior state and
    * rewrites identical outputs. Cold start: with no prior counts every
    * bucket is unseen, all weights are exactly 1.0, and a threshold ≤ 1
    * admits the whole first batch — the bootstrap a selection loop wants
    * (document the dial; raise the threshold once the estimator warms).
    *
    * 100 TB shape: state is two `buckets`-row count tables (broadcast
    * forever, the point of DSIR's hashed projection); per-batch cost is
    * one explode scan of the batch + a batch-keyed aggregate — never
    * O(corpus). */
  def dsirIngest(
      docs: DataFrame, basePath: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      targetCol: String = "is_target", threshold: Double = 1.0,
      buckets: Int = 64, vacuumEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.ext.CorpusOps
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def cp(v: Long) = s"$basePath/counts_v$v"
        val committed = {
          val base = new org.apache.hadoop.fs.Path(basePath)
          if (!fs.exists(base)) Seq.empty[Long]
          else {
            val CountsV = "^counts_v(\\d+)$".r
            fs.listStatus(base).toSeq.map(_.getPath.getName)
              .collect { case CountsV(v) => v.toLong }
          }
        }
        // prior state, strictly below this batch (replay-stable)
        val prior = committed.filter(_ < batchId).sorted.lastOption
          .map(v => spark.read.parquet(cp(v)))
        def priorKind(k: String) = prior match {
          case Some(df) => df.filter(col("kind") === k)
            .select(col("b"), col("c"))
          case None => spark.range(0)
            .select(col("id").cast("int").as("b"), col("id").as("c"))
        }
        val toks = CorpusOps.tokenBuckets(
          batch, col(targetCol), idCol, textCol, buckets).barrier(eager = true)
        val w = CorpusOps.importanceWeightsAgainst(toks,
          priorKind("b").withColumnRenamed("c", "cb"),
          priorKind("t").withColumnRenamed("c", "ct"))
        batch.join(w.filter(col("w") >= threshold)
            .select(col("id").as(idCol), col("w")), Seq(idCol))
          .write.mode("overwrite").parquet(s"$basePath/corpus/batch=$batchId")
        // extend counts by the whole batch; written LAST = commit marker
        val batchCounts = toks.groupBy(col("b")).agg(count(lit(1)).as("c"))
          .select(lit("b").as("kind"), col("b"), col("c"))
          .unionByName(toks.filter(col("is_t")).groupBy(col("b"))
            .agg(count(lit(1)).as("c"))
            .select(lit("t").as("kind"), col("b"), col("c")))
        val merged = prior match {
          case Some(df) => df.unionByName(batchCounts)
            .groupBy(col("kind"), col("b")).agg(sum(col("c")).as("c"))
          case None => batchCounts
        }
        merged.write.mode("overwrite").parquet(cp(batchId))
        // vacuumEvery > 0: every version is a FULL count snapshot, so all
        // but the newest TWO are dead weight (two, not one — a replayed
        // batch reads the version strictly below itself). Uncompacted the
        // state dir accretes one counts_v per micro-batch forever — the
        // dedupIngest pathology, minus the fold (nothing to fold: each
        // snapshot is already complete).
        if (vacuumEvery > 0 && (batchId + 1) % vacuumEvery == 0) {
          val keep = (committed :+ batchId).distinct.sorted.takeRight(2).toSet
          committed.filterNot(keep.contains).foreach { v =>
            fs.delete(new org.apache.hadoop.fs.Path(cp(v)), true)
          }
        }
        ()
      }
      .start()

  /** STREAMING SCD2 MAINTENANCE — [[graft.ext.Scd]]'s incremental
    * dimension kept fresh from a change feed: each micro-batch of
    * observations folds into the persisted dimension via
    * [[graft.ext.Scd.applyBatch]] (bootstrap on the first batch,
    * current-rows-only incremental apply after — never a history
    * rescan). Replay idempotency is batchId-keyed in the dimension's own
    * commit log, the [[annIngest]] protocol: an at-least-once redelivery
    * is recognized and skipped, a crashed half-commit is invisible
    * (marker-last). The source must deliver per-key observations in
    * order (the CDC-feed contract); late data fails loudly inside the
    * batch rather than silently rewriting closed history. */
  def scd2Ingest(
      observations: DataFrame, basePath: String, checkpoint: String,
      keyCols: Seq[String], tsCol: String, tieCol: String,
      attrCols: Seq[String], compactEvery: Int = 0): StreamingQuery =
    observations.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ext.Scd.applyBatch(batch.sparkSession, basePath, batch,
          keyCols, tsCol, tieCol, attrCols, batchId)
        // same maintenance dial as annIngest: fold accreted closed-delta
        // dirs every N batches so a long-running stream's read set stays
        // bounded (single-writer inside the same foreachBatch)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.ext.Scd.compactClosed(batch.sparkSession, basePath)
        ()
      }
      .start()

  /** STREAMING AGGREGATE MAINTENANCE — [[graft.ext.IncrementalAgg]] fed
    * per micro-batch: the per-key rollup extends by one batch-sized
    * partial aggregation + one |keys|-row merge per trigger, with the
    * same batchId-keyed commit-log replay dedup as [[scd2Ingest]]. The
    * alternative to a stateful streaming agg when the result must live
    * in a versioned, time-travelable TABLE rather than a state store —
    * and the maintenance loop never grows with corpus size. */
  def aggIngest(
      facts: DataFrame, basePath: String, checkpoint: String,
      keys: Seq[String], valueCol: String): StreamingQuery =
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ext.IncrementalAgg.update(batch.sparkSession, basePath, batch,
          keys, valueCol, batchId)
        ()
      }
      .start()
}
