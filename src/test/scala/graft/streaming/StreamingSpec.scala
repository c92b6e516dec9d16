package graft.streaming

import graft.SparkSuite
import graft.gen.TxnGen
import graft.sources.VersionedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class Ev(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
  val clock = java.sql.Timestamp.valueOf("2024-06-02 00:00:00")

  private def tmp(): String = Files.createTempDirectory("graft-stream").toString

  // r16: the 266 batch query plans are linted in the driver's own sessions,
  // but foreachBatch bodies plan PER MICRO-BATCH and never went through
  // ScaleLint. This listener lints every batch action the suite runs —
  // crucially the StreamPipes ingest pipelines' micro-batch plans — and the
  // suite's final test asserts the whole run stayed clean.
  private val lintErrors = java.util.Collections.synchronizedList(
    new java.util.ArrayList[String]())
  private val lintListener = new org.apache.spark.sql.util.QueryExecutionListener {
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit =
      graft.plans.ScaleLint.lint(qe.optimizedPlan)
        .filter(_.severity == graft.plans.ScaleLint.Error)
        .foreach(f => lintErrors.add(s"${f.rule}: ${f.detail}"))
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()
  }
  spark.listenerManager.register(lintListener)

  test("bronze ingest: checkpointed availableNow parquet sink, partitioned (S2/S8/S9/ST1)") {
    val dir = tmp()
    val bronzePath = s"$dir/bronze"
    // batch-as-stream through the generator derivation over a file source:
    // write raw values, stream-read them, derive, sink
    val rawPath = s"$dir/raw"
    spark.range(200).toDF("value")
      .withColumn("event_timestamp", timestamp_micros(lit(t0.getTime * 1000L) + col("value") * 50000L))
      .write.parquet(rawPath)
    val src = spark.readStream
      .schema("value LONG, event_timestamp TIMESTAMP")
      .parquet(rawPath)
    val q = StreamPipes.bronzeSink(TxnGen.derive(src, clock), bronzePath, s"$dir/ckpt")
    q.awaitTermination()
    val out = spark.read.parquet(bronzePath)
    assert(out.count() === 200)
    assert(out.columns.contains("transaction_id"))
    // restart with same checkpoint: no new data -> no duplicates (ST3)
    val q2 = StreamPipes.bronzeSink(
      TxnGen.derive(spark.readStream.schema("value LONG, event_timestamp TIMESTAMP").parquet(rawPath), clock),
      bronzePath, s"$dir/ckpt")
    q2.awaitTermination()
    assert(spark.read.parquet(bronzePath).count() === 200)
  }

  test("silver foreachBatch: DQ + merge, idempotent under source replay (S4/ST6)") {
    val dir = tmp()
    val bronzePath = s"$dir/bronze"
    TxnGen.batch(spark, 300, t0, clock).write.parquet(bronzePath)
    val schema = spark.read.parquet(bronzePath).schema
    def runOnce(ckpt: String) = {
      val q = StreamPipes.silverForeachBatch(
        StreamPipes.tableStream(spark, bronzePath, schema),
        s"$dir/silver", s"$dir/quarantine", ckpt, clock, TxnGen.ValidMcc)
      q.awaitTermination()
    }
    runOnce(s"$dir/ckpt1")
    val v1 = VersionedTable.read(spark, s"$dir/silver").get
    assert(v1.count() === 300)
    // replay the SAME data with a FRESH checkpoint: merge keyed on
    // transaction_id must leave the table unchanged (exactly-once by key)
    runOnce(s"$dir/ckpt2")
    val v2 = VersionedTable.read(spark, s"$dir/silver").get
    assert(v2.count() === 300)
    assert(v2.select("transaction_id").distinct().count() === 300)
  }

  test("watermarked hourly aggregate emits closed windows (ST7)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPipes.watermarkedHourly(mem.toDF())
      .writeStream.format("memory").queryName("wm_hourly").outputMode("append").start()
    def ev(min: Int, typ: String, v: Double) =
      Ev(java.sql.Timestamp.valueOf(f"2024-06-01 10:$min%02d:00"), 1L, typ, v)
    mem.addData(ev(5, "click", 1.0), ev(20, "click", 2.0), ev(40, "view", 3.0))
    q.processAllAvailable()
    // advance event time beyond 11:00 + 10min watermark to close the 10:00 window
    mem.addData(Ev(java.sql.Timestamp.valueOf("2024-06-01 11:30:00"), 1L, "click", 9.0))
    q.processAllAvailable()
    val out = spark.table("wm_hourly").as[(java.sql.Timestamp, String, Long, Double)].collect()
    q.stop()
    val closed = out.filter(_._1 === java.sql.Timestamp.valueOf("2024-06-01 10:00:00"))
    assert(closed.map(r => r._2 -> ((r._3, r._4))).toMap ===
      Map("click" -> ((2L, 3.0)), "view" -> ((1L, 3.0))))
  }

  test("session windows group by gap (ST7)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamPipes.sessionWindows(mem.toDF(), "5 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    def at(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      Ev(at("2024-06-01 10:00:00"), 7L, "a", 1.0),
      Ev(at("2024-06-01 10:02:00"), 7L, "a", 2.0), // same session
      Ev(at("2024-06-01 10:30:00"), 7L, "a", 4.0)) // new session
    mem.addData(Ev(at("2024-06-01 12:00:00"), 7L, "a", 0.0)) // advance watermark
    q.processAllAvailable()
    val out = spark.table("sessions")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long, Double)].collect()
    q.stop()
    val u7 = out.filter(r => r._3 == 7L && r._1.before(at("2024-06-01 11:00:00")))
      .sortBy(_._1.getTime)
    assert(u7.length === 2)
    assert(u7(0)._4 === 2L && u7(0)._5 === 3.0)
    assert(u7(1)._4 === 1L && u7(1)._5 === 4.0)
  }

  test("dropDuplicatesWithinWatermark dedups keyed replays (ST7)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val deduped = StreamPipes.dedupWithinWatermark(mem.toDF(), Seq("user_id", "event_type"))
    val q = deduped.writeStream.format("memory").queryName("dedup").outputMode("append").start()
    def at(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      Ev(at("2024-06-01 10:00:00"), 1L, "x", 1.0),
      Ev(at("2024-06-01 10:00:30"), 1L, "x", 1.0), // dup within watermark
      Ev(at("2024-06-01 10:01:00"), 2L, "x", 1.0))
    q.processAllAvailable()
    val n = spark.table("dedup").count()
    q.stop()
    assert(n === 2)
  }

  test("stream-stream join matches within the time range, bounded state (ST7)") {
    def ts(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val views = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val joined = StreamPipes.streamStreamJoin(
      clicks.toDF.toDF("ts", "user_id", "click_id"),
      views.toDF.toDF("rts", "r_user_id", "view_id"),
      "user_id", "r_user_id", "ts", "rts", lookback = "5 minutes")
    val q = joined.select("click_id", "view_id").writeStream
      .format("memory").queryName("ssj").outputMode("append").start()
    try {
      // view v1 at t+0; clicks: same user in-range (c1, +60 s), same user
      // out-of-range (c2, +6 min), other user (c3)
      views.addData((ts(0), 7L, "v1"))
      clicks.addData((ts(60), 7L, "c1"), (ts(360), 7L, "c2"), (ts(60), 8L, "c3"))
      q.processAllAvailable()
      val got = spark.table("ssj").as[(String, String)].collect().toSet
      assert(got === Set(("c1", "v1")), s"only the in-range same-user pair joins: $got")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null-padded rows after watermark (ST9)") {
    def ts(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val views = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val joined = StreamPipes.streamStreamJoin(
      clicks.toDF.toDF("ts", "user_id", "click_id"),
      views.toDF.toDF("rts", "r_user_id", "view_id"),
      "user_id", "r_user_id", "ts", "rts",
      watermark = "1 minutes", lookback = "5 minutes", joinType = "left_outer")
    val q = joined.select("click_id", "view_id").writeStream
      .format("memory").queryName("ssjo").outputMode("append").start()
    try {
      views.addData((ts(0), 7L, "v1"))
      clicks.addData((ts(60), 7L, "c1"), (ts(60), 9L, "c_nomatch"))
      q.processAllAvailable()
      // advance both watermarks far past c_nomatch's join window so the
      // unmatched left row is finalized and emitted null-padded
      clicks.addData((ts(4000), 1L, "late_l"))
      views.addData((ts(4000), 2L, "late_r"))
      q.processAllAvailable()
      clicks.addData((ts(8000), 1L, "later_l"))
      views.addData((ts(8000), 2L, "later_r"))
      q.processAllAvailable()
      val got = spark.table("ssjo").as[(String, Option[String])].collect().toMap
      assert(got("c1") === Some("v1"), "matched pair joins")
      assert(got.get("c_nomatch") === Some(None), "unmatched left row emits null-padded")
    } finally q.stop()
  }

  test("streaming dedup ingest: cross-batch near-dup admission via the persisted index") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmp() + "/dedup-ingest"
    val ck = tmp() + "/dedup-ingest-ck"
    // seed baked into every token: different seeds share NOTHING at the
    // token level (the exact path's similarity space), unlike the LSH
    // tests' corpora whose seeds share all non-seed tokens
    def mk(n: Int, seed: String) =
      (0 until n).map(i => s"${seed}tok$i ${seed}word$i ${seed}item$i").mkString(" ")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    // batch 0: two fresh docs + one within-batch exact dup
    mem.addData((1L, mk(12, "alpha")), (2L, mk(12, "beta")), (3L, mk(12, "alpha")))
    val q1 = StreamPipes.dedupIngest(docs, base, ck)
    q1.awaitTermination()
    // batch 1: near-dup of batch-0 doc (cross-batch, via the index), a
    // fresh doc, and an exact dup of the fresh doc
    mem.addData((10L, mk(12, "alpha") + " extratok"), (11L, mk(12, "gamma")),
      (12L, mk(12, "gamma")))
    val q2 = StreamPipes.dedupIngest(docs, base, ck)
    q2.awaitTermination()
    val corpus = spark.read.parquet(s"$base/corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(corpus === Seq(1L, 2L, 11L),
      "batch-0 keeps 1,2 (3 = within-batch dup); batch-1 keeps only 11 " +
        "(10 = cross-batch near-dup of 1 caught through the persisted index, 12 = dup of 11)")
    // the index snapshots exist per committed batch, vocab marker last
    assert(spark.read.parquet(s"$base/vocab_v1").count() >
      spark.read.parquet(s"$base/vocab_v0").count(),
      "batch 1's fresh tokens must extend the vocabulary")
    // extended-index admission == fresh-rebuild admission (order only
    // steers pruning, never the decision): re-admit a probe batch against
    // both and compare
    import graft.ext.Dedup
    val probe = Seq((20L, mk(12, "gamma") + " moretok"), (21L, mk(12, "delta")))
      .toDF("doc_id", "text")
    val extKept = Dedup.incrementalNearDupExact(probe,
        spark.read.parquet(s"$base/postings_v1"), spark.read.parquet(s"$base/vocab_v1"),
        "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val fresh = Seq((1L, mk(12, "alpha")), (2L, mk(12, "beta")), (11L, mk(12, "gamma")))
      .toDF("doc_id", "text")
    val (fp, fv) = Dedup.prefixIndex(fresh, "doc_id", "text", 0.9)
    val freshKept = Dedup.incrementalNearDupExact(probe, fp, fv, "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(extKept === freshKept && extKept === Seq(21L),
      "extended and rebuilt indexes must admit identically (20 is a near-dup of 11)")
  }

  test("streaming dedup ingest with compaction: read set folds to one dir, admission and replay unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Dedup
    def mk(n: Int, seed: String) =
      (0 until n).map(i => s"${seed}tok$i ${seed}word$i ${seed}item$i").mkString(" ")
    def run(base: String, ck: String, compactEvery: Int): Seq[Long] = {
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      def step(data: (Long, String)*): Unit = {
        mem.addData(data: _*)
        StreamPipes.dedupIngest(docs, base, ck,
          compactEvery = compactEvery).awaitTermination()
      }
      step((1L, mk(12, "alpha")), (2L, mk(12, "beta")))
      step((10L, mk(12, "alpha") + " extratok"), (11L, mk(12, "gamma")))
      step((20L, mk(12, "delta")), (21L, mk(12, "gamma") + " moretok"))
      Dedup.readCorpus(spark, base).get
        .select($"doc_id").as[Long].collect().sorted.toSeq
    }
    val base = tmp() + "/dedup-compact"
    val got = run(base, tmp() + "/dedup-compact-ck", compactEvery = 1)
    // compaction is a pure LAYOUT change: same admissions as the
    // uncompacted twin run
    val twin = run(tmp() + "/dedup-nocompact", tmp() + "/dedup-nocompact-ck", 0)
    assert(got === twin && got === Seq(1L, 2L, 11L, 20L),
      "10 = cross-batch near-dup of 1, 21 = near-dup of 11 — both caught " +
        "through the persisted index across compactions")
    // the read set folded to ONE dir (the point of the cadence), covered
    // batch dirs and stale index snapshots were vacuumed (newest two kept
    // — a replayed batch reads the version strictly below itself)
    assert(Dedup.corpusDirs(spark, base) === Seq(s"$base/corpus/compact=2"))
    def exists(p: String) = new java.io.File(p).exists
    assert(!exists(s"$base/corpus/batch=0") && !exists(s"$base/corpus/batch=1"))
    assert(!exists(s"$base/vocab_v0") && !exists(s"$base/postings_v0"),
      "index snapshots older than the newest two are swept")
    assert(exists(s"$base/vocab_v1") && exists(s"$base/vocab_v2"))
    // completed-trigger restart with no new data: a no-op
    val before = got
    val memIdle = MemoryStream[(Long, String)]
    StreamPipes.dedupIngest(memIdle.toDF().toDF("doc_id", "text"), base,
      tmp() + "/dedup-compact-ck2", compactEvery = 1).awaitTermination()
    assert(Dedup.readCorpus(spark, base).get
      .select($"doc_id").as[Long].collect().sorted.toSeq === before)
    // REPLAY a covered batch (fresh checkpoint restarts at batchId 0, the
    // dsir replay pattern): the rewritten batch=0 dir is COVERED by
    // compact=2, so the read set must not double-count docs 1 and 2
    val memR = MemoryStream[(Long, String)]
    memR.addData((1L, mk(12, "alpha")), (2L, mk(12, "beta")))
    StreamPipes.dedupIngest(memR.toDF().toDF("doc_id", "text"), base,
      tmp() + "/dedup-replay-ck", compactEvery = 0).awaitTermination()
    assert(Dedup.readCorpus(spark, base).get
      .select($"doc_id").as[Long].collect().sorted.toSeq === before,
      "a replayed covered batch rewrites an invisible dir — no double-read")
  }

  test("DSIR vacuum cadence: stale count snapshots swept, admissions unchanged") {
    implicit val sqlCtx = spark.sqlContext
    def run(base: String, ck: String, vacuumEvery: Int): Seq[Seq[Long]] = {
      val mem = MemoryStream[(Long, String, Boolean)]
      val docs = mem.toDF().toDF("doc_id", "text", "is_target")
      def step(data: (Long, String, Boolean)*): Seq[Long] = {
        mem.addData(data: _*)
        StreamPipes.dsirIngest(docs, base, ck,
          vacuumEvery = vacuumEvery).awaitTermination()
        val b = new java.io.File(s"$base/corpus").listFiles()
          .map(_.getName).filter(_.startsWith("batch=")).max
        spark.read.parquet(s"$base/corpus/$b")
          .select($"doc_id").as[Long].collect().sorted.toSeq
      }
      Seq(
        step((1L, "aa bb aa", true), (2L, "cc dd cc", false)),
        step((10L, "aa bb aa bb", false), (11L, "cc dd cc dd", false)),
        step((20L, "aa bb", true)))
    }
    val base = tmp() + "/dsir-vac"
    val got = run(base, tmp() + "/dsir-vac-ck", vacuumEvery = 1)
    val twin = run(tmp() + "/dsir-novac", tmp() + "/dsir-novac-ck", 0)
    assert(got === twin, "vacuum is a pure storage change, never an admission change")
    def exists(p: String) = new java.io.File(p).exists
    assert(!exists(s"$base/counts_v0"), "stale snapshot swept")
    assert(exists(s"$base/counts_v1") && exists(s"$base/counts_v2"),
      "newest two snapshots kept (replay reads the version strictly below itself)")
  }

  test("streaming DSIR admission: scores against prior-batch counts only, replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmp() + "/dsir-ingest"
    val ck = tmp() + "/dsir-ingest-ck"
    // tokens chosen for DISTINCT feature buckets (aa→6, bb→14, cc→22,
    // dd→30 under the portable hash) so count arithmetic is readable
    val mem = MemoryStream[(Long, String, Boolean)]
    val docs = mem.toDF().toDF("doc_id", "text", "is_target")
    // batch 0 — cold start: no prior counts exist, so every bucket is
    // unseen and every weight is EXACTLY 1.0 (num = den = Σ n·1);
    // threshold 1.0 admits the whole bootstrap batch
    mem.addData((1L, "aa bb aa", true), (2L, "cc dd cc", false))
    StreamPipes.dsirIngest(docs, base, ck).awaitTermination()
    val b0 = spark.read.parquet(s"$base/corpus/batch=0")
    assert(b0.select($"doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(b0.select($"w").as[Double].collect().forall(_ == 1.0),
      "cold-start weights must be exactly 1.0")
    // batch 1 — scored against batch 0's accumulated counts: doc 10
    // re-uses only TARGET tokens (ct == cb in its buckets ⇒ w = 1.0,
    // admitted); doc 11 re-uses only BACKGROUND tokens (ct = 0 ⇒
    // w = Σn·1 / Σn·(cb+1) = 4/10 = 0.4, rejected). Neither batch-1 doc
    // influences its own score — the online-estimator contract.
    mem.addData((10L, "aa bb aa bb", false), (11L, "cc dd cc dd", false))
    StreamPipes.dsirIngest(docs, base, ck).awaitTermination()
    assert(spark.read.parquet(s"$base/corpus/batch=1")
      .select($"doc_id").as[Long].collect().toSeq === Seq(10L),
      "in-domain doc admitted at 1.0, background-only doc rejected at 0.4")
    // counts accumulate over the WHOLE batch (rejected docs included):
    // bucket 6 (aa) saw 2 from batch 0 + 2 from doc 10
    val c1 = spark.read.parquet(s"$base/counts_v1")
    assert(c1.filter($"kind" === "b" && $"b" === 6).select($"c")
      .as[Long].head() === 4L)
    assert(c1.filter($"kind" === "t" && $"b" === 6).select($"c")
      .as[Long].head() === 2L, "target counts only from is_target rows")
    // REPLAY batch 0 (fresh checkpoint, same state dir): scoring reads
    // counts strictly BELOW the batch id — none for batch 0 — so the
    // replay re-scores cold and rewrites bit-identical outputs even
    // though counts_v0/v1 already exist
    val before = spark.read.parquet(s"$base/corpus/batch=0")
      .select($"doc_id", $"w").as[(Long, Double)].collect().toSet
    val mem2 = MemoryStream[(Long, String, Boolean)]
    mem2.addData((1L, "aa bb aa", true), (2L, "cc dd cc", false))
    StreamPipes.dsirIngest(mem2.toDF().toDF("doc_id", "text", "is_target"),
      base, tmp() + "/dsir-replay-ck").awaitTermination()
    assert(spark.read.parquet(s"$base/corpus/batch=0")
      .select($"doc_id", $"w").as[(Long, Double)].collect().toSet === before,
      "replayed batch must rewrite identical admissions")
    assert(spark.read.parquet(s"$base/counts_v0")
      .select($"kind", $"b", $"c").as[(String, Int, Long)].collect().toSet
      === Set(("b", 6, 2L), ("b", 14, 1L), ("b", 22, 2L), ("b", 30, 1L),
        ("t", 6, 2L), ("t", 14, 1L)),
      "replayed batch must rewrite identical counts")
  }

  test("streaming ANN ingest: persisted index extends per batch, replay-idempotent, search == inline") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.{AnnIndex, Similarity}
    val base = tmp() + "/ann-ingest"
    val ck = tmp() + "/ann-ingest-ck"
    val emb = graft.Tables.load(spark, sf("e"), "embeddings")
    val corpus = emb.select($"vec_id".as("id"),
      $"embedding".cast("array<double>").as("vec"))
    // production split: quantizers train ONCE (here on the full corpus —
    // a sample works identically), then the stream only ever extends
    AnnIndex.train(spark, base, corpus, nCentroids = 8, m = 4, ksub = 16)
    val mem = MemoryStream[(Long, Seq[Double])]
    val vectors = mem.toDF().toDF("id", "vec")
    val half = corpus.as[(Long, Seq[Double])].collect()
    mem.addData(half.filter(_._1 % 2 == 0).toSeq)
    StreamPipes.annIngest(vectors, base, ck).awaitTermination()
    val afterB0 = AnnIndex.readIndex(spark, base).count()
    mem.addData(half.filter(_._1 % 2 == 1).toSeq)
    StreamPipes.annIngest(vectors, base, ck).awaitTermination()
    // extension == rebuild THROUGH THE PERSISTED ARTIFACTS: the on-disk
    // code table after two incremental batches is row-identical to an
    // inline full rebuild against the same (frozen) quantizers
    val (_, cents, books, m) = AnnIndex.quantizer(spark, base)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"cid", $"codes").as[(Long, Long, Seq[Int])].collect().toSet
    val persisted = rows(AnnIndex.readIndex(spark, base))
    assert(afterB0 < persisted.size, "batch 1 must extend, not replace")
    assert(persisted === rows(
      Similarity.ivfPqResidualEncode(corpus, cents, books, m)),
      "persisted two-batch extension must equal the inline full rebuild")
    // replay idempotency: re-running the SAME batch id overwrites its own
    // shard with identical content — no duplicates, no drift
    AnnIndex.extendBatch(spark, base,
      corpus.filter($"id" % 2 === 0), batchId = 0L)
    assert(rows(AnnIndex.readIndex(spark, base)) === persisted,
      "a replayed micro-batch must leave the index bit-identical")
    // a completed AvailableNow restart with no new data is a no-op
    StreamPipes.annIngest(vectors, base, ck).awaitTermination()
    assert(rows(AnnIndex.readIndex(spark, base)) === persisted)
    // search over the persisted index == search over inline artifacts
    val queries = corpus.filter($"id" < 5)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val fromDisk = AnnIndex.search(spark, base, queries, k = 10, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val inline = Similarity.ivfPqResidualTopK(
        Similarity.ivfPqResidualEncode(corpus, cents, books, m),
        cents, books, queries, m, k = 10, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fromDisk === inline,
      "persisted-index search must match the inline plan exactly")
  }

  test("versioned table: commit/read/time-travel/vacuum") {
    val base = tmp() + "/vt"
    val df1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val v0 = VersionedTable.commit(spark, base, df1)
    val v1 = VersionedTable.commit(spark, base, df1.withColumn("v", upper($"v")))
    assert(v0 === 0L && v1 === 1L)
    assert(VersionedTable.read(spark, base).get.as[(Int, String)].collect().toSet ===
      Set((1, "A"), (2, "B")))
    assert(VersionedTable.readVersion(spark, base, 0).as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b")))
    VersionedTable.vacuum(spark, base)
    assertThrows[Exception](VersionedTable.readVersion(spark, base, 0).collect())
  }

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, Stateful.RocksDbProvider)
    try f
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("transformWithState accumulates per-key state across micro-batches (ST8)") {
    withRocksDb {
      val in = MemoryStream[(String, Double)](spark)
      val out = Stateful.runningTotals(in.toDS().groupByKey(_._1))
      val ckpt = tmp() + "/ckpt"
      val q = out.writeStream.format("memory").queryName("tws_totals")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        in.addData(("m1", 10.0), ("m1", 5.0), ("m2", 2.0))
        q.processAllAvailable()
        in.addData(("m1", 1.0))
        q.processAllAvailable()
        // memory sink in update mode appends per-batch emissions; the last
        // emission per key is the running total
        val last = spark.table("tws_totals").as[(String, Long, Double)]
          .collect().groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
        assert(last("m1") === (("m1", 3L, 16.0)), "m1: 3 txns, 16.0 total")
        assert(last("m2") === (("m2", 1L, 2.0)))
      } finally q.stop()
    }
  }

  test("space-saving heavy hitters: capacity-bounded state, guarantee holds across micro-batches") {
    withRocksDb {
      val cap = 3
      val in = MemoryStream[String](spark)
      val keyed = in.toDS().map(s => (math.abs(s.hashCode % 2), s))
        .groupByKey(_._1)
      val out = Stateful.heavyHitters(keyed, cap)
      val ckpt = tmp() + "/hh-ckpt"
      val q = out.writeStream.format("memory").queryName("tws_hh")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        // a skewed stream: "hot" dominates, tail items churn the summary
        val items = Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
          Seq("t1", "t2", "t3", "t4", "t5", "t6")
        in.addData(items.take(20): _*)
        q.processAllAvailable()
        in.addData(items.drop(20): _*)
        q.processAllAvailable()
        // last emission per (shard, item) is the current summary state
        val last = spark.table("tws_hh").as[(Int, String, Long, Long)]
          .collect().groupBy(t => (t._1, t._2))
          .map { case (_, vs) => vs.maxBy(_._3) }.toSeq
        val byShard = last.groupBy(_._1)
        for ((shard, entries) <- byShard)
          assert(entries.map(_._2).distinct.size <= cap,
            s"shard $shard summary exceeds capacity: $entries")
        val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        // the space-saving guarantee, per item still in the summary:
        // true count ∈ [count − overestimate, count]
        for ((_, item, c, e) <- last) {
          val t = trueCounts(item)
          assert(t <= c && t >= c - e,
            s"$item: true $t outside [${c - e}, $c]")
        }
        // any item with frequency > N_shard/cap must be present — "hot"
        // and "warm" dominate their shards
        assert(last.exists(_._2 == "hot"), "dominant item must survive")
        assert(last.exists(_._2 == "warm"), "second heavy item must survive")
        // GLOBAL VIEW: the reader-side merge of the disjoint shard
        // summaries ([[graft.ext.SpaceSaving.mergeShards]]) — certificates
        // and heavy-item presence must survive the concat+trim
        val global = graft.ext.SpaceSaving.mergeShards(
            last.toSeq.toDF("shard", "item", "count", "over").drop("shard"), cap)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        assert(global.length <= cap)
        for ((item, c, e) <- global) {
          val t = trueCounts(item)
          assert(t <= c && t >= c - e, s"global $item: true $t outside [${c - e}, $c]")
        }
        assert(global.exists(_._1 == "hot") && global.exists(_._1 == "warm"),
          "heavy items must survive the global merge")
      } finally q.stop()
    }
  }

  test("streaming KMV: summary equals the batch bottom-k EXACTLY across slicing, duplicates, and merge") {
    withRocksDb {
      val P = 1000003L
      def h(x: Long) = math.floorMod(math.floorMod(x, P) * 2654435761L, P)
      val k = 8
      val items: Seq[Long] = (0L until 300L) ++ (50L until 150L) // re-arrivals
      val in = MemoryStream[Long](spark)
      val out = Stateful.kmv(
        in.toDS().map(x => ((x % 2).toInt, x)).groupByKey(_._1), k)
      val ckpt = tmp() + "/kmv-ckpt"
      val q = out.writeStream.format("memory").queryName("tws_kmv")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        in.addData(items.take(37): _*); q.processAllAvailable()
        in.addData(items.slice(37, 38): _*); q.processAllAvailable()
        in.addData(items.drop(38): _*); q.processAllAvailable()
        // every emitted row was once in a bottom-k; the FINAL summary per
        // shard is the bottom-k of the distinct emitted rows (hashes only
        // ever shrink)
        val emitted = spark.table("tws_kmv").as[(Int, Long, Long)]
          .collect().toSet
        val got = emitted.groupBy(_._1).map { case (sh, rows) =>
          sh -> rows.map(r => (r._3, r._2)).toSeq.sorted.take(k) }
        // batch truth: bottom-k by (hash, item) of each shard's distinct items
        val expect = items.distinct.groupBy(x => (x % 2).toInt)
          .map { case (sh, xs) => sh -> xs.map(x => (h(x), x)).sorted.take(k) }
        assert(got === expect,
          "streaming KMV must BIT-match the batch bottom-k (deterministic sketch)")
        // shard merge: pooled summaries re-trimmed = global bottom-k
        val global = got.values.flatten.toSeq.sorted.take(k)
        val globalExpect = items.distinct.map(x => (h(x), x)).sorted.take(k)
        assert(global === globalExpect)
      } finally q.stop()
    }
  }

  test("streaming funnel: stage first-hits match batch q200 semantics at every boundary") {
    withRocksDb {
      // hand-built progression exercising every guard: a click BEFORE the
      // signup (skipped), stage hits at EQUAL timestamps (strictly-after
      // excluded, matching q200's us > t comparisons), a purchase with no
      // click (skipped), a user who never signs up
      val events = Seq(
        (13L, 1L, 9L, "click"),    // never signs up
        (12L, 2L, 7L, "signup"),
        (11L, 3L, 1L, "click"),    // before user 11's signup — skipped
        (11L, 5L, 2L, "signup"),
        (11L, 5L, 3L, "click"),    // ts == signup ts — not strictly after
        (11L, 8L, 4L, "click"),    // arms stage 2
        (11L, 8L, 5L, "purchase"), // ts == click ts — not strictly after
        (12L, 9L, 8L, "purchase"), // no click yet — skipped
        (11L, 12L, 6L, "purchase") // converts
      )
      val in = MemoryStream[(Long, Long, Long, String)](spark)
      val out = Stateful.funnel(in.toDS().groupByKey(_._1))
      val ckpt = tmp() + "/funnel-ckpt"
      val q = out.writeStream.format("memory").queryName("tws_funnel")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        // uneven ts-ordered slicing (the watermark contract): 5 / 2 / 2
        in.addData(events.take(5): _*); q.processAllAvailable()
        in.addData(events.slice(5, 7): _*); q.processAllAvailable()
        in.addData(events.drop(7): _*); q.processAllAvailable()
        val emitted = spark.table("tws_funnel")
          .as[(Long, Long, Long, Long)].collect().toSet
        val expect = Set(
          (13L, -1L, -1L, -1L), // batch 1: click without signup
          (12L, 2L, -1L, -1L),  // batch 1 AND batch 3 (purchase skipped)
          (11L, 5L, -1L, -1L),  // batch 1: early/equal clicks excluded
          (11L, 5L, 8L, -1L),   // batch 2: equal-ts purchase excluded
          (11L, 5L, 8L, 12L))   // batch 3: converted
        assert(emitted === expect,
          s"funnel emissions must match the q200 fold at every boundary: $emitted")
      } finally q.stop()
    }
  }

  test("streaming funnel: violated watermark contract fails loudly, not silently") {
    withRocksDb {
      val in = MemoryStream[(Long, Long, Long, String)](spark)
      val out = Stateful.funnel(in.toDS().groupByKey(_._1))
      val ckpt = tmp() + "/funnel-guard-ckpt"
      val q = out.writeStream.format("memory").queryName("tws_funnel_guard")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        in.addData((21L, 10L, 5L, "signup")); q.processAllAvailable()
        // exact replay of the high-water-mark row is tolerated
        // (at-least-once re-delivery); the first-hit fold makes it a no-op
        in.addData((21L, 10L, 5L, "signup")); q.processAllAvailable()
        assert(spark.table("tws_funnel_guard")
          .as[(Long, Long, Long, Long)].collect().toSet === Set((21L, 10L, -1L, -1L)))
        // a row BEFORE the mark violates the order contract: the query
        // must FAIL (silently folding it would mis-stage the funnel)
        in.addData((21L, 4L, 1L, "click"))
        val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def chain(t: Throwable): Seq[Throwable] =
          if (t == null) Seq.empty else t +: chain(t.getCause)
        assert(chain(err).exists(t =>
          Option(t.getMessage).exists(_.contains("out-of-order"))),
          s"failure must name the order-contract violation: $err")
      } finally q.stop()
    }
  }

  test("streaming funnel dead-letter mode: violator quarantined, other keys stay exact (r17)") {
    withRocksDb {
      val in = MemoryStream[(Long, Long, Long, String)](spark)
      val out = Stateful.funnelDeadLetter(in.toDS().groupByKey(_._1))
      val ckpt = tmp() + "/funnel-dl-ckpt"
      val q = out.writeStream.format("memory").queryName("tws_funnel_dl")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        // batch 1: two healthy keys progress
        in.addData((31L, 10L, 1L, "signup"), (32L, 11L, 2L, "signup"))
        q.processAllAvailable()
        // batch 2: key 31 violates the order contract (ts 4 < hwm 10);
        // key 32 progresses normally — the stream must NOT fail
        in.addData((31L, 4L, 3L, "click"), (32L, 15L, 4L, "click"))
        q.processAllAvailable()
        // batch 3: the frozen key's later (in-order!) rows stay quarantined
        // — a fold that saw disorder is untrusted forever; key 32 converts
        in.addData((31L, 20L, 5L, "click"), (32L, 18L, 6L, "purchase"))
        q.processAllAvailable()
        val rows = spark.table("tws_funnel_dl")
          .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
        // healthy key: exact FunnelProcessor parity at every boundary
        assert(rows.filter(_._1 == 32L) === Set(
          (32L, 11L, -1L, -1L, 0L, false),
          (32L, 11L, 15L, -1L, 0L, false),
          (32L, 11L, 15L, 18L, 0L, false)))
        // violator: state frozen at the last good fold, tally counts every
        // quarantined row, frozen rows ARE the side output
        assert(rows.filter(_._1 == 31L) === Set(
          (31L, 10L, -1L, -1L, 0L, false),
          (31L, 10L, -1L, -1L, 1L, true),
          (31L, 10L, -1L, -1L, 2L, true)))
      } finally q.stop()
    }
  }

  test("streaming CUSUM: bit-matches the batch prefix fold at every micro-batch boundary") {
    withRocksDb {
      val mu = 0.5
      val events = (0 until 25).map { i =>
        (3L, i.toLong, i.toLong, ((i * 2654435761L % 97) / 97.0))
      }
      val in = MemoryStream[(Long, Long, Long, Double)](spark)
      val out = Stateful.cusum(in.toDS().groupByKey(_._1), mu)
      val ckpt = tmp() + "/cusum-ckpt"
      val q = out.writeStream.format("memory").queryName("tws_cusum")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        // uneven slicing: 7 / 1 / 17 — each emission must equal the exact
        // prefix fold up to that boundary
        val cuts = Seq(7, 8, 25)
        in.addData(events.take(7): _*); q.processAllAvailable()
        in.addData(events.slice(7, 8): _*); q.processAllAvailable()
        in.addData(events.drop(8): _*); q.processAllAvailable()
        val emitted = spark.table("tws_cusum").as[(Long, Long, Double)]
          .collect().sortBy(_._2)
        val expect = cuts.map { n =>
          val c = events.take(n).sortBy(e => (e._2, e._3))
            .foldLeft(0.0)((acc, e) => math.max(0.0, acc + (e._4 - mu)))
          (3L, n.toLong, c)
        }
        assert(emitted.toSeq === expect,
          "each micro-batch emission must BIT-match the batch prefix fold")
      } finally q.stop()
    }
  }

  // PARITY MATRIX over α — the smoothing constant is a parameter on both
  // twins now, so the bit-parity contract is checked at two distinct
  // alphas (a baked-in constant passing at one α proves nothing about the
  // parameterization)
  for (alpha <- Seq(0.25, 0.1))
  test(s"streaming EWMA (alpha=$alpha): exact straight-fold recurrence across any micro-batch slicing; matches batch q151 to 1e-9") {
    withRocksDb {
      val events = (0 until 40).map { i =>
        (7L, i.toLong, i.toLong, ((i * 2654435761L % 997) / 997.0))
      } ++ (0 until 5).map { i => (9L, i.toLong, i.toLong, i * 1.0) }
      val in = MemoryStream[(Long, Long, Long, Double)](spark)
      val out = Stateful.ewma(in.toDS().groupByKey(_._1), alpha)
      val ckpt = tmp() + s"/ewma-ckpt-$alpha"
      val q = out.writeStream.format("memory").queryName(s"tws_ewma_${(alpha * 100).toInt}")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        // uneven slicing ACROSS keys and batches — the recurrence must
        // not care where micro-batch boundaries fall
        in.addData(events.take(13): _*); q.processAllAvailable()
        in.addData(events.slice(13, 14): _*); q.processAllAvailable()
        in.addData(events.drop(14): _*); q.processAllAvailable()
        val last = spark.table(s"tws_ewma_${(alpha * 100).toInt}")
          .as[(Long, Long, Double)]
          .collect().groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
        val byKey = events.groupBy(_._1)
        for ((k, evs) <- byKey) {
          val straight = evs.sortBy(e => (e._2, e._3))
            .foldLeft(0.0)((a, e) => a * (1.0 - alpha) + e._4 * alpha)
          assert(last(k)._2 === evs.size.toLong)
          assert(last(k)._3 === straight,
            s"key $k: streaming level must BIT-match the straight ordered fold")
        }
        // and the batch catalog twin (segmented fold — algebraically the
        // same recurrence, float-reassociated) agrees to 1e-9
        val batch = graft.queries.Analytics.ewmaChunked(
            events.toDF("user_id", "ts", "event_id", "value"), alpha = alpha)
          .select($"user_id", $"ewma").as[(Long, Double)].collect().toMap
        for ((k, (_, _, lvl)) <- last)
          assert(math.abs(batch(k) - lvl) <= 1e-9 * math.max(1.0, math.abs(lvl)),
            s"key $k: batch ${batch(k)} vs streaming $lvl")
      } finally q.stop()
    }
  }

  test("streaming as-of: every left emission BIT-matches the batch backward as-of across slicings") {
    withRocksDb {
      val dir = "/root/testdata/sf0.001"
      // union-tagged real data: clicks are the right (state) side,
      // purchases the left (probe) side; globally (ts, right-first, id)
      // ordered ⇒ per-key event-time order holds in every slice
      val ev = graft.Tables.load(spark, dir, "events")
        .select($"user_id", unix_micros($"ts").as("t"), $"event_id",
          $"event_type", $"value")
        .as[(Long, Long, Long, String, Double)].collect()
      val tagged = ev.collect {
        case (u, t, id, "click", v) => (u, t, id, 0, v)
        case (u, t, id, "purchase", v) => (u, t, id, 1, v)
      }.sortBy(r => (r._2, r._4, r._3)).toSeq
      val in = MemoryStream[(Long, Long, Long, Int, Double)](spark)
      val out = Stateful.asOfLatest(in.toDS().groupByKey(_._1))
      val ckpt = tmp() + "/asof-ckpt"
      val q = out.writeStream.format("memory").queryName("tws_asof")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        in.addData(tagged.take(101): _*); q.processAllAvailable()
        in.addData(tagged.slice(101, 102): _*); q.processAllAvailable()
        in.addData(tagged.drop(102): _*); q.processAllAvailable()
        val got = spark.table("tws_asof").as[(Long, Long, Long, Long, Double)]
          .collect().map(r => r._2 -> ((r._4, r._5))).toMap
        // batch truth: the composed backward as-of on the same inputs
        def purchases = graft.Tables.load(spark, dir, "events")
          .filter($"event_type" === "purchase")
          .select("event_id", "ts", "user_id", "value")
        def clicks = graft.Tables.load(spark, dir, "events")
          .filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"),
            $"value".as("click_value"))
        val expect = graft.ext.AsOfJoin.asOf(purchases, clicks,
            "user_id", "ts", "ts", Seq("click_id", "click_value"))
          .select($"event_id",
            coalesce($"asof_click_id", lit(-1L)).as("cid"),
            coalesce($"asof_click_value", lit(0.0)).as("cv"))
          .as[(Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got.size === expect.size, "exactly one emission per left row")
        assert(got === expect,
          "streaming latest-state as-of must BIT-match the batch join, nulls included")
      } finally q.stop()
    }
  }

  test("transformWithState state survives a checkpoint restart (ST8 + ST3)") {
    withRocksDb {
      val dir = tmp()
      val srcDir = s"$dir/src"; val ckpt = s"$dir/ckpt"
      val outDir = s"$dir/out"
      def stream() = spark.readStream.schema("k STRING, v DOUBLE")
        .parquet(srcDir).as[(String, Double)]
      // memory sink refuses checkpoint recovery; foreachBatch with a
      // batch-scoped parquet write is the recoverable-sink pattern
      def run(): Unit = {
        val q = Stateful.runningTotals(stream().groupByKey(_._1))
          .writeStream
          .outputMode("update").option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, Long, Double)], id: Long) =>
            b.toDF("k", "n", "total").write.mode("overwrite")
              .parquet(s"$outDir/batch=$id")
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      Seq(("m1", 10.0)).toDF("k", "v").write.parquet(srcDir)
      run()
      // second file lands while the query is DOWN; the restart must resume
      // RocksDB state from the checkpoint (not reset) and process only the
      // new file
      Seq(("m1", 4.0)).toDF("k", "v").write.mode("append").parquet(srcDir)
      run()
      val got = spark.read.parquet(outDir).select("k", "n", "total")
        .as[(String, Long, Double)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      assert(got("m1") === (("m1", 2L, 14.0)),
        "restart must resume per-key state from the checkpoint")
    }
  }

  test("versioned table history lists every commit, survives vacuum (M1)") {
    val base = tmp() + "/vt-hist"
    val df1 = Seq((1, "a")).toDF("k", "v")
    VersionedTable.commit(spark, base, df1, operation = "initial load")
    VersionedTable.commit(spark, base, df1.withColumn("v", upper($"v")), operation = "merge")
    val h = VersionedTable.history(spark, base)
      .select("version", "operation", "available", "is_current")
      .as[(Long, String, Boolean, Boolean)].collect().sortBy(_._1)
    assert(h.toSeq === Seq(
      (0L, "initial load", true, false),
      (1L, "merge", true, true)))
    VersionedTable.vacuum(spark, base)
    val h2 = VersionedTable.history(spark, base)
      .select("version", "available").as[(Long, Boolean)].collect().sortBy(_._1)
    // vacuum drops old DATA but history retains the commit record
    assert(h2.toSeq === Seq((0L, false), (1L, true)))
  }

  test("streaming SCD2 ingest: incremental dimension == full-history rebuild, replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Scd
    val base = tmp() + "/scd2"
    val ck = tmp() + "/scd2-ck"
    val b1 = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (2L, 10L, 3L, "X"))
    val b2 = Seq((1L, 30L, 4L, "B"), (1L, 40L, 5L, "C"), (2L, 15L, 6L, "X"),
      (3L, 12L, 7L, "N"))
    val mem = MemoryStream[(Long, Long, Long, String)]
    val obs = mem.toDF().toDF("k", "ts", "tie", "attr")
    def run() = StreamPipes.scd2Ingest(obs, base, ck,
      Seq("k"), "ts", "tie", Seq("attr")).awaitTermination()
    mem.addData(b1); run()
    mem.addData(b2); run()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"attr", $"effective_from", $"effective_to", $"version", $"is_current")
        .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSet
    val streamed = canon(Scd.readDim(spark, base).get)
    val rebuilt = canon(Scd.scd2FromHistory(
      (b1 ++ b2).toDF("k", "ts", "tie", "attr"), Seq("k"), "ts", "tie", Seq("attr")))
    assert(streamed === rebuilt,
      "two streamed batches must equal the full-history rebuild")
    // the storage split holds: current/ is keys-sized, closed/ append-only
    assert(VersionedTable.read(spark, base + "/current").get.count() === 3,
      "current table carries exactly one row per key")
    // at-least-once replay of an applied batch: recognized, skipped
    assert(!Scd.applyBatch(spark, base, b2.toDF("k", "ts", "tie", "attr"),
      Seq("k"), "ts", "tie", Seq("attr"), batchId = 1L))
    assert(canon(Scd.readDim(spark, base).get) === streamed)
    // completed AvailableNow restart with no new data is a no-op
    run()
    assert(canon(Scd.readDim(spark, base).get) === streamed)
  }

  test("streaming aggregate ingest: per-batch folds == one-shot aggregation, replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.IncrementalAgg
    val base = tmp() + "/agg-ingest"
    val ck = tmp() + "/agg-ingest-ck"
    val li = graft.Tables.load(spark, sf("li"), "lineitem")
      .select($"l_returnflag", $"l_quantity").as[(String, Double)].collect()
    val mem = MemoryStream[(String, Double)]
    val facts = mem.toDF().toDF("l_returnflag", "l_quantity")
    def run() = StreamPipes.aggIngest(facts, base, ck,
      Seq("l_returnflag"), "l_quantity").awaitTermination()
    val (h1, h2) = li.splitAt(li.length / 2)
    mem.addData(h1.toSeq); run()
    mem.addData(h2.toSeq); run()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"l_returnflag", $"n_rows", $"sum_val".cast("string"),
          $"min_val", $"max_val")
        .as[(String, Long, String, Double, Double)].collect().toSet
    val streamed = canon(IncrementalAgg.read(spark, base).get)
    val oneShot = li.toSeq.toDF("l_returnflag", "l_quantity")
      .groupBy($"l_returnflag").agg(
        count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(28,2)")).cast("decimal(28,2)").as("sum_val"),
        min($"l_quantity").as("min_val"),
        max($"l_quantity").as("max_val"))
    assert(streamed === canon(oneShot))
    assert(IncrementalAgg.appliedBatches(spark, base) === Set(0L, 1L))
    // replay + empty restart are no-ops
    assert(!IncrementalAgg.update(spark, base,
      h1.toSeq.toDF("l_returnflag", "l_quantity"),
      Seq("l_returnflag"), "l_quantity", 0L))
    run()
    assert(canon(IncrementalAgg.read(spark, base).get) === streamed)
  }

  test("streaming expectations: per-batch clean/quarantine/metrics, idempotent replay (r14)") {
    import graft.ext.Expectations._
    val dir = tmp()
    val rawPath = s"$dir/raw"
    // planted contract: ids 1..8 clean except qty<=0 on 3, dup id 5, fk 99 on 7
    val rows = Seq(
      (1L, Option(1L), Option(10.0)), (2L, Option(2L), Option(4.0)),
      (3L, Option(1L), Option(-2.0)), (4L, Option(3L), Option(6.0)),
      (5L, Option(2L), Option(7.0)), (5L, Option(2L), Option(7.0)),
      (7L, Option(99L), Option(1.0)), (8L, None: Option[Long], Option(2.0)))
    rows.toDF("id", "fk", "qty").write.parquet(rawPath)
    val schema = spark.read.parquet(rawPath).schema
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val rules = Seq(
      Expect("qty_positive", col("qty") > 0),
      ExpectUnique("unique_id", Seq("id")),
      ExpectFk("fk_dim", Seq("fk"), dim, Seq("k")))
    def runOnce(ckpt: String): Unit =
      StreamPipes.expectationsIngest(
        StreamPipes.tableStream(spark, rawPath, schema), rules,
        s"$dir/clean", s"$dir/quarantine", s"$dir/metrics", ckpt)
        .awaitTermination()

    runOnce(s"$dir/ck1")
    val clean = spark.read.parquet(s"$dir/clean")
    assert(clean.select($"id").as[Long].collect().sorted === Array(1L, 2L, 4L, 8L),
      "null FK passes; qty<=0, dup copies, dangling FK quarantine")
    val quar = spark.read.parquet(s"$dir/quarantine")
    assert(quar.count() === 4, "both dup copies + qty + fk rows")
    val m = spark.read.parquet(s"$dir/metrics")
      .select($"rule", $"n_violations").as[(String, Long)].collect().toMap
    assert(m === Map("qty_positive" -> 1L, "unique_id" -> 2L, "fk_dim" -> 1L))

    // replay the same source with a FRESH checkpoint: the batch=<id>
    // scoped overwrites must leave all three sinks unchanged
    runOnce(s"$dir/ck2")
    assert(spark.read.parquet(s"$dir/clean").count() === 4)
    assert(spark.read.parquet(s"$dir/quarantine").count() === 4)
    assert(spark.read.parquet(s"$dir/metrics").count() === 3)
  }

  // LAST test by declaration order: the listener registered at suite
  // construction has linted every batch action above — including every
  // foreachBatch ingest's per-micro-batch plans (bronze/silver/dedup/
  // DSIR/ANN/SCD2/aggregate/expectations). A single Error-severity
  // finding anywhere fails the suite with the offending rule+plan detail.
  test("scale lint: zero errors across every ingest pipeline's micro-batch plans (r16)") {
    org.apache.spark.graft.CleanerBridge.waitListenerBusEmpty(spark.sparkContext)
    spark.listenerManager.unregister(lintListener)
    val errs = lintErrors.toArray.mkString("\n")
    assert(lintErrors.isEmpty,
      s"lint errors in streaming micro-batch plans:\n$errs")
  }
}
