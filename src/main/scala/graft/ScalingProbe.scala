package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-evidence probe backing SCALING.md's measured sections:
  *
  *  - `q82counts`: candidate vs verified pair counts for the
  *    edit-distance path at each testdata scale factor. Candidate growth
  *    tracking true-pair growth is the signature of answer-proportional
  *    cost; candidates outgrowing true pairs means the position
  *    restriction is leaking.
  *  - `skew`: a zipfian-template torture corpus (hot template tokens in
  *    ~30% of docs, unique-heavy tail) run through the PPJoin pair
  *    generator with the hot-token salt dial OFF vs ON, recording wall
  *    time and MAX TASK duration — bounded per-key work under real skew
  *    is a max-task claim, not a wall-time claim.
  *
  * Run: `sbt "runMain graft.ScalingProbe [q82counts|skew|all]"`.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        var cur = maxTask.get()
        while (d > cur && !maxTask.compareAndSet(cur, d)) cur = maxTask.get()
      }
    })
    def timed[T](f: => T): (T, Double, Long) = {
      // drain stragglers from work PRECEDING this call (corpus.count, a
      // prior section) so their late task-end events can't race past the
      // reset and be attributed to the measured run
      org.apache.spark.graft.CleanerBridge.waitListenerBusEmpty(spark.sparkContext)
      maxTask.set(0)
      val t0 = System.nanoTime()
      val r = f
      // drain again so maxTask has seen every task of THIS run
      org.apache.spark.graft.CleanerBridge.waitListenerBusEmpty(spark.sparkContext)
      (r, (System.nanoTime() - t0) / 1e9, maxTask.get())
    }

    if (mode == "q82counts" || mode == "all") {
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
        val dir = s"/root/testdata/$sf"
        val cust = Tables.load(spark, dir, "customer")
        val cand = ext.Dedup.editDistanceCandidates(cust, "c_custkey", "c_name").count()
        val ver = ext.Dedup.editDistancePairs(cust, "c_custkey", "c_name").count()
        println(f"[sp] q82 $sf: candidates=$cand verified=$ver ratio=${cand.toDouble / ver}%.2f")
        Housekeeping.releaseAll(spark)
      }
    }

    if (mode == "skew" || mode == "all") {
      // A hot PREFIX token requires being among a doc's plen rarest —
      // PPJoin's rarest-first ordering keeps common tokens OUT of
      // prefixes at high thresholds, so the realistic skew case is a
      // LOW-threshold join over SHORT docs (plen ≥ |doc| ⇒ every token,
      // including the boilerplate one, is prefix). Hot block: nHot
      // 3-token docs {common, r_i, r_j} (r from a 30k pool) — at t=0.3,
      // plen = 3, so `common`'s postings list (≈ nHot unique sets, above
      // the 64k auto dial) lands whole on ONE prefix join key: nHot²
      // row-pairs through a single task unsalted, spread over
      // max(salt,8) chunks with the dial on. Verified pairs are the
      // shared-r ones (J = 2/4 ≥ 0.3) — a few hundred thousand, so the
      // probe measures join-stage skew, not answer expansion. Cold
      // block: unique-token docs (prefix df = 1) as realistic bulk.
      val nHot = sys.env.getOrElse("SP_HOT", "70000").toLong
      val nCold = sys.env.getOrElse("SP_COLD", "200000").toLong
      val hot = spark.range(nHot).select(col("id").as("doc_id"),
        concat_ws(" ", lit("common"),
          concat(lit("r"), pmod(xxhash64(col("id"), lit(1)), lit(30000))),
          concat(lit("s"), pmod(xxhash64(col("id"), lit(2)), lit(30000)))).as("text"))
      val cold = spark.range(nHot, nHot + nCold).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 10).map(j =>
          concat(lit("u"), col("id") * 10 + j)): _*).as("text"))
      // materialize once so both dial settings read identical input blocks
      val corpus = hot.unionByName(cold).localCheckpoint()
      println(s"[sp] skew corpus: ${corpus.count()} docs (hot=$nHot cold=$nCold)")
      for ((label, salt, dial) <- Seq(
          ("dial-off          ", 1, 0L),
          ("dial-on (8 chunks)", 1, ext.Dedup.AutoSaltMinPostings),
          ("dial-on (32 chunks)", 32, ext.Dedup.AutoSaltMinPostings))) {
        val (n, sec, mt) = timed(
          ext.Dedup.prefixJaccardPairs(corpus, "doc_id", "text", 0.3,
            salt = salt, saltMinPostings = dial).count())
        println(f"[sp] skew $label: $sec%.1f s wall, maxTask=${mt}ms, pairs=$n")
        // NO releaseAll here: it would unpersist the shared corpus
        // checkpoint (lineage truncated ⇒ unrecoverable for run 2)
      }
    }
    spark.stop()
  }
}
