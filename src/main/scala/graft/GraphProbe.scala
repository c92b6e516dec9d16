package graft

import graft.plans.ScaleLint
import graft.plans.ScaleLint.BarrierSyntax

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 measurement tool (PlanSnap-class, measurement-only): warm A/B of the
  * graph-tier implementation variants inside ONE session, so the r18 graph
  * regression (q130/q138/q207/q233/q254 slower at 32 cores in the driver's
  * bench) can be attributed to a specific mechanism instead of host-window
  * noise. Each variant is timed like the bench (construct + count, 3 reps,
  * min; releaseAndSettle between variants; calib probes interleaved).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.GraphProbe [filter]"
  */
object GraphProbe {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The q130/q138/q207 co-purchase edge derivation. */
  private def coEdges(s: SparkSession, dir: String,
      pinCs: Boolean): DataFrame = {
    val cs0 = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cnode"),
        (col("l_suppkey") * 2 + 1).as("snode"))
      .distinct()
    val cs = if (pinCs) cs0.barrier(eager = true) else cs0
    cs.select(col("cnode").as("src"), col("snode").as("dst"))
      .unionAll(cs.select(col("snode").as("src"), col("cnode").as("dst")))
  }

  /** PageRank.run with a pluggable edge-table pin. */
  private def prVariant(edges: DataFrame, iters: Int,
      pin: DataFrame => DataFrame): DataFrame = {
    val scale = 1000000000000L
    val dampingPct = 85
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outd"))
      .barrier(eager = true)
    val ew = pin(edges.join(deg, "src"))
    val nNodes = deg.count()
    val base = scale / nNodes
    val teleport = (100 - dampingPct) * base / 100
    var ranks = deg.select(col("src").as("node"))
      .withColumn("rank", lit(base))
    for (_ <- 1 to iters) {
      ranks = ew.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank div outd").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          (lit(teleport) + expr(s"($dampingPct * s) div 100")).as("rank"))
    }
    ranks.orderBy(col("rank").desc, col("node")).limit(20)
  }

  /** PageRank.runPersonalized with a pluggable edge pin (q207 shape). */
  private def pprVariant(s: SparkSession, edges: DataFrame, iters: Int,
      pin: DataFrame => DataFrame): DataFrame = {
    import s.implicits._
    val scale = 1000000000000L
    val dampingPct = 85
    val seeds = Seq(2L, 4L, 6L).toDF("node")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outd"))
      .barrier(eager = true)
    val ew = pin(edges.join(deg, "src"))
    val sd = seeds.select(col("node")).distinct()
      .join(deg.select(col("src").as("node")), Seq("node"), "left_semi")
      .barrier(eager = true)
    val nSeeds = sd.count()
    val base = scale / nSeeds
    val teleport = (100 - dampingPct) * base / 100
    val tele = sd.withColumn("tele", lit(teleport))
    var ranks = sd.withColumn("rank", lit(base))
    for (_ <- 1 to iters) {
      val walked = ew.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank div outd").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          expr(s"($dampingPct * s) div 100").as("walk"))
      ranks = walked.join(tele, Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("walk"), lit(0L)) + coalesce(col("tele"), lit(0L)))
            .as("rank"))
    }
    ranks.orderBy(col("rank").desc, col("node")).limit(20)
  }

  /** LabelProp.run with a pluggable edge pin (q138 shape). */
  private def lpVariant(edges: DataFrame, iters: Int,
      pin: DataFrame => DataFrame): DataFrame = {
    val e = pin(edges.select(col("src"), col("dst")))
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      labels = e.join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(graft.functions.ArgExtremum.argmax(
          col("label"), col("c").cast("double")).as("label"))
        .select(col("dst").as("node"), col("label"))
    }
    labels
  }

  /** q254 with regroup (current) or the r17 two-sided self-join. */
  private def aaVariant(s: SparkSession, dir: String, pinCs: Boolean,
      regroup: Boolean): DataFrame = {
    val cs0 = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("sk"))
      .distinct()
    val cs = if (pinCs) cs0.barrier(eager = true) else cs0
    val deg = cs.groupBy(col("sk")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= 32)
      .withColumn("term",
        round(lit(1.0) / log(col("deg").cast("double")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
    val pairs = if (regroup) {
      val ec = cs.join(deg, Seq("sk"))
      val grouped = ec.groupBy(col("sk"), col("term"))
        .agg(sort_array(collect_list(col("c"))).as("members"))
      grouped
        .select(col("term"), col("members"),
          posexplode(col("members")).as(Seq("i", "c1")))
        .select(col("term"), col("c1"),
          explode(slice(col("members"), col("i") + 2,
            size(col("members")) - col("i") - 1)).as("c2"))
    } else {
      val a = cs.select(col("sk"), col("c").as("c1"))
      val b = cs.select(col("sk").as("sk2"), col("c").as("c2"))
      a.join(deg, Seq("sk"))
        .join(b, col("sk") === col("sk2") && col("c1") < col("c2"))
        .select(col("term"), col("c1"), col("c2"))
    }
    pairs.groupBy(col("c1"), col("c2"))
      .agg(count(lit(1)).as("n_common"),
        sum(col("term")).cast("double").as("aa_score"))
      .orderBy(col("aa_score").desc, col("c1"), col("c2"))
      .limit(20)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val filter = args.headOption.getOrElse("")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pinNone(df: DataFrame): DataFrame = df
    def pinEager(df: DataFrame): DataFrame = df.barrier(eager = true)
    def pinKey32(df: DataFrame): DataFrame = df.barrierByKey("src")
    def pinKeyN(n: Int)(df: DataFrame): DataFrame =
      ScaleLint.barrierByKey(df, "src", n)

    def orderLimit(df: DataFrame): DataFrame =
      df.orderBy(col("rank").desc, col("node")).limit(20)

    // q60/q79 barrier-audit variants (r19, verdict item 6): the r18
    // barrier pins the FULL media table (payloads included) for branches
    // that mostly read metadata
    def q60body(media: DataFrame): DataFrame = {
      import graft.ext.Multimodal
      val feats = Multimodal.featurize(Multimodal.resizeMeta(media, 512), dim = 16)
      val frames = Multimodal.sampleFrames(media, stride = 30)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled"))
      feats.join(frames, Seq("media_id"), "left")
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          max(size(col("features"))).cast("long").as("feature_dim"),
          round(avg(aggregate(col("features"), lit(0.0d), (a, x) => a + x)), 4)
            .as("mean_feature_sum"),
          sum(coalesce(col("n_sampled"), lit(0L))).as("n_frames_sampled"))
    }
    def q79body(media: DataFrame): DataFrame = {
      import graft.ext.Multimodal
      val frames = Multimodal.sampleFrames(media, stride = 30)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled"))
      Multimodal.resizeMeta(media, 512)
        .join(frames, Seq("media_id"), "left")
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("meta.width")).as("sum_width"),
          sum(col("meta.height")).as("sum_height"),
          sum(coalesce(col("n_sampled"), lit(0L))).as("n_frames_sampled"),
          max(col("meta.n_frames")).as("max_frames"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("q60_barrier_current", () => q60body(graft.ext.Multimodal.synthesize(spark, 3000L).barrier())),
      ("q60_nobarrier", () => q60body(graft.ext.Multimodal.synthesize(spark, 3000L))),
      ("q79_barrier_current", () => q79body(graft.ext.Multimodal.synthesize(spark, 3000L).barrier())),
      ("q79_nobarrier", () => q79body(graft.ext.Multimodal.synthesize(spark, 3000L))),
      ("q207_now", () => {
        import spark.implicits._
        orderLimit(graft.ext.PageRank.runPersonalized(
          coEdges(spark, sfDir, pinCs = false), Seq(2L, 4L, 6L).toDF("node"), 4))
      }),
      ("q138_now", () => graft.ext.LabelProp.run(coEdges(spark, sfDir, pinCs = false), 4)),
      ("q130_now", () => orderLimit(graft.ext.PageRank.run(coEdges(spark, sfDir, pinCs = false), 5))),
      ("q207_nowcs", () => {
        import spark.implicits._
        orderLimit(graft.ext.PageRank.runPersonalized(
          coEdges(spark, sfDir, pinCs = true), Seq(2L, 4L, 6L).toDF("node"), 4))
      }),
      ("q138_nowcs", () => graft.ext.LabelProp.run(coEdges(spark, sfDir, pinCs = true), 4)),
      ("q130_nowcs", () => orderLimit(graft.ext.PageRank.run(coEdges(spark, sfDir, pinCs = true), 5))),
      ("q207_pin32_current", () => pprVariant(spark, coEdges(spark, sfDir, pinCs = false), 4, pinKey32)),
      ("q207_pin8", () => pprVariant(spark, coEdges(spark, sfDir, pinCs = false), 4, pinKeyN(8))),
      ("q207_pin2", () => pprVariant(spark, coEdges(spark, sfDir, pinCs = false), 4, pinKeyN(2))),
      ("q207_barrier_r17", () => pprVariant(spark, coEdges(spark, sfDir, pinCs = false), 4, pinEager)),
      ("q207_nopin", () => pprVariant(spark, coEdges(spark, sfDir, pinCs = false), 4, pinNone)),
      ("q207_cs_pin32", () => pprVariant(spark, coEdges(spark, sfDir, pinCs = true), 4, pinKey32)),
      ("q207_cs_barrier", () => pprVariant(spark, coEdges(spark, sfDir, pinCs = true), 4, pinEager)),
      ("q138_pin32_current", () => lpVariant(coEdges(spark, sfDir, pinCs = false), 4, pinKey32)),
      ("q138_pin8", () => lpVariant(coEdges(spark, sfDir, pinCs = false), 4, pinKeyN(8))),
      ("q138_barrier_r17", () => lpVariant(coEdges(spark, sfDir, pinCs = false), 4, pinEager)),
      ("q138_nopin", () => lpVariant(coEdges(spark, sfDir, pinCs = false), 4, pinNone)),
      ("q138_cs_barrier", () => lpVariant(coEdges(spark, sfDir, pinCs = true), 4, pinEager)),
      ("q130_pin32_current", () => prVariant(coEdges(spark, sfDir, pinCs = false), 5, pinKey32)),
      ("q130_pin8", () => prVariant(coEdges(spark, sfDir, pinCs = false), 5, pinKeyN(8))),
      ("q130_barrier_r17", () => prVariant(coEdges(spark, sfDir, pinCs = false), 5, pinEager)),
      ("q130_nopin", () => prVariant(coEdges(spark, sfDir, pinCs = false), 5, pinNone)),
      ("q130_cs_barrier", () => prVariant(coEdges(spark, sfDir, pinCs = true), 5, pinEager)),
      ("q254_regroup_pin_current", () => aaVariant(spark, sfDir, pinCs = true, regroup = true)),
      ("q254_regroup_lazy", () => aaVariant(spark, sfDir, pinCs = false, regroup = true)),
      ("q254_selfjoin_pin", () => aaVariant(spark, sfDir, pinCs = true, regroup = false)),
      ("q254_selfjoin_r17", () => aaVariant(spark, sfDir, pinCs = false, regroup = false))
    ).filter(_._1.contains(filter))

    // warm the JIT/codegen on one full pass of each variant, untimed
    Bench.calibrate(spark)
    variants.foreach { case (_, fn) =>
      fn().count(); Housekeeping.releaseAndSettle(spark)
    }
    val calib0 = Bench.calibrate(spark)
    println(f"[gp] calib_pre $calib0%.3f")
    variants.foreach { case (name, fn) =>
      val reps = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        fn().count()
        (System.nanoTime() - t0) / 1e9
      }
      Housekeeping.releaseAndSettle(spark)
      val c = Bench.calibrate(spark)
      println(f"[gp] $name%-28s min=${reps.min}%6.2f reps=${reps.map(r => f"$r%.2f").mkString(",")} calib=$c%.3f")
    }
    spark.stop()
  }
}
