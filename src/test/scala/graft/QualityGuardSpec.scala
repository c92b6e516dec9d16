package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Accuracy regression guard for the APPROXIMATE tier — the quality twin
  * of [[BenchGuardSpec]]: QUALITY.md's recall/error numbers are measured
  * per round but were previously UNGUARDED, so a dial change that silently
  * zeroed recall (exactly r9's LSH 0.00 incident) would pass every test.
  * These floors are machine-independent (recall has no machine factor) and
  * deliberately sit WELL BELOW the measured values at this sf — they catch
  * "the operator stopped finding things", not honest dial drift:
  * measured at sf0.01 this session: q34 0.62, q121 0.96, q57 1.00,
  * sketch max rel-errs ≤ ~0.07. Update a floor only with a QUALITY.md
  * note explaining the accepted trade. Runs at sf0.01 — big enough for
  * sketches to leave their exact-counting regime, small enough for the
  * brute-force oracles. */
class QualityGuardSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.01"
  private def q(name: String): DataFrame =
    QueryCatalog.queries(name)(spark, sfDir)

  private def pairsOf(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("qid").cast("long"), col("id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }

  private def recall(approx: DataFrame, exact: DataFrame): Double = {
    val a = pairsOf(approx)
    val e = pairsOf(exact)
    val per = e.toSeq.map { case (k, ids) =>
      (a.getOrElse(k, Set.empty) & ids).size.toDouble / ids.size }
    per.sum / per.size
  }

  test("q196 ANN-routed hard negatives vs exact q194: subset invariant + agreement floors") {
    // measured at sf0.01 this session: pos_id agreement 0.50, neg_id 0.75
    val e = q("q194_hard_negatives")
      .select(col("qid"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    val a = q("q196_hard_negatives_ann")
      .select(col("qid"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    assert(a.nonEmpty && e.nonEmpty)
    // EXACT invariant, not a floor: the ANN shortlist is a subset of the
    // corpus, so its best same/diff-label sims can never exceed the exact
    // miner's (equality iff the pick coincides)
    for ((qid, (_, ps, _, ns)) <- a; (_, eps, _, ens) <- e.get(qid)) {
      assert(ps <= eps + 1e-12, s"anchor $qid: ann pos_sim $ps > exact $eps")
      assert(ns <= ens + 1e-12, s"anchor $qid: ann neg_sim $ns > exact $ens")
    }
    val shared = a.keySet & e.keySet
    val posAgree = shared.count(k => a(k)._1 == e(k)._1).toDouble / shared.size
    val negAgree = shared.count(k => a(k)._3 == e(k)._3).toDouble / shared.size
    assert(negAgree >= 0.3, f"hard-negative agreement collapsed: $negAgree%.2f < 0.3")
    assert(posAgree >= 0.2, f"positive agreement collapsed: $posAgree%.2f < 0.2")
  }

  test("q197 KMV merged estimator: rel err <= 0.6 vs true distinct (k=16 ~ 27% stderr)") {
    // measured at sf0.01 this session: rel err 0.244
    val est = q("q197_kmv_merge").select(col("est_distinct")).head().getDouble(0)
    val truth = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).distinct().count().toDouble
    val rel = math.abs(est - truth) / truth
    assert(rel <= 0.6, f"KMV merged estimate drifted: est $est%.1f vs true $truth%.0f (rel $rel%.2f)")
  }

  test("q227 KMV intersection estimate: rel err <= 0.5 vs the exact intersect (k=64)") {
    // measured at sf0.01 this session: rel err 0.097 (est 1228.7 vs 1120)
    val r = q("q227_kmv_intersect")
      .select(col("est_intersect"), col("exact_intersect")).head()
    val est = r.getDouble(0); val truth = r.getLong(1).toDouble
    val rel = math.abs(est - truth) / truth
    assert(rel <= 0.5, f"KMV intersect estimate drifted: est $est%.1f vs true $truth%.0f (rel $rel%.2f)")
  }

  test("q34 LSH recall@10 >= 0.30 vs exact cosine") {
    // r17: floor raised 0.25 -> 0.30 with the 9-table operating point
    // (sf0.1 recall 0.34, sf0.01 well above — no silent floor lowering)
    val r = recall(q("q34_ann_lsh"), q("q33_cosine_topk"))
    assert(r >= 0.30, f"q34 LSH recall collapsed: $r%.3f < 0.30")
  }

  test("q121 IVF-PQ refined recall@10 >= 0.5 vs exact L2") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exactL2 = corpus.crossJoin(broadcast(queries))
      .withColumn("d2", graft.ext.Similarity.sqDist(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2"), col("id"))))
      .filter(col("rank") <= 10).select(col("qid"), col("id"))
    val r = recall(q("q121_ivfpq_refine"), exactL2)
    assert(r >= 0.5, f"q121 refined recall collapsed: $r%.3f < 0.5")
  }

  test("q57 near-dup pair recall >= 0.95 vs brute-force cosine >= 0.98") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // the same perturbed-dup corpus construction as q57 itself
    val dups = emb.filter(col("vec_id") % 10 === 0).select(
      (col("vec_id") + 100000).as("id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") +
          (pmod(col("vec_id") * (i + lit(1)), lit(7)).cast("double") - 3.0) * 0.005)
          .cast("float")).as("vec"))
    val ndCorpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .unionByName(dups)
    val exactPairs = ndCorpus.select(col("id").as("id_a"), col("vec").as("vec_a"))
      .crossJoin(ndCorpus.select(col("id").as("id_b"), col("vec").as("vec_b")))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.ext.Similarity.cosine(col("vec_a"), col("vec_b")) >= 0.98)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = q("q57_embed_neardup")
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = (gotPairs & exactPairs).size.toDouble / math.max(exactPairs.size, 1)
    assert(r >= 0.95, f"q57 pair recall collapsed: $r%.3f < 0.95 " +
      s"(${exactPairs.size} true pairs)")
  }

  /** Max relative error of `vals` columns, approx vs exact, joined on
    * `keys` (QUALITY.md's relErrs rule: 0/0 → 0, x/0 → +Inf). */
  private def maxRelErr(approx: DataFrame, exact: DataFrame,
      keys: Seq[String], vals: Seq[String]): Double = {
    val j = approx.as("a").join(exact.as("e"), keys)
    val errCols = vals.map { v =>
      val a = col(s"a.$v").cast("double")
      val e = col(s"e.$v").cast("double")
      when(e === 0.0, when(a === 0.0, lit(0.0))
          .otherwise(lit(Double.PositiveInfinity)))
        .otherwise(abs(a - e) / abs(e)).as(v)
    }
    j.select(errCols: _*).collect()
      .flatMap(r => vals.indices.map(r.getDouble)).max
  }

  test("sketch tier max relative error <= 10%") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val distinctErr = maxRelErr(
      q("q38_approx_distinct"),
      li.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_partkey")).as("approx_parts")),
      Seq("l_returnflag"), Seq("approx_orders", "approx_parts"))
    assert(distinctErr <= 0.10, f"q38 HLL error blew up: $distinctErr%.3f")

    val ev = Tables.events(spark, sfDir)
    val evExact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("approx_users"))
      .unionByName(ev.agg(countDistinct(col("user_id")).as("approx_users"))
        .select(lit("__ALL__").as("event_type"), col("approx_users")))
    val hllErr = maxRelErr(q("q99_hll_merge"), evExact,
      Seq("event_type"), Seq("approx_users"))
    assert(hllErr <= 0.10, f"q99 HLL-merge error blew up: $hllErr%.3f")

    val pctErr = maxRelErr(q("q115_approx_percentiles"), q("q47_percentiles"),
      Seq("o_orderstatus"), Seq("p50", "p90", "p99"))
    assert(pctErr <= 0.10, f"q115 approx-percentile error blew up: $pctErr%.3f")
  }

  test("OPQ (decorrelate + balance) beats plain residual PQ on correlated residuals") {
    // The r13 integration floor: on the shared correlated-noise control
    // corpus (VecGen.correlatedClusteredVectors — the covariance shape OPQ
    // exists for), the rotated+balanced books must beat plain trained
    // books on BOTH ADC distortion and recall. Fully deterministic (no
    // RNG anywhere), so this is a stable floor, not a flaky benchmark —
    // measured at probe scale: mae 0.219 vs 0.365, recall 0.56 vs 0.44.
    // A balanceBlocks regression (e.g. the anti-balanced greedy this
    // round caught: 0.30 vs 0.44 recall) fails here.
    import graft.ext.Similarity
    val cs = graft.gen.VecGen.correlatedClusteredVectors(spark, 2000L,
      d = 16, k = 8, spread = 0.15).cache()
    try {
      val cents = cs.filter(col("id") < 8)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val qs = cs.filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val exactL2 = cs.crossJoin(broadcast(qs))
        .withColumn("d2", Similarity.sqDist(col("vec"), col("qvec")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d2"), col("id"))))
        .filter(col("rank") <= 10).select(col("qid"), col("id"))
      val exactAll = cs.crossJoin(broadcast(qs))
        .select(col("id"), col("qid"),
          Similarity.sqDist(col("vec"), col("qvec")).as("d2"))
      def mae(topk: DataFrame): Double =
        topk.join(exactAll, Seq("qid", "id"))
          .agg(avg(abs(col("adc") - col("d2")))).head().getDouble(0)
      val (pIdx, pBooks) = Similarity.ivfPqResidual(
        cs, cents, m = 4, ksub = 16, iters = 4, seedFrom = 8)
      val (oIdx, oBooks, model) = Similarity.ivfPqOpq(
        cs, cents, m = 4, ksub = 16, iters = 4, seedFrom = 8)
      val pMae = mae(Similarity.ivfPqResidualTopK(pIdx, cents, pBooks, qs,
        m = 4, k = 2000, nProbe = 8))
      val oMae = mae(Similarity.ivfPqOpqTopK(oIdx, cents, oBooks, model, qs,
        m = 4, k = 2000, nProbe = 8))
      assert(oMae < pMae,
        f"OPQ distortion must beat plain on correlated residuals: opq $oMae%.4f vs plain $pMae%.4f")
      val pRec = recall(Similarity.ivfPqResidualTopK(pIdx, cents, pBooks, qs,
        m = 4, k = 10, nProbe = 8), exactL2)
      val oRec = recall(Similarity.ivfPqOpqTopK(oIdx, cents, oBooks, model, qs,
        m = 4, k = 10, nProbe = 8), exactL2)
      assert(oRec >= pRec,
        f"OPQ recall must not lose to plain on correlated residuals: opq $oRec%.3f vs plain $pRec%.3f")
      info(f"opq mae $oMae%.4f vs plain $pMae%.4f; opq recall $oRec%.3f vs plain $pRec%.3f")
    } finally cs.unpersist()
  }

  test("q173 space-saving certificates bracket exact counts; Metwally presence invariant") {
    val exact = Tables.load(spark, sfDir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val capacity = 16L // must match the q173 dial
    val summary = q("q173_spacesaving_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(summary.nonEmpty && summary.length <= capacity)
    // per-item certificate: true ∈ [count − over, count] — holds under ANY
    // partition layout / merge order (the mergeable-summaries guarantee)
    for ((item, c, o) <- summary) {
      val t = exact(item)
      assert(t <= c && t >= c - o, s"$item: exact $t outside [${c - o}, $c]")
    }
    // presence: every token with exact count > N/capacity is in the summary
    val present = summary.map(_._1).toSet
    for ((tok, c) <- exact if c > n / capacity)
      assert(present.contains(tok), s"heavy token $tok ($c > $n/$capacity) missing")
  }

  test("q205 SQ8 ADC recall@10 >= 0.7 vs exact dot top-10") {
    // same metric (dot), same query set: the only gap is 8-bit corpus
    // quantization error. 256 levels per dim is far finer than PQ's 16
    // centroids per 16-dim subspace, so this floor sits well above q34's.
    val corpus = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val qs = corpus.filter(col("id") < 10)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = corpus.crossJoin(broadcast(qs))
      .filter(col("id") =!= col("qid"))
      .withColumn("adc", graft.ext.Similarity.dot(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("id"))))
      .filter(col("rank") <= 10)
    val r = recall(q("q205_sq8_adc_topk"), exact)
    assert(r >= 0.7, f"q205 SQ8 recall collapsed: $r%.3f < 0.7")
  }
}
