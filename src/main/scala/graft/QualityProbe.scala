package graft

import graft.plans.ScaleLint.BarrierSyntax

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured-accuracy probe for the APPROXIMATE tier — recall of every ANN
  * path against its exact twin and relative error of every sketch against
  * its exact aggregate, emitted as committed artifacts (`QUALITY.md` +
  * `bench/quality.json`). A 100 TB operator needs its accuracy curve on
  * record, not just spec-threshold assertions: the spec proves "above the
  * floor", this records WHERE each operator actually sits so a regression
  * (or a tuning change) is visible round over round.
  *
  * Run: `sbt "runMain graft.QualityProbe [sfDir]"` (defaults to sf0.1).
  */
object QualityProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Similarity

    // insertion-ordered: (operator, metric, value, vs)
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Double, String)]()

    def pairsOf(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid").cast("long"), col("id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

    /** Mean per-query recall of `approx`'s (qid, id) set vs `exact`'s. */
    def recall(name: String, approx: DataFrame, exact: DataFrame, vs: String): Unit = {
      val a = pairsOf(approx)
      val e = pairsOf(exact)
      val per = e.toSeq.map { case (q, ids) =>
        (a.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
      out += ((name, "recall@10", per.sum / per.size, vs))
    }

    val q = QueryCatalog.queries
    val exactCos = q("q33_cosine_topk")(spark, sfDir)
    recall("q34_ann_lsh", q("q34_ann_lsh")(spark, sfDir), exactCos,
      "q33 exact cosine top-10")
    recall("q56_ann_ivf", q("q56_ann_ivf")(spark, sfDir), exactCos,
      "q33 exact cosine top-10")

    // exact squared-L2 top-10 (self included — the PQ family's semantics)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exactL2 = corpus.crossJoin(broadcast(queries))
      .withColumn("d2", Similarity.sqDist(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2"), col("id"))))
      .filter(col("rank") <= 10).select(col("qid"), col("id"))
    recall("q117_pq_adc_topk", q("q117_pq_adc_topk")(spark, sfDir), exactL2,
      "exact L2 top-10")
    recall("q120_ivfpq_topk", q("q120_ivfpq_topk")(spark, sfDir), exactL2,
      "exact L2 top-10")
    recall("q121_ivfpq_refine", q("q121_ivfpq_refine")(spark, sfDir), exactL2,
      "exact L2 top-10")
    recall("q122_ivfpq_residual", q("q122_ivfpq_residual")(spark, sfDir), exactL2,
      "exact L2 top-10")
    // the residual-refined and persisted-index rows are now CATALOG
    // queries (r10): the measured artifact is the shipped operator itself
    recall("q123_ivfpq_residual_refine",
      q("q123_ivfpq_residual_refine")(spark, sfDir), exactL2,
      "exact L2 top-10 (residual shortlist 50, exact re-rank)")
    recall("q124_ivfpq_persisted",
      q("q124_ivfpq_persisted")(spark, sfDir), exactL2,
      "exact L2 top-10 (search over the persisted AnnIndex artifact)")
    // trained residual mode (no oracle — Lloyd on the full residual
    // distribution): measures the iters/seedFrom dials the seed-mode
    // catalog query holds fixed
    locally {
      val cents8 = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cvec"))
      val qs = corpus.filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val (trIdx, trBooks) = graft.ext.Similarity.ivfPqResidual(
        corpus, cents8, m = 4, ksub = 16, iters = 4, seedFrom = 8)
      recall("ivfpq_residual_trained",
        graft.ext.Similarity.ivfPqResidualTopK(trIdx, cents8, trBooks, qs,
          m = 4, k = 10, nProbe = 2),
        exactL2, "exact L2 top-10 (Lloyd-trained books, iters=4)")
    }

    // Seed-vs-trained on a CLUSTERED synthetic corpus: the testdata
    // embeddings are near-orthogonal (no structure for codebooks to
    // learn — training there measures 0.14 vs seed 0.28, the pruning
    // floor). This is the control experiment: identical dials, but the
    // corpus has real cluster structure (VecGen.clusteredVectors), where
    // Lloyd-trained residual books should recover MORE recall than raw
    // seed books, not less. Keeps the catalog's seed default honest:
    // trained wins iff the data has structure.
    locally {
      import graft.ext.Similarity
      val cc = graft.gen.VecGen.clusteredVectors(spark, 6000L, d = 16,
        k = 8, spread = 0.15).cache()
      // ids 0..7 fall in distinct clusters (id % 8), so they double as
      // near-center coarse seeds — the q92 first-k protocol on this layout
      val ccents = cc.filter(col("id") < 8)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val cqs = cc.filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val cExact = cc.crossJoin(broadcast(cqs))
        .withColumn("d2", Similarity.sqDist(col("vec"), col("qvec")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d2"), col("id"))))
        .filter(col("rank") <= 10).select(col("qid"), col("id"))
      val (seedIdx, seedBooks) = Similarity.ivfPqResidual(
        cc, ccents, m = 4, ksub = 16, iters = 1, seedFrom = 8)
      recall("ivfpq_residual_seed_clustered",
        Similarity.ivfPqResidualTopK(seedIdx, ccents, seedBooks, cqs,
          m = 4, k = 10, nProbe = 2),
        cExact, "exact L2 top-10 (clustered synthetic, seed books)")
      val (trIdx, trBooks) = Similarity.ivfPqResidual(
        cc, ccents, m = 4, ksub = 16, iters = 4, seedFrom = 8)
      recall("ivfpq_residual_trained_clustered",
        Similarity.ivfPqResidualTopK(trIdx, ccents, trBooks, cqs,
          m = 4, k = 10, nProbe = 2),
        cExact, "exact L2 top-10 (clustered synthetic, Lloyd iters=4)")
      cc.unpersist()
    }

    // OPQ control (r13): decorrelate-and-balance residual books
    // (Similarity.ivfPqOpq: PCA rotation + Ge et al. eigenvalue
    // allocation) vs plain trained books, on a corpus whose WITHIN-CLUSTER
    // noise has a DECAYING variance spectrum along MIXED directions —
    // noise' = R·diag(s)·noise with R a dense deterministic orthonormal
    // basis and s geometric (3·0.82ʲ). Every PQ slice of the plain layout
    // then sees a cross-correlated blend of all scales; the rotated+
    // balanced layout gives each slice an even share of axis-aligned
    // variance. This is the covariance shape OPQ exists for. Two earlier
    // controls are on record: a rank-1 stretch (whole-vector, then
    // within-cluster) measured NEUTRAL — between-cluster anisotropy is
    // absorbed by the coarse quantizer, and a single shared direction is
    // quantized equally well per-slice; the win needs a multi-direction
    // decaying spectrum.
    locally {
      import graft.ext.Similarity
      val cs = graft.gen.VecGen.correlatedClusteredVectors(spark, 6000L,
        d = 16, k = 8, spread = 0.15).cache()
      val ccents = cs.filter(col("id") < 8)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val cqs = cs.filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val cExact = cs.crossJoin(broadcast(cqs))
        .withColumn("d2", Similarity.sqDist(col("vec"), col("qvec")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d2"), col("id"))))
        .filter(col("rank") <= 10).select(col("qid"), col("id"))
      val (pIdx, pBooks) = Similarity.ivfPqResidual(
        cs, ccents, m = 4, ksub = 16, iters = 4, seedFrom = 8)
      recall("ivfpq_plain_aniso",
        Similarity.ivfPqResidualTopK(pIdx, ccents, pBooks, cqs,
          m = 4, k = 10, nProbe = 2),
        cExact, "exact L2 top-10 (anisotropic synthetic, trained books)")
      val (oIdx, oBooks, model) = Similarity.ivfPqOpq(
        cs, ccents, m = 4, ksub = 16, iters = 4, seedFrom = 8)
      recall("ivfpq_opq_aniso",
        Similarity.ivfPqOpqTopK(oIdx, ccents, oBooks, model, cqs,
          m = 4, k = 10, nProbe = 2),
        cExact, "exact L2 top-10 (anisotropic synthetic, PCA-rotated books)")
      // FULL-probe twins: nProbe = |lists| removes the pruning floor, so
      // ADC/codebook quality is the ONLY recall factor — the isolation the
      // nProbe=2 rows can't give (measured identical there: pruning
      // dominates both).
      recall("ivfpq_plain_aniso_fullprobe",
        Similarity.ivfPqResidualTopK(pIdx, ccents, pBooks, cqs,
          m = 4, k = 10, nProbe = 8),
        cExact, "exact L2 top-10 (anisotropic, trained books, no pruning)")
      recall("ivfpq_opq_aniso_fullprobe",
        Similarity.ivfPqOpqTopK(oIdx, ccents, oBooks, model, cqs,
          m = 4, k = 10, nProbe = 8),
        cExact, "exact L2 top-10 (anisotropic, PCA-rotated books, no pruning)")
      // ADC DISTORTION — the continuous codebook-quality metric: mean
      // |adc − exact d²| over every (query, candidate) pair (k = |corpus|,
      // full probe ⇒ the whole scored table). recall@10 over 5 queries
      // moves in 0.02 steps and saturates at this corpus's tie floor;
      // distortion is where a codebook improvement actually shows.
      val exactAll = cs.crossJoin(broadcast(cqs))
        .select(col("id"), col("qid"),
          Similarity.sqDist(col("vec"), col("qvec")).as("d2"))
      def adcMae(topk: DataFrame): Double =
        topk.join(exactAll, Seq("qid", "id"))
          .agg(avg(abs(col("adc") - col("d2")))).head().getDouble(0)
      out += (("ivfpq_plain_aniso", "adc_mae",
        adcMae(Similarity.ivfPqResidualTopK(pIdx, ccents, pBooks, cqs,
          m = 4, k = 6000, nProbe = 8)),
        "mean |ADC − exact L2| over all pairs (lower is better)"))
      out += (("ivfpq_opq_aniso", "adc_mae",
        adcMae(Similarity.ivfPqOpqTopK(oIdx, ccents, oBooks, model, cqs,
          m = 4, k = 6000, nProbe = 8)),
        "mean |ADC − exact L2| over all pairs (lower is better)"))
      cs.unpersist()
    }

    // ---- recall-vs-dial curves (the 100 TB operating manual: where the
    // knee of each cost/recall dial sits on THIS corpus) ----
    val dials = scala.collection.mutable.ArrayBuffer[(String, Int, Double)]()
    def dialRecall(dial: String, setting: Int, approx: DataFrame,
        exact: DataFrame): Unit = {
      val a = pairsOf(approx)
      val e = pairsOf(exact)
      val per = e.toSeq.map { case (qk, ids) =>
        (a.getOrElse(qk, Set.empty) & ids).size.toDouble / ids.size }
      dials += ((dial, setting, per.sum / per.size))
    }
    locally {
      import graft.ext.Similarity
      val cents8 = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cvec"))
      val qs = corpus.filter(col("id") < 5)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val books = Similarity.pqCodebooks(corpus, m = 4, ksub = 16, iters = 1)
        .barrier(eager = true)
      val index = Similarity.ivfPqIndex(corpus, cents8, books, m = 4)
        .barrier(eager = true)
      // nProbe: how many coarse lists each query scans (cost ∝ nProbe)
      for (np <- Seq(1, 2, 4, 8))
        dialRecall("ivfpq_nprobe", np,
          Similarity.ivfPqTopK(index, cents8, books, qs, m = 4, k = 10,
            nProbe = np), exactL2)
      // shortlist: ADC over-fetch depth before the exact re-rank (cost:
      // shortlist raw-vector fetches per query)
      for (sl <- Seq(20, 50, 100, 200))
        dialRecall("ivfpq_refine_shortlist", sl,
          Similarity.refineShortlist(
            Similarity.ivfPqTopK(index, cents8, books, qs, m = 4, k = sl,
              nProbe = 2).select(col("qid"), col("id")),
            qs, corpus, k = 10), exactL2)
      // |centroids| at fixed nProbe=2: fraction of corpus scanned is
      // nProbe/|centroids| — recall falls as pruning sharpens
      for (nc <- Seq(4, 8, 16, 32)) {
        val cs = emb.filter(col("vec_id") < nc)
          .select(col("vec_id").as("cid"),
            col("embedding").cast("array<double>").as("cvec"))
        val idx = Similarity.ivfPqIndex(corpus, cs, books, m = 4)
        dialRecall("ivfpq_ncentroids", nc,
          Similarity.ivfPqTopK(idx, cs, books, qs, m = 4, k = 10,
            nProbe = 2), exactL2)
      }
      // LSH OR-amplification tables at the q34 operating point (6 planes);
      // exact twin is cosine top-10 (the LSH path ranks by cosine)
      val fCorpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val fQueries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      for (nt <- Seq(1, 4, 8, 16))
        dialRecall("lsh_ntables", nt,
          Similarity.lshTopK(fCorpus, fQueries, k = 10, nPlanes = 6,
            nTables = nt), exactCos)
      // r17 (verdict ask): the PORTABLE plane family at the q34 operating
      // point — the r16 swap moved q34 recall@10 0.34 → 0.32, and the OR
      // dial (planeOffset gives independent plane sets per table) is the
      // recovery lever. Candidate cost per table is |corpus|/2⁶ expected
      // rows per query; the `candidates` rows below record the MEASURED
      // distinct-(qid,id) volume so the recall price is on record.
      for (nt <- Seq(8, 9, 10, 12, 16))
        dialRecall("lsh_ntables_portable", nt,
          Similarity.lshTopK(fCorpus, fQueries, k = 10, nPlanes = 6,
            nTables = nt, portablePlanes = true), exactCos)
      // count the deduped candidate set directly (bucket join + distinct):
      // r18, advisor fix — ranking through lshTopK at k = Int.MaxValue paid
      // a vector attach + cosine verify + unbounded-k window sort per dial
      // point just to count rows the bucket join already determines
      for (nt <- Seq(8, 9, 10))
        out += ((s"lsh_portable_nt$nt", "candidates",
          Similarity.lshCandidates(fCorpus, fQueries,
            nPlanes = 6, nTables = nt, portablePlanes = true).count().toDouble,
          "distinct (qid,id) candidate rows across the 5 probe queries"))
    }
    // knee per dial: the smallest setting reaching 90% of that dial's best
    def kneeLine(dial: String): String = {
      val pts = dials.filter(_._1 == dial).map(p => (p._2, p._3)).toSeq
      val best = pts.map(_._2).max
      if (best == 0.0) f"- `$dial`: flat at 0 on this corpus."
      else {
        val kn = pts.find(_._2 >= 0.9 * best).get
        f"- `$dial`: knee at ${kn._1} (recall ${kn._2}%.2f; best ${best}%.2f at ${pts.maxBy(_._2)._1})."
      }
    }

    // q57 near-dup pair recall/precision vs brute-force cosine >= 0.98
    // (same corpus construction: raw embeddings + perturbed dups)
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
      .filter(Similarity.cosine(col("vec_a"), col("vec_b")) >= 0.98)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = q("q57_embed_neardup")(spark, sfDir)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out += (("q57_embed_neardup", "pair_recall",
      (gotPairs & exactPairs).size.toDouble / math.max(exactPairs.size, 1),
      "brute-force cosine pairs >= 0.98"))
    out += (("q57_embed_neardup", "pair_precision",
      (gotPairs & exactPairs).size.toDouble / math.max(gotPairs.size, 1),
      "brute-force cosine pairs >= 0.98"))

    // ---- sketch relative errors ----
    def relErrs(name: String, approx: DataFrame, exact: DataFrame,
        keys: Seq[String], vals: Seq[String], vs: String): Unit = {
      val j = approx.as("a").join(exact.as("e"), keys)
      // All value columns in ONE select/one job (per-column collects would
      // re-execute both query plans once per column). Zero-exact groups
      // are defined explicitly — 0 when both sides are 0, +Inf when only
      // the exact side is — because Spark's zero divisor yields NULL and
      // getDouble would NPE the whole probe.
      val errCols = vals.map { v =>
        val a = col(s"a.$v").cast("double")
        val e = col(s"e.$v").cast("double")
        when(e === 0.0, when(a === 0.0, lit(0.0))
            .otherwise(lit(Double.PositiveInfinity)))
          .otherwise(abs(a - e) / abs(e)).as(v)
      }
      val errs = j.select(errCols: _*).collect()
        .flatMap(r => vals.indices.map(r.getDouble))
      out += ((name, "max_rel_err", errs.max, vs))
      out += ((name, "mean_rel_err", errs.sum / errs.size, vs))
    }

    relErrs("q115_approx_percentiles",
      q("q115_approx_percentiles")(spark, sfDir),
      q("q47_percentiles")(spark, sfDir),
      Seq("o_orderstatus"), Seq("p50", "p90", "p99"),
      "q47 exact percentiles")

    val li = Tables.load(spark, sfDir, "lineitem")
    relErrs("q38_approx_distinct",
      q("q38_approx_distinct")(spark, sfDir),
      li.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_partkey")).as("approx_parts")),
      Seq("l_returnflag"), Seq("approx_orders", "approx_parts"),
      "exact countDistinct")

    val ev = Tables.events(spark, sfDir)
    val evExact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("approx_users"))
      .unionByName(ev.agg(countDistinct(col("user_id")).as("approx_users"))
        .select(lit("__ALL__").as("event_type"), col("approx_users")))
    relErrs("q99_hll_merge",
      q("q99_hll_merge")(spark, sfDir), evExact,
      Seq("event_type"), Seq("approx_users"),
      "exact countDistinct (per type + merged)")

    val docs = Tables.load(spark, sfDir, "documents")
    val profExact = docs.agg(
        countDistinct(col("doc_id")).as("doc_id"),
        countDistinct(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("lang"),
        countDistinct(col("source")).as("source"))
      .select(expr("""stack(4,
          'doc_id', doc_id, 'n_chars', n_chars,
          'lang', lang, 'source', source) AS (col_name, approx_nd)"""))
    relErrs("q119_approx_profile",
      q("q119_approx_profile")(spark, sfDir), profExact,
      Seq("col_name"), Seq("approx_nd"),
      "exact per-column countDistinct")

    // ---- q133 random projection: measured JL distance distortion ----
    // For every consecutive-id vector pair, compare projected squared-L2
    // (E[||P·d||²] = dOut·||d||² for a ±1 sign matrix) against the exact
    // squared-L2 of the quantized originals: ratio ||Pd||²/(dOut·||d||²)
    // concentrates at 1 with deviation O(1/√dOut) — this records where the
    // 64→16 catalog dial actually sits on this corpus.
    {
      val dOut = 16
      val qv = emb.select(col("vec_id").as("id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        .as("v"))
      val pj = Similarity.randomProject(emb, "vec_id", "embedding", dOut)
        .select(col("vec_id").as("id"), col("proj").as("p"))
      val both = qv.join(pj, "id")
      val sq = (a: String, b: String) =>
        s"aggregate(zip_with($a, $b, (x, y) -> CAST(x - y AS DOUBLE) * CAST(x - y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
      val ratios = both
        .join(both.select((col("id") - 1).as("id"), col("v").as("v2"),
          col("p").as("p2")), "id")
        .select((expr(sq("p", "p2")) / (lit(dOut) * expr(sq("v", "v2"))))
          .as("r"))
      val st = ratios.agg(
        avg(abs(col("r") - 1)).as("mad"),
        expr("percentile(abs(r - 1), 0.95)").as("p95")).head()
      out += (("q133_random_projection", "jl_mean_abs_distortion",
        st.getDouble(0), "exact pairwise sq-L2, quantized 64-dim originals"))
      out += (("q133_random_projection", "jl_p95_abs_distortion",
        st.getDouble(1), "exact pairwise sq-L2, quantized 64-dim originals"))
    }

    // ---- q205 SQ8 ADC vs the exact dot-product top-10 (r14) ----
    locally {
      val corpusD = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
      val queriesD = corpusD.filter(col("id") < 10)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val exactDot = corpusD.crossJoin(broadcast(queriesD))
        .withColumn("dp", expr(
          "aggregate(zip_with(vec, qvec, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, t) -> a + t)"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dp").desc, col("id"))))
        .filter(col("rank") <= 10).select(col("qid"), col("id"))
      recall("q205_sq8_adc_topk", q("q205_sq8_adc_topk")(spark, sfDir), exactDot,
        "exact dot top-10 (int8/dim asymmetric ADC)")
    }

    // ---- q217 MMR: diversity bought vs relevance paid (r14) ----
    // redundancy = mean pairwise cosine among each query's picked set;
    // relevance = mean query-pick cosine. MMR should cut redundancy while
    // keeping most relevance (λ=0.7 trades ~nothing on this near-orthogonal
    // corpus; the planted-duplicate behavior is pinned in MmrSpec).
    locally {
      val corpusC = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queriesC = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      def setStats(picks: DataFrame): (Double, Double) = {
        val withVec = picks.join(corpusC, "id")
          .select(col("qid"), col("id"), col("sim"), col("vec"))
        val red = withVec.select(col("qid"), col("id").as("ia"), col("vec").as("va"))
          .join(withVec.select(col("qid").as("qb"), col("id").as("ib"), col("vec").as("vb")),
            col("qid") === col("qb") && col("ia") < col("ib"))
          .agg(avg(Similarity.cosine(col("va"), col("vb")))).head().getDouble(0)
        val rel = withVec.agg(avg(col("sim"))).head().getDouble(0)
        (red, rel)
      }
      val plain = Similarity.bruteForceTopK(corpusC, queriesC, 10)
        .select(col("qid"), col("id"), col("sim"))
      val mmr = Similarity.mmrTopK(corpusC, queriesC, k = 10, poolSize = 30,
        lambda = 0.7).select(col("qid"), col("id"), col("sim"))
      val (redP, relP) = setStats(plain)
      val (redM, relM) = setStats(mmr)
      out += (("q217_mmr_rerank", "redundancy_plain_top10", redP,
        "mean pairwise cosine within plain top-10"))
      out += (("q217_mmr_rerank", "redundancy_mmr", redM,
        "mean pairwise cosine within MMR picks (λ=0.7, pool 30)"))
      out += (("q217_mmr_rerank", "relevance_plain_top10", relP,
        "mean query-pick cosine, plain top-10"))
      out += (("q217_mmr_rerank", "relevance_mmr", relM,
        "mean query-pick cosine, MMR picks"))
    }

    // ---- emit artifacts ----
    val md = new StringBuilder
    md ++= s"# QUALITY — measured accuracy of the approximate tier\n\n"
    md ++= s"Data: `$sfDir`. Generated by `graft.QualityProbe` "
    md ++= "(`sbt \"runMain graft.QualityProbe [sfDir]\"`).\n\n"
    md ++= "Recall = mean per-query overlap with the exact twin's result set;\n"
    md ++= "rel err = |approx − exact| / exact over every group × column.\n\n"
    md ++= "**GUARDED since r12**: these numbers are no longer measurement-only —\n"
    md ++= "`QualityGuardSpec` (runs in `sbt test`, at sf0.01) pins machine-independent\n"
    md ++= "floors: q34 LSH recall ≥ 0.30 (raised r17 with the 9-table point), q121\n"
    md ++= "refined recall ≥ 0.5, q57 pair-recall\n"
    md ++= "≥ 0.95, sketch max rel-err ≤ 10% (q38/q99/q115); r14 adds q196\n"
    md ++= "ANN-routed hard-negative mining (exact subset invariant — the ANN\n"
    md ++= "shortlist's best sims can never exceed the exact miner's — plus\n"
    md ++= "agreement floors pos ≥ 0.2 / neg ≥ 0.3 vs exact q194, measured\n"
    md ++= "0.50/0.75 at sf0.01), q197 KMV merged-estimator rel err ≤ 0.6\n"
    md ++= "(measured 0.244; k=16 ⇒ ~27% theoretical stderr — the floor is ~2.5σ),\n"
    md ++= "and q205 SQ8 ADC recall@10 ≥ 0.7 vs the exact dot top-10 (measured\n"
    md ++= "row below — 256 levels/dim is far finer than PQ's 16 centroids per\n"
    md ++= "16-dim subspace, so SQ8 sits near-exact on this corpus at 4×\n"
    md ++= "compression; the floor catches a codec bug, not dial drift).\n"
    md ++= "A dial change that\n"
    md ++= "silently collapses recall (r9's single-table LSH measured 0.00 here and\n"
    md ++= "passed every test) now fails the suite. Floors sit well below measured\n"
    md ++= "values — they catch \"stopped finding things\", not honest dial drift; move\n"
    md ++= "a floor only with a note here explaining the accepted trade.\n\n"
    md ++= "Context for the ANN rows: the testdata embeddings are NEAR-ORTHOGONAL\n"
    md ++= "random vectors — the hardest case for bucketed ANN (no cluster\n"
    md ++= "structure, true neighbors barely closer than chance). The near-dup\n"
    md ++= "rows (perturbed-duplicate pairs, the actual dedup workload) show the\n"
    md ++= "same machinery at its operating point. q34 now runs the multi-table\n"
    md ++= "OR-amplified LSH (6 planes × 8 tables, r10) — the single-table\n"
    md ++= "configuration it replaces measured 0.00 here (see the lsh_ntables\n"
    md ++= "dial row at 1). q122 (residual encoding) matching q120 (raw) is the\n"
    md ++= "expected no-structure limit — residuals only beat raw when the\n"
    md ++= "coarse quantizer explains real cluster structure (SimilaritySpec's\n"
    md ++= "clustered corpus shows the gap). The residual-dial row\n"
    md ++= "(ivfpq_residual_trained vs q122's zero-inclusive seed books) moves\n"
    md ++= "recall only within this corpus's pruning floor — measured evidence\n"
    md ++= "that codebook tuning cannot rescue structureless data; the exact\n"
    md ++= "re-rank (q121/q123) is the lever that works regardless of\n"
    md ++= "structure. The *_clustered control rows (r11) complete that\n"
    md ++= "argument: identical dials on a VecGen corpus WITH real cluster\n"
    md ++= "structure, where Lloyd-trained residual books beat seed books —\n"
    md ++= "trained wins iff the data has structure, so the catalog's seed\n"
    md ++= "default is the right one for this near-orthogonal testdata and the\n"
    md ++= "iters dial is the lever to pull on clustered corpora. q124 searches\n"
    md ++= "the PERSISTED AnnIndex artifact and must match q122 exactly\n"
    md ++= "(extension == rebuild). The *_aniso rows (r13) measure the OPQ\n"
    md ++= "integration (Similarity.ivfPqOpq: PCA-rotate residuals, then Ge et\n"
    md ++= "al. eigenvalue allocation balances the decorrelated variance across\n"
    md ++= "PQ blocks — centering+rotation is isometric, so only quantization\n"
    md ++= "error changes): identical dials on a corpus whose within-cluster\n"
    md ++= "noise has a decaying variance spectrum along dense mixed directions\n"
    md ++= "(VecGen.correlatedClusteredVectors), the covariance shape OPQ\n"
    md ++= "exists for. OPQ wins on both adc_mae (distortion over ALL pairs —\n"
    md ++= "the continuous codebook metric) and recall; the win is floor-\n"
    md ++= "guarded in QualityGuardSpec. Negative controls on record: rank-1\n"
    md ++= "stretches (whole-vector, within-cluster) measure NEUTRAL — between-\n"
    md ++= "cluster anisotropy is absorbed by the coarse quantizer and a single\n"
    md ++= "shared direction quantizes equally well per-slice; and an\n"
    md ++= "unbalanced descending-eigenvalue rotation measures WORSE than plain\n"
    md ++= "(0.30 vs 0.44 recall) — decorrelation without balance concentrates\n"
    md ++= "variance the lead block's codes cannot cover. Full-probe twins\n"
    md ++= "isolate codebook quality from nProbe pruning.\n\n"
    md ++= "| operator | metric | value | exact twin |\n|---|---|---|---|\n"
    out.foreach { case (op, m, v, vs) =>
      md ++= f"| $op | $m | $v%.4f | $vs |\n"
    }
    md ++= "\n## Recall-vs-dial curves\n\n"
    md ++= "Every row above is one operating point; a 100 TB deployment tunes\n"
    md ++= "these dials against its own corpus. recall@10 vs the exact twin at\n"
    md ++= "each setting (all other dials at catalog defaults):\n\n"
    md ++= "| dial | setting | recall@10 |\n|---|---|---|\n"
    dials.foreach { case (dl, st, v) => md ++= f"| $dl | $st | $v%.4f |\n" }
    md ++= "\nKnees (smallest setting within 90% of the dial's best):\n\n"
    Seq("ivfpq_nprobe", "ivfpq_refine_shortlist", "ivfpq_ncentroids",
      "lsh_ntables").foreach(dl => md ++= kneeLine(dl) + "\n")
    md ++= "\nReading the dials (shapes measured on THIS near-orthogonal\n"
    md ++= "corpus — see the table for values):\n"
    md ++= "- The exact-re-rank SHORTLIST is the dominant recall lever and has\n"
    md ++= "  no knee below its own depth: ADC quantization error can demote a\n"
    md ++= "  true neighbor below position `shortlist` but not out of the fetch,\n"
    md ++= "  so recall climbs with depth regardless of data structure — at a\n"
    md ++= "  cost of `shortlist` raw-vector fetches per query, never a scan.\n"
    md ++= "- nProbe does NOT buy recall on structureless data (the curve is\n"
    md ++= "  mildly INVERTED here): extra lists add candidates whose noisy ADC\n"
    md ++= "  distances displace true neighbors from the top-k. It buys recall\n"
    md ++= "  when coarse structure exists (SimilaritySpec's clustered corpus) —\n"
    md ++= "  tune it against your corpus, not a rule of thumb.\n"
    md ++= "- More, SMALLER lists at fixed nProbe mildly help recall here while\n"
    md ++= "  shrinking the scanned fraction (∝ nProbe/|centroids|) — the 100 TB\n"
    md ++= "  direction (√n lists) is also the recall direction on this corpus.\n"
    md ++= "- LSH tables amplify candidate volume ∝ nTables/2^planes of the\n"
    md ++= "  corpus; recall rises steadily with tables, paying linearly in\n"
    md ++= "  bucket-join volume. q34 ships the 9-table point (r17: the 9th table\n"
    md ++= "  recovered the r16 portable-swap dip 0.32 -> 0.34 at +5.4% candidates);\n"
    md ++= "  16 tables adds recall\n"
    md ++= "  again at 2x candidate cost — IVF×PQ+refine dominates it per cost.\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("QUALITY.md"),
      md.toString.getBytes("UTF-8"))
    val dialJson = dials.groupBy(_._1).map { case (dl, ps) =>
      s""""$dl":{${ps.map(p => s""""${p._2}":${p._3}""").mkString(",")}}"""
    }.mkString("\"dials\":{", ",", "}")
    val json = (out.groupBy(_._1).map { case (op, ms) =>
      s""""$op":{${ms.map(m => s""""${m._2}":${m._3}""").mkString(",")}}"""
    } ++ Seq(dialJson)).mkString("{\"sf\":\"" + sfDir + "\",", ",", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("bench"))
    java.nio.file.Files.write(java.nio.file.Paths.get("bench/quality.json"),
      (json + "\n").getBytes("UTF-8"))
    println(md.toString)
    spark.stop()
  }
}
