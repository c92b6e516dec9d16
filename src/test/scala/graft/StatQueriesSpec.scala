package graft

import org.apache.spark.sql.functions._

/** Semantic guards for the inference cluster (q249–q254): independent
  * reimplementation checks (sequential PAV, brute-force Adamic–Adar,
  * driver-side CUSUM argmax) plus the structural invariants the oracle's
  * arithmetic parity can't express.
  */
class StatQueriesSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  private def run(name: String) = QueryCatalog.queries(name)(spark, dir)

  // ---------------------------------------------------------------- q249 BH

  test("q249 BH: rejections are exactly a rank prefix and p-values are sane") {
    val rows = run("q249_bh_fdr").collect()
    val m = rows.head.getAs[Long]("m")
    assert(rows.length.toLong === m)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p >= 0.0 && p <= 1.0)
    }
    val rejectedRanks = rows.filter(_.getAs[Long]("rejected") == 1L)
      .map(_.getAs[Long]("rnk")).sorted
    // step-up property: the rejected set is {1..r} for some r (possibly empty)
    assert(rejectedRanks.zipWithIndex.forall { case (rk, i) => rk == i + 1 })
  }

  // ------------------------------------------------- q250 target encoding

  test("q250 OOF encoding: fold means and OOF means recombine to the category mean") {
    val enc = run("q250_target_encoding").collect()
      .map(r => (r.getString(0), r.getAs[Long]("fold")) ->
        (r.getAs[Long]("n_fold"), r.getAs[Double]("oof_mean"))).toMap
    // brute force per (category, fold) from the raw tables
    val p = 1000003L
    val raw = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("cat"),
        pmod(pmod(pmod(col("o_orderkey"), lit(p)) * lit(2654435761L), lit(p)),
          lit(5L)).as("fold"),
        col("o_totalprice").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byCat = raw.groupBy(_._1)
    enc.foreach { case ((cat, fold), (nFold, oof)) =>
      val all = byCat(cat)
      val out = all.filter(_._2 != fold)
      assert(all.count(_._2 == fold).toLong === nFold)
      val expected = out.map(_._3).sum / out.length
      assert(math.abs(oof - expected) < 1e-6,
        s"($cat, $fold): oof=$oof expected=$expected")
    }
  }

  // ---------------------------------------------------- q251 changepoint

  test("q251 changepoint: argmax matches a driver-side exact recomputation") {
    val got = run("q251_changepoint").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("cp_day"), r.getAs[Double]("cusum_stat")))
      .toMap
    val perDay = Tables.load(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        (round(col("value"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6)) * 1000000)
          .cast("long").as("v"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("v")).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    perDay.groupBy(_._1).foreach { case (et, rows) =>
      val series = rows.sortBy(_._2).map(x => (x._2, BigInt(x._3)))
      val n = BigInt(series.length)
      val sn = series.map(_._2).sum
      var best = (BigInt(-1), 0L)
      var sk = BigInt(0)
      series.zipWithIndex.foreach { case ((day, rev), i) =>
        sk += rev
        val dev = (sk * n - sn * BigInt(i + 1)).abs
        if (dev > best._1) best = (dev, day)
      }
      assert(got(et)._1 === best._2, s"$et: cp_day")
      val stat = best._1.toDouble / (sn * n).toDouble
      assert(math.abs(got(et)._2 - stat) < 1e-12, s"$et: cusum_stat")
    }
  }

  test("q251 changepoint: a planted level shift is found at the plant") {
    // synthetic: 40 days at level 1000, then 40 at level 3000 → argmax at
    // the boundary (day 39, the last day of the low regime)
    import spark.implicits._
    val series = ((0 until 40).map(d => (d.toLong, 1000L)) ++
      (40 until 80).map(d => (d.toLong, 3000L))).toDF("day", "rev")
    val n = 80L
    val sn = 40L * 1000 + 40L * 3000
    val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val best = series
      .withColumn("k", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"day")).cast("long"))
      .withColumn("sk", sum($"rev").over(w))
      .withColumn("dev", abs($"sk" * n - lit(sn) * $"k"))
      .orderBy($"dev".desc, $"day").limit(1)
      .select($"day").as[Long].head()
    assert(best === 39L)
  }

  // -------------------------------------------------------- q252 log-rank

  test("q252 log-rank: parity cohorts are null-ish and the pieces are coherent") {
    val r = run("q252_logrank").collect().head
    val o1 = r.getAs[Long]("o1")
    val e1 = r.getAs[Double]("e1")
    val v = r.getAs[Double]("v")
    val z = r.getAs[Double]("z")
    val chi2 = r.getAs[Double]("chi2")
    assert(o1 > 0 && v > 0)
    assert(math.abs((o1 - e1) / math.sqrt(v) - z) < 1e-5)
    assert(math.abs(z * z - chi2) < 1e-4)
    // user_id parity is independent of conversion in the synthetic data:
    // the test must NOT scream (|z| < 4 keeps far more than 99.99% mass)
    assert(math.abs(z) < 4.0, s"parity cohorts look different: z=$z")
  }

  // ------------------------------------------------------- q253 isotonic

  /** Sequential pool-adjacent-violators over (weight, value) in order. */
  private def pav(points: Seq[(Long, Double)]): Seq[Double] = {
    case class Block(var w: Double, var sum: Double) { def mean: Double = sum / w }
    val blocks = scala.collection.mutable.ArrayBuffer[(Block, Int)]()
    points.foreach { case (w, y) =>
      blocks += ((Block(w.toDouble, w * y), 1))
      while (blocks.length > 1 &&
        blocks(blocks.length - 2)._1.mean >= blocks.last._1.mean) {
        val (b2, n2) = blocks.remove(blocks.length - 1)
        val (b1, n1) = blocks.last
        b1.w += b2.w; b1.sum += b2.sum
        blocks(blocks.length - 1) = (b1, n1 + n2)
      }
    }
    blocks.flatMap { case (b, n) => Seq.fill(n)(b.mean) }.toSeq
  }

  test("q253 isotonic: output is monotone and equals sequential PAV") {
    val rows = run("q253_isotonic_calibration").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Double]("raw_rate"), r.getAs[Double]("iso_rate")))
      .sortBy(_._1)
    val iso = rows.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-12 },
      "iso_rate must be nondecreasing in bin")
    val expected = pav(rows.map(r => (r._2, r._3)).toSeq)
    iso.zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(math.abs(got - exp) < 1e-9, s"bin index $i: $got vs PAV $exp")
    }
    // PAV is a projection: it must preserve the weighted mean
    val wMean = rows.map(r => r._2 * r._3).sum / rows.map(_._2).sum
    val wIso = rows.map(r => r._2 * r._4).sum / rows.map(_._2).sum
    assert(math.abs(wMean - wIso) < 1e-9)
  }

  test("PAV minimax identity on a hand case with a violation") {
    // y = [3, 1, 2] pools to [2, 2, 2]
    assert(pav(Seq((1L, 3.0), (1L, 1.0), (1L, 2.0))) === Seq(2.0, 2.0, 2.0))
  }

  // --------------------------------------------------------- q255 Shapley

  test("q255 Shapley: efficiency (Σφ = v(full) − v(∅)) against raw data") {
    val got = run("q255_shapley_attribution").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    assert(got.keySet === Set("click", "view", "signup", "error"))
    // brute-force v(mask) from the raw events
    val per = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("cv"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("tc"),
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("tv"),
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("tsg"),
        min(when(col("event_type") === "error", unix_micros(col("ts")))).as("te"))
      .collect()
    def touched(t: Any, cv: Any): Boolean = t != null &&
      (cv == null || t.asInstanceOf[Long] < cv.asInstanceOf[Long])
    val byMask = per.groupBy { r =>
      val cv = r.get(1)
      (if (touched(r.get(2), cv)) 1 else 0) + (if (touched(r.get(3), cv)) 2 else 0) +
        (if (touched(r.get(4), cv)) 4 else 0) + (if (touched(r.get(5), cv)) 8 else 0)
    }
    def v(mask: Int): Double = byMask.get(mask) match {
      case Some(rs) => rs.count(_.get(1) != null).toDouble / rs.length
      case None => 0.0
    }
    val sumShapley = got.values.sum
    assert(math.abs(sumShapley - (v(15) - v(0))) < 1e-6,
      s"efficiency: sum=$sumShapley vs v(full)-v(empty)=${v(15) - v(0)}")
    // spot-check one channel against the full lattice formula
    val wNum = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    val phiClick = (0 until 16).filter(m => (m & 1) == 0).map { m =>
      val s = Integer.bitCount(m)
      BigDecimal(wNum(s) * (v(m | 1) - v(m)) / 24.0)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(got("click") - phiClick) < 1e-9)
  }

  // ------------------------------------------------------------ q256 Holt

  test("q256 Holt: fold equals a sequential driver-side recurrence") {
    val got = run("q256_holt_forecast").collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("level"), r.getAs[Double]("trend")))
      .toMap
    val perDay = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 8)))
        .cast("double").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    perDay.groupBy(_._1).foreach { case (et, rows) =>
      val ys = rows.sortBy(_._2).map(_._3)
      var l = ys.head; var b = 0.0
      ys.tail.foreach { y =>
        val l2 = 0.3 * y + 0.7 * (l + b)
        b = 0.1 * (l2 - l) + 0.9 * b
        l = l2
      }
      assert(math.abs(got(et)._1 - l) < 1e-5, s"$et level")
      assert(math.abs(got(et)._2 - b) < 1e-5, s"$et trend")
    }
  }

  // ---------------------------------------------------- q257 Mann–Kendall

  test("q257 Mann–Kendall: S and var match a brute-force pair recomputation") {
    val got = run("q257_mann_kendall").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("s_stat"), r.getAs[Double]("var_s"), r.getAs[Double]("z")))
      .toMap
    val daily = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum((round(col("value"), 6)
        .cast(org.apache.spark.sql.types.DecimalType(28, 6)) * 1000000)
        .cast("long")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val ys = rows.sortBy(_._2).map(_._3)
      val n = ys.length
      var sStat = 0L
      for (i <- 0 until n; j <- (i + 1) until n)
        sStat += java.lang.Long.signum(ys(j) - ys(i))
      assert(got(et)._1 === sStat, s"$et S")
      val tieAdj = ys.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val varS = (n.toLong * (n - 1) * (2L * n + 5) - tieAdj) / 18.0
      assert(math.abs(got(et)._2 - varS) < 1e-6, s"$et var")
      val z = if (sStat > 0) (sStat - 1) / math.sqrt(varS)
        else if (sStat < 0) (sStat + 1) / math.sqrt(varS) else 0.0
      assert(math.abs(got(et)._3 - z) < 1e-5, s"$et z")
    }
  }

  // ------------------------------------------------------ q258 winsorized

  test("q258 winsorized mean sits between the raw mean's robust bounds and counts add up") {
    val rows = run("q258_winsorized_mean").collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val lo = r.getAs[Long]("n_clamped_lo"); val hi = r.getAs[Long]("n_clamped_hi")
      // ~5% clamped each side (integer cutoffs make it approximate)
      assert(lo <= n * 6 / 100 && hi <= n * 6 / 100, s"clamp fractions: $lo/$hi of $n")
      assert(lo + hi > 0, "winsorization did nothing — band covers everything")
      val wm = r.getAs[Double]("winsorized_mean")
      val rm = r.getAs[Double]("raw_mean")
      assert(math.abs(wm - rm) < math.abs(rm) * 0.5 + 1.0)
    }
  }

  // -------------------------------------------------- q259 stratified ATE

  test("q259 stratified ATE: the ATE column recombines from the per-stratum rows") {
    val rows = run("q259_stratified_ate").collect()
    val ate = rows.head.getAs[Double]("ate")
    assert(rows.map(_.getAs[Double]("ate")).forall(_ == ate))
    val num = rows.map { r =>
      BigDecimal(r.getAs[Double]("diff") *
          (r.getAs[Long]("n_t") + r.getAs[Long]("n_c")))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val den = rows.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum
    // diff is round@6 in the output while the query folds the unrounded
    // diff — recombination agrees to the rounding tolerance
    assert(math.abs(ate - (num.toDouble / den)) < 1e-4,
      s"ate=$ate recombined=${num.toDouble / den}")
  }

  // ----------------------------------- q260-q262 clustering/retrieval eval

  test("q260 silhouette: values bounded and clusters cover the corpus") {
    val rows = run("q260_silhouette").collect()
    assert(rows.length === 8)
    assert(rows.map(_.getAs[Long]("n_members")).sum === 500)
    rows.foreach { r =>
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= -1.0 && s <= 1.0)
    }
  }

  test("q261 NMI: information inequalities hold") {
    val r = run("q261_cluster_nmi").collect().head
    val mi = r.getAs[Double]("mi")
    val hc = r.getAs[Double]("h_cluster"); val hl = r.getAs[Double]("h_label")
    val nmi = r.getAs[Double]("nmi")
    assert(mi >= -1e-6 && nmi >= -1e-6 && nmi <= 1.0)
    assert(mi <= math.min(hc, hl) + 1e-4, s"MI $mi exceeds min entropy")
    assert(hc <= math.log(r.getAs[Long]("n_clusters").toDouble) + 1e-6)
    assert(hl <= math.log(r.getAs[Long]("n_labels").toDouble) + 1e-6)
  }

  test("q262 retrieval eval: metrics bounded, recall matches an independent intersection") {
    val rows = run("q262_retrieval_eval").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall10")
      val mrr = r.getAs[Double]("mrr"); val ndcg = r.getAs[Double]("ndcg10")
      assert(rec >= 0 && rec <= 1 && mrr >= 0 && mrr <= 1 && ndcg >= 0 && ndcg <= 1)
      assert(r.getAs[Long]("hits").toDouble / 10.0 === rec)
      // NDCG can't be positive with zero hits, must be 1 at full recall
      if (rec == 1.0) assert(ndcg === 1.0)
      if (r.getAs[Long]("hits") == 0L) assert(ndcg === 0.0)
    }
    // independent intersection: brute-force truth vs IVF candidates
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = emb.filter(col("vec_id") % 31 === 0 && col("vec_id") < 31 * 64)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val truth = graft.ext.Similarity.bruteForceTopK(corpus, queries, 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    val ann = graft.ext.Similarity.ivfTopK(corpus, queries, cents, 10, 2)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"))).toSet
    val hitsByQ = truth.intersect(ann).groupBy(_._1).view.mapValues(_.size).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("hits").toInt === hitsByQ.getOrElse(r.getAs[Long]("qid"), 0))
    }
  }

  // -------------------------------------------------- q263-q264 repair/CI

  test("q263 imputation: median matches brute force, imputed count ≈ n/37") {
    val rows = run("q263_impute_median").collect()
    val raw = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { r =>
      val et = r.getString(0)
      val all = raw.filter(_._1 == et)
      val kept = all.filter(_._2 % 37 != 0).map(x => math.round(x._3 * 100))
        .sorted
      // lower-median convention: first bin with 2·cum ≥ n
      val med = kept((kept.length - 1) / 2) / 100.0
      assert(r.getAs[Double]("median_used") === med, s"$et median")
      assert(r.getAs[Long]("n_imputed") === all.count(_._2 % 37 == 0).toLong)
      assert(r.getAs[Long]("n") === all.length.toLong)
    }
  }

  test("q264 Poisson bootstrap: deterministic, SE positive, mean near the sample mean") {
    val a = run("q264_poisson_bootstrap").collect().head
    val b = run("q264_poisson_bootstrap").collect().head
    assert(a === b, "bootstrap must be deterministic")
    val se = a.getAs[Double]("boot_se")
    val bm = a.getAs[Double]("boot_mean")
    assert(a.getAs[Long]("n_reps") === 20L)
    assert(se > 0)
    val sample = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .agg(avg(col("value"))).head.getDouble(0)
    assert(math.abs(bm - sample) < 5 * se,
      s"boot mean $bm vs sample mean $sample (se $se)")
  }

  // ------------------------------------------------- q265-q266 guarantees

  test("q265 conformal: splits partition the data and coverage tracks the 90% target") {
    val rows = run("q265_conformal").collect()
    val totals = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val seg = r.getString(0)
      assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") === totals(seg))
      assert(r.getAs[Long]("qhat") > 0)
      val cov = r.getAs[Double]("coverage")
      // ≥90% in expectation; finite halves wobble — generous floor per
      // segment, and the mean must sit at/above the nominal level − noise
      assert(cov >= 0.75 && cov <= 1.0, s"$seg coverage $cov")
    }
    val meanCov = rows.map(_.getAs[Double]("coverage")).sum / rows.length
    assert(meanCov >= 0.85, s"mean coverage $meanCov below the target band")
  }

  test("q266 kNN eval: majority vote matches an independent recomputation") {
    val rows = run("q266_knn_label_eval").collect()
    assert(rows.map(_.getAs[Long]("n")).sum === 500)
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(acc === r.getAs[Long]("n_correct").toDouble / r.getAs[Long]("n"))
    }
    // independent vote recomputation from the q136 kNN edges
    val knn = QueryCatalog.queries("q136_knn_graph")(spark, dir)
      .select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val correctByLabel = knn.groupBy(_._1).toSeq.map { case (src, es) =>
      val votes = es.map(e => labels(e._2)).groupBy(identity)
        .map { case (l, vs) => (l, vs.size) }
      val predicted = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      (labels(src), predicted == labels(src))
    }.groupBy(_._1).map { case (l, xs) => l -> xs.count(_._2).toLong }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_correct") ===
        correctByLabel.getOrElse(r.getAs[Long]("truth"), 0L),
        s"label ${r.getAs[Long]("truth")}")
    }
  }

  // ----------------------------------------------------- q254 Adamic–Adar

  test("q254 Adamic–Adar: top-20 matches a brute-force recomputation") {
    val got = run("q254_adamic_adar").collect()
      .map(r => (r.getAs[Long]("c1"), r.getAs[Long]("c2"),
        r.getAs[Long]("n_common"), r.getAs[Double]("aa_score")))
    assert(got.length === 20)
    assert(got.forall { case (c1, c2, nc, aa) => c1 < c2 && nc >= 1 && aa > 0 })
    val scores = got.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // brute force on collected edges
    val edges = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._2).map { case (pk, es) => pk -> es.length }
    val kept = deg.filter { case (_, d) => d >= 2 && d <= 32 }
    val term = kept.map { case (pk, d) =>
      pk -> BigDecimal(1.0 / math.log(d.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val byPart = edges.filter(e => kept.contains(e._2)).groupBy(_._2)
    val pairScores = scala.collection.mutable.Map[(Long, Long), BigDecimal]()
    val pairCount = scala.collection.mutable.Map[(Long, Long), Int]()
    byPart.foreach { case (pk, es) =>
      val cs = es.map(_._1).sorted
      for (i <- cs.indices; j <- (i + 1) until cs.length) {
        val key = (cs(i), cs(j))
        pairScores(key) = pairScores.getOrElse(key, BigDecimal(0)) + term(pk)
        pairCount(key) = pairCount.getOrElse(key, 0) + 1
      }
    }
    val expected = pairScores.toSeq
      .map { case (k, s) => (k._1, k._2, pairCount(k).toLong, s.toDouble) }
      .sortBy { case (c1, c2, _, aa) => (-aa, c1, c2) }
      .take(20)
    assert(got.toSeq === expected)
  }
}
