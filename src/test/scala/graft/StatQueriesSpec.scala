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
