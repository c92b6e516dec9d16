package graft.queries

import graft.plans.ScaleLint.BarrierSyntax

import graft.{Q, QueryDsl}
import QueryDsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Inference-at-scale operators: multiple-testing control, leakage-safe
  * feature encoding, offline changepoint detection, two-group survival
  * comparison, and isotonic calibration — the statistical layer a
  * training-data pipeline runs AFTER the per-metric statistics
  * (q146/q175/q182/q237) to turn per-segment numbers into decisions.
  *
  * Shared determinism discipline (QueryCatalog header): exact integer /
  * decimal arithmetic everywhere order can vary, ONE identical double
  * chain per statistic, ordered folds or round@6-decimal sums for any
  * float reduction over a data-dependent support.
  */
object StatQueries {

  /** BENJAMINI–HOCHBERG FDR CONTROL — the multiple-testing layer over
    * per-segment chi-square tests. At 100 TB you don't run ONE test, you
    * run one per segment (here 5 mktsegments × 25 nations) and 5% of the
    * nulls come back "significant" — BH caps the expected FALSE DISCOVERY
    * rate instead, the standard fix (Benjamini & Hochberg 1995).
    *
    * Per segment: a 2×3 independence test (high-value split × order
    * status) with exact integer cells; expected counts and the χ² fold
    * are ONE literal-order double chain (the q146 rule — six terms
    * written out, never a data-ordered reduction). df = (2−1)(3−1) = 2,
    * where the χ² survival function is CLOSED-FORM: p = exp(−χ²/2) — no
    * incomplete-gamma, so the p-value is a single transcendental both
    * engines evaluate identically on an identical input.
    *
    * BH step-up on the segment support (≤125 rows — every window here is
    * support-bounded, the q157 rule): rank p ascending, crit_i = i·α/m,
    * reject all ranks ≤ max{i : p_i ≤ crit_i}. The RANK is computed in
    * χ² space (descending ≡ p ascending, exp being monotone) because
    * exp() itself is only ulp-reproducible across engines — near-tied
    * p's can cross under JVM-vs-libm exp, which flipped two ranks at
    * sf0.001 until the ordering moved to the pure-arithmetic χ²; the
    * rejection compare uses round@6 on both sides for the same reason.
    * The data-sized work is exactly one grouped count. */
  val q249BhFdr: Q = Q(
    "q249_bh_fdr",
    (s, dir) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val seg = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_mktsegment"), col("n_name"),
          (col("o_totalprice") > 150000).as("hv"), col("o_orderstatus").as("st"))
      val cells = seg.groupBy(col("c_mktsegment"), col("n_name")).agg(
        countIf(col("hv") && col("st") === "F").as("f1"),
        countIf(col("hv") && col("st") === "O").as("o1"),
        countIf(col("hv") && col("st") === "P").as("p1"),
        countIf(!col("hv") && col("st") === "F").as("f0"),
        countIf(!col("hv") && col("st") === "O").as("o0"),
        countIf(!col("hv") && col("st") === "P").as("p0"))
      val withTots = cells
        .withColumn("r1", col("f1") + col("o1") + col("p1"))
        .withColumn("r0", col("f0") + col("o0") + col("p0"))
        .withColumn("cf", col("f1") + col("f0"))
        .withColumn("co", col("o1") + col("o0"))
        .withColumn("cp", col("p1") + col("p0"))
        .withColumn("n", col("r1") + col("r0"))
        .filter(col("r1") > 0 && col("r0") > 0 &&
          col("cf") > 0 && col("co") > 0 && col("cp") > 0)
      // expected counts: decimal product (count×count overflows int64 at
      // ~3e9-row segments; HUGEINT/decimal keeps both engines exact), one
      // double division; six (obs−e)²/e terms summed in LITERAL order
      def e(r: String, c: String) =
        d(dec(col(r)) * dec(col(c))) / d(col("n"))
      def term(obs: String, r: String, c: String) =
        (d(col(obs)) - e(r, c)) * (d(col(obs)) - e(r, c)) / e(r, c)
      val tested = withTots.withColumn("chi2",
        term("f1", "r1", "cf") + term("o1", "r1", "co") + term("p1", "r1", "cp") +
          term("f0", "r0", "cf") + term("o0", "r0", "co") + term("p0", "r0", "cp"))
        .withColumn("p", exp(-col("chi2") / 2))
      val wAll = Window.partitionBy()
      // rank in χ² space, NOT by p: exp() differs by an ulp between JVM
      // and libm, so near-tied p's can ORDER differently across engines —
      // χ² is pure arithmetic (engine-identical) and exp is monotone, so
      // χ² descending IS p ascending, minus the transcendental fuzz; the
      // rejection compare uses the round@6 values for the same reason
      val wRank = Window.orderBy(col("chi2").desc, col("c_mktsegment"), col("n_name"))
      val ranked = tested
        .withColumn("rnk", row_number().over(wRank).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("crit", d(col("rnk")) * 0.05 / d(col("m")))
        .withColumn("hit", round(col("p"), 6) <= round(col("crit"), 6))
      ranked
        .withColumn("max_hit_rank",
          max(when(col("hit"), col("rnk"))).over(wAll))
        .select(col("c_mktsegment"), col("n_name"),
          round(col("chi2"), 6).as("chi2"),
          round(col("p"), 6).as("p_value"),
          col("rnk"), col("m"),
          round(col("crit"), 6).as("bh_crit"),
          (col("rnk") <= coalesce(col("max_hit_rank"), lit(0L)))
            .cast("long").as("rejected"))
    },
    Some(s"""
      WITH seg AS (
        SELECT c_mktsegment, n_name,
          o_totalprice > 150000 AS hv, o_orderstatus AS st
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey),
      cells AS (
        SELECT c_mktsegment, n_name,
          ${oracleCountIf("hv AND st = 'F'")} AS f1,
          ${oracleCountIf("hv AND st = 'O'")} AS o1,
          ${oracleCountIf("hv AND st = 'P'")} AS p1,
          ${oracleCountIf("NOT hv AND st = 'F'")} AS f0,
          ${oracleCountIf("NOT hv AND st = 'O'")} AS o0,
          ${oracleCountIf("NOT hv AND st = 'P'")} AS p0
        FROM seg GROUP BY 1, 2),
      tots AS (
        SELECT *, f1 + o1 + p1 AS r1, f0 + o0 + p0 AS r0,
          f1 + f0 AS cf, o1 + o0 AS co, p1 + p0 AS cp,
          f1 + o1 + p1 + f0 + o0 + p0 AS n
        FROM cells
        WHERE f1 + o1 + p1 > 0 AND f0 + o0 + p0 > 0
          AND f1 + f0 > 0 AND o1 + o0 > 0 AND p1 + p0 > 0),
      tested AS (
        SELECT c_mktsegment, n_name,
          (CAST(f1 AS DOUBLE) - CAST(CAST(r1 AS HUGEINT) * cf AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(f1 AS DOUBLE) - CAST(CAST(r1 AS HUGEINT) * cf AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(CAST(r1 AS HUGEINT) * cf AS DOUBLE) / CAST(n AS DOUBLE))
          + (CAST(o1 AS DOUBLE) - CAST(CAST(r1 AS HUGEINT) * co AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(o1 AS DOUBLE) - CAST(CAST(r1 AS HUGEINT) * co AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(CAST(r1 AS HUGEINT) * co AS DOUBLE) / CAST(n AS DOUBLE))
          + (CAST(p1 AS DOUBLE) - CAST(CAST(r1 AS HUGEINT) * cp AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(p1 AS DOUBLE) - CAST(CAST(r1 AS HUGEINT) * cp AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(CAST(r1 AS HUGEINT) * cp AS DOUBLE) / CAST(n AS DOUBLE))
          + (CAST(f0 AS DOUBLE) - CAST(CAST(r0 AS HUGEINT) * cf AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(f0 AS DOUBLE) - CAST(CAST(r0 AS HUGEINT) * cf AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(CAST(r0 AS HUGEINT) * cf AS DOUBLE) / CAST(n AS DOUBLE))
          + (CAST(o0 AS DOUBLE) - CAST(CAST(r0 AS HUGEINT) * co AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(o0 AS DOUBLE) - CAST(CAST(r0 AS HUGEINT) * co AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(CAST(r0 AS HUGEINT) * co AS DOUBLE) / CAST(n AS DOUBLE))
          + (CAST(p0 AS DOUBLE) - CAST(CAST(r0 AS HUGEINT) * cp AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(p0 AS DOUBLE) - CAST(CAST(r0 AS HUGEINT) * cp AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(CAST(r0 AS HUGEINT) * cp AS DOUBLE) / CAST(n AS DOUBLE)) AS chi2
        FROM tots),
      withp AS (SELECT *, exp(-chi2 / 2) AS p FROM tested),
      ranked AS (
        SELECT *,
          CAST(ROW_NUMBER() OVER (ORDER BY chi2 DESC, c_mktsegment, n_name)
            AS BIGINT) AS rnk,
          CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM withp),
      crits AS (
        SELECT *, CAST(rnk AS DOUBLE) * 0.05 / CAST(m AS DOUBLE) AS crit
        FROM ranked)
      SELECT c_mktsegment, n_name,
        round(chi2, 6) AS chi2, round(p, 6) AS p_value,
        rnk, m, round(crit, 6) AS bh_crit,
        CAST(rnk <= COALESCE(
          MAX(CASE WHEN round(p, 6) <= round(crit, 6) THEN rnk END) OVER (), 0)
          AS BIGINT) AS rejected
      FROM crits
    """))

  /** OUT-OF-FOLD TARGET ENCODING — the leakage-safe categorical feature:
    * encode each fold's rows with the target mean computed from the OTHER
    * folds ((Σcat − Σfold) / (n_cat − n_fold)), so a row never sees its
    * own label — the K-fold mean-encoding every tabular-ML pipeline
    * ships, composed from the q160 engine-portable fold hash. One
    * grouped (category × fold) decimal-exact aggregate, then window sums
    * over the 25-row support; the single double division happens on
    * identical exact inputs. Output is the encoding TABLE (category ×
    * fold), the broadcastable artifact a scoring join would consume —
    * never a per-row materialization. */
  val q250TargetEncoding: Q = Q(
    "q250_target_encoding",
    (s, dir) => {
      val p = 1000003L
      val fold = pmod(pmod(pmod(col("o_orderkey"), lit(p)) * lit(2654435761L),
        lit(p)), lit(5L))
      val cf = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), fold.as("fold"),
          col("o_totalprice").cast(DecimalType(28, 2)).as("y"))
        .groupBy(col("c_mktsegment"), col("fold"))
        .agg(count(lit(1)).as("n_fold"), sum(col("y")).as("s_fold"))
      val w = Window.partitionBy(col("c_mktsegment"))
      cf.withColumn("n_cat", sum(col("n_fold")).over(w))
        .withColumn("s_cat", sum(col("s_fold")).over(w))
        .select(col("c_mktsegment"), col("fold"), col("n_fold"),
          ((col("s_cat") - col("s_fold")).cast("double")
            / (col("n_cat") - col("n_fold")).cast("double")).as("oof_mean"))
    },
    Some("""
      WITH cf AS (
        SELECT c_mktsegment,
          ((o_orderkey % 1000003) * 2654435761) % 1000003 % 5 AS fold,
          CAST(COUNT(*) AS BIGINT) AS n_fold,
          SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS s_fold
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2)
      SELECT c_mktsegment, fold, n_fold,
        CAST(SUM(s_fold) OVER (PARTITION BY c_mktsegment) - s_fold AS DOUBLE)
          / CAST(SUM(n_fold) OVER (PARTITION BY c_mktsegment) - n_fold AS DOUBLE)
          AS oof_mean
      FROM cf
    """))

  /** OFFLINE CHANGEPOINT DETECTION (max-CUSUM, first step of binary
    * segmentation) — where did each event type's daily revenue level
    * SHIFT? The statistic max_k |n·S_k − k·S_n| / (n·S_n) is the
    * normalized CUSUM deviation from a constant-rate line; its argmax is
    * the maximum-likelihood single changepoint under a mean shift (Page
    * 1954, the offline twin of q184's sequential CUSUM). EVERYTHING up
    * to the final normalization is exact: values quantized to µ-unit
    * longs (q237), daily sums and prefix sums in DECIMAL, the deviation
    * |n·S_k − k·S_n| a decimal product of exact terms — so the argmax is
    * an exact-integer comparison, immune to the float ties that make
    * naive argmax(double) engine-dependent. Day-support windows only
    * (the q157 rule); one data-sized grouped sum. */
  val q251Changepoint: Q = Q(
    "q251_changepoint",
    (s, dir) => {
      val micros = (round(col("value"), 6).cast(DecimalType(28, 6)) * 1000000)
        .cast("long")
      val perDay = t(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          micros.as("v"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("v").cast(DecimalType(38, 0))).as("rev"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wTot = Window.partitionBy(col("event_type"))
      val scored = perDay
        .withColumn("k", row_number().over(wCum).cast("long"))
        .withColumn("sk", sum(col("rev")).over(wCum))
        .withColumn("n_days", count(lit(1)).over(wTot))
        .withColumn("sn", sum(col("rev")).over(wTot))
        .withColumn("dev", abs(col("sk") * col("n_days") - col("sn") * col("k")))
      val wBest = Window.partitionBy(col("event_type"))
        .orderBy(col("dev").desc, col("day"))
      scored.withColumn("pick", row_number().over(wBest))
        .filter(col("pick") === 1)
        .select(col("event_type"), col("n_days"),
          col("day").as("cp_day"), col("k").as("cp_index"),
          (col("dev").cast("double")
            / (col("sn") * col("n_days")).cast("double")).as("cusum_stat"))
    },
    Some("""
      WITH perday AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          SUM(CAST(CAST(CAST(round(value, 6) AS DECIMAL(28,6)) * 1000000
            AS BIGINT) AS HUGEINT)) AS rev
        FROM events GROUP BY 1, 2),
      scored AS (
        SELECT event_type, day,
          CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
          SUM(rev) OVER w AS sk,
          CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
          SUM(rev) OVER (PARTITION BY event_type) AS sn
        FROM perday
        WINDOW w AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      dev AS (
        SELECT *, ABS(sk * n_days - sn * k) AS dev FROM scored),
      best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY dev DESC, day) AS pick
        FROM dev)
      SELECT event_type, n_days, day AS cp_day, k AS cp_index,
        CAST(dev AS DOUBLE) / CAST(sn * n_days AS DOUBLE) AS cusum_stat
      FROM best WHERE pick = 1
    """))

  /** LOG-RANK TEST — do two user cohorts convert at the same rate, with
    * censoring? The inferential companion to q175's Kaplan–Meier CURVE:
    * at every event day, compare cohort 1's observed conversions d1
    * against its expectation d·(n1/n) under the null of identical hazard,
    * then z = Σ(d1 − e1) / √ΣV with the hypergeometric variance
    * V = d·(n1/n)·(1−n1/n)·(n−d)/(n−1) (Mantel 1966). At-risk counts
    * per cohort follow the exact q175 cumulate over the day support;
    * each day's e1 and V are one identical double chain rounded @6 into
    * DECIMAL so the over-days sums are EXACT (the q127 rule: never sum
    * raw doubles over a data-dependent support). Days with d = 0
    * contribute nothing; n > 1 guards the variance (both filters
    * mirrored in the oracle). One data-sized pass: the per-user min/max
    * aggregate. */
  val q252LogRank: Q = Q(
    "q252_logrank",
    (s, dir) => {
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val per = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("t0"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
            .as("conv"),
          max(unix_micros(col("ts"))).as("tend"))
        .select((col("user_id") % 2).as("g"),
          when(col("conv").isNotNull, 1L).otherwise(0L).as("event"),
          expr("(coalesce(conv, tend) - t0) div 86400000000").as("day"))
        .barrier() // feeds the day table AND the cohort totals
      val perDay = per.groupBy(col("day")).agg(
        countIf(col("event") === 1 && col("g") === 1).as("d1"),
        countIf(col("event") === 0 && col("g") === 1).as("c1"),
        countIf(col("event") === 1 && col("g") === 0).as("d0"),
        countIf(col("event") === 0 && col("g") === 0).as("c0"))
      val tot = per.agg(countIf(col("g") === 1).as("n1_tot"),
        countIf(col("g") === 0).as("n0_tot"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val risk = perDay.crossJoin(broadcast(tot))
        .withColumn("ar1", col("n1_tot") - sum(col("d1") + col("c1")).over(w)
          + col("d1") + col("c1"))
        .withColumn("ar0", col("n0_tot") - sum(col("d0") + col("c0")).over(w)
          + col("d0") + col("c0"))
        .withColumn("n", col("ar1") + col("ar0"))
        .withColumn("dd", col("d1") + col("d0"))
        .filter(col("dd") >= 1 && col("n") > 1)
      val ratio = d(col("ar1")) / d(col("n"))
      val terms = risk
        .withColumn("e1_t", round(d(col("dd")) * ratio, 6)
          .cast(DecimalType(18, 6)))
        .withColumn("v_t", round(d(col("dd")) * ratio * (lit(1.0) - ratio)
          * (d(col("n") - col("dd")) / d(col("n") - 1)), 6)
          .cast(DecimalType(18, 6)))
      terms.agg(sum(col("d1")).as("o1"),
          sum(col("e1_t")).cast("double").as("e1"),
          sum(col("v_t")).cast("double").as("v"))
        .select(col("o1"), col("e1"), col("v"),
          round((d(col("o1")) - col("e1")) / sqrt(col("v")), 6).as("z"),
          round((d(col("o1")) - col("e1")) * (d(col("o1")) - col("e1"))
            / col("v"), 6).as("chi2"))
    },
    Some(s"""
      WITH per AS (
        SELECT user_id, min(epoch_us(ts)) AS t0,
          min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS conv,
          max(epoch_us(ts)) AS tend
        FROM events GROUP BY user_id),
      durs AS (
        SELECT user_id % 2 AS g,
          CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS event,
          (COALESCE(conv, tend) - t0) // 86400000000 AS day
        FROM per),
      perday AS (
        SELECT day,
          ${oracleCountIf("event = 1 AND g = 1")} AS d1,
          ${oracleCountIf("event = 0 AND g = 1")} AS c1,
          ${oracleCountIf("event = 1 AND g = 0")} AS d0,
          ${oracleCountIf("event = 0 AND g = 0")} AS c0
        FROM durs GROUP BY day),
      tot AS (
        SELECT ${oracleCountIf("g = 1")} AS n1_tot,
          ${oracleCountIf("g = 0")} AS n0_tot
        FROM durs),
      risk AS (
        SELECT day, d1, d0,
          n1_tot - CAST(SUM(d1 + c1) OVER cum AS BIGINT) + d1 + c1 AS ar1,
          n0_tot - CAST(SUM(d0 + c0) OVER cum AS BIGINT) + d0 + c0 AS ar0
        FROM perday, tot
        WINDOW cum AS (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      kept AS (
        SELECT *, ar1 + ar0 AS n, d1 + d0 AS dd FROM risk
        WHERE d1 + d0 >= 1 AND ar1 + ar0 > 1),
      terms AS (
        SELECT d1,
          CAST(round(CAST(dd AS DOUBLE) * (CAST(ar1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
            AS DECIMAL(18,6)) AS e1_t,
          CAST(round(CAST(dd AS DOUBLE) * (CAST(ar1 AS DOUBLE) / CAST(n AS DOUBLE))
              * (1.0e0 - CAST(ar1 AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(n - dd AS DOUBLE) / CAST(n - 1 AS DOUBLE)), 6)
            AS DECIMAL(18,6)) AS v_t
        FROM kept),
      agg AS (
        SELECT CAST(SUM(d1) AS BIGINT) AS o1,
          CAST(SUM(e1_t) AS DOUBLE) AS e1,
          CAST(SUM(v_t) AS DOUBLE) AS v
        FROM terms)
      SELECT o1, e1, v,
        round((CAST(o1 AS DOUBLE) - e1) / sqrt(v), 6) AS z,
        round((CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v, 6)
          AS chi2
      FROM agg
    """))

  /** ISOTONIC CALIBRATION (pool-adjacent-violators) — q182 ASKS whether
    * the fraud score is calibrated; this FIXES it: the monotone step
    * function closest (weighted least squares) to the per-bin observed
    * rates, i.e. sklearn's IsotonicRegression, the standard
    * post-training calibrator. Computed via the PAV minimax identity
    * f(i) = max_{j≤i} min_{k≥i} avg(y[j..k]) (Barlow et al. 1972) over
    * 20 FIXED-WIDTH score bins: interval averages come from exact
    * integer prefix sums ((cy_k − cy_{j−1}) / (cn_k − cn_{j−1})), so
    * every candidate average is one identical double division and the
    * max/min lattice is order-free — no iterative pooling loop, no
    * float accumulation. The O(B³) lattice runs on the BIN support
    * (≤ 20³ = 8000 tuples, broadcast); the data-sized work is one
    * grouped count. Monotonicity of the output is pinned in
    * StatQueriesSpec against a hand-rolled sequential PAV. */
  val q253IsotonicCalibration: Q = Q(
    "q253_isotonic_calibration",
    (s, dir) => {
      val feats = graft.gold.Gold.customerFeatures(t(s, dir, "orders"))
      val z = lit(-3.0) +
        col("total_spend") * lit(5.0e-7) +
        col("n_orders") * lit(0.05) +
        col("urgent_ratio") * lit(1.5) +
        col("finished_ratio") * lit(-0.8) +
        col("lifetime_days") * lit(2.0e-4)
      val scored = feats.select(
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("p"),
        (col("urgent_ratio") > 0.25).cast("long").as("y"))
      val perBin = scored
        .withColumn("bin", least(floor(col("p") * 20).cast("long"), lit(19L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val wCum = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perBin
        .withColumn("cy", sum(col("sy")).over(wCum))
        .withColumn("cn", sum(col("n")).over(wCum))
        .barrier() // ≤20-row support feeds j, k, AND the lattice base
      val j = cum.select(col("bin").as("bj"),
        (col("cy") - col("sy")).as("cy_before"),
        (col("cn") - col("n")).as("cn_before"))
      val k = cum.select(col("bin").as("bk"), col("cy"), col("cn"))
      val intervals = j.join(broadcast(k), col("bj") <= col("bk"))
        .select(col("bj"), col("bk"),
          ((col("cy") - col("cy_before")).cast("double")
            / (col("cn") - col("cn_before")).cast("double")).as("wavg"))
      val iso = cum.select(col("bin"))
        .join(broadcast(intervals), col("bj") <= col("bin") && col("bk") >= col("bin"))
        .groupBy(col("bin"), col("bj")).agg(min(col("wavg")).as("inner_min"))
        .groupBy(col("bin")).agg(max(col("inner_min")).as("iso_rate"))
      cum.join(iso, Seq("bin"))
        .select(col("bin"), col("n"),
          (col("sy").cast("double") / col("n").cast("double")).as("raw_rate"),
          col("iso_rate"))
    },
    Some(s"""
      WITH feats AS (
        SELECT o_custkey,
          COUNT(*) AS n_orders,
          ${oracleDsum("o_totalprice", 2)} AS total_spend,
          ${oracleCountIf("o_orderpriority = '1-URGENT'")}
            / COUNT(*) AS urgent_ratio,
          ${oracleCountIf("o_orderstatus = 'F'")}
            / COUNT(*) AS finished_ratio,
          date_diff('day', MIN(CAST(o_orderdate AS DATE)),
            MAX(CAST(o_orderdate AS DATE))) AS lifetime_days
        FROM orders GROUP BY o_custkey),
      scored AS (
        SELECT round(1.0 / (1.0 + exp(-(-3.0 + total_spend * 0.0000005
            + n_orders * 0.05 + urgent_ratio * 1.5
            + finished_ratio * -0.8 + lifetime_days * 0.0002))), 6) AS p,
          CAST(urgent_ratio > 0.25 AS BIGINT) AS y
        FROM feats),
      perbin AS (
        SELECT LEAST(CAST(FLOOR(p * 20) AS BIGINT), 19) AS bin,
          CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
        FROM scored GROUP BY 1),
      cum AS (
        SELECT *,
          CAST(SUM(sy) OVER w AS BIGINT) AS cy,
          CAST(SUM(n) OVER w AS BIGINT) AS cn
        FROM perbin
        WINDOW w AS (ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      intervals AS (
        SELECT j.bin AS bj, k.bin AS bk,
          CAST(k.cy - (j.cy - j.sy) AS DOUBLE)
            / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS wavg
        FROM cum j JOIN cum k ON j.bin <= k.bin),
      iso AS (
        SELECT bin, MAX(inner_min) AS iso_rate FROM (
          SELECT c.bin, i.bj, MIN(i.wavg) AS inner_min
          FROM cum c JOIN intervals i ON i.bj <= c.bin AND i.bk >= c.bin
          GROUP BY c.bin, i.bj)
        GROUP BY bin)
      SELECT p.bin, p.n,
        CAST(p.sy AS DOUBLE) / CAST(p.n AS DOUBLE) AS raw_rate,
        i.iso_rate
      FROM perbin p JOIN iso i ON p.bin = i.bin
    """))

  /** SHAPLEY-VALUE ATTRIBUTION — the coalition-game answer to "which
    * channel DESERVES the conversion credit" (Shapley 1953, applied to
    * marketing paths as in Zhao et al. 2018). q144's last-touch gives
    * 100% to the final click; Shapley splits credit by each channel's
    * average marginal contribution across all 4! orderings of the
    * 4-channel coalition. v(S) = conversion rate of users whose
    * pre-conversion touched-channel set is exactly S; φ_j =
    * Σ_{S∌j} |S|!(3−|S|)!/4! · [v(S∪j) − v(S)].
    *
    * Scale shape: ONE user-keyed aggregate derives each user's first
    * purchase time and per-channel first-touch times in a single pass
    * (no join-back — the channel minima and the conversion minimum are
    * parallel conditional mins); the 16-subset × 4-channel Shapley
    * lattice is literal-sized. Determinism: v's are exact-integer
    * divisions; each lattice term multiplies by an INTEGER factorial
    * numerator before one /24.0 (fixed op order), rounds @9 into
    * DECIMAL, and the 8-term sum is exact (the q127 rule). Efficiency
    * property Σφ_j = v(full) − v(∅) is pinned in StatQueriesSpec. */
  val q255ShapleyAttribution: Q = Q(
    "q255_shapley_attribution",
    (s, dir) => {
      val channels = Seq("click" -> 1L, "view" -> 2L, "signup" -> 4L, "error" -> 8L)
      val us = unix_micros(col("ts"))
      val per = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "purchase", us)).as("cv"),
          min(when(col("event_type") === "click", us)).as("t_click"),
          min(when(col("event_type") === "view", us)).as("t_view"),
          min(when(col("event_type") === "signup", us)).as("t_signup"),
          min(when(col("event_type") === "error", us)).as("t_error"))
      def touched(c: String) = col(s"t_$c").isNotNull &&
        (col("cv").isNull || col(s"t_$c") < col("cv"))
      val mask = channels.map { case (c, bit) =>
        touched(c).cast("long") * bit }.reduce(_ + _)
      val stats = per
        .select(mask.as("mask"), col("cv").isNotNull.cast("long").as("conv"))
        .groupBy(col("mask"))
        .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      // 16-row lattice with v(mask); absent masks → v = 0 by convention
      val lattice = s.range(16).toDF("m")
        .join(stats, col("m") === col("mask"), "left")
        .select(col("m"),
          coalesce(col("n_conv").cast("double") / col("n_users").cast("double"),
            lit(0.0)).as("v"))
        .barrier() // base AND +bit sides of the lattice join
      val chan = s.createDataFrame(channels).toDF("channel", "bit")
      // factorial numerator by |S|: 0→6, 1→2, 2→2, 3→6 (over 4! = 24)
      val pop = (col("m") % 2) + (expr("m div 2") % 2) +
        (expr("m div 4") % 2) + (expr("m div 8") % 2)
      val wNum = when(pop === 0, 6L).when(pop === 1, 2L)
        .when(pop === 2, 2L).otherwise(6L)
      val terms = lattice.crossJoin(broadcast(chan))
        .filter(col("m").bitwiseAND(col("bit")) === 0)
        .join(broadcast(lattice.select(col("m").as("mj"), col("v").as("vj"))),
          col("mj") === col("m") + col("bit"))
        .select(col("channel"),
          round(wNum.cast("double") * (col("vj") - col("v")) / 24.0, 9)
            .cast(DecimalType(18, 9)).as("term"))
      terms.groupBy(col("channel"))
        .agg(sum(col("term")).cast("double").as("shapley"))
    },
    Some("""
      WITH per AS (
        SELECT user_id,
          min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS cv,
          min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
          min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
          min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
          min(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) AS t_error
        FROM events GROUP BY user_id),
      masked AS (
        SELECT
          CAST(t_click IS NOT NULL AND (cv IS NULL OR t_click < cv) AS BIGINT) * 1
          + CAST(t_view IS NOT NULL AND (cv IS NULL OR t_view < cv) AS BIGINT) * 2
          + CAST(t_signup IS NOT NULL AND (cv IS NULL OR t_signup < cv) AS BIGINT) * 4
          + CAST(t_error IS NOT NULL AND (cv IS NULL OR t_error < cv) AS BIGINT) * 8
            AS mask,
          CAST(cv IS NOT NULL AS BIGINT) AS conv
        FROM per),
      stats AS (
        SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_users,
          CAST(SUM(conv) AS BIGINT) AS n_conv
        FROM masked GROUP BY mask),
      lattice AS (
        SELECT r.range AS m,
          COALESCE(CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE), 0.0) AS v
        FROM range(16) r LEFT JOIN stats ON r.range = stats.mask),
      chan AS (
        SELECT * FROM (VALUES ('click', 1), ('view', 2), ('signup', 4),
          ('error', 8)) AS t(channel, bit)),
      terms AS (
        SELECT channel,
          CAST(round(
            (CASE (m % 2) + (m // 2 % 2) + (m // 4 % 2) + (m // 8 % 2)
               WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
            * (j.vj - l.v) / 24.0, 9) AS DECIMAL(18,9)) AS term
        FROM lattice l
        CROSS JOIN chan
        JOIN (SELECT m AS mj, v AS vj FROM lattice) j ON j.mj = l.m + chan.bit
        WHERE (l.m & chan.bit) = 0)
      SELECT channel, CAST(SUM(term) AS DOUBLE) AS shapley
      FROM terms GROUP BY channel
    """))

  /** HOLT LINEAR-TREND FORECAST (double exponential smoothing) — the
    * level+trend recurrence (Holt 1957) q151's single EWMA can't express:
    * l_t = αy_t + (1−α)(l_{t−1}+b_{t−1}), b_t = β(l_t−l_{t−1}) +
    * (1−β)b_{t−1}, per event type's daily-revenue series. A TWO-STATE
    * sequential recurrence over the bounded day support: both engines
    * run the IDENTICAL ordered fold with a 2-element double-array
    * accumulator (Spark `aggregate` with an explicit [l₀, b₀] zero;
    * DuckDB `list_reduce` with the zero PREPENDED, the q175 trick lifted
    * to vector state — DuckDB's reduce has no zero parameter and
    * requires acc/element type equality, so the oracle's elements are
    * [y, 0] pairs whose second slot is ignored). Same IEEE ops in the
    * same order ⇒ identical doubles, no decimal quantization needed
    * until the display rounding. The only data-sized pass is the daily
    * grouped sum. */
  val q256HoltForecast: Q = Q(
    "q256_holt_forecast",
    (s, dir) => {
      val perDay = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(col("value").cast(DecimalType(28, 8))).cast("double").as("y"))
      val series = perDay.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sort_array(collect_list(struct(col("day"), col("y")))).as("vs"))
      val ys = transform(col("vs"), v => v.getField("y"))
      val folded = series
        .withColumn("acc", aggregate(
          slice(ys, lit(2), greatest(size(ys) - 1, lit(0))),
          array(element_at(ys, 1), lit(0.0)),
          (acc, y) => array(
            lit(0.3) * y + lit(0.7) * (element_at(acc, 1) + element_at(acc, 2)),
            lit(0.1) * (lit(0.3) * y
                + lit(0.7) * (element_at(acc, 1) + element_at(acc, 2))
                - element_at(acc, 1))
              + lit(0.9) * element_at(acc, 2))))
      folded.select(col("event_type"), col("n_days"),
        round(element_at(col("acc"), 1), 6).as("level"),
        round(element_at(col("acc"), 2), 6).as("trend"),
        round(element_at(col("acc"), 1) + lit(7.0) * element_at(col("acc"), 2), 6)
          .as("forecast_7d"))
    },
    Some("""
      WITH perday AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2),
      series AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
          list([y, 0.0e0] ORDER BY day) AS vs
        FROM perday GROUP BY event_type),
      folded AS (
        SELECT event_type, n_days,
          list_reduce(
            list_prepend([vs[1][1], 0.0e0], vs[2:]),
            (acc, x) -> [
              0.3 * x[1] + 0.7 * (acc[1] + acc[2]),
              0.1 * (0.3 * x[1] + 0.7 * (acc[1] + acc[2]) - acc[1])
                + 0.9 * acc[2]]) AS acc
        FROM series)
      SELECT event_type, n_days,
        round(acc[1], 6) AS level,
        round(acc[2], 6) AS trend,
        round(acc[1] + 7.0 * acc[2], 6) AS forecast_7d
      FROM folded
    """))

  /** MANN–KENDALL TREND TEST — is there a MONOTONIC trend at all? The
    * nonparametric significance companion to q186's Theil–Sen slope
    * (same pairs; MK asks "is it real", Theil–Sen asks "how steep").
    * S = Σ_{i<j} sign(y_j − y_i) over each event type's daily series —
    * EXACT integers end to end (daily values are µ-unit longs, sign
    * comparisons integer), including the tie-adjusted variance
    * (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18 and the continuity-corrected
    * z. The day×day pair join runs on the aggregated day support
    * (≤ span² rows, broadcast — the q186/q157 rule), never on events. */
  val q257MannKendall: Q = Q(
    "q257_mann_kendall",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum((round(col("value"), 6).cast(DecimalType(28, 6)) * 1000000)
          .cast("long")).as("y"))
        .barrier() // pairs (both sides) + tie groups + n
      val a = daily.select(col("event_type"), col("day").as("da"), col("y").as("ya"))
      val b = daily.select(col("event_type").as("et_b"), col("day").as("db"),
        col("y").as("yb"))
      val sStat = a.join(broadcast(b),
          col("event_type") === col("et_b") && col("db") > col("da"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("yb") > col("ya"), 1L)
          .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s_stat"))
      val ties = daily.groupBy(col("event_type"), col("y"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("event_type"))
        .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_adj"),
          sum(col("t")).as("n"))
      sStat.join(ties, Seq("event_type"))
        .withColumn("var_s",
          (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie_adj"))
            .cast("double") / 18.0)
        .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
          round(col("var_s"), 6).as("var_s"),
          round(when(col("s_stat") > 0,
              (col("s_stat") - 1).cast("double") / sqrt(col("var_s")))
            .when(col("s_stat") < 0,
              (col("s_stat") + 1).cast("double") / sqrt(col("var_s")))
            .otherwise(lit(0.0)), 6).as("z"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          CAST(SUM(CAST(CAST(round(value, 6) AS DECIMAL(28,6)) * 1000000
            AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
      s AS (
        SELECT a.event_type,
          CAST(SUM(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
            ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.day > a.day
        GROUP BY a.event_type),
      ties AS (
        SELECT event_type,
          CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_adj,
          CAST(SUM(t) AS BIGINT) AS n
        FROM (SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS t
              FROM daily GROUP BY 1, 2)
        GROUP BY event_type),
      v AS (
        SELECT s.event_type, n, s_stat,
          CAST(n * (n - 1) * (2 * n + 5) - tie_adj AS DOUBLE) / 18.0 AS var_s
        FROM s JOIN ties ON s.event_type = ties.event_type)
      SELECT event_type, n AS n_days, s_stat,
        round(var_s, 6) AS var_s,
        round(CASE WHEN s_stat > 0
            THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
          WHEN s_stat < 0
            THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
          ELSE 0.0 END, 6) AS z
      FROM v
    """))

  /** WINSORIZED MEAN — q187's robust-location sibling: CLAMP the tails
    * to the [p05, p95] band instead of dropping them (winsorizing keeps
    * n constant — the right choice when downstream weights assume every
    * row survives). Same q169 counting-percentile band (cent bins ⇒
    * state bounded by value-range × 100 regardless of rows); clamped
    * replacements are bin-boundary doubles produced by one identical
    * division, unclamped values pass through exactly, and the mean is a
    * decimal-exact sum over both. */
  val q258WinsorizedMean: Q = Q(
    "q258_winsorized_mean",
    (s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"), col("value"))
        .withColumn("bin", round(col("value") * 100).cast("long"))
        .barrier() // feeds cutoffs AND the clamp
      val counts = e.groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      val wAll = Window.partitionBy(col("event_type"))
      val cuts = counts
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(wAll))
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") * 100 >= col("n") * 5, col("bin"))).as("lo"),
          min(when(col("cum") * 100 >= col("n") * 95, col("bin"))).as("hi"))
      val clamped = when(col("bin") < col("lo"), col("lo").cast("double") / 100.0)
        .when(col("bin") > col("hi"), col("hi").cast("double") / 100.0)
        .otherwise(col("value"))
      e.join(broadcast(cuts), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countIf(col("bin") < col("lo")).as("n_clamped_lo"),
          countIf(col("bin") > col("hi")).as("n_clamped_hi"),
          (sum(clamped.cast(DecimalType(28, 8))).cast("double")
            / count(lit(1))).as("winsorized_mean"),
          (sum(col("value").cast(DecimalType(28, 8))).cast("double")
            / count(lit(1))).as("raw_mean"))
    },
    Some(s"""
      WITH e AS (
        SELECT event_type, value,
          CAST(round(value * 100) AS BIGINT) AS bin
        FROM events),
      counts AS (
        SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
        FROM e GROUP BY 1, 2),
      cum AS (
        SELECT event_type, bin, c,
          CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM counts),
      cuts AS (
        SELECT event_type,
          MIN(CASE WHEN cum * 100 >= n * 5 THEN bin END) AS lo,
          MIN(CASE WHEN cum * 100 >= n * 95 THEN bin END) AS hi
        FROM cum GROUP BY event_type)
      SELECT event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        ${oracleCountIf("bin < lo")} AS n_clamped_lo,
        ${oracleCountIf("bin > hi")} AS n_clamped_hi,
        CAST(SUM(CAST(CASE WHEN bin < lo THEN CAST(lo AS DOUBLE) / 100.0
            WHEN bin > hi THEN CAST(hi AS DOUBLE) / 100.0
            ELSE value END AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*)
          AS winsorized_mean,
        CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS raw_mean
      FROM e JOIN cuts USING (event_type)
      GROUP BY event_type
    """))

  /** STRATIFIED TREATMENT-EFFECT ESTIMATE — the observational-causal
    * closer of the experimentation tier (q224 DiD → q225 CUPED → q232
    * sizing → q234 OR): compare parity cohorts' purchase spend WITHIN
    * activity strata, then weight the per-stratum differences by stratum
    * size (stratification removes the confounding an overall difference
    * would absorb when activity differs across arms). Strata are
    * quintiles of per-user event count from the q169 COUNTING percentile
    * over the count support (counts are small integers — state bounded
    * by the count range, never by users). Per-(stratum, arm) moments are
    * exact decimal µ-units; each stratum's weighted difference rounds @9
    * into DECIMAL so the 5-term sum is exact (the q127 rule). Output is
    * the per-stratum table with the ATE riding along as a constant
    * column. */
  val q259StratifiedAte: Q = Q(
    "q259_stratified_ate",
    (s, dir) => {
      val micros = (round(col("value"), 6).cast(DecimalType(28, 6)) * 1000000)
        .cast("long")
      val per = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          sum(when(col("event_type") === "purchase", micros).otherwise(0L))
            .as("spend"))
        .select((col("user_id") % 2).as("arm"), col("n_ev"), col("spend"))
        .barrier() // feeds the cutoffs AND the strata
      val w = Window.orderBy(col("n_ev"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      val cuts = per.groupBy(col("n_ev")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(wAll))
        .agg(min(when(col("cum") * 5 >= col("n") * 1, col("n_ev"))).as("c1"),
          min(when(col("cum") * 5 >= col("n") * 2, col("n_ev"))).as("c2"),
          min(when(col("cum") * 5 >= col("n") * 3, col("n_ev"))).as("c3"),
          min(when(col("cum") * 5 >= col("n") * 4, col("n_ev"))).as("c4"))
      val stratum = (col("n_ev") > col("c1")).cast("long") +
        (col("n_ev") > col("c2")).cast("long") +
        (col("n_ev") > col("c3")).cast("long") +
        (col("n_ev") > col("c4")).cast("long")
      val cells = per.crossJoin(broadcast(cuts))
        .select(stratum.as("stratum"), col("arm"),
          col("spend").cast(DecimalType(28, 0)).as("spend"))
        .groupBy(col("stratum"), col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("spend")).as("sv"))
      val wide = cells.groupBy(col("stratum")).agg(
          max(when(col("arm") === 1, col("n"))).as("n_t"),
          max(when(col("arm") === 0, col("n"))).as("n_c"),
          max(when(col("arm") === 1, col("sv").cast("double"))).as("sv_t"),
          max(when(col("arm") === 0, col("sv").cast("double"))).as("sv_c"))
        .filter(col("n_t").isNotNull && col("n_c").isNotNull)
        .withColumn("mean_t", col("sv_t") / col("n_t") / 1e6)
        .withColumn("mean_c", col("sv_c") / col("n_c") / 1e6)
        .withColumn("diff", col("mean_t") - col("mean_c"))
        .barrier() // per-stratum rows AND the ATE fold
      val ate = wide.select(
          round((col("diff") * (col("n_t") + col("n_c")).cast("double")), 9)
            .cast(DecimalType(28, 9)).as("wdiff"),
          (col("n_t") + col("n_c")).as("ns"))
        .agg((sum(col("wdiff")).cast("double")
          / sum(col("ns")).cast("double")).as("ate"))
      wide.crossJoin(broadcast(ate))
        .select(col("stratum"), col("n_t"), col("n_c"),
          round(col("mean_t"), 6).as("mean_t"),
          round(col("mean_c"), 6).as("mean_c"),
          round(col("diff"), 6).as("diff"),
          round(col("ate"), 6).as("ate"))
    },
    Some("""
      WITH per AS (
        SELECT user_id % 2 AS arm, COUNT(*) AS n_ev,
          SUM(CASE WHEN event_type = 'purchase'
            THEN CAST(CAST(round(value, 6) AS DECIMAL(28,6)) * 1000000 AS BIGINT)
            ELSE 0 END) AS spend
        FROM events GROUP BY user_id),
      cc AS (
        SELECT n_ev, CAST(COUNT(*) AS BIGINT) AS c FROM per GROUP BY n_ev),
      cum AS (
        SELECT n_ev,
          CAST(SUM(c) OVER (ORDER BY n_ev
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM cc),
      cuts AS (
        SELECT MIN(CASE WHEN cum * 5 >= n * 1 THEN n_ev END) AS c1,
          MIN(CASE WHEN cum * 5 >= n * 2 THEN n_ev END) AS c2,
          MIN(CASE WHEN cum * 5 >= n * 3 THEN n_ev END) AS c3,
          MIN(CASE WHEN cum * 5 >= n * 4 THEN n_ev END) AS c4
        FROM cum),
      cells AS (
        SELECT CAST(n_ev > c1 AS BIGINT) + CAST(n_ev > c2 AS BIGINT)
            + CAST(n_ev > c3 AS BIGINT) + CAST(n_ev > c4 AS BIGINT) AS stratum,
          arm, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(spend AS HUGEINT)) AS sv
        FROM per, cuts GROUP BY 1, 2),
      wide AS (
        SELECT stratum,
          MAX(CASE WHEN arm = 1 THEN n END) AS n_t,
          MAX(CASE WHEN arm = 0 THEN n END) AS n_c,
          MAX(CASE WHEN arm = 1 THEN CAST(sv AS DOUBLE) END) AS sv_t,
          MAX(CASE WHEN arm = 0 THEN CAST(sv AS DOUBLE) END) AS sv_c
        FROM cells GROUP BY stratum
        HAVING MAX(CASE WHEN arm = 1 THEN n END) IS NOT NULL
           AND MAX(CASE WHEN arm = 0 THEN n END) IS NOT NULL),
      diffs AS (
        SELECT stratum, n_t, n_c,
          sv_t / n_t / 1e6 AS mean_t,
          sv_c / n_c / 1e6 AS mean_c,
          sv_t / n_t / 1e6 - sv_c / n_c / 1e6 AS diff
        FROM wide),
      ate AS (
        SELECT CAST(SUM(CAST(round(diff * CAST(n_t + n_c AS DOUBLE), 9)
            AS DECIMAL(28,9))) AS DOUBLE)
          / CAST(SUM(n_t + n_c) AS DOUBLE) AS ate
        FROM diffs)
      SELECT stratum, n_t, n_c,
        round(mean_t, 6) AS mean_t, round(mean_c, 6) AS mean_c,
        round(diff, 6) AS diff, round(ate, 6) AS ate
      FROM diffs, ate
    """))

  /** GROUP-MEDIAN IMPUTATION — the standard missing-value repair for a
    * numeric feature: nulls get their group's median, computed from the
    * NON-NULL survivors via the q169/q187 counting percentile (cent bins
    * ⇒ aggregation state bounded by value-range × 100 at any row count —
    * never Spark's exact `percentile`, the q187 OOM class). The missing
    * pattern is planted deterministically (event_id ≡ 0 mod 37 → NULL)
    * so both engines dirty identically; imputed values are exact
    * bin-boundary doubles from one identical division, and the post-
    * imputation mean is a decimal-exact sum. */
  val q263Impute: Q = Q(
    "q263_impute_median",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"),
          when(col("event_id") % 37 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
        .withColumn("bin",
          when(col("v").isNotNull, round(col("v") * 100).cast("long")))
        .barrier() // feeds the cutoffs AND the imputation pass
      val counts = e.filter(col("bin").isNotNull)
        .groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      val wAll = Window.partitionBy(col("event_type"))
      val med = counts
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("nn", sum(col("c")).over(wAll))
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") * 2 >= col("nn"), col("bin"))).as("med_bin"))
      val imputed = coalesce(col("v"), col("med_bin").cast("double") / 100.0)
      e.join(broadcast(med), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countIf(col("v").isNull).as("n_imputed"),
          max(col("med_bin").cast("double") / 100.0).as("median_used"),
          (sum(imputed.cast(DecimalType(28, 8))).cast("double")
            / count(lit(1))).as("imputed_mean"))
    },
    Some(s"""
      WITH e AS (
        SELECT event_type,
          CASE WHEN event_id % 37 = 0 THEN NULL ELSE value END AS v,
          CASE WHEN event_id % 37 = 0 THEN NULL
            ELSE CAST(round(value * 100) AS BIGINT) END AS bin
        FROM events),
      counts AS (
        SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
        FROM e WHERE bin IS NOT NULL GROUP BY 1, 2),
      cum AS (
        SELECT event_type, bin,
          CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS nn
        FROM counts),
      med AS (
        SELECT event_type,
          MIN(CASE WHEN cum * 2 >= nn THEN bin END) AS med_bin
        FROM cum GROUP BY event_type)
      SELECT event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        ${oracleCountIf("v IS NULL")} AS n_imputed,
        MAX(CAST(med_bin AS DOUBLE) / 100.0) AS median_used,
        CAST(SUM(CAST(COALESCE(v, CAST(med_bin AS DOUBLE) / 100.0)
          AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS imputed_mean
      FROM e JOIN med USING (event_type)
      GROUP BY event_type
    """))

  /** POISSON BOOTSTRAP — THE bootstrap at 100 TB (Chamandy et al. 2012):
    * instead of resampling n rows with replacement (which needs global
    * coordination), each row independently enters replicate r with
    * Poisson(1) multiplicity — map-side, embarrassingly parallel, and
    * here fully DETERMINISTIC: the multiplicity comes from the catalog's
    * portable modular hash of (event_id, r) inverse-CDF'd through exact
    * integer thresholds (P(0)·10⁴ = 3679 …), so both engines draw the
    * SAME bootstrap. 20 replicates of the mean purchase value via one
    * explode (fan-out exactly R — the q231 shape), exact decimal
    * weighted sums per replicate, and the replicate-mean spread folded
    * @9 into DECIMAL for the SE. */
  val q264PoissonBootstrap: Q = Q(
    "q264_poisson_bootstrap",
    (s, dir) => {
      val p = 1000003L
      val reps = 20
      val micros = (round(col("value"), 6).cast(DecimalType(28, 6)) * 1000000)
        .cast("long")
      val rows = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), micros.as("v"))
        .select(col("event_id"), col("v"),
          explode(sequence(lit(0L), lit(reps - 1L))).as("r"))
        .withColumn("u",
          pmod(pmod(col("event_id") * (col("r") + 13), lit(p))
            * lit(2654435761L), lit(p)) % 10000)
        // Poisson(1) inverse CDF at 1e-4 resolution: P(0)=.3679 P(1)=.3679
        // P(2)=.1839 P(3)=.0613 else 4
        .withColumn("wt",
          when(col("u") < 3679, 0L).when(col("u") < 7358, 1L)
            .when(col("u") < 9197, 2L).when(col("u") < 9810, 3L).otherwise(4L))
      val perRep = rows.groupBy(col("r"))
        .agg(sum(col("wt")).as("nw"),
          sum((col("wt") * col("v")).cast(DecimalType(38, 0))).as("sw"))
        .select(col("r"),
          (col("sw").cast("double") / col("nw").cast("double") / 1e6).as("m"))
      perRep
        .select(round(col("m"), 9).cast(DecimalType(28, 9)).as("md"),
          round(col("m") * col("m"), 9).cast(DecimalType(28, 9)).as("md2"))
        .agg(count(lit(1)).as("n_reps"),
          (sum(col("md")).cast("double") / count(lit(1))).as("boot_mean"),
          sqrt((sum(col("md2")).cast("double")
            - sum(col("md")).cast("double") * sum(col("md")).cast("double")
              / count(lit(1)))
            / (count(lit(1)) - 1)).as("boot_se"))
        .select(col("n_reps"), round(col("boot_mean"), 6).as("boot_mean"),
          round(col("boot_se"), 6).as("boot_se"))
    },
    Some("""
      WITH base AS (
        SELECT event_id,
          CAST(CAST(round(value, 6) AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'),
      drawn AS (
        SELECT event_id, v, unnest(generate_series(0, 19)) AS r
        FROM base),
      weighted AS (
        SELECT r, v,
          CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
            WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3 ELSE 4 END AS wt
        FROM (SELECT r, v,
          ((event_id * (r + 13)) % 1000003 * 2654435761) % 1000003 % 10000 AS u
          FROM drawn)),
      perrep AS (
        SELECT r,
          CAST(SUM(CAST(wt * v AS HUGEINT)) AS DOUBLE)
            / CAST(SUM(wt) AS DOUBLE) / 1e6 AS m
        FROM weighted GROUP BY r),
      folded AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
          CAST(SUM(CAST(round(m, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sm,
          CAST(SUM(CAST(round(m * m, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sm2
        FROM perrep)
      SELECT n_reps,
        round(sm / n_reps, 6) AS boot_mean,
        round(sqrt((sm2 - sm * sm / n_reps) / (n_reps - 1)), 6) AS boot_se
      FROM folded
    """))

  /** SPLIT-CONFORMAL PREDICTION INTERVALS — distribution-free intervals
    * with a finite-sample coverage guarantee (Vovk et al.; the split form
    * of Lei et al. 2018): calibrate the ⌈(n+1)·0.9⌉-th absolute residual
    * on one hash-half, measure coverage on the other. The predictor is
    * deliberately simple (per-priority calibration mean) — conformal
    * wraps ANY point predictor; what the operator contributes is the
    * quantile machinery. The residual quantile uses the q169 COUNTING
    * percentile at WHOLE-DOLLAR bins: conformal residuals are
    * high-cardinality (cent bins would make the support row-sized — the
    * q157 trap), and the interval's resolution only needs to match the
    * domain, so the bin width is the dial that keeps state bounded by
    * VALUE RANGE at any row count. The (n+1) in the rank is the exact
    * finite-sample conformal correction, integer arithmetic on both
    * engines; the split is the q64 portable hash. */
  val q265Conformal: Q = Q(
    "q265_conformal",
    (s, dir) => {
      val p = 1000003L
      val half = pmod(pmod(pmod(col("o_orderkey"), lit(p)) * lit(2654435761L),
        lit(p)), lit(2L))
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("seg"), col("o_totalprice").as("y"),
          half.as("half"))
        .barrier() // calibration AND test halves
      val pred = o.filter(col("half") === 0).groupBy(col("seg"))
        .agg((sum(col("y").cast(DecimalType(28, 2))).cast("double")
          / count(lit(1))).as("mean_pred"), count(lit(1)).as("n_cal"))
      val resid = o.filter(col("half") === 0)
        .join(broadcast(pred), Seq("seg"))
        .select(col("seg"), round(abs(col("y") - col("mean_pred"))).cast("long")
          .as("rbin"))
      val w = Window.partitionBy(col("seg")).orderBy(col("rbin"))
      val qhat = resid.groupBy(col("seg"), col("rbin")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(w))
        .join(broadcast(pred.select(col("seg"), col("n_cal"))), Seq("seg"))
        .groupBy(col("seg"))
        .agg(min(when(col("cum") * 10 >= (col("n_cal") + 1) * 9, col("rbin")))
          .as("qhat"))
      o.filter(col("half") === 1)
        .join(broadcast(pred), Seq("seg"))
        .join(broadcast(qhat), Seq("seg"))
        .groupBy(col("seg"))
        .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
          round(max(col("mean_pred")), 6).as("mean_pred"),
          max(col("qhat")).as("qhat"),
          (countIf(abs(col("y") - col("mean_pred")) <= col("qhat").cast("double"))
            .cast("double") / count(lit(1))).as("coverage"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderpriority AS seg, o_totalprice AS y,
          ((o_orderkey % 1000003) * 2654435761) % 1000003 % 2 AS half
        FROM orders),
      pred AS (
        SELECT seg,
          CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS mean_pred,
          CAST(COUNT(*) AS BIGINT) AS n_cal
        FROM o WHERE half = 0 GROUP BY seg),
      resid AS (
        SELECT o.seg, CAST(round(abs(y - mean_pred)) AS BIGINT) AS rbin
        FROM o JOIN pred USING (seg) WHERE half = 0),
      cum AS (
        SELECT seg, rbin,
          CAST(SUM(c) OVER (PARTITION BY seg ORDER BY rbin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM (SELECT seg, rbin, CAST(COUNT(*) AS BIGINT) AS c
              FROM resid GROUP BY 1, 2)),
      qhat AS (
        SELECT cum.seg,
          MIN(CASE WHEN cum * 10 >= (n_cal + 1) * 9 THEN rbin END) AS qhat
        FROM cum JOIN pred ON cum.seg = pred.seg
        GROUP BY cum.seg)
      SELECT o.seg, MAX(n_cal) AS n_cal, CAST(COUNT(*) AS BIGINT) AS n_test,
        round(MAX(mean_pred), 6) AS mean_pred,
        MAX(qhat) AS qhat,
        CAST(SUM(CASE WHEN abs(y - mean_pred) <= CAST(qhat AS DOUBLE)
          THEN 1 ELSE 0 END) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS coverage
      FROM o JOIN pred USING (seg) JOIN qhat USING (seg)
      WHERE half = 1
      GROUP BY o.seg
    """))

  val all: Seq[Q] = Seq(
    q249BhFdr, q250TargetEncoding, q251Changepoint, q252LogRank,
    q253IsotonicCalibration, q255ShapleyAttribution, q256HoltForecast,
    q257MannKendall, q258WinsorizedMean, q259StratifiedAte,
    q263Impute, q264PoissonBootstrap, q265Conformal)
}
