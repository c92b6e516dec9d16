package graft.queries

import graft.{Q, QueryDsl}
import QueryDsl._
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.plans.RuntimeFilter

/** Round-5 surface: explicit runtime-filter join pruning, GROUPING SETS
  * (the general form of the q42/q61 rollup/cube family), deletion-
  * neighborhood fuzzy matching, time-series gap-fill, and funnel analysis.
  * All oracle-checked; each Scaladoc states the 100 TB shape.
  */
object ScaleQueries {

  /** Bloom-filter runtime pruning composed with the real join — the
    * result is EXACT (false positives are removed by the join), so the
    * oracle is the plain join. At scale the bloom probe drops ~96 % of
    * lineitem rows at the SCAN (one ~MB filter broadcast via scalar
    * subquery), so the join shuffle carries only matching rows; here it is
    * correctness-checked at test SF. */
  val q80BloomPruneJoin: Q = Q(
    "q80_bloom_prune_join",
    (s, dir) => {
      // key-modulo filter: selective at every SF (a nationkey literal is
      // empty at sf0.001, which would make the correctness check vacuous)
      val supp = t(s, dir, "supplier").filter(col("s_suppkey") % 7 === 0)
      val pruned = RuntimeFilter.bloomPrune(
        t(s, dir, "lineitem"), col("l_suppkey"),
        supp.select(col("s_suppkey")), col("s_suppkey"),
        expectedItems = 100000L)
      pruned
        .join(broadcast(supp.select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice"), 2).as("revenue"))
    },
    Some("""
      SELECT s_suppkey, s_name, COUNT(*) AS n_lines, %s AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_suppkey %% 7 = 0
      GROUP BY s_suppkey, s_name
    """.format(oracleDsum("l_extendedprice", 2))))

  /** GROUPING SETS — the general form the q42 ROLLUP / q61 CUBE shorthands
    * expand to, with grouping() disambiguating real NULLs from subtotal
    * rows. One shuffle per distinct grouping-set prefix under Spark's
    * expand-based plan; scales like the underlying aggregate. */
  val q81GroupingSets: Q = Q(
    "q81_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_gs_orders")
      s.sql("""
        SELECT o_orderpriority, o_orderstatus,
          CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
          CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        FROM graft_gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
      """)
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus,
        CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
        CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
        COUNT(*) AS n_orders, %s AS revenue
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                              (o_orderpriority), (o_orderstatus), ())
    """.format(oracleDsum("o_totalprice", 2))))

  /** Exact Levenshtein-1 fuzzy pairs via deletion-neighborhood blocking
    * ([[Dedup.editDistancePairs]]) — typo-class entity matching. The
    * oracle brute-forces all pairs (viable at oracle SF only); the Spark
    * side never goes quadratic: variants → hash-bucket join → verify. */
  val q82FuzzyPairs: Q = Q(
    "q82_fuzzy_pairs",
    (s, dir) =>
      Dedup.editDistancePairs(t(s, dir, "customer"), "c_custkey", "c_name"),
    Some("""
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
        AND abs(length(a.c_name) - length(b.c_name)) <= 1
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    """))

  /** Time-series gap-fill: daily per-type event counts with EXPLICIT zero
    * rows for missing (type, day) cells — the densification step before
    * any rolling-window feature at training time. The calendar spine is a
    * 1-row min/max aggregate exploded through sequence(); no driver
    * action, no hand-written date range. Spine × types is calendar-sized
    * (tiny), so the only data-sized stage is the daily aggregate. */
  val q83GapFill: Q = Q(
    "q83_gapfill",
    (s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_type"), to_date(col("ts")).as("event_date"), col("value"))
      val daily = e.groupBy(col("event_type"), col("event_date"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 2).as("total_value"))
      val spine = e.agg(min(col("event_date")).as("d0"), max(col("event_date")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("event_date"))
      spine.crossJoin(e.select(col("event_type")).distinct())
        .join(daily, Seq("event_type", "event_date"), "left")
        .select(col("event_type"), col("event_date"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("total_value"), lit(0.0)).as("total_value"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date, value FROM events),
      spine AS (
        SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                 CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS event_date
        FROM (SELECT MIN(event_date) AS d0, MAX(event_date) AS d1 FROM e)),
      types AS (SELECT DISTINCT event_type FROM e),
      daily AS (
        SELECT event_type, event_date, COUNT(*) AS n_events,
          %s AS total_value
        FROM e GROUP BY event_type, event_date)
      SELECT t.event_type, s.event_date,
        COALESCE(d.n_events, 0) AS n_events,
        COALESCE(d.total_value, 0.0) AS total_value
      FROM spine s CROSS JOIN types t
      LEFT JOIN daily d ON d.event_type = t.event_type
                       AND d.event_date = s.event_date
    """.format(oracleDsum("value", 2))))

  /** Ordered funnel (view → click → purchase): per-user first-touch times
    * in ONE aggregate pass (conditional mins), then ordering checks and a
    * global rollup — two shuffles total, both keyed, no self-joins per
    * stage. Uses first-touch ordering semantics (stage N counts if its
    * first event is at/after stage N-1's first event). */
  val q84Funnel: Q = Q(
    "q84_funnel",
    (s, dir) => {
      val perUser = t(s, dir, "events").groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("tv"),
        min(when(col("event_type") === "click", col("ts"))).as("tc"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
      perUser.agg(
        countIf(col("tv").isNotNull).as("n_viewers"),
        countIf(col("tv").isNotNull && col("tc").isNotNull
          && col("tc") >= col("tv")).as("n_clickers"),
        countIf(col("tv").isNotNull && col("tc").isNotNull
          && col("tc") >= col("tv") && col("tp").isNotNull
          && col("tp") >= col("tc")).as("n_buyers"))
    },
    Some("""
      WITH per_user AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS tv,
          MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS tc,
          MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS tp
        FROM events GROUP BY user_id)
      SELECT
        %s AS n_viewers,
        %s AS n_clickers,
        %s AS n_buyers
      FROM per_user
    """.format(
      oracleCountIf("tv IS NOT NULL"),
      oracleCountIf("tv IS NOT NULL AND tc IS NOT NULL AND tc >= tv"),
      oracleCountIf("tv IS NOT NULL AND tc IS NOT NULL AND tc >= tv " +
        "AND tp IS NOT NULL AND tp >= tc"))))

  /** Corpus PII scrubbing ([[graft.ext.TextStats.scrubPii]]): emails /
    * SSNs / phone numbers → typed placeholders. The testdata has no PII,
    * so the input text is SYNTHESIZED deterministically from customer keys
    * (same printf on both engines) — which also guarantees every row
    * actually exercises all three patterns rather than passing vacuously. */
  val q85ScrubPii: Q = Q(
    "q85_scrub_pii",
    (s, dir) => {
      val k = col("c_custkey")
      val text = concat(
        lit("Contact "), col("c_name"),
        // DIV: Column./ is double division; the oracle's // is integer
        lit(" at "), format_string("%03d-%03d-%04d",
          k % 1000, expr("c_custkey DIV 7") % 1000, k % 10000),
        lit(" ssn "), format_string("%03d-%02d-%04d", k % 1000, k % 100, k % 10000),
        lit(" mail "), lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com"))
      t(s, dir, "customer").select(
        col("c_custkey"),
        graft.ext.TextStats.scrubPii(text).as("scrubbed"))
    },
    Some("""
      SELECT c_custkey,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              'Contact ' || c_name
                || ' at ' || printf('%03d-%03d-%04d', c_custkey % 1000,
                     (c_custkey // 7) % 1000, c_custkey % 10000)
                || ' ssn ' || printf('%03d-%02d-%04d', c_custkey % 1000,
                     c_custkey % 100, c_custkey % 10000)
                || ' mail ' || lower(regexp_replace(c_name, '#', '.', 'g'))
                || '@example.com',
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
      FROM customer
    """))

  /** Salted two-phase aggregation ([[graft.plans.Salt.saltedCountSum]])
    * oracle-checked against the plain GROUP BY: the skew fix is a pure
    * plan-shape change, so the result must be identical. The salt is a
    * deterministic row hash (no rand() — replays stable), values accumulate
    * in decimal so the two-phase merge is exact. At scale this is the
    * explicit fix when one grouping key holds a double-digit share of rows
    * and AQE's skew split can't help an agg. */
  val q98SaltedAgg: Q = Q(
    "q98_salted_agg",
    (s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        round(col("value"), 6).cast(org.apache.spark.sql.types.DecimalType(28, 8)).as("v"))
      graft.plans.Salt.saltedCountSum(e, "event_type", "v", factor = 32)
        .select(col("event_type"), col("n"), col("total").cast("double").as("total"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(round(value, 6) AS DECIMAL(28,8))) AS DOUBLE) AS total
      FROM events GROUP BY event_type
    """))

  /** ENTITY RESOLUTION / golden records: typo-class customer variants
    * (Levenshtein ≤ 1 names, [[Dedup.editDistancePairs]] deletion-
    * neighborhood blocking) clustered with connected components; each
    * entity keeps its lowest-key record as canonical plus merged stats —
    * the match → cluster → survivorship MDM pipeline. The name match alone
    * over-merges on these serial synthetic names (lev-1 edges chain
    * transitively into one giant entity — the classic transitive-closure
    * pathology), so the match rule requires ATTRIBUTE AGREEMENT too
    * (nation + segment), exactly how production MDM sparsifies the graph.
    * Deterministic end to end (exact verify, CC fixpoint, min/decimal
    * aggregates) ⇒ the oracle brute-forces the pairs and re-derives the
    * fixpoint. Scale shape: the variant join is never all-pairs; the
    * attribute check is a pair-sized keyed join; CC input is pair-sized;
    * the survivorship aggregate is one keyed shuffle. */
  val q112EntityResolution: Q = Q(
    "q112_entity_resolution",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val attrs = c.select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      val pairs = Dedup.editDistancePairs(c, "c_custkey", "c_name")
        .join(attrs.select(col("c_custkey").as("id_a"),
          col("c_nationkey").as("nk_a"), col("c_mktsegment").as("seg_a")), Seq("id_a"))
        .join(attrs.select(col("c_custkey").as("id_b"),
          col("c_nationkey").as("nk_b"), col("c_mktsegment").as("seg_b")), Seq("id_b"))
        .filter(col("nk_a") === col("nk_b") && col("seg_a") === col("seg_b"))
      val comp = graft.ext.Components.connectedComponents(
        c.select(col("c_custkey").as("id")),
        pairs.select(col("id_a").as("a"), col("id_b").as("b")))
      c.join(comp, c("c_custkey") === comp("id"))
        .groupBy(col("comp").as("entity_id"))
        .agg(count(lit(1)).as("n_records"),
          min(col("c_custkey")).as("canonical_key"),
          dsum(col("c_acctbal"), 2).as("total_acctbal"),
          countDistinct(col("c_nationkey")).as("n_nations"))
        .filter(col("n_records") >= 2)
    },
    Some("""
      WITH RECURSIVE pairs AS (
        SELECT a.c_custkey AS ia, b.c_custkey AS ib
        FROM customer a JOIN customer b
          ON a.c_custkey < b.c_custkey
          AND abs(length(a.c_name) - length(b.c_name)) <= 1
          AND a.c_nationkey = b.c_nationkey
          AND a.c_mktsegment = b.c_mktsegment
        WHERE levenshtein(a.c_name, b.c_name) <= 1),
      edges AS (
        SELECT ia AS a, ib AS b FROM pairs
        UNION ALL SELECT ib, ia FROM pairs),
      reach(node, lab) AS (
        SELECT c_custkey, c_custkey FROM customer
        UNION
        SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
      comp AS (
        SELECT node AS c_custkey, MIN(lab) AS entity_id
        FROM reach GROUP BY node)
      SELECT entity_id, COUNT(*) AS n_records,
        MIN(c.c_custkey) AS canonical_key,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_acctbal,
        COUNT(DISTINCT c_nationkey) AS n_nations
      FROM customer c JOIN comp USING (c_custkey)
      GROUP BY entity_id
      HAVING COUNT(*) >= 2
    """))

  val all: Seq[Q] = Seq(
    q80BloomPruneJoin, q81GroupingSets, q82FuzzyPairs, q83GapFill, q84Funnel,
    q85ScrubPii, q98SaltedAgg, q112EntityResolution)
}
