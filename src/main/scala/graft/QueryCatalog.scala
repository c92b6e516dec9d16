package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The operator catalog: every SURVEY.md §2 row (plus the north-star
  * training-data operators) exposed as a named query over the driver's
  * testdata, with a DuckDB-oracle SQL twin where SQL-expressible.
  *
  * Determinism rules for oracle-compared queries (SURVEY §7 "hard parts"):
  *  - Money sums go through `DECIMAL` so Spark's parallel partial-aggregation
  *    order can't produce float drift vs DuckDB's serial sum ([[dsum]]).
  *  - Ratios/averages are `exact-sum / exact-count` double division,
  *    UNROUNDED: both engines divide identical inputs ⇒ identical doubles.
  *    (Rounding a quotient can land on a .xx5 tie where engines disagree;
  *    round() is only safe at/below the true decimal scale of the value.)
  *  - Every `limit` is preceded by a total order with a unique tiebreaker.
  *  - No `current_timestamp`/`current_date`/rand in compared queries.
  */
object QueryCatalog {
  import QueryDsl._

  // ===========================================================================
  // Core relational queries (SURVEY §2.2, §2.4, §2.6)
  // ===========================================================================

  /** TPC-H Q1-shaped pricing summary: scan + filter pushdown + hash agg
    * (A1-A4, A6, P5). Partial agg happens map-side; only |groups| rows
    * shuffle — scales to any input size. */
  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        %s AS sum_base_price,
        %s AS sum_disc_price,
        %s AS sum_charge,
        COUNT(*) AS count_order,
        COUNT(DISTINCT l_orderkey) AS n_orders,
        CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """.stripMargin.format(
      oracleDsum("l_extendedprice", 2),
      oracleDsum("l_extendedprice * (1 - l_discount)", 4),
      oracleDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6))),
    headline = true)

  /** Multi-predicate filter + narrow projection (P3-P9). The point at scale:
    * every predicate and the 5-column read schema reach the parquet scan
    * (PushedFilters + column pruning) — verified in PlanSpec. */
  val q2FilterProject: Q = Q(
    "q2_filter_project",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 45 &&
          col("l_discount") >= 0.05 &&
          col("l_returnflag") =!= "A" &&
          col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      FROM lineitem
      WHERE l_quantity >= 45 AND l_discount >= 0.05
        AND l_returnflag <> 'A' AND l_shipdate IS NOT NULL
    """))

  /** Flagship: 5-table star join + multi-agg (J4, A1-A7, O2).
    * Join strategy at scale: lineitem⋈orders and orders⋈customer shuffle on
    * their keys (fact-fact; AQE picks SMJ/skew handling), nation+region are
    * broadcast (constant-size dims) so the big sides never reshuffle for
    * them. */
  val q3StarJoin: Q = Q(
    "q3_star_revenue",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
          countDistinct(col("c_custkey")).as("n_customers"),
          countIf(col("o_orderstatus") === "F").as("n_finished"))
        .withColumn("finished_ratio", col("n_finished") / col("n_lines"))
    },
    Some("""
      SELECT r_name, n_name,
        COUNT(*) AS n_lines,
        %s AS revenue,
        COUNT(DISTINCT c_custkey) AS n_customers,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) AS finished_ratio
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    """.format(oracleDsum("l_extendedprice * (1 - l_discount)", 4))),
    headline = true)

  /** Top-k with unique tiebreak (O1) — plans as TakeOrderedAndProject:
    * per-partition partial top-k, only k rows per partition reach the driver
    * merge, never a global sort. */
  val q4TopK: Q = Q(
    "q4_topk_orders",
    (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """))

  /** Window functions (W1-W2): row_number / rank / lag per customer.
    * One shuffle on the partition key, sort within partitions; no global
    * sort. Casts to BIGINT so Spark's int ranks hash-match DuckDB's. */
  val q5WindowRank: Q = Q(
    "q5_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "prev_price")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, prev_price FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
          CAST(RANK() OVER w AS BIGINT) AS rnk,
          LAG(o_totalprice, 1) OVER w AS prev_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ) WHERE rn <= 3
    """))

  /** Exact countDistinct + conditional counts + post-agg ratio (A6, A7, A9).
    * Catalyst rewrites the mixed distinct/plain aggs via Expand + two-phase
    * HashAggregate automatically. */
  val q6DistinctAgg: Q = Q(
    "q6_priority_distinct",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          countIf(col("o_orderstatus") === "F").as("n_finished"),
          dsum(col("o_totalprice"), 2).as("total_revenue"))
        .withColumn("finished_ratio", col("n_finished") / col("n_orders"))
        .withColumn("avg_order_value", col("total_revenue") / col("n_orders")),
    Some("""
      SELECT o_orderpriority,
        COUNT(*) AS n_orders,
        COUNT(DISTINCT o_custkey) AS n_customers,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        %s AS total_revenue,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) AS finished_ratio,
        %s / COUNT(*) AS avg_order_value
      FROM orders GROUP BY o_orderpriority
    """.format(oracleDsum("o_totalprice", 2), oracleDsum("o_totalprice", 2))))

  // ===========================================================================
  // Registry
  // ===========================================================================

  val all: Seq[Q] = Seq(
    q1PricingSummary, q2FilterProject, q3StarJoin, q4TopK, q5WindowRank, q6DistinctAgg) ++
    _root_.graft.queries.Scalar.all ++
    _root_.graft.queries.SetOps.all ++
    _root_.graft.queries.SilverQueries.all ++
    _root_.graft.queries.GoldQueries.all ++
    _root_.graft.queries.TextQueries.all ++
    _root_.graft.queries.EmbedQueries.all ++
    _root_.graft.queries.MiscQueries.all ++
    _root_.graft.queries.Analytics.all ++
    _root_.graft.queries.MedallionQuery.all ++
    _root_.graft.queries.CorpusQueries.all ++
    _root_.graft.queries.ScaleQueries.all ++
    _root_.graft.queries.ProfileQueries.all ++
    _root_.graft.queries.GraphQueries.all ++
    _root_.graft.queries.DimQueries.all ++
    _root_.graft.queries.StatQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
