package graft.queries

import graft.{Q, QueryDsl}
import QueryDsl._
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.7): string / date-time / math /
  * conditional / collection-literal expressions, each oracle-checked.
  *
  * All of these are pure projections — codegen'd, no shuffle, scan-dominated
  * at any scale. The interesting part is oracle parity, noted per query.
  */
object Scalar {

  /** String functions (concat, lpad, lower, trim, length, sha2, substring
    * from-end). DuckDB twins: right() for negative-start substring, sha256().
    * Ref behavior: 01_Bronze:93-97 (id synthesis), 02_Silver:67-73 (mask). */
  val q7Strings: Q = Q(
    "q7_string_funcs",
    (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        concat(lit("CUST-"), lpad(col("c_custkey").cast("string"), 10, "0")).as("cust_id"),
        lower(trim(col("c_name"))).as("name_norm"),
        length(col("c_name")).cast("long").as("name_len"),
        sha2(lower(trim(col("c_name"))), 256).as("name_token"),
        substring(col("c_name"), -4, 4).as("name_last4"),
        upper(col("c_mktsegment")).as("segment_uc")),
    Some("""
      SELECT c_custkey,
        'CUST-' || lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS cust_id,
        lower(trim(c_name)) AS name_norm,
        CAST(length(c_name) AS BIGINT) AS name_len,
        sha256(lower(trim(c_name))) AS name_token,
        right(c_name, 4) AS name_last4,
        upper(c_mktsegment) AS segment_uc
      FROM customer
    """))

  /** Date/time functions (to_date, year/month/day, date_format, quarter).
    * DuckDB year() et al. return BIGINT ⇒ Spark side casts to long;
    * date_format ↔ strftime. Ref: 01:94 (yyyyMMdd ids), 02:148-149. */
  val q8DateTime: Q = Q(
    "q8_datetime_funcs",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
        quarter(col("o_orderdate")).cast("long").as("order_quarter"),
        date_format(col("o_orderdate"), "yyyyMMdd").as("order_yyyymmdd"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date")),
    Some("""
      SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS order_date,
        year(o_orderdate) AS order_year,
        month(o_orderdate) AS order_month,
        day(o_orderdate) AS order_day,
        quarter(o_orderdate) AS order_quarter,
        strftime(o_orderdate, '%Y%m%d') AS order_yyyymmdd,
        CAST(o_orderdate AS DATE) + 30 AS due_date
      FROM orders
    """))

  /** Math functions (round, abs, sqrt, pow, modulo, cast, column arithmetic).
    * sin/cos are rounded to 4 decimals — JVM Math.sin and libm agree to well
    * under 1e-12 at these magnitudes, so the rounding is stable.
    * Ref: 01:109-110 (abs/sin amount synthesis), §2.7 math table. */
  val q9Math: Q = Q(
    "q9_math_funcs",
    (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_orderkey") % 7).as("key_mod7"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        round(sin(col("l_quantity")), 4).as("qty_sin"),
        col("l_quantity").cast("int").as("qty_int"),
        // rounded at the true decimal scale (2-dec × 2-dec ⇒ exactly 4
        // decimals) — never lands on a rounding tie, unlike round(..., 2)
        round(col("l_extendedprice") * (lit(1.0) + col("l_tax")), 4).as("price_taxed")),
    Some("""
      SELECT l_orderkey, l_linenumber,
        l_orderkey % 7 AS key_mod7,
        abs(l_discount - 0.05) AS disc_dev,
        round(sqrt(l_extendedprice), 4) AS price_sqrt,
        round(pow(l_discount, 2), 6) AS disc_sq,
        round(sin(l_quantity), 4) AS qty_sin,
        CAST(l_quantity AS INT) AS qty_int,
        round(l_extendedprice * (1 + l_tax), 4) AS price_taxed
      FROM lineitem
    """))

  /** when/when/otherwise bucketing + boolean flags + groupBy on the derived
    * column (ref 02:150-164 amount buckets / risk flags), via
    * [[graft.silver.Enrich.buckets]]. */
  val q10CaseBucket: Q = Q(
    "q10_case_bucket",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.withColumn("price_bucket",
          graft.silver.Enrich.buckets(col("o_totalprice"),
            Seq(50000.0 -> "small", 150000.0 -> "medium", 250000.0 -> "large"), "jumbo"))
        .withColumn("is_urgent",
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("price_bucket"), col("is_urgent"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 2).as("revenue"))
    },
    Some("""
      SELECT
        CASE WHEN o_totalprice < 50000 THEN 'small'
             WHEN o_totalprice < 150000 THEN 'medium'
             WHEN o_totalprice < 250000 THEN 'large'
             ELSE 'jumbo' END AS price_bucket,
        o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent,
        COUNT(*) AS n_orders,
        %s AS revenue
      FROM orders GROUP BY 1, 2
    """.format(oracleDsum("o_totalprice", 2))))

  /** Literal-map lookup (ref 02:145-147 `create_map(...)[col]`) side by side
    * with its scale-out twin, a broadcast dim join (J3). The map lookup is
    * constant-folded into the projection; the nation join ships ~25 rows to
    * every executor — the customer side never shuffles. */
  val q11DimLookup: Q = Q(
    "q11_dim_lookup",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation").select("n_nationkey", "n_name")
      graft.silver.Enrich
        .dimLookup(c.withColumn("n_nationkey", col("c_nationkey")), n, Seq("n_nationkey"))
        .select(
          col("c_custkey"),
          graft.silver.Enrich.lookup(col("c_mktsegment"),
            Seq("AUTOMOBILE" -> "AUTO", "BUILDING" -> "BLDG", "FURNITURE" -> "FURN"),
            "OTHER").as("seg_code"),
          col("n_name"))
    },
    Some("""
      SELECT c_custkey,
        CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'AUTO'
                          WHEN 'BUILDING' THEN 'BLDG'
                          WHEN 'FURNITURE' THEN 'FURN'
                          ELSE 'OTHER' END AS seg_code,
        n_name
      FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """))

  /** Array-function suite (§2.7 collection surface): sort / distinct /
    * slice / contains / position / intersect / except / union / remove over
    * the token arrays — every op is a codegen'd projection (no UDFs, no
    * shuffle), so the query scales exactly like a column scan. Set-valued
    * results are surfaced as counts or deterministic extracts so the oracle
    * compare is order-insensitive where engines differ on output order. */
  val q93ArrayFuncs: Q = Q(
    "q93_array_funcs",
    (s, dir) => {
      val kw = array(lit("table"), lit("scan"), lit("join"), lit("vector"))
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
          element_at(array_sort(col("toks")), 1).as("first_tok"),
          element_at(array_sort(col("toks")), -1).as("last_tok"),
          concat_ws(" ", slice(col("toks"), 1, 3)).as("head3"),
          array_contains(col("toks"), "vector").as("has_vector"),
          size(array_intersect(array_distinct(col("toks")), kw)).cast("long").as("n_kw"),
          size(array_except(array_distinct(col("toks")), kw)).cast("long").as("n_non_kw"),
          size(array_union(col("toks"), kw)).cast("long").as("n_union"),
          size(array_remove(col("toks"), "a")).cast("long").as("n_no_a"),
          array_position(col("toks"), "table").cast("long").as("pos_table"))
    },
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_toks,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        list_sort(toks)[1] AS first_tok,
        list_sort(toks)[-1] AS last_tok,
        array_to_string(list_slice(toks, 1, 3), ' ') AS head3,
        list_contains(toks, 'vector') AS has_vector,
        CAST(len(list_intersect(list_distinct(toks),
          ['table','scan','join','vector'])) AS BIGINT) AS n_kw,
        CAST(len(list_filter(list_distinct(toks),
          x -> NOT list_contains(['table','scan','join','vector'], x)))
          AS BIGINT) AS n_non_kw,
        CAST(len(list_distinct(list_concat(toks,
          ['table','scan','join','vector']))) AS BIGINT) AS n_union,
        CAST(len(list_filter(toks, x -> x <> 'a')) AS BIGINT) AS n_no_a,
        CAST(coalesce(list_position(toks, 'table'), 0) AS BIGINT) AS pos_table
      FROM d
    """))

  /** Calendar arithmetic beyond q8's field extraction: month addition,
    * month-end/month-start snapping, weekday, day spans — the SCD/billing-
    * period toolkit. All codegen'd projections. Spark's dayofweek is
    * 1=Sunday; DuckDB's 0=Sunday — aligned by +1 on the oracle side. */
  val q106DateArith: Q = Q(
    "q106_date_arith",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 2).as("plus2m"),
        last_day(col("o_orderdate")).as("month_end"),
        trunc(col("o_orderdate"), "MM").as("month_start"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_eoy")),
    Some("""
      SELECT o_orderkey,
        CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
          AS BIGINT) AS days_to_eoy
      FROM orders
    """))

  /** Null-handling scalar suite: NULLIF / NVL / NVL2 / greatest / least —
    * the defensive-SQL surface every migrated workload leans on. */
  val q107NullFuncs: Q = Q(
    "q107_null_funcs",
    (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
        nvl(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_filled"),
        nvl2(nullif(col("l_returnflag"), lit("N")), lit(1L), lit(0L)).as("flag_present"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_quantity"), col("l_tax") * 100).as("l")),
    Some("""
      SELECT l_orderkey, l_linenumber,
        NULLIF(l_returnflag, 'N') AS flag_or_null,
        COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_filled,
        CAST(CASE WHEN NULLIF(l_returnflag, 'N') IS NOT NULL
             THEN 1 ELSE 0 END AS BIGINT) AS flag_present,
        GREATEST(l_quantity, l_discount * 100) AS g,
        LEAST(l_quantity, l_tax * 100) AS l
      FROM lineitem
    """))

  /** Nested-data machinery (§2.7 struct surface): named-struct literals,
    * field access, struct comparison, and an array-of-structs exploded
    * back to rows — the shape every semi-structured silver layer uses.
    * Generator expansion in place (×2, no shuffle); field access after
    * from-struct is a plain projection. */
  val q113StructFuncs: Q = Q(
    "q113_struct_funcs",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          struct(col("o_orderstatus").as("st"), col("o_totalprice").as("tp")).as("info"),
          array(
            struct(lit("status").as("k"), col("o_orderstatus").as("v")),
            struct(lit("priority").as("k"), col("o_orderpriority").as("v"))).as("kv"))
        .select(col("o_orderkey"),
          col("info.st").as("status"),
          (col("info.tp") > 100000.0).as("big_order"),
          explode(col("kv")).as("e"))
        .select(col("o_orderkey"), col("status"), col("big_order"),
          col("e.k").as("k"), col("e.v").as("v")),
    Some("""
      WITH kv AS (
        SELECT o_orderkey, 'status' AS k, o_orderstatus AS v FROM orders
        UNION ALL
        SELECT o_orderkey, 'priority', o_orderpriority FROM orders)
      SELECT kv.o_orderkey, o.o_orderstatus AS status,
        (o.o_totalprice > 100000.0) AS big_order, k, v
      FROM kv JOIN orders o ON kv.o_orderkey = o.o_orderkey
    """))

  val all: Seq[Q] = Seq(q7Strings, q8DateTime, q9Math, q10CaseBucket, q11DimLookup,
    q93ArrayFuncs, q106DateArith, q107NullFuncs, q113StructFuncs)
}
