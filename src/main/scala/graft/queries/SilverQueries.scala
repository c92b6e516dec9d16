package graft.queries

import graft.{Q, QueryDsl}
import QueryDsl._
import graft.silver.{Masking, Merge, Quality}
import org.apache.spark.sql.functions._

/** The reference's Silver stage as oracle-checked queries: MERGE upsert,
  * DQ/quarantine, PII masking (SURVEY §2.3 J1, §2.2 P4-P7, §2.9).
  */
object SilverQueries {

  /** Idempotent source-wins MERGE emulation (J1, ref 02:174-184).
    * target = even orderkeys, source = multiples of 3 re-statused 'U';
    * merged result must equal the declarative UNION the oracle computes.
    * The upsert broadcasts the (small) source keys so the target side
    * never shuffles — the Delta-MERGE plan shape at scale. */
  val q17MergeUpsert: Q = Q(
    "q17_merge_upsert",
    (s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      val target = o.filter(col("o_orderkey") % 2 === 0)
      val source = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderstatus", lit("U"))
      Merge.upsert(target, source, Seq("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0 AND NOT o_orderkey % 3 = 0
    """))

  /** DQ quarantine with first-failing-rule reason (ref 02:109-128), reported
    * as reason histogram. Shuffle-free split: predicates re-evaluated, not
    * subtracted. */
  val q18DqQuarantine: Q = Q(
    "q18_dq_quarantine",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val rules = Seq(
        Quality.Rule("null_key", col("o_orderkey").isNotNull),
        Quality.Rule("low_amount", col("o_totalprice") > 5000),
        Quality.Rule("bad_status", col("o_orderstatus").isin("O", "F")))
      val (_, quarantined) = Quality.split(o, rules)
      quarantined.groupBy(col("quarantine_reason"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 2).as("amount_held"))
    },
    Some("""
      SELECT quarantine_reason, COUNT(*) AS n_rows, %s AS amount_held
      FROM (
        SELECT o_totalprice,
          CASE WHEN o_orderkey IS NULL THEN 'null_key'
               WHEN NOT (o_totalprice > 5000) THEN 'low_amount'
               WHEN o_orderstatus NOT IN ('O', 'F') THEN 'bad_status'
               END AS quarantine_reason
        FROM orders
      ) WHERE quarantine_reason IS NOT NULL
      GROUP BY quarantine_reason
    """.format(oracleDsum("o_totalprice", 2))))

  /** DQ split invariant surfaced as data (valid + quarantined == total). */
  val q19DqSummary: Q = Q(
    "q19_dq_summary",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val rules = Seq(
        Quality.Rule("low_amount", col("o_totalprice") > 5000),
        Quality.Rule("bad_status", col("o_orderstatus").isin("O", "F")))
      o.withColumn("is_valid", Quality.allPass(rules))
        .groupBy(col("is_valid"))
        .agg(count(lit(1)).as("n_rows"))
    },
    Some("""
      SELECT (o_totalprice > 5000 AND o_orderstatus IN ('O','F')) AS is_valid,
             COUNT(*) AS n_rows
      FROM orders GROUP BY 1
    """))

  /** PII masking projection (ref 02:67-73, 133-137): tokenized join key +
    * masked display form; raw PII column dropped. Pure codegen projection. */
  val q20MaskPii: Q = Q(
    "q20_mask_pii",
    (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        Masking.tokenize(col("c_name")).as("name_token"),
        Masking.maskCardNumber(col("c_name")).as("name_masked"),
        col("c_mktsegment")),
    Some("""
      SELECT c_custkey,
        sha256(lower(trim(c_name))) AS name_token,
        '****-****-****-' || right(c_name, 4) AS name_masked,
        c_mktsegment
      FROM customer
    """))

  val all: Seq[Q] = Seq(q17MergeUpsert, q18DqQuarantine, q19DqSummary, q20MaskPii)
}
