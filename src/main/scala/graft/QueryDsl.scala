package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One catalog entry: a Spark query over the testdata + optional DuckDB
  * oracle SQL twin (omitted ⇒ driver records a rows-only check).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Shared helpers for catalog queries. Determinism rules (SURVEY §7):
  * decimal-cast money sums, exact-sum/exact-count ratios, unique tiebreaks
  * under every limit, no nondeterministic functions in compared queries.
  */
object QueryDsl {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact money sum: accumulate in decimal (associative & exact ⇒ immune to
    * partial-agg ordering vs DuckDB's serial sum), surface as double.
    * `scale` must cover the true decimal scale of the addend (prices: 2;
    * price*(1±x): 4; *(1±x)²: 6). */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  def oracleDsum(sqlExpr: String, scale: Int): String =
    s"CAST(SUM(CAST($sqlExpr AS DECIMAL(28,$scale))) AS DOUBLE)"

  /** Conditional count matching DuckDB's BIGINT (DuckDB SUM(int) is HUGEINT,
    * so oracle sides use CAST(SUM(CASE...) AS BIGINT)). */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  def oracleCountIf(sqlCond: String): String =
    s"CAST(SUM(CASE WHEN $sqlCond THEN 1 ELSE 0 END) AS BIGINT)"
}
