package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality contracts — the expectations tier of a managed
  * ETL pipeline (the platform the reference runs on ships this as
  * `@dlt.expect` / `expect_or_drop`; re-expressed here as a one-pass Spark
  * operator instead of a notebook decorator).
  *
  * A rule set is evaluated in ONE flagging pass over the input:
  * every row-local rule becomes a boolean flag column computed in the same
  * projection (one scan, codegen'd together — NOT one scan per rule), and
  * dataset-level rules (key uniqueness, referential integrity) each add one
  * keyed join derived from the input before flags are attached. From the
  * flagged frame the operator derives:
  *  - `clean`      — rows violating nothing (expect_or_drop semantics),
  *  - `quarantine` — rows violating ≥1 rule, with a `violated` array naming
  *                   exactly which (the triage table a steward works),
  *  - `metrics`    — per rule: violation count + rate (the health dashboard
  *                   row; one aggregate over the flags, map-side partial).
  *
  * Scale shape: row-local rules are embarrassingly parallel; uniqueness is
  * a groupBy-count on the key (same shuffle class as the dedup tier) joined
  * back keyed; FK is a left join against the dimension's distinct keys
  * (AQE broadcasts when small — never hinted, dimensions are data-sized in
  * general, the q193 rule). `clean`/`quarantine`/`metrics` all reuse the one
  * flagged plan — Spark computes the flags once per consumed output, and a
  * caller materializing all three should persist `flagged` first.
  */
object Expectations {

  /** One contract rule. `name` keys the metrics row and the `violated`
    * entries; subclasses define how the per-row "ok" flag is derived. */
  sealed trait Rule { def name: String }

  /** Row-local predicate that must hold (null predicate result = violation —
    * SQL three-valued logic must not let unknowns pass a contract). */
  final case class Expect(name: String, predicate: Column) extends Rule

  /** No two rows may share `keys` (composite allowed). EVERY row of a
    * duplicated key is flagged — keeping one arbitrary winner is the dedup
    * tier's job ([[Dedup]]), not a contract check's. NULL key values
    * compare EQUAL here (grouping semantics, not SQL-UNIQUE's
    * multiple-NULLs-allowed): two rows whose key tuples agree under
    * `IS NOT DISTINCT FROM` — including (NULL, 1) = (NULL, 1) — are
    * duplicates. A DQ contract that let NULL-keyed duplicates through
    * would pass exactly the rows most likely to be broken; the join-back
    * is null-safe (`<=>`) so the flag agrees with the count. */
  final case class ExpectUnique(name: String, keys: Seq[String]) extends Rule

  /** Every (non-null) `keys` tuple must exist in `dim`'s `dimKeys`. */
  final case class ExpectFk(name: String, keys: Seq[String],
      dim: DataFrame, dimKeys: Seq[String]) extends Rule

  final case class Result(
      flagged: DataFrame, clean: DataFrame, quarantine: DataFrame,
      metrics: DataFrame)

  private def flagCol(name: String): String = s"__viol_$name"
  private def flagCol(r: Rule): String = flagCol(r.name)

  /** Evaluate `rules` over `df`; see object scaladoc for the contract. */
  def check(df: DataFrame, rules: Seq[Rule]): Result = {
    require(rules.nonEmpty, "expectations: empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectations: rule names must be unique")
    // rule names travel as intermediate column names (metric pivots) and
    // as `violated` entries — keep them out of the input's namespace and
    // out of column-resolution edge cases (dots/backticks)
    rules.foreach { r =>
      require(r.name.matches("[A-Za-z0-9_-]+"),
        s"expectations: rule name '${r.name}' must be [A-Za-z0-9_-]+")
      require(r.name != "n_rows" && !df.columns.contains(r.name),
        s"expectations: rule name '${r.name}' collides with an input/metric column")
    }
    // the operator's own temp columns must not resolve against the input:
    // an input already carrying __fk_ok / __viol_x would make the FK join
    // or flag projection silently read the wrong column
    val reserved = Set("__n", "__fk_ok")
    val reservedPrefixes = Seq("__viol_", "__dup_")
    df.columns.foreach { c =>
      require(!reserved.contains(c) && !reservedPrefixes.exists(c.startsWith),
        s"expectations: input column '$c' collides with a reserved internal name " +
          s"(${(reserved ++ reservedPrefixes.map(_ + "*")).mkString(", ")})")
    }

    // dataset-level rules first: each derives a keyed "bad keys" table from
    // the input, joined back before the row-local projection
    var flagged = df
    rules.foreach {
      case ExpectUnique(name, keys) =>
        // keys renamed on the dupe side + null-safe (<=>) join back: a
        // plain equi-join never matches NULL keys, which would silently
        // pass exactly the duplicates the groupBy counted (NULLs group
        // together) — the rule's documented NULLS-EQUAL semantics
        val dupes = df.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .select(keys.map(k => col(k).as(s"__dup_$k")): _*)
          .withColumn(flagCol(name), lit(true))
        flagged = flagged.join(dupes,
            keys.map(k => flagged(k) <=> dupes(s"__dup_$k")).reduce(_ && _),
            "left")
          .drop(keys.map(k => s"__dup_$k"): _*)
      case ExpectFk(name, keys, dim, dimKeys) =>
        val present = dim.select(dimKeys.zip(keys).map {
            case (d, k) => col(d).as(k) }: _*)
          .distinct()
          .withColumn("__fk_ok", lit(true))
        flagged = flagged.join(present, keys, "left")
          .withColumn(flagCol(name),
            col("__fk_ok").isNull &&
              keys.map(col(_).isNotNull).reduce(_ && _)) // null FK ≠ broken FK
          .drop("__fk_ok")
      case _: Expect => ()
    }
    // row-local rules in one projection; normalize dataset-level flags to
    // non-null booleans in the same pass
    val withFlags = flagged.select(
      df.columns.map(col) ++ rules.map {
        case Expect(name, pred) =>
          (!coalesce(pred, lit(false))).as(flagCol(name))
        case r => coalesce(col(flagCol(r)), lit(false)).as(flagCol(r))
      }: _*)

    val anyViol = rules.map(r => col(flagCol(r))).reduce(_ || _)
    val violatedNames = array_compact(array(rules.map(r =>
      when(col(flagCol(r)), lit(r.name))): _*))

    val clean = withFlags.filter(!anyViol).select(df.columns.map(col): _*)
    val quarantine = withFlags.filter(anyViol)
      .withColumn("violated", violatedNames)
      .select((df.columns.map(col) :+ col("violated")): _*)
    val total = count(lit(1))
    val metrics = withFlags.agg(
        total.as("n_rows"),
        rules.map(r => sum(col(flagCol(r)).cast("long")).as(r.name)): _*)
      .select(explode(array(rules.map(r => struct(
          lit(r.name).as("rule"),
          col(r.name).as("n_violations"),
          (col(r.name).cast("double") / col("n_rows")).as("violation_rate"),
          col("n_rows").as("n_rows"))): _*)).as("m"))
      .select(col("m.rule"), col("m.n_violations"),
        col("m.violation_rate"), col("m.n_rows"))
    Result(withFlags, clean, quarantine, metrics)
  }
}
