package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins [[Expectations]]: planted violations land exactly where the contract
  * says, clean/quarantine partition the input, uniqueness flags every copy,
  * null semantics (unknown predicate = violation; null FK = not a violation).
  */
class ExpectationsSpec extends SparkSuite {
  import spark.implicits._
  import Expectations._

  private def dim = Seq(1L, 2L, 3L).toDF("k")

  // (id, fk, qty): id 4+5 share a key-collision id, fk 99 is dangling,
  // fk null is allowed, qty -1 and null both violate qty > 0
  private def input = Seq(
    (1L, Option(1L), Option(10.0)),
    (2L, Option(2L), Option(-1.0)),
    (3L, Option(99L), Option(5.0)),
    (4L, Option(3L), Option(7.0)),
    (4L, Option(3L), Option(7.0)),
    (5L, None: Option[Long], Option(2.0)),
    (6L, Option(1L), None: Option[Double])
  ).toDF("id", "fk", "qty")

  private def rules = Seq(
    Expect("qty_positive", col("qty") > 0),
    ExpectUnique("unique_id", Seq("id")),
    ExpectFk("fk_dim", Seq("fk"), dim, Seq("k")))

  test("metrics count planted violations exactly") {
    val m = check(input, rules).metrics
      .select($"rule", $"n_violations", $"n_rows")
      .as[(String, Long, Long)].collect()
      .map { case (r, n, t) => r -> ((n, t)) }.toMap
    assert(m("qty_positive") === ((2L, 7L)), "-1 and NULL qty both violate")
    assert(m("unique_id") === ((2L, 7L)), "BOTH copies of id=4 flagged")
    assert(m("fk_dim") === ((1L, 7L)), "dangling fk=99 only; NULL fk passes")
  }

  test("clean and quarantine partition the input; violated names are exact") {
    val r = check(input, rules)
    val clean = r.clean.select($"id").as[Long].collect().sorted
    assert(clean === Array(1L, 5L), s"got ${clean.toSeq}")
    assert(r.clean.columns.toSeq === input.columns.toSeq, "flags stripped from clean")

    val quar = r.quarantine
      .select($"id", array_sort($"violated").as("v"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(quar.map(_._1).toSeq === Seq(2L, 3L, 4L, 4L, 6L))
    val byId = quar.groupBy(_._1).map { case (k, v) => k -> v.head._2 }
    assert(byId(2L) === Seq("qty_positive"))
    assert(byId(3L) === Seq("fk_dim"))
    assert(byId(4L) === Seq("unique_id"))
    assert(byId(6L) === Seq("qty_positive"))
    assert(r.clean.count() + r.quarantine.count() === input.count())
  }

  test("a row violating several rules appears once, with all names") {
    val multi = Seq((7L, Option(99L), Option(-3.0)), (8L, Option(1L), Option(1.0)))
      .toDF("id", "fk", "qty")
    val r = check(multi, rules)
    val v = r.quarantine.filter($"id" === 7L)
      .select(array_sort($"violated")).as[Seq[String]].collect()
    assert(v.length === 1)
    assert(v.head === Seq("fk_dim", "qty_positive"))
  }

  test("all-clean input: empty quarantine, zero-violation metrics") {
    val ok = Seq((1L, Option(1L), Option(1.0)), (2L, Option(2L), Option(2.0)))
      .toDF("id", "fk", "qty")
    val r = check(ok, rules)
    assert(r.quarantine.isEmpty)
    assert(r.clean.count() === 2)
    assert(r.metrics.agg(sum($"n_violations")).head.getLong(0) === 0)
  }

  test("duplicate rule names and empty rule sets are rejected") {
    intercept[IllegalArgumentException](check(input, Seq.empty))
    intercept[IllegalArgumentException](check(input,
      Seq(Expect("a", col("qty") > 0), Expect("a", col("qty") < 9))))
  }

  test("NULL-keyed duplicates ARE flagged (nulls-equal uniqueness semantics)") {
    // two rows with a NULL single key, and two composite tuples whose key
    // contains a NULL component: the groupBy counts them as duplicates, so
    // the join-back must flag them too — a plain equi-join would let every
    // NULL-keyed duplicate through a data-quality contract silently
    val in = Seq(
      (None: Option[Long], 1L, "a"),
      (None: Option[Long], 1L, "b"),
      (None: Option[Long], 2L, "c"), // (NULL, 2) is unique — not flagged
      (Option(1L), 1L, "d"),
      (Option(1L), 1L, "e"),
      (Option(2L), 1L, "f")
    ).toDF("k1", "k2", "payload")
    val single = check(in, Seq(ExpectUnique("u", Seq("k1"))))
    val sFlagged = single.quarantine.select($"payload").as[String].collect().sorted
    // k1=NULL appears 3×, k1=1 appears 2× — all five flagged
    assert(sFlagged === Array("a", "b", "c", "d", "e"),
      "every row of a duplicated (NULL included) single key is flagged")

    val comp = check(in, Seq(ExpectUnique("u", Seq("k1", "k2"))))
    val cFlagged = comp.quarantine.select($"payload").as[String].collect().sorted
    assert(cFlagged === Array("a", "b", "d", "e"),
      "(NULL,1) duplicates flagged; unique (NULL,2) and (2,1) pass")
    val m = comp.metrics.select($"n_violations").as[Long].head()
    assert(m === 4L, "metric count agrees with the null-safe flag")
  }

  test("input columns colliding with reserved internal names are rejected") {
    intercept[IllegalArgumentException](check(
      input.withColumn("__fk_ok", lit(1)), rules))
    intercept[IllegalArgumentException](check(
      input.withColumn("__n", lit(1)), rules))
    intercept[IllegalArgumentException](check(
      input.withColumn("__viol_x", lit(1)), rules))
    intercept[IllegalArgumentException](check(
      input.withColumn("__dup_id", lit(1)), rules))
  }

  test("unsafe and colliding rule names are rejected") {
    intercept[IllegalArgumentException](check(input,
      Seq(Expect("n_rows", col("qty") > 0)))) // metric column collision
    intercept[IllegalArgumentException](check(input,
      Seq(Expect("qty", col("qty") > 0)))) // input column collision
    intercept[IllegalArgumentException](check(input,
      Seq(Expect("bad.name", col("qty") > 0)))) // resolution-unsafe chars
  }
}
