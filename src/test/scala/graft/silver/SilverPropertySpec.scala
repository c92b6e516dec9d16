package graft.silver

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property tests for the Silver invariants (SURVEY §5):
  *  - DQ split partitions the input: valid ∪ quarantine == input, disjoint,
  *    with first-failing-rule reasons.
  *  - Merge upsert is idempotent, key-unique, and source-wins.
  * (Raw Gen + explicit seeds — the scalatestplus bridge isn't in the offline
  * dependency cache, and explicit seeds make failures replayable anyway.)
  */
class SilverPropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowGen = Gen.listOfN(60, for {
    id <- Gen.option(Gen.choose(0L, 30L))
    amount <- Gen.chooseNum(-100.0, 1000.0)
    status <- Gen.oneOf("A", "B", "C", "X")
  } yield (id, amount, status))

  private val rules = Seq(
    Quality.Rule("null_id", col("id").isNotNull),
    Quality.Rule("bad_amount", col("amount") > 0),
    Quality.Rule("bad_status", col("status").isin("A", "B", "C")))

  test("property: DQ split partitions any input with first-failing reasons") {
    samples(rowGen, 12).foreach { rows =>
      val df = rows.toDF("id", "amount", "status")
      val (valid, quarantined) = Quality.split(df, rules)
      assert(valid.count() + quarantined.count() === df.count())
      val reunion = valid.unionByName(quarantined.drop("quarantine_reason"))
      assert(reunion.exceptAll(df).isEmpty && df.exceptAll(reunion).isEmpty,
        "valid ∪ quarantine must equal the input multiset")
      val wrongReason = quarantined.filter(
        (col("quarantine_reason") === "null_id" && col("id").isNotNull) ||
        (col("quarantine_reason") === "bad_amount" && (col("id").isNull || col("amount") > 0)) ||
        (col("quarantine_reason") === "bad_status" &&
          (col("id").isNull || !(col("amount") > 0) || col("status").isin("A", "B", "C"))))
      assert(wrongReason.count() === 0, "reason must be the FIRST failing rule")
    }
  }

  test("property: merge upsert is idempotent, key-unique, source-wins") {
    val kvGen = Gen.listOfN(40, for {
      k <- Gen.choose(0L, 25L); v <- Gen.identifier.map(_.take(6))
    } yield (k, v))
    samples(Gen.zip(kvGen, kvGen), 12).foreach { case (targetRows, sourceRows) =>
      val target = targetRows.toDF("k", "v").dropDuplicates("k")
      val source = sourceRows.toDF("k", "v").dropDuplicates("k")
      val once = Merge.upsert(target, source, Seq("k"))
      val twice = Merge.upsert(once, source, Seq("k"))
      // compare on the driver: exceptAll/joins between plans that CONTAIN
      // each other's lineage (twice ⊃ once ⊃ source) trip Catalyst's
      // attribute dedup ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND])
      val onceRows = once.as[(Long, String)].collect()
      val onceMap = onceRows.toMap
      assert(onceRows.length === onceMap.size, "keys must stay unique")
      val twiceRows = twice.as[(Long, String)].collect()
      assert(twiceRows.sorted.toSeq === onceRows.sorted.toSeq, "replay must be a no-op")
      val srcMap = source.as[(Long, String)].collect().toMap
      assert(srcMap.forall { case (k, v) => onceMap.get(k).contains(v) },
        "source must win on key collision")
    }
  }
}
