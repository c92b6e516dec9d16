package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Dedup.editDistancePairs]] — deletion-neighborhood blocking must be
  * LOSSLESS for distance ≤ 1 (substitution, insertion, deletion, and the
  * candidate-but-not-match shapes), verified against brute force.
  */
class EditDistanceSpec extends SparkSuite {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("matches brute force on a corpus with all edit shapes") {
    val names = Seq(
      "alpha", "alpah",        // transposition → distance 2, must NOT match
      "alphas",                // insertion vs alpha → 1
      "alph",                  // deletion vs alpha → 1
      "blpha",                 // substitution vs alpha → 1
      "ab", "ba",              // shared deletion variants, distance 2
      "x", "y", "",            // tiny + empty strings ("" vs "x" → 1)
      "gamma", "gamma",        // exact duplicate → distance 0
      "delta")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s")
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    val expect = (for {
      i <- names.indices; j <- names.indices if i < j
      d = lev(names(i), names(j)) if d <= 1
    } yield (i.toLong, j.toLong, d.toLong)).toSet
    assert(got == expect, s"got ${got.diff(expect)} extra, missing ${expect.diff(got)}")
    assert(expect.exists(_._3 == 0L), "corpus must include a distance-0 pair")
  }

  test("null strings are dropped, not propagated") {
    val df = Seq((1L, "abc"), (2L, null), (3L, "abd")).toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L)))
  }

  test("candidate generation never goes all-pairs (plan has no cartesian)") {
    val df = (1L to 100L).map(i => (i, f"name$i%04d")).toDF("id", "s")
    val plan = Dedup.editDistancePairs(df, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop plan:\n$plan")
  }
}
