package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Distributed prefix scan ([[Scan]]): equivalence with the
  * single-partition window across partition layouts, and skyline
  * equivalence with brute-force dominance.
  */
class ScanSpec extends SparkSuite {
  import spark.implicits._

  private val pts = (0 until 400).map { i =>
    (i.toLong, ((i * 2654435761L) % 1009), ((i * 40503L) % 997))
  }.toDF("id", "x", "y")

  test("running max/sum/min exclusive equal the single-window formulation, any input layout") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{Column, DataFrame}
    val order = Seq($"x".desc, $"y".desc, $"id")
    val w = Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)
    val variants: Seq[(String, Column, (DataFrame, Seq[Column], String, String) => DataFrame)] =
      Seq(
        ("max", max($"y").over(w), Scan.runningMaxExclusive),
        ("sum", sum($"y").over(w), Scan.runningSumExclusive),
        ("min", min($"y").over(w), Scan.runningMinExclusive))
    for ((name, single, scan) <- variants) {
      val expect = pts.withColumn("pm", single)
        .select($"id", $"pm").as[(Long, Option[Long])].collect().toMap
      for (layout <- Seq(pts.coalesce(1), pts.repartition(13), pts.orderBy($"y"))) {
        val got = scan(layout, order, "y", "pm")
          .select($"id", $"pm").as[(Long, Option[Long])].collect().toMap
        assert(got === expect, s"variant $name diverged")
      }
    }
  }

  test("skyline2D equals brute-force dominance on distinct points") {
    val distinct = pts.groupBy($"x", $"y").agg(min($"id").as("id"))
    val rows = distinct.select($"x", $"y", $"id").as[(Long, Long, Long)].collect()
    val brute = rows.filter { case (x, y, _) =>
      !rows.exists { case (ox, oy, _) =>
        ox >= x && oy >= y && (ox > x || oy > y) }
    }.map(r => (r._1, r._2)).toSet
    val got = Scan.skyline2D(distinct, "x", "y", "id")
      .select($"x", $"y").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size)
    assert(got.toSet === brute)
    // frontier sanity: sorted by x desc, y strictly increases
    val sorted = got.sortBy(-_._1)
    assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._2 < p(1)._2))
  }
}
