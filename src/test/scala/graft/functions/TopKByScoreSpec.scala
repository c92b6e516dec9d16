package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TopKByScoreSpec extends SparkSuite {
  import spark.implicits._

  test("topK keeps k best per group across partial merges, deterministic ties") {
    // 40 partitions force many partial buffers + merges
    val rows = (for {
      g <- Seq("a", "b"); i <- 1 to 50
    } yield (g, i.toDouble % 7, i.toLong)).toDF("g", "score", "id")
      .repartition(40)
    val got = rows.groupBy($"g")
      .agg(TopKByScore.topK(3)($"score", $"id").as("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    // scores cycle 1..6,0; max score 6 at ids 6,13,20,... → ties broken by min id
    assert(got("a") === Seq((6.0, 6L), (6.0, 13L), (6.0, 20L)))
    assert(got("b") === got("a"))
  }

  test("groups smaller than k return all their rows") {
    val got = Seq(("g", 1.0, 1L), ("g", 2.0, 2L)).toDF("g", "score", "id")
      .groupBy($"g").agg(TopKByScore.topK(5)($"score", $"id").as("top"))
      .as[(String, Seq[(Double, Long)])].collect().head._2
    assert(got === Seq((2.0, 2L), (1.0, 1L)))
  }
}
