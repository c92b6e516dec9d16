package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Batch Space-Saving ([[SpaceSaving]]): the Metwally invariants under
  * planted skew, robustness to partition layout (= merge order), and the
  * disjoint-shard global merge. The invariants — not exact content — are
  * the contract: summary composition below the guarantee line is
  * merge-order-dependent by construction.
  */
class SpaceSavingSpec extends SparkSuite {
  import spark.implicits._

  // planted zipf-ish stream: two certain heavy hitters over a churning tail
  private val items: Seq[String] =
    Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 100).flatMap(i => Seq.fill(5)(s"t$i"))
  private val exact: Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private val n = items.size.toLong
  private val cap = 8

  test("certificates bracket exact counts and heavy items survive, under any partition layout") {
    for (parts <- Seq(1, 7, 13)) {
      val df = items.toDF("item").repartition(parts)
      val s = SpaceSaving.summarize(df, "item", cap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(s.length <= cap)
      for ((item, c, o) <- s) {
        val t = exact(item)
        assert(t <= c && t >= c - o,
          s"parts=$parts $item: exact $t outside [${c - o}, $c]")
      }
      // Metwally presence: true frequency > N/cap ⇒ in the summary
      // (hot: 500 > 1200/8 = 150; warm: 200 > 150 — both NON-vacuous)
      val present = s.map(_._1).toSet
      assert(present.contains("hot") && present.contains("warm"),
        s"parts=$parts: heavy hitters evicted: $present")
      // and the head estimates are exact (their counters never evicted)
      val hot = s.find(_._1 == "hot").get
      assert(hot._2 - hot._3 <= 500L && 500L <= hot._2)
    }
  }

  test("null items are dropped, not an NPE in the eviction ordering") {
    val withNulls = (items.map(Option(_)) ++ Seq.fill(50)(None: Option[String]))
      .toDF("item").repartition(5)
    val s = SpaceSaving.summarize(withNulls, "item", cap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(s.nonEmpty && s.forall(_._1 != null))
    // the null rows must not have been counted anywhere
    assert(s.map(_._2).sum <= n + cap * (n / cap)) // certificates still ≤ N-bounded
    assert(s.exists(_._1 == "hot"))
  }

  test("summary is capacity-bounded and count-descending") {
    val s = SpaceSaving.summarize(items.toDF("item"), "item", cap).collect()
    assert(s.length == cap, "102 distinct items must fill the summary")
    val counts = s.map(_.getLong(1))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
    // floor column is count − over
    s.foreach(r => assert(r.getLong(3) == r.getLong(1) - r.getLong(2)))
  }

  test("mergeShards: disjoint per-shard summaries produce a valid global view") {
    // the streaming reader's shape: items hash-sharded, one summary per
    // shard (each shard saw its items' WHOLE stream), global = concat+trim
    val df = items.toDF("item").withColumn("shard", pmod(xxhash64(col("item")), lit(3)))
    val perShard = (0 until 3).map { sh =>
      SpaceSaving.summarize(df.filter(col("shard") === sh), "item", cap)
    }.reduce(_ unionByName _)
    val global = SpaceSaving.mergeShards(perShard, cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(global.length <= cap)
    for ((item, c, o) <- global) {
      val t = exact(item)
      assert(t <= c && t >= c - o, s"$item: exact $t outside [${c - o}, $c]")
    }
    val present = global.map(_._1).toSet
    assert(present.contains("hot") && present.contains("warm"))
  }
}
