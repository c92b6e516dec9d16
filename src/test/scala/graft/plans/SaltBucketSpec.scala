package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SaltBucketSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one key — the classic hot-key shape
    val big = spark.range(10000)
      .withColumn("k", when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 100))
      .withColumn("payload", $"id" * 2)
    val small = spark.range(100).select($"id".as("k"), concat(lit("dim"), $"id").as("name"))
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Salt.saltedJoin(big, small, "k", factor = 8).select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = spark.range(20000)
      .withColumn("k", when($"id" % 5 =!= 0, lit(1L)).otherwise($"id" % 50))
      .withColumn("v", ($"id" % 97).cast("double"))
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
    val salted = Salt.saltedCountSum(df, "k", "v", factor = 16)
    val joined = direct.as("d").join(salted.as("s"), "k")
      .filter($"d.n" =!= $"s.n" || abs($"d.total" - $"s.total") > 1e-6)
    assert(joined.count() === 0)
  }

  test("tiledPairJoin emits exactly the plain join's pair set (symmetric self-join shape)") {
    val rows = spark.range(3000).select(
      ($"id" % 5).as("cid"), $"id".as("src"))
      .withColumn("dst", $"src") // self-join shape: same per-key row sets
    val l = rows.select($"cid", $"src")
    val r = rows.select($"cid", $"dst")
    val plain = l.join(r, Seq("cid")).select("cid", "src", "dst")
    val tiled = Salt.tiledPairJoin(l, r, "cid", "src", "dst", pairBudget = 10000)
      .select("cid", "src", "dst")
    assert(tiled.count() === plain.count())
    assert(plain.exceptAll(tiled).isEmpty && tiled.exceptAll(plain).isEmpty)
  }

  test("tiledPairJoin honors the pair budget on ASYMMETRIC inputs (r18: factors from both sides)") {
    // one key: 10 left rows vs 10,000 right rows. The r17 left-only factor
    // (f = ceil(10/sqrt(B)) = 1 at B=1000) would leave ALL 100k pairs in one
    // tile; the two-sided factor f = ceil(sqrt(10*10000/1000)) = 10 caps
    // every tile at mL*mR/f^2 = 1000 pairs.
    val l = spark.range(10).select(lit(1L).as("k"), $"id".as("a"))
    val r = spark.range(10000).select(lit(1L).as("k"), $"id".as("b"))
    val budget = 1000L
    // reproduce the tile assignment to measure per-tile pair counts
    val tiled = Salt.tiledPairJoin(l, r, "k", "a", "b", budget)
    assert(tiled.count() === 100000L, "same pairs as the plain join")
    val f = math.ceil(math.sqrt(10.0 * 10000.0 / budget)).toLong
    val perTile = l
      .withColumn("ta", pmod(xxhash64($"a"), lit(f)))
      .join(r.withColumn("tb", pmod(xxhash64($"b"), lit(f))), Seq("k"))
      .groupBy($"ta", $"tb").count()
      .agg(max($"count")).head().getLong(0)
    // f=10 splits each side by hash — groups are uniform in EXPECTATION
    // ((mL/f)·(mR/f) = budget pairs per tile) but hashing is uneven, so the
    // exact deterministic bound is (max left row-group) × (max right
    // col-group); assert that bound holds AND the result is nowhere near
    // the 100k single-tile disaster the left-only factor (f=1) produced
    val maxLGroup = l.groupBy(pmod(xxhash64($"a"), lit(f))).count()
      .agg(max($"count")).head().getLong(0)
    val maxRGroup = r.groupBy(pmod(xxhash64($"b"), lit(f))).count()
      .agg(max($"count")).head().getLong(0)
    assert(perTile <= maxLGroup * maxRGroup,
      s"max per-tile pairs $perTile must be within $maxLGroup × $maxRGroup")
    assert(perTile < 100000L / 4,
      s"per-tile pairs $perTile must be far below the one-tile product")
    // and keys present on only ONE side neither error nor emit pairs
    val lOnly = spark.range(5).select(lit(2L).as("k"), $"id".as("a"))
    val rOnly = spark.range(5).select(lit(3L).as("k"), $"id".as("b"))
    assert(Salt.tiledPairJoin(l.unionByName(lOnly), r.unionByName(rOnly),
      "k", "a", "b", budget).count() === 100000L)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    spark.range(5000).select($"id".as("k"), ($"id" * 3).as("a"))
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bk_a")
    spark.range(5000).select($"id".as("k"), ($"id" * 5).as("b"))
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bk_b")
    val j = spark.table("graft_bk_a").join(spark.table("graft_bk_b"), "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(j.count() === 5000)
    spark.sql("DROP TABLE graft_bk_a")
    spark.sql("DROP TABLE graft_bk_b")
  }
}
