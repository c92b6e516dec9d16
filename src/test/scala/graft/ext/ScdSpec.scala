package graft.ext

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD Type 2 semantics ([[Scd]]): run-collapse correctness, interval
  * chaining, and the incremental `apply == rebuild` contract.
  */
class ScdSpec extends SparkSuite {
  import spark.implicits._

  private val keys = Seq("k")
  private def hist(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toDF("k", "ts", "tie", "attr")

  private def build(df: DataFrame): DataFrame =
    Scd.scd2FromHistory(df, keys, "ts", "tie", Seq("attr"))

  private def canon(df: DataFrame): Set[(Long, String, Long, Option[Long], Long, Boolean)] =
    df.select($"k", $"attr", $"effective_from", $"effective_to", $"version", $"is_current")
      .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSet

  test("scd2FromHistory collapses runs, chains intervals, numbers versions") {
    val out = canon(build(hist(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      (2L, 15L, 5L, "X"))))
    assert(out === Set(
      (1L, "A", 10L, Some(30L), 1L, false),
      (1L, "B", 30L, Some(40L), 2L, false),
      (1L, "A", 40L, None, 3L, true),
      (2L, "X", 15L, None, 1L, true)))
  }

  test("equal-timestamp observations collapse deterministically by tiebreak") {
    // two observations at ts=10: tie orders A (tie=1) before B (tie=2) —
    // A opens version 1 as a zero-length interval, B supersedes at the
    // same instant.
    val out = canon(build(hist((1L, 10L, 1L, "A"), (1L, 10L, 2L, "B"))))
    assert(out === Set(
      (1L, "A", 10L, Some(10L), 1L, false),
      (1L, "B", 10L, None, 2L, true)))
  }

  test("scd2Apply == rebuild on concatenated history (incl. new keys, ties, no-op repeats)") {
    val batch1 = hist(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"),
      (2L, 10L, 3L, "X"),
      (4L, 5L, 9L, "Q"))
    val batch2 = hist(
      (1L, 25L, 4L, "B"), // same attrs as current → run extends, no new version
      (1L, 30L, 5L, "C"), // change
      (2L, 20L, 6L, "Y"), (2L, 20L, 7L, "Z"), // equal-ts tie inside the batch
      (3L, 12L, 8L, "N")) // key new in batch2
    val dim1 = build(batch1)
    val applied = Scd.scd2Apply(dim1, batch2, keys, "ts", "tie", Seq("attr"))
    val rebuilt = build(batch1.unionByName(batch2))
    assert(canon(applied) === canon(rebuilt))
  }

  test("scd2Apply refuses an update at the current row's own instant (tie order unrecoverable)") {
    // The dimension does not retain the opening observation's tie value,
    // so an update at the exact current effective_from cannot be ordered
    // against it the way a rebuild would: a SMALLER tie (here 0 < 1)
    // would rebuild as (B@tie0, A@tie1) but apply would seed A first —
    // apply != rebuild. The strict guard refuses BOTH tie directions at
    // the shared instant rather than silently diverge on one of them.
    val batch1 = hist((1L, 10L, 1L, "A"))
    for (tie <- Seq(0L, 2L)) {
      val batch2 = hist((1L, 10L, tie, "B")) // same ts as current effective_from
      val e = intercept[Exception] {
        Scd.scd2Apply(build(batch1), batch2, keys, "ts", "tie", Seq("attr")).collect()
      }
      assert(e.getMessage.contains("late data") ||
        e.getCause != null && e.getCause.getMessage.contains("late data"))
    }
  }

  test("scd2Apply refuses late data loudly") {
    val dim = build(hist((1L, 10L, 1L, "A"), (1L, 30L, 2L, "B")))
    val late = hist((1L, 20L, 3L, "C")) // before current effective_from=30
    val e = intercept[Exception] {
      Scd.scd2Apply(dim, late, keys, "ts", "tie", Seq("attr")).collect()
    }
    assert(e.getMessage.contains("late data") ||
      e.getCause != null && e.getCause.getMessage.contains("late data"))
  }

  test("property: apply == rebuild over random generated histories") {
    // deterministic pseudo-random history via hashing — no Random seed
    // drift across Scala versions
    val obs = (0 until 400).map { i =>
      val k = (i * 2654435761L % 7).abs
      val ts = (i * 40503L % 97).abs
      val attr = s"v${(i * 97L % 3).abs}"
      (k, ts, i.toLong, attr)
    }
    val (h1, h2) = obs.splitAt(260)
    // batch2 must be per-key strictly after batch1's current effective_from:
    // shift its timestamps past batch1's global max — the apply contract
    // (late data is refused, separately pinned above)
    val shift = 1000L
    val b1 = hist(h1: _*)
    val b2 = hist(h2.map { case (k, ts, tie, a) => (k, ts + shift, tie, a) }: _*)
    val applied = Scd.scd2Apply(build(b1), b2, keys, "ts", "tie", Seq("attr"))
    assert(canon(applied) === canon(build(b1.unionByName(b2))))
  }

  test("closed-history compaction: read set identical, replay dedup intact, vacuum sweeps covered dirs") {
    val base = java.nio.file.Files.createTempDirectory("graft-scd2c").toString + "/dim"
    def fold(b: Long, rows: Seq[(Long, Long, Long, String)]): Boolean =
      Scd.applyBatch(spark, base, hist(rows: _*), keys, "ts", "tie", Seq("attr"), b)
    fold(0L, Seq((1L, 10L, 1L, "A"), (2L, 10L, 2L, "X")))
    fold(1L, Seq((1L, 20L, 3L, "B"), (2L, 20L, 4L, "Y")))
    fold(2L, Seq((1L, 30L, 5L, "C")))
    val before = canon(Scd.readDim(spark, base).get)
    // three per-batch closed dirs fold into one compacted dir
    assert(Scd.compactClosed(spark, base) === 3)
    assert(canon(Scd.readDim(spark, base).get) === before,
      "compaction is a pure layout change")
    // replay of an already-applied batch is STILL recognized after compact
    assert(!fold(1L, Seq((1L, 20L, 3L, "B"), (2L, 20L, 4L, "Y"))))
    assert(canon(Scd.readDim(spark, base).get) === before)
    // new folds append fresh deltas next to the compacted dir
    fold(3L, Seq((2L, 40L, 6L, "Z")))
    val after = canon(Scd.readDim(spark, base).get)
    assert(after !== before)
    // second compaction folds (compacted + new delta); vacuum then drops
    // the superseded dirs and the read is unchanged
    assert(Scd.compactClosed(spark, base) === 2)
    Scd.vacuumClosed(spark, base)
    assert(canon(Scd.readDim(spark, base).get) === after)
    val closedRoot = new java.io.File(s"$base/closed")
    val names = closedRoot.listFiles().map(_.getName).toSet
    assert(names.count(_.startsWith("compact=")) === 1, s"one live compact dir, got $names")
    assert(!names.exists(_.startsWith("batch=")), s"covered batch dirs swept, got $names")
    // the whole lifecycle still equals a from-scratch rebuild
    val rebuilt = canon(build(hist(
      (1L, 10L, 1L, "A"), (2L, 10L, 2L, "X"), (1L, 20L, 3L, "B"),
      (2L, 20L, 4L, "Y"), (1L, 30L, 5L, "C"), (2L, 40L, 6L, "Z"))))
    assert(after === rebuilt)
  }

  test("q134 shape on real orders: one current row per key, dense versions, chained intervals") {
    val dim = Scd.scd2FromHistory(
      Tables.load(spark, sf("o"), "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"),
      Seq("o_custkey"), "o_orderdate", "o_orderkey", Seq("o_orderpriority"))
    val perKey = dim.groupBy($"o_custkey").agg(
      sum(when($"is_current", 1).otherwise(0)).as("n_cur"),
      count(lit(1)).as("n"),
      max($"version").as("maxv"))
    // exactly one current version per key; versions dense 1..n
    assert(perKey.filter($"n_cur" =!= 1 || $"maxv" =!= $"n").isEmpty)
    // non-current intervals chain: effective_to = next version's from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"version")
    val chained = dim.withColumn("next_from", lead($"effective_from", 1).over(w))
    assert(chained.filter(!($"effective_to" <=> $"next_from")).isEmpty)
  }
}
