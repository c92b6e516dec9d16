package graft

import org.apache.spark.sql.functions._

/** The segmented-fold EWMA ([[graft.queries.Analytics.ewmaChunked]], q151):
  * per-key buffers bounded by the chunk length, recurrence algebra
  * unchanged. The hot-key case is the one that matters — the pre-r12 form
  * collected one user's ENTIRE history into a single aggregation buffer.
  */
class EwmaSegmentSpec extends SparkSuite {
  import spark.implicits._

  /** Plain-Scala mirror of the chunked pipeline's float ops, for exact
    * (bit-level) agreement checks. */
  private def chunkedRef(values: Seq[Double], chunkLen: Int): Double = {
    val chunks = values.grouped(chunkLen).toSeq.map { c =>
      val r = c.foldLeft(0.0)((a, x) => a * 0.75 + x * 0.25)
      val w = (1 to c.length).foldLeft(1.0)((a, _) => a * 0.75)
      (r, w)
    }
    chunks.foldLeft((0.0, 1.0)) { case ((a, aw), (r, w)) => (a * w + r, aw * w) }._1
  }

  test("hot key with 1e5 events: bounded buffers, matches the straight fold to 1e-9") {
    val n = 100000
    // deterministic pseudo-random values in [0, 1): no Random seed drift
    val vals = (0 until n).map(i => ((i * 2654435761L) % 1000003L).toDouble / 1000003.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => (7L, i.toLong, i.toLong, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val got = graft.queries.Analytics.ewmaChunked(df)
      .select($"user_id", $"n_events", $"ewma").as[(Long, Long, Double)].head()
    assert(got._1 === 7L && got._2 === n.toLong)
    // exact agreement with the mirrored chunked arithmetic (same IEEE ops)
    assert(got._3 === chunkedRef(vals, 256),
      "Spark fold must run the exact chunked op sequence")
    // algebraic agreement with the straight unsegmented recurrence
    val straight = vals.foldLeft(0.0)((a, x) => a * 0.75 + x * 0.25)
    assert(math.abs(got._3 - straight) <= 1e-9 * math.max(1.0, math.abs(straight)),
      s"chunked ${got._3} vs straight $straight")
  }

  test("multi-user, ragged lengths incl. exact chunk boundaries") {
    // lengths straddle the 4-event chunk boundary cases: 1, 3, 4, 5, 8, 9
    val rows = for {
      (u, len) <- Seq((1L, 1), (2L, 3), (3L, 4), (4L, 5), (5L, 8), (6L, 9))
      i <- 0 until len
    } yield (u, i.toLong, i.toLong, (u * 10 + i).toDouble)
    val got = graft.queries.Analytics.ewmaChunked(
        rows.toDF("user_id", "ts", "event_id", "value"), chunkLen = 4)
      .select($"user_id", $"ewma").as[(Long, Double)].collect().toMap
    for ((u, len) <- Seq((1L, 1), (2L, 3), (3L, 4), (4L, 5), (5L, 8), (6L, 9))) {
      val vals = (0 until len).map(i => (u * 10 + i).toDouble)
      assert(got(u) === chunkedRef(vals, 4), s"user $u")
    }
  }
}
