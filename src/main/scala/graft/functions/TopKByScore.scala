package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact per-group top-k as an AGGREGATE function (the typed `Aggregator`
  * extension tier): each partition's partial buffer holds at most k
  * entries, so the shuffle carries k rows per group per partition instead
  * of the whole group — groupBy + topK in ONE aggregation pass, no window
  * sort, no per-group materialization. Deterministic order: score
  * descending, id ascending tiebreak.
  *
  * Complements WindowGroupLimit (rank-filter windows): the aggregator
  * yields the top-k as one array row per group — the shape feature
  * pipelines want for "top merchants / exemplar docs per cluster" —
  * and composes with other aggregates in the same `.agg(...)`.
  */
case class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, "k must be >= 1")

  private def trim(entries: Seq[(Double, Long)]): Seq[(Double, Long)] =
    entries.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    trim(x +: buf)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKByScore {
  /** Untyped column form for `groupBy(...).agg(topK(score, id))`. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(TopKByScore(k)).apply(score, id)
}
