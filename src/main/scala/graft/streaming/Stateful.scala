package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Arbitrary per-key streaming state (SURVEY §2.8 ST8) via Spark 4's
  * `transformWithState` + `StatefulProcessor`.
  *
  * ST8 history: `flatMapGroupsWithState` deadlocks in this environment
  * (HDFS-backed state-store delta commits hang in the checksum checkpoint
  * manager; see round-1 notes). `transformWithState` runs on the
  * RocksDB state-store provider — a different commit path — and works;
  * the caller (or the query conf) must set
  * `spark.sql.streaming.stateStore.providerClass` to
  * [[Stateful.RocksDbProvider]] before starting the query, which is also
  * the provider you want at scale (incremental checkpoints, state larger
  * than heap, no JVM-heap eviction storms).
  */
object Stateful {

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Per-key running (count, sum) over a Double metric — the canonical
    * "profile accumulator" shape (running per-merchant txn totals): state
    * is one fixed-width value per key, output is the refreshed profile on
    * every update. TTL bounds state for keys that go quiet (pass
    * `ttl = None` for unbounded retention). */
  class RunningTotalsProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, (String, Double), (String, Long, Double)] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttlConf = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      state = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.product[(Long, Double)], ttlConf)
    }

    override def handleInputRows(
        key: String, rows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[(String, Long, Double)] = {
      var (n, s) = if (state.exists()) state.get() else (0L, 0.0)
      rows.foreach { r => n += 1; s += r._2 }
      state.update((n, s))
      Iterator((key, n, s))
    }
  }

  /** Wire the processor onto a keyed stream: emits (key, running_count,
    * running_sum) per updated key per micro-batch (Update mode). */
  def runningTotals(
      keyed: KeyValueGroupedDataset[String, (String, Double)],
      ttl: Option[java.time.Duration] = None): Dataset[(String, Long, Double)] = {
    implicit val enc: Encoder[(String, Long, Double)] =
      Encoders.product[(String, Long, Double)]
    keyed.transformWithState(
      new RunningTotalsProcessor(ttl), TimeMode.None(), OutputMode.Update())
  }
}
