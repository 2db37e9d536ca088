package graft.windows

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Warm-up emission gate for streaming paned (timeSliding) windows —
  * enforces the reference's canEmit contract (windows.go:362-371: a
  * sliding time window may not emit until a full window of panes has
  * elapsed) on top of Spark's built-in paned `window(size, slide)`
  * aggregation, which otherwise emits every closed pane from the first.
  * This was documented divergence #6; the gate closes it.
  *
  * A pane row (one closed window of the paned aggregation) is kept iff:
  *  1. its latest event falls in the window's LAST resolution pane — the
  *     pane anchoring the emission. Stateless: of the size/resolution
  *     windows containing an event-bearing resolution pane, exactly the
  *     trailing one (ending at that pane's end) survives, which is the
  *     same one-emission-per-pane correspondence the batch path produces
  *     with its `row_number() == 1 over (pane, desc seq)` anchor.
  *  2. the anchoring event is warm: at least `size` ms after the group's
  *     FIRST event. Stateful: the same `ts - min(ts) >= size` predicate
  *     the batch path evaluates with an unbounded window — cross-window
  *     state no streaming window aggregation can carry, hence this
  *     operator.
  * Result: the streaming emission set equals the batch emission set
  * row-for-row (StreamingWindowsSpec pins this on the reference's
  * windows_test.go:153-184 vector). Emitted VALUES are pane-aligned
  * ([end-size, end), exactly the reference's block ring); unkeyed
  * batch values default to event-anchored trailing ranges — identical
  * when events align with pane boundaries — and agree with this path
  * exactly under the batch `paneAligned=true` stage setting (the
  * divergence-#6 compat flag, same spec vector).
  *
  * State: ONE long per group (the group's first event timestamp), never
  * evicted (reference parity, state.go:67-89). Windows close in end-time
  * (watermark) order, so the group's first event is always folded into
  * the state before any later window's warm check reads it.
  *
  * Requires the RocksDB state store provider (transformWithState uses
  * column families) — the store SCALE.md prescribes for production.
  *
  * Payload shape: `result` is map<string, array<double>> so one gate
  * serves the scalar path (singleton map, singleton array), accumulate
  * (singleton map, full list), and the keyed map emission
  * (windows.go:469-479; one entry per name). Callers wrap and unwrap.
  */
object PaneGate {

  case class Pane(group: String, winStart: Long, winEnd: Long,
                  minTs: Long, maxTs: Long, seq: Long,
                  result: Map[String, Seq[Double]])

  private class GateProcessor(sizeMs: Long, resolutionMs: Long)
      extends StatefulProcessor[String, Pane, Pane] {
    @transient private var firstTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      firstTs = getHandle.getValueState[Long]("firstTs",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Pane],
                                 timerValues: TimerValues): Iterator[Pane] = {
      var first = if (firstTs.exists()) firstTs.get() else Long.MaxValue
      val out = Vector.newBuilder[Pane]
      // several windows may close in one micro-batch; fold in start order
      // so the earliest window's minTs (= the group's first event) is in
      // `first` before any warm check
      rows.toSeq.sortBy(_.winStart).foreach { p =>
        if (p.minTs < first) first = p.minTs
        val anchored = Math.floorDiv(p.maxTs, resolutionMs) * resolutionMs ==
          p.winEnd - resolutionMs
        if (anchored && p.maxTs - first >= sizeMs) out += p
      }
      firstTs.update(first)
      out.result().iterator
    }
  }

  /** Gate a paned streaming aggregation's closed windows (see object
    * doc). `sizeMs`/`resolutionMs` must be the paned window's own
    * parameters. */
  def warmGate(panes: Dataset[Pane], sizeMs: Long, resolutionMs: Long)
              (implicit spark: SparkSession): Dataset[Pane] = {
    import spark.implicits._
    val provider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    require(provider.exists(_.contains("RocksDB")),
      "the streaming timeSliding warm-up gate runs on transformWithState, " +
        "which needs spark.sql.streaming.stateStore.providerClass=" +
        "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    panes.groupByKey(_.group)
      .transformWithState(new GateProcessor(sizeMs, resolutionMs),
        TimeMode.None(), OutputMode.Append())
  }
}
