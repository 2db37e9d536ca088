package graft.windows

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.windows.CountWindows.{KeyedSample, WindowEmit}

/** Count windows on Spark 4's transformWithState — the successor API to
  * flatMapGroupsWithState. Same reference semantics as
  * [[CountWindows.tumblingStream]]/[[CountWindows.slidingStream]]
  * (windows.go:56-108, 210-275), different runtime properties:
  *   - typed per-key state handles backed by the state store (RocksDB at
  *     scale), with optional TTL — the keyed-state-eviction improvement
  *     SURVEY §7.4.6 calls for (the reference never evicts,
  *     state.go:67-89);
  *   - processor-level timers available for time-driven emission.
  *
  * State layout mirrors the flatMapGroupsWithState operators: O(size)
  * doubles per key, independent of stream length.
  */
object CountWindowsTws {

  private class TumblingProcessor(size: Int, fn: String, ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedSample, WindowEmit] {
    import CountWindows.TumblingState
    @transient private var state: ValueState[TumblingState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TumblingState]("tumbling",
        Encoders.product[TumblingState], ttl)

    override def handleInputRows(key: String, rows: Iterator[KeyedSample],
                                 timerValues: TimerValues): Iterator[WindowEmit] = {
      val st0 = if (state.exists()) state.get()
        else TumblingState(Vector.empty, -1L)
      // identical cadence + high-water-mark contract as tumblingStream:
      // both delegate to CountWindows.tumblingFold
      val (st, out) =
        CountWindows.tumblingFold(key, rows.toSeq, st0, size, fn)
      state.update(st)
      out.iterator
    }
  }

  /** Tumbling count window via transformWithState. `ttl` evicts idle
    * keys' state (NONE = reference-equivalent never-evict). */
  def tumbling(ds: Dataset[KeyedSample], size: Int, fn: String,
               ttl: TTLConfig = TTLConfig.NONE)
              (implicit spark: SparkSession): Dataset[WindowEmit] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new TumblingProcessor(size, fn, ttl),
        TimeMode.None(), OutputMode.Append())
  }

  private class SlidingProcessor(size: Int, resolution: Int, fn: String,
                                 ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedSample, WindowEmit] {
    import CountWindows.SlidingState
    @transient private var state: ValueState[SlidingState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SlidingState]("sliding",
        Encoders.product[SlidingState], ttl)

    override def handleInputRows(key: String, rows: Iterator[KeyedSample],
                                 timerValues: TimerValues): Iterator[WindowEmit] = {
      val st0 = if (state.exists()) state.get()
        else SlidingState(Vector.empty, 0L, 0L, -1L)
      // identical cadence + high-water-mark contract as slidingStream:
      // both delegate to CountWindows.slidingFold
      val (st, out) =
        CountWindows.slidingFold(key, rows.toSeq, st0, size, resolution, fn)
      state.update(st)
      out.iterator
    }
  }

  /** Sliding count window (with resolution) via transformWithState —
    * cadence identical to [[CountWindows.slidingStream]]. */
  def sliding(ds: Dataset[KeyedSample], size: Int, resolution: Int,
              fn: String, ttl: TTLConfig = TTLConfig.NONE)
             (implicit spark: SparkSession): Dataset[WindowEmit] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new SlidingProcessor(size, resolution, fn, ttl),
        TimeMode.None(), OutputMode.Append())
  }

  case class TickerTwsState(buf: Vector[Double], lastSeq: Long,
                            timerSet: Boolean)

  private class TickerProcessor(intervalMs: Long, fn: String, ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedSample, WindowEmit] {
    @transient private var state: ValueState[TickerTwsState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TickerTwsState]("ticker",
        Encoders.product[TickerTwsState], ttl)

    override def handleInputRows(key: String, rows: Iterator[KeyedSample],
                                 timerValues: TimerValues): Iterator[WindowEmit] = {
      var st = if (state.exists()) state.get()
        else TickerTwsState(Vector.empty, -1L, false)
      rows.toSeq.sortBy(_.seq).iterator.filter(_.seq > st.lastSeq).foreach { s =>
        st = TickerTwsState(st.buf :+ s.value, s.seq, st.timerSet)
      }
      if (!st.timerSet) {
        getHandle.registerTimer(
          timerValues.getCurrentProcessingTimeInMs() + intervalMs)
        st = st.copy(timerSet = true)
      }
      state.update(st)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[WindowEmit] = {
      val st = if (state.exists()) state.get()
        else TickerTwsState(Vector.empty, -1L, false)
      val out =
        if (st.buf.nonEmpty)
          Iterator.single(WindowEmit(key, st.lastSeq,
            CountWindows.applyFnPublic(fn, st.buf), st.buf, st.buf.length.toLong))
        else Iterator.empty
      // one-shot arming: the NEXT sample re-arms the ticker rather than
      // the expiry itself. The reference ticks for the life of the window
      // (windows.go:419-423) but emits nothing when idle — observable
      // behavior is identical, and an idle stream can actually quiesce
      // (an unconditional re-register keeps the query permanently busy,
      // which deadlocks processAllAvailable-style barriers).
      state.update(TickerTwsState(Vector.empty, st.lastSeq, timerSet = false))
      out
    }
  }

  /** Processing-time ticker window (the reference's E9 wall-clock timer
    * emission, context.go:284-313): samples accumulate per key; every
    * `intervalMs` of PROCESSING time a registered timer fires and emits
    * the aggregate of the samples that arrived since the last tick
    * (nothing when idle). Built on transformWithState's native timer
    * facility — the modern analog the fMGWS operators approximate with
    * event-time panes. Non-deterministic by nature (wall clock), so the
    * correctness gate uses the event-time forms; this operator exists
    * for true processing-time deployments. */
  def processingTimeTicker(ds: Dataset[KeyedSample], intervalMs: Long,
                           fn: String, ttl: TTLConfig = TTLConfig.NONE)
                          (implicit spark: SparkSession): Dataset[WindowEmit] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new TickerProcessor(intervalMs, fn, ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
