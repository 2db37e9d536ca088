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

  case class TumblingTwsState(buf: Vector[Double], lastSeq: Long)

  private class TumblingProcessor(size: Int, fn: String, ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedSample, WindowEmit] {
    @transient private var state: ValueState[TumblingTwsState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TumblingTwsState]("tumbling",
        Encoders.product[TumblingTwsState], ttl)

    override def handleInputRows(key: String, rows: Iterator[KeyedSample],
                                 timerValues: TimerValues): Iterator[WindowEmit] = {
      var st = if (state.exists()) state.get()
        else TumblingTwsState(Vector.empty, -1L)
      val out = Vector.newBuilder[WindowEmit]
      rows.toSeq.sortBy(_.seq).iterator.filter(_.seq > st.lastSeq).foreach { s =>
        val buf = st.buf :+ s.value
        if (buf.length == size) {
          out += WindowEmit(key, s.seq,
            CountWindows.applyFnPublic(fn, buf), buf, size.toLong)
          st = TumblingTwsState(Vector.empty, s.seq)
        } else st = TumblingTwsState(buf, s.seq)
      }
      state.update(st)
      out.result().iterator
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
}
