package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark-bounded event-time aggregation — the engine's late-data
  * story, and the mechanism that bounds streaming state at scale.
  *
  * The reference has no late-data handling at all: its time windows are
  * processing-time driven, so "late" cannot happen by construction
  * (reference: windows.go:419-423 — a timer tick snapshots whatever
  * arrived). This engine uses event time (deterministic, replayable),
  * which makes lateness a real phenomenon — and `withWatermark` is the
  * Spark-native contract for it: rows whose window closed before the
  * current watermark are dropped, and a window's aggregate is emitted
  * (append mode) exactly once, when the watermark passes its end. That
  * drop/emit pair is what keeps state finite on an unbounded stream:
  * without it a 100 TB/day stream accretes one state row per window-key
  * forever.
  *
  * [[tumblingAgg]] is the shared composition (spec-pinned with hand
  * vectors); [[lateDataReplay]] wraps it in a deterministic file-source
  * replay so the whole drop/emit behavior is checkable against batch SQL
  * — the CORRECTNESS gate for the engine's own "watermarks bound state"
  * claim.
  */
object Watermarks {

  /** Tumbling event-time aggregation under a watermark: count + sum per
    * window. Append-mode semantics when run on a stream: a row whose
    * window end <= current watermark is dropped; a window emits once the
    * watermark passes its end. */
  def tumblingAgg(stream: DataFrame, tsCol: String, valCol: String,
                  delay: String, size: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("sv"))

  /** Deterministic late-data replay: split `events` into `nChunks`
    * arrival micro-batches by the `chunk` column, replay them through a
    * real Structured Streaming file source (one chunk per drained
    * trigger, in chunk order), and return the append-mode emission set
    * of [[tumblingAgg]].
    *
    * Replay mechanics: every chunk is staged as ONE parquet file up
    * front (distributed writes; only file HANDLING touches the driver,
    * never rows), then moved into the watched directory one at a time,
    * draining the query (`processAllAvailable`) between moves. Each
    * drain runs the chunk's data micro-batch AND the watermark-advance
    * (no-data) micro-batch behind it, so the late-event filter for
    * chunk k sees watermark = max(event time over chunks < k) - delay.
    * (Spark ≥3.4 filters late events with the PREVIOUS batch's
    * watermark and evicts with the current one; the interleaved drain
    * is what pins "previous" to exactly the prior chunks — pre-staging
    * all files and rate-limiting with maxFilesPerTrigger would lag the
    * late filter one extra batch behind.) Both the drop rule and the
    * append-mode emission rule (window end <= final watermark) are then
    * pure functions of the data, which is what lets DuckDB batch SQL
    * oracle-check real streaming semantics.
    *
    * At 100 TB this shape is the production one: a file/object-store
    * drop zone streamed per-trigger, watermark bounding both state size
    * and output latency. The memory sink here only holds the final
    * per-window aggregates (one row per window), not the stream. */
  def lateDataReplay(events: DataFrame, tsCol: String, valCol: String,
                     chunk: Column, nChunks: Int, delay: String,
                     size: String, statePartitions: Int = 4)
                    (implicit spark: SparkSession): DataFrame =
    // stage/move/drain mechanics and the scoped-session memory-sink
    // plumbing live in ChunkedReplay / ReplayHarness (shared with
    // StreamingSessions.sessionReplay and ScaleProbe)
    ReplayHarness.replayToBatch(spark, events,
      Seq(col(tsCol).as("ts"), col(valCol).cast("double").as("value")),
      chunk, nChunks, statePartitions, "graft_wm_")(
      stream => tumblingAgg(stream, "ts", "value", delay, size))

  /** KEYED sliding (paned) event-time aggregation under a watermark —
    * the streaming composition of the reference's timeSliding window
    * (W4, windows.go:280-393) with its keyed variant (W5,
    * windows.go:469-479): count + sum per (window, key). Sliding
    * windows make lateness PER WINDOW INSTANCE: a late row's older
    * pane may already be expired (dropped) while its newer pane is
    * still open and absorbs the row — Spark expands the row to its
    * size/slide window instances and filters each against the
    * watermark independently, which is exactly what bounds state on
    * an unbounded keyed stream. */
  def slidingKeyedAgg(stream: DataFrame, tsCol: String, keyCol: String,
                      valCol: String, delay: String, size: String,
                      slide: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size, slide), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("sv"))

  /** Deterministic chunked replay of [[slidingKeyedAgg]] — same
    * mechanics as [[lateDataReplay]], so the keyed-sliding drop/emit
    * rules are pure functions of the data and batch-SQL checkable. */
  def keyedSlidingReplay(events: DataFrame, tsCol: String, keyCol: String,
                         valCol: String, chunk: Column, nChunks: Int,
                         delay: String, size: String, slide: String,
                         statePartitions: Int = 4)
                        (implicit spark: SparkSession): DataFrame =
    ReplayHarness.replayToBatch(spark, events,
      Seq(col(tsCol).as("ts"), col(keyCol).cast("string").as("key"),
        col(valCol).cast("double").as("value")),
      chunk, nChunks, statePartitions, "graft_ks_")(
      stream => slidingKeyedAgg(stream, "ts", "key", "value", delay,
        size, slide))
}
