package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming sessionization — `session_window` under a watermark, the
  * unbounded-stream analogue of [[graft.operators.Sessionize]] (same
  * boundary rule: a gap of exactly the configured duration starts a new
  * session; SessionizeSpec pins the two implementations against each
  * other on the batch side).
  *
  * Why this exists at scale: batch sessionization re-sorts a key's whole
  * history per run; on an unbounded stream the session-window state
  * operator keeps ONLY the open sessions per key, merges them as events
  * arrive, and the watermark both drops too-late events and closes
  * (emits + evicts) sessions whose end has passed — state stays
  * proportional to concurrently-open sessions, not history. That
  * drop/emit/evict behavior is a pure function of the data under the
  * deterministic chunked replay, which is what lets DuckDB batch SQL
  * oracle-check it (gate `q_sessionize_stream`).
  */
object StreamingSessions {

  /** Per-key session aggregation under a watermark. Append-mode
    * semantics on a stream: a session emits once the watermark passes
    * its end (`last event + gap`), and events older than the watermark
    * are dropped. Output: key, session start (epoch ms), event count,
    * value sum rounded to 4 decimals. */
  def sessionAgg(stream: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, delay: String, gap: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valCol)), 4).as("total_value"))
      .select(col(keyCol),
        unix_millis(col("session_window.start")).as("start_ms"),
        col("n_events"), col("total_value"))

  /** Deterministic replay of [[sessionAgg]] through a real Structured
    * Streaming file source: stage `events` into `nChunks` arrival
    * batches by the `chunk` column, move one chunk per drained trigger
    * in chunk order, and return the append-mode emission set. Same
    * plumbing contract as [[Watermarks.lateDataReplay]] (scoped session
    * with the caller's runtime conf replayed, state-sized shuffle
    * partitions, memory sink dropped after materialization). */
  def sessionReplay(events: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, chunk: Column, nChunks: Int,
                    delay: String, gap: String, statePartitions: Int = 4)
                   (implicit spark: SparkSession): DataFrame =
    ReplayHarness.replayToBatch(spark, events,
      Seq(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(valCol).cast("double").as("value")),
      chunk, nChunks, statePartitions, "graft_sw_")(
      stream => sessionAgg(stream, "k", "ts", "value", delay, gap))
}
