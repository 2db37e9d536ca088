package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-log primitive for both
  * product analytics and training-data curation (chat transcripts,
  * interaction logs, and clickstreams are all grouped into conversations
  * or visits before filtering, dedup, or sampling).
  *
  * A session is a maximal run of one key's events in which consecutive
  * events (in `(ts, tieCols)` order) are AT MOST `gapSeconds` apart —
  * the same boundary rule as Structured Streaming's `session_window`,
  * which MERGES an event landing exactly at the previous session's end
  * (`prev_ts + gap`); only a STRICTLY larger gap splits. (Empirically
  * verified against session_window at the exact-gap boundary in
  * SessionizeSpec — the round-14 event-stream sweep caught this
  * operator splitting at `>=` while session_window merges at `==`,
  * a divergence only exact-gap timestamp pairs can expose.) The
  * reference engine has no batch sessionization
  * surface (its windows are count/time tumbling+sliding,
  * /root/reference/pipeline/windows); this extends the LLM-pipeline
  * layer the same way [[Dedup]] and [[Sampling]] do. The streaming
  * analogue is Structured Streaming's `session_window`, pinned against
  * this batch operator in SessionizeSpec.
  *
  * Scale shape: ONE hash shuffle on the session key, a per-key sort for
  * the lag/cumulative-sum window, and nothing else — `summarize`'s
  * `groupBy(key, session_idx)` is satisfied by the window's existing
  * hash distribution on `key` (a subset of the grouping keys), so no
  * second Exchange is planned (spec-pinned). Per-key state is the sort
  * buffer only; at 100 TB the cost is the shuffle of (key, ts, carried
  * columns), never a cross-key structure.
  */
object Sessionize {

  /** Microsecond event time for the GAP comparison — Spark timestamps
    * are µs-precision, and `session_window`'s range-overlap rule
    * compares at full precision, so a millisecond-truncated gap would
    * split sub-ms-close boundary pairs that session_window merges (a
    * one-directional, data-dependent divergence). An external SQL
    * engine reproduces this with `epoch_us(ts)`. */
  private def us(tsCol: String): Column = unix_micros(col(tsCol))

  /** Millisecond event time for OUTPUT columns (truncation on output
    * only — never used in a comparison). */
  private def ms(tsCol: String): Column = unix_millis(col(tsCol))

  /** Event-level session assignment: input columns + `session_idx`, the
    * 0-based per-key session ordinal. Deterministic for a given
    * `(ts, tieCols)` total order per key — pass tie columns whenever ts
    * alone can repeat within a key, or the break positions (and thus the
    * indices) would depend on partition layout. */
  def assign(events: DataFrame, keyCol: String, tsCol: String,
             gapSeconds: Long, tieCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val order = col(tsCol).asc +: tieCols.map(col(_).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    // first event per key: lag is null, null-comparison falls to
    // otherwise(0) — session_idx starts at 0 without a special case
    // STRICT inequality: an event exactly gapSeconds after its
    // predecessor still extends the session (session_window's merge
    // rule — see the class doc)
    val break = when(
      us(tsCol) - lag(us(tsCol), 1).over(w) > gapSeconds * 1000000L,
      lit(1L)).otherwise(lit(0L))
    events.withColumn("session_idx",
      sum(break).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session summaries: one row per (key, session) with start/end event
    * time (epoch ms), event count, and the sum of `valCol` rounded to 4
    * decimals. Reuses `assign`'s shuffle — the groupBy keys are a
    * superset of the window partition key, so Catalyst plans no second
    * Exchange. */
  def summarize(events: DataFrame, keyCol: String, tsCol: String,
                gapSeconds: Long, valCol: String,
                tieCols: Seq[String] = Nil): DataFrame =
    assign(events, keyCol, tsCol, gapSeconds, tieCols)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(ms(tsCol)).as("start_ms"),
        max(ms(tsCol)).as("end_ms"),
        count(lit(1)).as("n_events"),
        round(sum(col(valCol)), 4).as("total_value"))
}
