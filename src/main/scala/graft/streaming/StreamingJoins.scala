package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the one stateful
  * Structured Streaming operator family the engine had not yet
  * exercised (everything streaming so far is aggregation,
  * deduplication, sessionization, or stream-STATIC joins). The
  * reference engine cannot express this at all: its join-like behavior
  * is channel fan-in into a shared pipeline (action.go:107-115), which
  * interleaves rows rather than correlating them; correlating two live
  * event streams by key within a time bound is the Spark-native
  * upgrade of that pattern.
  *
  * Semantics (inner, event-time bounded): emit (l, r) when
  * `l.key = r.key` and `r.ts ∈ [l.ts, l.ts + within]`. Both inputs
  * carry watermarks, and the time-bound condition is what lets Spark
  * derive a state-eviction rule for BOTH sides: a buffered left row is
  * dropped once the watermark passes `l.ts + within` (no future right
  * row can match it), a buffered right row once the watermark passes
  * `r.ts` (no future left row can precede it). That eviction is the
  * 100 TB story — without the time bound, a stream-stream join buffers
  * both streams forever; with it, state is bounded by
  * rate × (within + delay) rows per side regardless of stream length.
  *
  * Emission-set parity with batch: an inner interval join emits
  * exactly the batch join result as long as no row arrives AFTER its
  * partner's state was evicted. [[intervalJoinReplay]] replays both
  * sides in lockstep chunks ordered by event time (one
  * [[ReplayChunks.byTime]] axis over the union), so when a row of
  * chunk k arrives, the watermark is still below every chunk-k
  * timestamp minus nothing — formally wm = maxTs(chunks < k) − delay
  * < chunkStart(k) ≤ partner.ts for any partner in chunk k or later,
  * and a partner in an earlier chunk was buffered while its eviction
  * bound (its own ts, or ts + within on the left) is ≥ this row's ts
  * − within-window reach > wm. Hence nothing is dropped for ANY delay
  * ≥ 0, state is genuinely evicted as the replay advances, and the
  * emission set equals the DuckDB interval join — which is what makes
  * a real stream-stream join oracle-checkable.
  */
object StreamingJoins {

  /** The join composition on already-shaped streams: `left` must carry
    * (l_ts, l_key, l_id), `right` (r_ts, r_key, r_id) — fixed names so
    * the watermark/condition wiring is not caller-twistable into a
    * shape whose state never evicts. Null keys never match (SQL
    * equality), mirroring the batch interval join.
    *
    * `joinType` "inner", "left_outer", "right_outer" or "full_outer".
    * The outer forms add the append-mode subtlety this engine pins in
    * spec + oracle: an UNMATCHED row's null-padded result is emitted
    * only when its state is EVICTED — only then is "no partner will
    * come" provable — so rows still alive in state when the stream
    * ends have emitted nothing. The eviction bound differs per side
    * because the time condition is asymmetric (r_ts ∈ [l_ts,
    * l_ts + within]): a LEFT row is unmatchable once the watermark
    * strictly passes l_ts + within, a RIGHT row once it strictly
    * passes r_ts itself (any later-arriving left row has l_ts above
    * the watermark, i.e. past r_ts — pinned in StreamingJoinsSpec).
    * Batch replay rule: null row iff no match AND that side's bound
    * < final watermark; full_outer applies both rules. */
  def intervalJoin(left: DataFrame, right: DataFrame, delay: String,
                   within: String, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "right_outer", "full_outer")
        .contains(joinType),
      s"joinType must be inner/left_outer/right_outer/full_outer, got $joinType")
    val l = left.withWatermark("l_ts", delay)
    val r = right.withWatermark("r_ts", delay)
    // The null guard is load-bearing for FULL OUTER only: the
    // streaming symmetric hash join matches buffered rows by BINARY
    // key equality (grouping semantics — null == null), and unlike the
    // inner/left/right plans, full outer cannot prune null-key inputs,
    // so without it two null-key rows inside the time bound emit as a
    // MATCH (caught by the null sweep; pinned in StreamingJoinsSpec).
    // SQL equality must win: null keys never match, they surface as
    // each side's null-padded EVICTION rows — which is why the guard
    // must reference BOTH sides (binary equality already proves
    // both-null or equal-non-null at match time, so this exactly
    // rejects the null-null pair). A single-side `l_key.isNotNull`
    // conjunct is split off as a pre-state filter and flips null-key
    // rows to IMMEDIATE null emission, silently changing the pinned
    // eviction timing.
    l.join(r,
      col("l_key") === col("r_key") &&
        !(col("l_key").isNull && col("r_key").isNull) &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL '$within'"),
      joinType)
  }

  /** Deterministic chunked replay of [[intervalJoin]] over two event
    * subsets — same stage/move/drain mechanics as
    * [[Watermarks.lateDataReplay]], generalized to two file sources
    * advanced in lockstep ([[ReplayHarness.replayToBatchN]]). `chunk`
    * must be ONE column expression derived from the shared time axis
    * (build it with [[ReplayChunks.byTime]] on the union frame) so a
    * chunk index means the same time range on both inputs.
    *
    * Output: (l_id, r_id, key, lag_us) — the matched pair, its key,
    * and the event-time gap in exact integer microseconds (no
    * floating-point timestamp math anywhere). `key` is
    * coalesce(l_key, r_key) so right-padded outer rows still carry
    * their key (identical to l_key on every matched row). */
  def intervalJoinReplay(left: DataFrame, right: DataFrame, tsCol: String,
                         keyCol: String, idCol: String, chunk: Column,
                         nChunks: Int, delay: String, within: String,
                         statePartitions: Int = 4,
                         joinType: String = "inner")
                        (implicit spark: SparkSession): DataFrame = {
    def payload(p: String) = Seq(
      col(tsCol).as(s"${p}_ts"),
      col(keyCol).cast("long").as(s"${p}_key"),
      col(idCol).cast("long").as(s"${p}_id"))
    ReplayHarness.replayToBatchN(spark,
      Seq((left, payload("l"), chunk), (right, payload("r"), chunk)),
      nChunks, statePartitions, "graft_ssj_") { streams =>
      intervalJoin(streams.head, streams(1), delay, within, joinType)
        .select(col("l_id"), col("r_id"),
          coalesce(col("l_key"), col("r_key")).as("key"),
          (unix_micros(col("r_ts").cast("timestamp")) -
            unix_micros(col("l_ts").cast("timestamp"))).as("lag_us"))
    }
  }
}
