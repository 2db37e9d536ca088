package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** At-ingest per-key rate capping — keep each key's FIRST `k` events in
  * (ts, id) order as they arrive, drop the rest. The streaming twin of
  * the batch per-domain cap ([[graft.operators.Sampling.domainCap]]
  * ranks by quality; this caps by arrival): the ingest-side defense
  * against a single hot key (one crawler loop, one spamming user)
  * flooding a 100 TB/day pipeline.
  *
  * Why this must be STATEFUL streaming: the keep/drop verdict for an
  * event depends on how many of its key's events have already arrived
  * across ALL previous micro-batches — a per-key counter in the state
  * store (O(1) per key: kept count + high-water mark, nothing buffered).
  * At scale, state is #keys × ~3 longs, RocksDB-capable, and emission
  * is append-mode (a verdict never revises).
  *
  * Determinism contract (what makes the gate oracle-checkable): events
  * arrive chunked by a ts-monotone expression, so a key's stream is
  * (ts, id)-ordered ACROSS chunks by construction, and each micro-batch
  * group is sorted on (ts, id) before folding — the kept set then equals
  * the batch `row_number() OVER (PARTITION BY key ORDER BY ts, id) <= k`
  * exactly. An event at/below the key's high-water mark arrived out of
  * chunk order (contract violation) and is dropped, same discipline as
  * the count-window operators' KeyedSample ordering rule.
  */
object StreamingCaps {

  /** One event: key is Option so a NULL key (unattributable events —
    * they exist in any real ingest) forms its own capped group instead
    * of crashing the encoder. */
  case class CapEvent(k: Option[Long], tsUs: Long, id: Long)

  /** Per-key state: events kept so far + the (ts, id) high-water mark. */
  case class CapState(kept: Long, lastTs: Long, lastId: Long)

  /** [[rateCapTtl]]'s input row: same as [[CapEvent]] but carrying the
    * REAL timestamp column — Spark's event-time timeout requires the
    * watermark-tagged attribute to reach the stateful operator, so the
    * caller watermarks `ts` and the operator derives the µs value
    * itself. */
  case class CapEventTs(k: Option[Long], ts: java.sql.Timestamp, id: Long)

  private def after(e: CapEvent, st: CapState): Boolean =
    e.tsUs > st.lastTs || (e.tsUs == st.lastTs && e.id > st.lastId)

  /** Pure fold shared by the streaming operator and its spec: sort the
    * batch's rows, drop out-of-order arrivals, keep while under `k`. */
  private[streaming] def capFold(rows: Seq[CapEvent], st0: CapState, k: Int)
      : (CapState, Vector[CapEvent]) = {
    var st = st0
    val out = Vector.newBuilder[CapEvent]
    rows.sortBy(e => (e.tsUs, e.id)).iterator
      .filter(e => after(e, st))
      .foreach { e =>
        if (st.kept < k) out += e
        st = CapState(math.min(st.kept + 1, k.toLong), e.tsUs, e.id)
      }
    (st, out.result())
  }

  /** Streaming first-k-per-key filter (append mode, NoTimeout — the
    * counter is 3 longs per key; use [[rateCapTtl]] if keys churn
    * unboundedly and a per-epoch cap is acceptable). */
  def rateCap(ds: Dataset[CapEvent], k: Int)
             (implicit spark: SparkSession): Dataset[CapEvent] = {
    require(k > 0, s"cap must be positive, got $k")
    import spark.implicits._
    ds.groupByKey(_.k)
      .flatMapGroupsWithState[CapState, CapEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[CapState]) =>
          val st0 = state.getOption
            .getOrElse(CapState(0L, Long.MinValue, Long.MinValue))
          val (st, out) = capFold(rows.toSeq, st0, k)
          state.update(st)
          out.iterator
      }
  }

  /** [[rateCap]] with EVENT-TIME TTL — the bounded-state form for
    * unbounded key churn (the r14 verdict's call-site gap, now an
    * operator): a key idle for `ttlMs` of event time is EVICTED from
    * the state store once the watermark passes its last event + ttl,
    * and its next event starts a FRESH EPOCH (the first k of the new
    * epoch are admitted again, and the high-water out-of-order
    * discipline restarts with it).
    *
    * Event-time timeout, not processing-time TTL, deliberately: an
    * at-ingest cap's "epoch" is a property of the DATA (a crawler that
    * goes quiet for a day is a new episode no matter how fast the
    * backlog replays), it is deterministic under any replay — same
    * chunks, same evictions, same kept set — and reprocessing yields
    * identical results, the same argument as event-time windows.
    * The caller must `withWatermark` the `ts` column (Spark enforces
    * this for EventTimeTimeout); state is evicted only when the
    * watermark passes last-event + ttl, so eviction is as conservative
    * as the lateness bound.
    *
    * State per LIVE key: the same 3 longs plus the timeout timestamp —
    * total state is now ∝ keys active within one ttl horizon, not all
    * keys ever seen. Output rows are [[CapEvent]]s, as from
    * [[rateCap]]. */
  def rateCapTtl(ds: Dataset[CapEventTs], k: Int, ttlMs: Long)
                (implicit spark: SparkSession): Dataset[CapEvent] = {
    require(k > 0, s"cap must be positive, got $k")
    require(ttlMs > 0, s"ttl must be positive, got $ttlMs")
    import spark.implicits._
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    ds.groupByKey(_.k)
      .flatMapGroupsWithState[CapState, CapEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[CapState]) =>
          if (state.hasTimedOut) {
            // idle past the ttl horizon: drop the counter; the key's
            // next arrival (a later batch by definition — timed-out
            // keys have no rows this batch) sees fresh state
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption
              .getOrElse(CapState(0L, Long.MinValue, Long.MinValue))
            val (st, out) = capFold(
              rows.map(e => CapEvent(e.k, us(e.ts), e.id)).toSeq, st0, k)
            state.update(st)
            // re-arm: evict once the watermark passes the key's newest
            // event + ttl (clamped above the current watermark — Spark
            // rejects timeouts at/behind it)
            val lastMs =
              if (st.lastTs == Long.MinValue) state.getCurrentWatermarkMs()
              else Math.floorDiv(st.lastTs, 1000L)
            state.setTimeoutTimestamp(
              math.max(lastMs + ttlMs, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  /** Deterministic replay of [[rateCap]] through a real Structured
    * Streaming file source (same plumbing contract as
    * [[StreamingSessions.sessionReplay]]). `chunk` must be ts-monotone:
    * every event in chunk c precedes every event in chunk c+1 on (ts,
    * id), which any chunk expression that is a function of ts alone
    * satisfies (ties share a chunk). Output: (k, tsUs, id) kept rows. */
  def capReplay(events: DataFrame, keyCol: String, tsCol: String,
                idCol: String, k: Int, chunk: Column, nChunks: Int,
                statePartitions: Int = 4)
               (implicit spark: SparkSession): DataFrame =
    ReplayHarness.replayToBatch(spark, events,
      Seq(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(idCol).cast("long").as("id")),
      chunk, nChunks, statePartitions, "graft_cap_") { stream =>
      import spark.implicits._
      rateCap(stream.as[CapEvent], k).toDF()
    }
}
