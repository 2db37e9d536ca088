package graft.operators

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  // user A: 0/30/60 s, then 160 s = EXACTLY gap (100 s) after 60 ->
  // MERGES (session_window's inclusive boundary), then 261 s = 101 s
  // after 160 -> strictly over the gap, new session; user B: 10/100 s
  // (90 < gap, one session)
  private def mkEvents(parts: Int) = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", 0L, 1L, 1.0), ("A", 30L, 2L, 2.0), ("A", 60L, 3L, 3.0),
      ("A", 160L, 4L, 4.0), ("A", 261L, 5L, 5.0),
      ("B", 10L, 6L, 10.0), ("B", 100L, 7L, 20.0))
      .toDF("k", "sec", "eid", "v")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .repartition(parts)
  }

  test("assign splits only on gaps STRICTLY over the threshold " +
      "(session_window boundary rule)") {
    val got = Sessionize.assign(mkEvents(3), "k", "ts", 100L, Seq("eid"))
      .select("k", "eid", "session_idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      // 160 is exactly 100 s after 60: the boundary event MERGES
      // (session_window extends the session when the new event lands
      // exactly at prev_end = prev_ts + gap)
      ("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 0L), ("A", 4L, 0L),
      // 261 is 101 s after 160: strictly over the gap, new session
      ("A", 5L, 1L),
      // B's 90 s gap is < 100 s: one session
      ("B", 6L, 0L), ("B", 7L, 0L)))
  }

  test("summarize emits one row per session with exact bounds and sums") {
    val got = Sessionize.summarize(mkEvents(2), "k", "ts", 100L, "v", Seq("eid"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == Set(
      ("A", 0L, 0L, 160000L, 4L, 10.0),
      ("A", 1L, 261000L, 261000L, 1L, 5.0),
      ("B", 0L, 10000L, 100000L, 2L, 30.0)))
  }

  test("exact-gap boundary parity with session_window (both directions)") {
    // the divergence only exact-gap timestamp pairs can expose: Spark's
    // session_window MERGES an event landing exactly at prev_ts + gap
    // (verified here against the real operator, not assumed), and one
    // microsecond over splits
    val s = spark
    import s.implicits._
    val ev = Seq(
      ("M", 0L, 1L), ("M", 100000000L, 2L),          // exactly 100 s
      ("S", 0L, 3L), ("S", 100000001L, 4L))          // 100 s + 1 µs
      .toDF("k", "usec", "eid")
      .withColumn("ts", timestamp_micros(col("usec"))).drop("usec")
    val want = ev
      .groupBy(col("k"), session_window(col("ts"), "100 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), unix_millis(col("session_window.start")).as("start_ms"),
        col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Sessionize.summarize(ev, "k", "ts", 100L, "eid", Seq("eid"))
      .select(col("k"), col("start_ms"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(want == Set(("M", 0L, 2L), ("S", 0L, 1L), ("S", 100000L, 1L)),
      s"session_window's own boundary behavior changed: $want")
    assert(got == want)
  }

  test("session indices are invariant under partition layout") {
    val want = Sessionize.assign(mkEvents(1), "k", "ts", 100L, Seq("eid"))
      .select("k", "eid", "session_idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (p <- Seq(2, 5, 7)) {
      val got = Sessionize.assign(mkEvents(p), "k", "ts", 100L, Seq("eid"))
        .select("k", "eid", "session_idx").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"parts=$p")
    }
  }

  test("summarize plans exactly one hash exchange (window shuffle reused)") {
    val df = Sessionize.summarize(
      Tables.events(spark, sf()), "user_id", "ts", 43200L, "value",
      Seq("event_id"))
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected the groupBy to reuse the window's shuffle:\n$p")
  }

  test("summaries agree with Spark's independent session_window semantics") {
    // Same boundary rule, implemented by a different engine path (the
    // streaming-capable session-window operator) — parity on the real
    // events table pins the semantics end-to-end.
    val ev = Tables.events(spark, sf())
    val want = ev
      .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Sessionize.summarize(ev, "user_id", "ts", 43200L, "value",
        Seq("event_id"))
      .select(col("user_id"), col("start_ms"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
