package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class StreamingJoinsSpec extends SparkSpec {

  // All fixtures sit on a base offset well past epoch 0: Spark's
  // stream-stream join state machinery starts with watermark = 0 (epoch)
  // and its input filter is inclusive at that value, so a row whose
  // event time is EXACTLY 1970-01-01T00:00:00 is dropped before it can
  // buffer (pinned below). Real event time never sits on epoch 0; the
  // offset keeps the hand vectors out of the degenerate boundary.
  private val B = 1000000L

  // (k, sec, id, chunk)
  private def mk(rows: Seq[(Long, Long, Long, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "sec", "id", "chunk")
      .withColumn("ts", timestamp_seconds(col("sec") + B)).drop("sec")
  }

  private def replay(left: Seq[(Long, Long, Long, Int)],
                     right: Seq[(Long, Long, Long, Int)],
                     nChunks: Int, delay: String = "300 seconds",
                     within: String = "600 seconds") = {
    implicit val ss: SparkSession = spark
    StreamingJoins.intervalJoinReplay(mk(left), mk(right), "ts", "k", "id",
        col("chunk"), nChunks, delay, within)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("inner interval join matches on key AND the time bound only") {
    val got = replay(
      left = Seq((1L, 100L, 10L, 0), (1L, 5000L, 11L, 1), (2L, 100L, 20L, 0)),
      right = Seq(
        (1L, 400L, 50L, 0), // inside [100, 700] -> matches 10
        (1L, 900L, 51L, 0), // after 10's bound, before 11 -> no match
        (2L, 900L, 60L, 0), // k=2 but 200 s past 20's bound -> no match
        (3L, 100L, 70L, 0)), // no left row with k=3
      nChunks = 2)
    assert(got == Set((10L, 50L, 1L, 300000000L)))
  }

  test("a partner arriving a chunk later, inside the bound, still matches") {
    // left@0 buffers through chunk 0's watermark advance and matches the
    // right row arriving in chunk 1 at +550 s (within 600 s); the exact
    // 0-lag pair at 1000 s pins the closed lower bound r_ts >= l_ts
    val got = replay(
      left = Seq((1L, 0L, 10L, 0), (9L, 1000L, 99L, 1)),
      right = Seq((1L, 550L, 50L, 1), (9L, 1000L, 98L, 1)),
      nChunks = 2)
    assert(got == Set((10L, 50L, 1L, 550000000L), (99L, 98L, 9L, 0L)))
  }

  test("lockstep time-ordered replay emits exactly the batch interval join") {
    // dense deterministic fixture, 4 time-ordered chunks (sec / 750),
    // watermark delay much smaller than the span so state REALLY evicts
    // mid-replay — the emission set must still equal the batch join
    val left = (0L until 60L).map { i =>
      val sec = (i * 173L) % 3000L
      ((i % 7L) + 1L, sec, 100L + i, (sec / 750L).toInt)
    }
    val right = (0L until 60L).map { i =>
      val sec = (i * 97L + 41L) % 3000L
      ((i % 7L) + 1L, sec, 500L + i, (sec / 750L).toInt)
    }
    val got = replay(left, right, nChunks = 4, delay = "60 seconds")
    val expected = (for {
      (lk, ls, li, _) <- left
      (rk, rs, ri, _) <- right
      if lk == rk && rs >= ls && rs <= ls + 600L
    } yield (li, ri, lk, (rs - ls) * 1000000L)).toSet
    assert(got == expected)
    assert(expected.size > 50) // the fixture is genuinely dense
  }

  test("left-outer: null rows emit ONLY on eviction, strict boundary") {
    // Append-mode outer semantics: an unmatched left row emits its
    // null-padded result only when the watermark proves no partner can
    // come — strictly past l_ts + within. Final watermark here is
    // min(maxTs both inputs) - delay = B+1700:
    //   id 10 (0+600  < 1700)  -> evicted, null row emitted
    //   id 30 (1100+600 == 1700) -> boundary is STRICT: still in state
    //   id 20/80 (alive)        -> nothing emitted
    // and matches are exactly the inner join's.
    implicit val ss: SparkSession = spark
    val left = Seq(
      (1L, 0L, 10L, 0), (3L, 1100L, 30L, 1), (2L, 1500L, 20L, 1),
      (4L, 900L, 40L, 1), (8L, 2000L, 80L, 1))
    val right = Seq((4L, 1000L, 44L, 1), (9L, 2000L, 90L, 1))
    val got = StreamingJoins.intervalJoinReplay(mk(left), mk(right),
        "ts", "k", "id", col("chunk"), 2, "300 seconds", "600 seconds",
        joinType = "left_outer")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    assert(got == Set((40L, 44L, 4L, 100000000L), (10L, -1L, 1L, -1L)))
  }

  test("right-outer: eviction bound is r_ts itself, strict boundary") {
    // The time condition is asymmetric, so the right side's eviction
    // bound differs from the left's: a buffered right row can only
    // match left rows with l_ts ∈ [r_ts - within, r_ts], and any left
    // row arriving after the watermark passes r_ts is above r_ts — so
    // the null-padded right row emits iff unmatched AND r_ts < final
    // watermark, STRICTLY. Final watermark = min(maxTs both) - delay
    // = B+1700:
    //   id 10 (ts 0    < 1700)  -> evicted, null row
    //   id 20 (ts 1500 < 1700)  -> evicted, null row
    //   id 30 (ts 1700 == 1700) -> strict: still in state, nothing
    //   id 90 (ts 2000, alive)  -> nothing
    implicit val ss: SparkSession = spark
    val left = Seq((4L, 900L, 40L, 1), (8L, 2000L, 80L, 1))
    val right = Seq(
      (1L, 0L, 10L, 0), (2L, 1500L, 20L, 1), (3L, 1700L, 30L, 1),
      (4L, 1000L, 44L, 1), (9L, 2000L, 90L, 1))
    val got = StreamingJoins.intervalJoinReplay(mk(left), mk(right),
        "ts", "k", "id", col("chunk"), 2, "300 seconds", "600 seconds",
        joinType = "right_outer")
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    assert(got == Set((40L, 44L, 4L, 100000000L),
      (-1L, 10L, 1L, -1L), (-1L, 20L, 2L, -1L)))
  }

  test("full-outer applies each side's own eviction rule") {
    // Union of the two outer behaviors on one fixture: left id 10
    // evicts at l_ts + within < wm, right id 55 at r_ts < wm, the
    // matched pair emits once, and alive rows on both sides emit
    // nothing. wm = min(B+2000, B+2000) - 300 = B+1700.
    implicit val ss: SparkSession = spark
    val left = Seq(
      (1L, 0L, 10L, 0),     // 0+600 < 1700 -> left null row
      (2L, 1500L, 20L, 1),  // 1500+600 > 1700 -> alive, nothing
      (4L, 900L, 40L, 1), (8L, 2000L, 80L, 1))
    val right = Seq(
      (5L, 300L, 55L, 0),   // 300 < 1700 -> right null row
      (6L, 1800L, 66L, 1),  // alive -> nothing
      (4L, 1000L, 44L, 1), (9L, 2000L, 90L, 1))
    val got = StreamingJoins.intervalJoinReplay(mk(left), mk(right),
        "ts", "k", "id", col("chunk"), 2, "300 seconds", "600 seconds",
        joinType = "full_outer")
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    assert(got == Set((40L, 44L, 4L, 100000000L),
      (10L, -1L, 1L, -1L), (-1L, 55L, 5L, -1L)))
  }

  test("full-outer: null keys never match each other (binary-match trap)") {
    // Spark's symmetric hash join matches state rows by BINARY key
    // equality, and full outer cannot prune null-key inputs the way
    // inner/left/right do — without the explicit isNotNull residual in
    // intervalJoin these two rows emit as a MATCH (found by the null
    // sweep). SQL equality must hold in every mode: both surface as
    // their own side's null-padded eviction rows instead.
    // wm = min(B+2000, B+2000) - 300 = B+1700; 100+600 < 1700 and
    // 200 < 1700, so both evict and emit.
    implicit val ss: SparkSession = spark
    val s = spark
    import s.implicits._
    def mkOpt(rows: Seq[(Option[Long], Long, Long, Int)]) =
      rows.toDF("k", "sec", "id", "chunk")
        .withColumn("ts", timestamp_seconds(col("sec") + B)).drop("sec")
    val left = Seq((Option.empty[Long], 100L, 10L, 0), (Some(8L), 2000L, 80L, 1))
    val right = Seq((Option.empty[Long], 200L, 50L, 0), (Some(9L), 2000L, 90L, 1))
    val got = StreamingJoins.intervalJoinReplay(mkOpt(left), mkOpt(right),
        "ts", "k", "id", col("chunk"), 2, "300 seconds", "600 seconds",
        joinType = "full_outer")
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    assert(got == Set((10L, -1L, -1L, -1L), (-1L, 50L, -1L, -1L)))
  }

  test("null-key rows never match but follow the same eviction rule") {
    // SQL equality: a null key matches nothing on either side. In the
    // left-outer form a null-key left row still buffers and emits its
    // null-padded result on eviction — same strict l_ts+within < wm
    // rule as keyed rows (the oracle's unmatched-set replay needs no
    // key filter). Pinned here because the null sweep injects null
    // user_ids into exactly this gate.
    implicit val ss: SparkSession = spark
    val s = spark
    import s.implicits._
    val left = Seq(
      (Option.empty[Long], 0L, 10L, 0),    // evicted -> null row
      (Option.empty[Long], 1500L, 20L, 1), // alive -> nothing
      (Some(8L), 2000L, 80L, 1))           // wm flush; alive
    val right = Seq((Some(9L), 2000L, 90L, 1))
    def mkOpt(rows: Seq[(Option[Long], Long, Long, Int)]) =
      rows.toDF("k", "sec", "id", "chunk")
        .withColumn("ts", timestamp_seconds(col("sec") + B)).drop("sec")
    val got = StreamingJoins.intervalJoinReplay(mkOpt(left), mkOpt(right),
        "ts", "k", "id", col("chunk"), 2, "300 seconds", "600 seconds",
        joinType = "left_outer")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    assert(got == Set((10L, -1L, -1L, -1L)))
  }

  test("epoch-0 event time is the one degenerate boundary (pinned)") {
    // Spark's initial join watermark is 0 and the input filter is
    // inclusive there: an event at exactly epoch 0 never buffers. This
    // pin documents the boundary so a future Spark upgrade changing it
    // is noticed; production event time (years past 1970) cannot hit it.
    implicit val ss: SparkSession = spark
    val s = spark
    import s.implicits._
    def at(rows: Seq[(Long, Long, Long, Int)]) =
      rows.toDF("k", "sec", "id", "chunk")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = StreamingJoins.intervalJoinReplay(
        at(Seq((1L, 0L, 10L, 0))), at(Seq((1L, 400L, 50L, 0))),
        "ts", "k", "id", col("chunk"), 1, "300 seconds", "600 seconds")
      .collect()
    assert(got.isEmpty)
  }
}
