package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class StreamingSessionsSpec extends SparkSpec {

  // (key, ts seconds, value, chunk)
  private def mk(rows: Seq[(String, Long, Double, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "sec", "value", "chunk")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  private def replay(rows: Seq[(String, Long, Double, Int)], nChunks: Int) = {
    implicit val ss: SparkSession = spark
    StreamingSessions.sessionReplay(mk(rows), "k", "ts", "value",
        col("chunk"), nChunks, "300 seconds", "600 seconds")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  test("append mode emits exactly the sessions the watermark closed") {
    // gap 600 s, delay 300 s; flush event at 60000 s drives the final
    // watermark to 59700 s. u9's own session (end 60600) stays open.
    val got = replay(Seq(
      ("u1", 0L, 1.0, 0), ("u1", 300L, 2.0, 0),
      ("u2", 3000L, 5.0, 0),
      ("u1", 6000L, 3.0, 1),
      ("u9", 60000L, 9.0, 1)), 2)
    assert(got == Set(
      ("u1", 0L, 2L, 3.0),
      ("u1", 6000000L, 1L, 3.0),
      ("u2", 3000000L, 1L, 5.0)))
  }

  test("events behind the watermark are dropped, not merged") {
    // chunk 0's flush pushes the watermark to 59700 s; chunk 1's u1@300
    // is then late and must NOT extend u1's already-closed session
    val got = replay(Seq(
      ("u1", 0L, 1.0, 0), ("u9", 60000L, 9.0, 0),
      ("u1", 300L, 2.0, 1)), 2)
    assert(got == Set(("u1", 0L, 1L, 1.0)))
  }

  test("kill/restart recovery: checkpointed sessions emit exactly once") {
    // Fault-tolerance vector for the session-window state operator: the
    // query is killed after chunk 1's files are staged but unprocessed,
    // and a new incarnation restarts from checkpoint + parquet sink
    // alone. The end state must equal the uninterrupted run: u1's
    // session (emitted before the kill) is not re-emitted, u2's session
    // OPEN in state at the kill merges its post-restart event, and the
    // persisted watermark keeps dropping late events across the crash.
    val s = spark
    import s.implicits._
    val events = Seq(
      // chunk 0: u1 session [0,300]; u2 opens; flushA@3000 -> wm 2700
      // closes u1 (end 900 <= 2700) pre-kill
      ("u1", 0L, 1.0, 0), ("u1", 300L, 2.0, 0), ("u2", 3000L, 5.0, 0),
      // chunk 1 (arrives across the kill): u2 extends; u1@50 is late
      // (50 < wm 2700) and must stay dropped after the restart
      ("u2", 3200L, 7.0, 1), ("u1", 50L, 100.0, 1),
      // chunk 2: flush to wm 59700 -> closes u2 [3000,3200]
      ("u9", 60000L, 9.0, 2))
      .toDF("k", "sec", "value", "chunk")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val replay = new ChunkedReplay(events,
      Seq(col("k"), col("ts"), col("value")), col("chunk"), 3)
    val out = replay.root.resolve("out")
    val ckpt = replay.root.resolve("ckpt")
    def start() = StreamingSessions.sessionAgg(
        s.readStream.schema(replay.schema).parquet(replay.streamDir.toString),
        "k", "ts", "value", "300 seconds", "600 seconds")
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    try {
      val q1 = start()
      replay.moveChunk(0)
      q1.processAllAvailable()
      replay.moveChunk(1) // staged but NOT drained before the kill
      q1.stop()
      val q2 = start()    // restart from on-disk state alone
      q2.processAllAvailable()
      replay.moveChunk(2)
      q2.processAllAvailable()
      q2.stop()
      val got = s.read.parquet(out.toString)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == Set(
        ("u1", 0L, 2L, 3.0),          // emitted once, before the kill
        ("u2", 3000000L, 2L, 12.0)))  // merged across the restart
    } finally replay.cleanup()
  }

  test("sessions spanning chunk boundaries merge in state") {
    // u1's events arrive 350 s apart across chunks (within the 600 s
    // gap): one merged session of 3 events, closed by the flush
    val got = replay(Seq(
      ("u1", 0L, 1.0, 0), ("u1", 350L, 2.0, 1),
      ("u1", 700L, 4.0, 2), ("u9", 60000L, 9.0, 3)), 4)
    assert(got == Set(("u1", 0L, 3L, 7.0)))
  }
}
