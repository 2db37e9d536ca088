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

  test("sessions spanning chunk boundaries merge in state") {
    // u1's events arrive 350 s apart across chunks (within the 600 s
    // gap): one merged session of 3 events, closed by the flush
    val got = replay(Seq(
      ("u1", 0L, 1.0, 0), ("u1", 350L, 2.0, 1),
      ("u1", 700L, 4.0, 2), ("u9", 60000L, 9.0, 3)), 4)
    assert(got == Set(("u1", 0L, 3L, 7.0)))
  }
}
