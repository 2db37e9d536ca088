package graft.windows

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** True Structured Streaming execution: state must carry across
  * micro-batches (the reference's stall/resume semantics, E6 — a window
  * only emits once filled, even when its samples span arrivals). */
class StreamingWindowsSpec extends SparkSpec {
  import CountWindows._

  test("tumbling count window state spans micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val ss: org.apache.spark.sql.SparkSession = s
    val input = MemoryStream[KeyedSample]
    val query = tumblingStream(input.toDS(), 3, "sum")
      .writeStream.format("memory").queryName("tumbling_mb")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two samples -> window not full, nothing emitted (stall)
      input.addData(KeyedSample("a", 1, 1.0), KeyedSample("a", 2, 2.0))
      query.processAllAvailable()
      assert(s.sql("SELECT * FROM tumbling_mb").count() == 0)
      // batch 2: third sample completes the window -> resume/emit
      input.addData(KeyedSample("a", 3, 3.0))
      query.processAllAvailable()
      val rows = s.sql("SELECT key, emitAtSeq, result FROM tumbling_mb")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("a", 3L, 6.0)))
      // batch 3: next window fills across one batch; other key independent
      input.addData(KeyedSample("a", 4, 4.0), KeyedSample("a", 5, 5.0),
        KeyedSample("a", 6, 6.0), KeyedSample("b", 1, 10.0))
      query.processAllAvailable()
      val all = s.sql("SELECT key, result FROM tumbling_mb ORDER BY key, result")
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(all.toSeq == Seq(("a", 6.0), ("a", 15.0)))
    } finally query.stop()
  }

  test("sliding count window ring survives micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val ss: org.apache.spark.sql.SparkSession = s
    val input = MemoryStream[KeyedSample]
    val query = slidingStream(input.toDS(), 3, 2, "avg")
      .writeStream.format("memory").queryName("sliding_mb")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(KeyedSample("a", 1, 1.0), KeyedSample("a", 2, 2.0))
      query.processAllAvailable()
      assert(s.sql("SELECT * FROM sliding_mb").count() == 0)
      // sample 3 fills the ring (1,2,3) -> avg 2; sample 5 -> avg (3,4,5)=4
      input.addData(KeyedSample("a", 3, 3.0), KeyedSample("a", 4, 4.0),
        KeyedSample("a", 5, 5.0))
      query.processAllAvailable()
      val rows = s.sql("SELECT emitAtSeq, result FROM sliding_mb ORDER BY emitAtSeq")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq == Seq((3L, 2.0), (5L, 4.0)))
    } finally query.stop()
  }

  test("out-of-order sample below high-water mark is dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val ss: org.apache.spark.sql.SparkSession = s
    val input = MemoryStream[KeyedSample]
    val query = tumblingStream(input.toDS(), 2, "sum")
      .writeStream.format("memory").queryName("ooo_mb")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(KeyedSample("a", 10, 1.0), KeyedSample("a", 20, 2.0))
      query.processAllAvailable()
      // seq 5 violates the per-key ordering contract -> dropped, not folded
      input.addData(KeyedSample("a", 5, 100.0), KeyedSample("a", 30, 3.0),
        KeyedSample("a", 40, 4.0))
      query.processAllAvailable()
      val rows = s.sql("SELECT result FROM ooo_mb ORDER BY result")
        .collect().map(_.getDouble(0))
      assert(rows.toSeq == Seq(3.0, 7.0))
    } finally query.stop()
  }

  test("sliding window drops below-high-water-mark samples too") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val ss: org.apache.spark.sql.SparkSession = s
    val input = MemoryStream[KeyedSample]
    val query = slidingStream(input.toDS(), 2, 1, "sum")
      .writeStream.format("memory").queryName("ooo_sliding_mb")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(KeyedSample("a", 10, 1.0), KeyedSample("a", 20, 2.0))
      query.processAllAvailable()
      // seq 5 is below the key's HWM (20): must be dropped, NOT folded into
      // the ring — otherwise the next emission would aggregate (2.0, 100.0)
      input.addData(KeyedSample("a", 5, 100.0), KeyedSample("a", 30, 3.0))
      query.processAllAvailable()
      val rows = s.sql("SELECT emitAtSeq, result FROM ooo_sliding_mb ORDER BY emitAtSeq")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq == Seq((20L, 3.0), (30L, 5.0)))
    } finally query.stop()
  }
}
