package graft.windows

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.windows.CountWindows.KeyedSample

/** transformWithState variant must match the reference vectors and keep
  * state across micro-batches, like the flatMapGroupsWithState form. */
class CountWindowsTwsSpec extends SparkSpec {

  test("transformWithState tumbling window matches reference vectors") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val ss: org.apache.spark.sql.SparkSession = s
    // transformWithState requires the RocksDB state store (column
    // families) — the store SCALE.md prescribes for production anyway
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[KeyedSample]
    val query = CountWindowsTws.tumbling(input.toDS(), 3, "avg")
      .writeStream.format("memory").queryName("tws_tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      // reference TestTumblingWindow_AddSample: 1,2,3 -> 2; 4,5,6 -> 5
      input.addData(KeyedSample("a", 1, 1.0), KeyedSample("a", 2, 2.0))
      query.processAllAvailable()
      assert(s.sql("SELECT * FROM tws_tumbling").count() == 0)
      input.addData(KeyedSample("a", 3, 3.0), KeyedSample("a", 4, 4.0),
        KeyedSample("a", 5, 5.0), KeyedSample("a", 6, 6.0))
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT emitAtSeq, result FROM tws_tumbling ORDER BY emitAtSeq")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq == Seq((3L, 2.0), (6L, 5.0)))
    } finally {
      query.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState sliding window matches slidingStream cadence") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val ss: org.apache.spark.sql.SparkSession = s
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[KeyedSample]
    val query = CountWindowsTws.sliding(input.toDS(), 3, 2, "avg")
      .writeStream.format("memory").queryName("tws_sliding")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(KeyedSample("a", 1, 1.0), KeyedSample("a", 2, 2.0))
      query.processAllAvailable()
      assert(s.sql("SELECT * FROM tws_sliding").count() == 0)
      // below-HWM straggler (seq 1) must be dropped, ring fills at 3
      input.addData(KeyedSample("a", 1, 100.0), KeyedSample("a", 3, 3.0),
        KeyedSample("a", 4, 4.0), KeyedSample("a", 5, 5.0))
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT emitAtSeq, result FROM tws_sliding ORDER BY emitAtSeq")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      // identical to slidingStream: first emit at sample 3 avg(1,2,3)=2,
      // then every 2nd sample: at 5 avg(3,4,5)=4
      assert(rows.toSeq == Seq((3L, 2.0), (5L, 4.0)))
    } finally {
      query.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("processing-time ticker emits accumulated samples when timers fire") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val ss: org.apache.spark.sql.SparkSession = s
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[KeyedSample]
    val query = CountWindowsTws.processingTimeTicker(input.toDS(), 200L, "sum")
      .writeStream.format("memory").queryName("tws_ticker")
      .outputMode(OutputMode.Append).start()
    try {
      // NO processAllAvailable here: a ProcessingTime-mode query keeps
      // scheduling batches to check its timers, so it never quiesces —
      // the engine runs micro-batches on its own; poll the sink until
      // the 200ms timer has fired and emitted
      input.addData(KeyedSample("a", 1, 1.0), KeyedSample("a", 2, 2.0))
      val deadline = System.currentTimeMillis() + 30000
      var rows = Array.empty[Double]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        rows = s.sql("SELECT result FROM tws_ticker WHERE key = 'a'")
          .collect().map(_.getDouble(0))
      }
      assert(rows.toSeq == Seq(3.0), "ticker never emitted the window")
    } finally {
      query.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
