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
}
