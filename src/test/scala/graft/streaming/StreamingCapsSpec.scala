package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import StreamingCaps.{CapEvent, CapState}

class StreamingCapsSpec extends SparkSpec {

  test("capFold keeps the first k in (ts, id) order, drops out-of-order") {
    val st0 = CapState(0L, Long.MinValue, Long.MinValue)
    val rows = Seq(
      CapEvent(Some(1L), 30L, 3L), CapEvent(Some(1L), 10L, 1L),
      CapEvent(Some(1L), 20L, 2L), CapEvent(Some(1L), 10L, 0L))
    // unsorted input sorts on (ts, id); cap 2 keeps (10,0) and (10,1)
    val (st, out) = StreamingCaps.capFold(rows, st0, 2)
    assert(out.map(_.id) == Vector(0L, 1L))
    assert(st == CapState(2L, 30L, 3L))
    // a later batch at/below the high-water mark is a contract
    // violation -> dropped AND does not disturb the state
    val (st2, out2) = StreamingCaps.capFold(
      Seq(CapEvent(Some(1L), 30L, 3L), CapEvent(Some(1L), 25L, 9L)), st, 2)
    assert(out2.isEmpty && st2 == st)
    // in-order events past the cap advance the mark but emit nothing
    val (st3, out3) = StreamingCaps.capFold(
      Seq(CapEvent(Some(1L), 40L, 4L)), st2, 2)
    assert(out3.isEmpty && st3 == CapState(2L, 40L, 4L))
  }

  test("capReplay equals batch row_number()<=k across chunked arrival, " +
      "null keys form their own group") {
    implicit val ss: SparkSession = spark
    import ss.implicits._
    // 3 keys (one null) x 6 events each, arriving over 3 chunks in ts
    // order; cap 4. Chunk = ts bucket (ties share a chunk).
    val rows = for {
      key <- Seq(Some(10L), Some(20L), None)
      i <- 0 until 6
    } yield (key, i.toLong * 100 + key.getOrElse(0L) % 7, // distinct ts
             key.getOrElse(99L) * 1000 + i)
    val df = rows.toDF("user_id", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = StreamingCaps.capReplay(df, "user_id", "ts", "event_id", 4,
        floor(unix_micros(col("ts")) / 200000000L).cast("int"), 3)
      .select(col("k"), col("id"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1))).toSet
    val expect = df
      .withColumn("rn", expr(
        "row_number() over (partition by user_id order by ts, event_id)"))
      .where(col("rn") <= 4)
      .select(coalesce(col("user_id"), lit(-1L)), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    assert(got.count(_._1 == -1L) == 4) // the null group is capped too
  }
}
