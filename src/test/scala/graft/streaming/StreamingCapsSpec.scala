package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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

  test("rateCapTtl: idle keys evict at watermark past last-event + ttl " +
      "and re-admit a fresh epoch; active keys stay capped") {
    implicit val ss: SparkSession = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    def run(ttl: Option[Long]): Set[Long] = {
      val input = MemoryStream[(Long, Long, Long)] // (key, ms, id)
      val wm = input.toDF()
        .select(col("_1").as("k"), timestamp_millis(col("_2")).as("ts"),
          col("_3").as("id"))
        .withWatermark("ts", "0 seconds")
      val capped = ttl match {
        case Some(ms) => StreamingCaps.rateCapTtl(
          wm.as[StreamingCaps.CapEventTs], 2, ms)
        case None => StreamingCaps.rateCap(
          wm.select(col("k"), unix_micros(col("ts")).as("tsUs"), col("id"))
            .as[CapEvent], 2)
      }
      val name = "ttlcap_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = capped.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // batch 1: key 1 bursts — cap 2 keeps ids 0, 1, drops 2
        // (timestamps sit well above epoch 0: Spark's initial watermark
        // is 0 ms and a ts==watermark row would be filtered as late)
        input.addData((1L, 100000L, 0L), (1L, 100010L, 1L),
          (1L, 100020L, 2L))
        q.processAllAvailable()
        // batch 2: key 2 appears; the watermark (100020) has NOT
        // passed key 1's ttl horizon (100020 + 1000) yet
        input.addData((2L, 105000L, 10L))
        q.processAllAvailable()
        // batch 3: watermark is now 105000 > 101020 — key 1 evicts HERE
        // (no key-1 rows this batch); key 2 keeps its second event
        input.addData((2L, 106000L, 11L))
        q.processAllAvailable()
        // batch 4: key 1 re-arrives — fresh epoch, first 2 admitted
        // again under ttl; key 2 is past its cap (never idle) → drop
        input.addData((1L, 107000L, 20L), (1L, 107010L, 21L),
          (1L, 107020L, 22L), (2L, 107005L, 12L))
        q.processAllAvailable()
        spark.table(name).select("id").collect().map(_.getLong(0)).toSet
      } finally {
        q.stop()
        spark.catalog.dropTempView(name); ()
      }
    }
    assert(run(Some(1000L)) == Set(0L, 1L, 10L, 11L, 20L, 21L))
    // control: without the ttl the evicted epoch never happens — key 1
    // stays capped forever, exactly the unbounded-churn gap rateCapTtl
    // closes
    assert(run(None) == Set(0L, 1L, 10L, 11L))
  }
}
