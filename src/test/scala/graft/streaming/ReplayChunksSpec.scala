package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the ts-monotone-BY-CONSTRUCTION contract of
  * [[ReplayChunks.byTime]] — including the exact month-boundary
  * fixture on which the calendar expression it replaced
  * (floor((dayofmonth-1)/5)) stayed in-range but went non-monotone,
  * silently dropping later-month events at every high-water-mark
  * consumer (ADVICE r14). */
class ReplayChunksSpec extends SparkSpec {

  private def chunksFor(secs: Seq[Long], n: Int): Seq[(Long, Int)] = {
    val s = spark
    import s.implicits._
    val df = secs.toDF("sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    df.select(col("sec"), ReplayChunks.byTime(df, "ts", n).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
  }

  test("byTime is monotone across a month boundary (the dayofmonth trap)") {
    // Jan 28 .. Feb 3 2024, one event per day: dayofmonth restarts at 1
    // on Feb 1, so the old expression mapped Feb events to chunk 0
    // AFTER Jan's chunk 5 — byTime must stay non-decreasing instead
    val day = 86400L
    val jan28 = java.time.LocalDate.of(2024, 1, 28)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val secs = (0 until 7).map(i => jan28 + i * day)
    val out = chunksFor(secs, 6).sortBy(_._1)
    assert(out.map(_._2) == out.map(_._2).sorted, s"non-monotone: $out")
    assert(out.forall { case (_, c) => c >= 0 && c < 6 })
    assert(out.map(_._2).distinct.size > 1) // actually splits the span
  }

  test("byTime: equal timestamps share a chunk; bounds are exact longs") {
    val secs = Seq(100L, 100L, 100L, 200L, 200L, 300L)
    val out = chunksFor(secs, 3)
    // ties share a chunk (the high-water determinism contract)
    assert(out.filter(_._1 == 100L).map(_._2).distinct.size == 1)
    assert(out.filter(_._1 == 200L).map(_._2).distinct.size == 1)
    // monotone and in range
    val sorted = out.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted && sorted.forall(c => c >= 0 && c < 3))
  }

  test("byTime degenerate cases: single chunk, constant ts") {
    assert(chunksFor(Seq(5L, 9L, 100L), 1).forall(_._2 == 0))
    // constant ts: all rows land in ONE valid chunk (no staging error)
    assert(chunksFor(Seq(7L, 7L, 7L), 4).map(_._2).distinct.size == 1)
  }
}
