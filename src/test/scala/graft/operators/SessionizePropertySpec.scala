package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized parity for sessionization and the ordered funnel:
  * any mix of keys, timestamps, and event types must match naive
  * driver-side references (session split only on a gap STRICTLY over
  * the threshold — session_window's inclusive boundary; first-touch
  * strictly-ordered stage cascade). */
class SessionizePropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260813L)

  test("property: sessionize equals naive reference on random data") {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { round =>
      // events cluster (gaps mostly < 60 s) with occasional long jumps,
      // including exact-boundary gaps of exactly 60 s
      val rows = (0 until 200).map { i =>
        val k = s"u${rnd.nextInt(5)}"
        val t = rnd.nextInt(40) match {
          case n if n < 30 => rnd.nextInt(3600).toLong
          case n if n < 35 => 3600L + rnd.nextInt(100000).toLong
          case _ => 60L * (1 + rnd.nextInt(100)) // multiples of the gap
        }
        (i.toLong, k, t)
      }
      val df = rows.toDF("eid", "k", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val got = Sessionize.assign(df, "k", "ts", 60L, Seq("eid"))
        .select("eid", "session_idx")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive reference: per key, (ts, eid)-sorted, split only on a
      // gap STRICTLY over 60 s (exactly 60 s merges — the generator's
      // gap-multiple branch exercises the boundary every round)
      val want = rows.groupBy(_._2).flatMap { case (_, ks) =>
        val sorted = ks.sortBy(r => (r._3, r._1))
        var idx = 0L
        var prev = Long.MinValue
        sorted.map { case (eid, _, t) =>
          if (prev != Long.MinValue && (t - prev) * 1000L > 60000L) idx += 1
          prev = t
          eid -> idx
        }
      }.toMap
      assert(got == want, s"round $round mismatch")
    }
  }

  test("property: funnel equals naive reference on random data") {
    val s = spark
    import s.implicits._
    val stages = Seq("s1", "s2", "s3")
    (1 to 5).foreach { round =>
      // distinct ts per key so the strict-order reference is unambiguous
      val used = scala.collection.mutable.Set.empty[(String, Long)]
      val rows = (0 until 150).flatMap { i =>
        val k = s"u${rnd.nextInt(12)}"
        val et = stages(rnd.nextInt(stages.length))
        var t = rnd.nextInt(10000).toLong
        while (used.contains((k, t))) t += 1
        used.add((k, t))
        Some((i.toLong, k, t, et))
      }
      val df = rows.toDF("eid", "k", "sec", "et")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val got = EventAnalytics.funnel(df, "k", "ts", "et", stages)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      // naive: walk each key's reach through the stage cascade
      val byKey = rows.groupBy(_._2)
      var reach = byKey.keySet.toSeq.flatMap { k =>
        val evs = byKey(k)
        evs.filter(_._4 == stages.head).map(_._3).minOption.map(k -> _)
      }.toMap
      val want = scala.collection.mutable.Map(1 -> reach.size.toLong)
      stages.zipWithIndex.drop(1).foreach { case (st, i) =>
        reach = reach.flatMap { case (k, prevT) =>
          byKey(k).filter(e => e._4 == st && e._3 > prevT)
            .map(_._3).minOption.map(k -> _)
        }
        want(i + 1) = reach.size.toLong
      }
      assert(got == want.toMap, s"round $round mismatch")
      used.clear()
    }
  }
}
