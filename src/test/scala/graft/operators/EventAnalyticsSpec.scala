package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  // (user, ts seconds, type)
  private def mk(rows: Seq[(String, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("u", "sec", "et")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  private def funnelCounts(rows: Seq[(String, Long, String)]) =
    EventAnalytics.funnel(mk(rows), "u", "ts", "et",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  test("funnel counts only strictly-ordered stage completions") {
    val got = funnelCounts(Seq(
      // u1: full ordered funnel
      ("u1", 10L, "view"), ("u1", 20L, "click"), ("u1", 30L, "purchase"),
      // u2: purchase BEFORE its click -> reaches stage 2 only
      ("u2", 10L, "view"), ("u2", 30L, "click"), ("u2", 20L, "purchase"),
      // u3: view only
      ("u3", 10L, "view"),
      // u4: click/purchase but never a view -> reaches nothing
      ("u4", 10L, "click"), ("u4", 20L, "purchase")))
    assert(got == Set((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel anchors on the EARLIEST completion of the prior stage") {
    // u1's first view is at 10; the click at 5 predates it and must not
    // count, but the re-click at 50 does — first-touch semantics
    val got = funnelCounts(Seq(
      ("u1", 5L, "click"), ("u1", 10L, "view"), ("u1", 50L, "click"),
      ("u1", 60L, "purchase")))
    assert(got == Set((1, "view", 1L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel: equal timestamps do not satisfy the strict order") {
    val got = funnelCounts(Seq(("u1", 10L, "view"), ("u1", 10L, "click")))
    assert(got == Set((1, "view", 1L), (2, "click", 0L), (3, "purchase", 0L)))
  }

  test("windowed funnel bounds conversion lag, inclusive at exactly T") {
    val rows = Seq(
      // u1 converts within the 60 s lag at every stage
      ("u1", 10L, "view"), ("u1", 40L, "click"), ("u1", 90L, "purchase"),
      // u2's click lands 100 s after the view -> outside the window;
      // unbounded funnel would count it
      ("u2", 10L, "view"), ("u2", 110L, "click"),
      // u3's click is at EXACTLY view + 60 s: the band is inclusive
      // (t <= prev_t + T), but its purchase at +61 s is outside
      ("u3", 10L, "view"), ("u3", 70L, "click"), ("u3", 131L, "purchase"),
      // u4: first click inside the window, purchase within 60 s OF THAT
      // click — anchoring is still first-touch per stage
      ("u4", 10L, "view"), ("u4", 30L, "click"), ("u4", 85L, "purchase"))
    val got = EventAnalytics.funnel(mk(rows), "u", "ts", "et",
        Seq("view", "click", "purchase"), maxLagMs = Some(60000L))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1, "view", 4L), (2, "click", 3L), (3, "purchase", 2L)))
    // the unbounded funnel differs on the same vector — the band is
    // doing work
    assert(funnelCounts(rows) ==
      Set((1, "view", 4L), (2, "click", 4L), (3, "purchase", 3L)))
  }

  test("topPaths: sliding windows per actor, tails excluded, " +
      "deterministic tie order") {
    val s = spark
    import s.implicits._
    // u1: a b c d -> paths a>b>c, b>c>d; u2: a b c -> a>b>c;
    // u3: x y (too short, no 3-path)
    val df = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "c"), ("u1", 4L, "d"),
      ("u2", 5L, "a"), ("u2", 6L, "b"), ("u2", 7L, "c"),
      ("u3", 8L, "x"), ("u3", 9L, "y"))
      .toDF("u", "eid", "et")
    val got = EventAnalytics.topPaths(df, "u", "eid", "et", n = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "a>b>c", 2L), (2L, "b>c>d", 1L)),
      got.mkString(", "))
    // paths never cross actors: u1's d and u2's a are adjacent by eid
    // but no d>a>b path exists
    assert(!got.exists(_._2.contains("d>a")))
    // 2-step paths include the shorter actor
    val two = EventAnalytics.topPaths(df, "u", "eid", "et", n = 2, k = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(two("x>y") == 1L && two("a>b") == 2L)
    // k cuts deterministically on the (count desc, path) total order
    val k1 = EventAnalytics.topPaths(df, "u", "eid", "et", n = 3, k = 1)
      .collect().map(_.getString(1)).toSeq
    assert(k1 == Seq("a>b>c"))
    // null actors form no paths (they would otherwise all share one
    // window partition and manufacture cross-event paths)
    val withNull = df.unionByName(Seq(
      (null.asInstanceOf[String], 20L, "p"),
      (null.asInstanceOf[String], 21L, "q"),
      (null.asInstanceOf[String], 22L, "r")).toDF("u", "eid", "et"))
    val np = EventAnalytics.topPaths(withNull, "u", "eid", "et", 3, 10)
      .collect().map(_.getString(1))
    assert(!np.contains("p>q>r"), np.mkString(", "))
  }

  test("retention buckets distinct keys by first-event week offset") {
    // epoch 0 = Thu 1970-01-01; Monday of that week = -345600 s (Dec 29
    // 1969). Use ts well into 1970 to stay positive: week starting
    // Mon Jan 5 1970 = 345600 s.
    val w0 = 345600L
    val got = EventAnalytics.retention(mk(Seq(
        ("u1", w0 + 10L, "view"), ("u1", w0 + 604800L + 5L, "click"),
        ("u1", w0 + 3 * 604800L, "view"),
        ("u2", w0 + 604800L, "view"), ("u2", w0 + 604800L + 60L, "click"))),
      "u", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (w0 * 1000, 0L, 1L),               // u1 week 0
      (w0 * 1000, 1L, 1L),               // u1 back in week 1
      (w0 * 1000, 3L, 1L),               // u1 back in week 3
      ((w0 + 604800L) * 1000, 0L, 1L)))  // u2 cohort week 1, offset 0
  }

  test("windowed retention bounds the return horizon, inclusive at T") {
    val w0 = 345600L // Mon Jan 5 1970
    val rows = Seq(
      // u1 first event 10 s into week 0; returns at EXACTLY first+1w
      // (inside a 1-week horizon, inclusive) and again at first+1w+1s
      // (outside — dropped even though it is the same ISO week)
      ("u1", w0 + 10L, "view"), ("u1", w0 + 10L + 604800L, "click"),
      ("u1", w0 + 11L + 604800L, "view"),
      // u2 returns two weeks out -> the unbounded report keeps it, the
      // windowed one must not
      ("u2", w0 + 20L, "view"), ("u2", w0 + 20L + 2 * 604800L, "click"))
    val windowed = EventAnalytics.retention(mk(rows), "u", "ts",
        horizonMs = Some(604800000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(windowed == Set(
      (w0 * 1000, 0L, 2L),    // both cohorts' first events
      (w0 * 1000, 1L, 1L)))   // only u1's exactly-at-horizon return
    // the unbounded report differs on the same vector — the horizon is
    // doing work
    val unbounded = EventAnalytics.retention(mk(rows), "u", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(unbounded == Set(
      (w0 * 1000, 0L, 2L), (w0 * 1000, 1L, 1L), (w0 * 1000, 2L, 1L)))
  }
}
