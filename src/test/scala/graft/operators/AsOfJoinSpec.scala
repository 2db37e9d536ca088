package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("as-of join picks the latest right row at or before the left ts") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("event_id", "k", "t")
    val right = Seq((10L, "u1", 100L, 1.0), (11L, "u1", 200L, 2.0),
        (12L, "u1", 300L, 3.0), (13L, "u2", 60L, 4.0))
      .toDF("rid", "k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t",
        Map("as_of_rid" -> "rid", "as_of_v" -> "v"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("as_of_rid")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("as_of_v")).map(_.toDouble)))
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(1.0)),   // equal ts matches (>= semantics)
      (2L, Some(11L), Some(2.0)),   // 250 -> latest is 200, not 300
      (3L, None, None)))            // u2 at 50: no right row yet
  }

  test("forward as-of picks the earliest right row at or after the " +
      "left ts, mirrored semantics") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u1", 350L),
        (4L, "u2", 70L))
      .toDF("event_id", "k", "t")
    val right = Seq((10L, "u1", 100L, 1.0), (11L, "u1", 200L, 2.0),
        (12L, "u1", 300L, 3.0), (13L, "u2", 60L, 4.0))
      .toDF("rid", "k", "t", "v")
    val out = AsOfJoin.asOfForward(left, right, "k", "t",
        Map("next_rid" -> "rid", "next_v" -> "v"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("next_rid")).map(_.toLong)))
    assert(out.toSeq == Seq(
      (1L, Some(10L)),  // equal ts matches (<= semantics)
      (2L, Some(12L)),  // 250 -> earliest following is 300
      (3L, None),       // u1 at 350: nothing follows
      (4L, None)))      // u2 at 70: the only right row precedes
    // null right keys/ts match nothing, mirroring asOf's discipline
    val dirty = right.unionByName(
      Seq((99L, null.asInstanceOf[String], 400L, 9.0)).toDF("rid", "k", "t", "v"))
    val clean = AsOfJoin.asOfForward(left, dirty, "k", "t",
        Map("next_rid" -> "rid"))
      .collect().flatMap(r =>
        Option(r.getAs[java.lang.Long]("next_rid")).map(_.toLong))
    assert(!clean.contains(99L))
  }

  test("nearest as-of picks the closest side, ties to the preceding row") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 150L), (3L, "u1", 160L),
        (4L, "u1", 500L), (5L, "u2", 10L))
      .toDF("event_id", "k", "t")
    val right = Seq((10L, "u1", 90L, 1.0), (11L, "u1", 210L, 2.0),
        (12L, "u2", 40L, 3.0))
      .toDF("rid", "k", "t", "v")
    val out = AsOfJoin.asOfNearest(left, right, "k", "t",
        Map("near_rid" -> "rid"))
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("near_rid")).map(_.toLong)))
    assert(out.toSeq == Seq(
      (1L, Some(10L)),  // 100: back 10 vs fwd 110 -> backward
      (2L, Some(10L)),  // 150: back 60 vs fwd 60 — TIE -> preceding
      (3L, Some(11L)),  // 160: back 70 vs fwd 50 -> forward
      (4L, Some(11L)),  // 500: nothing follows -> backward only
      (5L, Some(12L)))) // 10: nothing precedes -> forward only
  }

  test("null right keys/timestamps match nothing (SQL semantics)") {
    // DuckDB ASOF (`l.k = r.k AND l.ts >= r.ts`): a null never satisfies
    // either predicate. Without the guard, a null-ts right row sorts
    // NULLS FIRST in the carry window and becomes the "match" for left
    // rows preceding every real right row.
    val s = spark
    import s.implicits._
    val left = Seq((1L, "u1", 100L)).toDF("event_id", "k", "t")
    val right = Seq(
        (10L, Option("u1"), Option.empty[Long], 99.0), // null ts
        (11L, Option.empty[String], Option(50L), 88.0), // null key
        (12L, Option("u1"), Option(200L), 77.0))        // after left ts
      .toDF("rid", "k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t",
        Map("as_of_rid" -> "rid"))
      .collect().map(r =>
        Option(r.getAs[java.lang.Long]("as_of_rid")).map(_.toLong))
    assert(out.toSeq == Seq(None), s"got ${out.toSeq}")
  }

  test("as-of join matches DuckDB-style semantics on real events") {
    val s = spark
    val e = graft.engine.Tables.events(s, sf())
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val out = AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
        Map("click_id" -> "event_id", "click_value" -> "value"))
      .collect()
    assert(out.nonEmpty)
    // reference computation on the driver
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000 + t.getNanos / 1000
    val clickRows = clicks.collect()
      .map(r => (r.getLong(1), micros(r.getTimestamp(2)), r.getLong(0)))
    val purchaseRows = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2))))
    val expected = purchaseRows.map { case (pid, u, pts) =>
      val best = clickRows.filter(c => c._1 == u && c._2 <= pts)
        .sortBy(_._2).lastOption.map(_._3)
      pid -> best
    }.toMap
    out.foreach { r =>
      val got = Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)
      assert(got == expected(r.getAs[Long]("event_id")))
    }
  }
}
