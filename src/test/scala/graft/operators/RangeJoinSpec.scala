package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("range join: boundaries inclusive, bins never lose a match") {
    val s = spark
    import s.implicits._
    // left at t=10_000ms; window [-2000, +1000]
    val left = Seq((1L, "k", 10000L)).toDF("lid", "k", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val right = Seq(
        (10L, "k", 8000L),   // exactly lower boundary -> in
        (11L, "k", 7999L),   // just outside -> out
        (12L, "k", 11000L),  // exactly upper boundary -> in
        (13L, "k", 11001L),  // just outside -> out
        (14L, "k", 10000L),  // same instant -> in
        (15L, "x", 10000L))  // other key -> out
      .toDF("rid", "k", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val got = RangeJoin.timeRange(left, right, "k", "ts", 2000L, 1000L)
      .select("r_rid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(10L, 12L, 14L))
  }

  test("property: binned range join equals naive inequality join") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    (1 to 4).foreach { round =>
      val mk = (n: Int, base: Long) => (0 until n).map(i =>
        (base + i, s"k${rnd.nextInt(3)}", rnd.nextInt(100000).toLong))
      val lRows = mk(40, 100)
      val rRows = mk(40, 900)
      val l = lRows.toDF("lid", "k", "ms")
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      val r = rRows.toDF("rid", "k", "ms")
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      val (lower, upper) = (1000L + rnd.nextInt(5000), 1000L + rnd.nextInt(5000))
      val got = RangeJoin.timeRange(l, r, "k", "ts", lower, upper)
        .select("lid", "r_rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val expected = (for {
        (lid, lk, lt) <- lRows
        (rid, rk, rt) <- rRows
        if lk == rk && rt >= lt - lower && rt <= lt + upper
      } yield (lid, rid)).toSet
      assert(got == expected, s"round $round lower=$lower upper=$upper")
    }
  }
}
