package graft.windows

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggFunctionsSpec extends SparkSpec {

  test("accumulate preserves arrival order via the ordering column") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", 3L, 30.0), ("k", 1L, 10.0), ("k", 2L, 20.0))
      .toDF("key", "seq", "value")
    val out = df.groupBy("key")
      .agg(AggFunctions.scalar("accumulate", col("value"), col("seq")).as("vals"))
      .collect()(0).getSeq[Double](1)
    assert(out == Seq(10.0, 20.0, 30.0))
  }

  test("vector aggregators match per-element reference on real embeddings") {
    val emb = graft.engine.Tables.embeddings(spark, sf())
      .withColumn("v", col("embedding").cast("array<double>"))
    val agged = emb.groupBy("label")
      .agg(AggFunctions.vector("sum", col("v")).as("vs"),
        AggFunctions.vector("avg", col("v")).as("va"),
        AggFunctions.vector("min", col("v")).as("vmin"),
        AggFunctions.vector("max", col("v")).as("vmax"))
      .collect()
      .map(r => r.getInt(0) -> (r.getSeq[Double](1), r.getSeq[Double](2),
        r.getSeq[Double](3), r.getSeq[Double](4))).toMap
    val raw = emb.select(col("label"), col("v")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    raw.foreach { case (label, vecs) =>
      val dim = vecs.head.length
      val (vs, va, vmin, vmax) = agged(label)
      (0 until dim).foreach { i =>
        val col_i = vecs.map(_(i))
        assert(math.abs(vs(i) - col_i.sum) < 1e-9)
        assert(math.abs(va(i) - col_i.sum / col_i.length) < 1e-9)
        assert(vmin(i) == col_i.min)
        assert(vmax(i) == col_i.max)
      }
    }
  }

  test("vector int-avg truncates element-wise like Go int division") {
    val s = spark
    import s.implicits._
    // AggregateSingleAvg []int case (average.go:78-85): each element sum
    // divided by the sample count in Go int division (toward zero)
    val df = Seq(("k", Seq(1L, -7L, 10L)), ("k", Seq(2L, 0L, 5L)))
      .toDF("key", "v")
    val out = df.groupBy("key")
      .agg(AggFunctions.vector("avgInt", col("v")).as("va"))
      .collect()(0).getSeq[Long](1)
    // sums (3, -7, 15) / 2 -> (1, -3, 7): 3/2=1, -7/2=-3 (not -4), 15/2=7
    assert(out == Seq(1L, -3L, 7L))
  }

  test("scalar dispatch covers all six reference functions") {
    val s = spark
    import s.implicits._
    val df = Seq(("k", 1L, 4.0), ("k", 2L, 2.0), ("k", 3L, 6.0))
      .toDF("key", "seq", "value")
    val row = df.groupBy("key").agg(
      AggFunctions.scalar("sum", col("value"), col("seq")).as("s"),
      AggFunctions.scalar("avg", col("value"), col("seq")).as("a"),
      AggFunctions.scalar("min", col("value"), col("seq")).as("mn"),
      AggFunctions.scalar("max", col("value"), col("seq")).as("mx"),
      AggFunctions.scalar("count", col("value"), col("seq")).as("c"))
      .collect()(0)
    assert(row.getDouble(1) == 12.0)
    assert(row.getDouble(2) == 4.0)
    assert(row.getDouble(3) == 2.0)
    assert(row.getDouble(4) == 6.0)
    assert(row.getLong(5) == 3L)
  }
}
