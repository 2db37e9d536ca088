package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join — pair left rows with right rows of the same key
  * whose timestamp falls in [leftTs - lower, leftTs + upper]. The second
  * classic time-series operator Spark lacks natively (the naive
  * formulation is an inequality join that Spark plans as a
  * nested-loop/cartesian per key).
  *
  * Scalable formulation: both sides are binned by `span = lower + upper`
  * milliseconds; a left row's window covers at most TWO consecutive bins,
  * so the left side explodes into <= 2 (key, bin) rows and the join is a
  * plain equi-join on (key, bin) with the exact range predicate applied
  * after. Cost: one hash shuffle per side on small keys, zero range
  * expansion — the same shape DuckDB's IEJoin achieves, expressed in
  * joins Catalyst already optimizes.
  */
object RangeJoin {

  /** Inner time-range join. Right columns are prefixed with `rightPrefix`
    * to avoid collisions. */
  def timeRange(left: DataFrame, right: DataFrame, key: String, ts: String,
                lowerMs: Long, upperMs: Long,
                rightPrefix: String = "r_"): DataFrame = {
    require(lowerMs >= 0 && upperMs >= 0 && lowerMs + upperMs > 0,
      "range bounds must be non-negative with a positive span")
    val span = lowerMs + upperMs
    // bins in ms (coarse bucketing); the exact predicate in MICROsecond
    // precision — the full precision of Spark timestamps, so boundary
    // rows agree with an engine comparing raw timestamps
    val lowerUs = lowerMs * 1000L
    val upperUs = upperMs * 1000L
    val spanUs = span * 1000L
    // the bin id is only ever compared for EQUALITY, so the bin's
    // span-aligned start value (c - pmod(c, span)) IS the id — pure long
    // arithmetic, no division at all. (The previous `x / spanUs` was
    // Catalyst's double division: exact only while |x| < 2^53, after
    // which rounding could land a row in the neighboring bin and
    // silently drop an in-range pair.)
    def binOf(c: Column): Column = c - pmod(c, lit(spanUs))
    val l = left
      .withColumn("__lus", unix_micros(col(ts)))
      .withColumn("__bin", explode(array_distinct(array(
        binOf(col("__lus") - lowerUs), binOf(col("__lus") + upperUs)))))
    val r = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, rightPrefix + c)
    }
      .withColumn("__rus", unix_micros(col(rightPrefix + ts)))
      .withColumn("__bin", binOf(col("__rus")))
    l.join(r,
        col(key) === col(rightPrefix + key) &&
          l("__bin") === r("__bin") &&
          col("__rus") >= col("__lus") - lowerUs &&
          col("__rus") <= col("__lus") + upperUs)
      .drop("__lus", "__rus", "__bin", rightPrefix + key)
  }
}
