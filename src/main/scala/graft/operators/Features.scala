package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-wise feature normalization and threshold filtering — the step
  * between raw quality signals ([[graft.functions.TextFunctions]]'s
  * length/punctuation/stopword/repetition scores) and a keep/drop
  * decision. Normalizing within a stratum (language, source) is what
  * makes one threshold meaningful across strata whose raw distributions
  * differ; both operators here are exact, SQL-reproducible, and avoid
  * per-group sorts.
  */
object Features {

  /** Per-group z-score: `(x - mean) / stddev_pop` within `groupCol`,
    * appended as `<col>_z` for each requested column; a zero-variance
    * group normalizes to 0.0 (not NaN/null), so downstream thresholds
    * need no special case. Values rounded to 4 decimals.
    *
    * Plan shape: one groupBy(group) aggregate (map-side partial sums)
    * and one key-hash join back — NO window sort. The moments frame is
    * one row per group; AQE broadcasts it below the threshold, so at
    * 100 TB the normalization pass is a broadcast join over the scan.
    */
  def zscore(df: DataFrame, groupCol: String,
             cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zscore needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(avg(col(c)).as(s"__mu_$c"), stddev_pop(col(c)).as(s"__sd_$c"))
    }
    // null-safe join: groupBy keeps a null-group row, and a plain
    // equi-join would silently DROP every null-group input row (null
    // never equals null) — a null stratum is its own group instead
    val moments = df.groupBy(col(groupCol).as("__g")).agg(aggs.head, aggs.tail: _*)
    val joined = df.join(moments, col(groupCol) <=> col("__g")).drop("__g")
    val outCols: Seq[Column] =
      df.columns.map(col).toSeq ++ cols.map { c =>
        when(col(s"__sd_$c") === 0.0, lit(0.0))
          .otherwise(round((col(c) - col(s"__mu_$c")) / col(s"__sd_$c"), 4))
          .as(s"${c}_z")
      }
    joined.select(outCols: _*)
  }

  /** Keep rows whose `valCol` is >= (or <= with `keepTop = false`) the
    * group's exact interpolated `q`-quantile (`quantile_cont`
    * semantics, matching SQL engines bit-for-bit after the threshold
    * comparison). The threshold frame is one row per group — computed
    * with `percentile` (exact, per-group sort of VALUES ONLY, never
    * whole rows), joined back by group hash. At 100 TB swap in
    * `percentile_approx` for the threshold with identical plumbing —
    * [[CorpusStats.quantileCertificate]] is the sketch-vs-exact
    * certificate for exactly that substitution.
    */
  def quantileFilter(df: DataFrame, groupCol: String, valCol: String,
                     q: Double, keepTop: Boolean = true): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0,1), got $q")
    // null-safe join for the same reason as zscore: a null-group row
    // must be filtered against its own group's threshold, not dropped
    val thr = df.groupBy(col(groupCol).as("__g"))
      .agg(expr(s"percentile(cast($valCol as double), ${q}D)").as("__thr"))
    val joined = df.join(thr, col(groupCol) <=> col("__g")).drop("__g")
    val cond =
      if (keepTop) col(valCol).cast("double") >= col("__thr")
      else col(valCol).cast("double") <= col("__thr")
    joined.where(cond).select(df.columns.map(col).toSeq: _*)
  }
}
