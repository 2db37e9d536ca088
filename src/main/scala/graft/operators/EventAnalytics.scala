package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over event streams —
  * the two standard questions a product/interaction log answers
  * ("how far do users get through this sequence?", "how many of each
  * week's new users come back k weeks later?"), and for training-data
  * curation the same shapes measure multi-turn conversation depth and
  * corpus-freshness cohorts. The reference engine has no event-analytics
  * surface (its aggregations are per-window scalars); this extends the
  * LLM-pipeline layer like [[Sessionize]].
  */
object EventAnalytics {

  /** Strictly-ordered funnel: a key reaches stage i+1 when it has an
    * event of that stage's type strictly after its EARLIEST completion
    * of stage i (the standard first-touch funnel; re-orderings like
    * purchase-before-view do not count). Returns one row per stage:
    * (stage_idx 1-based, stage, n_keys reaching it).
    *
    * `maxLagMs` bounds conversion lag (the windowed funnel every
    * product-analytics engine offers): stage i+1 must land within
    * `maxLagMs` of the key's stage-i completion, i.e.
    * `prev_t < t <= prev_t + T`. The bound compares at epoch
    * MICROSECONDS — the session µs-timestamp precision — so an external
    * engine computing on nanosecond timestamps truncates identically
    * (the [[Sessionize]] lesson: ms-truncated comparison diverges on
    * sub-ms boundary pairs). `None` = unbounded (the classic funnel).
    *
    * Plan shape: each stage is a filtered `groupBy(key).min(ts)` joined
    * to the previous stage's reach frame — per-stage shuffles carry
    * (key, ts) pairs only, and the reach frame shrinks monotonically
    * (AQE broadcasts it once it fits). The lag band is a post-join
    * scalar predicate: no extra shuffle, no extra scan. The stage list
    * is small by contract; total work is one filtered scan + one keyed
    * aggregate per stage. Stage frames chain, so ask for the counts in
    * ONE returned frame (a union of single-row aggregates) and Spark
    * evaluates the whole cascade in one job.
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             maxLagMs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"stage types must be distinct, got $stages")
    require(maxLagMs.forall(_ > 0L),
      s"maxLagMs must be positive when set, got $maxLagMs")
    val perStage = stages.zipWithIndex.scanLeft(null: DataFrame) {
      case (prev, (stage, i)) =>
        val evs = events.where(col(typeCol) === stage)
          .select(col(keyCol).as("k"), col(tsCol).as("t"))
        if (i == 0) evs.groupBy("k").agg(min(col("t")).as("t"))
        else {
          val chained = evs
            .join(prev.withColumnRenamed("t", "prev_t"), "k")
            .where(col("t") > col("prev_t"))
          maxLagMs.fold(chained)(lag => chained.where(
              unix_micros(col("t")) <=
                unix_micros(col("prev_t")) + lag * 1000L))
            .groupBy("k").agg(min(col("t")).as("t"))
        }
    }.drop(1)
    perStage.zip(stages.zipWithIndex).map { case (df, (stage, i)) =>
      df.agg(count(lit(1)).as("n_keys"))
        .select(lit(i + 1).cast("int").as("stage_idx"),
          lit(stage).as("stage"), col("n_keys"))
    }.reduce(_ unionAll _)
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-truncated) of a
    * key's first event; one row per (cohort, week offset) with the
    * distinct keys active that week. Week arithmetic is pure epoch
    * math over `date_trunc("week")`, so an external SQL engine
    * reproduces it exactly (UTC sessions; weeks have no DST).
    * Output: (cohort_ms, week_offset, n_keys).
    *
    * `horizonMs` bounds the return window (the windowed retention every
    * cohort report at scale needs — an unbounded report's tail grows
    * with corpus age): only events within `horizonMs` of the key's
    * FIRST EVENT (its exact timestamp, not the truncated cohort week)
    * count, inclusive at exactly the horizon. The bound compares at
    * epoch MICROSECONDS — the session µs-timestamp precision, the same
    * band discipline as [[funnel]]'s `maxLagMs` (the [[Sessionize]]
    * ms-truncation lesson). `None` = unbounded (the classic report).
    *
    * Plan shape: one keyed aggregate for first-touch, one key-hash join
    * of the event stream against the (one-row-per-key) cohort frame,
    * one (cohort, offset) aggregate — events never carry more than
    * (key, truncated week) across an exchange. The horizon is a
    * post-join scalar predicate: no extra shuffle, no extra scan, and
    * it SHRINKS the aggregate's input.
    */
  // Null-key contract (funnel + retention + topPaths): a null actor
  // key carries no identity — anonymous events cannot cohort, convert,
  // or form a path, so the equality joins/groupings exclude them BY
  // DESIGN (contrast Features.zscore, where a null STRATUM is a
  // meaningful group and the joins are null-safe).
  def retention(events: DataFrame, keyCol: String, tsCol: String,
                horizonMs: Option[Long] = None): DataFrame = {
    require(horizonMs.forall(_ > 0L),
      s"horizonMs must be positive when set, got $horizonMs")
    val first = events.groupBy(col(keyCol).as("k"))
      .agg(min(col(tsCol)).as("ft"))
      .select(col("k"), col("ft"), date_trunc("week", col("ft")).as("cohort"))
    val joined = events.select(col(keyCol).as("k"), col(tsCol).as("t"))
      .join(first, "k")
    horizonMs.fold(joined)(h => joined.where(
        unix_micros(col("t")) <= unix_micros(col("ft")) + h * 1000L))
      .select(col("k"), unix_millis(col("cohort")).as("cohort_ms"),
        floor((unix_timestamp(date_trunc("week", col("t"))) -
          unix_timestamp(col("cohort"))) / 604800L).as("week_offset"))
      .groupBy("cohort_ms", "week_offset")
      .agg(countDistinct(col("k")).as("n_keys"))
  }

  /** Top-k n-step event PATHS — funnel DISCOVERY: the most frequent
    * consecutive event-type sequences across all actors, found from
    * the data instead of declared up front (what an analyst runs
    * before choosing [[funnel]]'s stages). Per actor, events order by
    * `seqCol` (pass a unique monotone column — an event id; a bare
    * timestamp with ties would make paths nondeterministic) and every
    * window of `n` consecutive types becomes one `a>b>c` path;
    * incomplete tails (fewer than n events remain for the actor) are
    * excluded. Output: `(rk, path, n_paths)`, ties broken by path.
    *
    * Scale shape: one hash shuffle by actor + the per-actor window
    * (bounded by events-per-actor); the path aggregate shuffles at
    * path cardinality with map-side combine; the top-k is
    * `orderBy.limit` — a bounded per-partition heap
    * (TakeOrderedAndProject), never a global sort; the rank column is
    * windowed over the k survivors only. */
  def topPaths(events: DataFrame, keyCol: String, seqCol: String,
               typeCol: String, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, s"paths need at least 2 steps, got $n")
    require(k >= 1, s"k must be positive, got $k")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    val steps = (1 until n).map(i => lead(col(typeCol), i).over(w))
    val top = events
      // the null-key contract above: anonymous events form no paths (a
      // bare window would lump every null actor into ONE partition and
      // manufacture paths across unrelated events)
      .where(col(keyCol).isNotNull)
      .withColumn("__last", steps.last)
      .withColumn("path",
        concat_ws(">", col(typeCol) +: steps: _*))
      .where(col("__last").isNotNull)
      .groupBy("path").agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path").asc)
      .limit(k)
    val wr = Window.orderBy(col("n_paths").desc, col("path").asc)
    top.withColumn("rk", row_number().over(wr).cast("long"))
      .select(col("rk"), col("path"), col("n_paths"))
  }
}
