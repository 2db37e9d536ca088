package graft.windows

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-based windows — these map 1:1 onto Spark's built-in `window()`
  * (tumbling when slide==size, paned sliding otherwise), which is exactly
  * the reference's pre-aggregated-pane design (reference: timeTumbling
  * windows.go:113-205, timeSliding "stream slicing" windows.go:280-393) but
  * distributed: panes are computed map-side, merged after a single shuffle.
  *
  * The reference uses processing-time (wall-clock); we use an explicit event
  * timestamp column, which is both deterministic/testable and the correct
  * choice at scale (reprocessing yields identical results). A
  * processing-time stream gets the same semantics by stamping
  * `current_timestamp()` at ingest.
  */
object TimeWindows {

  /** Tumbling time window aggregate. Keys are optional extra grouping
    * columns (the reference's groupBy discriminator, E5, and/or the keyed
    * nameKey variant, W5). */
  def tumbling(df: DataFrame, ts: Column, size: String, keys: Seq[Column],
               aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, size) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Sliding (paned) time window aggregate — slide = the reference's
    * `resolution`. */
  def sliding(df: DataFrame, ts: Column, size: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, size, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Keyed-window map-shaped output for parity with the reference's
    * `map[key]agg` emissions (windows.go:469-479): collapse per-key rows of
    * one window into a single map column. */
  def toMapShape(df: DataFrame, windowCol: String, keyCol: String,
                 valCol: String): DataFrame =
    df.groupBy(col(windowCol))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col(keyCol), col(valCol))))).as("result"))
}
