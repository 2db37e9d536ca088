package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach the most recent right row with
  * the same key and `rightTs <= leftTs`. The canonical time-series /
  * event-enrichment operator Spark has no built-in for (DuckDB: ASOF
  * JOIN; kdb: aj).
  *
  * Implementation is the scalable union-and-carry formulation, NOT a
  * range join: both sides are tagged and unioned, then a single hash
  * shuffle on the key + one per-partition sort by (ts, side) lets
  * `last(_, ignoreNulls)` carry the latest right-side attributes forward
  * onto each left row. Cost: one shuffle of (key, ts, payload), one
  * sort — same shape as any ranked-window query, no quadratic range
  * expansion, skew bounded by rows-per-key. Right rows sort BEFORE left
  * rows at equal timestamps, so ties match (rightTs == leftTs included,
  * like DuckDB's `ON l.ts >= r.ts`).
  */
object AsOfJoin {

  /** Left rows enriched with the as-of right row's picked columns.
    * `pick` maps output column name -> right-side column. Left rows with
    * no preceding right row keep nulls.
    *
    * The right side's picked columns travel as ONE struct and the carry
    * is a single `last(struct, ignoreNulls)` — the struct is non-null
    * whenever a right row exists even if every picked FIELD is null, so
    * the match is always one coherent right row (a per-column carry
    * would resurrect stale values for columns that are null in the true
    * as-of row). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           pick: Map[String, String]): DataFrame = {
    val leftCols = left.columns
    val picked = pick.toSeq
    val rStruct = struct(picked.map { case (out, src) => col(src).as(out) }: _*)
    // SQL as-of semantics (DuckDB `ON l.key = r.key AND l.ts >= r.ts`):
    // a right row with a null key or null ts matches NOTHING. Without
    // this filter, null-ts rows sort NULLS FIRST in the carry window and
    // would become the "as-of" match for left rows preceding every real
    // right row, and null keys would match null-key left rows through
    // the partitionBy grouping.
    val r = right
      .where(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key), col(ts), lit(0).as("__side"), rStruct.as("__asof"))
      .select((Seq(col(key), col(ts), col("__side"), col("__asof")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__asof",
        lit(null).cast(r.schema("__asof").dataType))
      .select((Seq(col(key), col(ts), col("__side"), col("__asof")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        picked.map { case (out, _) => col("__asof").getField(out).as(out) }): _*)
  }

  /** NEAREST as-of join — for every left row, the right row with the
    * same key whose timestamp is CLOSEST in either direction (pandas
    * `merge_asof(direction="nearest")`); ties at equal distance go to
    * the PRECEDING row. Composed as the backward and forward carries
    * chained in one plan (two key shuffles/sorts — the price of
    * looking both ways) with a per-row distance pick. Distance
    * compares at epoch MICROSECONDS for timestamp columns (the
    * [[EventAnalytics]] band discipline) and at the raw value for
    * numeric ones. */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
                  ts: String, pick: Map[String, String]): DataFrame = {
    def tsNum(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("double")
      }
    val leftCols = left.columns
    val b = asOf(left, right, key, ts,
      pick.map { case (o, s) => (s"__b_$o", s) } ++ Map("__b__t" -> ts))
    val bf = asOfForward(b, right, key, ts,
      pick.map { case (o, s) => (s"__f_$o", s) } ++ Map("__f__t" -> ts))
    val lt = tsNum(col(ts), left.schema(ts).dataType)
    val rdt = right.schema(ts).dataType
    val bd = lt - tsNum(col("__b__t"), rdt)
    val fd = tsNum(col("__f__t"), rdt) - lt
    val useB = col("__b__t").isNotNull &&
      (col("__f__t").isNull || bd <= fd)
    bf.select((leftCols.map(col) ++
      pick.keys.toSeq.map(o =>
        when(useB, col(s"__b_$o")).otherwise(col(s"__f_$o")).as(o))): _*)
  }

  /** FORWARD as-of join — for every left row, the EARLIEST right row
    * with the same key and `rightTs >= leftTs` (pandas
    * `merge_asof(direction="forward")`; the "next quote after the
    * order" / "first event after the checkpoint" enrichment). Same
    * union-and-carry plan as [[asOf]] mirrored in time: one hash
    * shuffle on the key, one per-partition sort by (ts DESC, side),
    * the carry runs from the future backward. Right rows sort before
    * left rows at equal timestamps in the reversed order too, so ties
    * match (`rightTs == leftTs` included). Left rows with no following
    * right row keep nulls. Null right keys/timestamps match nothing
    * (the [[asOf]] null discipline). */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  ts: String, pick: Map[String, String]): DataFrame = {
    val leftCols = left.columns
    val picked = pick.toSeq
    val rStruct = struct(picked.map { case (out, src) => col(src).as(out) }: _*)
    val r = right
      .where(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key), col(ts), lit(0).as("__side"), rStruct.as("__asof"))
      .select((Seq(col(key), col(ts), col("__side"), col("__asof")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__asof",
        lit(null).cast(r.schema("__asof").dataType))
      .select((Seq(col(key), col(ts), col("__side"), col("__asof")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        picked.map { case (out, _) => col("__asof").getField(out).as(out) }): _*)
  }
}
