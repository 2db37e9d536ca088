package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides on the join key. Writing both tables bucketed (and sorted) by
  * that key moves the partitioning to WRITE time: every subsequent join
  * on the key is Exchange-free — Spark matches bucket specs and zips
  * buckets task-to-task. This is the standard layout for repeatedly
  * joined fact tables (orders ⋈ lineitem on orderkey).
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner produces a
    * SortMergeJoin with NO Exchange on either side when bucket counts
    * match. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame = {
    // bind each table once: every spark.table() call analyzes fresh
    // attribute ids, and a join condition built from third instances
    // leans on fragile self-join disambiguation
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
