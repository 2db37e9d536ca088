package graft.util

import org.apache.spark.sql.DataFrame

/** Fan-out parallelism guard (optimization guide §1.2 step 1, §2.5
  * "input skew").
  *
  * The engine's hottest map stages multiply each input row into orders
  * of magnitude more work than its bytes suggest — tokenize + n-gram /
  * shingle explode + digest kernels over compressed text, per-position
  * gram generators, embedding kernels. Spark sizes scan splits by
  * BYTES (`maxPartitionBytes`, floored by `openCostInBytes` = 4 MB),
  * so a small-but-hot table scans as 1-2 tasks and the whole fan-out
  * stage serializes onto 1-2 cores (measured at sf0.1: every
  * tokenize-heavy stage over the 0.57 MB documents table ran 2 tasks
  * wide with 30 cores idle; a session-wide lower `openCostInBytes`
  * floor recovered those stages but taxed every CHEAP scan in the
  * suite with ~10 ms/task of driver fixed cost — the wrong knob, so
  * the spread lives at the operator fan-out points instead).
  *
  * [[spread]] inserts one round-robin repartition to the session's
  * core count ONLY when the input has fewer partitions than cores —
  * at cluster scale a corpus scan already carries thousands of
  * partitions, so the guard makes this a provable no-op there (no
  * corpus-wide shuffle is ever added at 100 TB); at bench scale it
  * moves the RAW pre-fan-out rows (the cheap side of the explosion)
  * once. Round-robin keeps Spark's sort-before-repartition determinism
  * (retry-stable row placement), and no result in the engine depends
  * on partitioning.
  */
object Parallelism {
  def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // physical-planning peek only (no job): scan partition counts are
    // known from the file listing
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
