package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup pair lists (from
  * [[Dedup.jaccardPairs]] / minhash / simhash / embedding) are only half
  * of a dedup pipeline — similarity is not transitive, so choosing which
  * documents to KEEP needs the transitive closure: connected components
  * over the pair graph, one survivor per component.
  *
  * The reference engine has no dedup at all; this is part of the
  * LLM-training-data layer. Algorithm: alternating large-star /
  * small-star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14 — public literature), chosen over plain label
  * propagation because it converges in O(log n) rounds even on
  * adversarial chain-shaped components, where propagation needs
  * O(diameter) rounds.
  *
  * Scale shape, per round: two aggregations + two joins, all keyed by
  * node id — no `collect_set` of neighborhoods anywhere, so a hub node
  * (the min of a giant component) never materializes its neighbor list
  * in one task's memory. The min-per-node table has exactly one row per
  * node; Catalyst's aggregate size estimate conservatively prevents it
  * broadcasting, and every intermediate edge set is bounded by the
  * input edge count (both star operations only ever re-point existing
  * edges). A giant component does serialize its per-round re-pointing
  * through the tasks holding its root's hash bucket — inherent to the
  * algorithm's reducer and time-skew only: the probe side streams, the
  * build side is one row per node.
  *
  * Each round materializes through an EAGER `localCheckpoint`, not a
  * bare persist: each star round references its input several times
  * (union + swap + two joins), so the LOGICAL plan grows ~5x per round
  * — ten rounds of persist-only iteration produce a plan tree the
  * analyzer itself OOMs on. Checkpointing truncates lineage to the
  * materialized blocks. On a cluster, prefer
  * `sparkContext.setCheckpointDir` + reliable `checkpoint()` for
  * fault-tolerant truncation (localCheckpoint trades executor-loss
  * recovery for speed); the round structure is identical.
  */
object Clustering {

  /** Connected components over an undirected pair list. Returns one row
    * per distinct id appearing in `pairs`: (id, component), where
    * component = the smallest id reachable from `id` (so a component's
    * min labels itself). Ids must be castable to long.
    *
    * `maxIter` bounds the star rounds; the algorithm needs O(log n) and
    * the default allows components of ~2^40 nodes — exceeding it throws
    * rather than returning a half-contracted graph. */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
                          maxIter: Int = 40): DataFrame = {
    val init = pairs.select(col(a).cast("long").as("u"),
      col(b).cast("long").as("v"))
    val nodes = init.select(col("u").as("id"))
      .unionAll(init.select(col("v").as("id"))).distinct()

    // canonical form: larger endpoint first, self-loops dropped, distinct
    def canon(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()

    // large-star: every neighbor v > u re-points to m = min(N(u) ∪ {u}).
    // Formulated as agg + join: mins has one row per node, the join
    // streams the symmetric edge list past it.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("__mn"))
        .select(col("u"), least(col("__mn"), col("u")).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }

    // small-star: orient edges larger→smaller; every smaller neighbor
    // (and u itself) re-points to the minimum smaller neighbor.
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = or.groupBy("u").agg(min("v").as("m"))
      or.join(mins, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(mins.select(col("u"), col("m").as("v")))
    }

    var cur = canon(init).localCheckpoint(true)
    var nCur = cur.count()
    var it = 0
    var stable = false
    while (!stable && it < maxIter) {
      val next = canon(smallStar(largeStar(cur))).localCheckpoint(true)
      val nNext = next.count()
      // exact set equality (both sides distinct): same size + empty diff
      stable = nNext == nCur && next.except(cur).isEmpty
      cur.unpersist()
      cur = next; nCur = nNext; it += 1
    }
    if (!stable)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter star rounds")
    // fixpoint is a star forest: every edge is (member, component-min);
    // roots and isolated nodes label themselves
    val compOf = cur.select(col("u").as("id"), col("v").as("component"))
    val out = nodes.join(compOf, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
    out
  }

  /** Pairs → per-document keep/drop verdict: (id, component, keep) with
    * keep = (id == component min). Exactly the shape a training-data
    * filter joins against the corpus. */
  def dedupVerdicts(pairs: DataFrame, a: String, b: String,
                    maxIter: Int = 40): DataFrame =
    connectedComponents(pairs, a, b, maxIter)
      .withColumn("keep", col("id") === col("component"))
}
