package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * - [[bruteForceKnn]]: exact top-k by cosine — the correctness baseline.
  *   Query side is broadcast (queries << corpus), so the corpus is scanned
  *   once with no shuffle of the big side; per-partition top-k then a final
  *   k-merge via window rank.
  * - [[ivfKnn]]: inverted-file ANN — assign every corpus vector to its
  *   nearest centroid (broadcast centroids), then search only the query's
  *   `nProbe` closest cells. At 100 TB the corpus is bucketed/partitioned
  *   by cell id, so a query touches nProbe partitions instead of all.
  * - [[cosineLshBuckets]]: random-hyperplane signature for LSH bucketing —
  *   deterministic planes derived from xxhash64, so signatures are
  *   reproducible across runs/engines.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query vector.
    * Output: (qid, rank, cid, sim). Ties broken by ascending cid. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, id: String,
                    vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("qid"), asDoubles(col(vec)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val c = corpus.select(col(id).as("cid"), asDoubles(col(vec)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val sims = c.join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("cid"),
        round(col("sim"), 4).as("sim"))
  }

  /** Assign each vector to its nearest centroid by cosine (ties: lowest
    * centroid id). Centroids are broadcast. Output: df + (cell, cellSim). */
  def assignCells(df: DataFrame, id: String, vec: String,
                  centroids: DataFrame, cid: String, cvec: String): DataFrame = {
    val c = centroids.select(col(cid).as("__cell"), asDoubles(col(cvec)).as("__cv"))
      .withColumn("__cvn", l2Norm(col("__cv")))
    val w = Window.partitionBy(col(id)).orderBy(col("__csim").desc, col("__cell").asc)
    df.withColumn("__v", asDoubles(col(vec)))
      .withColumn("__vn", l2Norm(col("__v")))
      .join(broadcast(c), lit(true))
      .withColumn("__csim",
        dot(col("__v"), col("__cv")) / (col("__vn") * col("__cvn")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__v", "__vn", "__cv", "__cvn", "__rn")
      .withColumnRenamed("__cell", "cell")
      .withColumnRenamed("__csim", "cell_sim")
  }

  /** IVF ANN: top-k within the query's own cell (nProbe=1) or its nProbe
    * nearest cells. Output: (qid, rank, cid, sim) — same contract as
    * [[bruteForceKnn]] but approximate (only vectors sharing a probed cell
    * are considered). */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, id: String, vec: String,
             centroids: DataFrame, centId: String, centVec: String,
             k: Int, nProbe: Int = 1): DataFrame = {
    val c = centroids.select(col(centId).as("__cell"),
        asDoubles(col(centVec)).as("__cv"))
      .withColumn("__cvn", l2Norm(col("__cv")))
    // corpus cell assignment (nearest centroid)
    val corpusCells = assignCells(corpus, id, vec, centroids, centId, centVec)
      .select(col(id).as("cid"), asDoubles(col(vec)).as("cv"), col("cell"))
      .withColumn("cn", l2Norm(col("cv")))
    // query probes: its nProbe nearest centroids
    val qw = Window.partitionBy(col("qid")).orderBy(col("__csim").desc, col("__cell").asc)
    val probes = queries.select(col(id).as("qid"), asDoubles(col(vec)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
      .join(broadcast(c), lit(true))
      .withColumn("__csim",
        dot(col("qv"), col("__cv")) / (col("qn") * col("__cvn")))
      .withColumn("__rn", row_number().over(qw))
      .where(col("__rn") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("__cell").as("cell"))
    val sims = corpusCells.join(broadcast(probes), Seq("cell"))
      .where(col("cid") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("cid"),
        round(col("sim"), 4).as("sim"))
  }

  /** Train IVF centroids with MLlib k-means (seeded — deterministic).
    * At 100 TB: train on a sample (k-means|| init is already
    * sample-friendly), persist the centroids, and bucket the corpus by
    * [[assignCells]] so queries touch nProbe cells. Returns
    * (cell: int, centroid: array<double>). */
  def trainCentroids(corpus: DataFrame, vec: String, k: Int,
                     seed: Long = 42L, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val train = corpus.select(
      array_to_vector(asDoubles(col(vec))).as("features"))
    val n = train.count()
    require(n >= k,
      s"cannot train $k centroids from $n vectors (need at least k)")
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(train)
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toSeq.toDF("cell", "centroid")
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits of dot products
    * with pseudo-random planes. Planes come from a fixed-seed PRNG
    * (java.util.Random is spec-fixed, so signatures are deterministic
    * across runs and JVMs) and are embedded as array literals, so each
    * bit is one codegen'd dot-product loop. Vectors with high cosine
    * share bucket bits with high probability. Returns a bigint bucket. */
  def cosineLshBuckets(vec: Column, dim: Int, nBits: Int): Column = {
    val v = asDoubles(vec)
    val rnd = new java.util.Random(42L + dim * 1000L + nBits)
    val bits = (0 until nBits).map { i =>
      val plane = Seq.fill(dim)(rnd.nextDouble() * 2.0 - 1.0)
      when(dot(v, typedLit(plane)) > 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH bucketing: candidates = pairs sharing a bucket, verified
    * exactly. Output: (qid, rank, cid, sim) limited to bucket-mates. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, id: String, vec: String,
             dim: Int, nBits: Int, k: Int): DataFrame = {
    val bq = queries.select(col(id).as("qid"), asDoubles(col(vec)).as("qv"),
        cosineLshBuckets(col(vec), dim, nBits).as("bucket"))
      .withColumn("qn", l2Norm(col("qv")))
    val bc = corpus.select(col(id).as("cid"), asDoubles(col(vec)).as("cv"),
        cosineLshBuckets(col(vec), dim, nBits).as("bucket"))
      .withColumn("cn", l2Norm(col("cv")))
    val sims = bc.join(broadcast(bq), Seq("bucket"))
      .where(col("cid") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("cid"),
        round(col("sim"), 4).as("sim"))
  }
}
