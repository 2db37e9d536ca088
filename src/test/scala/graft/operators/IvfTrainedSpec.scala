package graft.operators

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Trained IVF: k-means centroids + probed search. Recall is measured
  * against exact brute force — the quantitative check that the ANN path
  * is a usable approximation, not just runnable. */
class IvfTrainedSpec extends SparkSpec {

  test("k-means IVF achieves reasonable top-3 recall with nProbe=4") {
    val s = spark
    val emb = Tables.embeddings(s, sf())
    // the gate configuration: centroids trained on a seeded half-sample
    // with random init (the 100 TB contract — k-means needs a sample,
    // not the corpus; random init is the faiss-style quantizer recipe)
    val cent = Similarity.trainCentroids(emb, "embedding", 16,
      maxIter = 10, sampleFraction = 0.5, initMode = "random")
    assert(cent.count() == 16)
    val queries = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.ivfKnn(queries, emb, "vec_id", "embedding",
        cent, "cell", "centroid", 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random 64-d embeddings are a worst case for clustering; probing
    // 4 of 16 cells must still beat the 25% random-cell floor clearly
    assert(recall >= 0.4, s"recall $recall too low")
    // determinism: same seed -> same sample -> same centroids
    val cent2 = Similarity.trainCentroids(emb, "embedding", 16,
      maxIter = 10, sampleFraction = 0.5, initMode = "random")
    val a = cent.orderBy("cell").collect().map(_.getSeq[Double](1))
    val b = cent2.orderBy("cell").collect().map(_.getSeq[Double](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("exhaustive probe (nProbe = #cells) makes trained IVF exact") {
    // the q_knn_ivf_trained_exact gate: probing every cell scans every
    // corpus vector exactly once (each sits in one cell), so the result
    // must equal brute force whatever k-means produced — which is what
    // licenses the gate's brute-force SQL oracle
    val s = spark
    val emb = Tables.embeddings(s, sf())
    val cent = Similarity.trainCentroids(emb, "embedding", 16,
      maxIter = 10, sampleFraction = 0.5, initMode = "random")
    val queries = emb.where(col("vec_id") < 20)
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val exact = tuples(
      Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 3))
    val exhaustive = tuples(Similarity.ivfKnn(queries, emb, "vec_id",
      "embedding", cent, "cell", "centroid", 3, nProbe = 16))
    assert(exhaustive == exact)
  }

  test("recall certificate certifies the gate config and fails loudly") {
    // the q_knn_ivf_trained gate: exhaustive-probe rows + a one-row
    // certificate that the pruned probe recalls >= floor of them
    val s = spark
    val emb = Tables.embeddings(s, sf())
    val cent = Similarity.trainCentroids(emb, "embedding", 16,
      maxIter = 10, sampleFraction = 0.5, initMode = "random")
    val q = emb.where(col("vec_id") < 5)
    val exact = Similarity.ivfKnn(q, emb, "vec_id", "embedding",
      cent, "cell", "centroid", 3, nProbe = 16)
    val approx = Similarity.ivfKnn(q, emb, "vec_id", "embedding",
      cent, "cell", "centroid", 3, nProbe = 4)
    def ok(cert: org.apache.spark.sql.DataFrame): Boolean = {
      val rows = cert.collect()
      assert(rows.length == 1 && cert.columns.toSeq == Seq("recall_ok"))
      rows(0).getBoolean(0)
    }
    // gate floor holds at every test sf (measured 5/15 at sf0.001)
    assert(ok(Similarity.recallCertificate(exact, approx, 0.3)))
    // an unattainable floor flips it false (loud hash-compare failure)
    assert(!ok(Similarity.recallCertificate(exact, approx, 1.01)))
    // zero hits certify false, not null
    val disjoint = approx.withColumn("cid", col("cid") + lit(1000000L))
    assert(!ok(Similarity.recallCertificate(exact, disjoint, 0.01)))
  }
}
