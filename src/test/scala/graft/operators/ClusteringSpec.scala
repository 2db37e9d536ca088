package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  /** Driver-side union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-label canonicalization
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = ids.groupBy(find)
    byRoot.flatMap { case (_, member) =>
      val m = member.min; member.map(_ -> m)
    }.toMap
  }

  /** driverEdgeCap=0 forces the distributed star path — comparing the
    * default (driver union-find) against the spec's own union-find
    * would be circular. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Clustering.connectedComponents(edges.toDF("d1", "d2"), "d1", "d2",
        driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components match union-find on adversarial graph shapes") {
    // chain (worst case for label propagation), star, cycle, two merged
    // blobs, self-loop, singleton pair, non-contiguous ids
    val chain = (0L until 60L).map(i => (i * 1000 + 7, (i + 1) * 1000 + 7))
    val star = (1L to 20L).map(i => (500000L, 500000L + i))
    val cycle = (0L until 9L).map(i => (900000L + i, 900000L + (i + 1) % 9))
    val blobs = Seq((70L, 71L), (71L, 72L), (80L, 81L), (81L, 82L), (72L, 80L))
    val selfLoop = Seq((999L, 999L))
    val single = Seq((123456789L, 123456790L))
    for (edges <- Seq(chain, star, cycle, blobs, selfLoop, single,
                      chain ++ star ++ cycle ++ blobs ++ selfLoop ++ single)) {
      val got = run(edges)
      val want0 = unionFind(edges.filter(e => e._1 != e._2))
      // self-loop-only nodes are their own component
      val loopOnly = edges.filter(e => e._1 == e._2).map(_._1)
        .filterNot(want0.contains).map(i => i -> i).toMap
      assert(got == want0 ++ loopOnly, s"edges=$edges")
    }
  }

  test("components match union-find on random graphs (seeded)") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 5) {
      val n = 50 + trial * 30
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong * 31, rnd.nextInt(40).toLong * 31)
      }.filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(edges), s"trial=$trial")
    }
  }

  test("driver union-find path and distributed star path agree") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val edges = (Seq.fill(120)((rnd.nextInt(60).toLong * 13,
        rnd.nextInt(60).toLong * 13)) ++
      (0L until 30L).map(i => (i * 7 + 100000, (i + 1) * 7 + 100000)))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("d1", "d2")
    val viaDriver = Clustering.connectedComponents(df, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStars = Clustering.connectedComponents(df, "d1", "d2",
        driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaStars)
  }

  test("dedupVerdicts keeps exactly one doc per component") {
    val s = spark
    import s.implicits._
    val pairs = Seq((3L, 1L), (1L, 2L), (10L, 11L)).toDF("d1", "d2")
    val v = Clustering.dedupVerdicts(pairs, "d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(v == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("driver path survives a deep chain delivered worst-case-order") {
    // a chain component whose edges arrive end-first builds a parent
    // chain as deep as the component in the driver union-find; the
    // iterative find must handle it (a recursive one overflows the
    // stack around ~10-20k frames, well under the 2M-edge cap)
    val s = spark
    import s.implicits._
    val n = 30000L
    val edges = (n - 1 to 0L by -1).map(k => (k, k + 1))
    val got = Clustering.connectedComponents(edges.toDF("d1", "d2"),
        "d1", "d2")
      .agg(countDistinct(col("component")), count(lit(1))).collect()(0)
    assert(got.getLong(0) == 1L && got.getLong(1) == n + 1)
  }

  test("convergence failure is loud, not a half-contracted result") {
    val s = spark
    import s.implicits._
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      Clustering.connectedComponents(chain, "d1", "d2", maxIter = 1,
        driverEdgeCap = 0L)
    }
  }

  test("bestOfCluster keeps the best-scoring member, singletons survive") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, 0.3), (2L, 0.9), (3L, 0.5), // cluster {1,2,3}
      (10L, 0.7), (11L, 0.7),                       // cluster {10,11}: tie
      (20L, 0.1))                                   // singleton
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val got = Clustering.bestOfCluster(docs, pairs, "doc_id", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // highest score survives, not the min id
    assert(got(2L) == ((1L, true)) && !got(1L)._2 && !got(3L)._2)
    // score tie broken by id
    assert(got(10L) == ((10L, true)) && got(11L) == ((10L, false)))
    // a doc in no pair is its own component and survives
    assert(got(20L) == ((20L, true)))
    // exactly one survivor per component
    val byComp = got.values.groupBy(_._1)
    assert(byComp.forall(_._2.count(_._2) == 1))
    // distributed-star path agrees with the driver union-find path
    val dist = Clustering.bestOfCluster(docs, pairs, "doc_id", "score",
        driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(dist == got)
  }
}
