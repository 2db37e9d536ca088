package graft.operators

import graft.SparkSpec

/** Seeded randomized parity for the as-of join: any mix of keys and
  * timestamps (distinct per key — equal-ts ties among right rows are
  * sort-order-defined and excluded from generation) must match a naive
  * driver-side reference. */
class AsOfJoinPropertySpec extends SparkSpec {

  test("property: as-of join equals naive reference on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { round =>
      val keys = Seq("a", "b", "c")
      def side(n: Int, idBase: Long) = (0 until n).map { i =>
        (idBase + i, keys(rnd.nextInt(keys.length)), rnd.nextInt(1000).toLong)
      }
      // distinct ts per (key, side-union) to avoid tie ambiguity
      val all = scala.collection.mutable.Set.empty[(String, Long)]
      def dedupTs(rows: Seq[(Long, String, Long)]) = rows.flatMap {
        case (id, k, t0) =>
          var t = t0
          var tries = 0
          while (all.contains((k, t)) && tries < 2000) { t += 1; tries += 1 }
          if (all.add((k, t))) Some((id, k, t)) else None
      }
      val leftRows = dedupTs(side(30, 1000))
      val rightRows = dedupTs(side(20, 9000))
        .map { case (id, k, t) => (id, k, t, rnd.nextDouble()) }
      val left = leftRows.toDF("eid", "k", "t")
      val right = rightRows.toDF("rid", "k", "t", "v")
      val got = AsOfJoin.asOf(left, right, "k", "t",
          Map("rid_asof" -> "rid", "v_asof" -> "v"))
        .collect()
        .map(r => r.getAs[Long]("eid") ->
          Option(r.getAs[java.lang.Long]("rid_asof")).map(_.toLong))
        .toMap
      val expected = leftRows.map { case (eid, k, t) =>
        eid -> rightRows.filter(r => r._2 == k && r._3 <= t)
          .sortBy(_._3).lastOption.map(_._1)
      }.toMap
      assert(got == expected, s"round $round mismatch")

      // FORWARD: earliest right at-or-after
      val gotF = AsOfJoin.asOfForward(left, right, "k", "t",
          Map("rid_next" -> "rid"))
        .collect()
        .map(r => r.getAs[Long]("eid") ->
          Option(r.getAs[java.lang.Long]("rid_next")).map(_.toLong))
        .toMap
      val expectedF = leftRows.map { case (eid, k, t) =>
        eid -> rightRows.filter(r => r._2 == k && r._3 >= t)
          .sortBy(_._3).headOption.map(_._1)
      }.toMap
      assert(gotF == expectedF, s"round $round forward mismatch")

      // NEAREST: min |distance|, ties to the preceding row
      val gotN = AsOfJoin.asOfNearest(left, right, "k", "t",
          Map("rid_near" -> "rid"))
        .collect()
        .map(r => r.getAs[Long]("eid") ->
          Option(r.getAs[java.lang.Long]("rid_near")).map(_.toLong))
        .toMap
      val expectedN = leftRows.map { case (eid, k, t) =>
        val cands = rightRows.filter(_._2 == k)
        eid -> (if (cands.isEmpty) None
        else {
          // sort by (distance, prefer backward, ts) — backward wins ties
          val best = cands.minBy(r =>
            (math.abs(r._3 - t), if (r._3 <= t) 0 else 1))
          Some(best._1)
        })
      }.toMap
      assert(gotN == expectedN, s"round $round nearest mismatch")
    }
  }
}
