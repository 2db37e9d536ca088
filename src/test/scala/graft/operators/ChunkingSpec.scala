package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  /** Local replay of the gear polynomial — an independent walk the
    * operator's Catalyst expression must agree with. */
  private def localChunks(text: String, w: Int = 16, p: Int = 31,
                          m: Long = 1L << 20, d: Int = 64, r: Int = 13)
      : Seq[(Int, Int)] = { // (start 1-based, len)
    val codes = text.codePoints().toArray
    val n = codes.length
    val pows = Iterator.iterate(1L)(_ * p % m).take(w).toArray
    val bnd = (w until n).filter { i => // i = 1-based boundary position
      val h = (0 until w).map(j => codes(i - 1 - j) * pows(j)).sum % m
      h % d == r
    }.map(_.toInt)
    val starts = 1 +: bnd.map(_ + 1)
    val ends = bnd :+ n
    starts.zip(ends).map { case (s, e) => (s, e - s + 1) }
  }

  test("boundaries agree with an independent local replay") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").limit(50)
    val got = Chunking.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = texts.toSeq.flatMap { case (id, t) =>
      localChunks(t).zipWithIndex.map { case ((s, l), k) =>
        (id, k.toLong, s.toLong, l.toLong) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
  }

  test("chunks tile the document exactly and hashes match content") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog " * 20))
      .toDF("doc_id", "text")
    val chunks = Chunking.cdcChunks(df).collect().sortBy(_.getLong(1))
    val text = df.head().getString(1)
    // tiling: starts/lens cover [1, n] with no gaps or overlaps
    assert(chunks.head.getLong(2) == 1L)
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) + a.getLong(3) == b.getLong(2), "gap/overlap")
    case _ => }
    assert(chunks.last.getLong(2) + chunks.last.getLong(3) - 1 == text.length)
    // hash identity: md5 of the exact substring
    chunks.foreach { c =>
      val sub = text.substring(c.getLong(2).toInt - 1,
        (c.getLong(2) + c.getLong(3)).toInt - 1)
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(c.getString(4) == md5hex)
    }
  }

  test("content-defined means an edit only moves nearby boundaries") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " * 30
    val edited = base.substring(0, 700) + "INSERTED NEW PARAGRAPH " +
      base.substring(700)
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val byDoc = Chunking.cdcChunks(df).collect().groupBy(_.getLong(0))
    val h1 = byDoc(1L).map(_.getString(4)).toSeq
    val h2 = byDoc(2L).map(_.getString(4)).toSeq
    // most chunk identities survive the edit (the CDC property); a
    // fixed-offset slicer would lose every chunk after position 700
    val shared = h1.toSet.intersect(h2.toSet).size
    assert(shared >= h1.size / 2, s"only $shared of ${h1.size} survive")
    assert(h1 != h2) // but the edit is visible
  }

  test("short and boundary-free documents are one whole-doc chunk") {
    val df = Seq((1L, "tiny"), (2L, "x" * 200)).toDF("doc_id", "text")
    val chunks = Chunking.cdcChunks(df).collect()
    // "tiny" is under the window; 200×'x' hits residue 13 never or
    // everywhere — either way determinism holds; just assert tiling
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc(1L).length == 1 && byDoc(1L).head.getLong(3) == 4L)
    assert(byDoc(2L).map(_.getLong(3)).sum == 200L)
  }

  test("duplicate chunks surface across documents") {
    val shared = "this licence block repeats verbatim in every file " * 4
    val df = Seq(
      (1L, "unique preamble one " * 10 + shared),
      (2L, "another distinct head " * 10 + shared),
      (3L, "totally unrelated text without the block " * 8))
      .toDF("doc_id", "text")
    val dups = Chunking.chunkDuplicates(df).collect()
    assert(dups.nonEmpty, "shared block produced no duplicate chunks")
    assert(dups.forall(_.getLong(1) >= 2))
    // and the duplicate hashes really come from the shared tail
    val c1 = Chunking.cdcChunks(df.filter($"doc_id" === 1)).collect()
      .map(_.getString(4)).toSet
    val c3 = Chunking.cdcChunks(df.filter($"doc_id" === 3)).collect()
      .map(_.getString(4)).toSet
    dups.foreach(d => assert(c1.contains(d.getString(0)) ||
      !c3.contains(d.getString(0))))
  }

  test("the plan is shuffle-free for chunking, one exchange for dedup") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val chunkPlan = Chunking.cdcChunks(docs).queryExecution
      .executedPlan.toString
    assert(!chunkPlan.contains("Exchange"), s"unexpected shuffle:\n$chunkPlan")
    val dedupPlan = Chunking.chunkDuplicates(docs).queryExecution
      .executedPlan.toString
    assert("Exchange".r.findAllIn(dedupPlan).size <= 2, // hash agg + AQE read
      s"too many shuffles:\n$dedupPlan")
  }
}
