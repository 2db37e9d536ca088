package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style invariants for the round's kernels over MANY random
  * inputs — including non-ASCII — not just the fixture vectors. Cases
  * generate from a fixed seed so failures reproduce. */
class ChunkingPropertiesSpec extends SparkSpec {

  private def cases[A](n: Int)(gen: scala.util.Random => A)
                      (body: A => Unit): Unit = {
    val rnd = new scala.util.Random(20260814L)
    (1 to n).foreach { i =>
      val c = gen(rnd)
      try body(c)
      catch {
        case e: Throwable =>
          throw new AssertionError(s"case #$i failed for input $c", e)
      }
    }
  }

  /** Random text drawing from ASCII, Latin-1 accents, CJK and a few
    * astral (surrogate-pair) codepoints — the unicode surface the
    * codepoint contract must hold on. */
  private def randomText(r: scala.util.Random, maxLen: Int): String = {
    val pools = Array(
      ('a' to 'z') ++ ('0' to '9') :+ ' ' :+ ' ' :+ ' ',
      "àâçéèêëîïôùûüñ".toSeq,
      "中文字符集合测试".toSeq,
      Seq.empty) // astral handled below
    val sb = new StringBuilder
    val n = r.nextInt(maxLen)
    (0 until n).foreach { _ =>
      r.nextInt(10) match {
        case 9 => sb.appendAll(Character.toChars(0x1F600 + r.nextInt(16)))
        case k =>
          val pool = pools(if (k < 7) 0 else if (k < 9) 1 else 2)
          sb.append(pool(r.nextInt(pool.length)))
      }
    }
    sb.toString
  }

  /** Independent Scala reference of the gear boundary definition
    * (direct windowed sum over codepoints — NOT the kernel's rolling
    * recurrence, so agreement also re-proves the recurrence). */
  private def refBoundaries(text: String, w: Int = 16, p: Long = 31,
                            m: Long = 1L << 20, d: Long = 64,
                            res: Long = 13): Seq[Int] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val pows = Iterator.iterate(1L)(_ * p % m).take(w).toArray
    (w until n).filter { i => // boundary position i (1-based), i < n
      val h = (0 until w).map(j => cps(i - 1 - j) * pows(j) % m).sum % m
      h % d == res
    }
  }

  test("property: CDC chunks tile every random unicode document") {
    val s = spark
    import s.implicits._
    cases(10) { r =>
      (1 to 30).map(i => (i.toLong, randomText(r, 400)))
    } { docs =>
      val df = docs.toDF("doc_id", "text")
      val chunks = Chunking.cdcChunks(df).collect()
        .groupBy(_.getLong(0))
      docs.foreach { case (id, text) =>
        val n = text.codePointCount(0, text.length)
        val mine = chunks.getOrElse(id, Array.empty).sortBy(_.getLong(1))
        // tiling: starts at 1, contiguous, ends at n (codepoints)
        if (mine.nonEmpty) {
          assert(mine.head.getLong(2) == 1L)
          mine.sliding(2).foreach {
            case Array(a, b) =>
              assert(a.getLong(2) + a.getLong(3) == b.getLong(2))
            case _ =>
          }
          assert(mine.last.getLong(2) + mine.last.getLong(3) - 1 == n,
            s"doc $id len $n vs ${mine.last}")
        }
        // boundary positions equal the independent direct-sum reference
        val bnd = mine.drop(1).map(_.getLong(2) - 1).toSeq
        assert(bnd == refBoundaries(text).map(_.toLong),
          s"doc $id boundaries diverge")
      }
    }
  }

  test("property: BPE fold apply equals the reference for random merges") {
    val s = spark
    import s.implicits._
    cases(8) { r =>
      val words = (1 to 12).map(_ =>
        (1 to (1 + r.nextInt(8))).map(_ => ('a' + r.nextInt(4)).toChar)
          .mkString)
      val merges = Seq.fill(3)(
        (('a' + r.nextInt(4)).toChar.toString,
          ('a' + r.nextInt(4)).toChar.toString))
      (words, merges)
    } { case (words, merges) =>
      def foldRef(syms: List[String], l: String, rr: String): List[String] =
        syms.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == rr)
            acc.dropRight(1) :+ (l + rr)
          else acc :+ x
        }
      val want = words.map { w =>
        merges.foldLeft(w.map(_.toString).toList) {
          case (sy, (l, rr)) => foldRef(sy, l, rr)
        }.length.toLong
      }.sum
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = Subword.bpeEncode(docs, "doc_id", "text", merges)
        .collect().head.getLong(1)
      assert(got == want, s"$got != $want for $words / $merges")
    }
  }

  test("property: tokenWindows covers every token exactly with stride " +
      "steps for random (n, size, stride)") {
    val s = spark
    import s.implicits._
    cases(40) { r =>
      val n = r.nextInt(60)
      val size = 1 + r.nextInt(12)
      (n, size, 1 + r.nextInt(size)) // 1 <= stride <= size
    } { case (n, size, stride) =>
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val got = Chunking.tokenWindows(df, size = size, stride = stride)
        .orderBy("win")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      if (n == 0) assert(got.isEmpty)
      else {
        // starts advance by exactly stride from 0
        assert(got.map(_._2).toSeq ==
          got.indices.map(_ * stride.toLong))
        // every window is full except possibly the last, which is
        // clipped to the tail; the last window ends exactly at n
        got.dropRight(1).foreach { case (_, _, len) =>
          assert(len == size) }
        val (_, lastStart, lastLen) = got.last
        assert(lastStart + lastLen == n.toLong)
        // window count is the closed-form contract
        val want = 1 + math.ceil(math.max(n - size, 0) / stride.toDouble).toLong
        assert(got.length.toLong == want, s"count ${got.length} != $want")
      }
    }
  }

  test("property: normalizeText is idempotent and NFC-equivalent") {
    cases(12) { r => randomText(r, 200) } { text =>
      val s = spark
      import s.implicits._
      def norm(t: String): String =
        Seq(t).toDF("text")
          .select(graft.functions.TextFunctions.normalizeText(col("text")))
          .collect()(0).getString(0)
      val once = norm(text)
      assert(norm(once) == once, "not idempotent")
      // reference: java.text.Normalizer directly, same op order
      val ref = java.text.Normalizer
        .normalize(text, java.text.Normalizer.Form.NFC)
        .toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ").trim
      assert(once == ref)
    }
  }
}
