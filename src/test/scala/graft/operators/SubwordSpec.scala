package graft.operators

import graft.SparkSpec

class SubwordSpec extends SparkSpec {

  private val vocab = Seq("a", "b", "d", "e", "l", "p", "val", "wind",
    "ow", "str", "eam", "ab", "bc")
  private def tok(w: String) =
    Subword.tokenizeWord(w, vocab.toSet, vocab.map(_.length).max)

  test("tokenizeWord: greedy longest-match with single-char unk fallback") {
    assert(tok("window") == List("wind", "ow"))
    assert(tok("stream") == List("str", "eam"))
    assert(tok("value") == List("val", Subword.Unk, "e"))
    assert(tok("dup") == List("d", Subword.Unk, "p"))
    // fully uncovered word: one unk per char
    assert(tok("zzz") == List(Subword.Unk, Subword.Unk, Subword.Unk))
    assert(tok("") == Nil)
    // GREEDY, not optimal: "abc" takes "ab" (longest at pos 0) and
    // degrades 'c', even though a+bc would cover it fully — the
    // documented wordpiece-inference semantics both engines replay
    assert(tok("abc") == List("ab", Subword.Unk))
  }

  test("pieceCounts weights per-word pieces by occurrence") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "window window value"), (2L, "dup"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Subword.pieceCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: 2*(wind,ow) + (val,unk,e) = 7 pieces, 1 unk
    // doc 2: d,unk,p = 3 pieces, 1 unk; doc 3: no tokens -> no row
    assert(got == Set((1L, 7L, 1L), (2L, 3L, 1L)))
  }

  test("pieceFrequencies collapses unks and preserves totals") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "window window value"), (2L, "dup value"))
      .toDF("doc_id", "text")
    val got = Subword.pieceFrequencies(docs, "text", vocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("wind" -> 2L, "ow" -> 2L, "val" -> 2L, "e" -> 2L,
      Subword.Unk -> 3L, "d" -> 1L, "p" -> 1L))
    // totals agree with pieceCounts
    val totals = Subword.pieceCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.values.sum == totals.map(_._1).sum)
    assert(got(Subword.Unk) == totals.map(_._2).sum)
  }

  test("empty or degenerate vocab fails loudly") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Subword.pieceCounts(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Subword.pieceFrequencies(docs, "text", Seq("a", ""))
    }
  }

  test("topNgramPieces: occurrence-weighted candidates, ties by piece") {
    val s = spark
    import s.implicits._
    // words: abc x1, ab x2 -> pieces ab=1+2=3, bc=1, abc=1
    val docs = Seq((1L, "abc ab"), (2L, "ab")).toDF("doc_id", "text")
    val got = Subword.topNgramPieces(docs, "text", 2, 3, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("ab", 3L, 1), ("abc", 1L, 2)),
      s"got ${got.toSeq}")
    // the global top-k must be a bounded heap, not a full sort
    val plan = Subword.topNgramPieces(docs, "text", 2, 3, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not planner-bounded:\n$plan")
    intercept[IllegalArgumentException] {
      Subword.topNgramPieces(docs, "text", 3, 2, 5)
    }
  }

  test("tokenization runs per distinct word: plan shuffles words, not docs") {
    val s = spark
    import s.implicits._
    // the distinct-word frame feeding the mapPartitions walk must sit
    // behind its own aggregate — the plan contains the (doc, w) count
    // agg AND a distinct over w, and the final agg groups by doc
    val docs = (0L until 50L).map(i => (i, "window value " * 5))
      .toDF("doc_id", "text")
    val plan = Subword.pieceCounts(docs, "doc_id", "text", vocab)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("SerializeFromObject"),
      "expected the typed per-word walk in the plan")
  }
}
