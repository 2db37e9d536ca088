package graft.operators

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** ARPA model interchange ([[ArpaIO]]): byte-stable round trips for
  * canonical files, structural round trips for foreign spellings,
  * loud refusals at every malformed boundary, and the backoff walk
  * pinned on a hand-computed model. */
class ArpaIOSpec extends SparkSpec {

  // a tiny canonical model: order 2, unigrams a/b/<unk>, one bigram
  private val tiny = ArpaModel(2, IndexedSeq(
    Vector(("<unk>", -1.5, -0.39794), ("a", -0.3, -0.39794),
      ("b", -0.6, -0.39794)),
    Vector(("a b", -0.2, 0.0))))

  test("render -> parse -> render is byte-stable") {
    val text = ArpaIO.render(tiny)
    val back = ArpaIO.fromArpa(text)
    assert(back == tiny)
    assert(ArpaIO.render(back) == text)
  }

  test("export from counts round-trips and declares true counts") {
    val s = spark
    val train = Tables.documents(s, sf()).where(col("doc_id") % 3 =!= 0)
    val arpa = ArpaIO.toArpa(train, "text", 3)
    val m = ArpaIO.fromArpa(arpa)
    assert(ArpaIO.render(m) == arpa, "export -> import -> re-export drifted")
    assert(m.order == 3)
    // the <unk> entry is present and unigram probs are on the round-6
    // grid (parse(%.6f) is exact for grid values)
    assert(m.grams(0).exists(_._1 == ArpaIO.Unk))
    m.grams.flatten.foreach { case (g, lp, bo) =>
      assert(BigDecimal(lp).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble == lp, s"$g off-grid")
      assert(lp <= 0.0, s"$g has positive log10 prob")
    }
    // MLE conditionals: every top-order gram's prob > its backed-off
    // floor would be model-specific; instead pin section sizes against
    // the declared header (fromArpa already enforces; assert non-empty)
    assert(m.grams.forall(_.nonEmpty))
  }

  test("foreign spellings parse structurally: CRLF, missing backoff") {
    val text = "\\data\\\r\nngram 1=2\r\nngram 2=1\r\n\r\n" +
      "\\1-grams:\r\n-1.5\t<unk>\r\n-0.30\ta\t-0.5\r\n\r\n" +
      "\\2-grams:\r\n-0.2\ta a\r\n\r\n\\end\\\r\n"
    val m = ArpaIO.fromArpa(text)
    assert(m.grams(0) ==
      Vector(("<unk>", -1.5, 0.0), ("a", -0.3, -0.5)))
    assert(m.grams(1) == Vector(("a a", -0.2, 0.0)))
  }

  test("loud refusals at the boundary") {
    def bad(t: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](ArpaIO.fromArpa(t))
      assert(e.getMessage.toLowerCase.contains(needle),
        s"wanted '$needle' in: ${e.getMessage}")
    }
    bad("no header here", "data")
    // header count disagrees with section rows
    bad("\\data\\\nngram 1=2\n\n\\1-grams:\n-1.0\ta\n\n\\end\\\n",
      "declares")
    // duplicate gram
    bad("\\data\\\nngram 1=2\n\n\\1-grams:\n-1.0\ta\n-2.0\ta\n\n\\end\\\n",
      "duplicate")
    // NaN score
    bad("\\data\\\nngram 1=1\n\n\\1-grams:\nNaN\ta\n\n\\end\\\n",
      "non-finite")
    // backoff on the top order
    bad("\\data\\\nngram 1=1\n\n\\1-grams:\n-1.0\ta\t-0.4\n\n\\end\\\n",
      "top-order")
    // non-contiguous orders
    bad("\\data\\\nngram 2=1\n\n\\2-grams:\n-1.0\ta b\n\n\\end\\\n",
      "contiguous")
    // missing \end\
    bad("\\data\\\nngram 1=1\n\n\\1-grams:\n-1.0\ta\n\n", "end")
    // wrong gram arity for its section
    bad("\\data\\\nngram 1=1\n\n\\1-grams:\n-1.0\ta b\n\n\\end\\\n",
      "1-gram")
  }

  test("scoring refuses a model without <unk>") {
    val s = spark
    val m = ArpaModel(1, IndexedSeq(Vector(("a", -0.3, 0.0))))
    val docs = Tables.documents(s, sf()).limit(2)
    val e = intercept[IllegalArgumentException](
      ArpaIO.scoreAgainst(s, m, docs, "doc_id", "text").collect())
    assert(e.getMessage.contains("<unk>"))
  }

  test("backoff walk hand-check: present bigram, backed-off, OOV") {
    val s = spark
    import s.implicits._
    // doc "a b c": p1 'a' unigram (no penalty — full history at p=1);
    // p2 'a b' present bigram; p3 'b c': bigram absent, context 'b'
    // present => backoff(b) + lp1(c)? 'c' is OOV => backoff(b) + unk
    val m = ArpaModel(2, IndexedSeq(
      Vector(("<unk>", -2.0, -0.4), ("a", -0.5, -0.3), ("b", -0.7, -0.2)),
      Vector(("a b", -0.1, 0.0))))
    val out = ArpaIO.scoreAgainst(s, m,
        Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(out.getLong(1) == 3, "n_tokens")
    assert(out.getLong(2) == 1, "n_oov: only 'c'")
    assert(out.getLong(3) == 1, "n_backed: only p3")
    val expect = BigDecimal((-0.5) + (-0.1) + (-0.2 + -2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble / 3.0
    val got = out.getDouble(4)
    assert(math.abs(got - ((-0.5 - 0.1 - 2.2) / 3.0)) < 5e-4,
      s"avg_lp10 $got != ${(-0.5 - 0.1 - 2.2) / 3.0} (expect grid $expect)")
  }

  test("index-scored and ARPA-scored engines agree on who is OOV") {
    // the two scorers differ in smoothing arithmetic but MUST agree on
    // vocabulary membership — same tokenizer, same train split
    val s = spark
    val all = Tables.documents(s, sf())
    val tr = all.where(col("doc_id") % 3 =!= 0)
    val sc = all.where(col("doc_id") % 3 === 0)
    val viaCounts = CorpusStats.ngramLogProbAgainst(tr, sc, "doc_id",
        "text", 2).select("doc", "n_oov").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = ArpaIO.fromArpa(ArpaIO.toArpa(tr, "text", 2))
    val viaArpa = ArpaIO.scoreAgainst(s, m, sc, "doc_id", "text")
      .select("doc", "n_oov").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaArpa == viaCounts)
  }

  test("a literal '<unk>' token in SCORED text matches the model entry " +
      "(KenLM's vocabulary mapping), not OOV") {
    val s = spark
    import s.implicits._
    val m = ArpaModel(2, IndexedSeq(
      Vector(("<unk>", -2.0, -0.4), ("a", -0.5, -0.3)),
      Vector(("a a", -0.1, 0.0))))
    val out = ArpaIO.scoreAgainst(s, m,
        Seq((1L, "a <unk>")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(out.getLong(2) == 0, "literal <unk> is IN the vocabulary")
    // p2: bigram 'a <unk>' absent -> backoff(a) + lp(<unk>)
    assert(math.abs(out.getDouble(4) - ((-0.5) + (-0.3 - 2.0)) / 2.0)
      < 5e-4)
  }

  test("toArpa: over-bound corpora are refused by the bounded collect, " +
      "never shipped to the driver") {
    val s = spark
    val train = Tables.documents(s, sf()).where(col("doc_id") % 3 =!= 0)
    val e = intercept[IllegalArgumentException] {
      ArpaIO.toArpa(train, "text", 2, maxGrams = 8)
    }
    assert(e.getMessage.contains("ARPA bound"), e.getMessage)
  }
}
