package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(c).collect()(0).get(0)
  }

  test("tokens lower-case, split and drop empties") {
    assert(one("  Hello   World ", tokens(col("text")))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("hello", "world"))
    assert(one("", tokens(col("text")))
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("word shingles") {
    assert(one("a b c d", wordShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq.sorted ==
      Seq("a b c", "b c d"))
    assert(one("a b", wordShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("bpe-ish token count: words, digits, punctuation") {
    assert(one("ab 12, c!", bpeishTokenCount(col("text"))) == 6)
  }

  test("language id heuristics") {
    assert(one("the cat is on the mat and it is happy",
      langId(col("text"))) == "en")
    assert(one("der hund ist nicht auf und mit das",
      langId(col("text"))) == "de")
    assert(one("xyzzy qwerty plugh", langId(col("text"))) == "und")
    assert(one("一二三", langId(col("text"))) == "zh")
  }

  test("quality score stays in [0,1]") {
    val s = spark
    import s.implicits._
    val docs = graft.engine.Tables.documents(s, sf())
    val stats = docs.select(qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).collect()(0)
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val s = spark
    import s.implicits._
    val fps = Seq("Hello  World", "hello world ").toDF("text")
      .select(fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0).matches("[0-9a-f]{32}"))
  }

  test("md5 kernel is byte-identical to the composed builtin form") {
    val s = spark
    import s.implicits._
    // the recipe the DuckDB oracle replicates — the kernel must match it
    // byte-for-byte, including Unicode lowercase, mixed whitespace,
    // leading/trailing runs, empty strings and NULLs
    def composed = md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))
      .cast("binary"))
    val edge = Seq("", " ", "  \t\n ", "Hello  World", "ÜBER  Straße",
      "ΑΛΦΑ βήτα", "tab\there\r\nnewline", "mixedvtab", "日本語 テスト",
      null.asInstanceOf[String]).toDF("text")
    val rows = edge.select(fingerprint(col("text")).as("k"),
        composed.as("c")).collect()
    rows.foreach { r => assert(r.get(0) == r.get(1), s"mismatch: $r") }
    // and over the real corpus
    val docs = graft.engine.Tables.documents(s, sf())
    val bad = docs.select(fingerprint(col("text")).as("k"), composed.as("c"))
      .where(col("k") =!= col("c")).count()
    assert(bad == 0L)
  }
}
