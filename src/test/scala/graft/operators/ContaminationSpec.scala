package graft.operators

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {

  private def run(bloom: Boolean, expectedItems: Long = 4000000L,
                  maxNumBits: Long = 256L * 1024 * 1024) = {
    val corpus = Tables.documents(spark, sf())
    val bench = corpus.where(col("doc_id") < 10)
    val out =
      if (bloom)
        Contamination.flagContaminatedBloom(corpus, "doc_id", "text",
          bench, "doc_id", "text", 8,
          expectedItems = expectedItems, maxNumBits = maxNumBits)
      else
        Contamination.flagContaminated(corpus, "doc_id", "text",
          bench, "doc_id", "text", 8)
    out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("bloom path equals the exact broadcast path bit-for-bit") {
    val exact = run(bloom = false)
    assert(exact.nonEmpty, "fixture must produce overlaps")
    assert(run(bloom = true) == exact)
  }

  test("a deliberately undersized sketch (fpp ~ 1) stays exact") {
    // 64 bits for thousands of shingles: nearly every probe is a false
    // positive — the verify join must kill them all
    val exact = run(bloom = false)
    assert(run(bloom = true, expectedItems = 10L, maxNumBits = 64L) == exact)
  }

  test("empty benchmark yields an empty result") {
    val corpus = Tables.documents(spark, sf())
    val bench = corpus.where(col("doc_id") < 0)
    val out = Contamination.flagContaminatedBloom(corpus, "doc_id", "text",
      bench, "doc_id", "text", 8)
    assert(out.count() == 0L)
  }

  test("sketch sizing honors expectedItems past Spark's silent conf caps") {
    // Spark's BloomFilterAggregate clamps to
    // runtime.bloomFilter.maxNumItems/maxNumBits (4e6 items / 64 Mi
    // bits = 8 MiB) — the operator must raise the caps for its build so
    // a large-benchmark sizing is honored, then restore the caller's
    // values. 8e6 items at fpp 0.01 needs ~76.7 M bits > the 8 MiB cap.
    val corpus = Tables.documents(spark, sf())
    val bench = corpus.where(col("doc_id") < 10)
    val before = spark.conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val out = Contamination.flagContaminatedBloom(corpus, "doc_id", "text",
      bench, "doc_id", "text", 8, expectedItems = 8000000L, fpp = 0.01)
    // force the bloom build + full plan
    assert(out.count() ==
      Contamination.flagContaminated(corpus, "doc_id", "text",
        bench, "doc_id", "text", 8).count())
    assert(spark.conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits") == before,
      "caller conf must be restored after the sketch build")
  }

  test("corpus side is pruned by might_contain BEFORE the verify join") {
    val corpus = Tables.documents(spark, sf())
    val bench = corpus.where(col("doc_id") < 10)
    val df = Contamination.flagContaminatedBloom(corpus, "doc_id", "text",
      bench, "doc_id", "text", 8)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"expected a bloom prune filter in:\n$p")
    // the prune is a scan-side filter: it must appear below the join in
    // the plan tree (joins print above their children)
    val joinIdx = p.indexOf("Join")
    val bloomIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      s"might_contain should sit under the join:\n$p")
  }

  test("streamed decontamination hits equal the batch run (stateless " +
      "replay), and roll up to the exact per-doc counts") {
    implicit val s = spark
    val corpus = Tables.documents(spark, sf())
    val bench = corpus.where(col("doc_id") < 10)
    val streamed = graft.streaming.StreamingContamination.hitsReplay(
        corpus, "doc_id", "text", bench, "doc_id", "text", 8,
        pmod(col("doc_id"), lit(3)), 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = Contamination.decontaminateStream(
        corpus.select(col("doc_id").as("id"), col("text")),
        "id", "text", bench, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch, "replay diverges from the batch hits")
    assert(streamed.nonEmpty, "fixture corpus must produce hits")
    // the hit stream rolls up to exactly flagContaminated's counts
    val rolled = streamed.groupBy(_._1).view.mapValues(_.size).toMap
    val exact = run(bloom = false).toMap.map { case (d, n) => d -> n.toInt }
    assert(rolled == exact, "rollup diverges from flagContaminated")
    // bench docs never emit hits (their shingles trivially match)
    assert(streamed.forall(_._1 >= 10))
  }

  test("fuzzy path catches a paraphrased leak the exact path misses") {
    val s = spark
    import s.implicits._
    // 28 distinct words; substitutions at positions 7/14/21/28 put one
    // inside EVERY 8-word window (no exact 8-gram survives) while
    // killing only 10 of the 26 3-shingles: jaccard = 16/36 ~ 0.444 —
    // the structural ceiling for all-8-grams-broken is ~0.4-0.45, which
    // is why the fuzzy default threshold sits at 0.35
    val benchText = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey xray yankee zulu anchor breeze"
    val leaked = benchText.replace("golf", "golfx")
      .replace("november", "novx").replace("uniform", "unix")
      .replace("breeze", "breezy")
    val corpus = Seq(
      (1L, leaked),
      (2L, "completely unrelated text about distributed query engines " +
        "and columnar storage formats for analytical workloads today"),
      (100L, benchText)) // the benchmark doc itself, present in corpus
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    // exact 8-gram overlap: silent on the paraphrase
    val exact = Contamination.flagContaminated(corpus, "doc_id", "text",
      bench, "doc_id", "text", 8).collect()
    assert(!exact.map(_.getLong(0)).contains(1L),
      "8-gram overlap should miss the paraphrase (premise)")
    // fuzzy: flags it, excludes the benchmark's own id, skips unrelated
    val fuzzy = Contamination.flagContaminatedFuzzy(corpus, "doc_id",
      "text", bench, "doc_id", "text", n = 3, threshold = 0.35).collect()
    assert(fuzzy.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 100L)), fuzzy.mkString(", "))
    val j = fuzzy.head.getDouble(2)
    assert(j >= 0.35 && j < 1.0, s"jaccard $j")
    // threshold above the pair's jaccard empties the result
    assert(Contamination.flagContaminatedFuzzy(corpus, "doc_id", "text",
      bench, "doc_id", "text", n = 3, threshold = 0.99).isEmpty)
  }

  test("fuzzy path reports the best-matching bench item, ties by id") {
    val s = spark
    import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val bench = Seq(
      (10L, base + " extra tail words here"),  // weaker match
      (11L, base),                             // exact: jaccard 1.0
      (12L, base))                             // same: tie with 11
      .toDF("doc_id", "text")
    val got = Contamination.flagContaminatedFuzzy(corpus, "doc_id",
      "text", bench, "doc_id", "text", n = 3, threshold = 0.3).collect()
    assert(got.length == 1 &&
      got.head.getLong(1) == 11L && got.head.getDouble(2) == 1.0)
  }
}
