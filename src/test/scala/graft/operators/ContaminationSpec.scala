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
}
