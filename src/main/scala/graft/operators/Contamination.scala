package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination — flag training documents that share long
  * n-grams with an evaluation set. The standard pre-training hygiene
  * step: an 8-gram (or longer) overlap between a training document and a
  * benchmark item is strong evidence of contamination.
  *
  * Plan shape at 100 TB: the benchmark side is tiny (thousands of items)
  * — its exploded shingle set broadcasts; the corpus explodes its
  * shingles map-side and the flagging is a broadcast semi-join + count,
  * so the corpus is scanned once and never shuffled on document bodies.
  */
object Contamination {

  /** Documents sharing >= 1 n-gram with the benchmark, with the count of
    * distinct shared n-grams. Output: (doc, n_shared), benchmark docs
    * themselves excluded by id. Output is empty when nothing overlaps. */
  def flagContaminated(corpus: DataFrame, id: String, text: String,
                       benchmark: DataFrame, benchId: String,
                       benchText: String, n: Int): DataFrame = {
    val corpusShingles = corpus
      .select(col(id).as("doc"),
        explode(TextFunctions.wordShingles(col(text), n)).as("s"))
    val benchShingles = benchmark
      .select(explode(TextFunctions.wordShingles(col(benchText), n)).as("s"))
      .distinct()
    val benchIds = benchmark.select(col(benchId).as("doc"))
    corpusShingles
      .join(broadcast(benchShingles), "s")
      .join(broadcast(benchIds), Seq("doc"), "left_anti")
      .groupBy("doc")
      .agg(countDistinct(col("s")).as("n_shared"))
  }
}
