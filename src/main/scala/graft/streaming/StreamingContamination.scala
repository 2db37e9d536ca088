package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Contamination

/** Deterministic chunked replay of
  * [[Contamination.decontaminateStream]] — at-ingest benchmark
  * decontamination driven through a real file-source stream (the same
  * [[ReplayHarness]] contract as the novelty and sessionization gates).
  * The query is fully stateless (row-local shingle explode +
  * stream-static broadcast join), so the replay result equals the batch
  * run of the same hits regardless of chunking — exactly what the
  * gate's oracle checks. */
object StreamingContamination {

  /** Stage `docs` by `chunk`, stream them through the hit query against
    * `benchmark`, return every emitted (doc, shingle) hit row. */
  def hitsReplay(docs: DataFrame, idCol: String, textCol: String,
                 benchmark: DataFrame, benchId: String, benchText: String,
                 n: Int, chunk: Column, nChunks: Int)
                (implicit spark: SparkSession): DataFrame =
    ReplayHarness.replayToBatch(spark, docs,
      Seq(col(idCol).as("id"), col(textCol).as("text")),
      chunk, nChunks, 4, "graft_dc_")(
      stream => Contamination.decontaminateStream(
        stream, "id", "text", benchmark, benchId, benchText, n))
}
