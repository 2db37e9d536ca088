package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.collection.concurrent.TrieMap

/** Named in-memory pub/sub channels — the reference's composition
  * primitive (action.go:107-115,180-182; channel trigger
  * examples/channel-flogo.json:39-55). A pipeline publishes its output
  * rows to a channel; any number of other pipelines subscribe.
  *
  * Rows travel as JSON strings over a MemoryStream, so channels are
  * schema-flexible like the reference's map rows; subscribers decode with
  * an explicit schema. In a multi-node deployment the same API maps to a
  * Kafka topic (swap the MemoryStream for readStream.format("kafka")) —
  * the JSON envelope is already the portable part.
  */
object Channels {

  private case class Channel(stream: MemoryStream[String])
  private val channels = TrieMap.empty[String, Channel]

  private def channel(name: String)(implicit spark: SparkSession): Channel =
    channels.getOrElseUpdate(name, {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      Channel(MemoryStream[String])
    })

  /** Streaming DataFrame of a channel's traffic, decoded with `schema`. */
  def subscribe(name: String, schema: StructType)
               (implicit spark: SparkSession): DataFrame =
    channel(name).stream.toDF()
      .select(from_json(col("value"), schema).as("r"))
      .select(col("r.*"))

  /** Publish every micro-batch of `df` to the channel (exactly the
    * reference's publish-on-completion — instance.go:215-217). Returns the
    * StreamingQuery so callers control lifecycle. */
  def publish(name: String, df: DataFrame)
             (implicit spark: SparkSession) = {
    val ch = channel(name)
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect().map(_.getString(0))
        if (rows.nonEmpty) ch.stream.addData(rows.toSeq)
        ()
      }
      .start()
  }

  /** Synchronously push rows into a channel (test/driver-side ingest). */
  def push(name: String, jsonRows: Seq[String])
          (implicit spark: SparkSession): Unit =
    channel(name).stream.addData(jsonRows)

  /** Drop all channels (test isolation). */
  def reset(): Unit = channels.clear()
}
