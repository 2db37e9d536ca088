package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns travelling next to a typed
  * metadata struct — the schema pattern a 100 TB training-data pipeline
  * needs: bodies stay columnar in parquet, metadata is filterable/prunable
  * without touching bytes, and per-record decode runs partition-parallel
  * with bounded memory (one batch of records in flight per task).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[decodeStub]] derives deterministic fake features from
  * the bytes. The Spark-side contract — schema, partitioning, typed
  * mapPartitions batch shape — is real and tested; swap `decodeStub` for a
  * real codec (or a Pandas-UDF equivalent in PySpark) without touching any
  * other code.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(id: Long, payload: Array[Byte], mediaType: String,
                         width: Int, height: Int)

  /** Extracted features for one record. */
  case class MediaFeatures(id: Long, nBytes: Long, contentHash: String,
                           meanByte: Double, frameCount: Int)

  /** Wrap any table into media records, treating a string column as the
    * opaque payload (UTF-8 bytes) — used by tests/queries since the
    * testdata has no real media; the schema is what matters. */
  def asMediaRecords(df: DataFrame, id: String, payloadCol: String)
                    (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(id).cast("long").as("id"),
        col(payloadCol).cast("binary").as("payload"),
        lit("text/plain").as("mediaType"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
  }

  /** STUB codec: deterministic fake decode. A real implementation would
    * decode image/audio bytes here (e.g. via a JNI codec); everything
    * around it — batching, partition parallelism, output schema — is the
    * production shape. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
    val mean = if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    // fake "frame sample": one frame per 64 bytes, capped — stands in for
    // video frame-sampling cadence
    // frame count = ceil(len/64) with a floor of 1 — the SAME slicing
    // frameSampleStub walks, so count and emitted frames agree (the old
    // len/64+1 over-counted exact multiples while the sampler dropped
    // partial tails)
    MediaFeatures(r.id, bytes.length.toLong, hash, mean,
      math.min(math.max((bytes.length + 63) / 64, 1), 32))
  }

  /** Partition-parallel feature extraction over media records. */
  def extractFeatures(ds: Dataset[MediaRecord])
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions(_.map(decodeStub))
  }

  /** A decoded frame/tile: (record id, frame index, payload slice). */
  case class MediaFrame(id: Long, frame: Int, bytes: Array[Byte])

  /** STUB resize: a real implementation re-encodes pixels; the stub
    * deterministically truncates/pads the payload to `targetBytes` so
    * downstream schema/size behavior is exercised. The partitioning and
    * batch shape (one record in, one record out, no driver involvement)
    * are the production contract. */
  def resizeStub(r: MediaRecord, targetBytes: Int): MediaRecord = {
    val src = Option(r.payload).getOrElse(Array.emptyByteArray)
    val out = java.util.Arrays.copyOf(src, targetBytes)
    r.copy(payload = out)
  }

  /** STUB frame sampling: emits every `stride`-th 64-byte slice as a
    * "frame" (a real implementation decodes video and samples frames at
    * a time cadence). Row-expanding: one record in, N frames out —
    * the generator shape of the real op. */
  def frameSampleStub(r: MediaRecord, stride: Int): Iterator[MediaFrame] = {
    val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
    // ceil(len/64) frames (floor 1): the partial tail slice IS a frame —
    // a 100-byte payload emits bytes 0-64 and 64-100, not just the
    // full slice (the old len/64 dropped tails only for payloads over
    // one frame, inconsistent with sub-frame payloads and decodeStub)
    (0 until math.max((bytes.length + 63) / 64, 1) by stride).iterator.map { i =>
      val from = math.min(i * 64, bytes.length)
      val until = math.min(from + 64, bytes.length)
      MediaFrame(r.id, i, java.util.Arrays.copyOfRange(bytes, from, until))
    }
  }

  /** Resize every record, partition-parallel. */
  def resizeAll(ds: Dataset[MediaRecord], targetBytes: Int)
               (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ds.mapPartitions(_.map(resizeStub(_, targetBytes)))
  }

  /** Sample frames from every record — a flatMap (row-expanding)
    * partition-parallel stage. */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int)
                  (implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap(frameSampleStub(_, stride)))
  }

  /** Column-only metadata path (no decode, pure codegen): byte length and
    * md5 of the payload — the cheap pre-filter a pipeline runs BEFORE
    * paying for decode. */
  def payloadMeta(df: DataFrame, id: String, payloadCol: String): DataFrame =
    df.select(col(id),
      octet_length(col(payloadCol).cast("binary")).cast("bigint").as("n_bytes"),
      md5(col(payloadCol).cast("binary")).as("content_hash"))
}
