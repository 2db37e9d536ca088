package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Deterministic chunked file-source replay harness — the shared
  * machinery behind [[Watermarks.lateDataReplay]] (the late-data
  * correctness gate) and ScaleProbe's streaming-state branch.
  *
  * Staging: `rows` are written ONCE as parquet partitioned by a 0-based
  * `chunk` column (distributed write — only file HANDLING ever touches
  * the driver). Replay: chunk k's part files are moved into the watched
  * stream directory, then `drain()` runs before chunk k+1 moves. With
  * `processAllAvailable` as the drain, each chunk runs as its own data
  * micro-batch WITH the no-data watermark-advance batch behind it —
  * the property that makes watermark semantics a pure function of the
  * data (see lateDataReplay's scaladoc for why pre-staging everything
  * with maxFilesPerTrigger would lag the late filter a batch behind).
  *
  * Chunk values outside 0..nChunks-1 would stage into directories the
  * replay never visits — their rows silently vanishing from the result
  * — so staging validates the produced partition set and throws.
  *
  * `payload` (aliased columns over `source`) defines the staged row
  * shape; `chunk` is evaluated against `source` too, so it may be a
  * window expression over source columns the payload drops. */
final class ChunkedReplay(source: DataFrame, payload: Seq[Column],
                          chunk: Column, nChunks: Int) {
  require(nChunks > 0, s"nChunks must be positive, got $nChunks")

  val root: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-replay-")
  /** Point the file-source `readStream` here, with [[schema]]. */
  val streamDir: java.nio.file.Path = root.resolve("stream")
  private val staged = root.resolve("staged")

  /** Schema of the staged rows (the `__chunk` column never reaches the
    * stream — it only names the staging partition dirs). */
  val schema: StructType = source.select(payload: _*).schema
  require(!schema.fieldNames.contains("__chunk"),
    "payload must not contain a __chunk column")

  locally {
    java.nio.file.Files.createDirectories(streamDir)
    // repartition by chunk value sends each chunk to one task;
    // partitionBy splits the output by directory
    source.select(payload :+ chunk.cast("int").as("__chunk"): _*)
      .repartition(nChunks, col("__chunk"))
      .write.partitionBy("__chunk").mode("overwrite")
      .parquet(staged.toString)
    val dirs = graft.util.FsUtil.listDirs(staged, "__chunk=")
      .map(_.getFileName.toString.stripPrefix("__chunk="))
    val bad = dirs.filterNot(d =>
      scala.util.Try(d.toInt).toOption.exists(k => k >= 0 && k < nChunks))
    require(bad.isEmpty,
      s"chunk values outside 0..${nChunks - 1} would be silently " +
        s"skipped by the replay: ${bad.mkString(", ")}")
  }

  /** Move chunk k's staged files into the watched dir (no drain) — the
    * unit step `run` composes; public so a recovery test can kill and
    * restart the consuming query at a chosen chunk boundary. */
  def moveChunk(k: Int): Unit =
    graft.util.FsUtil.listFiles(staged.resolve(s"__chunk=$k"), ".parquet")
      .zipWithIndex
      .foreach { case (p, i) =>
        java.nio.file.Files.move(p,
          streamDir.resolve(f"chunk$k%02d-$i%03d.parquet"))
      }

  /** Move chunk k's files into the watched dir, call `drain()`, repeat
    * for k = 0..nChunks-1 in order. */
  def run(drain: () => Unit): Unit =
    (0 until nChunks).foreach { k => moveChunk(k); drain() }

  /** Delete the staged copy, stream dir, and anything else under the
    * replay root (e.g. a checkpoint the caller placed there). */
  def cleanup(): Unit = graft.util.FsUtil.deleteRecursively(root)
}
