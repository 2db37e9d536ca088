package graft.util

import java.nio.file.{Files, Path}

/** Close-safe local-filesystem helpers for the replay/staging harnesses
  * (Channels file transport, Watermarks replay, ScaleProbe staging).
  * `Files.list`/`Files.walk` return streams holding an open directory
  * fd until closed — forgetting the close leaks one fd per call (per
  * MICRO-BATCH on the channel publish path) until GC. */
object FsUtil {

  /** Files directly in `dir` whose name ends with `suffix` (empty if
    * `dir` is not a directory), with the listing stream closed. */
  def listFiles(dir: Path, suffix: String): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.toArray.map(_.asInstanceOf[Path])
      .filter(_.getFileName.toString.endsWith(suffix)).toSeq
    finally s.close()
  }

  /** Subdirectories of `dir` whose name starts with `prefix` (empty if
    * `dir` is not a directory), with the listing stream closed. */
  def listDirs(dir: Path, prefix: String): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.toArray.map(_.asInstanceOf[Path])
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(prefix)).toSeq
    finally s.close()
  }

  /** Best-effort recursive delete (children first). Genuinely
    * best-effort: a path that vanishes mid-walk, a directory made
    * non-empty by a concurrent writer, or any other per-path
    * IOException degrades to a leaked temp entry — never a throw.
    * This runs inside the channel-publish foreachBatch, where a
    * propagated exception would fail the whole streaming query over
    * what is only cleanup. */
  def deleteRecursively(root: Path): Unit = {
    if (!Files.exists(root)) return
    try {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach { p =>
          try { Files.deleteIfExists(p); () }
          catch { case _: java.io.IOException => () }
        }
      finally s.close()
    } catch {
      // Files.walk streams throw lazily (wrapped in UncheckedIOException)
      // when the snapshot races a concurrent writer/deleter
      case _: java.io.IOException | _: java.io.UncheckedIOException => ()
    }
  }
}
