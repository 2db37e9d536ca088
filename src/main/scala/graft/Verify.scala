package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // queries that persist bucketed index tables must never drop a
      // spark-warehouse/ dir into the repo cwd
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-verify-warehouse")
      // let AQE size CACHED-plan partitions by bytes (default false):
      // iteration loops re-read persisted frames every round, and a
      // vocabulary-sized cache materialized at the session's full
      // shuffle width re-pays per-task fixed cost x width per job
      // (measured: unigram trainer -30%, warm jaccard -20% from this
      // alone). Scale-adaptive by construction — AQE's parallelism-
      // first coalescing keeps corpus-sized caches at full width on a
      // cluster; only byte-small caches narrow.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // same codegen-cache sizing as the bench session (Bench.scala) so
      // correctness and plan dumps run the configuration that is timed
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (comma-separated names); the driver leaves
    // it unset and dumps everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // NonFatal only: an OOM or other fatal error must kill the run —
      // continuing in a broken JVM would eat every remaining query's
      // error and still exit 0 with a near-empty outDir
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the index-backed gates memoize corpus-sized /tmp tables for the
    // session's lifetime — drop them so repeated harness runs don't
    // accrete orphaned index directories
    SparkEntry.dropCachedIndexes(spark)
    spark.stop()
  }
}
