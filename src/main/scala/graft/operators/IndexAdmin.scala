package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared teardown for the persisted incremental indexes (minhash,
  * exact-fingerprint, embedding, IVF): drop the catalog entries, then
  * delete the backing directory. This is the missing last step of the
  * blue/green lifecycle — build → probe → extend → compact-into-new →
  * CUTOVER → drop-old — that the compaction scaladocs defer to "the
  * caller"; without it, orphaned pre-compaction tables and paths
  * accumulate across compactions.
  *
  * DROP TABLE on an EXTERNAL table only removes the catalog entry (the
  * files are the caller's), so the path delete is a separate,
  * deliberate step. Single-writer contract as for `extend*`: drop only
  * after every probe of the old generation has drained.
  */
private[graft] object IndexAdmin {

  def dropTablesAndPath(spark: SparkSession, tables: Seq[String],
                        path: String): Unit = {
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    graft.util.FsUtil.deleteRecursively(java.nio.file.Paths.get(path))
  }
}
