package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — rolling-hash boundaries over
  * document text, the rsync/LBFS/FastCDC family (Muthitacharoen et al.,
  * SOSP '01; Xia et al., ATC '16): a boundary falls wherever a rolling
  * hash of the last `window` characters hits a fixed residue, so chunk
  * edges move WITH the content. Insert a paragraph into a 100 TB corpus
  * snapshot and only the chunks touching the edit change identity;
  * offset-based slicing would shift every downstream hash. That makes
  * CDC chunk hashes the right unit for incremental dedup, delta storage
  * and "what actually changed" diffing between crawl snapshots.
  *
  * The reference engine has no chunking surface
  * (`/root/reference/pipeline/pipeline.go` routes whole tuples); this
  * extends the LLM-pipeline layer like [[Dedup]]/[[Sampling]].
  *
  * Spark-first shape: the whole computation is builtin higher-order
  * functions (`split`/`transform`/`filter`/`aggregate`/`substring`) —
  * zero UDFs, whole-stage codegen, and ZERO SHUFFLES: every chunk is
  * derived row-locally and exploded in place, so a 1000-executor scan
  * chunks 100 TB at full parallelism with nothing crossing the wire.
  * Work is O(n · window) per document (the windowed sum is recomputed
  * per position rather than carried — `window` is a small constant and
  * recomputation keeps the expression stateless and codegen-friendly).
  *
  * The hash is polynomial over UNICODE CODEPOINTS (`split('')` +
  * `ascii`, both codepoint-based), H(i) = Σ_{j<w} code(c_{i-j})·p^j
  * mod 2^modBits, boundary after position i when H(i) mod divisor =
  * residue — exact integer arithmetic end-to-end so any engine
  * reproduces boundaries bit-for-bit (the DuckDB oracle does). Expected
  * chunk length ≈ `divisor` chars; a document with no boundary (shorter
  * than the window, or unlucky content) is one whole-doc chunk, bounded
  * by document length — a production variant would add a FastCDC-style
  * max-length hard split, which is a row-local post-pass.
  */
object Chunking {

  /** Content-defined chunks of `textCol`: one row per chunk with its
    * 1-based `start`, `len` (codepoints) and `chunk_hash` (md5 of the
    * chunk text — the dedup identity). */
  def cdcChunks(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", window: Int = 16,
                prime: Int = 31, modBits: Int = 20, divisor: Int = 64,
                residue: Int = 13): DataFrame = {
    require(window >= 2 && modBits <= 40 && divisor >= 2,
      s"degenerate CDC parameters ($window, $modBits, $divisor)")
    val m = 1L << modBits
    // p^j mod 2^modBits, j < window — inlined constants keep the
    // boundary predicate a pure codegen expression
    val pows = Iterator.iterate(1L)(x => x * prime % m).take(window)
      .mkString("array(", ", ", ")")
    val w = window

    docs
      .select(col(idCol), col(textCol).as("__text"))
      .withColumn("__n", length(col("__text")))
      .withColumn("__codes",
        expr("transform(split(__text, ''), ch -> ascii(ch))"))
      .withColumn("__bnd", expr(
        s"""CASE WHEN __n <= $w THEN array()
           |ELSE filter(sequence($w, __n - 1), i ->
           |  aggregate(sequence(0, ${w - 1}), 0L, (acc, j) ->
           |    acc + element_at(__codes, i - j) * element_at($pows, j + 1))
           |  % $m % $divisor = $residue) END""".stripMargin))
      .withColumn("__starts",
        expr("concat(array(1), transform(__bnd, x -> x + 1))"))
      .withColumn("__ends", expr("concat(__bnd, array(__n))"))
      .select(col(idCol), col("__text"), col("__starts"), col("__ends"),
        posexplode(col("__starts")).as(Seq("chunk", "__s")))
      .select(col(idCol), col("chunk").cast("long").as("chunk"),
        col("__s").cast("long").as("start"),
        (element_at(col("__ends"), col("chunk") + 1) - col("__s") + 1)
          .cast("long").as("len"),
        md5(col("__text").substr(col("__s"),
            element_at(col("__ends"), col("chunk") + 1) - col("__s") + 1)
          .cast("binary")).as("chunk_hash"))
  }

  /** Chunk-level exact duplication: chunks whose content recurs across
    * documents — boilerplate headers, licence blocks, templated spans —
    * with how many documents and chunk slots share them. The one shuffle
    * is on the 16-byte hash at CHUNK cardinality with map-side partial
    * aggregation; chunk text never leaves its row. */
  def chunkDuplicates(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", window: Int = 16,
                      minDocs: Int = 2): DataFrame =
    cdcChunks(docs, idCol, textCol, window)
      .groupBy("chunk_hash")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        min(col("len")).as("len"))
      .filter(col("n_docs") >= minDocs)
}
