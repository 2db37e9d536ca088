package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subword (WordPiece-inference-style) tokenization against an explicit
  * vocabulary: greedy longest-match from the left; a position no vocab
  * piece covers degrades to a single-char `<unk>` advance (progress is
  * guaranteed, so tokenization is total and deterministic).
  *
  * This is the INFERENCE half of a real subword tokenizer — the apply
  * path a pipeline runs over 100 TB once a vocabulary exists. The vocab
  * is an explicit argument (trained elsewhere or standardized); greedy
  * longest-match is exactly reproducible by any engine, and the DuckDB
  * oracle replays it with a recursive CTE over the same vocabulary.
  *
  * Scale shape — the Zipf trick: tokenization runs once per DISTINCT
  * word, never per occurrence. The corpus shuffles once into (doc,
  * word, count) triples (map-side combine collapses repeats); the
  * distinct-word frame — vocabulary-sized, orders of magnitude smaller
  * than the corpus — is what the per-word scan walks; piece counts then
  * join back and aggregate by doc. Document bodies never cross a
  * shuffle, and per-word work is amortized over every occurrence.
  *
  * The reference engine has no tokenizer surface; this extends the
  * LLM-pipeline layer like [[CorpusStats]]. */
object Subword {

  /** The unk marker emitted for an uncovered single character. */
  val Unk = "<unk>"

  /** Greedy longest-match pieces of one word. Pure function — the spec
    * pins hand-computed vectors and the distributed paths call this. */
  def tokenizeWord(word: String, vocab: Set[String],
                   maxPieceLen: Int): List[String] = {
    val out = List.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      var l = math.min(maxPieceLen, word.length - pos)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = word.substring(pos, pos + l)
        if (vocab.contains(cand)) found = cand
        l -= 1
      }
      if (found != null) { out += found; pos += found.length }
      else { out += Unk; pos += 1 }
    }
    out.result()
  }

  /** Per-word piece/unk counts for every distinct word of the corpus:
    * `(w, np, nu)`. The mapPartitions walk builds the vocab set once
    * per partition; the distinct-word frame it walks is tiny relative
    * to the corpus by Zipf. */
  private def wordPieces(wc: DataFrame, vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "subword vocab must not be empty")
    require(vocab.forall(_.nonEmpty), "vocab pieces must be non-empty")
    val spark = wc.sparkSession
    import spark.implicits._
    val maxLen = vocab.map(_.length).max
    val vocabSeq = vocab // stable closure capture
    wc.select(col("w")).distinct().as[String].mapPartitions { it =>
      val vs = vocabSeq.toSet
      it.map { w =>
        val p = tokenizeWord(w, vs, maxLen)
        (w, p.length.toLong, p.count(_ == Unk).toLong)
      }
    }.toDF("w", "np", "nu")
  }

  /** (doc, word, count) triples — the one corpus-sized shuffle. */
  private def wordCounts(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("doc", "w").agg(count(lit(1)).as("c"))

  /** Per-document piece totals: `(doc, n_pieces, n_unk)` — the token
    * accounting a budget-packed training shard is built from. */
  def pieceCounts(docs: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[String]): DataFrame = {
    val wc = wordCounts(docs, idCol, textCol)
    wc.join(wordPieces(wc, vocab), "w")
      .groupBy("doc")
      .agg(sum(col("c") * col("np")).as("n_pieces"),
        sum(col("c") * col("nu")).as("n_unk"))
  }

  /** Candidate-vocabulary mining — the TRAINING half of the tokenizer:
    * the top-`k` character n-grams (lengths `minN..maxN`) by
    * occurrence-weighted frequency, rank ties broken by piece. This is
    * the candidate-scoring pass a BPE/WordPiece trainer iterates; one
    * pass of it is already a usable frequency-derived vocabulary for
    * [[pieceCounts]] (plus whatever single-char floor the caller adds).
    *
    * Scale shape: the same Zipf amortization as the apply path — char
    * n-grams are generated from the DISTINCT-word frame (weighted by
    * occurrence counts), entirely in codegen'd `explode(sequence)` +
    * `substring` (no typed walk), and the candidate aggregate shuffles
    * (piece, count) pairs whose cardinality is bounded by distinct
    * words × piece lengths, never the corpus. The global top-k is an
    * `orderBy.limit` (TakeOrderedAndProject — a bounded per-partition
    * heap, no full sort); the rank column is windowed over the k
    * survivors only.
    *
    * Output: `(piece, n_occ, rk)`, rk 1-based dense. */
  def topNgramPieces(docs: DataFrame, textCol: String, minN: Int,
                     maxN: Int, k: Int): DataFrame = {
    require(minN >= 1 && maxN >= minN,
      s"need 1 <= minN <= maxN, got $minN..$maxN")
    require(k > 0, s"k must be positive, got $k")
    val wcw = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val top = wcw
      .withColumn("n", explode(sequence(lit(minN), lit(maxN))))
      .where(length(col("w")) >= col("n"))
      .withColumn("s", explode(sequence(lit(0), length(col("w")) - col("n"))))
      .select(expr("substring(w, s + 1, n)").as("piece"), col("c"))
      .groupBy("piece").agg(sum(col("c")).as("n_occ"))
      .orderBy(col("n_occ").desc, col("piece").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occ").desc, col("piece").asc)
    top.withColumn("rk", row_number().over(w))
  }

  /** Distributed BPE merge training (Sennrich et al., ACL '16) — the
    * TRAINING half proper: learn `numMerges` merge rules from the
    * corpus. Each round counts adjacent symbol pairs over the
    * DISTINCT-word frame (occurrence-weighted — the same Zipf
    * amortization as [[pieceCounts]]: pair statistics per distinct
    * word, multiplied by its count, never a per-occurrence walk),
    * picks the most frequent pair (ties by (lhs, rhs) — binary string
    * order, so any engine agrees), and applies it to every word as a
    * left-to-right non-overlapping fold.
    *
    * Spark shape: one corpus-sized shuffle builds the word frame; each
    * round is then ONE aggregate over it — (pair, count) with map-side
    * combine at symbol-pair cardinality — plus a 1-row argmax collect
    * (`orderBy.limit(1)`: a bounded heap, O(1) to the driver by
    * contract) and a row-local fold (`functions.aggregate`, codegen —
    * no UDF) applying the merge. The frame re-persists per round so a
    * round reads materialized symbols, not a `numMerges`-deep lineage;
    * a production run at larger `numMerges` would checkpoint every few
    * rounds — the per-round cost model is unchanged.
    *
    * Against a trained vocabulary (chars + merged pieces),
    * [[pieceCounts]]/[[pieceFrequencies]] are the apply path. No
    * end-of-word marker is modeled — merges never cross word
    * boundaries here, which is the within-word BPE variant; the marker
    * is one column away if a caller wants it.
    *
    * Returns `(rk, lhs, rhs, merged, pair_count)` — rank-ordered merge
    * rules; fewer than `numMerges` rows iff the corpus runs out of
    * pairs (every word fully merged). */
  /** Left-to-right non-overlapping application of one merge rule to a
    * symbol array — a codegen fold, no UDF. Shared by training and
    * [[bpeEncode]] so both sides merge identically. */
  private def applyMerge(syms: org.apache.spark.sql.Column, l: String,
                         r: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  def trainBpeMerges(docs: DataFrame, textCol: String,
                     numMerges: Int): DataFrame = {
    require(numMerges >= 1 && numMerges <= 1024,
      s"numMerges out of range: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._

    var cur = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(split(col("w"), "").as("syms"), col("c"))
      .persist()
    cur.count()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = cur
        .select(explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (a, b) -> named_struct('l', a, 'r', b))""".stripMargin))
          .as("p"), col("c"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank, l, r, l + r, n))
        val next = cur
          .select(applyMerge(col("syms"), l, r).as("syms"), col("c"))
          .persist()
        next.count()
        cur.unpersist()
        cur = next
        rank += 1
      }
    }
    cur.unpersist()
    merges.result()
      .toDF("rk", "lhs", "rhs", "merged", "pair_count")
      .withColumn("rk", col("rk").cast("long"))
  }

  /** BPE ENCODE — inference with an explicit rank-ordered merge list
    * (what [[trainBpeMerges]] learns): each word starts as characters
    * and every merge applies in rank order, so `encode(train(corpus))`
    * is the end-to-end tokenizer. This is the true BPE apply (merge
    * ranks decide segmentation), distinct from [[pieceCounts]]'s greedy
    * longest-match (WordPiece-style) — the two disagree on words like
    * "lowering" whenever a high-rank merge blocks a longer vocab hit.
    *
    * Scale shape: the Zipf amortization again — all merges fold over
    * the DISTINCT-word frame in ONE projection (the k rules compose
    * into a single codegen expression; k is vocab-build-sized, bounded
    * at 64 here to keep one Janino unit), then per-word piece counts
    * join back by word. Document bodies never cross a shuffle.
    *
    * Returns per-document `(doc, n_pieces)`. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 64,
      s"merge list must have 1..64 rules, got ${merges.size}")
    require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
      "merge rule sides must be non-empty")
    val wc = wordCounts(docs, idCol, textCol)
    val folded = merges.foldLeft(split(col("w"), "")) {
      case (syms, (l, r)) => applyMerge(syms, l, r)
    }
    val pieces = wc.select(col("w")).distinct()
      .select(col("w"), size(folded).as("np"))
    wc.join(pieces, "w")
      .groupBy(col("doc"))
      .agg(sum(col("c") * col("np")).as("n_pieces"))
  }

  /** Corpus piece frequencies under BPE-by-merges: `(piece, n)` — the
    * piece-IDENTITY witness for [[bpeEncode]]'s segmentation (counts
    * alone cannot distinguish two segmentations of equal length). */
  def bpePieceFrequencies(docs: DataFrame, textCol: String,
                          merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 64,
      s"merge list must have 1..64 rules, got ${merges.size}")
    val wcw = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val folded = merges.foldLeft(split(col("w"), "")) {
      case (syms, (l, r)) => applyMerge(syms, l, r)
    }
    wcw.select(explode(folded).as("piece"), col("c"))
      .groupBy("piece").agg(sum(col("c")).as("n"))
  }

  /** Corpus-wide piece frequencies: `(piece, n)`, every unk collapsed
    * into the `<unk>` row — the distribution a vocab curator audits
    * (and the gate that proves PIECE IDENTITY across engines, not just
    * counts). */
  def pieceFrequencies(docs: DataFrame, textCol: String,
                       vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "subword vocab must not be empty")
    require(vocab.forall(_.nonEmpty), "vocab pieces must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val wcw = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val maxLen = vocab.map(_.length).max
    val vocabSeq = vocab
    val pieces = wcw.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val vs = vocabSeq.toSet
        it.flatMap(w => tokenizeWord(w, vs, maxLen).map(p => (w, p)))
      }.toDF("w", "piece")
    wcw.join(pieces, "w")
      .groupBy("piece").agg(sum(col("c")).as("n"))
  }
}
