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

  /** One word as an array of CODE POINT strings — the initial BPE
    * segmentation shared by every local walk in this file. NOT
    * `word.split("")`: Java's split("") separates at UTF-16 code-unit
    * boundaries, so an astral character (emoji — a surrogate pair)
    * becomes TWO lone-surrogate symbols, silently diverging from
    * Spark SQL's `split(w, '')` and DuckDB's `string_split(w, '')`,
    * both of which are code-point based (caught by the round-14
    * unicode fixture sweep). */
  private[graft] def charSeg(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val out = new Array[String](n)
    var i = 0
    var off = 0
    while (i < n) {
      val cc = Character.charCount(word.codePointAt(off))
      out(i) = word.substring(off, off + cc)
      i += 1
      off += cc
    }
    out
  }

  /** Greedy longest-match pieces of one word. Pure function — the spec
    * pins hand-computed vectors and the distributed paths call this.
    * Positions and piece lengths count CODE POINTS (an astral char is
    * one character, one unk), and candidate substrings sit on code
    * point boundaries — the same character model as the DuckDB oracle
    * and Spark's own string functions. */
  def tokenizeWord(word: String, vocab: Set[String],
                   maxPieceLen: Int): List[String] = {
    // offs(i) = UTF-16 offset of the i-th code point; offs(ncp) = end
    val offs = new Array[Int](word.codePointCount(0, word.length) + 1)
    var ci = 0
    var off = 0
    while (off < word.length) {
      offs(ci) = off
      ci += 1
      off += Character.charCount(word.codePointAt(off))
    }
    offs(ci) = word.length
    val ncp = ci
    val out = List.newBuilder[String]
    var p = 0
    while (p < ncp) {
      var l = math.min(maxPieceLen, ncp - p)
      var found: String = null
      var flen = 0
      while (l >= 1 && found == null) {
        val cand = word.substring(offs(p), offs(p + l))
        if (vocab.contains(cand)) { found = cand; flen = l }
        l -= 1
      }
      if (found != null) { out += found; p += flen }
      else { out += Unk; p += 1 }
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
    val maxLen = vocab.map(p => p.codePointCount(0, p.length)).max
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

  /** BPE merge training (Sennrich et al., ACL '16) — the TRAINING half
    * proper: learn `numMerges` merge rules from the corpus. Rounds
    * count adjacent symbol pairs over the DISTINCT-word frame
    * (occurrence-weighted — the same Zipf amortization as
    * [[pieceCounts]]: pair statistics per distinct word, multiplied by
    * its count, never a per-occurrence walk), pick the most frequent
    * pair (ties by (lhs, rhs) — binary string order, so any engine
    * agrees), and apply it to every word as a left-to-right
    * non-overlapping merge.
    *
    * Spark shape: ONE corpus-sized shuffle builds the word frame —
    * then, because that frame is Zipf-small, it normally COLLECTS
    * under `localBytesCap` and the entire merge loop runs driver-local
    * with incrementally-maintained pair counts (the standard in-memory
    * BPE-trainer shape: a 32k-merge vocab is one Spark job plus one
    * local loop, not 32k jobs). A frame above the cap falls back to
    * the EXACT batched distributed trainer
    * ([[trainBpeMergesDistributed]]) — uncapped merge count, many
    * merges per round where the statistics prove it safe, one merge
    * per round in the worst case. The two paths produce identical
    * rule lists by construction (spec-pinned on adversarial corpora:
    * overlapping runs, cascading merges, count ties, shared-symbol
    * candidates — plus a randomized cross-check).
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

  /** Default cap on the driver-local merge loop's WORKING SET
    * (JVM-estimate bytes, see the estimate in [[trainBpeMerges]]): the
    * frame is Zipf-small — even a 100 TB corpus has a distinct-word
    * frame in the tens of millions, and real BPE trainers run the
    * merge loop over exactly this frame in one process. 2 GiB here
    * admits frames around 60M chars / 15M words — roughly the same
    * corpora the old 256 MiB cap admitted when its estimate modeled
    * only the collected tuples (2 B/char), but now priced at what the
    * loop actually allocates, so a near-cap frame no longer risks a
    * multi-GB driver-heap surprise. */
  val DefaultLocalFrameBytes: Long = 2048L << 20

  def trainBpeMerges(docs: DataFrame, textCol: String,
                     numMerges: Int,
                     localBytesCap: Long = DefaultLocalFrameBytes)
      : DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist()
    try {
      // the one corpus-sized pass; the word frame it leaves behind is
      // Zipf-small, and its measured size decides the training shape
      val st = wc.agg(count(lit(1)).as("nw"),
        coalesce(sum(length(col("w"))), lit(0L)).as("nc")).collect().head
      val (nWords, nChars) = (st.getLong(0), st.getLong(1))
      // models the TRAINING working set, not just the collected tuples:
      // per char — 2 B collected UTF-16 + 8 B interned-symbol array ref
      // + ~22 B amortized pair->word bitset index; per word — tuple +
      // String + symbol-array headers. Symbol strings themselves are
      // interned (one instance per distinct piece), so they don't scale
      // with nChars.
      val estBytes = 32L * nChars + 128L * nWords
      if (estBytes <= localBytesCap) {
        // standard BPE-trainer shape: ONE Spark job collects the word
        // frame, then the whole merge loop runs driver-local with
        // incrementally-maintained pair counts — numMerges in the
        // thousands is a local loop, not numMerges Spark jobs
        trainBpeMergesLocal(wc.as[(String, Long)].collect(), numMerges)
          .toDF("rk", "lhs", "rhs", "merged", "pair_count")
          .withColumn("rk", col("rk").cast("long"))
      } else {
        // distributed fallback for a word frame that genuinely cannot
        // sit on the driver: EXACT batched rounds (see
        // [[trainBpeMergesDistributed]]) — uncapped; the worst case
        // degrades to one merge per round, never to a wrong rule list
        trainBpeMergesDistributed(wc, numMerges)
      }
    } finally { wc.unpersist(); () }
  }

  /** Exact BATCHED distributed trainer (see [[trainBpeMerges]]) —
    * vocab-scale merge counts on frames that cannot sit on the driver,
    * with rule lists IDENTICAL to the sequential/local trainer by
    * construction, never by approximation.
    *
    * Each round runs a bounded set of jobs over the persisted symbol
    * frame: (1) the (pair, count) aggregate, top-`candK` candidates
    * collected through a bounded heap; (2) the symbol inventory of
    * that (already tiny) pair table; (3) adjacent-TRIPLE counts
    * restricted to the candidates (left_semi against the broadcast
    * candidate list — a triple matching two candidates still counts
    * once). A driver-side simulation then admits a BATCH of merges,
    * longest verified prefix of the true sequential merge sequence:
    *
    *  - a merge's effect on every tracked count is computed EXACTLY
    *    from the triples — each (x, l, r) adjacency destroys pair
    *    (x, l) and creates (x, l+r); each (l, r, y) destroys (r, y)
    *    and creates (l+r, y) — valid because admission excludes every
    *    pattern those local formulas cannot see: self patterns
    *    `l r l` (t3(l,r,l) must be 0, which also kills `l r l r`),
    *    adjacent occurrences of two batch rules (t3(li,ri,lj) and
    *    t3(lj,rj,li) must be 0 pairwise), merged-string collisions
    *    with live symbols (the inventory check), and l == r;
    *  - a candidate whose count an earlier batch merge DENTED, or a
    *    pair BORN this round, may be the true next pick — the batch
    *    closes before it rather than guessing (both are recomputed
    *    exactly next round);
    *  - with more live pairs than `candK`, the batch also closes once
    *    the pick's count no longer strictly exceeds the best
    *    uncollected pair's bound (the K+1-th count);
    *  - the round's FIRST pick is always applied even when the
    *    statistics cannot extend it (it is the global argmax of the
    *    full ordered aggregate) — so worst-case throughput degrades
    *    to the old one-merge-per-round shape, never to a wrong list.
    *
    * The batch applies in ONE `mapPartitions` scan (admission makes
    * batch rules pairwise non-adjacent, so a single left-to-right
    * pass equals sequential application; a forced lone rule gets the
    * same greedy non-overlapping walk as [[mergeWord]]), and the
    * frame re-persists so a round reads materialized symbols, not a
    * rounds-deep lineage. Triple statistics above `tripleCap` rows
    * (pathological frames) make the round fall back to the forced
    * single merge. */
  private def trainBpeMergesDistributed(wc: DataFrame, numMerges: Int,
                                        candK: Int = 4096,
                                        tripleCap: Int = 4000000)
      : DataFrame = {
    val spark = wc.sparkSession
    import spark.implicits._
    import scala.collection.mutable
    val pairsExpr = expr(
      """zip_with(slice(syms, 1, size(syms) - 1),
        |         slice(syms, 2, size(syms) - 1),
        |         (a, b) -> named_struct('l', a, 'r', b))""".stripMargin)
    // zero-length slices make words shorter than 3 symbols contribute
    // an empty triple array without a CASE branch
    val triplesExpr = expr(
      """zip_with(slice(syms, 1, greatest(size(syms) - 2, 0)),
        |  zip_with(slice(syms, 2, greatest(size(syms) - 2, 0)),
        |           slice(syms, 3, greatest(size(syms) - 2, 0)),
        |           (b, c) -> named_struct('b', b, 'c', c)),
        |  (a, bc) -> named_struct('a', a, 'b', bc.b, 'c', bc.c))"""
        .stripMargin)
    // rounds materialize through EAGER localCheckpoints (the
    // Clustering.connectedComponents pattern): persist would nest one
    // InMemoryRelation per round and the plan TREE (and every explain
    // string AQE renders) grows without bound over hundreds of rounds
    // — a measured driver OOM at vocab scale, not a style choice
    var cur: DataFrame = wc
      .select(split(col("w"), "").as("syms"), col("c"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val pairDF = cur
        .select(explode(pairsExpr).as("p"), col("c"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("n"))
        .persist()
      val top = pairDF
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(candK + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) { exhausted = true; pairDF.unpersist(); () }
      else {
        val knownAll = top.length <= candK
        val unknownBound = if (knownAll) Long.MinValue else top(candK)._3
        val cands = top.take(candK)
        // merged-string collision check: a symbol matters iff it
        // participates in some adjacency (a string colliding only with
        // lone single-symbol words can never change a pair count), so
        // the pair table's own symbols are the exact inventory
        val inventory: Set[String] = pairDF
          .select(explode(array(col("l"), col("r"))).as("s"))
          .distinct().as[String].collect().toSet
        pairDF.unpersist()
        val trips: Array[((String, String, String), Long)] =
          if (cands.length == 1) Array.empty
            // a 1-candidate frame with triples forces all-equal
            // adjacent pairs, i.e. l == r — forced-single below anyway
          else {
            val candDF = cands.toSeq.map(c => (c._1, c._2))
              .toDF("cl", "cr")
            cur
              .select(explode(triplesExpr).as("t"), col("c").as("cnt"))
              .join(broadcast(candDF),
                (col("t.b") === col("cl") && col("t.c") === col("cr")) ||
                  (col("t.a") === col("cl") && col("t.b") === col("cr")),
                "left_semi")
              .groupBy(col("t.a").as("ta"), col("t.b").as("tb"),
                col("t.c").as("tc"))
              .agg(sum(col("cnt")).as("n"))
              .limit(tripleCap + 1).collect()
              .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
                r.getLong(3)))
          }
        val tripleOverflow = trips.length > tripleCap
        val tripN = mutable.HashMap.empty[(String, String, String), Long]
        val tlIdx = mutable.HashMap
          .empty[(String, String), mutable.ArrayBuffer[(String, Long)]]
        val trIdx = mutable.HashMap
          .empty[(String, String), mutable.ArrayBuffer[(String, Long)]]
        if (!tripleOverflow) {
          val candSet = cands.map(c => (c._1, c._2)).toSet
          trips.foreach { case ((a, b, c), n) =>
            tripN.put((a, b, c), n)
            if (candSet((b, c)))
              tlIdx.getOrElseUpdate((b, c), mutable.ArrayBuffer.empty) +=
                ((a, n))
            if (candSet((a, b)))
              trIdx.getOrElseUpdate((a, b), mutable.ArrayBuffer.empty) +=
                ((c, n))
          }
        }
        def t3(a: String, b: String, c: String): Long =
          tripN.getOrElse((a, b, c), 0L)
        final class Cand(val l: String, val r: String, var n: Long,
                         val orig: Long)
        val candMap = mutable.LinkedHashMap.empty[(String, String), Cand]
        cands.foreach(c =>
          candMap.put((c._1, c._2), new Cand(c._1, c._2, c._3, c._3)))
        val newPairs = mutable.HashMap.empty[(String, String), Long]
        val selMerged = mutable.HashSet.empty[String]
        val batch = mutable.ArrayBuffer.empty[(String, String, Long)]
        var stop = false
        val maxBatch = numMerges - rank + 1
        while (!stop && batch.length < maxBatch) {
          // argmax over live candidates + pairs born this round:
          // (count desc, lhs, rhs) in UTF-8 byte order — the exact
          // sequential argmax, because every tracked count is exact
          var bl: String = null
          var br: String = null
          var bn = 0L
          var isNew = false
          def consider(l: String, r: String, n: Long, nw: Boolean): Unit =
            if (n > 0L && (bl == null || n > bn || (n == bn && {
              val cl = utf8Compare(l, bl)
              cl < 0 || (cl == 0 && utf8Compare(r, br) < 0)
            }))) { bl = l; br = r; bn = n; isNew = nw }
          candMap.valuesIterator.foreach(c => consider(c.l, c.r, c.n, false))
          newPairs.foreach { case ((l, r), n) => consider(l, r, n, true) }
          if (bl == null || isNew) stop = true
          else {
            val cd = candMap((bl, br))
            val m = bl + br
            val admissible =
              cd.n == cd.orig &&
                bl != br &&
                (knownAll || cd.n > unknownBound) &&
                !tripleOverflow &&
                t3(bl, br, bl) == 0L &&
                !inventory.contains(m) && !selMerged.contains(m) &&
                batch.forall { case (pl, pr, _) =>
                  t3(pl, pr, bl) == 0L && t3(bl, br, pl) == 0L }
            if (!admissible) {
              // inadmissible as a batch EXTENSION; as the round's first
              // pick it is still the exact global argmax — apply alone
              if (batch.isEmpty) {
                batch += ((bl, br, cd.n)); candMap.remove((bl, br)); ()
              }
              stop = true
            } else {
              batch += ((bl, br, cd.n))
              selMerged += m
              candMap.remove((bl, br))
              tlIdx.getOrElse((bl, br), mutable.ArrayBuffer.empty)
                .foreach { case (x, n) =>
                  newPairs.updateWith((x, m))(o => Some(o.getOrElse(0L) + n))
                  candMap.get((x, bl)).foreach(c => c.n -= n)
                }
              trIdx.getOrElse((bl, br), mutable.ArrayBuffer.empty)
                .foreach { case (y, n) =>
                  newPairs.updateWith((m, y))(o => Some(o.getOrElse(0L) + n))
                  candMap.get((br, y)).foreach(c => c.n -= n)
                }
            }
          }
        }
        batch.foreach { case (l, r, n) =>
          merges += ((rank, l, r, l + r, n))
          rank += 1
        }
        val bm = batch.map { case (l, r, _) => ((l, r), l + r) }.toMap
        cur = cur.as[(Seq[String], Long)].mapPartitions { it =>
          it.map { case (s, c) =>
            (applyBatchLocal(s.toArray, bm).toSeq, c)
          }
        }.toDF("syms", "c").localCheckpoint(true)
      }
    }
    merges.result()
      .toDF("rk", "lhs", "rhs", "merged", "pair_count")
      .withColumn("rk", col("rk").cast("long"))
  }

  /** One greedy left-to-right pass applying a BATCH of merge rules —
    * equal to applying them sequentially in rank order because
    * admission in [[trainBpeMergesDistributed]] guarantees no two
    * rules' occurrences are adjacent or overlapping in any word; for
    * a single rule this is exactly [[mergeWord]]'s non-overlapping
    * walk (including the l == r case). Merged outputs never re-match
    * (a rule's sides are pre-existing symbols; merged strings are
    * collision-checked against the live inventory). */
  private[graft] def applyBatchLocal(
      s: Array[String], rules: Map[(String, String), String])
      : Array[String] = {
    if (s.length < 2 || rules.isEmpty) return s
    val out = Array.newBuilder[String]
    out.sizeHint(s.length)
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length) {
        val m = rules.getOrElse((s(i), s(i + 1)), null)
        if (m != null) { out += m; i += 2 }
        else { out += s(i); i += 1 }
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** UTF-8 byte comparison — the binary string order Spark's
    * `orderBy(asc)` uses, so local tie-breaks equal distributed ones
    * even off-ASCII (Java's `compareTo` is UTF-16 code-unit order,
    * which DISAGREES with UTF-8 byte order for supplementary-plane vs
    * U+E000..U+FFFF text). */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def containsPair(s: Array[String], l: String, r: String)
      : Boolean = {
    var i = 0
    while (i < s.length - 1) {
      if (s(i) == l && s(i + 1) == r) return true
      i += 1
    }
    false
  }

  /** Left-to-right non-overlapping merge of one word — the local twin
    * of [[applyMerge]]'s codegen fold (the fold compares the
    * ACCUMULATED last symbol, but a merged symbol `l+r` can never
    * itself equal `l` since `r` is non-empty, so scanning the original
    * array with an i+2 skip is the same function). */
  private def mergeWord(s: Array[String], l: String, r: String,
                        lr: String): Array[String] = {
    val out = Array.newBuilder[String]
    out.sizeHint(s.length)
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += lr; i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Driver-local merge loop over a collected (word, count) frame —
    * bit-equal to the distributed trainer by construction: the same
    * per-code-POINT initial segmentation ([[charSeg]], matching Spark
    * SQL's `split(w, '')`), the same
    * left-to-right non-overlapping merge, and the same
    * (count desc, lhs, rhs) argmax in UTF-8 byte order. Pair counts
    * maintain INCREMENTALLY (only words containing the merged pair are
    * touched, found via an add-only pair->word index) with a
    * lazy-deletion max-heap for the argmax — the standard in-memory
    * BPE-trainer shape, so a 32k-merge vocab is one collect + one
    * local loop. */
  private[graft] def trainBpeMergesLocal(
      wordCounts: Array[(String, Long)],
      numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    val nW = wordCounts.length
    val syms = new Array[Array[String]](nW)
    val cnt = new Array[Long](nW)
    // symbol strings are INTERNED: every occurrence of a 1-char symbol
    // (and later of a merged piece) shares one String instance, so the
    // per-char resident cost is the 8-byte array reference, not a
    // 40+-byte String per character — the working set the collect
    // estimate in trainBpeMerges models
    val intern = mutable.HashMap.empty[String, String]
    var i = 0
    while (i < nW) {
      syms(i) = charSeg(wordCounts(i)._1)
        .map(c => intern.getOrElseUpdate(c, c))
      cnt(i) = wordCounts(i)._2
      i += 1
    }
    val pairN = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // dequeues the CURRENT argmax: greatest count, ties to the UTF-8
    // smallest (lhs, rhs); entries are snapshots, validated against
    // pairN on pop (lazy deletion)
    val ord = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String),
                  b: (Long, String, String)): Int = {
        val c1 = java.lang.Long.compare(a._1, b._1)
        if (c1 != 0) c1
        else {
          val c2 = utf8Compare(b._2, a._2)
          if (c2 != 0) c2 else utf8Compare(b._3, a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def bump(wi: Int, sign: Long): Unit = {
      val s = syms(wi); val d = cnt(wi) * sign
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = pairN.getOrElse(p, 0L) + d
        if (n <= 0L) pairN.remove(p)
        else {
          pairN.update(p, n)
          heap.enqueue((n, p._1, p._2))
        }
        if (sign > 0L) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        j += 1
      }
    }
    i = 0; while (i < nW) { bump(i, 1L); i += 1 }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      var top: (Long, String, String) = null
      while (top == null && heap.nonEmpty) {
        val cand = heap.dequeue()
        if (pairN.get((cand._2, cand._3)).contains(cand._1)) top = cand
      }
      if (top == null) done = true
      else {
        val (n, l, r) = (top._1, top._2, top._3)
        val lr = intern.getOrElseUpdate(l + r, l + r)
        out += ((rank, l, r, lr, n))
        // the index is a SUPERSET (add-only): re-check adjacency before
        // paying the reprocess. After the pass no (l, r) adjacency
        // survives anywhere, so pairN(l, r) drains to zero via bump.
        val affected = pairWords.getOrElse((l, r), mutable.BitSet.empty)
        pairWords.remove((l, r))
        affected.foreach { wi =>
          if (containsPair(syms(wi), l, r)) {
            bump(wi, -1L)
            syms(wi) = mergeWord(syms(wi), l, r, lr)
            bump(wi, 1L)
          }
        }
        // lazy deletion means every count update leaves a stale heap
        // snapshot behind; over thousands of merges the heap would
        // otherwise grow without bound. When stale entries dominate
        // 4:1, rebuild from the live pair counts in one pass.
        if (heap.size > 4 * pairN.size + 1024) {
          heap.clear()
          pairN.foreach { case ((pl, pr), pn) => heap.enqueue((pn, pl, pr)) }
        }
        rank += 1
      }
    }
    out.result()
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

  /** Ranked BPE apply for one word — the standard encoder loop:
    * repeatedly merge the LOWEST-RANK pair present (all its
    * occurrences, left-to-right) until none of the rules match. For a
    * TRAINING-CONSISTENT rule list (every rule's sides exist before
    * the rule — what [[trainBpeMerges]] produces by construction) this
    * equals applying the rules sequentially in rank order, i.e.
    * [[applyMerge]]'s fold: a pair of rank r can only be created by
    * rules of rank < r, so by the time the sequential pass reaches
    * rule r every instance it will ever see exists. Per-word cost is
    * O(len · merges-applied), INDEPENDENT of the rule-list size —
    * which is what makes a 32k-rule vocabulary encodable. */
  private[graft] def applyMergesRanked(
      word: String, rank: java.util.HashMap[(String, String), Int])
      : Array[String] = {
    var syms = charSeg(word)
    var go = syms.length > 1
    while (go) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrDefault((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) go = false
      else {
        val (l, r) = (syms(bi), syms(bi + 1))
        syms = mergeWord(syms, l, r, l + r)
        go = syms.length > 1
      }
    }
    syms
  }

  private def rankMap(merges: Seq[(String, String)])
      : java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) =>
      if (!m.containsKey(p)) m.put(p, i)
      ()
    }
    m
  }

  /** BPE ENCODE at UNBOUNDED rule-list size — the apply path for a
    * vocabulary [[trainBpeMerges]] actually produces (thousands of
    * rules; [[bpeEncode]]'s codegen fold composes the rules into one
    * Janino unit and is capped at 64). Same contract and output as
    * [[bpeEncode]]; requires a training-consistent rule list (see
    * [[applyMergesRanked]] — rule lists from [[trainBpeMerges]] always
    * are, and the spec pins fold == ranked equality on them).
    *
    * Scale shape: the Zipf amortization — the ranked-apply walk runs
    * once per DISTINCT word in `mapPartitions` (the rank map builds
    * once per partition), piece counts join back by word, and document
    * bodies never cross a shuffle. Rule-list size affects only the
    * broadcast closure (~MBs for 32k rules), not per-word cost. */
  def bpeEncodeLarge(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "merge list must not be empty")
    require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
      "merge rule sides must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = wordCounts(docs, idCol, textCol)
    val mergesSeq = merges
    val pieces = wc.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val rank = rankMap(mergesSeq)
        it.map(w => (w, applyMergesRanked(w, rank).length.toLong))
      }.toDF("w", "np")
    wc.join(pieces, "w")
      .groupBy(col("doc"))
      .agg(sum(col("c") * col("np")).as("n_pieces"))
  }

  /** [[bpePieceFrequencies]] at unbounded rule-list size — the
    * piece-identity witness for [[bpeEncodeLarge]]. */
  def bpePieceFrequenciesLarge(docs: DataFrame, textCol: String,
                               merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "merge list must not be empty")
    require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
      "merge rule sides must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val wcw = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val mergesSeq = merges
    val pieces = wcw.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val rank = rankMap(mergesSeq)
        it.flatMap(w => applyMergesRanked(w, rank).map(p => (w, p)))
      }.toDF("w", "piece")
    wcw.join(pieces, "w")
      .groupBy("piece").agg(sum(col("c")).as("n"))
  }

  /** Frequency-ranked vocabulary table for a merge list:
    * `(piece, id)` with 0-based ids by corpus frequency descending
    * (ties by piece, binary order) — the id assignment every trained
    * tokenizer ships. Vocab-sized frame; the global rank window is
    * deliberately tiny. */
  def vocabTable(docs: DataFrame, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("piece").asc)
    bpePieceFrequenciesLarge(docs, textCol, merges)
      .withColumn("id", (row_number().over(w) - 1).cast("long"))
      .select(col("piece"), col("id"))
  }

  /** Token-id ENCODING — the tokenizer's output artifact: each
    * document becomes its array of vocabulary ids under the merge
    * list, pieces in document order. The final step of
    * `encode(train(corpus))`: what actually lands in a training shard
    * next to [[graft.operators.Sampling.packSequences]]' offsets.
    *
    * Scale shape: the Zipf amortization one more time — segmentation
    * runs per DISTINCT word ([[applyMergesRanked]]); the corpus-sized
    * streams carry (doc, positions, piece-id) INTEGERS only, the
    * vocab joins broadcast (vocab-sized by construction), and the
    * per-doc array reassembles with one collect_list + array_sort
    * (output == document length — inherent to emitting the encoding,
    * the [[graft.windows.AggFunctions]] accumulate contract). Pieces
    * absent from `vocab` (cross-corpus encoding) drop with the inner
    * join — pass a vocab containing every single char to make
    * encoding total. */
  def encodeToIds(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)],
                  vocab: DataFrame): DataFrame = {
    require(merges.nonEmpty, "merge list must not be empty")
    val spark = docs.sparkSession
    import spark.implicits._
    // spread: the tokenize + posexplode fan-out feeds the corpus-sized
    // word join's shuffle write — on the 2-task bench scan that map
    // side serialized (q_encode_ids task 6.4 s / wall 2.4 s under the
    // noop action); guarded no-op at cluster scale
    val toks = graft.util.Parallelism.spread(docs)
      .select(col(idCol).as("doc"),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as(Seq("tp", "w")))
    val mergesSeq = merges
    val words = toks.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val rank = rankMap(mergesSeq)
        it.map(w => (w, applyMergesRanked(w, rank).toSeq))
      }.toDF("w", "__pieces")
    toks.join(words, "w")
      .select(col("doc"), col("tp"),
        posexplode(col("__pieces")).as(Seq("pp", "piece")))
      .join(broadcast(vocab), "piece")
      .groupBy(col("doc"))
      .agg(transform(
        array_sort(collect_list(struct(col("tp"), col("pp"), col("id")))),
        s => s.getField("id")).as("ids"))
  }

  /** Token-id DECODING — the inverse of [[encodeToIds]]: each
    * `(doc, ids)` row becomes the document's decoded text, pieces
    * looked up in `vocab` and concatenated in id order. Because BPE
    * segmentation partitions each word's code points, decoding an
    * encoded corpus reproduces its tokens exactly (word boundaries are
    * not represented in the id stream, so the decoded form is the
    * boundary-free token concatenation — the `q_decode_roundtrip` gate
    * certifies `decode(encode(doc)) == concat(tokens(doc))` per
    * document).
    *
    * Scale shape: the id stream shuffles once on doc for reassembly
    * (inherent to emitting a per-doc value), the vocab join broadcasts
    * (vocab-sized by construction), and nothing else is corpus-global.
    * Ids absent from `vocab` drop with the inner join — decoding with
    * the wrong vocabulary surfaces as a round-trip failure, never a
    * crash. */
  def decodeIds(encoded: DataFrame, docCol: String, idsCol: String,
                vocab: DataFrame): DataFrame =
    encoded
      .select(col(docCol).as("doc"),
        posexplode(col(idsCol)).as(Seq("pos", "id")))
      .join(broadcast(vocab), "id")
      .groupBy("doc")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        s => s.getField("piece"))).as("decoded"))

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
    val maxLen = vocab.map(p => p.codePointCount(0, p.length)).max
    val vocabSeq = vocab
    val pieces = wcw.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val vs = vocabSeq.toSet
        it.flatMap(w => tokenizeWord(w, vs, maxLen).map(p => (w, p)))
      }.toDF("w", "piece")
    wcw.join(pieces, "w")
      .groupBy("piece").agg(sum(col("c")).as("n"))
  }

  // ----------------------------------------------------------------
  // Unigram-LM (SentencePiece-style) Viterbi segmentation
  // ----------------------------------------------------------------

  /** One Viterbi-segmented word: `(pieces, score, nUnk)` — the
    * segmentation maximizing the sum of per-piece log-probability
    * scores from `vocab`, the THIRD tokenizer family next to greedy
    * longest-match ([[tokenizeWord]]) and rank-ordered BPE
    * ([[applyMergesRanked]]). This is the inference rule of a
    * SentencePiece unigram model (Kudo 2018): pieces compete globally
    * over the whole word instead of left-to-right greedily, so
    * `value` can segment as `val+ue` even when a longer-at-position-0
    * piece exists.
    *
    * A code point no vocab piece covers advances one position as
    * [[Unk]] at `unkScore` (progress is guaranteed, segmentation is
    * total); the unk arm applies ONLY where the single code point is
    * itself out-of-vocab, matching SentencePiece's unk semantics.
    * Positions, piece lengths, and the DP itself count CODE POINTS
    * (the character model of Spark's `substr` and DuckDB's).
    *
    * Determinism across engines: the DuckDB oracle replays this DP
    * with a sliding window of the last `maxPieceLen` states and picks
    * the per-position argmax via `list_max` over
    * `STRUCT(sc, np, nu, ps)` — DuckDB struct/list total order. This
    * comparator mirrors that order exactly: score, then piece count,
    * then unk count, then the piece list element-wise by UTF-8 BYTES
    * (a shorter prefix sorts first). Path scores accumulate
    * left-to-right along the path in both engines, so equal paths are
    * BIT-equal and near-ties resolve identically; the gate vocabulary
    * makes true ties impossible outright (scores are -ln(prime) with
    * distinct primes — path sums are -ln of a product of primes,
    * unique per piece multiset by unique factorization, and the fixed
    * unk penalty cannot cancel a prime ratio since e^unkScore is
    * irrational), so the tail of the comparator is defensive. */
  def viterbiWord(word: String, vocab: Map[String, Double],
                  maxPieceLen: Int,
                  unkScore: Double): (List[String], Double, Long) = {
    // offs(i) = UTF-16 offset of the i-th code point; offs(ncp) = end
    val offs = new Array[Int](word.codePointCount(0, word.length) + 1)
    var ci = 0
    var off = 0
    while (off < word.length) {
      offs(ci) = off
      ci += 1
      off += Character.charCount(word.codePointAt(off))
    }
    offs(ci) = word.length
    val ncp = ci
    // best-per-position states; ps held REVERSED for O(1) extension
    val sc = new Array[Double](ncp + 1)
    val np = new Array[Long](ncp + 1)
    val nu = new Array[Long](ncp + 1)
    val ps = new Array[List[String]](ncp + 1)
    ps(0) = Nil
    var p = 1
    while (p <= ncp) {
      // l = 1 arm: vocab single code point, else the unk fallback —
      // always present, so every position is reachable
      val c1 = word.substring(offs(p - 1), offs(p))
      var bSc = 0.0d
      var bNp = 0L
      var bNu = 0L
      var bPs: List[String] = null
      vocab.get(c1) match {
        case Some(s) =>
          bSc = sc(p - 1) + s; bNp = np(p - 1) + 1; bNu = nu(p - 1)
          bPs = c1 :: ps(p - 1)
        case None =>
          bSc = sc(p - 1) + unkScore; bNp = np(p - 1) + 1
          bNu = nu(p - 1) + 1; bPs = Unk :: ps(p - 1)
      }
      var l = 2
      while (l <= maxPieceLen && l <= p) {
        val cand = word.substring(offs(p - l), offs(p))
        vocab.get(cand) match {
          case Some(s) =>
            val cSc = sc(p - l) + s
            val cNp = np(p - l) + 1
            val cNu = nu(p - l)
            lazy val cPs = cand :: ps(p - l)
            if (structGt(cSc, cNp, cNu, cPs, bSc, bNp, bNu, bPs)) {
              bSc = cSc; bNp = cNp; bNu = cNu; bPs = cPs
            }
          case None => ()
        }
        l += 1
      }
      sc(p) = bSc; np(p) = bNp; nu(p) = bNu; ps(p) = bPs
      p += 1
    }
    (ps(ncp).reverse, sc(ncp), nu(ncp))
  }

  /** DuckDB STRUCT(sc, np, nu, ps) total-order "a > b" — ps compared
    * element-wise by unsigned UTF-8 bytes, FORWARD piece order (the
    * stored lists are reversed, so compare reversed copies). Only the
    * sc arm is reachable under a tie-free vocabulary; see
    * [[viterbiWord]]. */
  private def structGt(aSc: Double, aNp: Long, aNu: Long,
                       aPs: => List[String], bSc: Double, bNp: Long,
                       bNu: Long, bPs: List[String]): Boolean = {
    if (aSc != bSc) return aSc > bSc
    if (aNp != bNp) return aNp > bNp
    if (aNu != bNu) return aNu > bNu
    psCompare(aPs.reverse, bPs.reverse) > 0
  }

  /** Element-wise list comparison, strings by unsigned UTF-8 bytes —
    * DuckDB's VARCHAR[] order. */
  private def psCompare(a: List[String], b: List[String]): Int =
    (a, b) match {
      case (Nil, Nil)         => 0
      case (Nil, _)           => -1
      case (_, Nil)           => 1
      case (x :: xs, y :: ys) =>
        val c = utf8Compare(x, y)
        if (c != 0) c else psCompare(xs, ys)
    }

  /** Per-word Viterbi results for every distinct corpus word:
    * `(w, np, nu, sc, ps)` — the same Zipf amortization as
    * [[pieceCounts]]: the DP runs once per DISTINCT word on the
    * vocabulary-sized frame, never per occurrence. */
  private def unigramWordPieces(wc: DataFrame,
                                vocab: Map[String, Double],
                                unkScore: Double): DataFrame = {
    require(vocab.nonEmpty, "unigram vocab must not be empty")
    require(vocab.keys.forall(_.nonEmpty), "vocab pieces must be non-empty")
    val spark = wc.sparkSession
    import spark.implicits._
    val maxLen = vocab.keys.map(p => p.codePointCount(0, p.length)).max
    val vocabSeq = vocab.toSeq // stable closure capture
    wc.select(col("w")).distinct().as[String].mapPartitions { it =>
      val vm = vocabSeq.toMap
      it.map { w =>
        val (pieces, score, nUnk) = viterbiWord(w, vm, maxLen, unkScore)
        (w, pieces.length.toLong, nUnk, score, pieces)
      }
    }.toDF("w", "np", "nu", "sc", "ps")
  }

  /** Soft (forward-backward) expected piece counts for ONE word, in
    * integer MICRO-occurrences — the E-step of the soft-EM trainer
    * (Kudo '18 §3.2 trains with full EM; [[viterbiWord]] is the hard
    * surrogate). Every path through the word contributes its posterior
    * mass to every piece it uses:
    *
    * {{{ E[count(piece at s..s+l)] = α(s) · p(piece) · β(s+l) / Z }}}
    *
    * computed in LOG space so long words cannot underflow, with the
    * engine's cross-engine determinism contract applied at every DP
    * cell: each α/β value is the [[round6]]-quantized log-sum-exp of
    * its (at most maxPieceLen) arm terms, combined in ascending piece
    * length with absent arms at the −10^9 sentinel (whose exp
    * underflows to exactly 0.0, an exact-identity addition) — so both
    * engines' ulp-different exp/ln collapse onto the same grid before
    * the next cell consumes them, and the DuckDB oracle replays the
    * recursion term by term. Posteriors quantize to the 10^-6
    * occurrence grid (HALF_UP, DuckDB's round) before any cross-word
    * aggregation, so sums are exact integer arithmetic in any order.
    * The l = 1 arm falls back to `unkScore` when the single code point
    * is out-of-vocab (totality, as in [[viterbiWord]]; unreachable in
    * training, where every corpus code point is seeded) — unk mass
    * normalizes the posterior but is never counted, matching the
    * M-step's vocab-only lookups. Positions count CODE POINTS. */
  private[graft] def softWordCounts(word: String,
                                    vocab: Map[String, Double],
                                    maxPieceLen: Int, unkScore: Double)
      : Seq[(String, Long)] = {
    val offs = new Array[Int](word.codePointCount(0, word.length) + 1)
    var ci = 0
    var off = 0
    while (off < word.length) {
      offs(ci) = off
      ci += 1
      off += Character.charCount(word.codePointAt(off))
    }
    offs(ci) = word.length
    val ncp = ci
    if (ncp == 0) return Nil
    val Absent = -1e9
    // fixed-order LSE over the maxPieceLen arm slots (l ascending)
    def lse(terms: Array[Double]): Double = {
      var m = terms(0)
      var i = 1
      while (i < terms.length) { if (terms(i) > m) m = terms(i); i += 1 }
      var s = 0.0
      i = 0
      while (i < terms.length) { s += math.exp(terms(i) - m); i += 1 }
      round6(m + math.log(s))
    }
    val aLog = new Array[Double](ncp + 1)
    aLog(0) = 0.0
    var p = 1
    while (p <= ncp) {
      val terms = Array.fill(maxPieceLen)(Absent)
      val c1 = word.substring(offs(p - 1), offs(p))
      terms(0) = aLog(p - 1) + vocab.getOrElse(c1, unkScore)
      var l = 2
      while (l <= maxPieceLen && l <= p) {
        vocab.get(word.substring(offs(p - l), offs(p))).foreach(s =>
          terms(l - 1) = aLog(p - l) + s)
        l += 1
      }
      aLog(p) = lse(terms)
      p += 1
    }
    val bLog = new Array[Double](ncp + 1)
    bLog(ncp) = 0.0
    var s0 = ncp - 1
    while (s0 >= 0) {
      val terms = Array.fill(maxPieceLen)(Absent)
      val c1 = word.substring(offs(s0), offs(s0 + 1))
      terms(0) = vocab.getOrElse(c1, unkScore) + bLog(s0 + 1)
      var l = 2
      while (l <= maxPieceLen && s0 + l <= ncp) {
        vocab.get(word.substring(offs(s0), offs(s0 + l))).foreach(s =>
          terms(l - 1) = s + bLog(s0 + l))
        l += 1
      }
      bLog(s0) = lse(terms)
      s0 -= 1
    }
    val z = aLog(ncp)
    val out = collection.mutable.HashMap.empty[String, Long]
    s0 = 0
    while (s0 < ncp) {
      var l = 1
      while (l <= maxPieceLen && s0 + l <= ncp) {
        val cand = word.substring(offs(s0), offs(s0 + l))
        vocab.get(cand).foreach { sc =>
          val micro = BigDecimal(
            math.exp(aLog(s0) + sc + bLog(s0 + l) - z) * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          if (micro > 0L)
            out.updateWith(cand)(o => Some(o.getOrElse(0L) + micro))
        }
        l += 1
      }
      s0 += 1
    }
    out.toSeq
  }

  /** Per-word soft expected counts for every distinct corpus word:
    * `(w, piece, micro)` — the soft twin of [[unigramWordPieces]],
    * same Zipf amortization (the forward-backward runs once per
    * DISTINCT word, never per occurrence, and never leaves the
    * executors). */
  private def unigramWordSoftCounts(wc: DataFrame,
                                    vocab: Map[String, Double],
                                    unkScore: Double): DataFrame = {
    require(vocab.nonEmpty, "unigram vocab must not be empty")
    val spark = wc.sparkSession
    import spark.implicits._
    val maxLen = vocab.keys.map(p => p.codePointCount(0, p.length)).max
    val vocabSeq = vocab.toSeq
    wc.select(col("w")).distinct().as[String].mapPartitions { it =>
      val vm = vocabSeq.toMap
      it.flatMap { w =>
        softWordCounts(w, vm, maxLen, unkScore)
          .map { case (piece, micro) => (w, piece, micro) }
      }
    }.toDF("w", "piece", "micro")
  }

  /** Per-document unigram-segmentation totals:
    * `(doc, n_pieces, n_unk, score)` with the score rounded to 4
    * decimals (sums of per-word doubles; the per-word values are
    * bit-identical across engines, the cross-word sum order is not —
    * the suite's avg_lp rounding convention). One corpus-sized
    * shuffle into (doc, word, count); everything else is
    * vocabulary-sized. */
  def unigramCounts(docs: DataFrame, idCol: String, textCol: String,
                    vocab: Map[String, Double],
                    unkScore: Double): DataFrame = {
    val wc = wordCounts(docs, idCol, textCol)
    wc.join(unigramWordPieces(wc, vocab, unkScore), "w")
      .groupBy("doc")
      .agg(sum(col("c") * col("np")).as("n_pieces"),
        sum(col("c") * col("nu")).as("n_unk"),
        round(sum(col("c") * col("sc")), 4).as("score"))
  }

  /** Corpus-wide unigram piece frequencies: `(piece, n)`, unks
    * collapsed into the `<unk>` row — pins PIECE IDENTITY of the
    * Viterbi path across engines (agreeing totals could coincide; an
    * agreeing distribution cannot). */
  def unigramPieceFrequencies(docs: DataFrame, textCol: String,
                              vocab: Map[String, Double],
                              unkScore: Double): DataFrame = {
    val wc = docs
      .select(explode(
          graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    wc.join(unigramWordPieces(wc, vocab, unkScore), "w")
      .select(col("c"), explode(col("ps")).as("piece"))
      .groupBy("piece").agg(sum(col("c")).as("n"))
  }

  // ----------------------------------------------------------------
  // Unigram-LM TRAINING (SentencePiece-style hard EM)
  // ----------------------------------------------------------------

  /** Round-half-away-from-zero to 6 decimals — the score QUANTIZATION
    * contract of [[trainUnigram]], shared bit-for-bit with the DuckDB
    * oracle's `round(x, 6)`: both engines compute ln() within 1 ulp of
    * each other, and quantizing to 1e-6 collapses that difference
    * except on a measure-zero boundary set. Exact-decimal BigDecimal
    * rounding, then IEEE division k/1e6, lands on the same double as
    * DuckDB's integer-scaled round. */
  private[graft] def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** M-step: add-one-smoothed log relative frequencies over the CURRENT
    * vocabulary, quantized by [[round6]]. Add-one keeps pieces the
    * E-step never used finite (they are pruned by loss, not by -inf);
    * the smoothing total runs over the current vocab only. `unit` is
    * the count scale — 1 for hard (Viterbi) occurrence counts, 10^6
    * for the soft E-step's micro-occurrence expected counts — so the
    * smoothing stays "add one occurrence" at either scale and the two
    * E-steps produce IDENTICAL scores when their counts agree
    * (`(c·u + u) / (T·u)` and `(c + 1) / T` are the same real number,
    * both exactly representable, so their IEEE quotients are the same
    * double). */
  private def unigramMStep(counts: Map[String, Long],
                           vocab: Seq[String],
                           unit: Long = 1L): Map[String, Double] = {
    val total = vocab.iterator.map(p => counts.getOrElse(p, 0L) + unit).sum
    vocab.iterator.map { p =>
      val c = counts.getOrElse(p, 0L) + unit
      p -> round6(math.log(c.toDouble / total.toDouble))
    }.toMap
  }

  /** The shared EM loop of [[trainUnigram]] / [[trainUnigramLocal]] —
    * everything after seed mining, parameterized by the E-step so the
    * distributed and driver-local trainers are the SAME algorithm by
    * construction. Per round: E (Viterbi counts under the current
    * scores), M ([[unigramMStep]]); between rounds, multi-char pieces
    * are PRUNED by likelihood loss — the corpus log-likelihood drop if
    * the piece were replaced by its single-character decomposition,
    * `loss(p) = count(p) * (score(p) - sum(score(char_i)))`, a closed
    * form (no nested re-segmentation) because every corpus character
    * is a never-pruned single piece, so the char path always exists.
    * Loss is [[round6]]-quantized and -0.0-canonicalized before the
    * (loss DESC, piece ASC) rank so both engines cut the same top
    * `targetMulti`. After a prune the surviving pieces keep their
    * M-step scores unrenormalized (the next E renormalizes implicitly;
    * the oracle replays the same convention). */
  private def unigramEmCore(seeds: Seq[(String, Long)],
                            singles: Seq[(String, Long)], targetMulti: Int,
                            emRounds: Int,
                            eStep: Map[String, Double] => Map[String, Long],
                            unit: Long = 1L)
      : Seq[(String, Double)] = {
    val singleSet = singles.map(_._1).toSet
    var vocab: Seq[String] = (singles ++ seeds).map(_._1)
    // seed counts are occurrences; lift them to the E-step's count
    // scale so the initial scores are identical across E-step kinds
    var scores = unigramMStep(
      (singles ++ seeds).map { case (p, c) => p -> c * unit }.toMap,
      vocab, unit)
    var r = 1
    while (r <= emRounds) {
      val c = eStep(scores)
      scores = unigramMStep(c, vocab, unit)
      if (r < emRounds) {
        val kept = vocab.filterNot(singleSet).map { p =>
          var charSum = 0.0
          charSeg(p).foreach(ch => charSum += scores(ch))
          // loss in OCCURRENCES at either scale (c/unit; exact
          // identity for unit = 1, one IEEE division otherwise)
          val raw = round6(c.getOrElse(p, 0L).toDouble / unit.toDouble *
            (scores(p) - charSum))
          (p, if (raw == 0.0) 0.0 else raw) // -0.0 -> +0.0: Scala's
          // total order sorts -0.0 < 0.0 where SQL compares them equal
        }.sortWith((a, b) => a._2 > b._2 ||
            (a._2 == b._2 && utf8Compare(a._1, b._1) < 0))
          .take(targetMulti).map(_._1)
        vocab = singles.map(_._1) ++ kept
        scores = scores.view.filterKeys(vocab.toSet).toMap
      }
      r += 1
    }
    vocab.map(p => (p, scores(p)))
      .sortWith((a, b) => utf8Compare(a._1, b._1) < 0)
  }

  /** Unigram-LM vocabulary TRAINING (Kudo, ACL '18 — the SentencePiece
    * unigram model; [[viterbiWord]]/[[unigramCounts]] are its apply
    * half): learn a `(piece, log-prob)` vocabulary from the corpus by
    * hard (Viterbi) EM over a seed candidate set, pruning toward
    * `targetMulti` multi-character pieces by likelihood loss.
    *
    *  1. SEED: the top `seedSize` character n-grams (lengths
    *     `minN..maxN`) by occurrence-weighted frequency over the
    *     distinct-word frame (the [[topNgramPieces]] mining pass),
    *     plus EVERY corpus code point as a never-pruned single piece —
    *     full coverage, so `<unk>` cannot fire during training.
    *  2. EM x `emRounds`: E = Viterbi-segment every distinct word
    *     under the current scores and count pieces weighted by word
    *     occurrence (hard EM by default — cheapest, and at corpus
    *     scale the argmax path carries almost all the mass), or with
    *     `soft = true` the forward-backward EXPECTED counts Kudo '18
    *     actually trains with ([[softWordCounts]] — micro-occurrence
    *     grid, so exported scores are comparable to spm_train's; both
    *     E-steps are exactly replayable by the DuckDB oracles); M =
    *     add-one-smoothed log relative frequencies ([[unigramMStep]])
    *     at the E-step's count unit.
    *  3. PRUNE between rounds by closed-form likelihood loss vs the
    *     piece's single-character decomposition (see
    *     [[unigramEmCore]]).
    *
    * Scale shape: the corpus shuffles ONCE into the distinct-word
    * frame, which is cached and re-walked by each E-step (per-word DP
    * via the same `mapPartitions` family as [[unigramCounts]] — a
    * vocabulary-sized closure broadcast, piece counts the only
    * shuffle, bounded by |vocab| per partition after partial
    * aggregation). Driver state is VOCABULARY-sized by construction
    * (seedSize + corpus alphabet + per-round count maps) — no corpus
    * cap needed, unlike the BPE trainer's word-frame collect: the
    * per-word DP never leaves the executors.
    *
    * Scores are [[round6]]-quantized at every M-step — the
    * cross-engine determinism contract (two engines' ln() differ by
    * ulps; the quantized scores are bit-equal, so Viterbi path sums
    * and the next round's argmaxes are too).
    *
    * Returns `(piece, score)` sorted by piece (UTF-8 byte order):
    * `targetMulti` multi-char pieces plus every corpus code point. */
  def trainUnigram(docs: DataFrame, textCol: String, seedSize: Int,
                   targetMulti: Int, minN: Int = 2, maxN: Int = 4,
                   emRounds: Int = 2, unkScore: Double = -10.0,
                   soft: Boolean = false)
      : Seq[(String, Double)] = {
    require(minN >= 2 && maxN >= minN,
      s"need 2 <= minN <= maxN, got $minN..$maxN")
    require(seedSize >= targetMulti && targetMulti >= 1,
      s"need seedSize >= targetMulti >= 1, got $seedSize/$targetMulti")
    require(emRounds >= 1, s"emRounds must be positive, got $emRounds")
    val wcw = docs
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = wcw
        .withColumn("n", explode(sequence(lit(minN), lit(maxN))))
        .where(length(col("w")) >= col("n"))
        .withColumn("s",
          explode(sequence(lit(0), length(col("w")) - col("n"))))
        .select(expr("substring(w, s + 1, n)").as("piece"), col("c"))
        .groupBy("piece").agg(sum(col("c")).as("n_occ"))
        .orderBy(col("n_occ").desc, col("piece").asc)
        .limit(seedSize)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val singles = wcw
        .withColumn("s", explode(sequence(lit(0), length(col("w")) - 1)))
        .select(expr("substring(w, s + 1, 1)").as("piece"), col("c"))
        .groupBy("piece").agg(sum(col("c")).as("n_occ"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortWith((a, b) => utf8Compare(a._1, b._1) < 0)
      def eStep(scores: Map[String, Double]): Map[String, Long] =
        wcw.join(unigramWordPieces(wcw, scores, unkScore), "w")
          .select(col("c"), explode(col("ps")).as("piece"))
          .groupBy("piece").agg(sum(col("c")).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // soft E-step: micro-occurrence expected counts, weighted by
      // word occurrence — exact integer aggregation in any order
      def eStepSoft(scores: Map[String, Double]): Map[String, Long] =
        wcw.join(unigramWordSoftCounts(wcw, scores, unkScore), "w")
          .select(col("piece"), (col("c") * col("micro")).as("cm"))
          .groupBy("piece").agg(sum(col("cm")).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      if (soft)
        unigramEmCore(seeds, singles, targetMulti, emRounds, eStepSoft,
          unit = 1000000L)
      else unigramEmCore(seeds, singles, targetMulti, emRounds, eStep)
    } finally { wcw.unpersist(); () }
  }

  /** Driver-local twin of [[trainUnigram]] over an explicit
    * `(distinct word, count)` frame — the local==distributed pin (the
    * [[trainBpeMergesLocal]] discipline): both call [[unigramEmCore]],
    * differing only in where the E-step's per-word DP runs, and
    * SubwordSpec asserts identical vocabularies on adversarial
    * corpora. */
  private[graft] def trainUnigramLocal(words: Seq[(String, Long)],
      seedSize: Int, targetMulti: Int, minN: Int, maxN: Int,
      emRounds: Int, unkScore: Double,
      soft: Boolean = false): Seq[(String, Double)] = {
    val cnt = collection.mutable.HashMap.empty[String, Long]
    val scnt = collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words) {
      val cs = charSeg(w)
      var i = 0
      while (i < cs.length) {
        scnt.updateWith(cs(i))(o => Some(o.getOrElse(0L) + c))
        var n = minN
        while (n <= maxN && i + n <= cs.length) {
          val p = cs.slice(i, i + n).mkString
          cnt.updateWith(p)(o => Some(o.getOrElse(0L) + c))
          n += 1
        }
        i += 1
      }
    }
    val seeds = cnt.toSeq.sortWith((a, b) => a._2 > b._2 ||
        (a._2 == b._2 && utf8Compare(a._1, b._1) < 0))
      .take(seedSize)
    val singles = scnt.toSeq
      .sortWith((a, b) => utf8Compare(a._1, b._1) < 0)
    def eStep(scores: Map[String, Double]): Map[String, Long] = {
      val maxLen = scores.keys.map(p => p.codePointCount(0, p.length)).max
      val m = collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- words) {
        val (ps, _, _) = viterbiWord(w, scores, maxLen, unkScore)
        ps.foreach(p => m.updateWith(p)(o => Some(o.getOrElse(0L) + c)))
      }
      m.toMap
    }
    def eStepSoft(scores: Map[String, Double]): Map[String, Long] = {
      val maxLen = scores.keys.map(p => p.codePointCount(0, p.length)).max
      val m = collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- words)
        softWordCounts(w, scores, maxLen, unkScore).foreach {
          case (p, micro) =>
            m.updateWith(p)(o => Some(o.getOrElse(0L) + c * micro))
        }
      m.toMap
    }
    if (soft)
      unigramEmCore(seeds, singles, targetMulti, emRounds, eStepSoft,
        unit = 1000000L)
    else unigramEmCore(seeds, singles, targetMulti, emRounds, eStep)
  }
}
