package graft.operators

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Tokenizer-vocabulary INTERCHANGE — export/import of the two public
  * artifact formats a user brings from (or ships to) an existing
  * tokenizer, so vocabularies trained here ([[Subword.trainBpeMerges]],
  * [[Subword.trainUnigram]]) interoperate with the standard tooling and
  * external vocabularies drive this engine's apply paths
  * ([[Subword.bpeEncode]], [[Subword.unigramCounts]], `vocabTable` /
  * `encodeToIds`):
  *
  *  - HuggingFace `tokenizer.json`, `model.type = "BPE"` subset —
  *    `{"model": {"vocab": {piece: id}, "merges": [...]}}`. Export
  *    writes the classic `"l r"` string merge form; import accepts
  *    both that and the newer `["l", "r"]` pair form, so files from
  *    any tokenizers version load.
  *  - HuggingFace `tokenizer.json`, `model.type = "Unigram"` subset —
  *    `{"model": {"type": "Unigram", "unk_id": i?, "vocab": [[piece,
  *    score], …]}}`, the array-of-pairs layout the tokenizers library
  *    stores scored vocabularies in (and the format
  *    [[Subword.trainUnigram]]'s output ships to real tooling).
  *  - SentencePiece `.vocab` text — one `piece<TAB>score` line per
  *    piece in id order (the human-readable artifact `spm_train`
  *    emits next to its model; scores are log-probs, exactly
  *    [[Subword.trainUnigram]]'s output unit).
  *
  * Round-trips are BYTE-stable by construction (spec-pinned):
  * exports render fields in fixed order with `Double.toString`'s
  * shortest-exact form, so export-import-export reproduces the file
  * and import-export-import reproduces the structures. Everything is
  * driver-local by contract — a tokenizer vocabulary is a
  * driver-sized artifact (the same bound as the trainers' collected
  * state), never a distributed frame. */
object VocabIO {

  /** HuggingFace tokenizer.json (BPE model subset): `vocab` pieces in
    * id order (id = position), `merges` in rank order. Pieces
    * containing a space are not representable in the classic string
    * merge form — refused loudly rather than silently corrupted. */
  def toHfBpeJson(vocab: Seq[String],
                  merges: Seq[(String, String)]): String = {
    require(vocab.distinct.length == vocab.length,
      "duplicate piece in vocab")
    merges.foreach { case (l, r) =>
      require(!l.contains(" ") && !r.contains(" "),
        s"space inside merge symbol ('$l', '$r') is not representable " +
          "in the HF string merge form") }
    val json = JObject(
      "version" -> JString("1.0"),
      "model" -> JObject(
        "type" -> JString("BPE"),
        "vocab" -> JObject(vocab.zipWithIndex.map { case (p, i) =>
          p -> (JInt(i): JValue) }.toList),
        "merges" -> JArray(merges.map { case (l, r) =>
          JString(s"$l $r"): JValue }.toList)))
    JsonMethods.compact(JsonMethods.render(json))
  }

  /** Parse a HuggingFace tokenizer.json BPE model: returns (pieces in
    * id order, merges in rank order). Ids must be exactly 0..n-1 (the
    * dense assignment every real tokenizer ships); both merge
    * encodings are accepted. */
  def fromHfBpeJson(s: String): (Seq[String], Seq[(String, String)]) = {
    val model = JsonMethods.parse(s) \ "model"
    model \ "type" match {
      case JString("BPE") => ()
      case other => throw new IllegalArgumentException(
        s"expected model.type BPE, got $other")
    }
    val pairs = model \ "vocab" match {
      case JObject(fields) => fields.map {
        case (p, JInt(i)) => (p, i.toLong)
        case (p, other) => throw new IllegalArgumentException(
          s"vocab id for '$p' is not an integer: $other")
      }
      case other => throw new IllegalArgumentException(
        s"model.vocab is not an object: $other")
    }
    // json4s preserves duplicate JSON object fields — catch a repeated
    // vocab key at the boundary instead of exporting duplicates later
    require(pairs.map(_._1).distinct.length == pairs.length,
      "duplicate piece key in model.vocab")
    val ids = pairs.map(_._2).sorted
    require(ids == (0L until pairs.length.toLong).toList,
      s"vocab ids must be dense 0..${pairs.length - 1}")
    val pieces = pairs.sortBy(_._2).map(_._1)
    val merges = model \ "merges" match {
      case JArray(xs) => xs.map {
        case JString(m) =>
          val i = m.indexOf(' ')
          // exactly ONE space: "a b c" is ambiguous in the classic
          // string form (export refuses space-bearing symbols, so no
          // legitimate file contains it) — refuse rather than silently
          // parsing ("a", "b c") (r16 ADVICE)
          require(i > 0 && i < m.length - 1 && i == m.lastIndexOf(' '),
            s"merge '$m' is not 'left right' (exactly one space)")
          (m.substring(0, i), m.substring(i + 1))
        case JArray(List(JString(l), JString(r))) => (l, r)
        case other => throw new IllegalArgumentException(
          s"merge entry is neither 'l r' nor [l, r]: $other")
      }
      case other => throw new IllegalArgumentException(
        s"model.merges is not an array: $other")
    }
    (pieces, merges)
  }

  /** HuggingFace tokenizer.json, `model.type = "Unigram"` subset —
    * `{"model": {"type": "Unigram", "unk_id": i?, "vocab": [[piece,
    * score], …]}}` with double log-prob scores: the format
    * [[Subword.trainUnigram]]'s output actually ships in (HF
    * tokenizers' Unigram model stores the vocab as an ARRAY of
    * [piece, score] pairs, id = position — not the BPE form's
    * piece→id object). `unk_id` is optional, as in the tooling's own
    * files, and round-trips when present.
    *
    * Provenance note for shipped vocabularies: scores from
    * [[Subword.trainUnigram]]'s DEFAULT hard-EM (Viterbi-count)
    * E-step diverge from SentencePiece's soft forward-backward
    * expectations — segmentation at APPLY time is identical machinery
    * (Viterbi in both), but the score values for the same corpus can
    * differ from an spm_train run's, so compare segmentations, not raw
    * scores, when validating a hard-EM export against SentencePiece's
    * own artifact. Train with `soft = true` (the forward-backward
    * E-step, gate q_unigram_train_soft) when score comparability to
    * spm_train matters. */
  def toHfUnigramJson(vocab: Seq[(String, Double)],
                      unkId: Option[Int] = None): String = {
    require(vocab.map(_._1).distinct.length == vocab.length,
      "duplicate piece in vocab")
    // NaN/Infinity have no JSON representation — json4s would render
    // the bare token `NaN` and the failure would surface later as a
    // foreign parser error instead of here (review finding: the same
    // loud-refusal boundary as the sibling exporters)
    vocab.foreach { case (p, sc) =>
      require(!sc.isNaN && !sc.isInfinity,
        s"score for piece '$p' is $sc — not representable in JSON") }
    unkId.foreach(i => require(i >= 0 && i < vocab.length,
      s"unk_id $i is outside the vocab (size ${vocab.length})"))
    val fields: List[JField] =
      List("type" -> (JString("Unigram"): JValue)) :::
        unkId.map(i => "unk_id" -> (JInt(i): JValue)).toList :::
        List("vocab" -> (JArray(vocab.map { case (p, s) =>
          JArray(List(JString(p), JDouble(s))): JValue }.toList): JValue))
    val json = JObject(
      "version" -> JString("1.0"),
      "model" -> JObject(fields))
    JsonMethods.compact(JsonMethods.render(json))
  }

  /** Parse a HuggingFace tokenizer.json Unigram model: returns (pieces
    * with scores in id order, optional unk_id). Integer-rendered
    * scores (a foreign writer's `-10` for `-10.0`) are accepted;
    * duplicate pieces and an out-of-range unk_id are refused loudly,
    * the same boundary discipline as the BPE form. */
  def fromHfUnigramJson(s: String): (Seq[(String, Double)], Option[Int]) = {
    val model = JsonMethods.parse(s) \ "model"
    model \ "type" match {
      case JString("Unigram") => ()
      case other => throw new IllegalArgumentException(
        s"expected model.type Unigram, got $other")
    }
    // bounds-check the BigInt BEFORE .toInt: a malformed unk_id like
    // 2^32 would otherwise wrap to 0 and slip past the range guard
    // (review finding)
    val unkRaw = model \ "unk_id" match {
      case JInt(i) => Some(i)
      case JNothing | JNull => None
      case other => throw new IllegalArgumentException(
        s"model.unk_id is not an integer: $other")
    }
    val vocab = model \ "vocab" match {
      case JArray(xs) => xs.map {
        case JArray(List(JString(p), JDouble(sc))) => (p, sc)
        case JArray(List(JString(p), JInt(i))) => (p, i.toDouble)
        case JArray(List(JString(p), JDecimal(d))) => (p, d.toDouble)
        case other => throw new IllegalArgumentException(
          s"vocab entry is not [piece, score]: $other")
      }
      case other => throw new IllegalArgumentException(
        s"model.vocab is not an array: $other")
    }
    require(vocab.map(_._1).distinct.length == vocab.length,
      "duplicate piece in model.vocab")
    unkRaw.foreach(i => require(i >= 0 && i < vocab.length,
      s"unk_id $i is outside the vocab (size ${vocab.length})"))
    (vocab, unkRaw.map(_.toInt))
  }

  /** SentencePiece `.vocab` text: one `piece<TAB>score` line per piece
    * in the given order, trailing newline. Tab/newline inside a piece
    * has no representation in the format — refused loudly. */
  def toSentencePieceVocab(vocab: Seq[(String, Double)]): String = {
    vocab.foreach { case (p, _) =>
      require(!p.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"piece ${p.map(_.toInt).mkString("[", ",", "]")} contains a " +
          "tab/newline — not representable in the .vocab line format") }
    vocab.map { case (p, sc) => s"$p\t$sc" }.mkString("", "\n", "\n")
  }

  /** Parse SentencePiece `.vocab` text (the inverse of
    * [[toSentencePieceVocab]]; also reads spm_train's own output —
    * its scores are plain decimals). Blank lines are ignored; CRLF
    * line endings are accepted (the trailing '\r' is stripped per
    * line — r16 ADVICE: a CRLF file used to surface as a raw
    * NumberFormatException on the score field). */
  def fromSentencePieceVocab(text: String): Seq[(String, Double)] =
    text.split("\r?\n", -1).iterator.filter(_.nonEmpty).map { line =>
      val i = line.lastIndexOf('\t')
      require(i > 0, s"not a piece<TAB>score line: '$line'")
      (line.substring(0, i), line.substring(i + 1).toDouble)
    }.toSeq
}
