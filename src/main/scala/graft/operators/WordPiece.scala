package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** WordPiece tokenizer — the third learned-tokenizer family beside
  * [[Bpe]] (count-argmax merges) and [[Unigram]] (EM-pruned LM):
  * merges maximize the LIKELIHOOD RATIO `count(ab) / (count(a) *
  * count(b))` (pairs that co-occur far above chance fuse first — the
  * published WordPiece/BERT training rule), and encoding is greedy
  * LONGEST-MATCH-FIRST against the final vocabulary with `##`
  * continuation prefixes and a whole-word `[UNK]` fallback.
  *
  * 100 TB shape: identical to [[Bpe]] — one distributed scan folds the
  * corpus to the Heaps-bounded (word, freq) table, the merge loop runs
  * driver-side on that table, and encoding distributes against the
  * broadcast vocabulary.
  *
  * Determinism contract (spec-pinned, oracle-replayed): the merge
  * score is the FIXED-POINT key `(c * 10^24) div (ca * cb)` in exact
  * integer arithmetic — a deterministic 24-digit approximation of the
  * rational likelihood ratio whose floor both engines (BigInt here,
  * HUGEINT in DuckDB) compute bit-identically; fractions closer than
  * 10^-24 collapse into the tie-break, which is lexicographically
  * smallest (left, right). Merged symbols keep the left operand's
  * prefix and drop the right's `##`. Same corpus → same vocab, any
  * partitioning, any run. */
object WordPiece {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.operators.WordPiece")

  val Unk = "[UNK]"
  private val ScoreScale = BigInt(10).pow(24)

  private def symbols(w: String): Array[String] =
    Array(w.substring(0, 1)) ++ w.substring(1).map("##" + _)

  private def body(piece: String): String =
    if (piece.startsWith("##")) piece.substring(2) else piece

  /** Train `nMerges` merges on a (word, freq) table. Pure function —
    * the deterministic core both the distributed trainer and the specs
    * call. Returns (left, right, merged) in rank order. */
  def trainMerges(wordFreq: Seq[(String, Long)],
                  nMerges: Int): Seq[(String, String, String)] = {
    var seqs: Array[(Array[String], Long)] =
      wordFreq.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => (symbols(w), f) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      val symCounts = mutable.HashMap.empty[String, Long]
      for ((s, f) <- seqs) {
        var i = 0
        while (i < s.length) {
          symCounts.updateWith(s(i))(c => Some(c.getOrElse(0L) + f))
          if (i < s.length - 1)
            pairCounts.updateWith((s(i), s(i + 1)))(c => Some(c.getOrElse(0L) + f))
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        def key(p: (String, String)): BigInt =
          (BigInt(pairCounts(p)) * ScoreScale) /
            (BigInt(symCounts(p._1)) * BigInt(symCounts(p._2)))
        val best = pairCounts.keysIterator.reduceLeft { (a, b) =>
          val (ka, kb) = (key(a), key(b))
          if (kb > ka || (kb == ka && Ordering[(String, String)].lt(b, a))) b else a
        }
        val merged = best._1 + body(best._2)
        merges += ((best._1, best._2, merged))
        seqs = seqs.map { case (s, f) => (applyMerge(s, best, merged), f) }
      }
    }
    merges.toSeq
  }

  /** Left-to-right non-overlapping application of one merge. */
  private[operators] def applyMerge(s: Array[String], m: (String, String),
                                    merged: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == m._1 && s(i + 1) == m._2) {
        out += merged; i += 2
      } else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Vocabulary = every initial symbol of the training words plus each
    * merge's product — the set greedy encoding matches against. */
  def vocab(wordFreq: Seq[(String, Long)],
            merges: Seq[(String, String, String)]): Set[String] =
    wordFreq.iterator.filter(_._1.nonEmpty).flatMap(w => symbols(w._1)).toSet ++
      merges.map(_._3)

  /** Encode ONE word greedily: longest vocabulary piece at each
    * position (`##`-prefixed past position 0); a position with NO
    * matching piece collapses the WHOLE word to `[UNK]` (the
    * published WordPiece rule — partial emissions would corrupt
    * counts). */
  def encodeWord(w: String, voc: Set[String], maxPieceBody: Int): Seq[String] = {
    if (w.isEmpty) return Seq.empty
    val out = mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      var len = math.min(maxPieceBody, w.length - pos)
      var found: String = null
      var foundLen = 0
      while (len >= 1 && found == null) {
        val b = w.substring(pos, pos + len)
        // position 0 matches only NON-continuation pieces (a raw
        // substring that happens to spell "##…" must not match a
        // continuation piece — consumed length would lie); later
        // positions match only "##"-prefixed pieces
        val cand = if (pos == 0) b else "##" + b
        if (voc.contains(cand) && (pos > 0 || !b.startsWith("##"))) {
          found = cand
          foundLen = len
        }
        len -= 1
      }
      if (found == null) return Seq(Unk)
      out += found
      pos += foundLen
    }
    out.toSeq
  }

  /** Distributed training: fold `textCol` (whitespace tokens) to the
    * (word, freq) table, train driver-side. `maxVocab` guards the
    * driver table (the [[Bpe]] precedent: top-N by frequency with a
    * log line, never a silent OOM). */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            maxVocab: Int = 2000000): Seq[(String, String, String)] = {
    val wf = df
      .select(explode(filter(split(trim(col(textCol)), " "), _ =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    if (wf.size == maxVocab)
      log.warn(s"wordpiece train: word table truncated at maxVocab=$maxVocab")
    trainMerges(wf, nMerges)
  }

  /** Distributed encoding against a broadcast vocabulary: `(idCol,
    * n_tokens, n_pieces, n_unk_words)` per row. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             voc: Set[String]): DataFrame = {
    val spark = df.sparkSession
    val maxBody = if (voc.isEmpty) 1 else voc.iterator.map(p => body(p).length).max
    val bc = spark.sparkContext.broadcast(voc)
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    df.toDF.rdd.map { r =>
      val id = r.getLong(idIdx)
      val text = if (r.isNullAt(txtIdx)) "" else r.getString(txtIdx)
      val words = text.trim.split(" ").filter(_.nonEmpty)
      var pieces = 0L
      var unk = 0L
      words.foreach { w =>
        val enc = encodeWord(w, bc.value, maxBody)
        pieces += enc.length
        if (enc == Seq(Unk)) unk += 1
      }
      (id, words.length.toLong, pieces, unk)
    }.toDF(idCol, "n_tokens", "n_pieces", "n_unk_words")
  }
}
