package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Unigram-LM (SentencePiece-style) tokenizer — the second tokenizer
  * family next to [[Bpe]]: instead of growing a merge table bottom-up,
  * it keeps a PIECE VOCABULARY and segments each word by Viterbi over
  * piece scores, trained by EM rounds of segment → re-count → prune.
  *
  * ENGINE-PORTABLE variant (deliberate): classic unigram-LM runs
  * soft-EM over float log-likelihoods, which no cross-engine oracle
  * can hash-compare (the repo-wide integer-exactness doctrine — the
  * same adjudication that keeps the classifier and DSIR chains in
  * exact longs). This trainer is HARD-EM over integer counts with a
  * totally-ordered Viterbi objective:
  *
  *   segmentation score = (n_pieces ASC, Σ piece-count DESC,
  *                         predecessor index ASC)
  *
  * — fewest pieces first (the MDL instinct), frequent pieces break
  * ties, and the index tie-break makes the argmin path UNIQUE, so the
  * M-step piece counts are deterministic and the DuckDB oracle
  * ([[graft.queries.UnigramOracle]]) replays every round exactly.
  *
  * Training: ONE corpus scan → (word, freq) partial-agg groupBy →
  * driver EM over the Heaps-bounded word table (the [[Bpe.train]]
  * substrate: natural-language vocabulary grows sublinearly, so the
  * table is model-sized at any corpus size, and the 2M guard keeps a
  * non-Heaps corpus loud). Encode: Viterbi under the BROADCAST piece
  * table — per-row work, no shuffle beyond the per-doc aggregation. */
object Unigram {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Unigram")

  /** UTF-8 byte order for piece tie-breaks — what DuckDB's varchar
    * binary collation compares, NOT Java's UTF-16 compareTo (they
    * diverge above the BMP; the array_sort lesson). ASCII corpora
    * never notice; a CJK piece table would. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def byCountThenPiece(a: (String, Long), b: (String, Long)): Boolean =
    if (a._2 != b._2) a._2 > b._2 else utf8Less(a._1, b._1)

  /** Seed counts: every substring of every word up to `maxPieceLen`,
    * counted at every start position (overlaps included), weighted by
    * word frequency. */
  private def seedCounts(wordFreq: Seq[(String, Long)],
                         maxPieceLen: Int): mutable.HashMap[String, Long] = {
    val c = mutable.HashMap.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          c(p) = c.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    c
  }

  /** Viterbi segmentation of one word under a piece-count table:
    * minimize (pieces, -Σcount, predecessor) lexicographically.
    * Single-char pieces of the training corpus are always in the
    * vocabulary, so every training word segments; an encode-time
    * character the corpus never saw scores count 0 (never throws). */
  def segment(w: String, counts: collection.Map[String, Long],
              maxPieceLen: Int): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    // state per position: (k, sum, predecessor)
    val k = Array.fill(n + 1)(Int.MaxValue)
    val s = Array.fill(n + 1)(0L)
    val pi = Array.fill(n + 1)(-1)
    k(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (k(i) != Int.MaxValue) {
          val piece = w.substring(i, j)
          val c = counts.get(piece) match {
            case Some(v) => Some(v)
            // unseen SINGLE char: permitted at count 0 so hostile
            // encode input degrades instead of failing
            case None if j - i == 1 => Some(0L)
            case None => None
          }
          c.foreach { cv =>
            val nk = k(i) + 1
            val ns = s(i) + cv
            // lexicographic (k ASC, s DESC, i ASC); i ASC is implied by
            // scanning i ascending and requiring STRICT improvement
            if (nk < k(j) || (nk == k(j) && ns > s(j)))
              { k(j) = nk; s(j) = ns; pi(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var cur = n
    while (cur > 0) {
      val p = pi(cur)
      out += w.substring(p, cur)
      cur = p
    }
    out.reverse.toSeq
  }

  /** [[segment]] with the SentencePiece BYTE-FALLBACK contract: a
    * character ABSENT from the piece table (an encode-time OOV —
    * training always covers its own single chars, so this only fires
    * on text the vocabulary never saw, e.g. CJK through a Latin
    * tokenizer) contributes its UTF-8 bytes as pieces `<0xNN>` instead
    * of one count-0 char piece — the encoder stays total (nothing is
    * unrepresentable) and the piece count reflects the real modeling
    * cost (3 pieces for a 3-byte char, not 1 free pseudo-piece).
    *
    * Pinned semantics: the DP stays UTF-16 code-unit indexed like the
    * whole family; an OOV char weighs `len(UTF-8 bytes)` pieces at
    * count 0 in the objective (so known cover is always preferred),
    * and the path walk expands it to `<0xNN>` pieces in byte order.
    * BMP contract: a non-BMP codepoint is two surrogates, each
    * falling back independently (deterministic; the fixtures and the
    * oracle arithmetic live in the BMP). */
  def segmentByteFallback(w: String, counts: collection.Map[String, Long],
                          maxPieceLen: Int): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    def byteLen(c: Char): Int =
      String.valueOf(c).getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    val k = Array.fill(n + 1)(Int.MaxValue)
    val s = Array.fill(n + 1)(0L)
    val pi = Array.fill(n + 1)(-1)
    k(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (k(i) != Int.MaxValue) {
          val piece = w.substring(i, j)
          val cw: Option[(Int, Long)] = counts.get(piece) match {
            case Some(v) => Some((1, v))
            // OOV single char: byte-fallback — one piece per UTF-8 byte
            case None if j - i == 1 => Some((byteLen(w.charAt(i)), 0L))
            case None => None
          }
          cw.foreach { case (w2, cv) =>
            val nk = k(i) + w2
            val ns = s(i) + cv
            if (nk < k(j) || (nk == k(j) && ns > s(j)))
              { k(j) = nk; s(j) = ns; pi(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var cur = n
    while (cur > 0) {
      val p = pi(cur)
      val piece = w.substring(p, cur)
      if (cur - p == 1 && !counts.contains(piece))
        piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .reverseIterator.foreach(b => out += f"<0x${b & 0xff}%02X>")
      else out += piece
      cur = p
    }
    out.reverse.toSeq
  }

  /** Hard-EM over the word table: seed substring counts → `rounds` ×
    * (Viterbi-segment every word → re-count piece usage → keep all
    * single chars plus the top `nVocab` used multi-char pieces by
    * (count DESC, piece ASC)). Returns the final vocabulary in that
    * order (singles included, possibly at count 0 — they are the
    * fallback alphabet and never prune). */
  def trainPieces(wordFreq: Seq[(String, Long)], nVocab: Int,
                  maxPieceLen: Int = 3, rounds: Int = 2): Seq[(String, Long)] = {
    val seed = seedCounts(wordFreq, maxPieceLen)
    val singles: Seq[String] = seed.keysIterator.filter(_.length == 1).toSeq.sorted
    def prune(c: collection.Map[String, Long]): Map[String, Long] = {
      val multi = c.iterator.filter { case (p, v) => p.length > 1 && v > 0 }.toSeq
        .sortWith(byCountThenPiece).take(nVocab)
      (singles.map(p => p -> c.getOrElse(p, 0L)) ++ multi).toMap
    }
    var vocab = prune(seed)
    var r = 0
    while (r < rounds) {
      val u = mutable.HashMap.empty[String, Long]
      wordFreq.foreach { case (w, f) =>
        segment(w, vocab, maxPieceLen).foreach(p => u(p) = u.getOrElse(p, 0L) + f)
      }
      vocab = prune(u)
      r += 1
    }
    vocab.toSeq.sortWith(byCountThenPiece)
  }

  /** Distributed trainer: ONE corpus scan → (word, freq) groupBy →
    * driver EM (the [[Bpe.train]] shape, same 2M Heaps guard). */
  def train(df: DataFrame, textCol: String, nVocab: Int,
            maxPieceLen: Int = 3, rounds: Int = 2,
            maxVocabWords: Int = 2000000): Seq[(String, Long)] = {
    val freq = df.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (freq.size == maxVocabWords)
      log.warn(s"unigram-train: word table hit the $maxVocabWords guard")
    trainPieces(freq, nVocab, maxPieceLen, rounds)
  }

  /** Persist the trained piece table (rank = the (count DESC, piece
    * ASC) order — stored explicitly, parquet row order is not a
    * contract; the [[Bpe.saveMerges]] deploy shape). */
  def savePieces(spark: org.apache.spark.sql.SparkSession,
                 pieces: Seq[(String, Long)], dir: String): Unit = {
    import spark.implicits._
    pieces.zipWithIndex.map { case ((p, c), i) => (i.toLong, p, c) }
      .toDF("rank", "piece", "n")
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a stored piece table in rank order (inverse of
    * [[savePieces]]). Driver-side collect is the point — the encoder
    * broadcasts it. */
  def loadPieces(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Seq[(String, Long)] =
    spark.read.parquet(dir).orderBy("rank")
      .select("piece", "n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Distributed encoder: per doc, whitespace tokens vs Viterbi piece
    * count under the broadcast vocabulary — `(doc, n_tokens, n_pieces,
    * fertility)`; fertility is ONE closing double division of exact
    * longs (bit-identical across engines). Docs with zero tokens drop
    * (no fertility to report). Genuine per-word iterative DP — the
    * documented UDF exception, same as [[Bpe.encode]]. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             pieces: Seq[(String, Long)], maxPieceLen: Int = 3,
             byteFallback: Boolean = false): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(pieces.toMap)
    val nPieces = udf { (w: String) =>
      (if (byteFallback) segmentByteFallback(w, bc.value, maxPieceLen)
       else segment(w, bc.value, maxPieceLen)).length.toLong
    }
    df.select(col(idCol).as("doc"),
        explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .withColumn("np", nPieces(col("w")))
      .groupBy("doc")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum("np").cast("long").as("n_pieces"))
      .withColumn("fertility",
        col("n_pieces").cast("double") / col("n_tokens"))
  }
}
