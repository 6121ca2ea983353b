package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer: train merges on the corpus, encode with
  * the learned ranks — the learned-tokenizer stage of a training-data
  * pipeline (the regex token counter measures whitespace tokens; this
  * measures what the model will actually see).
  *
  * 100 TB shape: training NEVER iterates over the corpus. One
  * distributed scan folds it to the (word, freq) table — Heaps-law
  * bounded, orders of magnitude smaller than the corpus — and the merge
  * loop runs driver-side on that table, exactly how sentencepiece / HF
  * tokenizers train (they stream the corpus once into word counts, then
  * train on the counts). The driver table is guarded by `maxVocab`
  * (duplicateClusters precedent: a named limit + log line, not a silent
  * OOM); past the guard, train on the top-`maxVocab` words by frequency
  * — rare-word truncation changes low-rank merges only, and the
  * truncation is logged. Encoding distributes: one scan, per-doc
  * bounded work against the broadcast rank map.
  *
  * Determinism contract (spec-pinned): pair counting follows Sennrich's
  * get_stats (adjacent symbol pairs, overlaps counted); ties on count
  * break by lexicographically smallest (left, right); merge application
  * is left-to-right non-overlapping. Same corpus → same merges, any
  * partitioning, any run.
  */
object Bpe {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Bpe")

  /** End-of-word marker symbol (its own symbol slot, not characters of
    * the word; a word whose merged characters spell the marker is a
    * theoretical collision we accept, as reference BPE does). */
  val EndMark = "</w>"

  /** Train `nMerges` merges on a (word, freq) table. Pure function —
    * the deterministic core both the distributed trainer and the specs
    * call. Returns merges in rank order (rank 0 first). */
  def trainMerges(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var seqs: Array[(Array[String], Long)] =
      wordFreq.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => (w.map(_.toString).toArray :+ EndMark, f) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((s, f) <- seqs; i <- 0 until s.length - 1)
        counts.updateWith((s(i), s(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val best = counts.keysIterator.reduceLeft { (a, b) =>
          val (ca, cb) = (counts(a), counts(b))
          if (cb > ca || (cb == ca && Ordering[(String, String)].lt(b, a))) b else a
        }
        merges += best
        seqs = seqs.map { case (s, f) => (applyMerge(s, best), f) }
      }
    }
    merges.toSeq
  }

  /** Left-to-right non-overlapping application of one merge. */
  private[operators] def applyMerge(s: Array[String], m: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == m._1 && s(i + 1) == m._2) {
        out += m._1 + m._2; i += 2
      } else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Encode ONE word (no marker) with ranked merges — HF greedy: merge
    * the lowest-ranked pair present, all its occurrences left-to-right,
    * until none remains. Returns the symbol count INCLUDING the
    * end-of-word symbol's carrier (a fully-merged word is 1). */
  def encodeWord(w: String, ranks: Map[(String, String), Int]): Int = {
    if (w.isEmpty) return 0
    var s: Array[String] = w.map(_.toString).toArray :+ EndMark
    var continue = true
    while (continue && s.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (s(i), s(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else s = applyMerge(s, best)
    }
    s.length
  }

  /** Distributed trainer: ONE corpus scan → (word, freq) partial-agg
    * groupBy → guarded driver merge loop. Returns the merge table in
    * rank order. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            maxVocab: Int = 2000000): Seq[(String, String)] = {
    val freq = df.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (freq.size == maxVocab)
      log.warn(s"bpe-train: vocab hit the $maxVocab guard; training on the " +
        "top words by frequency (low-rank merges may shift)")
    log.info(s"bpe-train: ${freq.size} distinct words, $nMerges merges requested")
    trainMerges(freq, nMerges)
  }

  /** Persist a trained merge table as parquet — the deploy artifact of
    * the train-once/encode-many contract (a tokenizer is trained on one
    * corpus snapshot and then encodes every future batch; retraining
    * per job would silently shift token boundaries mid-corpus). Rank is
    * the load order, stored explicitly — parquet row order is not a
    * contract. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a stored merge table in rank order (inverse of [[saveMerges]];
    * round-trip identity is spec-pinned). Driver-side collect is the
    * point — a merge table is vocabulary-sized, and the encoder wants
    * it broadcast, not joined. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Seq[(String, String)] =
    spark.read.parquet(dir).orderBy("rank")
      .select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** Distributed encoder: per-doc whitespace-token count vs BPE symbol
    * count under the broadcast rank map — `(doc, n_tokens, n_bpe,
    * bpe_ratio)`; ratio is ONE closing division of exact longs (the
    * classifier doctrine), null for empty docs. Genuine per-row
    * iterative merge logic — the documented UDF exception to the
    * functions-first rule (bounded per-word work, no shuffle). */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(ranks)
    val nBpe = udf { (ws: Seq[String]) =>
      var total = 0L
      if (ws != null) ws.foreach(w => total += encodeWord(w, bc.value))
      total
    }
    // null text behaves as empty (0 tokens, 0 pieces, null ratio) —
    // without the coalesce the per-row UDF NPEs on scraped-corpus nulls
    df.select(col(idCol).as("doc"),
        coalesce(TextOps.tokens(col(textCol)),
          array().cast("array<string>")).as("_ws"))
      .select(col("doc"),
        size(col("_ws")).cast("long").as("n_tokens"),
        nBpe(col("_ws")).as("n_bpe"))
      .withColumn("bpe_ratio",
        col("n_bpe").cast("double") /
          when(col("n_tokens") === 0, lit(null)).otherwise(col("n_tokens")).cast("double"))
  }
}
