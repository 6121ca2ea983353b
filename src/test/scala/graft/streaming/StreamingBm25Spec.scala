package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the streaming BM25 index: cross-batch serve equals the batch
  * ranker over the union, replay is idempotent, and the serve read
  * prunes to the queried terms' buckets. */
class StreamingBm25Spec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range) = {
    val rnd = new scala.util.Random(21)
    val vocab = Vector("spark", "window", "merge", "filter", "join", "scan")
    ids.map(i => (i.toLong,
      Seq.fill(5 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
  }

  test("cross-batch serve ≡ batch ranker over the union; replay idempotent") {
    val idx = tmpDir("sbm25")
    val all = corpus(1 to 60)
    val (b0, b1) = all.splitAt(30)

    StreamingBm25.processBatch(b0.toDF("doc_id", "text"), 0L, "doc_id", "text", idx, nBuckets = 8)
    val r1 = StreamingBm25.processBatch(b1.toDF("doc_id", "text"), 1L, "doc_id", "text", idx, nBuckets = 8)
      .collect().head
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 30L)

    val served = StreamingBm25.topK(spark, idx, Seq("spark", "merge"), k = 12, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fresh = graft.operators.TextOps.bm25TopK(all.toDF("doc_id", "text"),
        "doc_id", "text", Seq("spark", "merge"), k = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == fresh, "streamed index must rank exactly like the batch ranker")

    // replay batch 1: partitions overwritten, not doubled — same serve
    StreamingBm25.processBatch(b1.toDF("doc_id", "text"), 1L, "doc_id", "text", idx, nBuckets = 8)
    val servedReplayed = StreamingBm25.topK(spark, idx, Seq("spark", "merge"), k = 12, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(servedReplayed == served, "replayed batch must be invisible")
    // stats did not double-count
    val nd = spark.read.parquet(s"$idx/stats").agg(sum("n_docs")).head.getLong(0)
    assert(nd == 60L)
  }

  test("vacuum: dropped batches vanish from serve; stats self-heal") {
    val idx = tmpDir("sbm25-vac")
    val all = corpus(1 to 60)
    val (b0, b1) = all.splitAt(30)
    StreamingBm25.processBatch(b0.toDF("doc_id", "text"), 0L, "doc_id", "text", idx, nBuckets = 8)
    StreamingBm25.processBatch(b1.toDF("doc_id", "text"), 1L, "doc_id", "text", idx, nBuckets = 8)
    StreamingBm25.vacuum(spark, idx, keepFromBatch = 1L)
    val served = StreamingBm25.topK(spark, idx, Seq("spark", "merge"), k = 12, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val freshRetained = graft.operators.TextOps.bm25TopK(b1.toDF("doc_id", "text"),
        "doc_id", "text", Seq("spark", "merge"), k = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == freshRetained,
      "after vacuum the index must behave as if only the retained batches ever arrived")
    assert(spark.read.parquet(s"$idx/stats").agg(sum("n_docs")).head.getLong(0) == 30L)
  }

  test("end-to-end under a streaming query") {
    val src = tmpDir("sbm25-src"); val idx = tmpDir("sbm25-idx"); val cp = tmpDir("sbm25-cp")
    corpus(1 to 20).toDF("doc_id", "text").write.mode("overwrite").parquet(src)
    val q = StreamingBm25.attach(
      spark.readStream.schema("doc_id long, text string").parquet(src),
      "doc_id", "text", idx, cp, nBuckets = 8)
    q.processAllAvailable(); q.stop()
    val served = StreamingBm25.topK(spark, idx, Seq("spark"), k = 5, nBuckets = 8)
    assert(served.count() > 0)
  }
}
