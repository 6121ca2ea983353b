package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Pins the streaming-DSIR contract: scoring uses only EARLIER batches'
  * counts, the ledger serve equals the merged batch counts, replay is
  * bit-identical, and gating admits target-like docs once the model has
  * seen the target. */
class StreamingImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val targetText = "alpha beta alpha beta alpha"
  private val noiseText = "gamma delta epsilon zeta gamma"

  private def docs(rows: (Long, String, Boolean)*) =
    rows.toDF("doc_id", "text", "is_t")

  test("scores against prior batches only; model sharpens; replay bit-identical") {
    val idx = tmpDir("simp-idx")

    // batch 0: empty model — every score must be exactly 0
    val b0 = StreamingImportance.processBatch(
      docs((1L, targetText, true), (2L, noiseText, false)),
      0L, "doc_id", "text", "is_t", idx, minScoreQ8 = 1L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(b0(1L) === ((0L, false)) && b0(2L) === ((0L, false)),
      "cold start: no model, neutral scores, threshold 1 admits none")

    // batch 1: the model now knows batch 0 — target-like scores positive,
    // noise-like negative
    val b1rows = docs((3L, targetText, false), (4L, noiseText, false))
    val b1 = StreamingImportance.processBatch(
      b1rows, 1L, "doc_id", "text", "is_t", idx, minScoreQ8 = 1L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(b1(3L)._1 > 0 && b1(3L)._2, s"target-like doc must be admitted: ${b1(3L)}")
    assert(b1(4L)._1 < 0 && !b1(4L)._2, s"noise-like doc must be rejected: ${b1(4L)}")

    // ledger serve == merged batch counts (the additive identity)
    val ledger = spark.read.parquet(s"$idx/counts")
      .groupBy("b").agg(sum("tc").as("tc"), sum("rc").as("rc"))
      .orderBy("b").collect().toSeq
    val direct = TextOps.importanceCountsMerge(
      TextOps.importanceBucketCounts(
        docs((1L, targetText, true), (2L, noiseText, false)), "doc_id", "text", "is_t"),
      TextOps.importanceBucketCounts(b1rows, "doc_id", "text", "is_t"))
      .orderBy("b").collect().toSeq
    assert(ledger === direct)

    // replay batch 1: same scores (prior state unchanged), same ledger
    val b1b = StreamingImportance.processBatch(
      b1rows, 1L, "doc_id", "text", "is_t", idx, minScoreQ8 = 1L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(b1b === b1, "replay must re-score identically")
    val ledger2 = spark.read.parquet(s"$idx/counts")
      .groupBy("b").agg(sum("tc").as("tc"), sum("rc").as("rc"))
      .orderBy("b").collect().toSeq
    assert(ledger2 === ledger, "replay must not double-count the ledger")
  }
}
