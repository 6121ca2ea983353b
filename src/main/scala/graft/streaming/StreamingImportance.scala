package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DSIR gate — the arrival-path importance filter run
  * continuously: each micro-batch is scored against the bucket counts
  * accumulated from every EARLIER batch, gated on a fixed score
  * threshold, and then folds its own counts into the model so the
  * target distribution estimate sharpens as the stream runs.
  *
  * Replay discipline: count addition is NOT idempotent (unlike
  * [[StreamingCardinality]]'s max-merge lattice), so the model is a
  * batch-partitioned DELTA ledger — each batch overwrites exactly its
  * own `batch=<id>` partition and serving reads `batch < batchId`
  * union-summed (the [[StreamingBudget]] pattern): a replayed batch
  * re-scores under the same prior state and rewrites the same delta,
  * bit-identical (spec-pinned).
  *
  * Scoring a batch against `batch < batchId` (its own tokens excluded
  * from the model) is also the statistically honest form — a batch
  * cannot vote itself target-like.
  *
  * State size: |batches| × ≤1024 rows of longs — ledger compaction is
  * a union-sum rewrite if |batches| ever matters. Threshold gating
  * (not top-permille): a per-batch permille would keep the best of a
  * BAD batch; a fixed threshold holds the bar absolute across the
  * stream. Batch 0 scores everything 0 (empty model) — admit-all under
  * a ≤0 threshold, the cold-start the caller chooses.
  */
object StreamingImportance {

  /** One micro-batch step: returns the scored batch
    * (doc, n_tokens, imp_q8, admitted) and writes this batch's count
    * delta under `indexDir/counts/batch=<batchId>`. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String, textCol: String,
                   targetCol: String, indexDir: String,
                   minScoreQ8: Long): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import spark.implicits._

    val prior = StreamingDedup.readBatchedOr(spark, s"$indexDir/counts",
      belowBatch = Some(batchId),
      empty = Seq.empty[(Int, Long, Long)].toDF("b", "tc", "rc"))
      .groupBy("b").agg(sum("tc").as("tc"), sum("rc").as("rc"))

    val delta = TextOps.importanceBucketCounts(batch, idCol, textCol, targetCol)
      .localCheckpoint() // consumed by the ledger write below
    delta.withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$indexDir/counts")

    TextOps.importanceScoreFromCounts(batch, idCol, textCol, prior)
      .withColumn("admitted", col("imp_q8") >= minScoreQ8)
  }

  /** Convenience wiring: scored+gated rows of every micro-batch land in
    * `outDir` (batch-partitioned, idempotent on replay). */
  def attach(docs: DataFrame, idCol: String, textCol: String, targetCol: String,
             indexDir: String, outDir: String, checkpointDir: String,
             minScoreQ8: Long): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, targetCol, indexDir, minScoreQ8)
          .withColumn("batch", lit(batchId))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
