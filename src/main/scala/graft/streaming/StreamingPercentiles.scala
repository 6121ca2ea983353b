package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Running per-group quantiles over a stream — the streaming face of the
  * additive histogram artifact ([[Sketches.histBuild]]): each micro-batch
  * writes its (group, value, count) delta into a batch-partitioned ledger
  * (count addition is not idempotent — the [[StreamingImportance]] replay
  * discipline) and quantiles serve from the union-summed ledger, exact,
  * with state bounded by the value DOMAIN rather than the stream length.
  * The fourth member of the stored-artifact streaming family: registers
  * (max-merge), CMS cells (additive), DSIR counts (additive), histograms
  * (additive).
  */
object StreamingPercentiles {

  /** One micro-batch step: write this batch's histogram delta under
    * `indexDir/hist/batch=<batchId>` and return the per-group quantile
    * report over ALL deltas ≤ batchId. */
  def processBatch(batch: DataFrame, batchId: Long, groupCol: String,
                   value: Column, indexDir: String,
                   qs: Seq[(String, Double)]): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import spark.implicits._

    val delta = Sketches.histBuild(batch, groupCol, value).localCheckpoint()
    delta.withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$indexDir/hist")

    val hist = StreamingDedup.readBatchedOr(spark, s"$indexDir/hist",
      belowBatch = Some(batchId + 1),
      empty = Seq.empty[(String, Long, Long)].toDF("g", "v", "c"))
      .groupBy("g", "v").agg(sum("c").as("c"))
    Sketches.histQuantilesFromHist(hist, qs)
      .withColumn("batch_id", lit(batchId))
  }

  /** Convenience wiring: one quantile report per group per micro-batch
    * lands in `outDir` (batch-partitioned, idempotent on replay). */
  def attach(docs: DataFrame, groupCol: String, value: Column,
             indexDir: String, outDir: String, checkpointDir: String,
             qs: Seq[(String, Double)]): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, groupCol, value, indexDir, qs)
          .withColumn("batch", lit(batchId))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
