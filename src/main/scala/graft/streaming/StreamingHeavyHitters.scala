package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Running heavy-hitter frequencies over a stream — the streaming face
  * of the count-min sketch: each micro-batch folds its word counts into
  * d×w integer cells kept as a batch-partitioned DELTA ledger (cell
  * addition is not idempotent — the [[StreamingImportance]] replay
  * discipline, NOT [[StreamingCardinality]]'s free max-merge), and any
  * probe set is answerable from the union-summed cells without a
  * corpus-sized vocabulary ever existing.
  *
  * The ledger is |batches|·(d·w) rows of longs; `compact` union-sums it
  * into a BASE snapshot committed by an atomic [[BatchLedger]] pointer
  * swap — correct because cells are a commutative monoid. A batch
  * committed mid-compact writes `batch ≥ belowBatch` and is neither
  * read nor deleted by the compactor; the one precondition is the
  * replayable-horizon contract (a replayed batch whose delta was
  * absorbed would re-add it: undercount becomes overcount).
  */
object StreamingHeavyHitters {

  /** One micro-batch step: write this batch's cell delta under
    * `indexDir/cells/batch=<batchId>`, then return estimates for
    * `probes[probeCol]` over ALL cells ≤ batchId (own batch included —
    * frequency serving wants the freshest total, unlike the DSIR gate's
    * prior-only scoring). */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
                   probes: DataFrame, probeCol: String,
                   indexDir: String, d: Int = 4, w: Int = 1024): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import spark.implicits._

    val wc = batch
      .select(explode(graft.operators.TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val delta = Sketches.cmsCells(wc, "w", "c", d, w).localCheckpoint()
    delta.withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$indexDir/cells")

    val cells = BatchLedger.read(spark, indexDir, "cells", CellsPointerKey,
      belowBatch = Some(batchId + 1),
      empty = Seq.empty[(Int, Int, Long)].toDF("r", "b", "c"))
      .groupBy("r", "b").agg(sum("c").as("c"))
    Sketches.cmsEstimate(broadcast(cells), probes, probeCol, d, w)
      .withColumn("batch_id", lit(batchId))
  }

  private[streaming] val CellsPointerKey = "hh.cells.base"

  /** Union-sum deltas with `batch < belowBatch` (plus any existing
    * base) into a new base snapshot committed atomically via
    * [[BatchLedger.compact]], keeping newer deltas intact. Cells are a
    * commutative monoid, so absorption is one groupBy-sum — a
    * sketch-sized frame, coalesced to one file. The only precondition
    * is the horizon contract: `belowBatch` at or below the stream's
    * replayable horizon (a replayed batch whose delta was absorbed
    * would re-add its partition and double-count). */
  def compact(spark: org.apache.spark.sql.SparkSession, indexDir: String,
              belowBatch: Long): Unit =
    BatchLedger.compact(spark, indexDir, "cells", CellsPointerKey, belowBatch,
      absorb = _.groupBy("r", "b").agg(sum("c").as("c")).coalesce(1))

  /** Convenience wiring: per-batch probe estimates land in `outDir`. */
  def attach(docs: DataFrame, textCol: String,
             probes: DataFrame, probeCol: String,
             indexDir: String, outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, probes, probeCol, indexDir)
          .withColumn("batch", lit(batchId))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
