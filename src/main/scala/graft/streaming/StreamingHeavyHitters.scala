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
  * back to one `batch=-1` base partition when |batches| matters —
  * correct because cells are a commutative monoid. Compaction is a FULL
  * directory rewrite (absorbed partitions must actually disappear), so
  * it must run with the stream QUIESCED: a micro-batch partition
  * committed between compact's read and its rewrite would be deleted
  * (undercount). Stop the query, compact, restart — the same
  * stop-the-world contract a ledger checkpoint carries.
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

    val cells = StreamingDedup.readBatchedOr(spark, s"$indexDir/cells",
      belowBatch = Some(batchId + 1),
      empty = Seq.empty[(Int, Int, Long)].toDF("r", "b", "c"))
      .groupBy("r", "b").agg(sum("c").as("c"))
    Sketches.cmsEstimate(broadcast(cells), probes, probeCol, d, w)
      .withColumn("batch_id", lit(batchId))
  }

  /** Union-sum deltas with `batch < belowBatch` (plus any existing
    * base) into one `batch=-1` base partition, keeping newer deltas
    * intact — a FULL directory rewrite, not a dynamic overwrite, so
    * absorbed partitions actually disappear. Two preconditions: the
    * stream must be STOPPED (see class doc — a partition committed
    * between the read below and the rewrite would be deleted), and
    * `belowBatch` must sit at or below the stream's replayable horizon:
    * a replayed batch whose delta was absorbed would re-add its
    * partition and double-count (the same horizon contract every
    * ledger compaction here carries). */
  def compact(spark: org.apache.spark.sql.SparkSession, indexDir: String,
              belowBatch: Long): Unit = {
    import spark.implicits._
    val path = s"$indexDir/cells"
    val all = spark.read.parquet(path)
      .select(col("r"), col("b"), col("c").cast("long"), col("batch").cast("long"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val (absorb, keep) = all.partition(_._4 < belowBatch) // base batch=-1 absorbs too
    val base = absorb.groupBy(t => (t._1, t._2))
      .map { case ((r, b), ts) => (r, b, ts.map(_._3).sum, -1L) }.toSeq
    (base ++ keep).toDF("r", "b", "c", "batch")
      .coalesce(1).write.mode("overwrite")
      // static, not dynamic: absorbed partitions must actually disappear
      .option("partitionOverwriteMode", "static")
      .partitionBy("batch").parquet(path)
  }

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
