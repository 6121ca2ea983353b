package graft.streaming

import graft.operators.Validation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Data-quality monitoring over a stream — the streaming face of
  * [[graft.operators.Validation]]: every micro-batch runs the declared
  * expectation suite over its own rows AND folds the counts into a
  * durable cumulative ledger, so the report answers both "is THIS batch
  * clean" (the circuit-breaker input: quarantine a poisoned batch
  * before it lands) and "how has quality drifted since stream start"
  * (the dashboard line). The reference's health surface
  * (`api/handlers.go`-style liveness) reports only progress; a data
  * pipeline's health is its violation counts.
  *
  * State doctrine (same as [[StreamingDedup]]/[[StreamingNovelty]]):
  * the ledger is a `batch=`-partitioned parquet under `stateDir`, NOT
  * executor state-store memory — per-check one-row frames, so the
  * ledger grows by |checks| rows per batch regardless of batch size.
  * Replay safety: a replayed batch overwrites its own partition and
  * recomputes cumulatives from `batch < batchId` + itself, so the
  * report is bit-identical on replay (spec-pinned).
  */
object StreamingValidation {

  /** One micro-batch step: per-check `(batch_id, check_name, tbl,
    * n_rows, n_violations, pass, cum_rows, cum_violations, cum_pass)`.
    * All of the batch's row-level checks still cost ONE scan of the
    * batch (the [[Validation.tableReport]] single-aggregate fold). */
  def processBatch(batch: DataFrame, batchId: Long, tbl: String,
                   checks: Seq[Validation.Check], stateDir: String): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val rep = Validation.tableReport(batch, tbl, checks).localCheckpoint()

    rep.withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$stateDir/checks")

    val prior = StreamingDedup.readBatchedOr(spark, s"$stateDir/checks",
      belowBatch = Some(batchId),
      empty = rep.limit(0).withColumn("batch", lit(-1L)))
    val cum = prior.select("check_name", "n_rows", "n_violations")
      .unionByName(rep.select("check_name", "n_rows", "n_violations"))
      .groupBy("check_name")
      .agg(sum("n_rows").as("cum_rows"), sum("n_violations").as("cum_violations"))
    rep.join(cum, Seq("check_name"))
      .select(lit(batchId).as("batch_id"), col("check_name"), col("tbl"),
        col("n_rows"), col("n_violations"), col("pass"),
        col("cum_rows"), col("cum_violations"),
        (col("cum_violations") === 0L).as("cum_pass"))
      .orderBy("check_name")
  }

  /** Convenience wiring: one report row per check per micro-batch,
    * batch-partitioned under `outDir` (idempotent on replay). */
  def attach(rows: DataFrame, tbl: String, checks: Seq[Validation.Check],
             stateDir: String, outDir: String, checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, tbl, checks, stateDir)
          .withColumn("batch", col("batch_id"))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
