package graft.streaming

import graft.ingest.{BlockIngest, TableStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingest (SURVEY.md §2.H / §3.1): per-round block
  * JSON files → foreachBatch → BlockIngest.applyBlocks.
  *
  * Semantics mapping:
  *   - strict per-round ordering: the file source lists new files in order;
  *     the ordering guard inside applyBlocks enforces round == next and
  *     gap-free batches regardless (cockroach.go:142-146);
  *   - effectively-once: already-accounted rounds replayed after a restart
  *     are dropped by the guard, and the txn/participation append is an
  *     idempotent per-round partition overwrite — the Spark analogue of
  *     "txn tables can only be ahead but not behind" with tolerated unique
  *     violations (cockroach.go:189-199);
  *   - no watermark: blockchain rounds cannot be late (§2.H); the
  *     watermark IS the metastate next-round counter, bumped as the last
  *     step of each batch (the single commit point);
  *   - the reference's unbounded serialization-retry loop (util.go:44-68)
  *     maps to Structured Streaming's own task/batch retry machinery.
  */
object StreamIngest {

  /** Start the ingest stream. `inDir` receives one JSON file per round
    * (graft.codec.BlockCodec.blockToJson). */
  def start(
      spark: SparkSession,
      store: TableStore,
      inDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 64): StreamingQuery = {
    import spark.implicits._
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .textFile(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        BlockIngest.applyBlocks(store, batch)
      }
      .start()
  }

  /** Continuous variant for a live follower (same pipeline, processing-time
    * trigger). */
  def startContinuous(
      spark: SparkSession,
      store: TableStore,
      inDir: String,
      checkpointDir: String,
      intervalMs: Long = 1000L): StreamingQuery = {
    import spark.implicits._
    spark.readStream
      .option("maxFilesPerTrigger", 64)
      .textFile(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        BlockIngest.applyBlocks(store, batch)
      }
      .start()
  }
}
