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
  *     are dropped by the guard, and append files only become visible via
  *     the manifest committed with the watermark bump — the Spark analogue
  *     of "txn tables can only be ahead but not behind" with tolerated
  *     unique violations (cockroach.go:189-199);
  *   - steady-state small files: every `compactEvery` batches the append
  *     manifests are compacted (manifest swap, invisible to readers);
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
      maxFilesPerTrigger: Int = 64,
      compactEvery: Int = 32): StreamingQuery = {
    import spark.implicits._
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .textFile(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], batchId: Long) =>
        BlockIngest.applyBlocks(store, batch)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Seq("txn", "txn_participation", "block_header").foreach(t => store.compact(t))
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
      intervalMs: Long = 1000L,
      compactEvery: Int = 32): StreamingQuery = {
    import spark.implicits._
    spark.readStream
      .option("maxFilesPerTrigger", 64)
      .textFile(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], batchId: Long) =>
        BlockIngest.applyBlocks(store, batch)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Seq("txn", "txn_participation", "block_header").foreach(t => store.compact(t))
      }
      .start()
  }
}
