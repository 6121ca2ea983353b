package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous multimodal ingest — the streaming face of the
  * `mm_corpus_build` capstone: per micro-batch,
  *
  *   (1) VALIDATE on parsed metadata ([[Multimodal.decodeMeta]] gates:
  *       image area, audio rate/length — undecodable blobs fail every
  *       gate and vanish),
  *   (2) IDENTIFY content: images get the perceptual dHash
  *       (cross-FORMAT: a PNG and a JPEG of the same image share a
  *       key), audio gets the container-independent PCM digest
  *       ([[Multimodal.pcmKey]]),
  *   (3) DEDUP within the batch (smallest media id per key wins) and
  *       across batches against the PERSISTENT key ledger — an
  *       arrival whose key any earlier batch admitted is rejected,
  *   (4) ADMIT: survivors append their keys to the ledger and land in
  *       the manifest with per-kind stats.
  *
  * State shape at 100 TB/day: the streaming state store stays EMPTY —
  * corpus memory is one durable `keys/` parquet table under
  * `ledgerDir`, batch-partitioned and written with dynamic partition
  * overwrite, so a replayed micro-batch overwrites its own partition
  * (idempotent) and the cross-batch check reads only `batch <
  * batchId`, never a half-written own attempt. Per-batch work is
  * O(batch) decode (rides the scan) plus one key anti-join against the
  * ledger — the same admission shape as [[StreamingDedup]], with media
  * keys in place of LSH bands. */
object StreamingMedia {

  /** One micro-batch step: returns the admitted manifest rows
    * (media_id, kind, key, batch_copies, width, height, sample_rate,
    * n_frames) and appends their keys under `batch=<batchId>`. Usable
    * directly on static frames (spec-pinned) or via [[attach]]. The
    * returned frame is localCheckpoint'ed; the caller unpersists it
    * when the batch is done. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String, blobCol: String,
                   ledgerDir: String, minImageArea: Long = 16,
                   minAudioFrames: Long = 10, minAudioRate: Int = 16000): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // decode once; meta gates + both key paths + the manifest share it
    val b = batch.localCheckpoint()
    val meta = Multimodal.decodeMeta(b, idCol, blobCol).localCheckpoint()
    val imgKept = meta
      .filter(col("format").isin("png", "jpeg") &&
        col("width").cast("long") * col("height") >= minImageArea)
      .select(col("media_id"), col("width"), col("height"))
    val audKept = meta
      .filter(col("format") === "wav" &&
        col("n_frames") >= minAudioFrames && col("sample_rate") >= minAudioRate)
      .select(col("media_id"), col("sample_rate"), col("n_frames"))
    // id frames are batch-kept-sized — usually tiny, but a backfill
    // batch can be arbitrarily large, so the id broadcasts take the
    // row gate (8-byte ids; counts scan the checkpointed meta)
    val blobGate = imgKept.count() + audKept.count() <= BatchLedger.MaxBroadcastRows
    def blobsFor(ids: DataFrame) = {
      val sel = ids.select(col("media_id").as(idCol))
      b.join(if (blobGate) broadcast(sel) else sel, Seq(idCol), "left_semi")
    }
    val keys = Multimodal.dHash64(blobsFor(imgKept), idCol, blobCol)
      .select(col("media_id"), concat(lit("img:"), col("dhash").cast("string")).as("key"))
      .unionByName(Multimodal.pcmKey(blobsFor(audKept), idCol, blobCol)
        .select(col("media_id"), concat(lit("pcm:"), col("pcm_key")).as("key")))
      .localCheckpoint()
    // within-batch: smallest media id per key wins, copies counted
    val winners = keys.groupBy("key")
      .agg(min("media_id").as("media_id"),
        count(lit(1)).cast("long").as("batch_copies"))
      .localCheckpoint()
    // cross-batch: the stored ledger rejects keys any earlier batch
    // admitted. The key ledger is CORPUS-sized, so admission takes the
    // [[BatchLedger.gatedAntiSemi]] discipline: the batch's winner keys
    // broadcast INTO the ledger scan (zero per-batch ledger shuffle —
    // the old direct anti-join sort-merged the whole ledger every
    // batch), with the big-big SMJ floor past the byte-aware gate.
    // Ledger keys are unique by construction (a key admits once), so
    // the old `.distinct()` on the ledger side was a spent shuffle.
    val prior = StreamingDedup.readBatchedOr(spark, s"$ledgerDir/keys",
      belowBatch = Some(batchId), {
        import spark.implicits._
        Seq.empty[(String, Long)].toDF("key", "media_id")
      })
    val keyGate = BatchLedger.broadcastable(winners, Seq("key", "media_id"))
    val (admitted, _, ledgerCps) = BatchLedger.gatedAntiSemi(
      winners, prior.select("key"), winners.select("key"), Seq("key"), keyGate)
    // append the admitted keys (idempotent per batch: own-partition overwrite)
    admitted.select(col("key"), col("media_id")).withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$ledgerDir/keys")
    val manifest = admitted
      .join(imgKept, Seq("media_id"))
      .select(col("media_id"), lit("image").as("kind"), col("key"),
        col("batch_copies"), col("width"), col("height"),
        lit(null).cast("int").as("sample_rate"), lit(null).cast("long").as("n_frames"))
      .unionByName(admitted.join(audKept, Seq("media_id"))
        .select(col("media_id"), lit("audio").as("kind"), col("key"),
          col("batch_copies"), lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          col("sample_rate"), col("n_frames").cast("long").as("n_frames")))
      .localCheckpoint()
    (Seq(b, meta, keys, winners) ++ ledgerCps).foreach(_.unpersist(blocking = false))
    manifest
  }

  /** Pack a batch's ADMITTED blobs into WebDataset-style tar shards —
    * the durable training-ready output of the streaming ingest: the
    * manifest's admitted ids semi-join back to the batch blobs, shards
    * assign by id (deterministic, content-stable across replays), one
    * USTAR archive per (batch, shard) via
    * [[graft.operators.Sharding.packTarShards]], stored as parquet rows
    * (shard, tar, n_members, n_tar_bytes) partitioned by batch — the
    * same own-partition-overwrite replay idempotence as every ledger,
    * and since tar bytes are deterministic a replayed batch rewrites
    * byte-identical shards. */
  def writeShards(batch: DataFrame, manifest: DataFrame, batchId: Long,
                  idCol: String, blobCol: String, shardDir: String,
                  nShards: Int = 4): Unit = {
    val ids = manifest.select(col("media_id").as(idCol))
    val idGate = manifest.count() <= BatchLedger.MaxBroadcastRows
    val admitted = batch
      .join(if (idGate) broadcast(ids) else ids, Seq(idCol), "left_semi")
      .withColumn("shard", pmod(col(idCol), lit(nShards)).cast("int"))
    graft.operators.Sharding.packTarShards(admitted, "shard", idCol, blobCol)
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$shardDir/tars")
  }

  /** Convenience wiring: the admitted manifest of every micro-batch
    * lands in `outDir` (same batch-partitioned idempotent shape as the
    * ledger); with `shardDir` set, the admitted BLOBS additionally land
    * as per-batch tar shards via [[writeShards]]. */
  def attach(media: DataFrame, idCol: String, blobCol: String,
             ledgerDir: String, outDir: String, checkpointDir: String,
             minImageArea: Long = 16, minAudioFrames: Long = 10,
             minAudioRate: Int = 16000, shardDir: Option[String] = None,
             nShards: Int = 4): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val m = processBatch(batch, batchId, idCol, blobCol, ledgerDir,
          minImageArea, minAudioFrames, minAudioRate)
        m.withColumn("batch", lit(batchId))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
        shardDir.foreach(sd => writeShards(batch, m, batchId, idCol, blobCol, sd, nShards))
        m.unpersist(blocking = false)
        ()
      }
      .start()
}
