package graft.streaming

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous SEMANTIC (embedding-space) dedup — the IVF-cell twin of
  * [[StreamingDedup]]:
  *
  *   batch N survivors = batch N  minus  within-batch cosine near-dup
  *                                families (cell-bucketed)
  *                                minus  cosine near-dups of ANY earlier
  *                                survivor
  *
  * Where [[StreamingDedup]] buckets by LSH bands of text shingles, this
  * buckets by each vector's IVF cell (a shared centroid table — train
  * once, e.g. through [[graft.ingest.VectorIndex]]): "near" is judged
  * among semantic neighbors, verified by exact cosine ≥ `minCos`, and
  * the first copy always wins.
  *
  * Durable state shape: one parquet table under `indexDir` holding
  * (id, cid, vec) per survivor, partitioned by `batch` and written with
  * dynamic partition overwrite — replays overwrite their own partition
  * (idempotent), and the cross-batch read takes only `batch < batchId`.
  * Per-batch cost: the stored index is pruned to the BATCH's probed
  * cells before anything joins (the batch's cell set broadcasts), and
  * each probed cell contributes at most `maxBucket` stored candidates
  * through a bounded collect — O(batch × probes × maxBucket) candidate
  * cosines no matter how big the accumulated corpus or how hot a cell.
  */
object StreamingSemanticDedup {

  /** One micro-batch step over static frames (spec-pinned; [[attach]]
    * wires it under a streaming query). Returns `batch`'s survivors and
    * appends their (id, cid, vec) index rows under `batch=<batchId>`. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String, vecCol: String,
                   centroids: DataFrame, centroidIdCol: String, indexDir: String,
                   minCos: Double = 0.95, maxBucket: Int = 1000, probes: Int = 2,
                   droppedAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val cents: Seq[(Long, Seq[Float])] = centroids
      .select(col(centroidIdCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      .toSeq

    // (1) within-batch: cell-bucketed cosine pairs → components →
    // smallest id per family wins (the SemDeDup pipeline, one batch)
    val pairs = Similarity.nearDupPairsBy(batch, idCol, vecCol,
      Similarity.nearestCentroid(col(vecCol), cents, round4 = true),
      minCos, maxBucket, droppedAcc)
    val canon = Dedup.keepCanonical(batch, idCol, Dedup.duplicateClusters(pairs, "id_a", "id_b"))
      .select(col(idCol).as("id"), col(vecCol).cast("array<float>").as("vec"))
      .localCheckpoint() // three consumers: probe, anti-join, index append

    // (2) cross-batch: batch survivors probe their `probes` nearest
    // cells; the stored index is semi-joined down to those cells (the
    // batch's cell set is tiny and broadcasts), then capped per cell
    val prior = readIndex(spark, indexDir, belowBatch = Some(batchId))
    val probed = canon.select(col("id"), col("vec"),
      explode(Similarity.topCentroids(col("vec"), cents, probes, round4 = true)).as("cid"))
    val touched = prior.join(
      broadcast(probed.select("cid").distinct()), Seq("cid"), "left_semi")
    val buckets = touched.groupBy("cid")
      .agg(graft.expressions.BoundedCollect
        .boundedSortedCollect(col("id"), maxBucket, droppedAcc).as("ids"))
    val cand = probed.join(buckets, Seq("cid"))
      .select(col("id"), col("vec"), explode(col("ids")).as("old_id"))
    val oldVecs = touched.select(col("id").as("old_id"), col("vec").as("old_vec"))
      .join(cand.select("old_id").distinct(), Seq("old_id"), "left_semi")
    val dupOfPrior = cand.join(oldVecs, Seq("old_id"))
      .filter(Similarity.cosine(col("vec"), col("old_vec")) >= minCos)
      .select(col("id")).distinct()
    val survivors = canon.join(dupOfPrior, Seq("id"), "left_anti")
      .localCheckpoint() // index append + caller's sink share one computation

    // (3) append survivors' index rows (idempotent per batch)
    survivors
      .select(col("id"),
        Similarity.nearestCentroid(col("vec"), cents, round4 = true).as("cid"),
        col("vec"))
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$indexDir/vectors")
    survivors.select(col("id").as(idCol), col("vec").as(vecCol))
  }

  /** The stored (id, cid, vec) index, optionally only batches below
    * `belowBatch` (partition-pruned); empty with the right schema before
    * the first batch (durable-storage existence semantics shared with
    * [[StreamingDedup.readBatchedOr]]). */
  def readIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                belowBatch: Option[Long] = None): DataFrame = {
    import spark.implicits._
    StreamingDedup.readBatchedOr(spark, s"$indexDir/vectors", belowBatch,
      Seq.empty[(Long, Long, Seq[Float], Long)].toDF("id", "cid", "vec", "batch"))
  }

  /** Convenience wiring: survivors of every micro-batch land in `outDir`
    * (batch-partitioned, idempotent), same contract as
    * [[StreamingDedup.attach]]. */
  def attach(docs: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, centroidIdCol: String,
             indexDir: String, outDir: String, checkpointDir: String,
             minCos: Double = 0.95, maxBucket: Int = 1000, probes: Int = 2,
             droppedAcc: Option[org.apache.spark.util.LongAccumulator] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, vecCol, centroids, centroidIdCol,
          indexDir, minCos, maxBucket, probes, droppedAcc)
          .withColumn("batch", lit(batchId))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
