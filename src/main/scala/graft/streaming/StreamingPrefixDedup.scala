package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous EXACT-threshold dedup over a token-set stream — the
  * streaming face of [[graft.operators.Dedup.incrementalPrefixPairs]],
  * and the deterministic complement to [[StreamingDedup]]'s LSH path:
  *
  *   batch N survivors = batch N  minus  within-batch J ≥ θ families
  *                                minus  J ≥ θ matches of ANY earlier
  *                                       survivor — GUARANTEED recall,
  *                                       no banding probability
  *
  * The corpus memory is the stored prefix index ([[Dedup
  * .prefixIndexBuild]] seeds it, possibly from an empty frame): each
  * micro-batch probes it under the FROZEN token ordering (exactness
  * preserved — the prefix theorem needs only a consistent total order),
  * then folds its survivors in as their own `batch=<id>` partition via
  * [[Dedup.prefixIndexAppend]]. θ lives in the index's meta — one
  * source of truth for build, probe, and every future batch.
  *
  * Replay safety: the probe reads only partitions `batch < batchId`
  * (a replay never pairs against its own half-written attempt) and the
  * append overwrites only its own partition. Cross-batch matching
  * checks CANONICALS against earlier survivors (the [[StreamingDedup]]
  * convention — a family is represented by its smallest id, and only
  * that representative's matches decide the family's fate). */
object StreamingPrefixDedup {

  /** One micro-batch step: returns the surviving rows of `batch` and
    * appends their sets/prefix rows under `batch=<batchId>`. The index
    * at `indexDir` must exist ([[Dedup.prefixIndexBuild]], empty seed
    * allowed). Usable directly on static frames (spec-pinned) or via
    * [[attach]]. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
                   tokensCol: String, indexDir: String): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // every pair involving this batch, against index state < batchId
    val pairs = Dedup.incrementalPrefixPairs(batch, idCol, tokensCol, indexDir,
      belowBatch = Some(batchId)).localCheckpoint()
    // classify each pair end: in this batch, or stored? The flag frame
    // is batch-sized (8-byte ids) — usually tiny, but a backfill batch
    // can be arbitrarily large, so the broadcast takes the same
    // admission gate as every batch-side broadcast ([[BatchLedger]]);
    // past it the shuffle join is the floor.
    val ids = batch.select(col(idCol).cast("long").as("_fid"))
      .withColumn("_in", lit(true)).localCheckpoint()
    val flags = if (ids.count() <= BatchLedger.MaxBroadcastRows) broadcast(ids) else ids
    val tagged = pairs
      .join(flags.select(col("_fid").as("id_a"), col("_in").as("_a")), Seq("id_a"), "left_outer")
      .join(flags.select(col("_fid").as("id_b"), col("_in").as("_b")), Seq("id_b"), "left_outer")
    val within = tagged.filter(col("_a") && col("_b")).select("id_a", "id_b")
    // (1) within-batch: families collapse to their smallest id
    val canon = Dedup.keepCanonical(batch, idCol,
      Dedup.duplicateClusters(within, aCol = "id_a", bCol = "id_b"))
    // (2) cross-batch: a canonical matching ANY earlier survivor loses
    val crossIds = tagged
      .select(explode(array(
        when(col("_a") && col("_b").isNull, col("id_a")),
        when(col("_b") && col("_a").isNull, col("id_b")))).as("_cid"))
      .filter(col("_cid").isNotNull).distinct()
    val survivors = canon
      .join(crossIds, canon(idCol).cast("long") === col("_cid"), "left_anti")
      .localCheckpoint()
    // (3) fold survivors into the index (idempotent: own partition)
    Dedup.prefixIndexAppend(survivors, idCol, tokensCol, indexDir, batchId)
    Seq(pairs, ids).foreach(_.unpersist(blocking = false))
    survivors
  }

  /** Convenience wiring: survivors of every micro-batch land in `outDir`
    * (batch-partitioned, replay-idempotent). */
  def attach(docs: DataFrame, idCol: String, tokensCol: String,
             indexDir: String, outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = processBatch(batch, batchId, idCol, tokensCol, indexDir)
        s.withColumn("batch", lit(batchId))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
        s.unpersist(blocking = false)
        ()
      }
      .start()
}
