package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard export — the last stage of the corpus pipeline
  * (dedupe → clean → SHARD → train): deterministic, engine-portable
  * shard assignment plus a partitioned writer.
  *
  * Assignment hashes the content key with md5 (the one hash every engine
  * computes bit-identically) so shard membership is reproducible by any
  * downstream system — a re-run, a different engine, or the trainer
  * itself can re-derive which shard a document belongs to without a
  * lookup table. Content-keyed shards are also stable under corpus
  * re-ordering and incremental additions, unlike round-robin or
  * monotonically_increasing_id schemes.
  *
  * Scale: assignment is a per-row expression (no shuffle); the writer
  * shuffles ONCE on the shard id — each of the `nShards` output dirs is
  * written by the tasks holding its rows, and file counts per shard are
  * controlled by the repartition width, not the input layout.
  */
object Sharding {

  /** Shard id in [0, nShards): first 8 md5 hex digits as an integer,
    * mod nShards. */
  def shardId(key: Column, nShards: Int): Column =
    (conv(substring(md5(key), 1, 8), 16, 10).cast("long") % nShards).cast("int")

  /** Assignment projection: the input plus a `shard` column. */
  def assign(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardId(col(keyCol), nShards))

  /** Write `df` as `shard=N` parquet directories under `outDir`. One
    * shuffle on (shard, sub-file) — both derived from the content key, so
    * the physical layout is as deterministic as the assignment; the
    * repartition width (nShards × filesPerShard) bounds files per shard
    * independent of the input layout. */
  def writeShards(df: DataFrame, outDir: String, keyCol: String,
                  nShards: Int, filesPerShard: Int = 1): Unit =
    assign(df, keyCol, nShards)
      .repartition(nShards * filesPerShard, col("shard"),
        pmod(xxhash64(col(keyCol)), lit(filesPerShard)))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
