package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Distribution-drift monitor over a document stream — the streaming face
  * of [[graft.operators.TextOps.ngramNovelty]]: per micro-batch, the
  * fraction of the batch's distinct word n-grams never seen in ANY
  * earlier batch. A steady source decays toward a low novelty floor
  * (Heaps' law); a jump means the upstream distribution moved (new
  * domain, new language, a scraper gone wrong) — the alarm an ingest
  * pipeline wants BEFORE the corpus is poisoned.
  *
  * State shape at 100 TB/day, same doctrine as [[StreamingDedup]]: the
  * corpus memory is a durable parquet gram set under `indexDir`
  * (`grams/`, md5-HASHED grams — membership needs identity, not text),
  * not executor state-store memory. Per-batch cost: one batch-side
  * hash + distinct, one left_anti against a column-pruned index scan,
  * and an append of only the NOVEL grams (the index grows by exactly
  * the new vocabulary, which Heaps' law keeps sublinear in the stream).
  *
  * Replay safety: the gram table is `batch=`-partitioned with dynamic
  * partition overwrite, and the novelty check reads only
  * `batch < batchId` — a replayed micro-batch overwrites its own
  * partition and reports the same numbers (spec-pinned).
  */
object StreamingNovelty {

  /** One micro-batch step: returns the one-row drift report
    * (batch_id, n_docs, n_grams, n_novel, novelty_frac) and appends the
    * novel grams under `batch=<batchId>`. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String, textCol: String,
                   indexDir: String, n: Int = 3): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import spark.implicits._

    val batchGrams = batch
      .select(explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("g"))
      .select(md5(col("g")).as("gh"))
      .distinct()
      .localCheckpoint() // consumed by the report AND the append
    val prior = StreamingDedup.readBatchedOr(spark, s"$indexDir/grams",
      belowBatch = Some(batchId), empty = Seq.empty[String].toDF("gh"))
    val novel = batchGrams.join(prior.select("gh"), Seq("gh"), "left_anti")
      .localCheckpoint()

    novel.withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$indexDir/grams")

    val nDocs = batch.count()
    val nGrams = batchGrams.count()
    val nNovel = novel.count()
    Seq((batchId, nDocs, nGrams, nNovel,
        if (nGrams == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(math.rint(nNovel.toDouble / nGrams * 10000) / 10000)))
      .toDF("batch_id", "n_docs", "n_grams", "n_novel", "novelty_frac")
  }

  /** Convenience wiring: one report row per micro-batch appended to
    * `outDir` (batch-partitioned, idempotent on replay). */
  def attach(docs: DataFrame, idCol: String, textCol: String,
             indexDir: String, outDir: String, checkpointDir: String,
             n: Int = 3): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, n)
          .withColumn("batch", col("batch_id"))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
