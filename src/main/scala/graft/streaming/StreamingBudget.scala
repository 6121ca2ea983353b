package graft.streaming

import graft.operators.Sharding
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus assembly under per-source token budgets — the
  * continuous face of [[graft.operators.Sharding.fillTokenBudget]]: each
  * micro-batch admits its best-scoring documents per source until the
  * source's REMAINING budget is spent, where "remaining" accounts for
  * every earlier batch's admissions. The ingest-until-full shape: a
  * pipeline collecting "50 B tokens of source X, best first" stops
  * admitting X the moment the ledger fills, regardless of how much more
  * arrives.
  *
  * State: a durable per-(batch, source) token LEDGER under `stateDir` —
  * tiny (one row per source per batch), not executor memory, same
  * doctrine as [[StreamingDedup]]. Admission within a batch keeps
  * fillTokenBudget's score-group-atomic contract (discrete scores;
  * whole (source, score) groups admitted best-first).
  *
  * Replay safety: the ledger is `batch=`-partitioned with dynamic
  * partition overwrite and the remaining-budget read covers only
  * `batch < batchId`, so a replayed micro-batch re-derives the same
  * remaining budgets, admits the same rows, and overwrites its own
  * ledger partition. Ledger sources are bounded by the source-cardinality
  * contract (languages, domains-classes — not free-form), so the
  * per-batch driver collect is a few rows. */
object StreamingBudget {

  def processBatch(batch: DataFrame, batchId: Long,
                   sourceCol: String, scoreCol: String, tokensCol: String,
                   budgets: Map[String, Long], defaultBudget: Long,
                   stateDir: String): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import spark.implicits._

    val spent: Map[String, Long] = StreamingDedup.readBatchedOr(spark,
        s"$stateDir/ledger", belowBatch = Some(batchId),
        empty = Seq.empty[(String, Long)].toDF("source", "admitted_tokens"))
      .groupBy("source").agg(sum("admitted_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // remaining budget per source seen in THIS batch (unseen sources keep
    // their full budget; a source is only charged for what it admitted)
    val batchSources = batch.select(col(sourceCol)).distinct()
      .collect().map(_.getString(0))
    val remaining: Map[String, Long] = batchSources.map { s =>
      val full = budgets.getOrElse(s, defaultBudget)
      s -> math.max(0L, full - spent.getOrElse(s, 0L))
    }.toMap

    val admitted = Sharding.fillTokenBudget(batch, sourceCol, scoreCol, tokensCol,
        budgets = remaining, defaultBudget = 0L)
      .localCheckpoint() // ledger append + caller sink share one computation

    admitted.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokensCol)).as("admitted_tokens"))
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$stateDir/ledger")
    admitted
  }

  /** Convenience wiring: admitted rows land batch-partitioned in `outDir`
    * (idempotent on replay, like the ledger). */
  def attach(docs: DataFrame, sourceCol: String, scoreCol: String, tokensCol: String,
             budgets: Map[String, Long], defaultBudget: Long,
             stateDir: String, outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, sourceCol, scoreCol, tokensCol,
          budgets, defaultBudget, stateDir)
          .withColumn("batch", lit(batchId))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
