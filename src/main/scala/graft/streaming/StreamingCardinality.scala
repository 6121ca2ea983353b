package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Running distinct-count over a stream — the streaming face of
  * [[Sketches]]' HyperLogLog: every micro-batch folds its keys into the
  * 256-register frame and max-merges into a durable register table, so
  * "how many unique documents have we EVER ingested" is answerable at
  * any moment from 256 rows, never by re-scanning the corpus.
  *
  * Why this beats the dedup index for the counting question: the
  * [[StreamingDedup]] index grows with the corpus (it must — it answers
  * MEMBERSHIP); the register table is O(m) forever and answers
  * CARDINALITY within ~6.5% (1.04/√256). A pipeline wants both: dedup
  * to act, cardinality to monitor.
  *
  * Replay safety comes free from the algebra: registers are a max-merge
  * monotone lattice, so a replayed batch max-merges values the table
  * already absorbed — a no-op. No batch partitioning, no tombstones
  * (spec-pinned). The merged frame is collected (256 rows) BEFORE the
  * overwrite so the read never races its own rewrite (the torn-read
  * discipline of [[StreamingEnrich]]).
  */
object StreamingCardinality {

  private def readRegistersOr(spark: org.apache.spark.sql.SparkSession,
                              path: String, empty: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
      spark.read.parquet(path)
    else empty
  }

  /** One micro-batch step: max-merge the batch's registers into
    * `indexDir/registers` and return the one-row report
    * (batch_id, n_rows, n_zero, hll_estimate) over the MERGED state. */
  def processBatch(batch: DataFrame, batchId: Long, keyCol: String,
                   indexDir: String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val keyed = batch.select(col(keyCol)).where(col(keyCol).isNotNull)
    val batchRegs = Sketches.hllRegisters(keyed, keyCol)
    val prior = readRegistersOr(spark, s"$indexDir/registers",
      spark.range(Sketches.HllM).select(col("id").cast("int").as("bucket"),
        lit(0).as("register")))
    // 256 rows — drain to the driver before overwriting what we read
    val merged = Sketches.hllMerge(batchRegs, prior)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    merged.toDF("bucket", "register")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/registers")

    val nRows = keyed.count()
    val est = Sketches.hllEstimate(merged.toDF("bucket", "register")).collect().head
    Seq((batchId, nRows, est.getAs[Long]("n_zero"), est.getAs[Double]("hll_estimate")))
      .toDF("batch_id", "n_rows", "n_zero", "hll_estimate")
  }

  /** Convenience wiring: one cumulative-cardinality report row per
    * micro-batch appended to `outDir` (batch-partitioned, idempotent on
    * replay). */
  def attach(docs: DataFrame, keyCol: String, indexDir: String,
             outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        processBatch(batch, batchId, keyCol, indexDir)
          .withColumn("batch", col("batch_id"))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
