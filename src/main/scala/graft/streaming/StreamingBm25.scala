package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuously-maintained BM25 index — the streaming face of the
  * posting-list ladder ([[graft.operators.TextOps.bm25PostingsBuild]]):
  * each micro-batch of documents lands its posting rows and stats
  * WITHOUT touching earlier batches' data, and the serve path reads the
  * union.
  *
  * Replay doctrine (the [[StreamingDedup]] shape): a plain `append` of
  * postings would double-count a replayed micro-batch, so everything is
  * `batch=`-partitioned with dynamic partition overwrite — a replayed
  * batch overwrites exactly its own partitions and the index state is
  * bit-identical (spec-pinned). Stats are per-batch partial sums
  * (exact longs); the serve path folds them with one driver-side
  * aggregate — the associativity that makes the batch-side
  * [[graft.operators.TextOps.bm25IndexUpdate]] exact makes the
  * per-batch layout exact too.
  *
  * Layout: `postings/batch=B/bucket=K/` — partitioned by batch FIRST so
  * replay overwrite is per-batch, by term-hash bucket SECOND so the
  * serve read still prunes to the queried terms' buckets inside every
  * batch directory. `stats/batch=B/` one partial row per batch. */
object StreamingBm25 {

  /** One micro-batch step: lands `postings/batch=<id>` + `stats/batch=<id>`,
    * returns the one-row ingest report (batch_id, n_docs, n_postings). */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String, textCol: String,
                   indexDir: String, nBuckets: Int = 64): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import spark.implicits._

    val posts = batch.select(col(idCol).as("doc"), TextOps.tokens(col(textCol)).as("ws"))
      .select(col("doc"), size(col("ws")).cast("long").as("len"),
        explode(col("ws")).as("term"))
      .groupBy("doc", "len", "term").agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
      .localCheckpoint()
    posts.withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch", "bucket")
      .parquet(s"$indexDir/postings")

    val toks = batch.select(TextOps.tokens(col(textCol)).as("ws"))
    toks.agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(size(col("ws"))), lit(0L)).cast("long").as("total_len"))
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$indexDir/stats")

    Seq((batchId, batch.count(), posts.count()))
      .toDF("batch_id", "n_docs", "n_postings")
  }

  /** Serve top-k over everything ingested so far: fold the per-batch
    * stat partials (exact longs), derive per-term df from the pruned
    * postings themselves (df = distinct docs carrying the term — one
    * count over the already-pruned read, no stored vocabulary needed in
    * the streaming layout), then the shared literal-stats scoring. */
  def topK(spark: SparkSession, indexDir: String, terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75, nBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val st = spark.read.parquet(s"$indexDir/stats")
      .agg(sum("n_docs").cast("long").as("n"), sum("total_len").cast("long").as("t"))
      .collect().head
    val (nDocs, totalLen) = (st.getLong(0), st.getLong(1))
    val n = nDocs.toDouble
    val avgl = totalLen.toDouble / nDocs.toDouble
    val buckets = terms.map(t =>
      spark.range(1).select(pmod(hash(lit(t)), lit(nBuckets)).as("b"))
        .collect().head.getInt(0)).distinct
    val posts = spark.read.parquet(s"$indexDir/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .localCheckpoint() // consumed twice: df derivation + scoring
    val dfMap = posts.groupBy("term").agg(count_distinct(col("doc")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val aggCols = first(col("len")).as("_len") +:
      terms.zipWithIndex.map { case (t, i) =>
        coalesce(sum(when(col("term") === t, col("tf"))), lit(0L))
          .cast("double").as(s"_tf$i")
      }
    val pivoted = posts.groupBy("doc").agg(aggCols.head, aggCols.tail: _*)
    val score = terms.zipWithIndex.map { case (t, i) =>
      val df = dfMap.getOrElse(t, 0L).toDouble
      val idf = (n - df + 0.5) / (df + 0.5)
      val tf = col(s"_tf$i")
      lit(idf) * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_len").cast("double") / lit(avgl)))
    }.reduce(_ + _)
    pivoted.select(col("doc"), col("_len").cast("long").as("n_tokens"),
        round(score, 4).as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), asc("doc"))
      .limit(k)
  }

  /** Retention vacuum: drop every batch partition below `keepFromBatch`
    * — the news-index shape (serve the last N days, reclaim the rest).
    * Deleting WHOLE batch partitions is what the batch-first layout
    * buys: retention is a directory unlink, not a rewrite, and the
    * stats fold self-heals because the dropped batches' partials
    * vanish with their partitions (serve recomputes n/avgl from what
    * remains — no tombstones, no compensating records). A batch id is
    * monotone in arrival order, so "keep the last k batches" is a
    * driver-side max(batch)−k. */
  def vacuum(spark: SparkSession, indexDir: String, keepFromBatch: Long): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    for (sub <- Seq("postings", "stats")) {
      val root = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
      val fs = root.getFileSystem(conf)
      if (fs.exists(root)) {
        fs.listStatus(root).foreach { st =>
          val name = st.getPath.getName
          if (name.startsWith("batch=") &&
              name.stripPrefix("batch=").toLongOption.exists(_ < keepFromBatch))
            fs.delete(st.getPath, true)
        }
      }
    }
  }

  /** Convenience wiring: maintain the index from a document stream. */
  def attach(docs: DataFrame, idCol: String, textCol: String,
             indexDir: String, checkpointDir: String,
             nBuckets: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, nBuckets); ()
      }
      .start()
}
