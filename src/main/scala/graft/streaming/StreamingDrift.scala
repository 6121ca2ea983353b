package graft.streaming

import graft.operators.Pca
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-distribution drift monitoring over a stream — the streaming
  * face of [[Pca]]: every micro-batch is projected onto the STORED
  * reference component (the deploy artifact of `Pca.saveMoments`) and
  * reported as a z-score of its mean against the reference spread — the
  * alarm that catches an encoder version change, a corrupted source, or
  * a topic shift the moment it arrives, not after the next full retrain.
  *
  * The batch also banks its own exact-long moments into a
  * batch-partitioned ledger ([[StreamingValidation]] state doctrine), so
  * every report can ALSO solve on reference+arrived moments — incremental
  * PCA live in the stream: `axis_cos` says how far the dominant axis has
  * rotated since the reference was trained, with no corpus re-scan and
  * nothing approximate (moments are additive longs; replaying a batch
  * overwrites its own partition and the report is bit-identical).
  *
  * Determinism: projections are quantized before summation (the [[Pca]]
  * doctrine), so batch mean/variance are exact under any partitioning. */
object StreamingDrift {

  /** One micro-batch step → one report row: (batch_id, n_rows, mean_pc1,
    * var_pc1, z_mean, axis_cos, eigval_ref, eigval_new, alarm). `alarm`
    * is |z| > zThreshold — z the batch-mean shift in units of the
    * reference standard error √(λ_ref/n). */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String, vecCol: String,
                   momentsDir: String, stateDir: String,
                   iters: Int = 8, zThreshold: Double = 4.0): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val ref = Pca.loadMoments(spark, momentsDir)
    val refModel = Pca.topComponentsFromMoments(ref._1, ref._2, ref._3, 1, iters)
    val (vRef, lamRef) = refModel.comps.head

    // bank this batch's exact moments (replay overwrites its partition)
    val bm = Pca.moments(batch, vecCol)
    val (n, s, q) = bm
    val d = s.length
    val rows = Seq((0, 0, 0, n)) ++
      s.indices.map(i => (1, i, 0, s(i))) ++
      (for (i <- s.indices; j <- s.indices) yield (2, i, j, q(i)(j)))
    rows.toDF("kind", "i", "j", "v").withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$stateDir/moments")

    // cumulative arrived moments: strictly-prior partitions + this batch
    val prior = StreamingDedup.readBatchedOr(spark, s"$stateDir/moments",
        belowBatch = Some(batchId),
        empty = rows.toDF("kind", "i", "j", "v").limit(0).withColumn("batch", lit(-1L)))
      .groupBy("kind", "i", "j").agg(sum("v").as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    val cum = Pca.mergeMoments(bm,
      (prior.getOrElse((0, 0, 0), 0L),
        Array.tabulate(d)(i => prior.getOrElse((1, i, 0), 0L)),
        Array.tabulate(d, d)((i, j) => prior.getOrElse((2, i, j), 0L))))
    val merged = Pca.mergeMoments(ref, cum)
    val newModel = Pca.topComponentsFromMoments(merged._1, merged._2, merged._3, 1, iters)
    val (vNew, lamNew) = newModel.comps.head
    val axisCos = math.abs(vRef.zip(vNew).map { case (a, b) => a * b }.sum)

    // batch projection stats on the REFERENCE axis, exact-long sums
    val p = Pca.project(batch, idCol, vecCol,
      Pca.Model(refModel.mean, vRef, lamRef))
    val st = p.agg(
      count(lit(1)).as("n"),
      coalesce(sum(round(col("pc1") * Pca.Scale).cast("long")), lit(0L)).as("sp"),
      coalesce(sum(round(col("pc1") * col("pc1") * Pca.Scale).cast("long")), lit(0L)).as("sp2"))
      .head()
    val nB = st.getLong(0)
    val meanP = if (nB == 0) 0.0 else (st.getLong(1).toDouble / Pca.Scale) / nB
    val varP = if (nB == 0) 0.0
      else (st.getLong(2).toDouble / Pca.Scale) / nB - meanP * meanP
    // reference projections are mean-centered (mean 0 by construction),
    // so the batch-mean z-score is mean / sqrt(lam_ref / n)
    val z = if (nB == 0 || lamRef <= 0) 0.0 else meanP / math.sqrt(lamRef / nB)

    Seq((batchId, nB, meanP, varP, z, axisCos, lamRef, lamNew,
        math.abs(z) > zThreshold))
      .toDF("batch_id", "n_rows", "mean_pc1", "var_pc1", "z_mean",
        "axis_cos", "eigval_ref", "eigval_new", "alarm")
  }

  /** Convenience wiring ([[StreamingValidation.attach]] shape): one drift
    * report row per micro-batch, batch-partitioned under `outDir`
    * (idempotent on replay — the report recomputes bit-identically). */
  def attach(rows: DataFrame, idCol: String, vecCol: String,
             momentsDir: String, stateDir: String, outDir: String,
             checkpointDir: String, iters: Int = 8,
             zThreshold: Double = 4.0): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, vecCol, momentsDir, stateDir,
            iters, zThreshold)
          .withColumn("batch", col("batch_id"))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
