package graft.streaming

import graft.operators.{TextOps, Validation}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming corpus BUILD — the arrival-mode twin of the batch
  * `pipeline_corpus_build` composition: ONE attached pipeline takes each
  * arriving micro-batch of raw documents through
  *
  *   validate → quality/language gates → cross-batch near-dedup →
  *   per-source token budgets → drift monitor → durable corpus append
  *
  * re-using the four streaming verticals it composes —
  * [[StreamingValidation]] (expectation ledger + hard row gate),
  * [[StreamingDedup]] (stored band index, so a duplicate of ANY earlier
  * batch's admitted doc is rejected, not just within-batch),
  * [[StreamingBudget]] (durable per-source token ledger: admission stops
  * the moment a source's budget fills, across batches), and
  * [[StreamingDrift]] (quality-feature moments against a stored
  * reference — the alarm that catches a poisoned source as it arrives).
  *
  * Replay discipline: every ledger underneath is `batch=`-partitioned
  * with overwrite-own-partition writes and strictly-below-batch reads
  * (each vertical's own spec-pinned contract), and the corpus append
  * follows the same shape — so replaying a micro-batch re-derives
  * bit-identical admissions, ledgers, and summary (spec-pinned here
  * end-to-end across the composition).
  *
  * Scale shape: the three gate stages are row-level expressions fused
  * into the batch scan (the one aggregate computing their funnel counts
  * rides the same scan); dedup is the banded index path (per-batch cost
  * independent of corpus size); budgets and drift are ledger-sized. The
  * only corpus-sized artifact is the admitted corpus itself.
  */
object StreamingCorpus {

  /** Per-doc quality-feature vector (float[3]: n_tokens, n_chars,
    * stopword ratio) — the drift monitor's subject, exposed so the
    * reference moments ([[graft.operators.Pca.saveMoments]]) are trained
    * on exactly the vectors the stream will project. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String,
                      stops: Seq[String]): DataFrame = {
    val ws = TextOps.tokens(col(textCol))
    val (n, _, sr) = TextOps.qualityMetrics(ws, stops)
    df.select(col(idCol), array(
      n.cast("float"),
      length(coalesce(col(textCol), lit(""))).cast("float"),
      coalesce(sr, lit(0.0)).cast("float")).as("features"))
  }

  val DefaultStops: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val DefaultLangMarkers: Seq[String] = Seq("the", "a", "of", "and")

  /** One micro-batch step → one summary row; side effects: the five
    * ledgers under `stateDir` and the admitted corpus partition under
    * `corpusDir` (all idempotent on replay).
    *
    * Summary columns: `(batch_id, n_arrived, n_valid, n_gated,
    * n_unique, n_admitted, admitted_tokens, checks_pass, z_mean,
    * axis_cos, drift_alarm)` — the funnel a corpus-build operator room
    * watches: how many arrived, survived validation, survived the
    * quality/language gates, were novel vs everything ever admitted,
    * and fit the remaining budgets; then whether the admitted slice's
    * quality-feature distribution still matches the reference. */
  def processBatch(batch: DataFrame, batchId: Long,
                   idCol: String, textCol: String, sourceCol: String,
                   checks: Seq[Validation.Check],
                   budgets: Map[String, Long], defaultBudget: Long,
                   momentsDir: String, stateDir: String, corpusDir: String,
                   stops: Seq[String] = DefaultStops,
                   langMarkers: Seq[String] = DefaultLangMarkers,
                   minLangHits: Int = 2, minTokens: Long = 5,
                   maxStopRatio: Double = 0.5,
                   shingleN: Int = 3, k: Int = 8, bands: Int = 4,
                   minJaccard: Double = 0.8, zThreshold: Double = 4.0): DataFrame = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import spark.implicits._

    // ── 1. validation: durable expectation ledger + hard row gate.
    //    Expect predicates gate rows (null ≡ violation ≡ rejected, the
    //    Validation doctrine); Unique checks are suite-level — reported
    //    in the ledger and the summary's checks_pass, not a row filter.
    val vrep = StreamingValidation.processBatch(
      batch, batchId, "corpus_arrivals", checks, s"$stateDir/validate")
    val checksPass = vrep.agg(min(col("pass"))).head.getBoolean(0)
    val validFlag: Column = checks.collect {
      case Validation.Expect(_, p) => coalesce(p, lit(false))
    }.reduceOption(_ && _).getOrElse(lit(true))

    // ── 2. quality/language gates — row-level expressions, shared by the
    //    gating filter and the funnel-count aggregate (one scan each).
    val ws = TextOps.tokens(col(textCol))
    val (nToks, _, stopRatio) = TextOps.qualityMetrics(ws, stops)
    val gateFlag: Column = coalesce(
      TextOps.langIdEn(ws, langMarkers, minLangHits) === "en" &&
        nToks >= minTokens && stopRatio <= maxStopRatio, lit(false))

    val funnel = batch.select(validFlag.as("v"), gateFlag.as("g"))
      .agg(count(lit(1)).as("n_arrived"),
        sum(when(col("v"), 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("v") && col("g"), 1L).otherwise(0L)).as("n_gated"))
      .head
    val (nArrived, nValid, nGated) =
      (funnel.getLong(0), funnel.getLong(1), funnel.getLong(2))

    val gated = batch.filter(validFlag && gateFlag)
      .withColumn("_n_tokens", nToks)

    // ── 3. cross-batch near-dedup against the stored band index: only
    //    docs novel vs every earlier batch's gate-surviving docs pass.
    //    NOTE the semantic: the index records everything that SURVIVED
    //    dedup (StreamingDedup appends inside), including docs the
    //    budget then rejects — so a budget-rejected doc arriving again
    //    is still a duplicate and is not re-admitted. That is the
    //    content-identity contract a corpus wants (budget is a quota on
    //    novel content, not a retry queue).
    val unique = StreamingDedup.processBatch(
      gated, batchId, idCol, textCol, s"$stateDir/dedup",
      shingleN, k, bands, minJaccard)
    val nUnique = unique.count()

    // ── 4. per-source token budgets: longest-first admission (score =
    //    n_tokens; any discrete quality score drops in) against the
    //    remaining-budget ledger.
    val admitted = StreamingBudget.processBatch(
      unique.withColumn("_score", col("_n_tokens")),
      batchId, sourceCol, "_score", "_n_tokens",
      budgets, defaultBudget, s"$stateDir/budget")
    val admStats = admitted.agg(count(lit(1)).as("n"),
      coalesce(sum("_n_tokens"), lit(0L)).as("t")).head
    val (nAdmitted, admittedTokens) = (admStats.getLong(0), admStats.getLong(1))

    // ── 5. drift monitor on the ADMITTED slice's quality features vs
    //    the stored reference moments (what you keep is what trains).
    //    A batch that admitted nothing has no distribution to test:
    //    report the neutral (z=0, axis_cos=1, no alarm) rather than
    //    banking empty moments (Pca.moments requires rows to derive
    //    the dimensionality, and an all-zero ledger row adds nothing).
    val (zMean, axisCos, alarm) =
      if (nAdmitted == 0L) (0.0, 1.0, false)
      else {
        val drift = StreamingDrift.processBatch(
          qualityFeatures(admitted, idCol, textCol, stops), batchId,
          idCol, "features", momentsDir, s"$stateDir/drift",
          zThreshold = zThreshold).head
        (drift.getAs[Double]("z_mean"), drift.getAs[Double]("axis_cos"),
          drift.getAs[Boolean]("alarm"))
      }

    // ── 6. the corpus itself: admitted rows, batch-partitioned (replay
    //    overwrites its own partition — same contract as the ledgers).
    admitted.select(col(idCol), col(textCol), col(sourceCol),
        col("_n_tokens").as("n_tokens"))
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite").partitionBy("batch").parquet(corpusDir)

    Seq((batchId, nArrived, nValid, nGated, nUnique, nAdmitted,
        admittedTokens, checksPass, zMean, axisCos, alarm))
      .toDF("batch_id", "n_arrived", "n_valid", "n_gated", "n_unique",
        "n_admitted", "admitted_tokens", "checks_pass", "z_mean",
        "axis_cos", "drift_alarm")
  }

  /** The attached pipeline: every micro-batch runs the full composition;
    * summary rows land batch-partitioned under `outDir` (idempotent on
    * replay, like everything beneath). */
  def attach(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
             checks: Seq[Validation.Check],
             budgets: Map[String, Long], defaultBudget: Long,
             momentsDir: String, stateDir: String, corpusDir: String,
             outDir: String, checkpointDir: String,
             stops: Seq[String] = DefaultStops,
             langMarkers: Seq[String] = DefaultLangMarkers,
             minLangHits: Int = 2, minTokens: Long = 5,
             maxStopRatio: Double = 0.5,
             shingleN: Int = 3, k: Int = 8, bands: Int = 4,
             minJaccard: Double = 0.8, zThreshold: Double = 4.0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, sourceCol, checks,
            budgets, defaultBudget, momentsDir, stateDir, corpusDir,
            stops, langMarkers, minLangHits, minTokens, maxStopRatio,
            shingleN, k, bands, minJaccard, zThreshold)
          .withColumn("batch", col("batch_id"))
          .write.mode("overwrite").partitionBy("batch").parquet(outDir)
      }
      .start()
}
