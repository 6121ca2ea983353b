package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attributes `engine_stream_corpus`'s cost STAGE BY STAGE — the bench
  * line has been the suite's slowest three rounds running (≈12 s at
  * sf0.1 for 2 micro-batches) and the open question is which stages
  * are per-batch FIXED overhead (composition cost: ledger reads,
  * checkpoint plumbing, plan compilation) vs VOLUME-scaled (would grow
  * at 100 TB). The probe re-runs the capstone's exact stage sequence
  * (same sub-operator calls as [[graft.streaming.StreamingCorpus
  * .processBatch]]: validation ledger → quality/lang funnel agg →
  * cross-batch LSH dedup → per-source budget → drift monitor → corpus
  * append) on the capstone's own fixture slice at replication ×1 and
  * ×N, timing each stage to its materialization barrier. A stage whose
  * ×N time ≈ ×1 time is fixed overhead; one that scales ~linearly is
  * volume-bound.
  *
  * Usage: runMain graft.tools.CorpusStageProbe [sfDir] [replication]
  */
object CorpusStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val repN = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sc = graft.streaming.StreamingCorpus

    def run(rep: Int): Seq[(String, Long, Double)] = {
      val marks = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()
      def time[T](stage: String, batch: Long)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        marks += ((stage, batch, (System.nanoTime() - t0) / 1e9))
        r
      }
      val base = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 400)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
          col("source"))
      // replicate with disjoint ids AND texts (a salted prefix), so the
      // dedup stage's candidate volume scales with rep instead of
      // collapsing every replica into one band bucket
      val docs = (0 until rep).map { r =>
        base.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
          concat(lit(s"r$r "), col("text")).as("text"), col("source"))
      }.reduce(_ unionByName _).localCheckpoint()

      val ws = graft.operators.TextOps.tokens(col("text"))
      val (nT, _, sr) = graft.operators.TextOps.qualityMetrics(ws, sc.DefaultStops)
      val gatePassing = docs.filter(
        graft.operators.TextOps.langIdEn(ws, sc.DefaultLangMarkers, 2) === "en" &&
          nT >= 5 && sr <= 0.5)
      val refDir = java.nio.file.Files.createTempDirectory("graft-csp-ref").toString
      graft.operators.Pca.saveMoments(spark,
        graft.operators.Pca.moments(
          sc.qualityFeatures(gatePassing, "doc_id", "text", sc.DefaultStops),
          "features"), refDir)
      val stateDir = java.nio.file.Files.createTempDirectory("graft-csp-st").toString
      val corpusDir = java.nio.file.Files.createTempDirectory("graft-csp-c").toString
      val checks = Seq(
        graft.operators.Validation.Expect("text_nonempty", length(col("text")) > 0),
        graft.operators.Validation.Unique("doc_id_unique", col("doc_id")))
      val budgets = Map("src0" -> 300L * rep, "src1" -> 300L * rep)

      // batch 1 mirrors the capstone: copies + novel src0 + poisoned
      val copies = gatePassing.orderBy(col("doc_id")).limit(10 * rep)
        .select("text", "source").collect().zipWithIndex
        .map { case (r, i) => (300000000L + i, r.getString(0), r.getString(1)) }
      val novelSrc0 = (0 until 5 * rep).map { i =>
        (200000000L + i.toLong, "the size of the data and the run " +
          (0 until 392).map(j => s"n${i}_$j").mkString(" "), "src0") }
      val poisoned = (0 until 20 * rep).map { i =>
        (100000000L + i.toLong, "the data of the run " +
          (0 until 300).map(j => s"w${i}_$j").mkString(" "), "poison") }
      val batch1 = spark.sparkContext
        .parallelize(copies.toSeq ++ novelSrc0 ++ poisoned, 32)
        .toDF("doc_id", "text", "source").localCheckpoint()

      // one batch = the capstone's stage sequence, each stage timed to
      // its own materialization barrier (the counts/writes processBatch
      // itself performs — nothing extra is forced)
      def oneBatch(batch: DataFrame, batchId: Long): Unit = {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val vrep = time("1_validate", batchId) {
          val v = graft.streaming.StreamingValidation.processBatch(
            batch, batchId, "corpus_arrivals", checks, s"$stateDir/validate")
          v.agg(min(col("pass"))).head
          v
        }
        val validFlag = checks.collect {
          case graft.operators.Validation.Expect(_, p) => coalesce(p, lit(false))
        }.reduce(_ && _)
        val gateFlag = coalesce(
          graft.operators.TextOps.langIdEn(ws, sc.DefaultLangMarkers, 2) === "en" &&
            nT >= 5 && sr <= 0.5, lit(false))
        time("2_gate_funnel", batchId) {
          batch.select(validFlag.as("v"), gateFlag.as("g"))
            .agg(count(lit(1)), sum(when(col("v"), 1L).otherwise(0L)),
              sum(when(col("v") && col("g"), 1L).otherwise(0L))).head
        }
        val gated = batch.filter(validFlag && gateFlag).withColumn("_n_tokens", nT)
        val unique = time("3_dedup", batchId) {
          val u = graft.streaming.StreamingDedup.processBatch(
            gated, batchId, "doc_id", "text", s"$stateDir/dedup", 3, 8, 4, 0.8)
          u.count()
          u
        }
        val admitted = time("4_budget", batchId) {
          val a = graft.streaming.StreamingBudget.processBatch(
            unique.withColumn("_score", col("_n_tokens")),
            batchId, "source", "_score", "_n_tokens",
            budgets, 100000000L, s"$stateDir/budget")
          a.agg(count(lit(1)), coalesce(sum("_n_tokens"), lit(0L))).head
          a
        }
        time("5_drift", batchId) {
          graft.streaming.StreamingDrift.processBatch(
            sc.qualityFeatures(admitted, "doc_id", "text", sc.DefaultStops),
            batchId, "doc_id", "features", refDir, s"$stateDir/drift",
            zThreshold = 8.0).head
        }
        time("6_corpus_append", batchId) {
          admitted.select(col("doc_id"), col("text"), col("source"),
              col("_n_tokens").as("n_tokens"))
            .withColumn("batch", lit(batchId))
            .write.mode("overwrite").partitionBy("batch").parquet(corpusDir)
        }
        vrep.unpersist(false)
      }
      oneBatch(docs, 0L)
      oneBatch(batch1, 1L)
      docs.unpersist(false); batch1.unpersist(false)
      marks.toSeq
    }

    // warm the JVM/codegen once at x1, then measure both scales
    run(1)
    val m1 = run(1)
    val mN = run(repN)
    val stages = m1.map(_._1).distinct.sorted
    println(f"${"stage"}%-18s ${"x1 b0"}%8s ${"x1 b1"}%8s ${s"x$repN b0"}%8s ${s"x$repN b1"}%8s  ratio(b0)")
    stages.foreach { s =>
      def at(ms: Seq[(String, Long, Double)], b: Long) =
        ms.collectFirst { case (`s`, `b`, t) => t }.getOrElse(0.0)
      val r = if (at(m1, 0) > 0) at(mN, 0) / at(m1, 0) else 0.0
      println(f"$s%-18s ${at(m1, 0)}%8.2f ${at(m1, 1)}%8.2f ${at(mN, 0)}%8.2f ${at(mN, 1)}%8.2f  $r%6.2f")
    }
    val t1 = m1.map(_._3).sum; val tN = mN.map(_._3).sum
    println(f"TOTAL x1=$t1%.2f s  x$repN=$tN%.2f s  ratio=${tN / t1}%.2f")
    spark.stop()
  }
}
