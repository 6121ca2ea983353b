package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CorpusProbe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val sc2 = graft.streaming.StreamingCorpus
    val docs = graft.Tables.documents(spark, d).filter(col("doc_id") < 400)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"), col("source"))
    val ws = graft.operators.TextOps.tokens(col("text"))
    val (nT, _, sr) = graft.operators.TextOps.qualityMetrics(ws, sc2.DefaultStops)
    val gatePassing = docs.filter(
      graft.operators.TextOps.langIdEn(ws, sc2.DefaultLangMarkers, 2) === "en" && nT >= 5 && sr <= 0.5)
    val refDir = java.nio.file.Files.createTempDirectory("p-ref").toString
    t("ref moments") {
      graft.operators.Pca.saveMoments(spark,
        graft.operators.Pca.moments(sc2.qualityFeatures(gatePassing, "doc_id", "text", sc2.DefaultStops), "features"), refDir)
    }
    val checks = Seq(graft.operators.Validation.Expect("text_nonempty", length(col("text")) > 0),
      graft.operators.Validation.Unique("doc_id_unique", col("doc_id")))
    val b0 = docs.filter(col("doc_id") % 2 === 0).localCheckpoint()
    for (rep <- 1 to 2) {
    val st = java.nio.file.Files.createTempDirectory(s"p-st$rep").toString
    val corp = java.nio.file.Files.createTempDirectory(s"p-c$rep").toString
    t(s"batch0 total rep$rep") {
      val vrep = t("  validate") { graft.streaming.StreamingValidation.processBatch(b0, 0L, "c", checks, s"$st/validate").collect() }
      val gated = b0.filter(graft.operators.TextOps.langIdEn(ws, sc2.DefaultLangMarkers, 2) === "en" && nT >= 5 && sr <= 0.5).withColumn("_n_tokens", nT)
      val unique = t("  dedup") { graft.streaming.StreamingDedup.processBatch(gated, 0L, "doc_id", "text", s"$st/dedup") }
      t("  dedup count") { unique.count() }
      val adm = t("  budget") { graft.streaming.StreamingBudget.processBatch(unique.withColumn("_score", col("_n_tokens")), 0L, "source", "_score", "_n_tokens", Map("src0"->300L,"src1"->300L), 100000000L, s"$st/budget") }
      t("  adm agg") { adm.agg(count(lit(1)), sum("_n_tokens")).collect() }
      t("  drift") { graft.streaming.StreamingDrift.processBatch(sc2.qualityFeatures(adm, "doc_id", "text", sc2.DefaultStops), 0L, "doc_id", "features", refDir, s"$st/drift").collect() }
      t("  corpus write") { adm.select(col("doc_id"), col("text"), col("source"), col("_n_tokens").as("n_tokens")).withColumn("batch", lit(0L)).write.mode("overwrite").partitionBy("batch").parquet(corp) }
    }
    }
    spark.stop()
  }
}
