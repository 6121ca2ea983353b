package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Measures what the Bloom prune in TextOps.contaminationBloomPruned
  * actually removes on the driver corpus: corpus gram volume, true
  * benchmark hits, and Bloom survivors at several fpp settings — the
  * survivor count is the shuffle volume the confirm join pays, so
  * (survivors − hits) / corpus-grams is the effective false-positive
  * tax. Backs the PLANS.md table. */
object BloomDecontamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val benchShingles = bench
      .select(explode(array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))).as("g"))
      .distinct().cache()
    val nBench = benchShingles.count()
    val corpusGrams = corpus
      .select(col("doc_id"), explode(array_distinct(
        TextOps.shingles(TextOps.tokens(col("text")), 3))).as("g")).cache()
    val nCorpus = corpusGrams.count()
    val nHits = corpusGrams.join(benchShingles, Seq("g")).count()
    println(f"bench grams: $nBench%,d  corpus (doc,gram) rows: $nCorpus%,d  true hits: $nHits%,d")
    for (fpp <- Seq(0.1, 0.01, 0.001)) {
      val bloom = benchShingles.stat.bloomFilter("g", math.max(nBench, 1), fpp)
      val bc = spark.sparkContext.broadcast(bloom)
      val mightContain = udf((g: String) => g != null && bc.value.mightContain(g))
      val survivors = corpusGrams.filter(mightContain(col("g"))).count()
      val fpTax = (survivors - nHits).toDouble / math.max(nCorpus - nHits, 1)
      println(f"fpp=$fpp%-6s bits=${bloom.bitSize()}%,d survivors=$survivors%,d " +
        f"(hits + ${survivors - nHits}%,d fp, measured fp rate ${fpTax * 100}%.3f%%) " +
        f"shuffle volume ${survivors * 100.0 / nCorpus}%.1f%% of unpruned")
      bc.destroy()
    }
    spark.stop()
  }
}
