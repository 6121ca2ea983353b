package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The stored-prefix-index payoff, measured: an arriving batch's pairs
  * via (a) one-shot prefixFilterPairs on corpus ∪ batch re-run from
  * scratch vs (b) incrementalPrefixPairs against a prebuilt index —
  * the steady-state cost a continuous-arrival dedup pays per batch.
  * Batch = every 20th doc; corpus = the rest. Args: sfDir. */
object PrefixIncrementalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def reps(dd: org.apache.spark.sql.DataFrame) = dd
      .select(col("doc_id"),
        array_sort(array_distinct(graft.operators.TextOps.tokens(col("text")))).as("ts"))
      .groupBy(md5(concat_ws(" ", col("ts")).cast("binary")).as("_fp"))
      .agg(min(col("doc_id")).as("id"), first(col("ts")).as("ts"))
      .select("id", "ts")
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = reps(docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)).localCheckpoint()
    val batch = reps(docs.filter(pmod(col("doc_id"), lit(20)) === 0)).localCheckpoint()

    def timed(label: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val v = body
      println(f"[ppidx-probe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  pairs $v%d")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-ppidx-probe").toString
    val tb = System.nanoTime()
    graft.operators.Dedup.prefixIndexBuild(corpus, "id", "ts", 900, dir)
    println(f"[ppidx-probe] index build (once)       ${(System.nanoTime() - tb) / 1e9}%7.2f s")
    timed("one-shot corpus ∪ batch") {
      graft.operators.Dedup.prefixFilterPairs(
        corpus.unionByName(batch), "id", "ts", 900).count()
    }
    timed("incremental probe") {
      graft.operators.Dedup.incrementalPrefixPairs(batch, "id", "ts", dir).count()
    }
    spark.stop()
  }
}
