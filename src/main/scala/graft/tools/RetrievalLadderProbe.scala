package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.TextOps

/** Measures the retrieval ladder at sf0.1: fresh ranker (2 corpus
  * scans) vs stored-stats serve (1 scan) vs posting-list serve (no
  * corpus scan, bucket-pruned read). Build costs are reported once —
  * they amortize over every query the index serves. Warm timings
  * (3 iterations each after a warmup) — backs the PLANS.md table. */
object RetrievalLadderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val terms = Seq("spark", "window", "merge")
    val dir = java.nio.file.Files.createTempDirectory("graft-ladder").toString

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def warm3(label: String)(f: => Long): Unit = {
      f // warmup / codegen
      val ts = (1 to 3).map(_ => time(f))
      println(f"$label%-24s ${ts.min}%.3f s (min of 3; ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }

    val tBuildStats = time(TextOps.bm25IndexBuild(dir, docs, "text"))
    val tBuildPosts = time(TextOps.bm25PostingsBuild(dir, docs, "doc_id", "text"))
    println(f"build: stats $tBuildStats%.3f s, postings $tBuildPosts%.3f s (one-time, amortized)")

    warm3("fresh (2 scans)") {
      TextOps.bm25TopK(docs, "doc_id", "text", terms, k = 15).count()
    }
    warm3("stored stats (1 scan)") {
      TextOps.bm25TopKStored(spark, dir, docs, "doc_id", "text", terms, k = 15).count()
    }
    warm3("postings (0 scans)") {
      TextOps.bm25TopKPostings(spark, dir, terms, k = 15).count()
    }
    spark.stop()
  }
}
