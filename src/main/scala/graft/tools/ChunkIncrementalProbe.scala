package graft.tools

import graft.Tables
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the chunk-granularity incremental-dedup claim: checking one
  * new-doc batch against a STORED chunk band index should stay flat as
  * the corpus grows, while re-banding the whole corpus grows linearly.
  * Corpus scaling is synthetic-but-honest: the sf0.1 documents table is
  * unioned k× with disjoint id offsets, so gram content (and therefore
  * band-bucket geometry) is realistic at every size. The batch is the
  * same 500 docs throughout.
  *
  * Run: sbt "runMain graft.tools.ChunkIncrementalProbe"; the table goes
  * to PLANS.md.
  */
object ChunkIncrementalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.1")

    def chunksOf(df: DataFrame) =
      TextOps.chunkTokens(df, "doc_id", "text", chunkSize = 32, overlap = 8)
        .filter(col("n_tokens") >= 3)
        .select((col("doc") * 1000 + col("chunk_idx")).as("chunk_id"),
          col("chunk_text").as("text"))

    val base = Tables.documents(spark, sf).select("doc_id", "text")
    val batch = chunksOf(base.filter(col("doc_id") < 500)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
      .localCheckpoint()

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }

    println("| corpus × | corpus chunks | index build (s) | incremental batch (s) | full re-band (s) |")
    println("|---|---|---|---|---|")
    for (k <- Seq(1, 2, 4, 8)) {
      val corpus = (0 until k).map(i =>
        base.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
        .reduce(_.unionByName(_))
      val corpusChunks = chunksOf(corpus).localCheckpoint()
      val nChunks = corpusChunks.count()
      // warm both paths once (codegen), then measure
      val (tIdx, buckets) = time {
        val b = Dedup.bandBuckets(
          Dedup.bandIndex(corpusChunks, "chunk_id", "text", 3, 8, 4)).localCheckpoint()
        b.count(); b
      }
      Dedup.incrementalLshPairs(batch, "chunk_id", "text", buckets, corpusChunks).count()
      val (tInc, nInc) = time {
        Dedup.incrementalLshPairs(batch, "chunk_id", "text", buckets, corpusChunks).count()
      }
      val full = corpusChunks.unionByName(batch)
      Dedup.lshCandidatePairs(full, "chunk_id", "text", 3, 8, 4).count()
      val (tFull, _) = time {
        Dedup.lshCandidatePairs(full, "chunk_id", "text", 3, 8, 4).count()
      }
      println(f"| ${k}x | $nChunks | $tIdx%.2f | $tInc%.2f ($nInc pairs) | $tFull%.2f |")
      corpusChunks.unpersist()
    }
    spark.stop()
  }
}
