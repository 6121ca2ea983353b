package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence for the incremental-dedup scale claim: with the corpus band
  * index STORED (built once at ingest), the per-batch cost is the batch's
  * own hashing plus a column-pruned scan of the index — NOT a re-LSH of
  * the corpus. The probe grows the corpus (fan-out of the sf0.1
  * documents with remapped ids) under a FIXED 500-doc batch and compares
  *
  *   - `incremental`: `incrementalLshPairs` against the pre-built bucket
  *     table (read from parquet, as a real pipeline would);
  *   - `full re-LSH`: `lshCandidatePairs` over corpus ∪ batch — what a
  *     non-incremental pipeline pays every day.
  *
  * `sbt "runMain graft.tools.IncrementalDedupProbe [multipliers...]"`
  */
object IncrementalDedupProbe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val n = docs.count()
    val batch = docs.filter(col("doc_id") < 500)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
      .repartition(32).persist()
    batch.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    println("[incdedup-probe] corpus_mult corpus_docs index_build_s incremental_s pairs full_relsh_s pairs")
    mults.foreach { m =>
      val corpus: DataFrame = (0 until m).map { i =>
        docs.select((col("doc_id") + i.toLong * n).as("doc_id"), col("text"))
      }.reduce(_ unionByName _).repartition(32)

      val idxDir = java.nio.file.Files.createTempDirectory(s"incdedup-$m").toString
      val (tBuild, _) = time {
        Dedup.bandBuckets(Dedup.bandIndex(corpus, "doc_id", "text", 3, 8, 4))
          .write.mode("overwrite").parquet(idxDir)
        0L
      }
      val buckets = spark.read.parquet(idxDir)
      val (tInc, nInc) = time {
        Dedup.incrementalLshPairs(batch, "doc_id", "text", buckets, corpus).count()
      }
      val (tFull, nFull) = time {
        Dedup.lshCandidatePairs(corpus.unionByName(batch), "doc_id", "text", 3, 8, 4)
          .filter(col("doc_a") >= 100000000L || col("doc_b") >= 100000000L).count()
      }
      println(f"[incdedup-probe] ${m}%11d ${m * n}%11d ${tBuild}%13.2f ${tInc}%13.2f $nInc%5d ${tFull}%12.2f $nFull%5d")
    }
    spark.stop()
  }
}
