package graft.tools

import graft.ingest.{TableStore, VectorIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the incremental vector-index append claim: appendCorpus is
  * O(delta) — per-append cost must stay FLAT while the stored corpus
  * grows — vs the train→encode path, which re-reads everything and
  * grows with the corpus. Also times the segment-union query before and
  * after compaction.
  *
  * Usage: runMain graft.tools.VectorAppendProbe [batches] [batchRows]
  * (defaults 10 × 20k rows, dims 32)
  */
object VectorAppendProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(10)
    val batchRows = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val dims = 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def vecs(start: Int, n: Int) = spark.range(start, start + n).select(
      col("id"),
      transform(sequence(lit(1), lit(dims)),
        j => (pmod(col("id") * 37 + j * 101, lit(997)).cast("double") / 997.0).cast("float"))
        .as("v"))

    val root = java.nio.file.Files.createTempDirectory("graft-vap").toString
    val store = new TableStore(spark, root, nBuckets = 2)
    VectorIndex.publish(store, "probe",
      vecs(0, 16).select(col("id"), col("v")))
    val queries = vecs(1000000, 8)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (b <- 0 until batches) {
      val delta = vecs(b * batchRows, batchRows)
      val (_, tApp) = time(VectorIndex.appendCorpus(store, "probe", delta, "id", "v"))
      val (nq, tQ) = time(VectorIndex.ivfSegmentsTopKBatch(
        store, "probe", queries, "id", "v", k = 5, probes = 2).count())
      // the non-incremental alternative at this corpus size: re-encode
      // AND rewrite EVERYTHING under the same centroids (what a
      // replace-the-corpus path pays every ingest)
      val full = vecs(0, (b + 1) * batchRows)
      val (_, tFull) = time {
        val idx = VectorIndex.load(store, "probe")
        val out = java.nio.file.Files.createTempDirectory("graft-vap-full").toString
        full.select(col("id"),
          graft.operators.Similarity.nearestCentroid(
            col("v").cast("array<float>"), idx.centroids, round4 = true).as("cid"),
          col("v").cast("array<float>").as("vec"))
          .write.mode("overwrite").parquet(out)
      }
      println(f"[vap] batch $b%2d corpus=${(b + 1) * batchRows}%8d " +
        f"append=$tApp%6.2f s reencode_all=$tFull%6.2f s query($nq rows)=$tQ%5.2f s")
    }
    val (_, tCompact) = time(VectorIndex.compactSegments(store, "probe"))
    val (_, tQc) = time(VectorIndex.ivfSegmentsTopKBatch(
      store, "probe", queries, "id", "v", k = 5, probes = 2).count())
    println(f"[vap] compact(${batches} segs)=$tCompact%5.2f s query_after=$tQc%5.2f s")
    spark.stop()
  }
}
