package graft.tools

import graft.ingest.{TableStore, VectorIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two-level assignment escalation in the SEGMENT path
  * (VERDICT r6 #4 / round-7 wiring): at a real nlist (10⁴), the flat
  * per-row argmax scans every centroid per appended row — the append
  * bottleneck — while two-level assignment with b branches searches
  * ~b·√nlist centroids. This probe publishes a 10⁴-centroid index, then
  * times appendCorpus + the segment-union query in flat mode vs
  * two-level (branches 8 and 32), same delta.
  *
  * Usage: runMain graft.tools.TwoLevelAppendProbe [rows] [nlist]
  * (defaults 100k rows, nlist 10000, dims 32)
  */
object TwoLevelAppendProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(100000)
    val nlist = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
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

    val root = java.nio.file.Files.createTempDirectory("graft-tlap").toString
    val store = new TableStore(spark, root, nBuckets = 2)
    VectorIndex.publish(store, "probe", vecs(0, nlist))
    val delta = vecs(nlist, rows).localCheckpoint()
    val queries = vecs(5000000, 8)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for ((tag, cb) <- Seq(("flat", 0), ("2l-b8", 8), ("2l-b32", 32), ("flat", 0), ("2l-b8", 8))) {
      val label = s"$tag-${System.nanoTime()}"
      val (_, tApp) = time(VectorIndex.appendCorpus(store, "probe", delta, "id", "v",
        label = label, coarseBranches = cb))
      val (nq, tQ) = time(VectorIndex.ivfSegmentsTopKBatch(
        store, "probe", queries, "id", "v", k = 5, probes = 2, label = label).count())
      println(f"[tlap] $tag%-7s nlist=$nlist rows=$rows append=$tApp%6.2f s " +
        f"(${rows / tApp}%9.0f rows/s) query($nq rows)=$tQ%5.2f s")
    }
    spark.stop()
  }
}
