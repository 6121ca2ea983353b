package graft.tools

import graft.operators.Pca
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two PCA scale claims against a growing corpus:
  *   1. the moment pass is one scan with a corpus-size-free reduce
  *      (cost grows linearly with rows, nothing else grows);
  *   2. the incremental path (moment pass over the BATCH + long merge)
  *      is flat as the already-banked corpus grows, while a from-scratch
  *      re-solve grows linearly — the VectorAppendProbe shape for
  *      linear algebra.
  * Usage: runMain graft.tools.PcaScaleProbe [sfDir] */
object PcaScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    val n0 = base.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm
    Pca.moments(base, "embedding")

    println(f"[pca-probe] base corpus $n0 rows")
    for (mult <- Seq(1, 8, 32, 128)) {
      val grown = (0 until mult).map(i =>
          base.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
        .reduce(_ unionByName _).cache()
      grown.count()
      val (_, tFull) = timed(Pca.moments(grown, "embedding"))
      val (_, tFull2) = timed(Pca.moments(grown, "embedding"))
      // incremental: the arriving batch is always base-sized; banked
      // corpus moments are already longs, so the append is batch pass + merge
      val banked = Pca.moments(grown, "embedding")
      val (_, tInc) = timed {
        val b = Pca.moments(base, "embedding")
        val m = Pca.mergeMoments(banked, b)
        Pca.topComponentsFromMoments(m._1, m._2, m._3, 1, 8)
      }
      println(f"[pca-probe] ${mult}x (${n0 * mult}%8d rows): full-moments $tFull%.2f/$tFull2%.2f s, incremental-append $tInc%.2f s")
      grown.unpersist()
    }
    spark.stop()
  }
}
