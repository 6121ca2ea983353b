package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF recall probe: recall@k of the centroid-probe search vs brute force
  * over the driver corpus, averaged across query vectors (PLANS.md). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01").cache()
    val k = 10
    val nCentroids = 8
    val centroids = emb.filter(col("vec_id").between(1, nCentroids))
    val data = emb.filter(col("vec_id") > nCentroids)
    val queries = (50 to 69).map(_.toLong)
    val trained = Similarity.trainCentroids(data, "vec_id", "embedding", nCentroids, iters = 3)
      .cache()
    for ((centTable, label) <- Seq((centroids, "fixed"), (trained, "trained"));
         probes <- Seq(1, 2, 4)) {
      val recalls = queries.map { q =>
        val query = emb.filter(col("vec_id") === q)
        val rest = data.filter(col("vec_id") =!= q)
        val brute = Similarity.cosineTopK(rest, "vec_id", "embedding", query, k)
          .collect().map(_.getLong(0)).toSet
        val ivf = Similarity.ivfTopK(rest, "vec_id", "embedding",
          centTable, "vec_id", query, k, probes).collect().map(_.getLong(0)).toSet
        brute.intersect(ivf).size.toDouble / k
      }
      println(f"IVF recall@$k, $nCentroids $label centroids, $probes probe(s): " +
        f"mean=${recalls.sum / recalls.size}%.3f min=${recalls.min}%.2f max=${recalls.max}%.2f")
    }
    spark.stop()
  }
}
