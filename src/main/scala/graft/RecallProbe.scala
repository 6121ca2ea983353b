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

    // `assign` mode: per-row IVF assignment cost vs nlist. Assignment is
    // O(nlist × dims) per row (the flat-argmax NearestCentroids
    // expression), so a realistic billion-vector nlist (10⁴–10⁵) must be
    // measured, not assumed: this sweep fixes dims=64 (the corpus's) and
    // scales nlist 256→16384 over a synthetic 100k-vector cache.
    if (args.contains("assign")) {
      val dims = 64
      val n = 100000
      val vecs = spark.range(n).select(col("id"),
        array((0 until dims).map(i => rand(i + 1).cast("float")): _*).as("emb"))
        .cache()
      vecs.count()
      val rnd = new scala.util.Random(42)
      for (nlist <- Seq(256, 1024, 4096, 16384)) {
        val cents = (0 until nlist).map(c => (c.toLong, Seq.fill(dims)(rnd.nextFloat() * 2 - 1)))
        def time(label: String, assignCol: org.apache.spark.sql.Column): Unit = {
          def run(df: org.apache.spark.sql.DataFrame) =
            df.select(assignCol.as("_cid")).agg(sum(col("_cid"))).collect()
          run(vecs.limit(1000)) // codegen warm-up outside the timed window
          val t0 = System.nanoTime()
          run(vecs)
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[assign] nlist=$nlist%6d dims=$dims $label%9s: $dt%6.2f s = " +
            f"${n / dt}%9.0f rows/s (${n / dt / 8}%.0f rows/s/core)")
        }
        time("flat", Similarity.nearestCentroid(col("emb"), cents, round4 = true))
        val idx = Similarity.buildCoarseIndex(cents,
          nCoarse = math.ceil(math.sqrt(nlist)).toInt)
        for (branches <- Seq(4, 16)) {
          val twoLevel = Similarity
            .topCentroidsTwoLevel(col("emb"), idx, n = 1, branches = branches, round4 = true)
            .getItem(0)
          time(s"2lvl-b$branches", twoLevel)
          // how often the coarse search lands on the flat argmax (partition
          // perturbation, NOT retrieval recall — matched query/corpus sides
          // keep the search consistent either way)
          val agree = vecs.select(
            (Similarity.nearestCentroid(col("emb"), cents, round4 = true) === twoLevel)
              .cast("int").as("_eq"))
            .agg(avg(col("_eq"))).head().getDouble(0)
          println(f"[assign] nlist=$nlist%6d two-level(b=$branches) agreement with flat: $agree%.4f")
        }
      }
      spark.stop()
      return
    }
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
