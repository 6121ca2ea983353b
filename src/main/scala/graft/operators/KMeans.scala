package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed Lloyd's k-means over the embedding column —
  * the clustering stage behind IVF index training, cluster-balanced
  * curation draws, and corpus cartography, as a first-class verifiable
  * operator (the ad-hoc coarse grouping in [[Similarity]] Lloyd's over
  * nlist fine centroids is driver-local and unverified; this is the
  * corpus-scale twin an external oracle can replay).
  *
  * Determinism doctrine ([[Pca]] / [[Graph]]): every distributed
  * reduction sums values quantized ONCE to scaled longs (round(x·2^32),
  * [[Pca.rnd]] — bit-equal to both engines' round()), so per-row
  * distances, per-cluster component sums, and counts are exact
  * commutative sums — bit-identical under any partitioning. Centroid
  * updates use truncating long division (DuckDB's integer `//` also
  * truncates toward zero — measured, not assumed: -7//2 = -3) and
  * rescale by the exact power of two, so every centroid coordinate is a
  * dyadic rational both engines represent exactly. Argmin ties resolve
  * to the smallest cluster id via the min(dist·k + j) fold.
  *
  * Seeding is content-deterministic, not RNG: cluster j starts from the
  * vector with the smallest id in residue class id % k == j (every
  * engine can re-derive it; stable under row order).
  *
  * Scale shape: each iteration is ONE treeAggregate pass folding every
  * partition into a k·(d+1) long array (component sums + counts per
  * cluster) — no shuffle at all; reduce volume is k·d longs per
  * partition regardless of corpus size. Centroids live driver-side
  * (k·d doubles) and ship back as task-literal arrays, the
  * [[Similarity]] IVF-assignment posture. Overflow: quantized component
  * sums are ≤ n·B·2^32 — inside a long to n ≈ 2^30 unit-scale rows per
  * cluster; shard the pass beyond that (the [[Pca.moments]] bound).
  */
object KMeans {

  /** 2^32 — the shared quantum (see [[Pca.Scale]]). */
  val Scale: Double = Pca.Scale

  /** Exact dyadic mean of float vectors — the centroid idiom exposed
    * for ad-hoc "more like these" queries: per-dim quantized-long sums,
    * one truncating division, float cast (all IEEE-reproducible by any
    * engine). */
  def dyadicMeanFloat(vs: Seq[Seq[Float]]): Array[Float] = {
    require(vs.nonEmpty, "dyadicMeanFloat of an empty set")
    val d = vs.head.size
    Array.tabulate(d) { i =>
      val sq = vs.map(v => Pca.rnd(v(i).toDouble * Scale)).sum
      ((sq / vs.length).toDouble / Scale).toFloat
    }
  }

  final case class Model(
      centroids: Array[Array[Double]], // k × d, dyadic after iteration 1
      sizes: Array[Long]) // members per cluster in the final assignment

  /** Train k clusters with `iters` Lloyd iterations. Requires every
    * residue class `vec_id % k` to be inhabited (content-deterministic
    * seeding needs a seed per cluster). */
  def train(df: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): Model = {
    require(k >= 1 && iters >= 1, s"need k >= 1, iters >= 1 (got $k, $iters)")
    val rows = df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))

    val seedIds = rows.groupBy((col(idCol) % k).as("j")).agg(min(col(idCol)).as("sid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(seedIds.size == k,
      s"seeding needs all $k residue classes of $idCol % $k inhabited; " +
        s"found ${seedIds.size} (corpus smaller than k?)")
    val seedVecs = rows.filter(col(idCol).isin(seedIds.values.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val d = seedVecs.head._2.length
    var cents: Array[Array[Double]] =
      (0 until k).map(j => seedVecs(seedIds(j.toLong)).map(_.toDouble)).toArray
    var sizes = new Array[Long](k)

    val rdd = rows.select(col(vecCol).cast("array<float>")).rdd
    for (_ <- 1 to iters) {
      val bc = rows.sparkSession.sparkContext.broadcast(cents)
      // acc layout: per cluster j, d quantized component sums then count
      val agg = rdd.treeAggregate(new Array[Long](k * (d + 1)))(
        seqOp = (acc, row) => {
          val v = row.getSeq[Float](0)
          val cs = bc.value
          var best = 0
          var bestQ = Long.MaxValue
          var j = 0
          while (j < k) {
            val c = cs(j)
            var dq = 0L
            var i = 0
            while (i < d) {
              val diff = v(i).toDouble - c(i)
              dq += Pca.rnd(diff * diff * Scale)
              i += 1
            }
            // min(dq·k + j): tie lands on the smallest cluster id
            val key = dq * k + j
            if (key < bestQ) { bestQ = key; best = j }
            j += 1
          }
          val off = best * (d + 1)
          var i = 0
          while (i < d) {
            acc(off + i) += Pca.rnd(v(i).toDouble * Scale)
            i += 1
          }
          acc(off + d) += 1L
          acc
        },
        combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
      bc.destroy()
      val next = Array.tabulate(k) { j =>
        val n = agg(j * (d + 1) + d)
        if (n == 0) cents(j) // empty cluster keeps its centroid
        else Array.tabulate(d)(i =>
          // truncating /, matching DuckDB's integer `//` on negatives
          (agg(j * (d + 1) + i) / n).toDouble / Scale)
      }
      sizes = Array.tabulate(k)(j => agg(j * (d + 1) + d))
      cents = next
    }
    Model(cents, sizes)
  }

  /** The SERVE half: every vector's cluster under a trained model plus
    * its quantized squared distance (the inertia ingredient) — the same
    * argmin as the training pass (ties to the smallest cluster id), run
    * as one mapPartitions over broadcast centroid literals. No shuffle;
    * composes into cluster-balanced sampling, per-cluster curation, and
    * the elbow diagnostic downstream. */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    val k = model.centroids.length
    val d = model.centroids.head.length
    val bc = spark.sparkContext.broadcast(model.centroids)
    val rows = df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
    val out = rows.rdd.mapPartitions { it =>
      val cs = bc.value
      it.map { r =>
        val v = r.getSeq[Float](1)
        var best = 0
        var bestQ = Long.MaxValue
        var j = 0
        while (j < k) {
          val c = cs(j)
          var dq = 0L
          var i = 0
          while (i < d) {
            val diff = v(i).toDouble - c(i)
            dq += Pca.rnd(diff * diff * Scale)
            i += 1
          }
          val key = dq * k + j
          if (key < bestQ) { bestQ = key; best = j }
          j += 1
        }
        // recover the winning quantized distance from the tie-break key
        org.apache.spark.sql.Row(r.getLong(0), best.toLong, (bestQ - best) / k)
      }
    }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dist_q",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** The trained model as an exploded frame `(cluster, n_members, dim,
    * cq)` with cq = centroid·2^32 (exact long — dyadic coordinates make
    * this lossless), the array-free shape the driver compare sorts. */
  def trainFrame(df: DataFrame, idCol: String, vecCol: String,
                 k: Int, iters: Int): DataFrame = {
    val m = train(df, idCol, vecCol, k, iters)
    val s2 = df.sparkSession
    import s2.implicits._
    m.centroids.zipWithIndex.flatMap { case (c, j) =>
      c.zipWithIndex.map { case (x, i) =>
        (j.toLong, m.sizes(j), i.toLong, Pca.rnd(x * Scale))
      }
    }.toSeq.toDF("cluster", "n_members", "dim", "cq")
      .orderBy("cluster", "dim")
  }
}
