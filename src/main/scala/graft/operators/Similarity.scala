package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, sign-LSH bucketing
  * and IVF (inverted-file) probing as the scale paths.
  *
  * Scale notes (100 TB): brute force is one scan with a top-k heap
  * (TakeOrderedAndProject) — correct but O(corpus) per query. Sign-LSH
  * assigns each vector a small bucket key in the same scan, so near-dup
  * pair generation shuffles on the bucket key and never crosses buckets.
  * IVF restricts a query to its nearest centroid's cluster — the classic
  * recall/cost trade — and the cluster assignment is itself a broadcast
  * join against a tiny centroid table.
  */
object Similarity {

  /** Σ aᵢbᵢ — native codegen'd expression (graft.expressions.VectorDot).
    * The HOF form ([[dotHof]]) interprets its lambda per element and
    * breaks whole-stage codegen; identical results, ~order-of-magnitude
    * slower per row at scale. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.vectorDot(a, b)

  /** Composable higher-order-function form, kept as the reference
    * implementation the native expression is tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  /** Cosine in one array traversal, NULL on zero norms (portable: DuckDB
    * would yield NaN/Inf and the engines would sort degenerate rows
    * differently). Native expression; [[cosineHof]] is the composable
    * equivalent. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosineSim(a, b)

  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, a) * dotHof(b, b)
    dotHof(a, b) / when(d <= 0, lit(null)).otherwise(sqrt(d))
  }

  /** Brute-force cosine top-k against one query vector (broadcast). */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 query: DataFrame, k: Int): DataFrame =
    df.crossJoin(broadcast(query.select(col(vecCol).as("_qvec"))))
      .select(col(idCol), round(cosine(col(vecCol), col("_qvec")), 4).as("cos_sim"))
      .filter(col("cos_sim").isNotNull)
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)

  /** Sign-LSH bucket key: the sign bits of the first `p` dimensions as a
    * '0'/'1' string (a fixed axis-projection hyperplane family —
    * deterministic, engine-portable, and a real random-hyperplane LSH for
    * axis-symmetric embedding distributions). */
  def signBucket(vec: Column, p: Int): Column =
    concat((0 until p).map(i =>
      when(element_at(vec, i + 1) >= 0, "1").otherwise("0")): _*)

  /** Near-duplicate pairs: bucket by sign-LSH, pair within bucket, keep
    * cosine above `minCos`. Returns (id_a, id_b, cos_sim). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   p: Int, minCos: Double): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), p).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") > minCos)
  }

  /** Lloyd's k-means over the embedding column, pure DataFrame ops:
    * seed with `k` deterministic rows, then iterate assign (broadcast
    * centroid cross-join + argmax cosine) → re-center (positional explode,
    * per-(cluster, dim) mean, re-assemble). Each iteration is two shuffles
    * regardless of corpus size; centroids stay driver-side (k × dims
    * doubles). Returns (centroid_id, vec) for [[ivfTopK]].
    */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    var centroids: Seq[(Long, Seq[Float])] = df
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol), col(vecCol))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](1).toSeq) }.toSeq

    for (_ <- 0 until iters) {
      val cent = broadcast(centroids.toDF("_cid", "_cvec")
        .select(col("_cid"), col("_cvec").cast("array<float>").as("_cvec")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("_aid").orderBy(desc("_sim"), asc("_cid"))
      val assigned = df.select(col(idCol).as("_aid"), col(vecCol).as("_avec"))
        .crossJoin(cent)
        .select(col("_aid"), col("_avec"), col("_cid"),
          cosine(col("_avec"), col("_cvec")).as("_sim"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
      // re-center: positional mean per (cluster, dim)
      val means = assigned
        .select(col("_cid"), posexplode(col("_avec")).as(Seq("_pos", "_x")))
        .groupBy("_cid", "_pos")
        .agg(avg(col("_x")).as("_mean"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq)
        }
      // keep a centroid's previous position if its cluster went empty
      centroids = centroids.map { case (cid, prev) => (cid, means.getOrElse(cid, prev)) }
    }
    centroids.toDF(idCol, vecCol)
      .select(col(idCol), col(vecCol).cast("array<float>").as(vecCol))
  }

  /** IVF probe: centroid table (tiny, broadcast) → assign every vector to
    * its nearest centroid by cosine → search only the query's `probes`
    * nearest clusters. Returns the top-k of the probed clusters.
    *
    * `probes` is the recall/cost dial (the standard IVF trade): 1 probe
    * scans ~1/nCentroids of the corpus; recall grows with probes and
    * reaches 1.0 at probes = nCentroids (== brute force). Measured on the
    * driver corpus in PLANS.md.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              centroids: DataFrame, centroidIdCol: String,
              query: DataFrame, k: Int, probes: Int = 1): DataFrame = {
    val cent = broadcast(centroids.select(
      col(centroidIdCol).as("_cid"), col(vecCol).as("_cvec")))

    def assign(frame: DataFrame, id: Column, vec: Column, nearest: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("_aid").orderBy(desc("_sim"), asc("_cid"))
      // rank on the ROUNDED similarity: both engines agree at 4 decimals,
      // unrounded doubles may differ in the last ulp across engines and
      // flip an assignment tie
      frame.crossJoin(cent)
        .select(id.as("_aid"), vec.as("_avec"), col("_cid"),
          round(cosine(vec, col("_cvec")), 4).as("_sim"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= nearest)
        .select(col("_aid"), col("_avec"), col("_cid"))
    }

    val assigned = assign(df, col(idCol), col(vecCol), nearest = 1)
    // Partition the query-side ranking by the query's OWN id (not a dummy
    // constant): a constant partition key degenerates WindowExec to a
    // single global partition — harmless for one query row, a serial
    // bottleneck for a query BATCH, and matches the oracle's
    // PARTITION BY vec_id.
    val queryClusters = assign(query, col(idCol), col(vecCol), nearest = probes)
      .select(col("_cid").as("_qcid"), col("_avec").as("_qvec"))
    assigned
      .join(broadcast(queryClusters), col("_cid") === col("_qcid"))
      .select(col("_aid").as(idCol),
        round(cosine(col("_avec"), col("_qvec")), 4).as("cos_sim"))
      .filter(col("cos_sim").isNotNull)
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)
  }
}
