package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge lists — PageRank as the first
  * resident (the influence/centrality measure a provenance graph, a
  * citation web, or a supplier→customer commerce graph all want).
  *
  * Determinism contract (the [[Classifier]] doctrine applied to graph
  * message passing): every per-edge message is quantized ONCE to a
  * scaled long — `round(rank/out · 2^32)` — so the per-node inbound
  * reduction is an exact commutative sum and the rank vector is
  * BIT-IDENTICAL under any partitioning (a raw double sum would drift
  * with aggregation order and diverge from any SQL oracle). Dangling
  * mass (nodes with no out-edges) is folded the same way: an exact
  * scaled-long sum redistributed uniformly. Every double expression is
  * written in one fixed shape that the oracle mirrors token-for-token.
  *
  * Scale shape: one distinct-edge frame and one out-degree frame, both
  * reused across iterations; each iteration is ONE join
  * (edges ⋈ ranks, shuffling on src) + ONE partial-agg groupBy on dst
  * (a celebrity node's inbound messages collapse map-side — exactly
  * the skew posture a power-law graph needs) + one driver-side scalar
  * for the dangling fold. Iteration count is fixed and small (a
  * centrality REPORT, not a convergence solver); ranks localCheckpoint
  * per iteration so lineage stays flat. */
object Graph {

  /** 2^32 — the message quantum (see [[Classifier.Scale]]). */
  val Scale: Double = 4294967296.0

  /** PageRank over a directed edge list (duplicate edges collapse —
    * multiplicity is not weight here). Returns `(node, rank)`.
    *
    * Below `driverEdgeLimit` DISTINCT edges the sequential twin
    * ([[pageRankLocal]] — spec-pinned bit-identical to the distributed
    * loop) runs on the collected edge list instead: each distributed
    * iteration pays three jobs plus fresh whole-stage-codegen compiles
    * (the per-iteration dangling/base constants change the generated
    * source), while the twin is linear scans — the
    * [[Dedup.duplicateClusters]] driver-union-find doctrine applied to
    * rank propagation. The limit is a driver-MEMORY guardrail (16
    * bytes/edge collected); the distributed loop remains the
    * arbitrarily-large-graph path and stays spec-covered through the
    * explicit `driverEdgeLimit = 0` arm. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               driverEdgeLimit: Long = 4_000_000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().cache()
    val nEdges = e.count()
    if (nEdges <= driverEdgeLimit) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      e.unpersist(blocking = false)
      val spark = edges.sparkSession
      return localResult(spark,
        pageRankLocal(es, iters, damping).toSeq.sortBy(_._1), "rank")
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val nN = nodes.count()
    val out = e.groupBy("src").agg(count(lit(1)).as("out")).cache()
    var ranks = nodes.withColumn("rank", lit(1.0 / nN))
    // Size-gated broadcast of the per-iteration score frame (node-count
    // sized), so at bench scale the EDGE frame is never shuffled per
    // iteration — measured 2.5× on graph_hits. Checkpointed rank frames
    // carry no plan stats, so the gate keys off the driver-known vertex
    // count, not sizeInBytes; past 2M nodes the join degrades to the
    // shuffle AQE re-plans. A broadcast changes the join strategy, never
    // the quantized values, so the vectors stay bit-identical.
    def gated(df: DataFrame): DataFrame =
      if (nN <= 2000000L) org.apache.spark.sql.functions.broadcast(df) else df
    for (_ <- 0 until iters) {
      val dangScaled = ranks
        .join(out, ranks("node") === out("src"), "left_anti")
        .agg(coalesce(sum(round(col("rank") * Scale).cast("long")), lit(0L)))
        .head.getLong(0)
      val contribs = e
        .join(gated(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .join(gated(out), Seq("src"))
        .select(col("dst").as("node"),
          round(col("rank") / col("out") * Scale).cast("long").as("m"))
        .groupBy("node").agg(sum("m").as("msum"))
      val base = (1.0 - damping) / nN + damping * (dangScaled / Scale) / nN
      ranks = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(base) + lit(damping) * (coalesce(col("msum"), lit(0L)) / Scale))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** HITS hubs & authorities — the bipartite-friendly centrality
    * (PageRank collapses on a bipartite graph: all source-side mass
    * drains to sinks; HITS scores BOTH sides). Same determinism
    * doctrine with a twist: the L1 normalization — usually a float sum
    * over all scores — never happens in floats here. Inbound sums stay
    * SCALED LONGS, the normalizer is their exact long total, and each
    * score is ONE division of two exact longs. Nodes with zero inbound
    * (no authority/hub evidence) are absent from their side's output —
    * score 0 by definition, and the oracle agrees by construction.
    * Returns `(role 'hub'|'auth', node, score)`. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int, driverEdgeLimit: Long = 4_000_000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().cache()
    // same size-gated driver path as [[pageRank]] (hitsLocal is the
    // spec-pinned bit-identical twin)
    if (e.count() <= driverEdgeLimit) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      e.unpersist(blocking = false)
      val spark = edges.sparkSession
      val (lh, la) = hitsLocal(es, iters)
      return localResult(spark, lh.toSeq.sortBy(_._1), "score", Some("hub"))
        .unionByName(localResult(spark, la.toSeq.sortBy(_._1), "score", Some("auth")))
    }
    var hubs = e.select(col("src").as("node")).distinct()
      .withColumn("h", lit(1.0))
    // node-count gate for the per-iteration score broadcast: a
    // checkpointed frame loses plan stats (LogicalRDD defaults to
    // "unknown = huge"), so the gate keys off the driver-known vertex
    // bound instead — exact, and it degrades to the shuffle join past it
    val nNodes = hubs.count()
    // same node-count broadcast gate as pageRank's `gated` (see there)
    def gated(df: DataFrame): DataFrame =
      if (nNodes <= 2000000L) org.apache.spark.sql.functions.broadcast(df) else df
    var auths: DataFrame = null
    for (_ <- 0 until iters) {
      // checkpoint the inbound-sum frame ONCE: both the normalizer
      // action and the score projection read it, and without the
      // materialization the edge join + aggregation ran TWICE per
      // half-iteration (the round-9 profile's dominant cost)
      val am = e.join(gated(hubs.withColumnRenamed("node", "src")), Seq("src"))
        .select(col("dst").as("node"), round(col("h") * Scale).cast("long").as("m"))
        .groupBy("node").agg(sum("m").as("ms"))
        .localCheckpoint()
      val atot = am.agg(coalesce(sum("ms"), lit(0L))).head.getLong(0)
      auths = am.select(col("node"),
        (col("ms").cast("double") / atot.toDouble).as("a"))
      val hm = e.join(gated(auths.withColumnRenamed("node", "dst")), Seq("dst"))
        .select(col("src").as("node"), round(col("a") * Scale).cast("long").as("m"))
        .groupBy("node").agg(sum("m").as("ms"))
        .localCheckpoint()
      val htot = hm.agg(coalesce(sum("ms"), lit(0L))).head.getLong(0)
      hubs = hm.select(col("node"),
        (col("ms").cast("double") / htot.toDouble).as("h"))
    }
    hubs.select(lit("hub").as("role"), col("node"), col("h").as("score"))
      .unionByName(auths.select(lit("auth").as("role"), col("node"), col("a").as("score")))
  }

  /** Driver-path result as a DISTRIBUTED frame (the duplicateClusters
    * parallelize doctrine — a LocalRelation would serialize the whole
    * result into one task of every downstream job). Emits
    * `(node, <valueName>)`, or `(role, node, <valueName>)` when `role`
    * is set. */
  private def localResult(spark: org.apache.spark.sql.SparkSession,
                          rows: Seq[(Long, Double)], valueName: String,
                          role: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    val slices = math.max(1, math.min(32, rows.size / 100000))
    role match {
      case None =>
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            rows.map { case (n, v) => org.apache.spark.sql.Row(n, v) }, slices),
          StructType(Seq(StructField("node", LongType, nullable = false),
            StructField(valueName, DoubleType, nullable = false))))
      case Some(r) =>
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            rows.map { case (n, v) => org.apache.spark.sql.Row(r, n, v) }, slices),
          StructType(Seq(StructField("role", StringType, nullable = false),
            StructField("node", LongType, nullable = false),
            StructField(valueName, DoubleType, nullable = false))))
    }
  }

  /** Sequential HITS twin (see [[pageRankLocal]]). Dense-index arrays
    * since round 16 (the Seq#groupBy form allocated per-key vectors —
    * ~1.4 s on the 587k-edge sf0.1 commerce graph, ~60 ms here); the
    * arithmetic is unchanged: the same long messages summed per node
    * (exact commutative sums, order-free), the same single divisions.
    * A node is PRESENT on a side iff it has ≥ 1 qualifying edge — even
    * when its message sum rounds to 0 — exactly the old groupBy-key
    * semantics. */
  def hitsLocal(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Double], Map[Long, Double]) = {
    val e = edges.distinct.toArray
    val (ids, idx) = denseIndex(e)
    val n = ids.length
    val src = new Array[Int](e.length)
    val dst = new Array[Int](e.length)
    var k = 0
    while (k < e.length) { src(k) = idx.get(e(k)._1); dst(k) = idx.get(e(k)._2); k += 1 }
    val hub = new Array[Double](n)
    val hasHub = new Array[Boolean](n)
    k = 0
    while (k < e.length) { hub(src(k)) = 1.0; hasHub(src(k)) = true; k += 1 }
    val auth = new Array[Double](n)
    val hasAuth = new Array[Boolean](n)
    val msum = new Array[Long](n)
    val touched = new Array[Boolean](n)
    for (_ <- 0 until iters) {
      java.util.Arrays.fill(msum, 0L)
      java.util.Arrays.fill(touched, false)
      k = 0
      while (k < e.length) {
        if (hasHub(src(k))) {
          msum(dst(k)) += StrictMath.round(hub(src(k)) * Scale)
          touched(dst(k)) = true
        }
        k += 1
      }
      var atot = 0L
      var i = 0
      while (i < n) { if (touched(i)) atot += msum(i); i += 1 }
      i = 0
      while (i < n) {
        hasAuth(i) = touched(i)
        auth(i) = if (touched(i)) msum(i).toDouble / atot.toDouble else 0.0
        i += 1
      }
      java.util.Arrays.fill(msum, 0L)
      java.util.Arrays.fill(touched, false)
      k = 0
      while (k < e.length) {
        if (hasAuth(dst(k))) {
          msum(src(k)) += StrictMath.round(auth(dst(k)) * Scale)
          touched(src(k)) = true
        }
        k += 1
      }
      var htot = 0L
      i = 0
      while (i < n) { if (touched(i)) htot += msum(i); i += 1 }
      i = 0
      while (i < n) {
        hasHub(i) = touched(i)
        hub(i) = if (touched(i)) msum(i).toDouble / htot.toDouble else 0.0
        i += 1
      }
    }
    val hm = Map.newBuilder[Long, Double]
    val am = Map.newBuilder[Long, Double]
    var i = 0
    while (i < n) {
      if (hasHub(i)) hm += ids(i) -> hub(i)
      if (hasAuth(i)) am += ids(i) -> auth(i)
      i += 1
    }
    (hm.result(), am.result())
  }

  /** Sorted node ids of an edge array + id → dense-index lookup. */
  private def denseIndex(e: Array[(Long, Long)])
      : (Array[Long], java.util.HashMap[Long, Integer]) = {
    val set = new java.util.TreeSet[java.lang.Long]()
    e.foreach { p => set.add(p._1); set.add(p._2) }
    val ids = new Array[Long](set.size)
    val idx = new java.util.HashMap[Long, Integer](set.size * 2)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { val v = it.next().longValue(); ids(i) = v; idx.put(v, i); i += 1 }
    (ids, idx)
  }

  /** Sequential reference twin — same quantization, same expression
    * shapes, no engine; the spec pins the distributed path against it
    * bit-for-bit. */
  def pageRankLocal(edges: Seq[(Long, Long)], iters: Int,
                    damping: Double = 0.85): Map[Long, Double] = {
    // dense-index arrays since round 16 (see [[hitsLocal]]): identical
    // arithmetic — the same long messages summed per node (exact
    // commutative sums), the same base/damping expression per rank
    val e = edges.distinct.toArray
    val (ids, idx) = denseIndex(e)
    val n = ids.length
    val nN = n.toLong
    val src = new Array[Int](e.length)
    val dst = new Array[Int](e.length)
    var k = 0
    while (k < e.length) { src(k) = idx.get(e(k)._1); dst(k) = idx.get(e(k)._2); k += 1 }
    val out = new Array[Long](n)
    k = 0
    while (k < e.length) { out(src(k)) += 1L; k += 1 }
    val ranks = Array.fill(n)(1.0 / nN)
    val msum = new Array[Long](n)
    for (_ <- 0 until iters) {
      var dangScaled = 0L
      var i = 0
      while (i < n) {
        if (out(i) == 0L) dangScaled += StrictMath.round(ranks(i) * Scale)
        i += 1
      }
      java.util.Arrays.fill(msum, 0L)
      k = 0
      while (k < e.length) {
        msum(dst(k)) += StrictMath.round(ranks(src(k)) / out(src(k)) * Scale)
        k += 1
      }
      val base = (1.0 - damping) / nN + damping * (dangScaled / Scale) / nN
      i = 0
      while (i < n) { ranks(i) = base + damping * (msum(i) / Scale); i += 1 }
    }
    val b = Map.newBuilder[Long, Double]
    var i = 0
    while (i < n) { b += ids(i) -> ranks(i); i += 1 }
    b.result()
  }
}
