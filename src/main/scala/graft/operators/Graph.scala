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
    * multiplicity is not weight here). Returns `(node, rank)`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().cache()
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
           iters: Int): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().cache()
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

  /** Sequential HITS twin (see [[pageRankLocal]]). */
  def hitsLocal(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Double], Map[Long, Double]) = {
    val e = edges.distinct
    var hubs: Map[Long, Double] = e.map(_._1).distinct.map(_ -> 1.0).toMap
    var auths: Map[Long, Double] = Map.empty
    for (_ <- 0 until iters) {
      val am = e.filter(p => hubs.contains(p._1)).groupBy(_._2).map { case (d, es) =>
        d -> es.map(p => StrictMath.round(hubs(p._1) * Scale)).sum
      }
      val atot = am.values.sum
      auths = am.map { case (n, ms) => n -> ms.toDouble / atot.toDouble }
      val hm = e.filter(p => auths.contains(p._2)).groupBy(_._1).map { case (s, es) =>
        s -> es.map(p => StrictMath.round(auths(p._2) * Scale)).sum
      }
      val htot = hm.values.sum
      hubs = hm.map { case (n, ms) => n -> ms.toDouble / htot.toDouble }
    }
    (hubs, auths)
  }

  /** Sequential reference twin — same quantization, same expression
    * shapes, no engine; the spec pins the distributed path against it
    * bit-for-bit. */
  def pageRankLocal(edges: Seq[(Long, Long)], iters: Int,
                    damping: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val nN = nodes.size.toLong
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var ranks = nodes.map(_ -> 1.0 / nN).toMap
    for (_ <- 0 until iters) {
      val dangScaled = nodes.filterNot(out.contains)
        .map(n => StrictMath.round(ranks(n) * Scale)).sum
      val msums = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) =>
          StrictMath.round(ranks(s) / out(s) * Scale)
        }.sum
      }
      val base = (1.0 - damping) / nN + damping * (dangScaled / Scale) / nN
      ranks = nodes.map(n =>
        n -> (base + damping * (msums.getOrElse(n, 0L) / Scale))).toMap
    }
    ranks
  }
}
