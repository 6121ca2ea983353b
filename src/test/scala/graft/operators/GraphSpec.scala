package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgeFixture: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(13)
    // every node links the hub, plus random noise edges among the rest
    val toHub = (2L to 30L).map(s => (s, 1L))
    val noise = (1 to 60).map { _ =>
      (2L + rnd.nextInt(29), 2L + rnd.nextInt(29))
    }.filter(p => p._1 != p._2).map { case (s, d) => (s, d) }
    (toHub ++ noise :+ ((1L, 2L))).distinct
  }

  test("pageRank: distributed ≡ sequential twin bit-for-bit, any partitioning") {
    val edges = edgeFixture
    val df = edges.toDF("src", "dst")
    // driverEdgeLimit = 0 forces the distributed loop (the default gate
    // would route this fixture through the driver twin)
    val a = Graph.pageRank(df.repartition(1), "src", "dst", iters = 3,
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(df.repartition(11), "src", "dst", iters = 3,
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val local = Graph.pageRankLocal(edges, iters = 3)
    assert(a == b, "partitioning must not change a single bit")
    assert(a == local, "distributed must equal the sequential twin exactly")
    // the size-gated driver path (the default) must agree bit-for-bit
    val gated = Graph.pageRank(df, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gated == a, "driver-gated path must equal the distributed loop")
  }

  test("pageRank: mass conserves to quantization error and the hub outranks") {
    val edges = edgeFixture
    val ranks = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val total = ranks.values.sum
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass must stay ~1 (got $total)")
    val others = ranks.filterNot(_._1 == 1L).values
    assert(ranks(1L) > others.max, "the in-degree hub must outrank every other node")
  }

  test("hits: distributed ≡ sequential twin; both sides L1-normalize to ~1") {
    val edges = edgeFixture
    val out = Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters = 2,
        driverEdgeLimit = 0L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val outRep = Graph.hits(edges.toDF("src", "dst").repartition(9), "src", "dst",
        iters = 2, driverEdgeLimit = 0L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out == outRep, "partitioning must not change a bit")
    // the size-gated driver path (the default) must agree bit-for-bit
    val gated = Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(gated == out, "driver-gated path must equal the distributed loop")
    val (lh, la) = Graph.hitsLocal(edges, iters = 2)
    assert(out.collect { case (("hub", n), s) => n -> s } == lh)
    assert(out.collect { case (("auth", n), s) => n -> s } == la)
    val hubSum = out.collect { case (("hub", _), s) => s }.sum
    val authSum = out.collect { case (("auth", _), s) => s }.sum
    assert(math.abs(hubSum - 1.0) < 1e-9 && math.abs(authSum - 1.0) < 1e-9)
    // node 1 receives every node's link → top authority
    val topAuth = out.collect { case (("auth", n), s) => (s, n) }.max._2
    assert(topAuth == 1L)
  }

  test("pageRank: dangling-only sinks still receive and redistribute mass") {
    // star into a sink: 2..5 -> 1, node 1 dangling
    val edges = (2L to 5L).map(s => (s, 1L))
    val ranks = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(1L) > ranks(2L), "sink collects the star's mass")
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)
    assert(ranks == Graph.pageRankLocal(edges, iters = 2).toMap)
  }
}
