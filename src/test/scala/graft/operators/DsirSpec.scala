package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("fixed-point log2 q8 tracks real log2 within 2 quanta and is monotone") {
    val cases = Seq(
      (1L, 1L), (3L, 2L), (2L, 3L), (1000L, 999L), (999L, 1000L),
      (7L, 5L), (123456L, 1013L), (1013L, 123456L), (1L, 65536L),
      (1048576L, 3L), (97L, 89L), (89L, 97L))
    val got = cases.toDF("num", "den")
      .transform(df => TextOps.withFixedPointLog2Q8(df, "num", "den", "q8"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (n, d) =>
      val truth = 256.0 * math.log(n.toDouble / d) / math.log(2.0)
      val q = got((n, d))
      assert(math.abs(q - truth) <= 2.0, s"$n/$d: got $q, real $truth")
    }
    // monotone in the ratio: sort by true ratio, scores must not decrease
    val byRatio = cases.sortBy { case (n, d) => n.toDouble / d }.map(got)
    assert(byRatio.zip(byRatio.tail).forall { case (a, b) => a <= b })
  }

  test("fixed-point log2 is exact on powers of two and antisymmetric-ish") {
    val cases = (0 to 10).map(i => (1L << i, 1L)) ++ (1 to 10).map(i => (1L, 1L << i))
    val got = cases.toDF("num", "den")
      .transform(df => TextOps.withFixedPointLog2Q8(df, "num", "den", "q8"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0 to 10).foreach { i => assert(got((1L << i, 1L)) === 256L * i) }
    (1 to 10).foreach { i => assert(got((1L, 1L << i)) === -256L * i) }
  }

  test("importanceScore upweights docs that look like the target") {
    // target docs speak 'alpha beta', raw background speaks 'gamma delta'
    val docs = ((0 until 40).map(i => (i.toLong, "alpha beta alpha beta alpha", true)) ++
      (40 until 200).map(i => (i.toLong, "gamma delta gamma delta gamma", false)) ++
      // held-out probes, not in target: one target-like, one background-like
      Seq((900L, "alpha beta alpha", false), (901L, "gamma delta gamma", false)))
      .toDF("doc_id", "text", "is_t")
    val scored = TextOps.importanceScore(docs, "doc_id", "text", "is_t")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(900L) > 0, s"target-like probe must score positive: ${scored(900L)}")
    assert(scored(901L) < 0, s"background-like probe must score negative: ${scored(901L)}")
    assert(scored(900L) > scored(901L))
  }

  test("importanceScore: empty and null docs score 0 with 0 tokens") {
    val docs = Seq((1L, "alpha beta", true), (2L, "", false), (3L, null, false))
      .toDF("doc_id", "text", "is_t")
    val out = TextOps.importanceScore(docs, "doc_id", "text", "is_t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((0L, 0L)))
    assert(out.size === 3)
  }

  test("merged half-counts score bit-identically to from-scratch; unseen buckets are neutral") {
    val docs = ((0 until 30).map(i => (i.toLong, s"alpha beta word$i", i % 3 == 0)) ++
      (30 until 60).map(i => (i.toLong, s"gamma delta word$i", false)))
      .toDF("doc_id", "text", "is_t")
    val full = TextOps.importanceScore(docs, "doc_id", "text", "is_t")
      .orderBy("doc").collect().toSeq
    val c1 = TextOps.importanceBucketCounts(
      docs.filter(col("doc_id") < 30), "doc_id", "text", "is_t")
    val c2 = TextOps.importanceBucketCounts(
      docs.filter(col("doc_id") >= 30), "doc_id", "text", "is_t")
    val merged = TextOps.importanceScoreFromCounts(docs, "doc_id", "text",
      TextOps.importanceCountsMerge(c1, c2))
      .orderBy("doc").collect().toSeq
    assert(merged === full)

    // a doc whose tokens the stored counts never saw scores 0, not null/drop
    val unseen = TextOps.importanceScoreFromCounts(
      Seq((99L, "totally novel tokens here")).toDF("doc_id", "text"),
      "doc_id", "text", c1)
      .collect().head
    assert(unseen.getLong(1) === 4L && unseen.getLong(2) === 0L)
  }

  test("importanceSelect keeps ceil(permille) docs, boundary over-selects") {
    val scored = Seq((1L, 5L, 30L), (2L, 5L, 20L), (3L, 5L, 20L),
      (4L, 5L, 10L), (5L, 5L, 0L))
      .toDF("doc", "n_tokens", "imp_q8")
    // 40% of 5 = 2 -> cutoff lands on score 20, which TWO docs share ->
    // boundary over-selection keeps 3
    val sel = TextOps.importanceSelect(scored, 400)
      .where(col("selected")).select("doc").collect().map(_.getLong(0)).toSet
    assert(sel === Set(1L, 2L, 3L))
    val none = TextOps.importanceSelect(scored, 0)
    assert(none.where(col("selected")).count() === 0)
    val all = TextOps.importanceSelect(scored, 1000)
    assert(all.where(col("selected")).count() === 5)
  }
}
