package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join: containment semantics, exactly-once pair
  * emission across bin boundaries, and a random twin against the plain
  * inequality join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("containment, boundary inclusivity, spans crossing many bins") {
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 99L), (4L, 1000L)).toDF("pid", "t")
    val ivs = Seq((100L, 5L, 10L), (200L, 0L, 2L), (300L, 7L, 950L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.binnedIntervalJoin(pts, ivs, "t", "lo", "hi", binWidth = 8)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 100L), (2L, 100L), (2L, 300L), (3L, 300L)),
      "inclusive bounds; interval 300 spans ~119 bins and matches once per point")
  }

  test("equi keys scope the containment") {
    val pts = Seq((1L, 7L, 5L), (2L, 8L, 5L)).toDF("pid", "k", "t")
    val ivs = Seq((100L, 7L, 0L, 10L)).toDF("iid", "k", "lo", "hi")
    val out = RangeJoin.binnedIntervalJoin(pts, ivs, "t", "lo", "hi", 4L, keys = Seq("k"))
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), "key 8 must not match key 7's interval")
  }

  test("a caller _bin column is rejected instead of silently lost") {
    val pts = Seq((1L, 5L, 9L)).toDF("pid", "t", "_bin")
    val ivs = Seq((100L, 0L, 10L)).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException](
      RangeJoin.binnedIntervalJoin(pts, ivs, "t", "lo", "hi", 4L))
    assert(e.getMessage.contains("_bin"))
  }

  test("an open-ended sentinel interval fails fast with an actionable message") {
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    val ivs = Seq((100L, 0L, Long.MaxValue)).toDF("iid", "lo", "hi")
    val e = intercept[Exception](
      RangeJoin.binnedIntervalJoin(pts, ivs, "t", "lo", "hi", 4L).collect())
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
    assert(msg.contains("bins"), s"expected the bins-per-interval guard, got: $msg")
  }

  test("intervals at the maxBins edge pass; one bin over fails") {
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    // width 1: [0, 9] spans 10 bins — allowed at maxBins=10; [0, 10] is 11
    val ok = Seq((100L, 0L, 9L)).toDF("iid", "lo", "hi")
    assert(RangeJoin.binnedIntervalJoin(pts, ok, "t", "lo", "hi", 1L,
      maxBins = 10L).count() == 1)
    val over = Seq((100L, 0L, 10L)).toDF("iid", "lo", "hi")
    intercept[Exception](
      RangeJoin.binnedIntervalJoin(pts, over, "t", "lo", "hi", 1L,
        maxBins = 10L).collect())
  }

  test("null interval bounds are dropped, not errored") {
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    val ivs = Seq((100L, Some(0L), Option.empty[Long]), (200L, Some(0L), Some(9L)))
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.binnedIntervalJoin(pts, ivs, "t", "lo", "hi", 4L)
      .select("iid").collect().map(_.getLong(0)).toSet
    assert(out == Set(200L), "the null-hi interval matches nothing and raises nothing")
  }

  test("a reversed interval is dropped, not bin-exploded") {
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    // hi < lo: a corrupted/sentinel-swapped row whose negative span
    // passes a naive span guard while sequence(lo, hi) would count DOWN
    // (here across ~2^61 bins); it can never contain a point — drop it
    val ivs = Seq((100L, Long.MaxValue, 0L), (200L, 0L, 9L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.binnedIntervalJoin(pts, ivs, "t", "lo", "hi", 4L)
      .select("iid").collect().map(_.getLong(0)).toSet
    assert(out == Set(200L), "the reversed interval matches nothing and raises nothing")
  }

  test("matches the plain inequality join on random data, several bin widths") {
    val rnd = new scala.util.Random(31)
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(2000).toLong))
      .toDF("pid", "k", "t").localCheckpoint()
    val ivs = (0 until 150).map { i =>
      val lo = rnd.nextInt(2000).toLong
      (i.toLong, rnd.nextInt(6).toLong, lo, lo + rnd.nextInt(300).toLong)
    }.toDF("iid", "k", "lo", "hi").localCheckpoint()
    val plain = pts.join(ivs, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(7L, 64L, 1024L)) {
      val binned = RangeJoin.binnedIntervalJoin(pts, ivs, "t", "lo", "hi", w, keys = Seq("k"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == binned.toSet.size, s"w=$w: no duplicate pairs")
      assert(binned.toSet == plain, s"w=$w: same pair set as the inequality join")
    }
  }
}
