package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Pins the streaming exact-threshold dedup: guaranteed-recall
  * within-batch family collapse, cross-batch rejection against stored
  * SURVIVORS only (a dropped non-canonical never haunts later batches),
  * replay idempotence of probe + append, and the empty-seed cold
  * start. */
class StreamingPrefixDedupSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[String])]) = rows.toDF("id", "toks")
  private def ids(s: org.apache.spark.sql.DataFrame) =
    s.select("id").as[Long].collect().toSet

  private val t = (1 to 10).map(i => s"t$i")

  test("survivors: within-family collapse, cross-batch vs survivors only, replay") {
    val dir = tmpDir("graft-spfx")
    // seed corpus: one stored set the stream will collide with
    Dedup.prefixIndexBuild(
      df(Seq(1L -> Seq("u1", "u2", "u3", "u4", "u5", "u6", "u7", "u8"))),
      "id", "toks", 700, dir)

    // b0: 10 = exact copy of stored 1 (cross-dup, dropped); 11 and 12 a
    // J=9/11≈0.82 within-family (11 wins); 13 unique
    val b0 = df(Seq(
      10L -> Seq("u1", "u2", "u3", "u4", "u5", "u6", "u7", "u8"),
      11L -> t,
      12L -> (t.take(9) :+ "x"),
      13L -> Seq("z1", "z2", "z3", "z4")))
    val s0 = StreamingPrefixDedup.processBatch(b0, 0L, "id", "toks", dir)
    assert(ids(s0) == Set(11L, 13L))
    s0.unpersist(false)

    // b1: 20 = copy of survivor 11 (dropped); 21 ≈ dropped 12
    // (J(21,12)=10/12≈0.83) but vs stored 11 only 9/13≈0.69 < θ — 12
    // never entered the index, so 21 SURVIVES; 22 unique
    val b1 = df(Seq(
      20L -> t,
      21L -> (t.take(9) ++ Seq("x", "y", "z")),
      22L -> Seq("q1", "q2", "q3", "q4", "q5")))
    val s1 = StreamingPrefixDedup.processBatch(b1, 1L, "id", "toks", dir)
    assert(ids(s1) == Set(21L, 22L))
    s1.unpersist(false)

    // replay b1: identical survivors, no duplicated index rows
    val s1r = StreamingPrefixDedup.processBatch(b1, 1L, "id", "toks", dir)
    assert(ids(s1r) == Set(21L, 22L), "replay must reproduce survivors")
    s1r.unpersist(false)
    val stored = spark.read.parquet(s"$dir/sets")
    assert(stored.count() == stored.select("sid").distinct().count(),
      "replayed append must not duplicate index rows")

    // b2: 30 = copy of 21, which IS now a stored survivor — dropped
    val s2 = StreamingPrefixDedup.processBatch(
      df(Seq(30L -> (t.take(9) ++ Seq("x", "y", "z")))), 2L, "id", "toks", dir)
    assert(ids(s2) == Set.empty[Long])
    s2.unpersist(false)
  }

  test("empty-seed cold start + MemoryStream wiring") {
    val dir = tmpDir("graft-spfx-cold")
    val out = tmpDir("graft-spfx-out")
    val ckpt = tmpDir("graft-spfx-ck")
    Dedup.prefixIndexBuild(
      df(Seq.empty[(Long, Seq[String])]), "id", "toks", 800, dir)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[String])]
    val q = StreamingPrefixDedup.attach(mem.toDF().toDF("id", "toks"),
      "id", "toks", dir, out, ckpt)
    try {
      mem.addData(Seq(1L -> t, 2L -> t, 3L -> Seq("a1", "a2", "a3")))
      q.processAllAvailable()
      mem.addData(Seq(4L -> t, 5L -> Seq("b1", "b2", "b3", "b4")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("id"), col("batch").cast("long"))
      .as[(Long, Long)].collect().toSet
    // batch 0: 2 loses to 1 within-batch; batch 1: 4 loses to stored 1
    assert(got == Set((1L, 0L), (3L, 0L), (5L, 1L)))
  }
}
