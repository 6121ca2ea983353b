package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: latest-at-or-before per key, strict variant,
  * unmatched-left nulls, equal-time ties, and a relational twin. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def l(rows: (Long, Long, Long)*) = rows.toDF("id", "k", "t")
  private def r(rows: (Long, Long, String)*) = rows.toDF("k", "t", "v")
    .select(col("k"), col("t"), col("v"))

  test("latest at-or-before per key; unmatched stays null") {
    val left = l((1L, 10L, 5L), (2L, 10L, 20L), (3L, 10L, 2L), (4L, 99L, 50L))
    val right = r((10L, 3L, "a"), (10L, 5L, "b"), (10L, 15L, "c"), (77L, 1L, "x"))
    val out = AsOfJoin.asofJoinLeft(left, right, Seq("k"), "t", "t", Seq("v"))
      .collect().map(row => row.getLong(0) -> Option(row.getString(3))).toMap
    assert(out(1L) == Some("b"), "t=5 sees the equal-time right (inclusive)")
    assert(out(2L) == Some("c"), "t=20 sees the latest of 3,5,15")
    assert(out(3L) == None, "t=2 precedes every right row")
    assert(out(4L) == None, "key 99 has no right rows")
  }

  test("tolerance variant: stale matches null out, fresh and equal-time matches survive") {
    val left = l((1L, 10L, 5L), (2L, 10L, 100L), (3L, 10L, 8L))
    val right = r((10L, 5L, "a"), (10L, 7L, "b"))
    val out = AsOfJoin.asofJoinLeftTolerance(left, right, Seq("k"), "t", "t",
        Seq("v"), toleranceSec = 3L)
      .collect().map(row => row.getLong(0) -> Option(row.getString(3))).toMap
    assert(out(1L) == Some("a"), "equal-time match has age 0: kept")
    assert(out(2L) == None, "t=100 matches t=7 but age 93 > 3: nulled, row kept (LEFT)")
    assert(out(3L) == Some("b"), "age 1 within tolerance")
  }

  test("strict variant excludes the equal-time right row") {
    val left = l((1L, 10L, 5L))
    val right = r((10L, 3L, "a"), (10L, 5L, "b"))
    val out = AsOfJoin.asofJoinLeft(left, right, Seq("k"), "t", "t", Seq("v"),
      strict = true).head().getString(3)
    assert(out == "a", "strict: right.t < left.t only")
  }

  test("equal-time right ties resolve to the last payload in ascending order") {
    val left = l((1L, 10L, 9L))
    val right = r((10L, 7L, "m"), (10L, 7L, "z"), (10L, 7L, "a"))
    val out = AsOfJoin.asofJoinLeft(left, right, Seq("k"), "t", "t", Seq("v"))
      .head().getString(3)
    assert(out == "z", "deterministic: max payload among equal times")
  }

  test("null keys never match (SQL semantics), even against null-key rights") {
    val left = Seq((1L, Option.empty[Long], 10L), (2L, Some(7L), 10L))
      .toDF("id", "k", "t")
    val right = Seq((Option.empty[Long], 5L, "nul"), (Some(7L), 5L, "ok"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asofJoinLeft(left, right, Seq("k"), "t", "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out(1L) == None, "a null key matches nothing")
    assert(out(2L) == Some("ok"))
  }

  test("internal-name collisions are rejected loudly") {
    val left = Seq((1L, 2L, 3L)).toDF("id", "k", "_side")
    val right = Seq((2L, 1L, "v")).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException](
      AsOfJoin.asofJoinLeft(left, right, Seq("k"), "_side", "t", Seq("v")))
    assert(e.getMessage.contains("_side"))
  }

  test("a matched right row's NULL payload is returned, not an older row's value") {
    val left = l((1L, 10L, 20L))
    val right = Seq((10L, 3L, Some("old")), (10L, 15L, Option.empty[String]))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asofJoinLeft(left, right, Seq("k"), "t", "t", Seq("v"))
      .head()
    assert(out.isNullAt(3), "latest right row has v=null; must NOT fall back to t=3's 'old'")
  }

  test("multi-payload columns always come from the SAME right row") {
    // latest right row has (a=null, b="B2"); an older row has (a="A1", b=null).
    // Per-column carry would stitch ("A1", "B2") from two different rows.
    val left = l((1L, 10L, 20L))
    val right = Seq(
        (10L, 3L, Some("A1"), Option.empty[String]),
        (10L, 15L, Option.empty[String], Some("B2")))
      .toDF("k", "t", "a", "b")
    val out = AsOfJoin.asofJoinLeft(left, right, Seq("k"), "t", "t", Seq("a", "b"))
      .head()
    assert(out.isNullAt(3) && out.getString(4) == "B2",
      "both payloads must come from the t=15 row: (null, B2)")
  }

  test("sliced form equals the plain form on random data, all slice widths") {
    val rnd = new scala.util.Random(91)
    // hot key 0 takes ~70% of rows; payloads include nulls
    def key() = if (rnd.nextInt(10) < 7) 0L else rnd.nextInt(5).toLong + 1
    val left = (0 until 500).map(i => (i.toLong, key(), rnd.nextInt(1000).toLong))
      .toDF("id", "k", "t")
    val right = (0 until 300).map { i =>
      (key(), rnd.nextInt(1000).toLong,
        if (rnd.nextInt(5) == 0) Option.empty[String] else Some(s"p$i"))
    }.toDF("k", "t", "v")
    for (strict <- Seq(false, true); w <- Seq(1L, 7L, 100L, 1000000L)) {
      val plain = AsOfJoin.asofJoinLeft(left, right, Seq("k"), "t", "t", Seq("v"), strict)
        .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toMap
      val sliced = AsOfJoin.asofJoinLeftSliced(left, right, Seq("k"), "t", "t", Seq("v"),
        sliceWidth = w, strict = strict)
        .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toMap
      assert(sliced == plain, s"strict=$strict sliceWidth=$w")
    }
  }

  test("sliced form: carry-in crosses empty slices; null keys still never match") {
    val left = Seq((1L, Some(10L), 950L), (2L, Option.empty[Long], 950L)).toDF("id", "k", "t")
    val right = Seq((Some(10L), 3L, "early"), (Option.empty[Long], 900L, "nul"))
      .toDF("k", "t", "v")
    // sliceWidth 10: the right row sits ~94 empty slices before the left row
    val out = AsOfJoin.asofJoinLeftSliced(left, right, Seq("k"), "t", "t", Seq("v"), 10L)
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out(1L) == Some("early"), "boundary carry must cross all empty slices")
    assert(out(2L) == None, "null keys never match in the sliced form either")
  }

  test("matches a relational max-per-left twin on random data") {
    val rnd = new scala.util.Random(77)
    val left = (0 until 300).map(i => (i.toLong, (rnd.nextInt(8)).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "k", "t")
    val right = (0 until 200).map(i => ((rnd.nextInt(8)).toLong, rnd.nextInt(1000).toLong, s"p$i"))
      .toDF("k", "t", "v")
      // unique (k, t) so the twin's argmax is unambiguous
      .groupBy("k", "t").agg(max("v").as("v"))
    val got = AsOfJoin.asofJoinLeft(left, right, Seq("k"), "t", "t", Seq("v"))
      .collect().map(row => row.getLong(0) -> Option(row.getString(3))).toMap
    val twin = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.id"))
      .agg(max(struct(col("r.t"), col("r.v"))).as("m"))
      .select(col("id"), col("m.v").as("v"))
      .collect().map(row => row.getLong(0) -> Option(row.getString(1))).toMap
    assert(got == twin)
  }
}
