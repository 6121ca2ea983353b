package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the adaptive recrawl policy: interval inversely tracks the
  * observed change rate, never-changed pages back off to the cap,
  * always-changing pages sit near base, and both clamps engage. */
class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  test("schedule: intervals track change rate; clamps engage; floor division") {
    val history = Seq(
      // static page: 4 observations, never changed → base*8/1 = 8000
      ("u_static", 0L, false), ("u_static", 10L, false),
      ("u_static", 20L, false), ("u_static", 30L, false),
      // live page: changes every fetch → 1000*8//9 = 888
      ("u_live", 0L, true), ("u_live", 10L, true),
      ("u_live", 20L, true), ("u_live", 30L, true),
      // mixed: 1 change in 4 → 1000*8//3 = 2666
      ("u_mixed", 0L, true), ("u_mixed", 10L, false),
      ("u_mixed", 20L, false), ("u_mixed", 35L, false))
      .toDF("url", "ts", "changed")
    val got = Recrawl.schedule(history, "url", "ts", "changed")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_obs"), r.getAs[Long]("n_changed"),
          r.getAs[Long]("last_fetch"), r.getAs[Long]("interval_ms"),
          r.getAs[Long]("next_due_ms"))).toMap
    assert(got("u_static") == ((4L, 0L, 30L, 8000L, 8030L)))
    assert(got("u_live") == ((4L, 4L, 30L, 888L, 918L)), "floor division, not rounding")
    assert(got("u_mixed") == ((4L, 1L, 35L, 2666L, 2701L)))
    // clamps: a min above the computed live interval lifts it; a max
    // below the static interval caps it
    val clamped = Recrawl.schedule(history, "url", "ts", "changed",
      baseMs = 1000L, minMs = 900L, maxMs = 2000L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("interval_ms")).toMap
    assert(clamped("u_live") == 900L && clamped("u_static") == 2000L)
  }

  test("scheduleWithHints: declared window bounds, priority tightens, unhinted untouched") {
    import spark.implicits._
    // one identical history per url (static: never changes → adaptive
    // hits the cap) so the hint is the ONLY differentiator
    val urls = Seq("u_hourly", "u_hi_pri", "u_lo_pri", "u_never",
      "u_always", "u_unhinted", "u_unknown")
    val history = urls.flatMap(u => (0 until 4).map(i => (u, i * 10L, false)))
      .toDF("url", "ts", "changed")
    val hints = Seq(
      ("u_hourly", "hourly", 5L),
      ("u_hi_pri", "always", 10L),
      ("u_lo_pri", "always", 0L),
      ("u_never", "never", 5L),
      ("u_always", "always", 5L),
      // unknown keyword must behave exactly like no hint at all
      ("u_unknown", "fortnightly", 5L))
      .toDF("url", "changefreq", "pri10")
    val got = Recrawl.scheduleWithHints(history, "url", "ts", "changed", hints)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("interval_ms"), Option(r.getAs[String]("changefreq"))))).toMap
    // static page, adaptive = 1000*8//1 = 8000; the hourly window's
    // FLOOR binds: lo = 3600000/4 = 900000 (declared-hourly pages are
    // not re-fetched every 8 seconds however static they look)
    assert(got("u_hourly") == ((900000L, Some("hourly"))))
    // `always` (c = minMs = 500): hi = 2000*10 // (pri+5); the adaptive
    // cap clamps DOWN to it — priority 1.0 tightens, 0.0 loosens
    assert(got("u_hi_pri") == ((1333L, Some("always"))))
    assert(got("u_lo_pri") == ((4000L, Some("always"))))
    assert(got("u_hi_pri")._1 < got("u_always")._1 &&
      got("u_always")._1 < got("u_lo_pri")._1,
      "higher priority must always mean a tighter ceiling")
    // `never` pins lo = hi = cap
    assert(got("u_never") == ((86400000L, Some("never"))))
    // unhinted and unknown-keyword are byte-identical to plain schedule
    assert(got("u_unhinted") == ((8000L, None)))
    assert(got("u_unknown") == ((8000L, None)),
      "an unknown changefreq keyword must read as unhinted, with a null column")
  }

  test("scheduleWithHints: hostile pri10 clamps to [0,10], duplicate hints collapse") {
    import spark.implicits._
    val urls = Seq("u_neg5", "u_neg9", "u_over", "u_dup")
    val history = urls.flatMap(u => (0 until 4).map(i => (u, i * 10L, false)))
      .toDF("url", "ts", "changed")
    val hints = Seq(
      // −5 would make (pri+5) = 0: division by zero → null hi
      ("u_neg5", "always", -5L),
      // more negative would flip the ceiling's sign
      ("u_neg9", "always", -9L),
      // > 10 would tighten past the documented priority-1.0 bound
      ("u_over", "always", 99L),
      // duplicate rows for one URL: max-pri wins, ONE output row
      ("u_dup", "always", 3L),
      ("u_dup", "always", 10L))
      .toDF("url", "changefreq", "pri10")
    val out = Recrawl.scheduleWithHints(history, "url", "ts", "changed", hints)
    val rows = out.collect()
    assert(rows.length == urls.length, "dup hints must not duplicate schedule rows")
    val got = rows.map(r => r.getString(0) -> r.getAs[Long]("interval_ms")).toMap
    // negatives clamp to 0 → the loosest ceiling (= pri10=0's 4000)
    assert(got("u_neg5") == 4000L)
    assert(got("u_neg9") == 4000L)
    // >10 clamps to 10 → the tightest documented ceiling (= 1333)
    assert(got("u_over") == 1333L)
    // dedup keeps max pri10 = 10
    assert(got("u_dup") == 1333L)
  }
}
