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
}
