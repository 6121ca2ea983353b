package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adaptive RECRAWL scheduling — the policy side of the conditional-
  * fetch machinery ([[graft.streaming.StreamingCrawl]] classifies 304
  * Not Modified; this decides when to ask again): per URL, estimate
  * the change rate from the observed fetch history and size the next
  * revisit interval inversely to it — pages that change every fetch
  * get short intervals, pages that never change back off toward the
  * cap (the Cho/Garcia-Molina freshness-driven revisit family, in its
  * engine-portable integer form).
  *
  * Shape at 100 TB: ONE partial-agg groupBy over the history — counts,
  * a conditional sum, and a max, all map-side combinable; the interval
  * arithmetic is a per-group projection. No window, no join, no
  * second pass. */
object Recrawl {

  /** Per-URL revisit plan from a fetch-history frame: `seqCol` is the
    * logical fetch time (ms or any monotonic clock), `changedCol` is
    * whether that fetch observed NEW content (a 200 with a fresh
    * digest ⇒ true; a 304 or an identical digest ⇒ false).
    *
    * `interval = clamp(baseMs · 2·n_obs / (2·n_changed + 1))` — the
    * smoothed inverse change-rate (the +1 keeps never-changed pages
    * finite and the ×2 centers a changes-every-time page at ~baseMs);
    * floor division, so the DuckDB oracle replays it with `//`.
    * Returns `(url, n_obs, n_changed, last_fetch, interval_ms,
    * next_due_ms)`. */
  def schedule(history: DataFrame, urlCol: String, seqCol: String,
               changedCol: String, baseMs: Long = 1000L,
               minMs: Long = 500L, maxMs: Long = 86400000L): DataFrame =
    scheduleFromAggregates(
      history.groupBy(col(urlCol).as("url"))
        .agg(count(lit(1)).cast("long").as("n_obs"),
          sum(when(col(changedCol), 1L).otherwise(0L)).cast("long").as("n_changed"),
          max(col(seqCol)).cast("long").as("last_fetch")),
      baseMs, minMs, maxMs)

  /** The interval arithmetic over PRE-AGGREGATED per-URL observation
    * counts `(url, n_obs, n_changed, last_fetch)` — the entry point for
    * ledger-backed planners ([[graft.streaming.StreamingCrawl
    * .requestPlan]] folds its observations ledger straight into this
    * shape: a 100 TB crawl cannot keep raw fetch HISTORY around, but
    * per-URL counts are exactly what the smoothing needs and they sum
    * associatively across batches). */
  def scheduleFromAggregates(agg: DataFrame, baseMs: Long = 1000L,
                             minMs: Long = 500L,
                             maxMs: Long = 86400000L): DataFrame = {
    require(baseMs > 0 && minMs > 0 && maxMs >= minMs, "need sane interval bounds")
    val interval: Column = least(lit(maxMs), greatest(lit(minMs),
      floor(lit(baseMs) * col("n_obs") * 2 / (col("n_changed") * 2 + 1))))
    agg
      .withColumn("interval_ms", interval.cast("long"))
      .withColumn("next_due_ms", (col("last_fetch") + col("interval_ms")).cast("long"))
  }

  /** Sitemap `changefreq` → nominal cadence in ms (the sitemaps.org
    * vocabulary). `always` means "as fast as politeness allows" (the
    * scheduler's own floor); `never` maps to 4× the cap so the derived
    * declared window pins the interval AT the cap. */
  def freqMs(minMs: Long, maxMs: Long): Map[String, Long] = Map(
    "always" -> minMs,
    "hourly" -> 3600000L,
    "daily" -> 86400000L,
    "weekly" -> 604800000L,
    "monthly" -> 2592000000L,
    "yearly" -> 31536000000L,
    "never" -> maxMs * 4)

  /** Recrawl hints derived from a FEED — the announcement channel's
    * contribution to the planner: a feed that lists many entries
    * publishes fast, and a page's POSITION in the feed is its
    * freshness. Pinned mapping (documented, not guessed — wrong pins
    * are observable as schedule shifts, never crashes):
    *
    *   - cadence from the feed's entry count: ≥ 4 entries → `hourly`,
    *     exactly 3 → `daily`, fewer → `weekly`;
    *   - priority from position: `pri10 = max(0, 10 − 2·entry_idx)`
    *     (the freshest announcement schedules tightest).
    *
    * Output is the `(url, changefreq, pri10)` shape
    * [[scheduleWithHints]] consumes; hints for URLs outside the fetch
    * history drop in its left join (a feed announcing a page we never
    * fetched is frontier input, not recrawl input). */
  def hintsFromFeedEntries(entries: org.apache.spark.sql.DataFrame,
                           urlCol: String, idxCol: String,
                           nEntriesCol: String): org.apache.spark.sql.DataFrame =
    entries.select(col(urlCol).as("url"),
      when(col(nEntriesCol) >= 4, "hourly")
        .when(col(nEntriesCol) === 3, "daily")
        .otherwise("weekly").as("changefreq"),
      greatest(lit(0L), lit(10L) - col(idxCol).cast("long") * 2).as("pri10"))

  /** [[schedule]] blended with DECLARED sitemap hints — the two
    * signals a real recrawl planner holds: the site's `changefreq` /
    * `priority` declaration bounds the interval, the observed change
    * history adapts within that window.
    *
    * `hints` columns: `(url, changefreq, pri10)` — changefreq a
    * sitemaps.org keyword (unknown/null ⇒ unhinted), pri10 the
    * priority in integer TENTHS (0..10; null ⇒ 5, the sitemaps.org
    * default) so the whole blend stays in exact integer arithmetic
    * the oracle replays with floor division.
    *
    * Window per hinted URL, cadence c = freqMs(changefreq):
    *   lo = max(minMs, min(maxMs, c / 4))
    *   hi = max(lo, (min(maxMs, c * 4) * 10) / (pri10 + 5))
    * — a page may come due 4× faster or 4× slower than declared
    * (declarations lie, observations correct them), and priority
    * scales the slack: priority 1.0 tightens the ceiling to ~2/3,
    * priority 0.0 doubles it. `interval = clamp(adaptive, lo, hi)`;
    * unhinted URLs keep the pure adaptive interval. Output adds the
    * `changefreq` column (null ⇒ unhinted) to the [[schedule]] shape.
    *
    * Hints are UNTRUSTED sitemap data: `pri10` clamps to [0, 10]
    * before entering the arithmetic (a hostile −5 would divide by
    * zero, more-negative values would invert the ceiling, >10 would
    * silently tighten past the documented priority-1.0 bound), and
    * duplicate hint rows for one URL collapse deterministically —
    * max pri10, lexicographically-first changefreq keyword — so one
    * URL never schedules twice. */
  def scheduleWithHints(history: DataFrame, urlCol: String, seqCol: String,
                        changedCol: String, hints: DataFrame,
                        baseMs: Long = 1000L, minMs: Long = 500L,
                        maxMs: Long = 86400000L): DataFrame = {
    val sched = schedule(history, urlCol, seqCol, changedCol, baseMs, minMs, maxMs)
    val fm = freqMs(minMs, maxMs)
    val h = hints.select(col("url"),
      col("changefreq").cast("string").as("changefreq"),
      greatest(lit(0L), least(lit(10L),
        coalesce(col("pri10").cast("long"), lit(5L)))).as("_pri"))
      .groupBy("url")
      .agg(min(col("changefreq")).as("changefreq"), max(col("_pri")).as("_pri"))
    val cadence = fm.foldLeft(lit(null).cast("long")) { case (acc, (k, v)) =>
      when(col("changefreq") === k, lit(v)).otherwise(acc)
    }
    sched.join(h, Seq("url"), "left_outer")
      .withColumn("_c", cadence)
      // unknown keyword ⇒ unhinted: surface the null so the output says so
      .withColumn("changefreq", when(col("_c").isNull, lit(null).cast("string"))
        .otherwise(col("changefreq")))
      .withColumn("_lo", when(col("_c").isNull, lit(minMs))
        .otherwise(greatest(lit(minMs), least(lit(maxMs), floor(col("_c") / 4)))))
      .withColumn("_hi", when(col("_c").isNull, lit(maxMs))
        .otherwise(greatest(col("_lo"),
          floor(least(lit(maxMs), col("_c") * 4) * 10 / (col("_pri") + 5)))))
      .withColumn("interval_ms",
        greatest(col("_lo"), least(col("_hi"), col("interval_ms"))).cast("long"))
      .withColumn("next_due_ms", (col("last_fetch") + col("interval_ms")).cast("long"))
      .drop("_c", "_lo", "_hi", "_pri")
  }

  /** The REQUEST side of conditional fetching — the piece that makes a
    * revisit cheap: join the due slice of a [[schedule]] with the
    * stored validator ledger (ETag / Last-Modified captured at
    * admission, [[graft.streaming.StreamingCrawl]]'s `validators/`
    * sub-ledger) and emit per due URL the If-None-Match /
    * If-Modified-Since headers the fetcher should send. A URL with
    * either validator plans a `conditional` request (the server can
    * answer 304 and the archive keeps a revisit record instead of
    * bytes); a URL with neither plans `unconditional` — still due,
    * just not discountable.
    *
    * `validators` columns: `(url, etag, last_modified)`, both value
    * columns nullable. Scale: the due slice is revisit-window-sized
    * while the validator ledger is corpus-sized — the streaming loop
    * reads the ledger through the gated-probe discipline
    * ([[graft.streaming.BatchLedger.gatedProbe]]); this batch operator
    * states the join declaratively and lets AQE pick the build side. */
  def conditionalPlan(schedule: DataFrame, validators: DataFrame,
                      nowMs: Long): DataFrame = {
    val due = schedule.filter(col("next_due_ms") <= nowMs)
    val v = validators.select(col("url"), col("etag"), col("last_modified"))
    due.join(v, Seq("url"), "left_outer")
      .select(col("url"), col("next_due_ms"),
        when(col("etag").isNotNull || col("last_modified").isNotNull,
          "conditional").otherwise("unconditional").as("mode"),
        col("etag").as("if_none_match"),
        col("last_modified").as("if_modified_since"))
  }
}
