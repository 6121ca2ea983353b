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
               minMs: Long = 500L, maxMs: Long = 86400000L): DataFrame = {
    require(baseMs > 0 && minMs > 0 && maxMs >= minMs, "need sane interval bounds")
    val interval: Column = least(lit(maxMs), greatest(lit(minMs),
      floor(lit(baseMs) * col("n_obs") * 2 / (col("n_changed") * 2 + 1))))
    history.groupBy(col(urlCol).as("url"))
      .agg(count(lit(1)).cast("long").as("n_obs"),
        sum(when(col(changedCol), 1L).otherwise(0L)).cast("long").as("n_changed"),
        max(col(seqCol)).cast("long").as("last_fetch"))
      .withColumn("interval_ms", interval.cast("long"))
      .withColumn("next_due_ms", (col("last_fetch") + col("interval_ms")).cast("long"))
  }
}
