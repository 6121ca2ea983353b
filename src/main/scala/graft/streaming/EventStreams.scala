package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics operators over an event stream (ts, user_id,
  * event_type, value) — the §2.H surface the reference does NOT have
  * (blockchain rounds are never late, so it needs no watermarks) but a
  * general analytics engine on this substrate does: watermarked tumbling /
  * sliding windows and custom keyed state via mapGroupsWithState.
  */
object EventStreams {

  /** Tumbling-window aggregate with a watermark: late events beyond
    * `lateness` are dropped, window state is reclaimed as the watermark
    * passes (bounded state at any scale). */
  def tumblingCounts(events: DataFrame, windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window variant (windowLen every slide). */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class UserState(user_id: Long, n_events: Long, last_type: String, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user aggregate
    * (count, last event type by time, value total) — the
    * KeyValueGroupedDataset state path for semantics windows can't
    * express.
    *
    * Pass `GroupStateTimeout.ProcessingTimeTimeout` in production so
    * abandoned keys are reclaimable (the state store is unbounded
    * otherwise); with it the engine schedules periodic empty batches to
    * fire timeouts, which keeps `processAllAvailable` from ever settling —
    * so deterministic harnesses use the NoTimeout default. */
  def userRunningState(
      events: Dataset[UserEvent],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](timeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(userId, 0L, "", 0.0))
          val evs = batch.toSeq.sortBy(_.ts.getTime)
          val next =
            if (evs.isEmpty) prev
            else UserState(
              userId,
              prev.n_events + evs.length,
              evs.last.event_type,
              prev.total_value + evs.map(_.value).sum)
          state.update(next)
          if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
            state.setTimeoutDuration("1 hour")
          next
      }
  }

  /** Streaming output mode helper: windowed aggregates with watermark
    * support Append (emit once finalized) — the mode a downstream
    * idempotent sink wants. */
  val FinalizedWindows: OutputMode = OutputMode.Append()

  final case class FunnelProgress(
      user_id: Long, funnel_stage: Int,
      first_view: Option[java.sql.Timestamp],
      first_click: Option[java.sql.Timestamp],
      first_purchase: Option[java.sql.Timestamp])

  /** Streaming twin of the batch `h5_event_funnel` query: per-user
    * ordered step-1 → step-2 → step-3 progress (strictly increasing
    * times, greedy-earliest chain) maintained CONTINUOUSLY in keyed
    * state — each micro-batch advances users' funnels instead of
    * re-folding history. State is one struct of three optional
    * timestamps per user: O(users), not O(events).
    *
    * Greedy state can only move forward, so the incremental result
    * equals the batch fold when each user's events arrive in time order
    * across batches (within a batch they are sorted here); an earlier
    * step-1 arriving AFTER a later one was consumed cannot rewind the
    * chain — the inherent one-pass/streaming trade, worth knowing and
    * spec-pinned. */
  def funnelProgress(events: Dataset[UserEvent],
                     steps: (String, String, String) = ("view", "click", "purchase"),
                     timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val (s1, s2, s3) = steps
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelProgress, FunnelProgress](timeout)(
        funnelStep(s1, s2, s3, timeout))
  }

  /** The per-group state transition of [[funnelProgress]], named so the
    * timeout path is unit-testable with `TestGroupState`. On timeout
    * (idle past the re-armed duration) the user's state is EVICTED —
    * keeping state O(active users), not O(users ever seen) — and the
    * final standing is emitted; a later event for that user starts a
    * fresh funnel. */
  private[graft] def funnelStep(s1: String, s2: String, s3: String,
                                timeout: GroupStateTimeout)(
      userId: Long, batch: Iterator[UserEvent],
      state: GroupState[FunnelProgress]): FunnelProgress =
    if (state.hasTimedOut) {
      val last = state.get
      state.remove()
      last
    } else {
      var cur = state.getOption.getOrElse(FunnelProgress(userId, 0, None, None, None))
      batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
        cur =
          if (cur.first_view.isEmpty && e.event_type == s1)
            cur.copy(funnel_stage = 1, first_view = Some(e.ts))
          else if (cur.first_view.nonEmpty && cur.first_click.isEmpty &&
                   e.event_type == s2 && e.ts.getTime > cur.first_view.get.getTime)
            cur.copy(funnel_stage = 2, first_click = Some(e.ts))
          else if (cur.first_click.nonEmpty && cur.first_purchase.isEmpty &&
                   e.event_type == s3 && e.ts.getTime > cur.first_click.get.getTime)
            cur.copy(funnel_stage = 3, first_purchase = Some(e.ts))
          else cur
      }
      state.update(cur)
      if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
        state.setTimeoutDuration("1 hour")
      cur
    }

  /** Watermarked stream-stream interval join — the impressions⋈clicks
    * shape: match right-stream rows to left-stream rows on `key` when the
    * right event lands within [left.ts, left.ts + within]. Both sides are
    * watermarked, and the time-bound condition lets the engine expire
    * buffered rows once the watermark passes their join window — state is
    * bounded by (arrival rate × (lateness + within)), the requirement for
    * an unbounded run. An un-bounded (equi-only) stream-stream join would
    * buffer both streams forever. Inner join ⇒ results emit as soon as
    * both sides arrive (Append mode). */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      within: String, lateness: String): DataFrame = {
    val l = left.withWatermark("ts", lateness).alias("l")
    val r = right.withWatermark("ts", lateness).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $within"))
  }

  /** Streaming session windows — the streaming twin of the batch
    * gaps-and-islands query (`h3_session_agg`): per-user events closer
    * than `gap` merge into one session; a session finalizes (Append
    * emits) once the watermark passes its end + gap, and its state is
    * reclaimed — open sessions are the ONLY state, so state tracks
    * concurrent users, not history. The batch twin splits on
    * `ts - prev_ts > gap` (inclusive merge at the exact boundary) while
    * session_window's interval is [ts, ts+gap) (exclusive) — identical
    * sessions except for events landing exactly `gap` apart.
    *
    * At a fine gap/slide this replaces the batch plan's two full
    * per-user sort-windows with incremental merge on arrival — the
    * shape to run continuously at corpus scale. */
  def sessionAgg(events: DataFrame, gap: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup with BOUNDED state — the streaming face of
    * `graft.operators.Dedup.exact` for a continuously-arriving corpus:
    * rows whose `keys` match an earlier row within the watermark horizon
    * are dropped, and per-key dedup state older than the horizon is
    * reclaimed. State is therefore bounded by (arrival rate × lateness),
    * not corpus size — a plain streaming dropDuplicates would accrete one
    * state entry per distinct document forever, which is exactly the
    * state-store OOM at 100 TB/day. Key on a content digest
    * (xxhash64/md5 of the normalized text), never the raw document. */
  def dedupWithinWatermark(
      docs: DataFrame, keys: Seq[String], tsCol: String, lateness: String): DataFrame =
    docs
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)
}
