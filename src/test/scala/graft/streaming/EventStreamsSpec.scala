package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {

  private def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))

  test("tumbling window with watermark: finalized windows emitted, late rows dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = EventStreams.tumblingCounts(events, "1 minute", "30 seconds")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()

    val base = 1700000000L
    mem.addData((ts(base + 10), "click", 1.0), (ts(base + 20), "click", 2.0),
      (ts(base + 70), "view", 5.0))
    q.processAllAvailable()
    // advance watermark far past the first window, then send a too-late row
    mem.addData((ts(base + 600), "view", 1.0))
    q.processAllAvailable()
    mem.addData((ts(base + 5), "click", 99.0)) // late beyond watermark: dropped
    q.processAllAvailable()
    mem.addData((ts(base + 1200), "view", 1.0)) // flush remaining windows
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT * FROM tumbling").collect()
      .map(r => (r.getAs[Timestamp]("bucket").toInstant.getEpochSecond,
        r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    // first window finalized with ONLY the two on-time clicks
    val first = out.filter(o => o._1 == (base - base % 60) && o._2 == "click")
    assert(first.length == 1)
    assert(first.head._3 == 2 && first.head._4 == 3.0)
  }

  test("mapGroupsWithState: running per-user state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.userRunningState(mem.toDS())
      .writeStream.format("memory").queryName("userstate")
      .outputMode(OutputMode.Update()).start()

    mem.addData(
      EventStreams.UserEvent(1, ts(100), "a", 1.0),
      EventStreams.UserEvent(1, ts(200), "b", 2.0),
      EventStreams.UserEvent(2, ts(150), "x", 5.0))
    q.processAllAvailable()
    mem.addData(EventStreams.UserEvent(1, ts(300), "c", 3.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql("SELECT * FROM userstate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    // last update for user 1 reflects all three events
    val u1 = rows.filter(_._1 == 1).maxBy(_._2)
    assert(u1 == ((1L, 3L, "c", 6.0)))
    val u2 = rows.filter(_._1 == 2).maxBy(_._2)
    assert(u2 == ((2L, 1L, "x", 5.0)))
  }

  test("sliding windows overlap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.slidingCounts(
      mem.toDF().toDF("ts", "event_type", "value"), "2 minutes", "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append()).start()
    val base = 1700000000L - 1700000000L % 60
    mem.addData((ts(base + 30), "click", 1.0))
    q.processAllAvailable()
    mem.addData((ts(base + 1000), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val buckets = spark.sql("SELECT bucket FROM sliding WHERE event_type = 'click'")
      .collect().map(_.getAs[Timestamp](0).toInstant.getEpochSecond).sorted
    assert(buckets.length == 2) // the event lands in two overlapping windows
    assert(buckets(1) - buckets(0) == 60)
  }

  test("intervalJoin: in-window pairs emit, out-of-window and wrong-key do not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.intervalJoin(
      imps.toDF().toDF("ts", "user_id", "imp_id"),
      clicks.toDF().toDF("ts", "user_id", "click_id"),
      key = "user_id", within = "30 SECONDS", lateness = "10 seconds")
      .select(col("imp_id"), col("click_id"))
      .writeStream.format("memory").queryName("ivjoin")
      .outputMode(OutputMode.Append()).start()

    val base = 1700000000L
    imps.addData((ts(base), 1L, "i1"), (ts(base), 2L, "i2"))
    clicks.addData(
      (ts(base + 10), 1L, "c-in"), // within 30s, same user → joins
      (ts(base + 90), 1L, "c-late"), // past the window → no pair
      (ts(base + 5), 3L, "c-other")) // no matching impression
    q.processAllAvailable()
    q.stop()

    val pairs = spark.sql("SELECT imp_id, click_id FROM ivjoin").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("i1", "c-in")))
  }

  test("dedupWithinWatermark: in-horizon duplicates dropped, state reclaimed past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val docs = mem.toDF().toDF("ts", "digest", "body")
    val q = EventStreams.dedupWithinWatermark(docs, Seq("digest"), "ts", "1 minute")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()

    val base = 1700000000L
    mem.addData((ts(base), "d1", "first copy"), (ts(base + 5), "d1", "dup same batch"),
      (ts(base + 10), "d2", "other doc"))
    q.processAllAvailable()
    // cross-batch duplicate inside the horizon: dropped
    mem.addData((ts(base + 20), "d1", "dup next batch"))
    q.processAllAvailable()
    // advance the watermark far past d1's state, then re-send the digest:
    // state was reclaimed, so it is admitted again (bounded-state contract)
    mem.addData((ts(base + 600), "d3", "mover"))
    q.processAllAvailable()
    mem.addData((ts(base + 610), "d1", "reappears past horizon"))
    q.processAllAvailable()
    q.stop()

    val bodies = spark.sql("SELECT body FROM dedup").collect().map(_.getString(0)).toSet
    assert(bodies.contains("first copy") && bodies.contains("other doc"))
    assert(!bodies.contains("dup same batch") && !bodies.contains("dup next batch"))
    assert(bodies.contains("reappears past horizon"),
      "state for keys older than the watermark must be reclaimed")
  }

  test("funnelProgress: stages advance across batches, order enforced, no rewind") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.funnelProgress(mem.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Update()).start()

    // batch 1: u1 view→click; u2 clicks BEFORE any view (must not count);
    // u3 completes everything in one batch (order within batch sorted)
    mem.addData(
      EventStreams.UserEvent(1, ts(100), "view", 0),
      EventStreams.UserEvent(1, ts(200), "click", 0),
      EventStreams.UserEvent(2, ts(100), "click", 0),
      EventStreams.UserEvent(3, ts(300), "purchase", 0),
      EventStreams.UserEvent(3, ts(100), "view", 0),
      EventStreams.UserEvent(3, ts(200), "click", 0))
    q.processAllAvailable()
    // batch 2: u1 purchases (completes cross-batch); u2 finally views —
    // stage 1 only, the earlier click stays unconsumed
    mem.addData(
      EventStreams.UserEvent(1, ts(400), "purchase", 0),
      EventStreams.UserEvent(2, ts(200), "view", 0))
    q.processAllAvailable()
    q.stop()

    val last = spark.sql("SELECT * FROM funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)), Option(r.getTimestamp(4))))
      .groupBy(_._1).view.mapValues(_.last).toMap
    assert(last(1L)._2 == 3 && last(1L)._5.contains(ts(400)), "u1 completes across batches")
    assert(last(2L)._2 == 1 && last(2L)._4.isEmpty,
      "a click before the first view never counts; no rewind to consume it")
    assert(last(3L) == ((3L, 3, Some(ts(100)), Some(ts(200)), Some(ts(300)))),
      "in-batch events are processed in time order")
  }

  test("funnelStep: a timed-out user is EVICTED and emits its final standing") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val standing = EventStreams.FunnelProgress(7L, 2, Some(ts(100)), Some(ts(200)), None)
    val timedOut = TestGroupState.create[EventStreams.FunnelProgress](
      Optional.of(standing), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], true)
    val out = EventStreams.funnelStep("view", "click", "purchase",
      GroupStateTimeout.ProcessingTimeTimeout)(7L, Iterator.empty, timedOut)
    assert(out == standing, "the final standing is emitted on timeout")
    assert(timedOut.isRemoved, "state is evicted, not re-registered")
    // the live path still updates state and re-arms the timeout
    val live = TestGroupState.create[EventStreams.FunnelProgress](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], false)
    EventStreams.funnelStep("view", "click", "purchase",
      GroupStateTimeout.ProcessingTimeTimeout)(
      8L, Iterator(EventStreams.UserEvent(8L, ts(100), "view", 0)), live)
    assert(live.isUpdated && !live.isRemoved)
    assert(live.getTimeoutTimestampMs.isPresent, "timeout re-armed for the live user")
  }

  test("funnelProgress: random-corpus parity with the batch greedy fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "error")
    val events = (0 until 300).map { i =>
      EventStreams.UserEvent(rnd.nextInt(20).toLong, ts(rnd.nextInt(5000).toLong),
        types(rnd.nextInt(types.length)), 0.0)
    }
    // the streaming contract is per-user in-order arrival across batches:
    // sort globally, split into consecutive micro-batches
    val ordered = events.sortBy(_.ts.getTime)
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.funnelProgress(mem.toDS())
      .writeStream.format("memory").queryName("funnelpar")
      .outputMode(OutputMode.Update()).start()
    ordered.grouped(100).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.sql("SELECT * FROM funnelpar").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.last._2).toMap
    // batch model: greedy earliest chain per user over the full history
    val expect = ordered.groupBy(_.user_id).view.mapValues { evs =>
      var (t1, t2, t3) = (Option.empty[Long], Option.empty[Long], Option.empty[Long])
      evs.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        if (t1.isEmpty && e.event_type == "view") t1 = Some(t)
        else if (t1.nonEmpty && t2.isEmpty && e.event_type == "click" && t > t1.get) t2 = Some(t)
        else if (t2.nonEmpty && t3.isEmpty && e.event_type == "purchase" && t > t2.get) t3 = Some(t)
      }
      if (t3.nonEmpty) 3 else if (t2.nonEmpty) 2 else if (t1.nonEmpty) 1 else 0
    }.toMap
    assert(streamed == expect,
      "incremental streaming state must equal the batch greedy fold under in-order arrival")
  }

  test("session windows: gap closes sessions, cross-batch merge, batch-twin parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val q = EventStreams.sessionAgg(
      mem.toDF().toDF("ts", "user_id", "value"), "30 minutes", "10 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    val base = 1700000000L
    // user 1 session A opens; user 2 session opens
    mem.addData((ts(base), 1L, 1.0), (ts(base + 100), 2L, 7.0))
    q.processAllAvailable()
    // next micro-batch EXTENDS user 1's open session (10 min later),
    // then a 45-min gap starts session B
    mem.addData((ts(base + 600), 1L, 2.0), (ts(base + 600 + 2700), 1L, 4.0))
    q.processAllAvailable()
    // advance the watermark far past everything: all sessions finalize
    mem.addData((ts(base + 100000), 9L, 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT * FROM sessions WHERE user_id < 9").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toInstant.getEpochSecond,
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(out == Set(
      (1L, base, 2L, 3.0),            // cross-batch merge: 2 events, one session
      (1L, base + 3300, 1L, 4.0),     // opened by the 45-min gap
      (2L, base + 100, 1L, 7.0)))

    // batch twin (h3_session_agg's gaps-and-islands) over the same rows
    // produces the identical session set
    import org.apache.spark.sql.expressions.Window
    val rows = Seq((ts(base), 1L, 1.0), (ts(base + 100), 2L, 7.0),
      (ts(base + 600), 1L, 2.0), (ts(base + 3300), 1L, 4.0))
      .toDF("ts", "user_id", "value")
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val batch = rows
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"),
        sum("value").as("sum_value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toInstant.getEpochSecond,
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(batch == out, "streaming sessions must equal the batch gaps-and-islands")
  }
}
