package graft.streaming

import graft.{Fixtures, SparkSpec}
import graft.codec.BlockCodec
import graft.ingest.{BlockIngest, TableStore}
import graft.model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment: each micro-batch joins the stream
  * against ONE pinned store snapshot — a commit landing mid-batch must
  * not tear the enrichment, and the next batch must see it. */
class StreamingEnrichSpec extends SparkSpec {
  import Fixtures._

  private def ingest(store: TableStore, rounds: Range): Unit =
    BlockIngest.applyBlocks(store, spark.createDataset(
      rounds.map(r => BlockCodec.blockToJson(block(r, Vector(pay(A, B, r + 1)),
        delta = LedgerDelta(accounts = Vector(acctUpsert(A, 1000 - r))))))
      )(org.apache.spark.sql.Encoders.STRING))

  test("a commit landing mid-batch cannot tear the enrichment; the next batch sees it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark, tmpDir("graft-enrich"), nBuckets = 4)
    BlockIngest.initGenesis(store, Seq((A, 1000L, "{}"), (B, 0L, "{}")), "enrich-net")
    ingest(store, 0 until 3) // phase 1: rounds 0-2 committed

    val mem = MemoryStream[Long]
    val stream = mem.toDF().toDF("round_ref")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    val trapArmed = new java.util.concurrent.atomic.AtomicBoolean(true)

    val q = StreamingEnrich.enrichEachBatch(stream, store) { (batch, snap) =>
      val headers = snap.read("block_header").select(col("round"), col("realtime"))
      val enriched = batch.join(headers, col("round_ref") === col("round"), "left_outer")
      // the torn-read trap: commit MORE rounds after the snapshot was
      // pinned but BEFORE the (lazy) join plan ever executes. On the
      // first batch this lands rounds 3-5 at the worst possible moment.
      if (trapArmed.getAndSet(false)) ingest(store, 3 until 6)
      enriched
    } { (df, batchId) =>
      val rows = df.select(col("round_ref"), coalesce(col("round"), lit(-1L))).collect()
      rows.foreach(r => results.add((batchId, r.getLong(0), r.getLong(1), 0L)))
    }

    mem.addData(0L, 1L, 2L, 3L, 4L) // refs 3,4 exist only AFTER the mid-batch commit
    q.processAllAvailable()
    mem.addData(3L, 4L, 5L)         // next batch: pinned AFTER the commit
    q.processAllAvailable()
    q.stop()

    val byBatch = results.toArray(Array.empty[(Long, Long, Long, Long)])
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    // batch 0: snapshot pinned before the concurrent commit — refs 0-2
    // enrich, refs 3-4 MUST miss even though the store held them by the
    // time the join executed
    assert(byBatch(0L) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> -1L, 4L -> -1L),
      s"batch 0 tore: ${byBatch(0L)}")
    // batch 1: a fresh pin sees the completed commit
    assert(byBatch(1L) == Map(3L -> 3L, 4L -> 4L, 5L -> 5L),
      s"batch 1 must see the new commit: ${byBatch(1L)}")
  }

  test("two reads of one table in one batch agree (same pinned version)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark, tmpDir("graft-enrich2"), nBuckets = 4)
    BlockIngest.initGenesis(store, Seq((A, 1000L, "{}"), (B, 0L, "{}")), "enrich-net")
    ingest(store, 0 until 2)

    val mem = MemoryStream[Long]
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = StreamingEnrich.enrichEachBatch(mem.toDF().toDF("x"), store) { (batch, snap) =>
      val c1 = snap.read("txn").count()
      ingest(store, 2 until 4) // commit BETWEEN the two reads
      val c2 = snap.read("txn").count()
      counts.add((c1, c2))
      batch
    } { (df, _) => df.count(): Unit }
    mem.addData(1L)
    q.processAllAvailable()
    q.stop()
    val (c1, c2) = counts.peek()
    assert(c1 == c2 && c1 == 2L,
      s"both reads must see the pinned 2 phase-1 txns, got ($c1, $c2)")
    assert(store.read("txn").count() == 4L, "head sees the concurrent commit")
  }
}
