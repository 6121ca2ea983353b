package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the continuous near-dup dedup contract: first copy wins across
  * micro-batches, within-batch families collapse to their smallest id,
  * replays are idempotent (batch-partitioned overwrite + `batch <
  * batchId` reads), and the whole thing runs under a real streaming
  * query. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again end"
  private def nearDup(s: String) = s.replace("end", "finish") // high Jaccard
  private val other = "completely different words entirely unrelated content here today now"
  private val third = "yet another fully distinct document about nothing in particular at all"

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("first copy wins across batches; within-batch families collapse; replay is idempotent") {
    val idx = tmpDir("sdedup-idx")

    // batch 0: a near-dup family {1, 2} and a singleton 3
    val s0 = StreamingDedup.processBatch(
      docs((1L, base), (2L, nearDup(base)), (3L, other)), 0L, "doc_id", "text", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s0 == Set(1L, 3L), "family {1,2} keeps 1; 3 unrelated")

    // batch 1: near-dup of batch 0's survivor (drop), near-dup of batch
    // 0's DROPPED doc (still a dup of the family — drop), and a new doc
    val s1 = StreamingDedup.processBatch(
      docs((10L, base), (11L, nearDup(base)), (12L, third)), 1L, "doc_id", "text", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == Set(12L), "10 and 11 lose to batch 0's canonical copy")

    // replay batch 1 (crash-recovery path): same answer, no index double-count
    val s1b = StreamingDedup.processBatch(
      docs((10L, base), (11L, nearDup(base)), (12L, third)), 1L, "doc_id", "text", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s1b == s1, "replay must be idempotent")

    // batch 2: dup of batch 1's survivor — the index accreted batch 1
    val s2 = StreamingDedup.processBatch(
      docs((20L, third), (21L, base)), 2L, "doc_id", "text", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s2 == Set.empty[Long], "20 loses to 12, 21 loses to 1")

    // the index holds exactly the survivors (partition-pruned read)
    val (bands, shd) = StreamingDedup.readIndex(spark, idx)
    assert(bands.select("doc").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L, 12L))
    assert(shd.select("doc").distinct().count() == 3)
  }

  test("end-to-end under a streaming query: survivors land batch-partitioned in outDir") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmpDir("sdedup-idx2")
    val out = tmpDir("sdedup-out")
    val cp = tmpDir("sdedup-cp")
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.attach(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, out, cp)

    mem.addData((1L, base), (2L, other))
    q.processAllAvailable()
    mem.addData((10L, nearDup(base)), (11L, third))
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(out)
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L),
      "10 is a near-dup of batch 0's doc 1 and must not land")
    assert(got.select("batch").distinct().count() == 2)
  }
}
