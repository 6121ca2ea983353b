package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[BatchLedger]]'s failure semantics directly (the crawl /
  * heavy-hitters / prefix-index suites exercise it through their
  * verticals): a poisoned COMMITTED dir must fail the read rather than
  * silently serve empty state, an all-absorbed live dir is legitimately
  * empty, a crash-stranded partition below the old horizon is collected
  * by the next compaction, and a pointer reset returns readers to
  * live-partitions-only. */
class BatchLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val Key = "test.ledger.base"

  private def writeBatch(root: String, batch: Long, rows: Seq[(String, Long)]): Unit =
    rows.toDF("k", "v").withColumn("batch", lit(batch))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(s"$root/led")

  private def readAll(root: String): Set[(String, Long)] =
    BatchLedger.read(spark, root, "led", Key, None,
      empty = Seq.empty[(String, Long)].toDF("k", "v"))
      .select("k", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("read fails loudly on a poisoned committed dir; empty live dir is benign") {
    val root = tmpDir("graft-ledger-poison")
    writeBatch(root, 0L, Seq("a" -> 1L, "b" -> 2L))
    writeBatch(root, 1L, Seq("c" -> 3L))
    val base = BatchLedger.compact(spark, root, "led", Key, belowBatch = 2L)
    assert(readAll(root) == Set("a" -> 1L, "b" -> 2L, "c" -> 3L))
    // an all-absorbed live dir (only _SUCCESS left) must read as empty
    // contribution, not an error — the benign AnalysisException shape
    val liveFiles = new java.io.File(s"$root/led").listFiles()
    assert(liveFiles.forall(!_.getName.startsWith("batch=")),
      "compaction swept the live partitions")
    assert(readAll(root) == Set("a" -> 1L, "b" -> 2L, "c" -> 3L))
    // poison the COMMITTED base: overwrite its parquet files with bytes
    // that are not parquet. A read blip must not silently re-admit the
    // world (crawl) or undercount (heavy-hitters) — it must propagate.
    new java.io.File(base).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        java.nio.file.Files.write(f.toPath, "not a parquet file".getBytes("UTF-8"))
      }
    val e = intercept[Exception] { readAll(root) }
    assert(!e.isInstanceOf[org.apache.spark.sql.AnalysisException],
      s"poisoned committed state must not map to the benign empty-dir shape: $e")
  }

  test("compact collects crash-stranded partitions below the old horizon") {
    val root = tmpDir("graft-ledger-stale")
    writeBatch(root, 0L, Seq("a" -> 1L))
    writeBatch(root, 1L, Seq("b" -> 2L))
    BatchLedger.compact(spark, root, "led", Key, belowBatch = 2L)
    // simulate the first compaction crashing AFTER its pointer commit
    // but BEFORE its sweep: batch=0 reappears on disk. Readers already
    // exclude it (batch < horizon), but without the full below-horizon
    // sweep it would survive every future compaction.
    writeBatch(root, 0L, Seq("a" -> 1L))
    assert(readAll(root) == Set("a" -> 1L, "b" -> 2L),
      "a below-horizon partition is invisible to readers")
    writeBatch(root, 2L, Seq("c" -> 3L))
    BatchLedger.compact(spark, root, "led", Key, belowBatch = 3L)
    val parts = new java.io.File(s"$root/led").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(parts.isEmpty, s"stale below-horizon partition must be swept: $parts")
    assert(readAll(root) == Set("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("resetPointer clears committed state; readers serve live partitions only") {
    val root = tmpDir("graft-ledger-reset")
    writeBatch(root, 0L, Seq("a" -> 1L))
    BatchLedger.compact(spark, root, "led", Key, belowBatch = 1L)
    assert(BatchLedger.pointer(root, Key).isDefined)
    BatchLedger.resetPointer(root, Key)
    assert(BatchLedger.pointer(root, Key).isEmpty, "pointer must read as absent")
    // live dir was swept by the compaction; with no pointer the read is empty
    assert(readAll(root).isEmpty)
    // a fresh rebuild-style write at batch=-1 is now visible (no horizon)
    writeBatch(root, -1L, Seq("z" -> 9L))
    assert(readAll(root) == Set("z" -> 9L))
    // idempotent: resetting an already-clear pointer appends nothing
    val v = new graft.ingest.MetaLog(root).version
    BatchLedger.resetPointer(root, Key)
    assert(new graft.ingest.MetaLog(root).version == v)
  }
}
