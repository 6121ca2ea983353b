package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Pins the streaming-CMS contract: union-summed cells equal batch-mode
  * cells over the whole stream, estimates never under-count, replay is
  * bit-identical, and compaction preserves every estimate while
  * shrinking the ledger. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private val probes = Seq("alpha", "beta", "gamma").toDF("w")

  private def estMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("cells accumulate across batches; replay no-op; compact preserves estimates") {
    val idx = tmpDir("shh-idx")

    val e0 = estMap(StreamingHeavyHitters.processBatch(
      docs((1L, "alpha beta alpha"), (2L, "beta gamma")), 0L, "text",
      probes, "w", idx).select("w", "cms_est"))
    assert(e0("alpha") >= 2L && e0("beta") >= 2L && e0("gamma") >= 1L)

    val e1 = estMap(StreamingHeavyHitters.processBatch(
      docs((3L, "alpha alpha alpha")), 1L, "text",
      probes, "w", idx).select("w", "cms_est"))
    assert(e1("alpha") >= 5L, s"cumulative alpha count: ${e1("alpha")}")
    assert(e1("beta") === e0("beta") && e1("gamma") === e0("gamma"))

    // ledger == batch-mode cells over the union
    val ledger = spark.read.parquet(s"$idx/cells")
      .groupBy("r", "b").agg(sum("c").as("c")).orderBy("r", "b").collect().toSeq
    val wc = docs((1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "alpha alpha alpha"))
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val direct = Sketches.cmsCells(wc, "w", "c").orderBy("r", "b").collect().toSeq
    assert(ledger === direct)

    // replay batch 1: same estimates, same ledger
    val e1b = estMap(StreamingHeavyHitters.processBatch(
      docs((3L, "alpha alpha alpha")), 1L, "text",
      probes, "w", idx).select("w", "cms_est"))
    assert(e1b === e1)
    val ledger2 = spark.read.parquet(s"$idx/cells")
      .groupBy("r", "b").agg(sum("c").as("c")).orderBy("r", "b").collect().toSeq
    assert(ledger2 === ledger, "replay must not double-count")

    // compact batches < 2 into the base; estimates identical, absorbed
    // delta partitions really gone, base committed via the pointer
    StreamingHeavyHitters.compact(spark, idx, belowBatch = 2L)
    val ptr = BatchLedger.pointer(idx, StreamingHeavyHitters.CellsPointerKey)
    assert(ptr.exists(_._2 == 2L), s"pointer must commit horizon 2: $ptr")
    val ledger3 = BatchLedger.read(spark, idx, "cells",
      StreamingHeavyHitters.CellsPointerKey, None,
      empty = spark.emptyDataFrame)
      .groupBy("r", "b").agg(sum("c").as("c")).orderBy("r", "b").collect().toSeq
    assert(ledger3 === ledger, "compaction must preserve the cell sums")
    val liveDirs = new java.io.File(s"$idx/cells").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(liveDirs.isEmpty, s"absorbed delta partitions must be swept: $liveDirs")

    // a batch after compaction keeps accumulating on top of the base
    val e2 = estMap(StreamingHeavyHitters.processBatch(
      docs((4L, "gamma gamma")), 2L, "text",
      probes, "w", idx).select("w", "cms_est"))
    assert(e2("gamma") === e1("gamma") + 2L)
  }
}
