package graft.streaming

import graft.SparkSpec
import graft.operators.Validation.{Expect, Unique}
import org.apache.spark.sql.functions._

/** Pins the streaming expectation monitor: per-batch counts, durable
  * cumulative ledger, replay idempotence, and the circuit-breaker
  * signal (a clean stream going dirty flips pass but keeps history). */
class StreamingValidationSpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    Expect("v_not_null", col("v").isNotNull),
    Expect("v_positive", col("v") > 0),
    Unique("k_unique", col("k")))

  private def batchOf(rows: (java.lang.Long, java.lang.Double)*) =
    rows.toDF("k", "v")

  private def byCheck(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(1) ->
      ((r.getLong(3), r.getLong(4), r.getBoolean(5),
        r.getLong(6), r.getLong(7), r.getBoolean(8)))).toMap

  test("per-batch + cumulative counts across batches; replay idempotent") {
    val st = tmpDir("sval")

    // batch 0: clean
    val r0 = byCheck(StreamingValidation.processBatch(
      batchOf((1L, 2.0), (2L, 3.0)), 0L, "t", checks, st))
    assert(r0("v_not_null") == ((2L, 0L, true, 2L, 0L, true)))
    assert(r0("k_unique") == ((2L, 0L, true, 2L, 0L, true)))

    // batch 1: one null, one negative, one duplicate key
    val r1 = byCheck(StreamingValidation.processBatch(
      batchOf((3L, null), (3L, -1.0), (4L, 5.0)), 1L, "t", checks, st))
    assert(r1("v_not_null") == ((3L, 1L, false, 5L, 1L, false)))
    assert(r1("v_positive") == ((3L, 2L, false, 5L, 2L, false)), "null counts as violation")
    assert(r1("k_unique") == ((3L, 1L, false, 5L, 1L, false)))

    // replay batch 1: identical report, ledger not double-counted
    val r1b = byCheck(StreamingValidation.processBatch(
      batchOf((3L, null), (3L, -1.0), (4L, 5.0)), 1L, "t", checks, st))
    assert(r1b == r1, "replay must reproduce the same per-batch AND cumulative rows")

    // batch 2: clean again — batch passes, cumulative remembers history
    val r2 = byCheck(StreamingValidation.processBatch(
      batchOf((5L, 1.0)), 2L, "t", checks, st))
    assert(r2("v_positive") == ((1L, 0L, true, 6L, 2L, false)),
      "a clean batch cannot launder the cumulative record")
  }

  test("end-to-end under a streaming query: reports land batch-partitioned") {
    val src = tmpDir("sval-src"); val st = tmpDir("sval-st")
    val out = tmpDir("sval-out"); val cp = tmpDir("sval-cp")
    batchOf((1L, 1.0), (2L, -2.0)).write.mode("overwrite").parquet(src)
    val q = StreamingValidation.attach(
      spark.readStream.schema("k long, v double").parquet(src),
      "t", checks, st, out, cp)
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 3, "one row per check")
    assert(got.filter(col("check_name") === "v_positive")
      .select("n_violations").head.getLong(0) == 1L)
  }
}
