package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Pins the streaming-percentiles contract: the ledger serve equals the
  * from-scratch histogram walk over the union, and replay is a no-op. */
class StreamingPercentilesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, Int)*) = rows.toDF("grp", "len")
  private val qs = Seq("p50" -> 0.5, "p90" -> 0.9)

  test("ledger serve equals from-scratch over the union; replay no-op") {
    val idx = tmpDir("sperc-idx")
    val b0 = docs((0 until 50).map(i => ("a", i)) ++ Seq(("b", 100)): _*)
    val b1 = docs((50 until 90).map(i => ("a", i)): _*)

    StreamingPercentiles.processBatch(b0, 0L, "grp", col("len"), idx, qs)
    val r1 = StreamingPercentiles.processBatch(b1, 1L, "grp", col("len"), idx, qs)
      .orderBy("g").collect().toSeq

    val union = b0.unionByName(b1)
    val direct = Sketches.histQuantilesFromHist(
      Sketches.histBuild(union, "grp", col("len")), qs)
      .withColumn("batch_id", lit(1L))
      .orderBy("g").collect().toSeq
    assert(r1 === direct)

    // replay batch 1: same report, same ledger totals
    val r1b = StreamingPercentiles.processBatch(b1, 1L, "grp", col("len"), idx, qs)
      .orderBy("g").collect().toSeq
    assert(r1b === r1, "replay must not double-count the histogram")
  }
}
