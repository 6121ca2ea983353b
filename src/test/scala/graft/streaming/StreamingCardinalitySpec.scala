package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Pins the streaming-cardinality contract: the durable register table
  * after N batches equals the batch-mode registers of the union, the
  * estimate is monotone, and replays are no-ops (max-merge lattice). */
class StreamingCardinalitySpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) = ids.map(i => s"doc-body-$i").toDF("text")

  test("stream-merged registers equal batch registers of the union; replay is a no-op") {
    val idx = tmpDir("scard-idx")

    val r0 = StreamingCardinality.processBatch(docs(0 until 300), 0L, "text", idx)
      .collect().head
    assert(r0.getLong(1) === 300L)

    val r1 = StreamingCardinality.processBatch(docs(200 until 600), 1L, "text", idx)
      .collect().head
    assert(r1.getAs[Double]("hll_estimate") >= r0.getAs[Double]("hll_estimate"),
      "cumulative estimate must be monotone")

    // batch-twin parity: stored state == batch-mode registers over the union
    val stored = spark.read.parquet(s"$idx/registers")
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val unionRegs = Sketches.hllRegisters(docs(0 until 600), "text")
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(stored === unionRegs)

    // replay batch 1: identical report, identical state
    val r1b = StreamingCardinality.processBatch(docs(200 until 600), 1L, "text", idx)
      .collect().head
    assert(r1b.getAs[Double]("hll_estimate") === r1.getAs[Double]("hll_estimate"))
    val replayed = spark.read.parquet(s"$idx/registers")
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(replayed === stored, "max-merge replay must be a no-op")

    // the cumulative estimate tracks 600 true uniques within 3 sigma
    val est = r1.getAs[Double]("hll_estimate")
    assert(math.abs(est - 600.0) / 600.0 < 0.20, s"estimate $est vs 600")
  }

  test("null keys are ignored; empty batch leaves state untouched") {
    val idx = tmpDir("scard-idx2")
    StreamingCardinality.processBatch(docs(0 until 50), 0L, "text", idx)
    val before = spark.read.parquet(s"$idx/registers")
      .agg(sum("register")).collect().head.getLong(0)
    val r = StreamingCardinality.processBatch(
      Seq.empty[String].toDF("text")
        .union(Seq(null.asInstanceOf[String]).toDF("text")), 1L, "text", idx)
      .collect().head
    assert(r.getLong(1) === 0L)
    val after = spark.read.parquet(s"$idx/registers")
      .agg(sum("register")).collect().head.getLong(0)
    assert(after === before)
  }

  test("attach drives the merge through writeStream micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val idx = tmpDir("scard-idx3")
    val out = tmpDir("scard-out")
    val ckpt = tmpDir("scard-ckpt")
    val mem = MemoryStream[String]
    val q = StreamingCardinality.attach(mem.toDF().withColumnRenamed("value", "text"),
      "text", idx, out, ckpt)
    mem.addData((0 until 100).map(i => s"k$i"): _*)
    q.processAllAvailable()
    mem.addData((50 until 150).map(i => s"k$i"): _*)
    q.processAllAvailable()
    q.stop()
    val reports = spark.read.parquet(out).orderBy("batch_id").collect()
    assert(reports.length === 2)
    val stored = spark.read.parquet(s"$idx/registers")
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val unionRegs = Sketches.hllRegisters(
      (0 until 150).map(i => s"k$i").toDF("text"), "text")
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(stored === unionRegs)
  }
}
