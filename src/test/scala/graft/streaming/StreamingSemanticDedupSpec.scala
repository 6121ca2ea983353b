package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The embedding-space streaming dedup contract: first copy wins across
  * micro-batches by cosine within probed IVF cells, within-batch
  * families collapse to their smallest id, replays are idempotent, and
  * it runs under a real streaming query. */
class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  // two well-separated unit directions + a third
  private val a = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val b = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val c = Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)
  private def near(v: Seq[Float]) = v.map(_ * 0.9f).updated(7, 0.05f) // cos ≈ 0.998
  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
  private def centroids = vecs(100L -> a, 101L -> b, 102L -> c)

  test("first copy wins across batches; families collapse; replay idempotent") {
    val idx = tmpDir("ssem-idx")

    // batch 0: family {1 ≈ 2} and singleton 3
    val s0 = StreamingSemanticDedup.processBatch(
      vecs(1L -> a, 2L -> near(a), 3L -> b), 0L, "id", "v",
      centroids, "id", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s0 == Set(1L, 3L), "family {1,2} keeps 1; 3 is far")

    // batch 1: near batch 0's survivor (drop), near its DROPPED doc
    // (still the same family — drop), and a genuinely new direction
    val s1 = StreamingSemanticDedup.processBatch(
      vecs(10L -> near(a), 11L -> a, 12L -> c), 1L, "id", "v",
      centroids, "id", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == Set(12L), "10 and 11 lose to batch 0's canonical copy")

    // replay batch 1: same answer, no index double-count
    val s1b = StreamingSemanticDedup.processBatch(
      vecs(10L -> near(a), 11L -> a, 12L -> c), 1L, "id", "v",
      centroids, "id", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s1b == s1, "replay must be idempotent")

    // batch 2: dup of batch 1's survivor — the index accreted batch 1
    val s2 = StreamingSemanticDedup.processBatch(
      vecs(20L -> near(c), 21L -> near(a)), 2L, "id", "v",
      centroids, "id", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s2 == Set.empty[Long], "20 loses to 12, 21 loses to 1")

    val stored = StreamingSemanticDedup.readIndex(spark, idx)
    assert(stored.select("id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L, 12L))
  }

  test("cosine below minCos in the SAME cell is not a dup") {
    val idx = tmpDir("ssem-idx-thr")
    // two vectors in centroid a's cell, cos = 0.8 < 0.95
    val v1 = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val v2 = Seq(0.8f, 0.6f, 0f, 0f, 0f, 0f, 0f, 0f)
    val s0 = StreamingSemanticDedup.processBatch(
      vecs(1L -> v1), 0L, "id", "v", centroids, "id", idx)
    assert(s0.count() == 1)
    val s1 = StreamingSemanticDedup.processBatch(
      vecs(2L -> v2), 1L, "id", "v", centroids, "id", idx)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == Set(2L), "same cell but dissimilar: survives")
  }

  test("end-to-end under a streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val idx = tmpDir("ssem-idx2")
    val out = tmpDir("ssem-out")
    val cp = tmpDir("ssem-cp")
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingSemanticDedup.attach(
      mem.toDF().toDF("id", "v")
        .select(col("id"), col("v").cast("array<float>").as("v")),
      "id", "v", centroids, "id", idx, out, cp)

    mem.addData((1L, a), (2L, b))
    q.processAllAvailable()
    mem.addData((10L, near(a)), (11L, c))
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(out)
    assert(got.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L),
      "10 is a semantic near-dup of batch 0's doc 1 and must not land")
    assert(got.select("batch").distinct().count() == 2)
  }
}
