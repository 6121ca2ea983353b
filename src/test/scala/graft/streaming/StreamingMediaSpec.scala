package graft.streaming

import graft.SparkSpec
import graft.codec.{MediaFixtures, MediaWriters}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the streaming multimodal ingest vertical: metadata gates,
  * within-batch cross-format dedup, cross-batch ledger admission
  * (including audio identity surviving a container rewrite), and
  * replay idempotence of both the manifest and the ledger. */
class StreamingMediaSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = true)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  // one logical image in two containers: block-constant gray, so the
  // DC-only JPEG decodes to exactly the PNG's pixels (same dHash)
  private val q0 = 5
  private def dc(bx: Int, by: Int): Int = (bx * 9 + by * 17 + 30) % 200 - 100
  private def v(bx: Int, by: Int): Int =
    math.max(0, math.min(255, ((dc(bx, by) * q0 + 4) >> 3) + 128))
  private def pngA = MediaFixtures.pngReal(16, 8, (x, y, _) => v(x / 8, y / 8),
    filterOf = y => y % 5)
  private def jpegA = MediaFixtures.jpegReal(16, 8,
    Seq(Array.tabulate(64)(i => if (i == 0) q0 else 16)),
    (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(bx, by) else 0))
  private def audioSamples(n: Int): Array[Short] =
    Array.tabulate[Short](n)(i => (i * 997 - 9000).toShort)

  test("gates, cross-format dedup, cross-batch ledger, replay idempotence") {
    val ledger = tmpDir("graft-smedia-ledger")
    val batch0 = df(Seq(
      Row(1L, pngA), // image A as PNG
      Row(2L, jpegA), // the SAME image as JPEG — within-batch dup
      Row(3L, MediaFixtures.pngReal(2, 2, (x, y, c) => (x + y + c) % 256, _ => 0)), // area 4 < 16
      Row(4L, MediaFixtures.wav(1, 16000, 20, (i, _) => audioSamples(20)(i))), // audio W
      Row(5L, MediaFixtures.wav(1, 16000, 5, (i, _) => i * 100)), // 5 frames < 10
      Row(6L, "definitely not media".getBytes))) // undecodable
    val m0 = StreamingMedia.processBatch(batch0, 0L, "media_id", "blob", ledger)
    val rows0 = m0.collect().map(r => r.getLong(0) -> r).toMap
    m0.unpersist(false)
    assert(rows0.keySet == Set(1L, 4L), "gate + within-batch dedup")
    assert(rows0(1L).getString(1) == "image" && rows0(1L).getLong(3) == 2L,
      "the PNG/JPEG twin collapses with batch_copies = 2")
    assert(rows0(4L).getString(1) == "audio" && rows0(4L).getLong(3) == 1L)
    assert(rows0(1L).getInt(4) == 16 && rows0(1L).getInt(5) == 8)

    val batch1 = df(Seq(
      Row(11L, jpegA), // re-upload of A (fresh id) — ledger must reject
      Row(12L, MediaFixtures.pngReal(9, 9, (x, y, c) => (x * 5 + y * 3 + c) % 256, _ => 1)),
      // audio W's exact PCM REWRITTEN through the other container
      // builder — identity must survive the container change
      Row(13L, MediaWriters.wavPcm16(16000, 1, audioSamples(20))),
      Row(14L, MediaFixtures.wav(1, 32000, 30, (i, c) => i * 7 - 100 + c))))
    val m1 = StreamingMedia.processBatch(batch1, 1L, "media_id", "blob", ledger)
    val ids1 = m1.collect().map(_.getLong(0)).toSet
    m1.unpersist(false)
    assert(ids1 == Set(12L, 14L),
      "cross-batch ledger rejects the image re-upload AND the rewritten audio")

    // replay batch 1: same admissions, no ledger duplication
    val m1r = StreamingMedia.processBatch(batch1, 1L, "media_id", "blob", ledger)
    val ids1r = m1r.collect().map(_.getLong(0)).toSet
    m1r.unpersist(false)
    assert(ids1r == ids1, "replayed batch admits the same rows")
    val led = spark.read.parquet(s"$ledger/keys")
    assert(led.count() == 4L, "2 keys per batch, replay overwrote its own partition")
    assert(led.filter(org.apache.spark.sql.functions.col("batch") === 1L).count() == 2L)
  }

  test("writeShards: admitted blobs land as deterministic per-batch tar shards") {
    import org.apache.spark.sql.functions.col
    val ledger = tmpDir("graft-smedia-l2")
    val shards = tmpDir("graft-smedia-sh")
    val batch = df(Seq(
      Row(1L, pngA),
      Row(2L, jpegA), // within-batch dup of 1 — must NOT be sharded
      Row(4L, MediaFixtures.wav(1, 16000, 20, (i, _) => audioSamples(20)(i))),
      Row(5L, MediaFixtures.wav(1, 16000, 5, (i, _) => i)))) // gated out
    val m = StreamingMedia.processBatch(batch, 0L, "media_id", "blob", ledger)
    StreamingMedia.writeShards(batch, m, 0L, "media_id", "blob", shards, nShards = 2)
    m.unpersist(false)
    val tars = spark.read.parquet(s"$shards/tars").collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Array[Byte]]("tar")).toMap
    // admitted = {1, 4}: id 1 → shard 1, id 4 → shard 0
    assert(tars.keySet == Set(0, 1))
    val members0 = graft.codec.TarCodec.parse(tars(0)).get
    val members1 = graft.codec.TarCodec.parse(tars(1)).get
    assert(members0.map(_._1) == Seq("000000000004.bin"))
    assert(members1.map(_._1) == Seq("000000000001.bin"))
    assert(java.util.Arrays.equals(members1.head._2, pngA), "shard carries the original blob")
    // replay: byte-identical shards (tar is deterministic, overwrite own partition)
    val m2 = StreamingMedia.processBatch(batch, 0L, "media_id", "blob", ledger)
    StreamingMedia.writeShards(batch, m2, 0L, "media_id", "blob", shards, nShards = 2)
    m2.unpersist(false)
    val again = spark.read.parquet(s"$shards/tars")
    assert(again.count() == 2)
    val t1 = again.filter(col("shard") === 1).head.getAs[Array[Byte]]("tar")
    assert(java.util.Arrays.equals(t1, tars(1)), "replayed shard must be byte-identical")
  }
}
