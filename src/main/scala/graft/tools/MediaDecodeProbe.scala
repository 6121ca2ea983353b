package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decode-throughput probe for the multimodal family — the 100 TB
  * posture measurement for the per-row decode stages: blobs/s and MB/s
  * for PNG (zlib inflate + unfilter), GIF (general LZW), and WAV PCM
  * decode+resample at growing corpus replication. The stages are
  * embarrassingly per-row (mapPartitions riding the scan, no shuffle),
  * so throughput per core should be FLAT in corpus size — any droop
  * names a hidden per-row allocation or driver involvement.
  *
  * Usage: runMain graft.tools.MediaDecodeProbe [sfDir] [reps]
  */
object MediaDecodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("1,8,32").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(label: String, nBlobs: Long, bytes: Long)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val v = body
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[media-probe] $label%-22s wall $wall%6.2f s  ${nBlobs / wall}%9.0f blobs/s  ${bytes / wall / 1048576}%7.1f MB/s  out $v%d")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    for (rep <- reps) {
      val ids = graft.Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
        .collect().toSeq
      val repIds = (0 until rep).flatMap(r => ids.map(_ + r * 10000000L))
      println(s"── x$rep: ${repIds.size} blobs ──")

      val pngBlobs = spark.createDataset(repIds).repartition(32)
        .mapPartitions(_.map { id =>
          val sb = id % 100
          val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
          (id, graft.codec.MediaFixtures.pngReal(w, h,
            (x, y, c) => graft.codec.MediaFixtures.pixel(sb, x, y, c)))
        }).toDF("doc_id", "blob").localCheckpoint()
      val pngBytes = pngBlobs.agg(sum(length(col("blob")))).head.getLong(0)
      timed(s"png decode x$rep", repIds.size, pngBytes) {
        graft.operators.Multimodal.pngPixelStats(pngBlobs, "doc_id", "blob").count()
      }

      val gifBlobs = spark.createDataset(repIds).repartition(32)
        .mapPartitions(_.map { id =>
          val w = (1 + id % 12).toInt; val h = (1 + id % 9).toInt
          (id, graft.codec.MediaFixtures.gifReal(w, h, (1 + id % 3).toInt,
            (x, y, f) => graft.codec.MediaFixtures.pixel(id % 100, x, y, f)))
        }).toDF("doc_id", "blob").localCheckpoint()
      val gifBytes = gifBlobs.agg(sum(length(col("blob")))).head.getLong(0)
      timed(s"gif lzw decode x$rep", repIds.size, gifBytes) {
        graft.operators.Multimodal.gifRasterStats(gifBlobs, "doc_id", "blob").count()
      }

      // JPEG: entropy decode + IDCT is the expensive decode — fixtures
      // carry AC coefficients so the Huffman loop and the full (not
      // constant-column) IDCT path are both exercised
      val jpegBlobs = spark.createDataset(repIds).repartition(32)
        .mapPartitions(_.map { id =>
          val w = (1 + id % 21).toInt; val h = (1 + id % 17).toInt
          val qt = Array.tabulate(64)(i => if (i == 0) (1 + id % 16).toInt else 16)
          (id, graft.codec.MediaFixtures.jpegReal(w, h, Seq(qt),
            (_, bx, by) => Array.tabulate(64) { i =>
              if (i == 0) (((id * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt
              else if (i < 16) ((((id + bx + by + i) * 37) % 15) - 7).toInt
              else 0
            }))
        }).toDF("doc_id", "blob").localCheckpoint()
      val jpegBytes = jpegBlobs.agg(sum(length(col("blob")))).head.getLong(0)
      timed(s"jpeg decode x$rep", repIds.size, jpegBytes) {
        graft.operators.Multimodal.jpegPixelStats(jpegBlobs, "doc_id", "blob").count()
      }

      val wavBlobs = spark.createDataset(repIds).repartition(32)
        .mapPartitions(_.map(id => (id, graft.codec.MediaFixtures.build(3 + 4 * (id % 1000)))))
        .toDF("doc_id", "blob").localCheckpoint()
      val wavBytes = wavBlobs.agg(sum(length(col("blob")))).head.getLong(0)
      timed(s"pcm resample x$rep", repIds.size, wavBytes) {
        graft.operators.Multimodal.resamplePcm(wavBlobs, "doc_id", "blob", 16000).count()
      }

      // write side: decode + resize + PNG re-encode (deflate dominates),
      // and decode + resample + WAV rewrite — the transcode stages.
      // timed() unpersists every block after each stage, so these build
      // their OWN checkpointed inputs rather than reusing the earlier
      // stages' (reuse across the unpersist boundary = lost blocks)
      val pngBlobs2 = spark.createDataset(repIds).repartition(32)
        .mapPartitions(_.map { id =>
          val sb = id % 100
          val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
          (id, graft.codec.MediaFixtures.pngReal(w, h,
            (x, y, c) => graft.codec.MediaFixtures.pixel(sb, x, y, c)))
        }).toDF("doc_id", "blob").localCheckpoint()
      timed(s"png transcode x$rep", repIds.size, pngBytes) {
        graft.operators.Multimodal.transcodePng(pngBlobs2, "doc_id", "blob", 8, 6)
          .agg(sum(length(col("png")))).head.getLong(0)
      }
      val wavBlobs2 = spark.createDataset(repIds).repartition(32)
        .mapPartitions(_.map(id => (id, graft.codec.MediaFixtures.build(3 + 4 * (id % 1000)))))
        .toDF("doc_id", "blob").localCheckpoint()
      timed(s"wav transcode x$rep", repIds.size, wavBytes) {
        graft.operators.Multimodal.transcodeWav(wavBlobs2, "doc_id", "blob", 16000)
          .agg(sum(length(col("wav")))).head.getLong(0)
      }

      // composed capstone at replication: decode-meta gates → dHash →
      // keep-min groupBy → dims join-back (the mm_corpus_build plan,
      // image side). The groupBy is the one real shuffle — the stage
      // that must stay O(corpus) at 100 TB. Twin pairs share sb so the
      // dedup actually collapses rows, not just hashes them.
      val cbBlobs = spark.createDataset(repIds).repartition(32)
        .mapPartitions(_.map { id =>
          val sb = id / 2
          val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
          val q0 = (1 + sb % 16).toInt
          def dc(bx: Int, by: Int): Int = (((sb * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt
          def v(bx: Int, by: Int): Int =
            math.max(0, math.min(255, ((dc(bx, by) * q0 + 4) >> 3) + 128))
          val blob =
            if (id % 2 == 0)
              graft.codec.MediaFixtures.pngReal(w, h, (x, y, _) => v(x / 8, y / 8),
                filterOf = y => ((id + y) % 5).toInt)
            else {
              val qt = Array.tabulate(64)(i => if (i == 0) q0 else 16)
              graft.codec.MediaFixtures.jpegReal(w, h, Seq(qt),
                (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(bx, by) else 0))
            }
          (id, blob)
        }).toDF("doc_id", "blob").localCheckpoint()
      val cbBytes = cbBlobs.agg(sum(length(col("blob")))).head.getLong(0)
      timed(s"mm corpus build x$rep", repIds.size, cbBytes) {
        val meta = graft.operators.Multimodal.decodeMeta(cbBlobs, "doc_id", "blob")
        val kept = meta.filter(col("format").isin("png", "jpeg") &&
          col("width").cast("long") * col("height") >= 16)
          .select(col("media_id"), col("width"), col("height"))
        val groups = graft.operators.Multimodal.dHash64(cbBlobs, "doc_id", "blob")
          .groupBy(col("dhash"))
          .agg(min(col("media_id")).as("doc_id"), count(lit(1)).as("group_size"))
        groups.join(kept, groups("doc_id") === kept("media_id")).count()
      }
    }
    spark.stop()
  }
}
