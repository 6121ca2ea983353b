package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped decode / feature-extract /
  * frame-sample stages over `mapPartitions`.
  *
  * The actual media codecs are NOT in this environment, so the decode step
  * is a clearly-marked deterministic STUB (`stubDecode`) — what is real and
  * tested is everything Spark cares about: the schema contract, the
  * per-partition batch shape (decoder state is initialized once per
  * partition, not per row — the expensive part with a real codec), the
  * pushdown-friendly metadata columns, and the binary-safe expressions.
  */
object Multimodal {

  /** Metadata schema extracted from a media blob. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("format_sig", StringType, nullable = true), // first-4-bytes hex
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /** Column-only metadata: byte length + hex signature of the first 4
    * bytes (magic-number sniffing) — pure expressions, codegen'd,
    * DuckDB-portable. */
  def binaryMeta(blob: org.apache.spark.sql.Column): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    (length(blob).cast("long"), lower(hex(expr_substr(blob))))

  private def expr_substr(blob: org.apache.spark.sql.Column) =
    substring(blob, 1, 4)

  /** STUB decoder: deterministically derives (width, height, n_frames)
    * from the blob bytes. A real deployment replaces ONLY the body of this
    * function with an actual codec call; the partition/batch shape stays.
    */
  private def stubDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    // ??? real codec goes here — deterministic fake below
    val len = bytes.length
    val b0 = if (len > 0) bytes(0) & 0xff else 0
    val b1 = if (len > 1) bytes(1) & 0xff else 0
    (16 + (b0 % 64) * 16, 16 + (b1 % 64) * 16, 1 + len % 30)
  }

  /** Decode stage: one decoder init per PARTITION (the batch shape that
    * matters with a real codec lib), one struct row out per blob. */
  def decodeMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField("media_id", LongType, nullable = false) +: MediaMetaSchema.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // decoder/codec context would be created HERE, once per partition
      rows.map { r =>
        val id = r.getLong(idIdx)
        // NULL blob ≡ empty media (decoders never see a null pointer)
        val blob = Option(r.getAs[Array[Byte]](blobIdx)).getOrElse(Array.emptyByteArray)
        val sig = blob.take(4).map("%02x".format(_)).mkString
        val (w, h, f) = stubDecode(blob)
        Row(id, blob.length.toLong, sig, w, h, f)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling stage: every `stride`-th frame index up to n_frames —
    * the explode shape of a video pipeline (one row per sampled frame). */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.select(col("media_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Feature-extraction stage: fixed-size float vector per blob (stub:
    * byte histogram over 8 buckets, L1-normalized — deterministic, and the
    * same batch shape as a real embedding model). */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String, dims: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // model weights would be loaded HERE, once per partition
      rows.map { r =>
        // NULL blob ≡ empty media, same contract as decodeMeta
        val blob = Option(r.getAs[Array[Byte]](blobIdx)).getOrElse(Array.emptyByteArray)
        val hist = new Array[Double](dims)
        blob.foreach(b => hist((b & 0xff) % dims) += 1.0)
        val total = math.max(1.0, hist.sum)
        Row(r.getLong(idIdx), hist.map(_ / total).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
