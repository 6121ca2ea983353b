package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The media-metadata gate ([[graft.operators.Multimodal.decodeMeta]]:
  * dependency-free header parse for PNG/JPEG/GIF/WAV, deterministic
  * stub for everything else) as ONE codegen'd expression — the full
  * meta struct per blob. The first shipping ran `df.rdd.mapPartitions`
  * for the per-partition decoder-init batch shape, but the META parse
  * has no decoder to initialize — it is a pure bytes→struct header
  * read, the [[CharsetDecodeExpr]] shape exactly — and the RDD hop
  * deserialized every row and broke whole-stage codegen for the stage
  * EVERY media blob passes through (`mm_corpus_build`,
  * `engine_stream_media`). The heavy raster/PCM decoders stay on
  * `mapPartitions`, where codec work dominates serde and a real codec
  * library would batch-initialize.
  *
  * `sniff = false` forces the stub for every blob (the stub-pinned
  * oracle fixtures feed text bytes whose leading bytes can
  * accidentally spell a container magic — "GIF89a" is plain ASCII).
  * Null blobs read as empty media (`byte_len` 0, stub dims), the old
  * operator's contract, so the struct itself is never null. */
case class MediaMetaExpr(child: Expression, sniff: Boolean) extends UnaryExpression {

  override def dataType: DataType = MediaMetaExpr.Schema
  override def nullable: Boolean = false
  override def prettyName: String = "graft_media_meta"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }

  // null child value still yields a row (empty-media contract), so
  // evaluate without the null-short-circuit helpers
  override def eval(input: InternalRow): Any =
    MediaMetaImpl.decode(child.eval(input).asInstanceOf[Array[Byte]], sniff)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val sniffLit = if (sniff) "true" else "false"
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = graft.expressions.MediaMetaImpl.decode(
          ${c.isNull} ? null : ${c.value}, $sniffLit);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MediaMetaExpr =
    copy(child = newChild)
}

object MediaMetaExpr {
  /** Mirrors `media_id`-less [[graft.operators.Multimodal.MediaMetaSchema]]. */
  val Schema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("format_sig", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("bit_depth", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))
}

object MediaMetaImpl {
  /** Static kernel Janino-reachable from generated code. */
  def decode(blobOrNull: Array[Byte], sniff: Boolean): InternalRow = {
    val blob = if (blobOrNull == null) Array.emptyByteArray else blobOrNull
    val sig = UTF8String.fromString(blob.take(4).map("%02x".format(_)).mkString)
    val len = blob.length.toLong
    (if (sniff) graft.codec.MediaHeaders.parse(blob) else None) match {
      case Some(m) =>
        new GenericInternalRow(Array[Any](len, sig,
          m.width.map(Int.box).orNull, m.height.map(Int.box).orNull,
          m.nFrames.map(Int.box).orNull,
          Option(m.format).map(UTF8String.fromString).orNull,
          m.bitDepth.map(Int.box).orNull, m.channels.map(Int.box).orNull,
          m.sampleRate.map(Int.box).orNull, m.durationMs.map(Long.box).orNull))
      case None =>
        val b0 = if (blob.length > 0) blob(0) & 0xff else 0
        val b1 = if (blob.length > 1) blob(1) & 0xff else 0
        new GenericInternalRow(Array[Any](len, sig,
          Int.box(16 + (b0 % 64) * 16), Int.box(16 + (b1 % 64) * 16),
          Int.box(1 + blob.length % 30), null, null, null, null, null))
    }
  }
}
