package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The charset front gate ([[graft.codec.CharsetCodec.decode]]: BOM >
  * declared label > strict UTF-8 validation > density triage > Latin
  * split, with the legacy CJK/single-byte families decoded strictly and
  * the `unknown` quarantine verdict) as ONE codegen'd expression —
  * `struct(charset string, text string)` per payload. The first
  * shipping ran `df.rdd.mapPartitions`, deserializing every row and
  * breaking whole-stage codegen for the stage that touches EVERY
  * crawled document; the per-row kernel is a pure bytes→(label, text)
  * function, exactly the FixMojibakeExpr shape. Null payloads decode
  * as empty utf-8 (the operator's old contract), so the expression is
  * applied over a coalesced child and never null itself. */
case class CharsetDecodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("charset", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_charset_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }

  override def nullSafeEval(b: Any): Any =
    CharsetDecodeImpl.decode(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.CharsetDecodeImpl.decode($b)")

  override protected def withNewChildInternal(newChild: Expression): CharsetDecodeExpr =
    copy(child = newChild)
}

object CharsetDecodeImpl {
  def decode(b: Array[Byte]): InternalRow = {
    val (cs, text) = graft.codec.CharsetCodec.decode(b)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(cs), UTF8String.fromString(text)))
  }
}

/** Conditional gzip-to-text: bytes that start with the gzip magic
  * (`1F 8B`) gunzip — ALL concatenated members, RFC 1952 §2.2 — and
  * read as UTF-8; anything else reads as UTF-8 directly. NULL for
  * declared-gzip bytes that fail to decode (truncated member, bad
  * CRC), the never-throw contract. The sitemap fetch shape:
  * sitemaps.org allows `sitemap.xml.gz`, and large sites ship it, so
  * the parse front end must decode by CONTENT, not by URL suffix. */
case class GzipTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gunzip_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }

  override def nullSafeEval(b: Any): Any =
    GzipTextImpl.decode(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("txt")
      s"""
         |UTF8String $r = graft.expressions.GzipTextImpl.decode($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GzipTextExpr =
    copy(child = newChild)
}

object GzipTextImpl {
  def decode(b: Array[Byte]): UTF8String =
    if (b.length >= 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte)
      graft.codec.GzipCodec.gunzipAll(b) match {
        case Some(members) =>
          val out = new java.io.ByteArrayOutputStream(graft.codec.HttpCodec.sizeHint(b.length))
          members.foreach { case (data, _, _) => out.write(data, 0, data.length) }
          UTF8String.fromBytes(out.toByteArray)
        case None => null
      }
    else UTF8String.fromBytes(b)
}
