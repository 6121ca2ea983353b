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
