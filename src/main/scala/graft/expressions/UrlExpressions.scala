package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2 percent-encoding normalization — the char-level
  * pass [[graft.operators.TextOps.urlCanonicalize]] documents as its
  * one gap: two spellings of the same URL ("/p%41th" vs "/pAth",
  * "%2f" vs "%2F") are distinct frontier keys until percent escapes
  * normalize. §2.3: an escape whose octet is UNRESERVED
  * (ALPHA / DIGIT / `-` `.` `_` `~`) decodes to the character; every
  * other escape keeps its reserved meaning but its hex digits
  * normalize to UPPERCASE (§6.2.2.1). Escapes of non-ASCII octets
  * (multi-byte UTF-8) are never unreserved and pass through
  * uppercased byte by byte. A `%` not followed by two hex digits is
  * copied literally (the tolerant read crawlers need — such URLs are
  * malformed but live). Composable: run BEFORE urlCanonicalize, which
  * stays a pure Java∩RE2 column chain its SQL oracles replay
  * verbatim. */
case class UrlPctNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_pct_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    UrlPctImpl.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expressions.UrlPctImpl.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): UrlPctNormalize =
    copy(child = newChild)
}

object UrlPctImpl {
  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') || (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  private def hexVal(c: Char): Int = Character.digit(c, 16)

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = str.indexOf('%')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(str.length)
    sb.append(str, 0, i)
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c == '%' && i + 2 < n &&
          hexVal(str.charAt(i + 1)) >= 0 && hexVal(str.charAt(i + 2)) >= 0) {
        val v = (hexVal(str.charAt(i + 1)) << 4) | hexVal(str.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(str.charAt(i + 1)))
          sb.append(Character.toUpperCase(str.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
