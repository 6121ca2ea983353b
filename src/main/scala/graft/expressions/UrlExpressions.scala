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

/** [[graft.operators.TextOps.urlCanonicalize]] as ONE codegen'd
  * expression. The Column chain (4 regexp_extracts + array ops over
  * one pattern) is semantically right but evaluation-heavy, and worse,
  * it gets SUBSTITUTED wholesale wherever the optimizer pushes a
  * predicate or collapses a projection that references the canonical
  * URL more than once — a filter on `canon(url).isNotNull` inlines the
  * whole tree per reference (measured: a 66 KB pushed-down filter
  * condition in the link-discovery plan). This expression is a few
  * nodes, so substitution is harmless. Behavioral identity with the
  * chain is by CONSTRUCTION, not reimplementation: the impl runs the
  * SAME Java regex pattern (cached, one find() for all four groups —
  * Spark's own RegExpExtract is Java-regex find()), the same
  * split/filter semantics, and array_sort's UTF8String binary order
  * (UTF-8 byte-wise, = code-point order). SQL oracles replay the RE2
  * twin exactly as before. */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_canonicalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    UrlCanonImpl.canonicalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.UrlCanonImpl.canonicalize($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object UrlCanonImpl {
  // the exact pattern the Column chain passes to regexp_extract
  private val Url = java.util.regex.Pattern.compile(
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$")

  /** UTF8String binary order on Java strings: compare UTF-8 bytes
    * unsigned — what array_sort(StringType) does. */
  private[expressions] val Utf8Order = new java.util.Comparator[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
  }

  def canonicalize(s: UTF8String): UTF8String = {
    val m = Url.matcher(s.toString)
    if (!m.find()) return null
    // DELIBERATE divergence from the replaced Column chain: Spark's
    // lower() falls back to default-locale String.toLowerCase for
    // non-ASCII, so under a Turkish JVM locale a host containing a
    // dotted capital I would lowercase differently there. Locale.ROOT
    // is the correct behavior for host names (and matches the DuckDB
    // oracle's locale-independent lower()); the parity fuzz spec pins
    // the JVM-default-locale assumption it runs under.
    val scheme = m.group(1).toLowerCase(java.util.Locale.ROOT)
    var host = m.group(2).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http" && host.endsWith(":80")) host = host.dropRight(3)
    else if (scheme == "https" && host.endsWith(":443")) host = host.dropRight(4)
    val path0 = m.group(3)
    val path = if (path0.isEmpty) "/" else path0
    val q0 = m.group(4)
    val sb = new java.lang.StringBuilder(scheme.length + host.length + path.length + 16)
    sb.append(scheme).append("://").append(host).append(path)
    if (q0 != null && q0.nonEmpty) {
      val params = q0.split("&", -1)
        .filter(p => p.nonEmpty && !p.startsWith("utm_"))
      if (params.nonEmpty) {
        java.util.Arrays.sort(params, Utf8Order)
        sb.append('?')
        var i = 0
        while (i < params.length) {
          if (i > 0) sb.append('&')
          sb.append(params(i))
          i += 1
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** [[graft.operators.TextOps.urlResolve]] as ONE codegen'd expression —
  * same motivation and same by-construction parity as
  * [[UrlCanonicalize]]: the impl replays the Column chain's exact Java
  * regex patterns (cached), including the bounded 4-pass dot-segment
  * fold applied to the merged PATH alone. Null when the base has no
  * `scheme://` and the ref is not itself absolute; null inputs
  * propagate (a NULL ref is not an empty reference). */
case class UrlResolve(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_resolve"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($a, $b)")
    }

  // NOT nullSafeEval: the old column chain resolved an ABSOLUTE ref
  // even against a NULL base (nothing is needed from the base), and
  // the default null-intolerant BinaryExpression would lose those
  // targets. A NULL ref stays NULL (RFC 3986 maps only the EMPTY
  // string to the base); a NULL base with a relative ref is NULL
  // (nothing to resolve against) — both exactly the chain's algebra.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val r = right.eval(input)
    if (r == null) null
    else UrlResolveImpl.resolveNullable(
      left.eval(input).asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${rightGen.isNull}) {
          ${leftGen.code}
          ${ev.value} = graft.expressions.UrlResolveImpl.resolveNullable(
            ${leftGen.isNull} ? null : ${leftGen.value}, ${rightGen.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)
}

object UrlResolveImpl {
  import java.util.regex.Pattern
  private val Base = Pattern.compile(
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*).*$")
  private val RefScheme = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*:")
  private val LastSeg = Pattern.compile("[^/]*$")
  private val PathHead = Pattern.compile("^([^?#]*)")
  // the five fold patterns, applied in order, four passes — verbatim
  // from the Column chain
  private val DotSlash = Pattern.compile("/\\./")
  private val DotEnd = Pattern.compile("/\\.$")
  private val UpSlash = Pattern.compile("/[^/]+/\\.\\./")
  private val UpEnd = Pattern.compile("/[^/]+/\\.\\.$")
  private val RootUp = Pattern.compile("^/\\.\\.(/|$)")

  /** [[resolve]] tolerating a NULL base: an absolute ref needs nothing
    * from the base (the column chain's `when(hasScheme, r)` fired before
    * any base field was touched); anything else has no resolution
    * context and is null. */
  def resolveNullable(baseU: UTF8String, refU: UTF8String): UTF8String =
    if (baseU != null) resolve(baseU, refU)
    else if (RefScheme.matcher(refU.toString).find()) refU
    else null

  def resolve(baseU: UTF8String, refU: UTF8String): UTF8String = {
    val base = baseU.toString
    val ref = refU.toString
    val hasScheme = RefScheme.matcher(ref).find()
    val bm = Base.matcher(base)
    val matched = bm.find()
    val scheme = if (matched) bm.group(1).toLowerCase(java.util.Locale.ROOT) else ""
    if (scheme.isEmpty && !hasScheme) return null
    if (hasScheme) return refU
    val hostport = if (matched) bm.group(2) else ""
    val bpath0 = if (matched) bm.group(3) else ""
    val bpath = if (bpath0.isEmpty) "/" else bpath0
    val origin = scheme + "://" + hostport
    if (ref.startsWith("//")) return UTF8String.fromString(scheme + ":" + ref)
    if (ref.startsWith("?")) return UTF8String.fromString(origin + bpath + ref)
    if (ref.startsWith("#")) return UTF8String.fromString(base + ref)
    if (ref.isEmpty) return baseU
    val merged =
      if (ref.startsWith("/")) ref
      else {
        val dir0 = LastSeg.matcher(bpath).replaceAll("")
        (if (dir0.isEmpty) "/" else dir0) + ref
      }
    val pm = PathHead.matcher(merged)
    val mergedPath = if (pm.find()) pm.group(1) else ""
    val mergedSuffix = merged.substring(mergedPath.length)
    var p = mergedPath
    var pass = 0
    while (pass < 4) {
      p = DotSlash.matcher(p).replaceAll("/")
      p = DotEnd.matcher(p).replaceAll("/")
      p = UpSlash.matcher(p).replaceAll("/")
      p = UpEnd.matcher(p).replaceAll("/")
      p = RootUp.matcher(p).replaceAll("/")
      pass += 1
    }
    UTF8String.fromString(origin + p + mergedSuffix)
  }
}
