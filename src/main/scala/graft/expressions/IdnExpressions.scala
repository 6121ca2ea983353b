package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Internationalized hostname → ASCII-compatible encoding (the DNS
  * wire form): per-label RFC 3492 Punycode under an `xn--` prefix,
  * implemented from scratch against the published algorithm. A crawl
  * frontier that cannot encode `bücher.example` never resolves it —
  * and two spellings of one IDN host (pre-encoded vs raw UTF-8, both
  * arrive constantly in hrefs) must canonicalize to ONE ledger key.
  *
  * Pinned semantics (IDNA-lite, documented rather than guessed):
  *   - labels split on '.', each lowercased (Locale.ROOT — the same
  *     pin as the rest of the URL stack) before encoding;
  *   - an all-ASCII label passes through (lowercased) — including
  *     pre-encoded `xn--` labels, which are NOT re-encoded (that is
  *     what makes raw and pre-encoded spellings converge);
  *   - a label with any non-ASCII code point becomes
  *     `xn--<punycode>`; supplementary plane points ride as single
  *     code points (never surrogate halves);
  *   - full IDNA2008 mapping (confusables, bidi rules, ß→ss) is OUT
  *     of scope and pinned out — wrong normalization is observable
  *     as a hash mismatch, never a crash;
  *   - null on structural failure: empty label ≤ guard, label over
  *     256 code points, or RFC 3492 overflow.
  *
  * Composable like [[UrlPctNormalize]]: run on the HOST before ledger
  * keying; [[UrlCanonicalize]] itself stays a pure Java∩RE2 chain its
  * SQL oracles replay verbatim. */
case class HostIdnEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_host_idn_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    IdnImpl.toAscii(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.expressions.IdnImpl.toAscii(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): HostIdnEncode =
    copy(child = newChild)
}

/** Display-form twin of [[HostIdnEncode]]: `xn--` labels Punycode-
  * decode back to Unicode (lowercased), other labels pass through
  * lowercased; null when a label fails to decode (a fake `xn--` label
  * is hostile input, not a pass-through). */
case class HostIdnDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_host_idn_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    IdnImpl.toUnicode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.expressions.IdnImpl.toUnicode(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): HostIdnDecode =
    copy(child = newChild)
}

/** RFC 3492 Punycode, from the published algorithm (§6.3 encode,
  * §6.2 decode, §6.1 bias adaptation) — decode exists for round-trip
  * verification and display-form recovery. */
object IdnImpl {
  private final val Base = 36
  private final val TMin = 1
  private final val TMax = 26
  private final val Skew = 38
  private final val Damp = 700
  private final val InitialBias = 72
  private final val InitialN = 128
  private final val MaxLabel = 256

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def digitVal(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Punycode-encode one label's code points; null on overflow. */
  def punyEncode(cps: Array[Int]): String = {
    val out = new java.lang.StringBuilder
    var h = 0
    cps.foreach(c => if (c < 128) { out.append(c.toChar); h += 1 })
    val b = h
    if (b > 0) out.append('-')
    var n = InitialN
    var delta = 0L
    var bias = InitialBias
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      delta += (m.toLong - n) * (h + 1)
      if (delta > Int.MaxValue) return null
      n = m
      var i = 0
      while (i < cps.length) {
        val c = cps(i)
        if (c < n) {
          delta += 1
          if (delta > Int.MaxValue) return null
        }
        if (c == n) {
          var q = delta.toInt
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin
            else if (k >= bias + TMax) TMax
            else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta.toInt, h + 1, h == b)
          delta = 0
          h += 1
        }
        i += 1
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** Punycode-decode one label body (no `xn--` prefix); null on any
    * structural violation. */
  def punyDecode(s: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]
    val lastDash = s.lastIndexOf('-')
    var i = 0
    if (lastDash > 0) {
      while (i < lastDash) {
        val c = s.charAt(i)
        if (c >= 128) return null
        out += c.toInt
        i += 1
      }
      i = lastDash + 1
    }
    var n = InitialN
    var bias = InitialBias
    var pos = 0
    while (i < s.length) {
      val oldPos = pos
      var w = 1L
      var k = Base
      var done = false
      while (!done) {
        if (i >= s.length) return null
        val d = digitVal(s.charAt(i))
        i += 1
        if (d < 0) return null
        val add = d * w
        if (pos + add > Int.MaxValue) return null
        pos += add.toInt
        val t = if (k <= bias) TMin
        else if (k >= bias + TMax) TMax
        else k - bias
        if (d < t) done = true
        else {
          w *= Base - t
          if (w > Int.MaxValue) return null
          k += Base
        }
      }
      val numPoints = out.length + 1
      bias = adapt(pos - oldPos, numPoints, oldPos == 0)
      if (pos / numPoints > Int.MaxValue - n) return null
      n += pos / numPoints
      pos %= numPoints
      if (n < 128 || !Character.isValidCodePoint(n)) return null
      out.insert(pos, n)
      pos += 1
    }
    out.toArray
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Hostname → ACE form; null on structural failure (see the
    * expression scaladoc for the pinned semantics). */
  def toAscii(hostU: UTF8String): UTF8String = {
    val host = hostU.toString
    if (host.isEmpty) return null
    val labels = host.split("\\.", -1)
    val out = new java.lang.StringBuilder(host.length + 8)
    var li = 0
    while (li < labels.length) {
      if (li > 0) out.append('.')
      val label = labels(li).toLowerCase(java.util.Locale.ROOT)
      var ascii = true
      var ci = 0
      while (ci < label.length && ascii) {
        if (label.charAt(ci) >= 128) ascii = false
        ci += 1
      }
      if (ascii) out.append(label)
      else {
        val cps = codePoints(label)
        if (cps.length > MaxLabel) return null
        val enc = punyEncode(cps)
        if (enc == null) return null
        out.append("xn--").append(enc)
      }
      li += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** ACE form → display hostname (`xn--` labels decoded); null when
    * a label fails to decode. */
  def toUnicode(hostU: UTF8String): UTF8String = {
    val host = hostU.toString
    val labels = host.split("\\.", -1)
    val out = new java.lang.StringBuilder(host.length)
    var li = 0
    while (li < labels.length) {
      if (li > 0) out.append('.')
      val label = labels(li).toLowerCase(java.util.Locale.ROOT)
      if (label.startsWith("xn--")) {
        val cps = punyDecode(label.substring(4))
        if (cps == null) return null
        cps.foreach(out.appendCodePoint)
      } else out.append(label)
      li += 1
    }
    UTF8String.fromString(out.toString)
  }
}
