package graft.codec

import scala.collection.immutable.TreeMap

/** Canonical JSON: deterministic rendering with lexicographically sorted
  * object keys, omit-empty semantics decided by the writer (callers simply
  * don't add empty fields), and byte fields carried as base64 strings.
  *
  * Mirrors the behavior of the reference's codec layer
  * (plugin/exporter/idb/cockroach/internal/encoding/encoding.go:19-42:
  * canonical, sorted map keys, base64-wrapped byte strings) — byte-stable
  * output is the golden-test contract there, and here.
  *
  * Hand-rolled parser/renderer: zero deps, and Spark's `to_json` is not
  * canonical (map key order is undefined), so it cannot be used for this.
  */
object CanonicalJson {

  sealed trait JVal
  case object JNull extends JVal
  final case class JBool(b: Boolean) extends JVal
  /** Integers kept as BigInt: blockchain quantities are uint64 and must not
    * be truncated through Double (SURVEY §7.4 "uint64 throughout"). */
  final case class JInt(i: BigInt) extends JVal
  final case class JNum(d: Double) extends JVal
  final case class JStr(s: String) extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JObj(fields: TreeMap[String, JVal]) extends JVal

  object JObj {
    def of(kvs: (String, JVal)*): JObj = JObj(TreeMap(kvs: _*))
  }

  /** base64 (std, padded) wrapper for byte fields, as the reference encodes
    * `bytea` values inside jsonb documents. */
  def jBytes(b: Array[Byte]): JStr = JStr(java.util.Base64.getEncoder.encodeToString(b))

  // ── Render ──────────────────────────────────────────────────────────

  def render(v: JVal): String = {
    val sb = new StringBuilder
    renderTo(v, sb)
    sb.toString
  }

  private def renderTo(v: JVal, sb: StringBuilder): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JInt(i) => sb.append(i.toString)
    case JNum(d) =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) sb.append(d.toLong.toString)
      else sb.append(d.toString)
    case JStr(s) => renderString(s, sb)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        renderTo(it, sb)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(',')
        first = false
        renderString(k, sb)
        sb.append(':')
        renderTo(fv, sb)
      }
      sb.append('}')
  }

  private def renderString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  // ── Parse ───────────────────────────────────────────────────────────

  /** Recursive-descent parser; object keys re-sorted into the canonical
    * TreeMap so parse∘render is idempotent on any valid JSON. */
  def parse(s: String): JVal = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    require(p.atEnd, s"trailing characters at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def cur: Char = s.charAt(pos)
    def skipWs(): Unit = while (!atEnd && (cur == ' ' || cur == '\t' || cur == '\n' || cur == '\r')) pos += 1
    def expect(c: Char): Unit = {
      require(!atEnd && cur == c, s"expected '$c' at $pos")
      pos += 1
    }

    def parseValue(): JVal = {
      skipWs()
      require(!atEnd, "unexpected end of input")
      cur match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JStr(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _ => parseNum()
      }
    }

    def literal(lit: String): Unit = {
      require(s.regionMatches(pos, lit, 0, lit.length), s"bad literal at $pos")
      pos += lit.length
    }

    def parseObj(): JObj = {
      expect('{'); skipWs()
      var m = TreeMap.empty[String, JVal]
      if (!atEnd && cur == '}') { pos += 1; return JObj(m) }
      while (true) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        m = m.updated(k, parseValue())
        skipWs()
        // atEnd here = truncated input; expect() turns it into a
        // positioned parse error instead of an index-out-of-bounds.
        if (!atEnd && cur == ',') pos += 1
        else { expect('}'); return JObj(m) }
      }
      JObj(m)
    }

    def parseArr(): JArr = {
      expect('['); skipWs()
      val b = Vector.newBuilder[JVal]
      if (!atEnd && cur == ']') { pos += 1; return JArr(b.result()) }
      while (true) {
        b += parseValue()
        skipWs()
        if (!atEnd && cur == ',') pos += 1
        else { expect(']'); return JArr(b.result()) }
      }
      JArr(b.result())
    }

    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while ({ require(!atEnd, s"unterminated string at $pos"); cur != '"' }) {
        if (cur == '\\') {
          pos += 1
          require(!atEnd, s"truncated escape at $pos")
          cur match {
            case '"' => sb.append('"'); pos += 1
            case '\\' => sb.append('\\'); pos += 1
            case '/' => sb.append('/'); pos += 1
            case 'b' => sb.append('\b'); pos += 1
            case 'f' => sb.append('\f'); pos += 1
            case 'n' => sb.append('\n'); pos += 1
            case 'r' => sb.append('\r'); pos += 1
            case 't' => sb.append('\t'); pos += 1
            case 'u' =>
              require(pos + 5 <= s.length, s"truncated \\u escape at $pos")
              val hex = s.substring(pos + 1, pos + 5)
              sb.append(Integer.parseInt(hex, 16).toChar)
              pos += 5
            case c => throw new IllegalArgumentException(s"bad escape \\$c at $pos")
          }
        } else {
          sb.append(cur); pos += 1
        }
      }
      pos += 1
      sb.toString
    }

    def parseNum(): JVal = {
      val start = pos
      if (cur == '-') pos += 1
      while (!atEnd && (cur.isDigit || cur == '.' || cur == 'e' || cur == 'E' || cur == '+' || cur == '-')) pos += 1
      val tok = s.substring(start, pos)
      if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) JNum(tok.toDouble)
      else JInt(BigInt(tok))
    }
  }

  // ── Convenience accessors ──────────────────────────────────────────

  implicit final class JValOps(private val v: JVal) extends AnyVal {
    def asObj: TreeMap[String, JVal] = v match {
      case JObj(f) => f
      case other => throw new IllegalArgumentException(s"not an object: $other")
    }
    def get(k: String): Option[JVal] = v match {
      case JObj(f) => f.get(k)
      case _ => None
    }
    def str: String = v match { case JStr(s) => s; case o => throw new IllegalArgumentException(s"not a string: $o") }
    def long: Long = v match { case JInt(i) => i.toLong; case o => throw new IllegalArgumentException(s"not an int: $o") }
    def bigInt: BigInt = v match { case JInt(i) => i; case o => throw new IllegalArgumentException(s"not an int: $o") }
    def bool: Boolean = v match { case JBool(b) => b; case o => throw new IllegalArgumentException(s"not a bool: $o") }
    def arr: Vector[JVal] = v match { case JArr(a) => a; case o => throw new IllegalArgumentException(s"not an array: $o") }
    def bytes: Array[Byte] = java.util.Base64.getDecoder.decode(str)
  }
}
