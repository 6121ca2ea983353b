package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import scala.util.control.NonFatal

/** Bounded PDF TEXT extraction — the front gate that lets
  * `application/pdf` payloads (a large slice of any real crawl's
  * document mix) enter the text funnel instead of quarantining.
  *
  * ISO 32000-1 subset, chosen for what text extraction actually
  * needs and nothing else:
  *
  *   - xref/trailer walk: classic cross-reference TABLES (with /Prev
  *     chains — newest section wins), PDF 1.5 cross-reference STREAMS
  *     (/Type /XRef, /W field widths, /Index subsections, PNG
  *     predictors), and type-2 entries into OBJECT STREAMS
  *     (/Type /ObjStm). A damaged or missing xref falls back to a
  *     full-file object scan — a crawl sees truncated PDFs constantly
  *     and the fallback recovers what the byte range still holds.
  *   - object model: the eight COS types (null/bool/number/string/
  *     name/array/dict/stream) with indirect references, recursive
  *     descent with hard depth/size caps.
  *   - stream decode: /FlateDecode via `java.util.zip.Inflater` (the
  *     PNG-IDAT precedent in [[MediaHeaders]]), /ASCIIHexDecode, PNG
  *     predictors 10-15 and TIFF predictor 2 from /DecodeParms;
  *     unknown filters skip the stream rather than fail the document.
  *   - page tree walk with /Resources inheritance and cycle guard.
  *   - content interpreter: BT/ET text blocks; Tj / ' / " / TJ show
  *     operators; Td, TD, T-star and Tm line moves; Tf font selection.
  *   - character decode: the font's /ToUnicode CMap when present
  *     (bfchar + bfrange incl. array form, 1- and 2-byte codes from
  *     the codespace), /WinAnsiEncoding otherwise, Latin-1 as the
  *     floor.
  *
  * NEVER-THROW doctrine (the [[MediaHeaders]] fuzz posture): any
  * hostile shape — truncation, bit flips, cyclic page trees, lying
  * /Length, zip bombs — must degrade to `None` or partial text, never
  * an exception and never unbounded memory. Every loop and buffer is
  * capped; [[extract]] additionally catches NonFatal as the last
  * line of defense.
  *
  * DETERMINISTIC layout rules (pinned by the oracle; text extraction
  * has no single canonical answer, so ours is defined exactly):
  *   - a line move (Td/TD with ty≠0, T*, Tm, ', ") appends '\n' only
  *     if the page already has text and doesn't already end in '\n'
  *     (so the positioning op that starts a page emits nothing);
  *   - a TJ kern adjustment ≤ -100 (thousandths of an em) appends one
  *     space; larger (less negative) kerns append nothing;
  *   - a page's /Contents array decodes in order and concatenates
  *     with a single space byte (the spec's "treated as one stream");
  *   - page texts are returned separately; callers pick the joiner.
  */
object PdfCodec {

  /** `info`: the document-information dictionary's text fields
    * (Title/Author/Subject/Producer/Keywords when present) — PDF text
    * strings decode as UTF-16BE when BOM-prefixed, PDFDocEncoding
    * (≈ Latin-1 on the printable range) otherwise.
    *
    * `encrypted`: the trailer carries /Encrypt (ISO 32000-1 §7.6) —
    * content streams and strings are RC4/AES ciphertext, so no text or
    * /Info is recoverable without the security handler; the document
    * still PARSES (xref, page tree) but must classify as encrypted,
    * never as successfully-extracted-with-zero-text. Pages and info
    * are empty when set. */
  final case class PdfDoc(version: String, nPages: Int, pages: Vector[String],
                          info: Map[String, String] = Map.empty,
                          encrypted: Boolean = false) {
    def text: String = pages.mkString("\n")
  }

  /** Decode a PDF TEXT STRING (ISO 32000-1 §7.9.2.2): UTF-16BE with
    * BOM, else PDFDocEncoding ≈ Latin-1. */
  private def textString(bs: Array[Byte]): String =
    if (bs.length >= 2 && (bs(0) & 0xff) == 0xFE && (bs(1) & 0xff) == 0xFF)
      new String(bs, 2, bs.length - 2, StandardCharsets.UTF_16BE)
    else new String(bs, StandardCharsets.ISO_8859_1)

  private val InfoKeys = Seq("Title", "Author", "Subject", "Producer", "Keywords")

  private val MaxInput = 64 << 20
  private val MaxStreamOut = 32 << 20
  private val MaxObjects = 100000
  private val MaxPages = 10000
  private val MaxDepth = 48
  private val MaxOps = 2000000
  private val MaxPageChars = 4 << 20

  // ── COS object model ─────────────────────────────────────────────
  sealed trait Obj
  case object PNull extends Obj
  final case class PBool(v: Boolean) extends Obj
  final case class PNum(v: Double) extends Obj {
    def int: Int = v.toInt
    def long: Long = v.toLong
  }
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(v: String) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  // ── lexer / parser ───────────────────────────────────────────────
  private def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent COS parser over a byte window. Mutable cursor;
    * every entry point is bounds-checked and depth-capped. */
  private final class Lexer(val b: Array[Byte], var pos: Int) {
    def eof: Boolean = pos >= b.length
    def peek: Int = if (eof) -1 else b(pos) & 0xff

    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = b(pos) & 0xff
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to EOL
          while (!eof && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else go = false
      }
    }

    /** Next run of regular characters (keyword/number), empty at delim. */
    def token(): String = {
      skipWs()
      val s = pos
      while (!eof && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff)) pos += 1
      new String(b, s, pos - s, StandardCharsets.ISO_8859_1)
    }

    def expect(s: String): Boolean = {
      skipWs()
      if (pos + s.length > b.length) return false
      var i = 0
      while (i < s.length) {
        if (b(pos + i) != s.charAt(i)) return false
        i += 1
      }
      pos += s.length
      true
    }

    private def name(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (!eof && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff) && sb.length < 256) {
        val c = b(pos) & 0xff
        if (c == '#' && pos + 2 < b.length) {
          val h = Character.digit(b(pos + 1), 16)
          val l = Character.digit(b(pos + 2), 16)
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
          else { sb.append(c.toChar); pos += 1 }
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def literalString(): PStr = {
      pos += 1 // '('
      val out = new ByteArrayOutputStream()
      var depth = 1
      while (!eof && depth > 0 && out.size < MaxStreamOut) {
        val c = b(pos) & 0xff; pos += 1
        c match {
          case '(' => depth += 1; out.write(c)
          case ')' => depth -= 1; if (depth > 0) out.write(c)
          case '\\' if !eof =>
            val e = b(pos) & 0xff; pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (!eof && b(pos) == '\n') pos += 1 // line continuation
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && !eof && b(pos) >= '0' && b(pos) <= '7') {
                  v = (v << 3) | (b(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other)
            }
          case _ => out.write(c)
        }
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PStr = {
      pos += 1 // '<'
      val out = new ByteArrayOutputStream()
      var hi = -1
      var go = true
      while (go && !eof && out.size < MaxStreamOut) {
        val c = b(pos) & 0xff; pos += 1
        if (c == '>') go = false
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) {
            if (hi < 0) hi = d
            else { out.write((hi << 4) | d); hi = -1 }
          } // whitespace and junk skip
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd count pads 0
      PStr(out.toByteArray)
    }

    /** Parse one object. Numbers look ahead for `gen R` to form refs. */
    def obj(depth: Int): Option[Obj] = {
      if (depth > MaxDepth) return None
      skipWs()
      if (eof) return None
      val c = peek
      if (c == '/') Some(name())
      else if (c == '(') Some(literalString())
      else if (c == '<') {
        if (pos + 1 < b.length && b(pos + 1) == '<') {
          pos += 2
          val m = mutable.LinkedHashMap[String, Obj]()
          var go = true
          while (go && m.size < 4096) {
            skipWs()
            if (eof) go = false
            else if (peek == '>' && pos + 1 < b.length && b(pos + 1) == '>') {
              pos += 2; go = false
            } else if (peek == '/') {
              val k = name().v
              obj(depth + 1) match {
                case Some(v) => m(k) = v
                case None => go = false
              }
            } else go = false // malformed key
          }
          Some(PDict(m.toMap))
        } else Some(hexString())
      } else if (c == '[') {
        pos += 1
        val items = Vector.newBuilder[Obj]
        var n = 0
        var go = true
        while (go && n < 65536) {
          skipWs()
          if (eof) go = false
          else if (peek == ']') { pos += 1; go = false }
          else obj(depth + 1) match {
            case Some(v) => items += v; n += 1
            case None => go = false
          }
        }
        Some(PArr(items.result()))
      } else if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        val t = token()
        val num = try PNum(t.toDouble) catch { case _: NumberFormatException => return None }
        // integer may open a reference: `n g R`
        if (num.v >= 0 && num.v == math.floor(num.v) && num.v < Int.MaxValue) {
          val save = pos
          skipWs()
          val t2 = token()
          if (t2.nonEmpty && t2.length < 9 && t2.forall(_.isDigit)) {
            skipWs()
            if (token() == "R") return Some(PRef(num.int, t2.toInt))
          }
          pos = save // not a ref: rewind fully
        }
        Some(num)
      } else {
        val t = token()
        t match {
          case "true" => Some(PBool(true))
          case "false" => Some(PBool(false))
          case "null" => Some(PNull)
          case "" => if (!eof) pos += 1; None // stray delimiter
          case _ => None // operator/keyword — caller's business
        }
      }
    }
  }

  // ── stream filters ───────────────────────────────────────────────
  private def inflate(raw: Array[Byte], cap: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new ByteArrayOutputStream(math.min(raw.length * 4 + 64, cap))
      val buf = new Array[Byte](8192)
      var go = true
      while (go && !inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) {
          if (out.size + n > cap) return None // zip-bomb guard
          out.write(buf, 0, n)
        } else if (inf.needsInput() || inf.needsDictionary()) go = false
      }
      if (out.size == 0 && raw.nonEmpty && !inf.finished()) None
      else Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** LZWDecode (ISO 32000-1 §7.4.4 — the TIFF flavor): 8-bit data,
    * codes packed MSB-first (the opposite bit order of GIF's LZW in
    * [[MediaHeaders.lzwDecode]]), CLEAR=256, EOD=257, first dictionary
    * entry 258, code width grows 9→12 bits. With EarlyChange=1 (the
    * default) the width bumps ONE CODE EARLY — when the next entry to
    * be assigned is 2^width − 1 — because the encoder must widen
    * before emitting the code that references that entry; with
    * EarlyChange=0 it bumps at 2^width. Output length is not known in
    * advance (unlike GIF's pixel count), so the buffer grows under the
    * stream cap. Returns None on out-of-range codes or cap breach. */
  private[codec] def lzwMsb(raw: Array[Byte], earlyChange: Int, cap: Int): Option[Array[Byte]] = {
    val Clear = 256; val Eod = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    val out = new ByteArrayOutputStream(math.min(raw.length * 4 + 64, cap))
    val early = if (earlyChange == 0) 0 else 1
    var codeSize = 9
    var nextCode = Eod + 1
    var prev = -1
    var acc = 0L; var nbits = 0; var di = 0
    def emitChain(code: Int): Int = { // returns the chain's FIRST byte
      var sp = 0
      var c = code
      while (c > Eod) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      out.write(c)
      while (sp > 0) { sp -= 1; out.write(stack(sp)) }
      c
    }
    var running = true
    while (running) {
      while (nbits < codeSize && di < raw.length) {
        acc = (acc << 8) | (raw(di) & 0xffL); nbits += 8; di += 1
      }
      if (nbits < codeSize) running = false // stream end without EOD: accept
      else {
        val code = ((acc >> (nbits - codeSize)) & ((1L << codeSize) - 1)).toInt
        nbits -= codeSize
        acc &= (1L << nbits) - 1
        if (code == Clear) { codeSize = 9; nextCode = Eod + 1; prev = -1 }
        else if (code == Eod) running = false
        else if (prev == -1) {
          if (code >= Clear) return None // first code after clear must be a literal
          emitChain(code); prev = code
        } else if (code < nextCode && code != Clear && code != Eod) {
          val first = emitChain(code)
          if (nextCode < 4096) {
            prefix(nextCode) = prev; suffix(nextCode) = first.toByte; nextCode += 1
          }
          prev = code
        } else if (code == nextCode && nextCode < 4096) {
          // k-omega-k: the entry being defined is itself emitted
          prefix(nextCode) = prev
          suffix(nextCode) = { var c = prev; while (c > Eod) c = prefix(c); c.toByte }
          nextCode += 1
          emitChain(nextCode - 1)
          prev = code
        } else return None // out-of-range code
        if (prev != -1 && nextCode + early >= (1 << codeSize) && codeSize < 12)
          codeSize += 1
        if (out.size > cap) return None // bomb guard
      }
    }
    Some(out.toByteArray)
  }

  private def asciiHex(raw: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var go = true
    while (go && i < raw.length) {
      val c = raw(i) & 0xff
      if (c == '>') go = false
      else if (!isWs(c)) {
        val d = Character.digit(c, 16)
        if (d < 0) return None
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    Some(out.toByteArray)
  }

  /** ASCII85Decode (ISO 32000-1 §7.4.3): 5 chars '!'..'u' → 4 bytes
    * base-85 big-endian, 'z' = four zero bytes between groups, optional
    * `<~` prologue, `~` terminator, whitespace ignored; a partial final
    * group of n chars pads with 'u' and emits n−1 bytes (n=1 invalid). */
  private[codec] def ascii85(raw: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var gi = 0
    var i = 0
    var done = false
    if (raw.length >= 2 && raw(0) == '<' && raw(1) == '~') i = 2
    def flush(n: Int): Unit = {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < n) grp(k) else 84); k += 1 }
      val bs = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(bs, 0, math.max(0, n - 1))
    }
    while (i < raw.length && !done && out.size < MaxStreamOut) {
      val c = raw(i) & 0xff
      if (isWs(c)) ()
      else if (c == '~') done = true
      else if (c == 'z' && gi == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (c >= '!' && c <= 'u') {
        grp(gi) = c - '!'
        gi += 1
        if (gi == 5) { flush(5); gi = 0 }
      } else return None
      i += 1
    }
    if (gi == 1) return None // a lone trailing char encodes nothing
    if (gi >= 2) flush(gi)
    Some(out.toByteArray)
  }

  /** PNG predictors 10-15 (row filter byte + Sub/Up/Avg/Paeth) and
    * TIFF predictor 2 — xref streams almost always ride predictor 12
    * (Up). Same row algebra as the PNG decoder in [[MediaHeaders]]. */
  private def unpredict(data: Array[Byte], predictor: Int, colors: Int,
                        bpc: Int, columns: Int): Option[Array[Byte]] = {
    if (predictor < 2) return Some(data)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = math.max(1, (columns.toLong * colors * bpc / 8).toInt)
    if (predictor == 2) { // TIFF: horizontal differencing
      val out = data.clone()
      var r = 0
      while ((r + 1) * rowLen <= out.length) {
        var i = r * rowLen + bpp
        while (i < (r + 1) * rowLen) {
          out(i) = ((out(i) & 0xff) + (out(i - bpp) & 0xff)).toByte
          i += 1
        }
        r += 1
      }
      return Some(out)
    }
    // PNG: each row prefixed with a filter byte
    val stride = rowLen + 1
    if (data.length % stride != 0) return None
    val rows = data.length / stride
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * stride) & 0xff
      var i = 0
      while (i < rowLen) {
        val x = data(r * stride + 1 + i) & 0xff
        val a = if (i >= bpp) out(r * rowLen + i - bpp) & 0xff else 0
        val bU = if (r > 0) out((r - 1) * rowLen + i) & 0xff else 0
        val cD = if (r > 0 && i >= bpp) out((r - 1) * rowLen + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + bU
          case 3 => x + ((a + bU) >> 1)
          case 4 =>
            val p = a + bU - cD
            val pa = math.abs(p - a); val pb = math.abs(p - bU); val pc = math.abs(p - cD)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bU else cD)
          case _ => return None
        }
        out(r * rowLen + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some(out)
  }

  // ── document reader ──────────────────────────────────────────────
  private final class Reader(val b: Array[Byte]) {
    /** num → Left(byte offset) | Right((objstm num, index in stream)) */
    val offsets = mutable.HashMap[Int, Either[Int, (Int, Int)]]()
    private val cache = mutable.HashMap[Int, Option[Obj]]()
    private val loading = mutable.HashSet[Int]() // cycle guard
    var trailer: Map[String, Obj] = Map.empty

    def resolve(o: Obj, depth: Int = 0): Option[Obj] = o match {
      case PRef(n, _) if depth < MaxDepth => load(n).flatMap(resolve(_, depth + 1))
      case PRef(_, _) => None
      case other => Some(other)
    }

    def dictOf(o: Obj): Option[PDict] = resolve(o) match {
      case Some(d: PDict) => Some(d)
      case Some(PStream(d, _)) => Some(d)
      case _ => None
    }

    def intOf(o: Obj): Option[Int] = resolve(o) match {
      case Some(n: PNum) => Some(n.int)
      case _ => None
    }

    def load(num: Int): Option[Obj] = cache.getOrElseUpdate(num, {
      if (loading.contains(num) || cache.size > MaxObjects) None
      else {
        loading += num
        val r = offsets.get(num) match {
          case Some(Left(off)) => parseIndirectAt(off).map(_._2)
          case Some(Right((stmNum, idx))) => fromObjStm(stmNum, idx)
          case None => None
        }
        loading -= num
        r
      }
    })

    /** Parse `num gen obj <object> [stream…endstream] endobj` at off. */
    def parseIndirectAt(off: Int): Option[(Int, Obj)] = {
      if (off < 0 || off >= b.length) return None
      val lx = new Lexer(b, off)
      val t1 = lx.token(); val t2 = lx.token(); val t3 = lx.token()
      if (t3 != "obj" || !t1.forall(_.isDigit) || t1.isEmpty) return None
      val num = try t1.toInt catch { case _: NumberFormatException => return None }
      val _ = t2
      val body = lx.obj(0).getOrElse(return None)
      lx.skipWs()
      // stream?
      body match {
        case d: PDict if lx.expect("stream") =>
          // EOL after `stream`: CRLF or LF
          if (!lx.eof && lx.b(lx.pos) == '\r') lx.pos += 1
          if (!lx.eof && lx.b(lx.pos) == '\n') lx.pos += 1
          val start = lx.pos
          val lenOpt = d.get("Length").flatMap(intOf)
          val end = lenOpt match {
            case Some(len) if len >= 0 && start.toLong + len <= b.length &&
                endsStream(start + len) => start + len
            case _ => findEndstream(start) // lying/indirect-broken /Length
          }
          if (end < start) None
          else Some((num, PStream(d, java.util.Arrays.copyOfRange(b, start, end))))
        case other => Some((num, other))
      }
    }

    private def endsStream(at: Int): Boolean = {
      var i = at
      var guard = 0
      while (i < b.length && guard < 4 && isWs(b(i) & 0xff)) { i += 1; guard += 1 }
      i + 9 <= b.length && new String(b, i, 9, StandardCharsets.ISO_8859_1) == "endstream"
    }

    private def findEndstream(from: Int): Int = {
      var i = from
      while (i + 9 <= b.length) {
        if (b(i) == 'e' && new String(b, i, 9, StandardCharsets.ISO_8859_1) == "endstream") {
          var e = i
          // trim the EOL that belongs to the marker, not the data
          if (e > from && b(e - 1) == '\n') e -= 1
          if (e > from && b(e - 1) == '\r') e -= 1
          return e
        }
        i += 1
      }
      -1
    }

    /** /DecodeParms predictor pass shared by Flate and LZW (both
      * filters take the same Predictor/Colors/BitsPerComponent/Columns
      * parameters per §7.4.4.4). */
    private def applyPredictor(data: Array[Byte], p: Option[PDict]): Option[Array[Byte]] =
      p match {
        case Some(d) =>
          val pred = d.get("Predictor").flatMap(intOf).getOrElse(1)
          if (pred <= 1) Some(data)
          else {
            val colors = d.get("Colors").flatMap(intOf).getOrElse(1)
            val bpc = d.get("BitsPerComponent").flatMap(intOf).getOrElse(8)
            val cols = d.get("Columns").flatMap(intOf).getOrElse(1)
            unpredict(data, pred, colors, bpc, cols)
          }
        case None => Some(data)
      }

    /** Decode a stream through its /Filter chain. */
    def decode(s: PStream): Option[Array[Byte]] = {
      val filters: Vector[String] = s.dict.get("Filter") match {
        case None => Vector.empty
        case Some(PName(n)) => Vector(n)
        case Some(PArr(xs)) => xs.collect { case PName(n) => n }
        case Some(r: PRef) => resolve(r) match {
          case Some(PName(n)) => Vector(n)
          case Some(PArr(xs)) => xs.collect { case PName(n) => n }
          case _ => return None
        }
        case _ => return None
      }
      val parms: Vector[Option[PDict]] = s.dict.get("DecodeParms")
        .orElse(s.dict.get("DP")).flatMap(resolve(_)) match {
        case Some(d: PDict) => Vector(Some(d))
        case Some(PArr(xs)) => xs.map {
          case d: PDict => Some(d)
          case r: PRef => dictOf(r)
          case _ => None
        }
        case _ => Vector.empty
      }
      var data = s.raw
      var i = 0
      while (i < filters.length) {
        val p = if (i < parms.length) parms(i) else None
        filters(i) match {
          case "FlateDecode" | "Fl" =>
            data = inflate(data, MaxStreamOut).getOrElse(return None)
            data = applyPredictor(data, p).getOrElse(return None)
          case "LZWDecode" | "LZW" =>
            val early = p.flatMap(_.get("EarlyChange")).flatMap(intOf).getOrElse(1)
            data = lzwMsb(data, early, MaxStreamOut).getOrElse(return None)
            data = applyPredictor(data, p).getOrElse(return None)
          case "ASCIIHexDecode" | "AHx" =>
            data = asciiHex(data).getOrElse(return None)
          case "ASCII85Decode" | "A85" =>
            data = ascii85(data).getOrElse(return None)
          case _ => return None // unsupported filter: skip this stream
        }
        i += 1
      }
      Some(data)
    }

    /** Expand an object stream: header is N pairs `objnum offset`,
      * objects start at /First. */
    private def fromObjStm(stmNum: Int, idx: Int): Option[Obj] =
      (offsets.get(stmNum) match {
        case Some(Left(off)) => parseIndirectAt(off).map(_._2)
        case _ => None
      }) match {
        case Some(s: PStream) =>
          for {
            data <- decode(s)
            n <- s.dict.get("N").flatMap(intOf)
            first <- s.dict.get("First").flatMap(intOf)
            if idx >= 0 && idx < n && n <= 65536 && first >= 0 && first <= data.length
            lx = new Lexer(data, 0)
            pairs = Vector.fill(math.min(n, 65536)) {
              val a = lx.token(); val b2 = lx.token()
              (a, b2)
            }
            if pairs.length > idx && pairs(idx)._2.forall(_.isDigit) && pairs(idx)._2.nonEmpty
            objOff = first + pairs(idx)._2.toInt
            if objOff >= 0 && objOff <= data.length
            o <- new Lexer(data, objOff).obj(0)
          } yield o
        case _ => None
      }

    // ── xref bootstrap ──────────────────────────────────────────────
    def loadXref(): Boolean = {
      val tail = new String(b, math.max(0, b.length - 2048),
        math.min(2048, b.length), StandardCharsets.ISO_8859_1)
      val sx = tail.lastIndexOf("startxref")
      if (sx < 0) return false
      val lx = new Lexer(b, math.max(0, b.length - 2048) + sx + "startxref".length)
      val t = lx.token()
      if (t.isEmpty || !t.forall(_.isDigit)) return false
      var off = try t.toLong catch { case _: NumberFormatException => return false }
      var hops = 0
      while (off >= 0 && off < b.length && hops < 64) {
        hops += 1
        val next = loadXrefSection(off.toInt)
        off = next.getOrElse(-1L)
      }
      hops > 0 && trailer.nonEmpty && offsets.nonEmpty
    }

    /** One xref section (table or stream) at `off`; returns /Prev. */
    private def loadXrefSection(off: Int): Option[Long] = {
      val lx = new Lexer(b, off)
      val save = lx.pos
      if (lx.expect("xref")) { // classic table
        var go = true
        while (go) {
          lx.skipWs()
          if (lx.expect("trailer")) {
            lx.obj(0) match {
              case Some(d: PDict) =>
                // earlier (newer) trailers win for /Root /Size; merge keys
                trailer = d.m ++ trailer
                return d.get("Prev").flatMap(intOf).map(_.toLong)
              case _ => return None
            }
          }
          val startT = lx.token(); val countT = lx.token()
          if (startT.isEmpty || countT.isEmpty ||
            !startT.forall(_.isDigit) || !countT.forall(_.isDigit)) go = false
          else {
            val start = startT.toInt; val count = math.min(countT.toLong, MaxObjects.toLong).toInt
            lx.skipWs()
            var i = 0
            while (i < count && lx.pos + 18 <= b.length) {
              val ent = new String(b, lx.pos, 18, StandardCharsets.ISO_8859_1)
              val o = ent.substring(0, 10); val ty = ent.charAt(17)
              // a 10-digit offset can overflow Int on hostile bytes —
              // skip the entry (the scan fallback still recovers) rather
              // than abort the whole xref walk
              val off = scala.util.Try(o.trim.toInt).getOrElse(-1)
              if (ty == 'n' && off >= 0)
                // newer sections parsed first: first writer wins
                offsets.getOrElseUpdate(start + i, Left(off))
              lx.pos += 18
              // entries are 20 bytes incl. EOL; tolerate 19/20
              while (lx.pos < b.length && isWs(b(lx.pos) & 0xff) &&
                (b(lx.pos) == ' ' || b(lx.pos) == '\r' || b(lx.pos) == '\n')) lx.pos += 1
              i += 1
            }
            if (i < count) go = false
          }
        }
        None
      } else { // xref STREAM
        lx.pos = save
        parseIndirectAt(off) match {
          case Some((_, s: PStream)) if s.dict.get("Type").contains(PName("XRef")) =>
            val data = decode(s).getOrElse(return None)
            val w = s.dict.get("W") match {
              case Some(PArr(xs)) => xs.flatMap(intOf(_))
              case _ => return None
            }
            if (w.length < 3 || w.exists(x => x < 0 || x > 8)) return None
            val rowLen = w.sum
            if (rowLen <= 0) return None
            val size = s.dict.get("Size").flatMap(intOf).getOrElse(0)
            val index: Vector[(Int, Int)] = s.dict.get("Index") match {
              case Some(PArr(xs)) =>
                val ns = xs.flatMap(intOf(_))
                ns.grouped(2).collect { case Vector(a, c) => (a, c) }.toVector
              case _ => Vector((0, size))
            }
            var p = 0
            def field(width: Int): Long = {
              var v = 0L; var k = 0
              while (k < width) { v = (v << 8) | (data(p) & 0xff); p += 1; k += 1 }
              v
            }
            index.foreach { case (start, count) =>
              var i = 0
              while (i < count && p + rowLen <= data.length) {
                val t = if (w(0) == 0) 1L else field(w(0))
                val f2 = field(w(1)); val f3 = field(w(2))
                val num = start + i
                t match {
                  case 1 => offsets.getOrElseUpdate(num, Left(f2.toInt))
                  case 2 => offsets.getOrElseUpdate(num, Right((f2.toInt, f3.toInt)))
                  case _ => // free
                }
                i += 1
              }
            }
            trailer = s.dict.m ++ trailer
            s.dict.get("Prev").flatMap(intOf).map(_.toLong)
          case _ => None
        }
      }
    }

    /** Last-resort bootstrap: scan the whole byte range for
      * `num gen obj` headers (later definitions win — appended
      * incremental updates supersede), then expand every /ObjStm. */
    def scanObjects(): Unit = {
      var i = 0
      val n = b.length
      var found = 0
      while (i + 3 < n && found < MaxObjects) {
        if (b(i) == 'o' && b(i + 1) == 'b' && b(i + 2) == 'j' &&
          (i + 3 >= n || isWs(b(i + 3) & 0xff) || isDelim(b(i + 3) & 0xff))) {
          // backtrack: ws, gen digits, ws, num digits
          var j = i - 1
          while (j >= 0 && isWs(b(j) & 0xff)) j -= 1
          val genEnd = j
          while (j >= 0 && b(j) >= '0' && b(j) <= '9') j -= 1
          val genStart = j + 1
          if (genEnd >= genStart) {
            while (j >= 0 && isWs(b(j) & 0xff)) j -= 1
            val numEnd = j
            while (j >= 0 && b(j) >= '0' && b(j) <= '9') j -= 1
            val numStart = j + 1
            if (numEnd >= numStart && numEnd - numStart < 9 &&
              (numStart == 0 || isWs(b(numStart - 1) & 0xff) || isDelim(b(numStart - 1) & 0xff))) {
              val numStr = new String(b, numStart, numEnd - numStart + 1, StandardCharsets.ISO_8859_1)
              offsets(numStr.toInt) = Left(numStart) // later wins
              found += 1
            }
          }
        }
        i += 1
      }
      // expand object streams found by the scan — cheap byte pre-filter
      // first ("/ObjStm" within the dict window) so hostile inputs with
      // 100k scanned objects don't pay a full parse-and-slice each
      val stmNums = offsets.collect { case (n2, Left(off)) => (n2, off) }.toVector
      stmNums.foreach { case (n2, off) =>
        val window = new String(b, off,
          math.min(512, b.length - off), StandardCharsets.ISO_8859_1)
        if (!window.contains("ObjStm")) ()
        else parseIndirectAt(off) match {
          case Some((_, s: PStream)) if s.dict.get("Type").contains(PName("ObjStm")) =>
            for {
              data <- decode(s)
              cnt <- s.dict.get("N").flatMap(intOf)
            } {
              val lx = new Lexer(data, 0)
              var i2 = 0
              while (i2 < math.min(cnt, 65536)) {
                val a = lx.token(); val o = lx.token()
                if (a.nonEmpty && a.forall(_.isDigit) && o.nonEmpty && o.forall(_.isDigit))
                  offsets.getOrElseUpdate(a.toInt, Right((n2, i2)))
                i2 += 1
              }
            }
          case _ =>
        }
      }
      if (trailer.isEmpty) {
        // recover trailer dicts from `trailer` keywords — later in the
        // file = newer incremental update, so the scan walks BACKWARD
        // from the end and earlier-processed (= newer) keys win (the
        // loadXrefSection convention). Newest-first also makes the
        // 64-occurrence cap safe: real trailers live at the file end,
        // so a long update history (or the word `trailer` inside
        // uncompressed content bytes) can never starve the
        // authoritative newest dict the way a capped forward scan
        // could. This is what carries /Encrypt (and /Info) through
        // the scan path: an encrypted PDF with a rotten xref must
        // still classify as encrypted, not
        // parse-ok-with-undecodable-streams.
        // ... and it STOPS at the first dict that parses: the newest
        // trailer is authoritative, and merging older (or worse,
        // content-byte) dicts underneath it would let a stray
        // `trailer << /Encrypt … >>` inside an uncompressed stream
        // inject keys the real trailer never carried. /Root recovery
        // for trailer-less files stays with the catalog fallback
        // below.
        var ti = b.length - 7
        var scans = 0
        while (ti >= 0 && scans < 64 && trailer.isEmpty) {
          if (b(ti) == 't' && new String(b, ti, 7, StandardCharsets.ISO_8859_1) == "trailer") {
            scans += 1
            new Lexer(b, ti + 7).obj(0) match {
              case Some(d: PDict) => trailer = d.m
              case _ =>
            }
          }
          ti -= 1
        }
      }
      if (!trailer.contains("Root")) {
        // find a catalog for /Root
        val cat = offsets.keys.toVector.sorted.find(n2 => load(n2) match {
          case Some(d: PDict) => d.get("Type").contains(PName("Catalog"))
          case _ => false
        })
        cat.foreach(n2 => trailer = trailer + ("Root" -> PRef(n2, 0)))
      }
    }

    /** The trailer carries /Encrypt (a ref to the encryption dict, or
      * the dict inline) when the document's strings and streams are
      * ciphertext. PNull (an explicit removal in an incremental
      * update) reads as not-encrypted. */
    def isEncrypted: Boolean = trailer.get("Encrypt") match {
      case None | Some(PNull) => false
      case _ => true
    }
  }

  // ── fonts ────────────────────────────────────────────────────────
  /** WinAnsiEncoding as a 256-char table — windows-1252's printable
    * map (the PDF table and cp1252 agree on every defined slot). */
  private[codec] val WinAnsi: Array[Char] = {
    val t = new Array[Char](256)
    val dec = java.nio.charset.Charset.forName("windows-1252")
    var i = 0
    while (i < 256) {
      val s = new String(Array(i.toByte), dec)
      t(i) = if (s.length == 1) s.charAt(0) else i.toChar
      i += 1
    }
    t
  }

  private sealed trait FontDec
  private case object Latin1Font extends FontDec
  private case object WinAnsiFont extends FontDec
  /** ToUnicode CMap: code width in bytes (1 or 2) + code → string. */
  private final case class CMapFont(width: Int, map: Map[Int, String]) extends FontDec

  /** Parse a ToUnicode CMap (PostScript-ish, but bfchar/bfrange blocks
    * are regular enough to walk with the COS lexer). */
  private def parseCMap(data: Array[Byte]): Option[CMapFont] = {
    val lx = new Lexer(data, 0)
    var width = 2
    val map = mutable.HashMap[Int, String]()
    def finish(): Option[CMapFont] =
      if (map.nonEmpty) Some(CMapFont(width, map.toMap)) else None
    def codeOf(s: PStr): Int = {
      var v = 0
      s.bytes.foreach(b2 => v = (v << 8) | (b2 & 0xff))
      v
    }
    def strOf(s: PStr): String = {
      // UTF-16BE payload
      val bs = s.bytes
      if (bs.length % 2 != 0) new String(bs, StandardCharsets.ISO_8859_1)
      else new String(bs, StandardCharsets.UTF_16BE)
    }
    var guard = 0
    while (!lx.eof && guard < 100000) {
      guard += 1
      lx.skipWs()
      if (lx.eof) return finish()
      val c = lx.peek
      if (c == '<' || c == '(' || c == '[' || c == '/' ||
        c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        lx.obj(0) match {
          case Some(_) => // operand; block keywords drive the walk below
          case None => if (!lx.eof) lx.pos += 1
        }
      } else {
        val kw = lx.token()
        kw match {
          case "begincodespacerange" =>
            // <lo> <hi> pairs until endcodespacerange
            var go = true
            while (go && !lx.eof) {
              lx.skipWs()
              if (lx.peek == '<') {
                (lx.obj(0), { lx.skipWs(); if (lx.peek == '<') lx.obj(0) else None }) match {
                  case (Some(lo: PStr), Some(_: PStr)) => width = math.max(1, math.min(2, lo.bytes.length))
                  case _ => go = false
                }
              } else { lx.token(); go = false } // endcodespacerange
            }
          case "beginbfchar" =>
            var go = true
            while (go && !lx.eof && map.size < 65536) {
              lx.skipWs()
              if (lx.peek == '<' || lx.peek == '(') {
                (lx.obj(0), { lx.skipWs(); lx.obj(0) }) match {
                  case (Some(src: PStr), Some(dst: PStr)) => map(codeOf(src)) = strOf(dst)
                  case _ => go = false
                }
              } else { lx.token(); go = false } // endbfchar
            }
          case "beginbfrange" =>
            var go = true
            while (go && !lx.eof && map.size < 65536) {
              lx.skipWs()
              if (lx.peek == '<') {
                val lo = lx.obj(0); lx.skipWs(); val hi = lx.obj(0); lx.skipWs()
                val dst = lx.obj(0)
                (lo, hi, dst) match {
                  case (Some(l: PStr), Some(h: PStr), Some(d: PStr)) =>
                    val from = codeOf(l); val to = math.min(codeOf(h), from + 65535)
                    val base = strOf(d)
                    if (base.nonEmpty) {
                      var k = from
                      while (k <= to && map.size < 65536) {
                        val off = k - from
                        val s2 = base.dropRight(1) :+ (base.last + off).toChar
                        map(k) = s2.mkString
                        k += 1
                      }
                    }
                  case (Some(l: PStr), Some(h: PStr), Some(PArr(xs))) =>
                    val from = codeOf(l); val to = math.min(codeOf(h), from + xs.length - 1)
                    var k = from
                    while (k <= to && map.size < 65536) {
                      xs(k - from) match {
                        case d: PStr => map(k) = strOf(d)
                        case _ =>
                      }
                      k += 1
                    }
                  case _ => go = false
                }
              } else { lx.token(); go = false } // endbfrange
            }
          case "" => if (!lx.eof) lx.pos += 1
          case _ => // other PostScript noise
        }
      }
    }
    finish()
  }

  private def fontOf(r: Reader, fd: PDict): FontDec = {
    fd.get("ToUnicode").flatMap(r.resolve(_)) match {
      case Some(s: PStream) =>
        r.decode(s).flatMap(parseCMap) match {
          case Some(cm) => return cm
          case None =>
        }
      case _ =>
    }
    fd.get("Encoding").flatMap(r.resolve(_)) match {
      case Some(PName("WinAnsiEncoding")) => WinAnsiFont
      case Some(d: PDict) if d.get("BaseEncoding").contains(PName("WinAnsiEncoding")) =>
        WinAnsiFont
      case _ => Latin1Font
    }
  }

  private def showBytes(sb: StringBuilder, bytes: Array[Byte], font: FontDec): Unit = {
    if (sb.length > MaxPageChars) return
    font match {
      case CMapFont(width, map) =>
        var i = 0
        while (i + width <= bytes.length) {
          var code = 0
          var k = 0
          while (k < width) { code = (code << 8) | (bytes(i + k) & 0xff); k += 1 }
          map.get(code) match {
            case Some(s) => sb.append(s)
            case None => // unmapped code drops (no glyph, no text)
          }
          i += width
        }
      case WinAnsiFont => bytes.foreach(b2 => sb.append(WinAnsi(b2 & 0xff)))
      case Latin1Font => bytes.foreach(b2 => sb.append((b2 & 0xff).toChar))
    }
  }

  // ── content interpreter ──────────────────────────────────────────
  private def runContent(r: Reader, content: Array[Byte],
                         fonts: Map[String, FontDec]): String = {
    val sb = new StringBuilder
    val lx = new Lexer(content, 0)
    val stack = mutable.ArrayBuffer[Obj]()
    var font: FontDec = WinAnsiFont
    var inText = false
    var ops = 0
    def moveLine(): Unit =
      if (sb.nonEmpty && sb.last != '\n' && sb.length < MaxPageChars) sb.append('\n')
    def show(o: Obj): Unit = o match {
      case PStr(bs) => if (inText) showBytes(sb, bs, font)
      case _ =>
    }
    while (!lx.eof && ops < MaxOps && sb.length < MaxPageChars) {
      ops += 1
      lx.skipWs()
      if (lx.eof) return sb.toString
      val c = lx.peek
      if (c == '/' || c == '(' || c == '<' || c == '[' ||
        c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        lx.obj(0) match {
          case Some(o) => if (stack.size < 64) stack += o
          case None => if (!lx.eof) lx.pos += 1
        }
      } else if (c == ')' || c == ']' || c == '>' || c == '}' || c == '{') {
        lx.pos += 1 // stray delimiter in hostile input
      } else {
        val op = lx.token()
        op match {
          case "BT" => inText = true
          case "ET" => inText = false
          case "Tf" =>
            stack.collectFirst { case PName(n) => n }
              .flatMap(fonts.get).foreach(font = _)
          case "Td" | "TD" =>
            if (stack.size >= 2) stack(stack.size - 1) match {
              case PNum(ty) if ty != 0 => if (inText) moveLine()
              case _ =>
            }
          case "T*" => if (inText) moveLine()
          case "Tm" => if (inText) moveLine()
          case "Tj" => stack.lastOption.foreach(show)
          case "'" =>
            if (inText) moveLine()
            stack.lastOption.foreach(show)
          case "\"" =>
            if (inText) moveLine()
            stack.lastOption.foreach(show)
          case "TJ" =>
            stack.lastOption match {
              case Some(PArr(items)) if inText =>
                items.foreach {
                  case s: PStr => show(s)
                  case PNum(v) =>
                    if (v <= -100 && sb.length < MaxPageChars) sb.append(' ')
                  case _ =>
                }
              case _ =>
            }
          case "" => if (!lx.eof) lx.pos += 1
          case _ => // every other operator: drawing/state — irrelevant
        }
        stack.clear()
      }
    }
    sb.toString
  }

  // ── page tree ────────────────────────────────────────────────────
  private def collectPages(r: Reader, node: Obj, inheritedRes: Option[PDict],
                           out: mutable.ArrayBuffer[(PDict, Option[PDict])],
                           seen: mutable.HashSet[Int], depth: Int): Unit = {
    if (depth > MaxDepth || out.size >= MaxPages) return
    node match {
      case PRef(n, _) =>
        if (seen.add(n)) r.load(n).foreach(collectPages(r, _, inheritedRes, out, seen, depth + 1))
      case d: PDict =>
        val res = d.get("Resources").flatMap(r.dictOf).orElse(inheritedRes)
        d.get("Type") match {
          case Some(PName("Page")) => out += ((d, res))
          case _ =>
            d.get("Kids").flatMap(r.resolve(_)) match {
              case Some(PArr(kids)) =>
                kids.foreach(collectPages(r, _, res, out, seen, depth + 1))
              case _ =>
                // a bare dict with /Contents quacks like a page
                if (d.get("Contents").isDefined) out += ((d, res))
            }
        }
      case PStream(d, _) => collectPages(r, d, inheritedRes, out, seen, depth)
      case _ =>
    }
  }

  private def pageText(r: Reader, page: PDict, res: Option[PDict]): String = {
    val fonts: Map[String, FontDec] = res.flatMap(_.get("Font")).flatMap(r.dictOf) match {
      case Some(fd) => fd.m.flatMap { case (k, v) => r.dictOf(v).map(k -> fontOf(r, _)) }
      case None => Map.empty
    }
    val parts: Vector[Array[Byte]] = page.get("Contents").flatMap(r.resolve(_)) match {
      case Some(s: PStream) => r.decode(s).toVector
      case Some(PArr(xs)) =>
        xs.flatMap(x => r.resolve(x) match {
          case Some(s: PStream) => r.decode(s)
          case _ => None
        })
      case _ => Vector.empty
    }
    if (parts.isEmpty) ""
    else {
      // the spec's "contents array is one logical stream": concatenate
      // with a single space so tokens never fuse across parts
      val total = parts.map(_.length.toLong).sum + parts.length
      if (total > MaxStreamOut) return ""
      val joined = new ByteArrayOutputStream(total.toInt)
      parts.zipWithIndex.foreach { case (p, i) =>
        if (i > 0) joined.write(' ')
        joined.write(p)
      }
      runContent(r, joined.toByteArray, fonts)
    }
  }

  /** Extract text from a PDF byte payload. `None` when the bytes are
    * not a PDF or nothing can be recovered; otherwise version, page
    * count, and per-page text under the layout rules above. Never
    * throws; hostile input degrades to None/partial. */
  def extract(b: Array[Byte]): Option[PdfDoc] =
    try extractInner(b)
    catch { case NonFatal(_) => None }

  private def extractInner(b: Array[Byte]): Option[PdfDoc] = {
    if (b == null || b.length < 8 || b.length > MaxInput) return None
    // header within the first 1024 bytes (the spec allows a preamble)
    val head = new String(b, 0, math.min(1024, b.length), StandardCharsets.ISO_8859_1)
    val hIdx = head.indexOf("%PDF-")
    if (hIdx < 0) return None
    val version = head.substring(hIdx + 5, math.min(hIdx + 8, head.length)).takeWhile(c => c.isDigit || c == '.')
    val r = new Reader(b)
    val viaXref = r.loadXref()
    if (!viaXref) r.scanObjects()
    var root = r.trailer.get("Root").flatMap(r.dictOf)
    if (root.isEmpty && viaXref) { // xref present but rotten: rescan
      r.scanObjects()
      root = r.trailer.get("Root").flatMap(r.dictOf)
    }
    // /Encrypt gate BEFORE any content decode: streams and strings are
    // ciphertext, so attempting extraction could only produce the
    // success-with-empty-text lie. Both xref forms merge their dict
    // into `trailer`; the scan fallback recovers trailer keywords.
    if (r.isEncrypted)
      return Some(PdfDoc(if (version.nonEmpty) version else "?", 0,
        Vector.empty, Map.empty, encrypted = true))
    val pagesRoot = root.flatMap(_.get("Pages"))
    val pages = mutable.ArrayBuffer[(PDict, Option[PDict])]()
    pagesRoot.foreach(collectPages(r, _, None, pages, mutable.HashSet[Int](), 0))
    if (pages.isEmpty && root.isEmpty) return None
    val texts = pages.map { case (p, res) => pageText(r, p, res) }.toVector
    val info: Map[String, String] = r.trailer.get("Info").flatMap(r.dictOf) match {
      case Some(d) => InfoKeys.flatMap(k => d.get(k).flatMap(r.resolve(_)) match {
        case Some(PStr(bs)) => Some(k -> textString(bs))
        case _ => None
      }).toMap
      case None => Map.empty
    }
    Some(PdfDoc(if (version.nonEmpty) version else "?", texts.length, texts, info))
  }
}
