package graft.codec

import scala.util.control.NonFatal

/** Bounded RTF text extraction — the legacy-office front gate beside
  * [[PdfCodec]] and [[DocxCodec]]: RTF is the one word-processor
  * format that is plain bytes all the way down (no container, no
  * compression), a token stream of groups `{…}`, control words
  * `\word[-]N` and literal text. The tokenizer here is from scratch
  * against the public RTF 1.9.1 grammar, with the extraction layout
  * pinned exactly (the PdfCodec doctrine — extraction has no single
  * canonical answer, so ours is defined):
  *
  *   - `\par` closes the current paragraph (paragraphs join with
  *     '\n'); `\line` contributes '\n' inside a paragraph; `\tab`
  *     contributes '\t';
  *   - symbol words map to their Unicode characters: `emdash endash
  *     bullet lquote rquote ldblquote rdblquote` (and the control
  *     symbols `\~` → NBSP, `\_` → '-', `\-` → nothing);
  *   - `\'hh` decodes through windows-1252 (the `\ansi` default;
  *     this codec pins cp1252 regardless of `\ansicpgN` — fixtures
  *     and real western docs agree, and a wrong pin is observable
  *     as a hash mismatch, never a crash);
  *   - `\uN` emits the BMP char (negative N + 65536) and skips the
  *     next `\ucN` fallback characters (group-scoped uc, default 1);
  *     a fallback character is a literal byte, a `\'hh` escape or an
  *     escaped `\\ \{ \}` — any OTHER control word or symbol cancels
  *     the remaining skip (the common-parser convention);
  *   - destination groups contribute nothing: the known non-text set
  *     (font/color/style tables, pict, object, field instructions,
  *     headers/footers/footnotes, themedata…) plus every `{\*\…}`
  *     starred destination;
  *   - `{\info…}` is walked for the `{\title…}` / `{\author…}`
  *     sidecar fields (the provenance pair every other document face
  *     exposes) but contributes nothing to the body;
  *   - `\binN` skips N raw bytes; CR/LF in the token stream are
  *     delimiters, never text.
  *
  * NEVER-THROW doctrine: input must open with `{\rtf`; depth, output
  * size and input size are hard-capped; any structural violation
  * (stray `}` before any content-bearing root, hex escape truncated,
  * cap breach) yields None; NonFatal is caught at the API edge. */
object RtfCodec {

  final case class RtfDoc(nParas: Int, paras: Vector[String],
                          title: Option[String], author: Option[String]) {
    def text: String = paras.mkString("\n")
  }

  private val MaxInput = 64 << 20
  private val MaxChars = 4 << 20
  private val MaxParas = 100000
  private val MaxDepth = 128

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** Destinations whose content never reaches the body text. */
  private val SkipDests: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "listtable", "listoverridetable",
    "list", "listoverride", "pict", "object", "objdata", "fldinst",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "footnote", "ftnsep", "ftnsepc",
    "annotation", "atnid", "atnauthor", "themedata", "colorschememapping",
    "datastore", "xmlnstbl", "latentstyles", "rsidtbl", "generator",
    "bkmkstart", "bkmkend", "xe", "tc", "txe")

  /** Symbol control words → their literal text. */
  private val SymbolWords: Map[String, String] = Map(
    "tab" -> "\t", "line" -> "\n", "emdash" -> "—",
    "endash" -> "–", "bullet" -> "•", "lquote" -> "‘",
    "rquote" -> "’", "ldblquote" -> "“", "rdblquote" -> "”")

  // group-emission modes
  private final val Body = 0
  private final val Skip = 1
  private final val Info = 2
  private final val Title = 3
  private final val Author = 4

  def extract(b: Array[Byte]): Option[RtfDoc] = {
    try extractInner(b)
    catch { case NonFatal(_) => None }
  }

  private def extractInner(b: Array[Byte]): Option[RtfDoc] = {
    if (b == null || b.length < 6 || b.length > MaxInput) return None
    if (!(b(0) == '{' && b(1) == '\\' && b(2) == 'r' && b(3) == 't' &&
      b(4) == 'f')) return None

    val paras = Vector.newBuilder[String]
    var nParas = 0
    val cur = new StringBuilder
    val title = new StringBuilder
    val author = new StringBuilder
    var sawTitle = false
    var sawAuthor = false
    var emitted = 0

    // group stack: parallel arrays of (uc, mode)
    val ucStack = new Array[Int](MaxDepth)
    val modeStack = new Array[Int](MaxDepth)
    var depth = -1
    var uc = 1
    var mode = Body
    var pendingSkip = 0 // \uN fallback characters still to swallow
    var starred = false // saw \* — next control word opens a skip dest

    def sinkFor(m: Int): StringBuilder = m match {
      case Body => cur
      case Title => title
      case Author => author
      case _ => null
    }

    def emit(s: String): Unit = {
      if (pendingSkip > 0) { pendingSkip -= 1; return }
      val sink = sinkFor(mode)
      if (sink != null) {
        emitted += s.length
        if (emitted > MaxChars) throw new IllegalStateException("chars cap")
        sink.append(s)
        if (mode == Title) sawTitle = true
        if (mode == Author) sawAuthor = true
      }
    }

    def closePara(): Unit = {
      if (mode == Body) {
        nParas += 1
        if (nParas > MaxParas) throw new IllegalStateException("paras cap")
        paras += cur.toString
        cur.setLength(0)
      }
    }

    var i = 0
    val n = b.length
    var rootClosed = false
    while (i < n && !rootClosed) {
      val c = b(i)
      c match {
        case '{' =>
          depth += 1
          if (depth >= MaxDepth) return None
          ucStack(depth) = uc
          modeStack(depth) = mode
          starred = false
          i += 1
        case '}' =>
          if (depth < 0) return None
          uc = ucStack(depth)
          mode = modeStack(depth)
          starred = false
          depth -= 1
          if (depth < 0) rootClosed = true
          i += 1
        case '\\' =>
          if (i + 1 >= n) return None
          val c1 = b(i + 1)
          if ((c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')) {
            // control word: letters, optional signed decimal, optional
            // single space delimiter
            var j = i + 1
            while (j < n && ((b(j) >= 'a' && b(j) <= 'z') ||
              (b(j) >= 'A' && b(j) <= 'Z'))) j += 1
            val word = new String(b, i + 1, j - (i + 1),
              java.nio.charset.StandardCharsets.US_ASCII)
            var neg = false
            var hasNum = false
            var num = 0L
            if (j < n && b(j) == '-') { neg = true; j += 1 }
            while (j < n && b(j) >= '0' && b(j) <= '9') {
              hasNum = true
              num = num * 10 + (b(j) - '0')
              if (num > Int.MaxValue) num = Int.MaxValue
              j += 1
            }
            if (neg && !hasNum) j -= 1 // lone '-' was not a parameter
            val numV = if (neg) -num.toInt else num.toInt
            if (j < n && b(j) == ' ') j += 1 // delimiter space consumed
            i = j
            pendingSkip = 0 // any control word cancels a \u fallback skip
            if (starred) {
              // {\*\word …}: unknown starred destination — skip, unless
              // it is a word we keep anyway (none today)
              starred = false
              mode = Skip
            } else word match {
              case "par" => closePara()
              case "uc" => uc = if (hasNum) math.max(0, numV) else 1
              case "u" =>
                if (hasNum) {
                  val cp = if (numV < 0) numV + 65536 else numV
                  if (cp >= 0 && cp <= 0xFFFF && !Character.isSurrogate(cp.toChar))
                    emit(String.valueOf(cp.toChar))
                  pendingSkip = uc
                }
              case "bin" =>
                val skip = if (hasNum && numV > 0) numV else 0
                if (i + skip > n) return None
                i += skip
              case "info" => if (mode == Body) mode = Info
              case "title" => if (mode == Info) mode = Title
              case "author" => if (mode == Info) mode = Author
              case w if SkipDests.contains(w) => if (mode != Title && mode != Author) mode = Skip
              case w if SymbolWords.contains(w) => emit(SymbolWords(w))
              case _ => () // formatting word — ignored
            }
          } else {
            // control symbol: exactly one char
            c1 match {
              case '\'' =>
                if (i + 3 >= n) return None
                val h1 = Character.digit(b(i + 2), 16)
                val h2 = Character.digit(b(i + 3), 16)
                if (h1 < 0 || h2 < 0) return None
                emit(new String(Array(((h1 << 4) | h2).toByte), Cp1252))
                i += 4
              case '*' => pendingSkip = 0; starred = true; i += 2
              case '\\' | '{' | '}' => emit(String.valueOf(c1.toChar)); i += 2
              case '~' => pendingSkip = 0; emit("\u00A0"); i += 2
              case '_' => pendingSkip = 0; emit("-"); i += 2
              case '-' => pendingSkip = 0; i += 2 // optional hyphen: nothing
              case '\r' | '\n' =>
                pendingSkip = 0; closePara(); i += 2 // implicit \par
              case _ => pendingSkip = 0; i += 2 // unknown symbol — ignored
            }
          }
        case '\r' | '\n' => i += 1 // token-stream delimiters, never text
        case _ =>
          // literal text run up to the next delimiter — emit as cp1252
          // (pure ASCII in practice; high bytes tolerated)
          var j = i
          while (j < n && b(j) != '{' && b(j) != '}' && b(j) != '\\' &&
            b(j) != '\r' && b(j) != '\n') j += 1
          if (pendingSkip > 0) {
            val take = math.min(pendingSkip, j - i)
            pendingSkip -= take
            val rest = new String(b, i + take, j - (i + take), Cp1252)
            if (rest.nonEmpty) emit(rest)
          } else emit(new String(b, i, j - i, Cp1252))
          i = j
      }
    }
    if (depth >= 0 && !rootClosed) return None // unterminated groups
    if (cur.nonEmpty) { nParas += 1; paras += cur.toString }
    Some(RtfDoc(nParas, paras.result(),
      if (sawTitle) Some(title.toString) else None,
      if (sawAuthor) Some(author.toString) else None))
  }
}
