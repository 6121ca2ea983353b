package graft.codec

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Pure-Scala scalar codecs mirroring the reference's G-family functions
  * (SURVEY.md §2.G). Zero Spark deps — exposed to SQL via UDF wrappers in
  * graft.functions.
  */
object Codecs {

  // ── SHA-512/256 (JDK ships it; the hash underlying Algorand addresses
  //    and txids: encoding.go:54-70, write_txn.go:134) ──────────────────

  def sha512_256(data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-512/256").digest(data)

  // ── RFC 4648 base32, uppercase, no padding (address wire format) ────

  private val B32Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val B32Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    B32Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def base32NoPad(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var buffer = 0L
    var bits = 0
    data.foreach { b =>
      buffer = (buffer << 8) | (b & 0xffL)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(B32Alphabet(((buffer >> bits) & 0x1f).toInt))
      }
    }
    if (bits > 0) sb.append(B32Alphabet(((buffer << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }

  def base32Decode(s: String): Array[Byte] = {
    var buffer = 0L
    var bits = 0
    val out = Array.newBuilder[Byte]
    s.foreach { c =>
      val v = if (c < 128) B32Rev(c.toInt) else -1
      require(v >= 0, s"invalid base32 char '$c'")
      buffer = (buffer << 5) | v
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out += ((buffer >> bits) & 0xff).toByte
      }
    }
    out.result()
  }

  // ── Algorand-style address codec: 32-byte public key ↔ 58-char base32
  //    string with a 4-byte SHA-512/256 checksum (encoding.go:54-70). ────

  val AddressLength = 32
  private val ChecksumLength = 4

  def addressEncode(pk: Array[Byte]): String = {
    require(pk.length == AddressLength, s"address must be $AddressLength bytes, got ${pk.length}")
    val check = sha512_256(pk).takeRight(ChecksumLength)
    base32NoPad(pk ++ check)
  }

  def addressDecode(addr: String): Array[Byte] = {
    val decoded = base32Decode(addr)
    require(decoded.length == AddressLength + ChecksumLength, s"bad address length for '$addr'")
    val (pk, check) = decoded.splitAt(AddressLength)
    val expect = sha512_256(pk).takeRight(ChecksumLength)
    require(java.util.Arrays.equals(check, expect), s"address checksum mismatch for '$addr'")
    pk
  }

  // ── base64url (pagination token wire format, idb.go:83) ─────────────

  def base64Url(data: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.encodeToString(data)

  def base64UrlDecode(s: String): Array[Byte] =
    java.util.Base64.getUrlDecoder.decode(s)

  // ── Keyset pagination token: little-endian uint64 round ‖ uint32 intra,
  //    base64url (idb.go:56-100). Ascending tokens add the inner-txn count
  //    of the root so the whole subtree is skipped — callers pass the
  //    already-adjusted intra. ──────────────────────────────────────────

  def pageTokenEncode(round: Long, intra: Long): String = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(round)
    b.putInt(intra.toInt)
    base64Url(b.array())
  }

  def pageTokenDecode(token: String): (Long, Long) = {
    val bytes = base64UrlDecode(token)
    require(bytes.length == 12, s"bad next token length ${bytes.length}")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val round = b.getLong()
    val intra = b.getInt() & 0xffffffffL
    (round, intra)
  }

  // ── Box key codec: "bx:" ++ 8-byte big-endian appid ++ name
  //    (writer.go:302-321 via avm-abi apps.SplitBoxKey). ────────────────

  private val BoxPrefix = "bx:".getBytes(StandardCharsets.ISO_8859_1)

  def boxKeyMake(app: Long, name: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(3 + 8 + name.length)
    b.put(BoxPrefix)
    b.putLong(app)
    b.put(name)
    b.array()
  }

  def boxKeySplit(key: Array[Byte]): (Long, Array[Byte]) = {
    require(key.length >= 11 && key(0) == 'b' && key(1) == 'x' && key(2) == ':',
      "not a box key (missing bx: prefix)")
    val b = ByteBuffer.wrap(key, 3, 8)
    val app = b.getLong()
    (app, key.drop(11))
  }

  // ── PrintableUTF8OrEmpty (encoding.go:123-162): keep a string only if
  //    every rune is printable UTF-8; otherwise return "". "Printable"
  //    is Go's unicode.IsPrint: categories L/M/N/P/S plus U+0020 — which
  //    REJECTS format characters (Cf: ZWSP, bidi controls) and the
  //    non-space separators (Zs beyond space, Zl, Zp) that a plain
  //    "not a control char" test lets through. ─────────────────────────

  private val PrintableCategories: Set[Int] = Set(
    Character.UPPERCASE_LETTER, Character.LOWERCASE_LETTER,
    Character.TITLECASE_LETTER, Character.MODIFIER_LETTER,
    Character.OTHER_LETTER, // L
    Character.NON_SPACING_MARK, Character.ENCLOSING_MARK,
    Character.COMBINING_SPACING_MARK, // M
    Character.DECIMAL_DIGIT_NUMBER, Character.LETTER_NUMBER,
    Character.OTHER_NUMBER, // N
    Character.DASH_PUNCTUATION, Character.START_PUNCTUATION,
    Character.END_PUNCTUATION, Character.CONNECTOR_PUNCTUATION,
    Character.OTHER_PUNCTUATION, Character.INITIAL_QUOTE_PUNCTUATION,
    Character.FINAL_QUOTE_PUNCTUATION, // P
    Character.MATH_SYMBOL, Character.CURRENCY_SYMBOL,
    Character.MODIFIER_SYMBOL, Character.OTHER_SYMBOL // S
  ).map(_.toInt)

  def printableUtf8OrEmpty(s: String): String = {
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      // An unpaired surrogate is not valid UTF-8 → the Go side returns "".
      if (Character.isSurrogate(s.charAt(i)) && Character.charCount(cp) == 1) return ""
      if (cp != 0x20 && !PrintableCategories.contains(Character.getType(cp))) return ""
      i += Character.charCount(cp)
    }
    s
  }

  // ── Type-enum maps (txn_type_enum.go:14-50, sig_type.go:12-41) ──────

  val TypeEnums: Map[String, Int] = Map(
    "pay" -> 1, "keyreg" -> 2, "acfg" -> 3, "axfer" -> 4,
    "afrz" -> 5, "appl" -> 6, "stpf" -> 7)
  val TypeEnumNames: Map[Int, String] = TypeEnums.map(_.swap)

  val SigTypes: Set[String] = Set("sig", "msig", "lsig")
}
