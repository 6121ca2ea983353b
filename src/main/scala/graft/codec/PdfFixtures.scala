package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Deterministic PDF builders for the [[PdfCodec]] oracle and fuzz
  * suites — the [[MediaFixtures]] doctrine applied to documents: every
  * byte of the emitted file is a pure function of the inputs, and the
  * TEXT the extractor must recover is seed arithmetic the DuckDB
  * oracle replays blind to the compressed bytes.
  *
  * Shapes covered (each one a distinct wire feature the extractor
  * claims): classic xref tables; xref STREAMS + object streams (the
  * PDF 1.5 layout, with and without the PNG Up predictor);
  * FlateDecode (plain name and one-element /Filter array), raw
  * streams, indirect /Length; literal strings with octal/paren
  * escapes, hex strings; Tj / ' / TJ-with-kerning / Td / T* layout;
  * WinAnsiEncoding and Type0 fonts with a /ToUnicode CMap (bfchar +
  * bfrange). */
object PdfFixtures {

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Escape a WinAnsi text for a literal string; `octal` forces the
    * high bytes through \ddd escapes (a wire feature to exercise). */
  def lit(text: String, octal: Boolean = false): String = {
    val sb = new StringBuilder
    text.foreach { c =>
      val b = PdfCodec.WinAnsi.indexOf(c) match {
        case -1 => '?'.toInt
        case i => i
      }
      if (c == '(' || c == ')' || c == '\\') sb.append('\\').append(c)
      else if (b >= 127 || octal && b > 'z') sb.append(f"\\${b.toOctalString}%s")
      else sb.append(b.toChar)
    }
    sb.toString
  }

  /** ASCII85 encoder (ISO 32000-1 §7.4.3 wire form incl. the `z`
    * shortcut and `~>` terminator) — the fixture side of the
    * ASCII85Decode filter. */
  def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= data.length) {
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (data(i + k) & 0xff); k += 1 }
      if (v == 0L) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var j = 4
        while (j >= 0) { cs(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
        sb.appendAll(cs)
      }
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (if (k < rem) data(i + k) & 0xff else 0); k += 1 }
      val cs = new Array[Char](5)
      var j = 4
      while (j >= 0) { cs(j) = ('!' + (v % 85).toInt).toChar; v /= 85; j -= 1 }
      sb.appendAll(cs.take(rem + 1))
    }
    sb.append("~>")
    bytes(sb.toString)
  }

  /** LZW encoder, PDF/TIFF flavor (ISO 32000-1 §7.4.4): 8-bit data,
    * MSB-first bit packing, CLEAR=256 leads the stream, EOD=257 ends
    * it, first table entry 258, width 9→12. With `earlyChange=1` (the
    * PDF default) the width bumps immediately after ASSIGNING entry
    * 2^width − 1 — one code earlier than the natural boundary — so the
    * decoder (whose table runs one entry behind) widens in lockstep;
    * with 0 it bumps after assigning 2^width. The fixture side of
    * [[PdfCodec.lzwMsb]]. */
  def lzwEncodeMsb(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val Clear = 256; val Eod = 257
    val early = if (earlyChange == 0) 0 else 1
    val dict = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    val out = new ByteArrayOutputStream()
    var codeSize = 9
    var acc = 0L; var nbits = 0
    def emit(code: Int): Unit = {
      acc = (acc << codeSize) | code; nbits += codeSize
      while (nbits >= 8) { out.write(((acc >> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
      acc &= (1L << nbits) - 1
    }
    // The decoder is canonical: it adds one table entry per data code
    // READ (except the first after a clear) and re-derives the width
    // from its next-to-assign counter + EarlyChange AFTER each add —
    // one emit LATER than the encoder's own dict assignment. An
    // encoder that widens at assignment time diverges from the decoder
    // exactly when the width boundary lands on the final data code
    // before EOD, so the width bookkeeping here mirrors the decoder's
    // timing, not the dict's.
    var decNext = Eod + 1 // the decoder's next-to-assign counter
    var afterClear = true
    def emitData(code: Int): Unit = {
      emit(code)
      if (afterClear) afterClear = false
      else if (decNext < 4096) {
        decNext += 1
        if (decNext + early >= (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    emit(Clear)
    if (data.nonEmpty) {
      var w = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (w.toLong << 8) | k
        val hit = dict.get(key)
        if (hit != null) w = hit.intValue()
        else {
          emitData(w)
          // the decoder creates this entry when it reads the NEXT
          // code, receiving the post-bookkeeping counter value
          if (decNext < 4096) dict.put(key, decNext)
          else { // decoder table full: clear and restart
            emit(Clear); dict.clear(); codeSize = 9
            decNext = Eod + 1; afterClear = true
          }
          w = k
        }
        i += 1
      }
      emitData(w)
    }
    emit(Eod)
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt) // pad final byte
    out.toByteArray
  }

  /** One page of content ops plus which font resource it uses. */
  final case class Page(content: String, font: String = "/F1")

  /** A font resource: WinAnsi Type1, or Type0 with a ToUnicode CMap
    * built from `cidText`'s distinct chars (codes assigned in char
    * order starting at 1; digits additionally covered by one bfrange
    * so both CMap block forms are on the wire). */
  sealed trait Font
  case object WinAnsiType1 extends Font
  final case class CidFont(cidText: String) extends Font

  /** Map a text to its 2-byte CID hex string under [[CidFont]]'s
    * code assignment (the content-stream side of the CMap). */
  def cidHex(cidText: String, show: String): String = {
    val codes = cidCodes(cidText)
    show.map(c => f"${codes(c)}%04X").mkString
  }

  private def cidCodes(cidText: String): Map[Char, Int] = {
    // digits ride the bfrange at 0x30..0x39; everything else gets
    // sequential bfchar codes from 0x0100
    val others = cidText.filterNot(_.isDigit).distinct.sorted
    others.zipWithIndex.map { case (c, i) => c -> (0x0100 + i) }.toMap ++
      (0 to 9).map(d => ('0' + d).toChar -> (0x30 + d))
  }

  private def toUnicodeCMap(cidText: String): String = {
    val codes = cidCodes(cidText).toSeq.filterNot(_._1.isDigit).sortBy(_._2)
    val chars = codes.map { case (c, code) =>
      f"<$code%04X> <${c.toInt}%04X>"
    }.mkString("\n")
    s"""/CIDInit /ProcSet findresource begin
       |12 dict begin
       |begincmap
       |1 begincodespacerange
       |<0000> <FFFF>
       |endcodespacerange
       |${codes.size} beginbfchar
       |$chars
       |endbfchar
       |1 beginbfrange
       |<0030> <0039> <0030>
       |endbfrange
       |endcmap
       |CMap defined
       |end end""".stripMargin
  }

  /** Build a complete PDF. `compress` flate-encodes content streams;
    * `filterArray` writes `/Filter [/FlateDecode]` instead of the bare
    * name; `indirectLength` routes /Length through a separate integer
    * object; `xrefStream` emits the PDF 1.5 layout — non-stream
    * objects packed into ONE object stream, the xref itself a binary
    * /Type /XRef stream (PNG Up predictor when `predictor`). */
  def pdf(pages: Seq[Page], font: Font = WinAnsiType1,
          compress: Boolean = true, filterArray: Boolean = false,
          indirectLength: Boolean = false, xrefStream: Boolean = false,
          predictor: Boolean = false,
          info: Seq[(String, String)] = Seq.empty,
          infoUtf16: Boolean = false,
          a85: Boolean = false,
          lzw: Boolean = false, lzwEarly0: Boolean = false,
          encrypt: Boolean = false): Array[Byte] = {
    // object numbering: 1 catalog, 2 pages-root, then per page (page,
    // contents[, length]), then font[, cmap][, info][, encrypt]
    // [, objstm, xref]
    var next = 3
    def take(): Int = { val n = next; next += 1; n }
    val pageNums = pages.map(_ => take())
    val contentNums = pages.map(_ => take())
    val lengthNums = if (indirectLength) pages.map(_ => take()) else Seq.empty
    val fontNum = take()
    val cmapNum = font match { case CidFont(_) => take(); case _ => -1 }
    val infoNum = if (info.nonEmpty) take() else -1
    val encryptNum = if (encrypt) take() else -1

    val filter =
      if (lzw) "/LZWDecode"
      else if (a85) "[ /ASCII85Decode /FlateDecode ]"
      else if (filterArray) "[ /FlateDecode ]"
      else "/FlateDecode"
    def contentObj(i: Int): (String, Array[Byte]) = {
      val raw = bytes(pages(i).content)
      val clear =
        if (lzw) lzwEncodeMsb(raw, if (lzwEarly0) 0 else 1)
        else if (a85) ascii85Encode(deflate(raw))
        else if (compress) deflate(raw)
        else raw
      // an encrypted document's content streams are ciphertext: XOR
      // stands in for RC4 — the extractor must never look (the
      // /Encrypt gate fires first), so the garble proves it didn't
      val data = if (encrypt) clear.map(b => (b ^ 0x5A).toByte) else clear
      val lenPart =
        if (indirectLength) s"/Length ${lengthNums(i)} 0 R"
        else s"/Length ${data.length}"
      val parmsPart = if (lzw && lzwEarly0) " /DecodeParms << /EarlyChange 0 >>" else ""
      val filtPart = if (compress || a85 || lzw) s" /Filter $filter$parmsPart" else ""
      (s"<< $lenPart$filtPart >>", data)
    }

    val fontBody = font match {
      case WinAnsiType1 =>
        s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
      case CidFont(_) =>
        s"<< /Type /Font /Subtype /Type0 /BaseFont /Graft /Encoding /Identity-H /ToUnicode $cmapNum 0 R >>"
    }

    // serialize every object body (streams as (dict, data))
    val objs = scala.collection.mutable.LinkedHashMap[Int, Either[String, (String, Array[Byte])]]()
    objs(1) = Left(s"<< /Type /Catalog /Pages 2 0 R >>")
    objs(2) = Left(s"<< /Type /Pages /Kids [ ${pageNums.map(n => s"$n 0 R").mkString(" ")} ] /Count ${pages.length} >>")
    pages.indices.foreach { i =>
      objs(pageNums(i)) = Left(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
          s"/Resources << /Font << ${pages(i).font} $fontNum 0 R >> >> " +
          s"/Contents ${contentNums(i)} 0 R >>")
      val (cd, data) = contentObj(i)
      objs(contentNums(i)) = Right((cd, data))
      if (indirectLength) objs(lengthNums(i)) = Left(s"${data.length}")
    }
    objs(fontNum) = Left(fontBody)
    font match {
      case CidFont(t) =>
        val cm = bytes(toUnicodeCMap(t))
        val cz = deflate(cm)
        objs(cmapNum) = Right((s"<< /Length ${cz.length} /Filter /FlateDecode >>", cz))
      case _ =>
    }
    if (info.nonEmpty) {
      // UTF-16BE strings go on the wire as BOM-prefixed hex strings;
      // Latin-1 as escaped literals — both §7.9.2.2 text-string forms
      val fields = info.map { case (k, v) =>
        if (infoUtf16) {
          val hex = ("\uFEFF" + v).getBytes(StandardCharsets.UTF_16BE)
            .map(b => f"${b & 0xff}%02X").mkString
          s"/$k <$hex>"
        } else s"/$k (${lit(v)})"
      }.mkString(" ")
      objs(infoNum) = Left(s"<< $fields >>")
    }
    if (encrypt)
      // the standard security handler's dict shape (§7.6.3) — the
      // extractor only needs /Encrypt's PRESENCE in the trailer
      objs(encryptNum) = Left(
        "<< /Filter /Standard /V 1 /R 2 /P -44 " +
          s"/O <${"AB" * 32}> /U <${"CD" * 32}> >>")
    val infoPart = (if (info.nonEmpty) s" /Info $infoNum 0 R" else "") +
      (if (encrypt) s" /Encrypt $encryptNum 0 R" else "")

    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.5\n%âãÏÓ\n"))
    val offsets = scala.collection.mutable.HashMap[Int, Int]()

    def writeObj(num: Int, body: Either[String, (String, Array[Byte])]): Unit = {
      offsets(num) = out.size
      body match {
        case Left(s) => out.write(bytes(s"$num 0 obj\n$s\nendobj\n"))
        case Right((d, data)) =>
          out.write(bytes(s"$num 0 obj\n$d\nstream\n"))
          out.write(data)
          out.write(bytes("\nendstream\nendobj\n"))
      }
    }

    if (!xrefStream) {
      objs.foreach { case (n, b) => writeObj(n, b) }
      val xrefOff = out.size
      val maxNum = objs.keys.max
      out.write(bytes(s"xref\n0 ${maxNum + 1}\n"))
      out.write(bytes(f"${0}%010d 65535 f \n"))
      (1 to maxNum).foreach { n =>
        val off = offsets.getOrElse(n, 0)
        out.write(bytes(f"$off%010d 00000 n \n"))
      }
      out.write(bytes(s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R$infoPart >>\nstartxref\n$xrefOff\n%%EOF\n"))
    } else {
      // PDF 1.5: pack the NON-stream objects into one ObjStm; streams
      // stay top-level; xref is a /Type /XRef stream
      val objStmNum = take()
      val xrefNum = take()
      val packed = objs.collect { case (n, Left(s)) => (n, s) }.toSeq
      val streams = objs.collect { case (n, Right(v)) => (n, v) }.toSeq
      val bodyBuf = new StringBuilder
      val headBuf = new StringBuilder
      packed.foreach { case (n, s) =>
        headBuf.append(s"$n ${bodyBuf.length} ")
        bodyBuf.append(s).append('\n')
      }
      val stmPayload = bytes(headBuf.toString + bodyBuf.toString)
      val first = headBuf.length
      val zz = deflate(stmPayload)
      // top-level streams first (content/cmap), then the objstm
      streams.foreach { case (n, v) => writeObj(n, Right(v)) }
      writeObj(objStmNum, Right((
        s"<< /Type /ObjStm /N ${packed.length} /First $first /Length ${zz.length} /Filter /FlateDecode >>",
        zz)))
      // xref stream: W [1 2 2]; entries for 0..xrefNum
      val xrefOff = out.size
      val maxNum = xrefNum
      val rowLen = 5
      val rows = new ByteArrayOutputStream()
      def row(t: Int, f2: Int, f3: Int): Array[Byte] =
        Array(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
          ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
      val packedIdx = packed.zipWithIndex.map { case ((n, _), i) => n -> i }.toMap
      (0 to maxNum).foreach { n =>
        val r =
          if (n == 0) row(0, 0, 65535)
          else if (packedIdx.contains(n)) row(2, objStmNum, packedIdx(n))
          else if (offsets.contains(n)) row(1, offsets(n), 0)
          else if (n == xrefNum) row(1, xrefOff, 0)
          else row(0, 0, 0)
        rows.write(r)
      }
      val rawRows = rows.toByteArray
      val (xd, parms) =
        if (!predictor) (deflate(rawRows), "")
        else {
          // PNG Up predictor: filter byte 2 per row, deltas vs prior row
          val nRows = rawRows.length / rowLen
          val pred = new ByteArrayOutputStream()
          var r = 0
          while (r < nRows) {
            pred.write(2)
            var i = 0
            while (i < rowLen) {
              val cur = rawRows(r * rowLen + i) & 0xff
              val up = if (r > 0) rawRows((r - 1) * rowLen + i) & 0xff else 0
              pred.write((cur - up) & 0xff)
              i += 1
            }
            r += 1
          }
          (deflate(pred.toByteArray),
            s" /DecodeParms << /Predictor 12 /Columns $rowLen >>")
        }
      offsets(xrefNum) = xrefOff
      out.write(bytes(
        s"$xrefNum 0 obj\n<< /Type /XRef /Size ${maxNum + 1} /W [ 1 2 2 ] " +
          s"/Root 1 0 R$infoPart /Length ${xd.length} /Filter /FlateDecode$parms >>\nstream\n"))
      out.write(xd)
      out.write(bytes("\nendstream\nendobj\n"))
      out.write(bytes(s"startxref\n$xrefOff\n%%EOF\n"))
    }
    out.toByteArray
  }

  /** The four-variant seed fixture the `web_pdf_extract` oracle
    * replays: variant = id % 4 —
    *   0: one page, Flate, literal string with octal + paren escapes
    *      → "Doc <id> café résumé (ok)"
    *   1: TWO pages, /Filter array + indirect /Length; TJ kerning
    *      (−220/−150 space, −40 fuses) and the ' operator
    *      → "Alpha beta gamma <id>\nkerned\nSecond\npage <id>"
    *   2: one page, UNCOMPRESSED stream, hex string + T*
    *      → "Hex row <id>\nnext line"
    *   3: one page, PDF 1.5 xref stream + ObjStm + PNG predictor,
    *      Type0 font with ToUnicode CMap → "Кириллица <id>"
    */
  def docPdf(id: Long): Array[Byte] = (id % 4) match {
    case 0 =>
      pdf(Seq(Page(
        s"BT /F1 12 Tf 72 720 Td (${lit(s"Doc $id café résumé (ok)", octal = true)}) Tj ET")),
        info = Seq("Title" -> s"Report $id café", "Author" -> "Graft Bot"))
    case 1 =>
      pdf(Seq(
        Page(s"BT /F1 11 Tf 50 700 Td [(Alpha) -220 (beta) -150 (gamma $id)] TJ " +
          "0 -14 Td [(kern) -40 (ed)] TJ ET"),
        Page(s"BT /F1 11 Tf 50 700 Td (Second) Tj (page $id) ' ET")),
        filterArray = true, indirectLength = true) // no /Info: absent branch
    case 2 =>
      pdf(Seq(Page(
        s"BT /F1 9 Tf 40 700 Td <48657820> Tj (row $id) Tj T* (next line) Tj ET")),
        compress = false,
        info = Seq("Title" -> s"Hex sheet $id"))
    case _ =>
      val text = s"Кириллица $id"
      pdf(Seq(Page(s"BT /F2 10 Tf 60 710 Td <${cidHex(text, text)}> Tj ET", font = "/F2")),
        font = CidFont(text), xrefStream = true, predictor = true,
        info = Seq("Title" -> s"Документ $id", "Author" -> s"Автор $id"),
        infoUtf16 = true)
  }

  /** The (title, author) [[docPdf]]'s /Info must yield — null strings
    * for the absent branch; the oracle replays this arithmetic. */
  def docInfo(id: Long): (Option[String], Option[String]) = (id % 4) match {
    case 0 => (Some(s"Report $id café"), Some("Graft Bot"))
    case 1 => (None, None)
    case 2 => (Some(s"Hex sheet $id"), None)
    case _ => (Some(s"Документ $id"), Some(s"Автор $id"))
  }

  /** The text [[docPdf]] must extract (pages joined with '\n') — the
    * seed arithmetic the oracle rebuilds in SQL. */
  def docText(id: Long): String = (id % 4) match {
    case 0 => s"Doc $id café résumé (ok)"
    case 1 => s"Alpha beta gamma $id\nkerned\nSecond\npage $id"
    case 2 => s"Hex row $id\nnext line"
    case _ => s"Кириллица $id"
  }

  def docPages(id: Long): Int = if (id % 4 == 1) 2 else 1

  /** An ENCRYPTED document (classic xref): trailer carries /Encrypt,
    * content bytes are ciphertext-garbled — must classify as
    * `encrypted`, never as ok-with-empty-text. */
  def encryptedPdf(id: Long): Array[Byte] =
    pdf(Seq(Page(s"BT /F1 12 Tf 72 720 Td (Secret $id) Tj ET")),
      encrypt = true, info = Seq("Title" -> s"Locked $id"))

  /** The PDF 1.5 form of the same: /Encrypt rides the xref STREAM's
    * dict (xref streams are themselves never encrypted, so the gate
    * must find the key there too). */
  def encryptedPdfXrefStream(id: Long): Array[Byte] =
    pdf(Seq(Page(s"BT /F1 12 Tf 72 720 Td (Secret $id) Tj ET")),
      encrypt = true, xrefStream = true)

  /** LZW-compressed content (older-generation PDFs): default
    * EarlyChange=1 wire form. Text = [[lzwText]]. */
  def lzwPdf(id: Long): Array[Byte] =
    pdf(Seq(Page(s"BT /F1 10 Tf 60 700 Td (${lit(lzwText(id))}) Tj ET")),
      lzw = true, info = Seq("Title" -> s"Legacy $id"))

  /** The text [[lzwPdf]] must extract — 4 whitespace tokens. */
  def lzwText(id: Long): String = s"LZW packed stream $id"
}
