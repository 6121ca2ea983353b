package graft.codec

/** Dependency-free media-container header parsers: PNG (IHDR + APNG acTL),
  * JPEG (SOFn), GIF (logical screen descriptor + frame count), WAV (fmt +
  * data chunks). Pure byte arithmetic over the blob head — no codec
  * libraries, no decompression — which is exactly the metadata a 100 TB
  * media-curation scan needs (dimensions, frame counts, audio geometry)
  * at zero decode cost.
  *
  * `parse` sniffs the magic number and dispatches; a blob that is not one
  * of the four containers — or that IS one but is truncated/malformed
  * before its header fields — returns None, and the caller decides the
  * fallback ([[graft.operators.Multimodal]] keeps its deterministic fake
  * for exactly that path, preserving the synthetic-fixture contract).
  *
  * All parsers bound every read (no exceptions on truncated input) and
  * never scan more than the header region plus, for GIF frame counting
  * and WAV chunk walking, a linear block walk bounded by the blob length.
  */
object MediaHeaders {

  /** Parsed container metadata. Image formats fill width/height/nFrames
    * (+ bitDepth/channels); WAV fills channels/bitDepth/sampleRate/
    * durationMs and counts sample frames in nFrames. */
  final case class MediaMeta(
      format: String,
      width: Option[Int] = None,
      height: Option[Int] = None,
      nFrames: Option[Int] = None,
      bitDepth: Option[Int] = None,
      channels: Option[Int] = None,
      sampleRate: Option[Int] = None,
      durationMs: Option[Long] = None)

  def parse(b: Array[Byte]): Option[MediaMeta] =
    if (isPng(b)) parsePng(b)
    else if (isJpeg(b)) parseJpeg(b)
    else if (isGif(b)) parseGif(b)
    else if (isWav(b)) parseWav(b)
    else if (isWebp(b)) parseWebp(b)
    else if (isFlac(b)) parseFlac(b)
    else if (isOgg(b)) parseOgg(b)
    else if (isMp4(b)) parseMp4(b)
    else if (isMp3(b)) parseMp3(b) // weakest magic (0xFF sync) — sniffed last
    else None

  /** RIFF/WEBP magic. */
  def isWebp(b: Array[Byte]): Boolean =
    b != null && b.length >= 21 && b(0) == 'R' && b(1) == 'I' &&
      b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'E' &&
      b(10) == 'B' && b(11) == 'P'

  /** WebP metadata across the container's three first-chunk forms
    * (the published RIFF layouts — dimensions only, no VP8 entropy
    * decode): `VP8 ` lossy keyframes (sync 9D 01 2A, 14-bit dims),
    * `VP8L` lossless (0x2F, 14-bit dims-minus-1 packed, alpha bit →
    * channels 4), `VP8X` extended (24-bit dims-minus-1; the ALPHA
    * flag sets channels, the ANIMATION flag leaves nFrames unknown —
    * counting means walking ANMF chunks, deliberately out of scope
    * and observable as null, never a guessed 1). */
  private def parseWebp(b: Array[Byte]): Option[MediaMeta] = {
    val c = tag(b, 12)
    c match {
      case "VP8 " if b.length >= 30 =>
        // 3-byte frame tag: bit 0 = 0 for keyframes (dims live there)
        if ((u8(b, 20) & 1) != 0) return None
        if (!(u8(b, 23) == 0x9D && u8(b, 24) == 0x01 && u8(b, 25) == 0x2A))
          return None
        val w = le16(b, 26) & 0x3FFF
        val h = le16(b, 28) & 0x3FFF
        if (w <= 0 || h <= 0) return None
        Some(MediaMeta("webp", width = Some(w), height = Some(h),
          nFrames = Some(1), bitDepth = Some(8), channels = Some(3)))
      case "VP8L" if b.length >= 25 =>
        if (u8(b, 20) != 0x2F) return None
        val bits = le32(b, 21)
        val w = (bits & 0x3FFF).toInt + 1
        val h = ((bits >> 14) & 0x3FFF).toInt + 1
        val alpha = ((bits >> 28) & 1L) == 1L
        Some(MediaMeta("webp", width = Some(w), height = Some(h),
          nFrames = Some(1), bitDepth = Some(8),
          channels = Some(if (alpha) 4 else 3)))
      case "VP8X" if b.length >= 30 =>
        val flags = u8(b, 20)
        val w = 1 + (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16))
        val h = 1 + (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16))
        val anim = (flags & 0x02) != 0
        Some(MediaMeta("webp", width = Some(w), height = Some(h),
          nFrames = if (anim) None else Some(1), bitDepth = Some(8),
          channels = Some(if ((flags & 0x10) != 0) 4 else 3)))
      case _ => None
    }
  }

  // ── byte readers (bounds-checked) ───────────────────────────────────

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // ── PNG ─────────────────────────────────────────────────────────────

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  /** IHDR is mandatory-first: width/height (big-endian 32), bit depth,
    * color type → channel count. APNG's acTL chunk (before the first
    * IDAT) carries num_frames; a plain PNG is one frame. */
  private def parsePng(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 33 || tag(b, 12) != "IHDR") return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val depth = u8(b, 24)
    val channels = u8(b, 25) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    // chunk walk for acTL (stop at IDAT — acTL must precede it)
    var frames = 1L
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      val typ = tag(b, i + 4)
      if (typ == "IDAT" || typ == "IEND") done = true
      else if (typ == "acTL" && len >= 4 && i + 12 <= b.length) {
        frames = be32(b, i + 8); done = true
      }
      // len + type + data + crc; Long advance clamped to the blob end so
      // a hostile 2^31-scale length can't wrap the cursor negative
      i = math.min(i.toLong + 12L + math.max(0L, len), b.length.toLong).toInt
    }
    Some(MediaMeta("png", width = Some(w.toInt), height = Some(h.toInt),
      nFrames = Some(math.min(frames, Int.MaxValue).toInt),
      bitDepth = Some(depth), channels = Some(channels)))
  }

  /** Decoded 8-bit truecolor raster: `rgb` is row-major, 3 bytes per
    * pixel, exactly the unfiltered scanline bytes. */
  final case class PngRaster(width: Int, height: Int, rgb: Array[Byte])

  /** Adam7 pass grids (x0, y0, dx, dy), transmission order (spec 8.2). */
  private[codec] val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** COMPLETE PNG pixel decode — every legal IHDR combination
    * (spec 11.2.2): grayscale 1/2/4/8/16-bit, truecolor 8/16,
    * palette 1/2/4/8 via the PLTE lookup, gray+alpha and RGBA 8/16,
    * each sequential or Adam7-interlaced — zlib inflate
    * (java.util.zip, in every JVM) plus the five scanline filters
    * inverted per the spec; no codec library involved. The output is
    * always the expanded 8-bit RGB raster (gray replicated, palette
    * resolved, 16-bit projected to the most-significant byte, alpha
    * parsed-then-dropped), so every downstream raster operator sees
    * one shape. Adam7 decodes through per-pass unfiltering + grid
    * scatter. Returns None for truncated/corrupt zlib streams, for a
    * stream that inflates to the wrong length, for palette indexes
    * past the PLTE, and for rasters over 64 MiB (a hostile IHDR must
    * not allocate unbounded memory). */
  def pngPixels(b: Array[Byte]): Option[PngRaster] = {
    if (!isPng(b) || b.length < 33 || tag(b, 12) != "IHDR") return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0) return None
    // deflate, adaptive filters; interlace 0 (none) or 1 (Adam7)
    if (u8(b, 26) != 0 || u8(b, 27) != 0 || u8(b, 28) > 1) return None
    val interlaced = u8(b, 28) == 1
    val colorType = u8(b, 25)
    val depth = u8(b, 24)
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette indexes
      case 4 => 2 // grayscale + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    // legal depth set per color type (PNG spec 11.2.2)
    val depthOk = colorType match {
      case 0 => depth == 1 || depth == 2 || depth == 4 || depth == 8 || depth == 16
      case 3 => depth == 1 || depth == 2 || depth == 4 || depth == 8
      case _ => depth == 8 || depth == 16
    }
    if (!depthOk) return None
    val bitsPerPx = channels * depth
    val fbpp = math.max(1, bitsPerPx / 8) // filter byte distance (spec 9.2)
    def scanBytes(pw: Int): Int = (pw * bitsPerPx + 7) / 8
    // each pass (the whole image for non-interlaced) carries ph
    // scanlines of 1 + scanBytes(pw) bytes
    val passes =
      if (interlaced) Adam7.filter { case (x0, y0, dx, dy) => w > x0 && h > y0 }
        .map { case (x0, y0, dx, dy) =>
          (x0, y0, dx, dy, ((w - x0 + dx - 1) / dx).toInt, ((h - y0 + dy - 1) / dy).toInt)
        }
      else Seq((0, 0, 1, 1, w.toInt, h.toInt))
    val rawLen = passes.map { case (_, _, _, _, pw, ph) => ph.toLong * (1 + scanBytes(pw)) }.sum
    if (w * h * 3L > (64L << 20) || rawLen > (64L << 20)) return None
    // concatenate IDAT chunk data (the zlib stream may span chunks);
    // grab PLTE on the same walk
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      val typ = tag(b, i + 4)
      if (typ == "IEND") done = true
      else if (typ == "IDAT" && len > 0 && i + 8 + len <= b.length)
        idat.write(b, i + 8, len.toInt)
      else if (typ == "PLTE" && len > 0 && len % 3 == 0 && len <= 768 &&
        i + 8 + len <= b.length)
        palette = java.util.Arrays.copyOfRange(b, i + 8, (i + 8 + len).toInt)
      i = math.min(i.toLong + 12L + math.max(0L, len), b.length.toLong).toInt
    }
    if (idat.size() == 0) return None
    if (colorType == 3 && palette == null) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // invert the per-row filter (spec 9.2) PASS BY PASS — each Adam7
    // pass filters independently against its own previous scanline —
    // then extract pixels straight to the RGB output at the pass-grid
    // positions. Filtering is byte-level at distance fbpp regardless
    // of depth; sample extraction handles 8-bit, 16-bit (the
    // most-significant byte IS the exact 8-bit projection), and
    // sub-byte packed samples (MSB-first, gray scaled by the exact
    // 255/(2^d−1) multiplier, palette indexes looked up raw). Alpha
    // channels are parsed (they participate in filtering) and dropped.
    val out = new Array[Byte]((h * w * 3).toInt)
    val pn = if (palette != null) palette.length / 3 else 0
    var off = 0
    for ((x0, y0, dx, dy, pw, ph) <- passes) {
      val sb = scanBytes(pw)
      val pass = new Array[Byte](ph * sb)
      var y = 0
      while (y < ph) {
        val ft = raw(off) & 0xff
        if (ft > 4) return None
        val ri = off + 1
        val oi = y * sb
        var x = 0
        while (x < sb) {
          val a = if (x >= fbpp) pass(oi + x - fbpp) & 0xff else 0
          val up = if (y > 0) pass(oi - sb + x) & 0xff else 0
          val c = if (x >= fbpp && y > 0) pass(oi - sb + x - fbpp) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => a
            case 2 => up
            case 3 => (a + up) / 2
            case _ =>
              val p = a + up - c
              val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
          }
          pass(oi + x) = (((raw(ri + x) & 0xff) + pred) & 0xff).toByte
          x += 1
        }
        off += 1 + sb
        y += 1
      }
      var j = 0
      while (j < ph) {
        val rowOff = j * sb
        var px = 0
        while (px < pw) {
          var r = 0; var g = 0; var bl = 0
          if (depth == 8) {
            val base = rowOff + px * channels
            colorType match {
              case 0 | 4 =>
                val v = pass(base) & 0xff; r = v; g = v; bl = v
              case 2 | 6 =>
                r = pass(base) & 0xff; g = pass(base + 1) & 0xff; bl = pass(base + 2) & 0xff
              case _ =>
                val idx = pass(base) & 0xff
                if (idx >= pn) return None // index past the PLTE
                r = palette(3 * idx) & 0xff
                g = palette(3 * idx + 1) & 0xff
                bl = palette(3 * idx + 2) & 0xff
            }
          } else if (depth == 16) {
            val base = rowOff + px * channels * 2
            colorType match {
              case 0 | 4 =>
                val v = pass(base) & 0xff; r = v; g = v; bl = v
              case _ =>
                r = pass(base) & 0xff; g = pass(base + 2) & 0xff; bl = pass(base + 4) & 0xff
            }
          } else {
            // sub-byte single-channel samples, MSB-first in each byte
            val bitPos = px * depth
            val shift = 8 - depth - (bitPos & 7)
            val v = ((pass(rowOff + (bitPos >> 3)) & 0xff) >> shift) & ((1 << depth) - 1)
            if (colorType == 3) {
              if (v >= pn) return None
              r = palette(3 * v) & 0xff
              g = palette(3 * v + 1) & 0xff
              bl = palette(3 * v + 2) & 0xff
            } else {
              val scaled = v * 255 / ((1 << depth) - 1) // exact: 255, 85, 17
              r = scaled; g = scaled; bl = scaled
            }
          }
          val dstI = ((y0 + j * dy) * w.toInt + (x0 + px * dx)) * 3
          out(dstI) = r.toByte; out(dstI + 1) = g.toByte; out(dstI + 2) = bl.toByte
          px += 1
        }
        j += 1
      }
    }
    Some(PngRaster(w.toInt, h.toInt, out))
  }

  // ── JPEG ────────────────────────────────────────────────────────────

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff

  /** Marker walk to the first SOFn frame header: precision (bit depth),
    * height, width, component count (channels). Standalone markers
    * (TEM, RSTn) carry no length; everything else is big-endian
    * length-prefixed. */
  private def parseJpeg(b: Array[Byte]): Option[MediaMeta] = {
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return None // lost sync
      var m = u8(b, i + 1)
      var j = i + 1
      while (m == 0xff && j + 1 < b.length) { j += 1; m = u8(b, j) } // fill bytes
      val at = j + 1
      m match {
        case 0x01 | 0xd0 | 0xd1 | 0xd2 | 0xd3 | 0xd4 | 0xd5 | 0xd6 | 0xd7 =>
          i = at // standalone
        case 0xd9 => return None // EOI before any SOF
        case sof if (sof >= 0xc0 && sof <= 0xcf) && sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
          if (at + 7 > b.length) return None
          val depth = u8(b, at + 2)
          val h = be16(b, at + 3); val w = be16(b, at + 5)
          val comps = if (at + 8 <= b.length) u8(b, at + 7) else return None
          if (w == 0 || h == 0) return None
          return Some(MediaMeta("jpeg", width = Some(w), height = Some(h),
            nFrames = Some(1), bitDepth = Some(depth), channels = Some(comps)))
        case _ =>
          if (at + 2 > b.length) return None
          val len = be16(b, at)
          if (len < 2) return None
          i = at + len
      }
    }
    None
  }

  /** EXIF orientation (tag 0x0112) from a JPEG's APP1 segment — a real
    * TIFF IFD walk: "Exif\0\0" preamble, byte-order mark (II little /
    * MM big endian), magic 42, IFD0 offset, then the 12-byte entry
    * scan for the SHORT orientation tag. Returns 1..8 per the EXIF
    * table (1 = upright … 6 = needs 90° CW … 8 = needs 270° CW);
    * None when there is no APP1, no Exif preamble, a malformed TIFF,
    * or no orientation entry. Bounds-checked, never throws, stops at
    * SOS (EXIF must precede the entropy data). */
  def exifOrientation(b: Array[Byte]): Option[Int] = {
    if (!isJpeg(b)) return None
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return None
      val m = u8(b, i + 1)
      val at = i + 2
      m match {
        case 0x01 | 0xd0 | 0xd1 | 0xd2 | 0xd3 | 0xd4 | 0xd5 | 0xd6 | 0xd7 =>
          i = at
        case 0xd9 | 0xda => return None // end / entropy data: no EXIF ahead
        case 0xe1 =>
          if (at + 2 > b.length) return None
          val len = be16(b, at)
          if (len < 2 || at + len > b.length) return None
          val p = at + 2
          if (len >= 10 && b(p) == 'E' && b(p + 1) == 'x' && b(p + 2) == 'i' &&
            b(p + 3) == 'f' && b(p + 4) == 0 && b(p + 5) == 0) {
            val tiff = p + 6
            val end = at + len
            if (tiff + 8 <= end) {
              val little =
                if (b(tiff) == 'I' && b(tiff + 1) == 'I') Some(true)
                else if (b(tiff) == 'M' && b(tiff + 1) == 'M') Some(false)
                else None
              little.foreach { le =>
                def r16(o: Int): Int = if (le) le16(b, o) else be16(b, o)
                def r32(o: Int): Long = if (le) le32(b, o) else be32(b, o)
                if (r16(tiff + 2) == 42) {
                  val ifd = r32(tiff + 4)
                  if (ifd >= 8 && tiff + ifd + 2 <= end) {
                    val base = (tiff + ifd).toInt
                    val n = r16(base)
                    var e = 0
                    while (e < n && base + 2 + 12 * (e + 1) <= end) {
                      val o = base + 2 + 12 * e
                      if (r16(o) == 0x0112 && r16(o + 2) == 3 && r32(o + 4) == 1L) {
                        val v = r16(o + 8)
                        if (v >= 1 && v <= 8) return Some(v)
                      }
                      e += 1
                    }
                  }
                }
              }
            }
          }
          i = at + len
        case _ =>
          if (at + 2 > b.length) return None
          val len = be16(b, at)
          if (len < 2) return None
          i = at + len
      }
    }
    None
  }

  /** Decoded baseline-JPEG raster: `channels` = 1 (grayscale, w·h
    * luma bytes) or 3 (RGB from YCbCr, w·h·3 bytes, row-major). */
  final case class JpegRaster(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** FULL baseline-JPEG pixel decode — Huffman entropy decode,
    * dequantization, and a 13-bit fixed-point integer IDCT (the
    * Loeffler–Ligtenberg–Moshytz 8-point factorization, ITU T.81
    * Annex A semantics) in plain JVM arithmetic; no codec library.
    *
    * Scope: sequential baseline/extended DCT (SOF0/SOF1) AND
    * progressive DCT (SOF2, ITU T.81 Annex G: spectral selection,
    * successive approximation with DC/AC refinement scans, EOB runs,
    * interleaved DC / non-interleaved AC scan geometry), 8-bit,
    * sampling factors 1 or 2 per axis with luma at the max —
    * grayscale, 4:4:4, 4:2:2, 4:4:0 and 4:2:0 (the dominant photo
    * layout); chroma upsampling is BOX REPLICATION (each chroma
    * sample covers its 2×1/1×2/2×2 pixel box exactly — T.81 mandates
    * no filter, and replication is the integer-exact contract the
    * oracles replay; smoothing filters are a codec library's cosmetic
    * choice). Arithmetic/lossless/hierarchical frames return None.
    * Restart markers honored. Color output is JFIF YCbCr→RGB in the
    * standard 16-bit fixed-point form. Deterministic by construction:
    * every step is integer arithmetic, so a DC-only block decodes to
    * exactly `clamp(((dc·q + 4) >> 3) + 128)` — the closed form the
    * arithmetic oracles replay. Returns None for any malformed,
    * truncated, or out-of-scope stream; never throws; rasters are
    * bounded to 64 MiB. */
  def jpegPixels(b: Array[Byte]): Option[JpegRaster] = {
    if (!isJpeg(b)) return None
    // tables gathered on the marker walk
    val quant = new Array[Array[Int]](4) // zigzag order
    val huffDc = new Array[HuffTable](4)
    val huffAc = new Array[HuffTable](4)
    var restartInterval = 0
    var frame: JpegFrame = null
    var prog: ProgJpegState = null
    var i = 2
    // i + 2: EOI is a bare 2-byte marker, legal at the very buffer end —
    // a progressive frame's raster only exists once it arrives
    while (i + 2 <= b.length) {
      if (u8(b, i) != 0xff) return None
      var m = u8(b, i + 1)
      var j = i + 1
      while (m == 0xff && j + 1 < b.length) { j += 1; m = u8(b, j) }
      val at = j + 1
      m match {
        case 0x01 | 0xd0 | 0xd1 | 0xd2 | 0xd3 | 0xd4 | 0xd5 | 0xd6 | 0xd7 =>
          i = at
        case 0xd9 => // EOI: a progressive frame finishes here
          return if (prog != null && prog.scans > 0) finishProgressive(prog, quant)
          else None
        case 0xdb => // DQT: one or more tables
          if (at + 2 > b.length) return None
          val len = be16(b, at)
          var p = at + 2
          val end = at + len
          if (end > b.length) return None
          while (p < end) {
            val pq = u8(b, p) >> 4; val tq = u8(b, p) & 15
            if (pq != 0 || tq > 3 || p + 65 > end) return None // 8-bit tables only
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(k) = u8(b, p + 1 + k); k += 1 }
            quant(tq) = t
            p += 65
          }
          i = at + len
        case 0xc4 => // DHT: one or more tables
          if (at + 2 > b.length) return None
          val len = be16(b, at)
          var p = at + 2
          val end = at + len
          if (end > b.length) return None
          while (p < end) {
            val tc = u8(b, p) >> 4; val th = u8(b, p) & 15
            if (tc > 1 || th > 3 || p + 17 > end) return None
            val bits = (1 to 16).map(l => u8(b, p + l)).toArray
            val n = bits.sum
            if (p + 17 + n > end || n > 256) return None
            val vals = new Array[Int](n)
            var k = 0
            while (k < n) { vals(k) = u8(b, p + 17 + k); k += 1 }
            val tbl = buildHuff(bits, vals).getOrElse(return None)
            if (tc == 0) huffDc(th) = tbl else huffAc(th) = tbl
            p += 17 + n
          }
          i = at + len
        case 0xdd => // DRI
          if (at + 4 > b.length) return None
          restartInterval = be16(b, at + 2)
          i = at + be16(b, at)
        case 0xc0 | 0xc1 | 0xc2 => // sequential (SOF0/1) / progressive (SOF2) DCT
          if (at + 2 > b.length) return None
          val len = be16(b, at)
          if (at + len > b.length || len < 8) return None
          if (u8(b, at + 2) != 8) return None // 8-bit precision only
          val h = be16(b, at + 3); val w = be16(b, at + 5)
          val nc = u8(b, at + 7)
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3) || len < 8 + 3 * nc) return None
          val comps = (0 until nc).map { c =>
            val o = at + 8 + 3 * c
            val sh = u8(b, o + 1) >> 4
            val sv = u8(b, o + 1) & 15
            // 1 or 2 per axis covers 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 —
            // the layouts real corpora carry; exotic factors are a
            // codec library's job
            if (sh < 1 || sh > 2 || sv < 1 || sv > 2) return None
            JpegComp(u8(b, o), u8(b, o + 2), sh, sv)
          }.toArray
          // chroma must not outsample luma (we upsample, never decimate)
          if (nc == 3 && comps.exists(c => c.sh > comps(0).sh || c.sv > comps(0).sv))
            return None
          if (frame != null) return None // one frame only
          frame = JpegFrame(w, h, comps, progressive = m == 0xc2)
          i = at + len
        case sof if sof >= 0xc3 && sof <= 0xcf && sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
          return None // arithmetic / lossless / hierarchical: codec territory
        case 0xda => // SOS: scan header, then entropy data
          if (frame == null || at + 2 > b.length) return None
          val len = be16(b, at)
          if (at + len > b.length) return None
          val ns = u8(b, at + 2)
          if (ns < 1 || ns > frame.comps.length || len < 6 + 2 * ns) return None
          val scanSel = (0 until ns).map { c =>
            val o = at + 3 + 2 * c
            val id = u8(b, o)
            val ci = frame.comps.indexWhere(_.id == id)
            if (ci < 0) return None
            (ci, u8(b, o + 1) >> 4, u8(b, o + 1) & 15)
          }
          if (!frame.progressive) {
            if (ns != frame.comps.length) return None // baseline: one full scan
            return decodeScan(b, at + len, frame, scanSel, quant, huffDc, huffAc,
              restartInterval)
          }
          // progressive: accumulate this scan's coefficient bits, then
          // resume the marker walk at whatever marker ended the scan
          if (prog == null) {
            prog = ProgJpegState.create(frame).getOrElse(return None)
          }
          val o = at + 3 + 2 * ns
          val ss = u8(b, o); val se = u8(b, o + 1)
          val ah = u8(b, o + 2) >> 4; val al = u8(b, o + 2) & 15
          val end = progressiveScan(b, at + len, prog, scanSel, ss, se, ah, al,
            huffDc, huffAc, restartInterval)
          if (end < 0) return None
          i = end
        case _ =>
          if (at + 2 > b.length) return None
          val len = be16(b, at)
          if (len < 2) return None
          i = at + len
      }
    }
    None
  }

  private final case class JpegComp(id: Int, tq: Int, sh: Int, sv: Int)
  private final case class JpegFrame(w: Int, h: Int, comps: Array[JpegComp],
                                     progressive: Boolean = false)

  /** Canonical Huffman decode tables per ITU T.81 Annex C/F: mincode /
    * maxcode / valptr per code length, symbols in huffval order. */
  private final case class HuffTable(mincode: Array[Int], maxcode: Array[Int],
                                     valptr: Array[Int], huffval: Array[Int])

  private def buildHuff(bits: Array[Int], vals: Array[Int]): Option[HuffTable] = {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      if (bits(l - 1) == 0) maxcode(l) = -1
      else {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxcode(l) = code - 1
        if (code > (1 << l)) return None // over-subscribed length
      }
      code <<= 1
      l += 1
    }
    Some(HuffTable(mincode, maxcode, valptr, vals))
  }

  /** Natural-order index for each zigzag position, generated by the
    * diagonal walk (T.81 Figure A.6). */
  private val ZigzagNat: Array[Int] = {
    val out = new Array[Int](64)
    var x = 0; var y = 0
    var i = 0
    while (i < 64) {
      out(i) = y * 8 + x
      if ((x + y) % 2 == 0) { // moving up-right
        if (x == 7) y += 1 else if (y == 0) x += 1 else { x += 1; y -= 1 }
      } else { // moving down-left
        if (y == 7) x += 1 else if (x == 0) y += 1 else { x -= 1; y += 1 }
      }
      i += 1
    }
    out
  }

  /** MSB-first bit reader over an unstuffed entropy segment. */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0
    private var nbits = 0
    /** next bit, or -1 at segment end */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) return -1
        acc = data(pos) & 0xff; pos += 1; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }
  }

  private def huffDecode(r: BitReader, t: HuffTable): Int = {
    var code = r.bit()
    if (code < 0) return -1
    var l = 1
    while (code > t.maxcode(l)) {
      val x = r.bit()
      if (x < 0) return -1
      code = (code << 1) | x
      l += 1
      if (l > 16) return -1
    }
    val idx = t.valptr(l) + code - t.mincode(l)
    if (idx < 0 || idx >= t.huffval.length) -1 else t.huffval(idx)
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // 13-bit scaled cosines of the Loeffler 8-point factorization
  private val ConstBits = 13
  private val Pass1Bits = 2
  private val F0_298631336 = 2446
  private val F0_390180644 = 3196
  private val F0_541196100 = 4433
  private val F0_765366865 = 6270
  private val F0_899976223 = 7373
  private val F1_175875602 = 9633
  private val F1_501321110 = 12299
  private val F1_847759065 = 15137
  private val F1_961570560 = 16069
  private val F2_053119869 = 16819
  private val F2_562915447 = 20995
  private val F3_072711026 = 25172

  @inline private def descale(x: Long, n: Int): Long = (x + (1L << (n - 1))) >> n

  /** Fixed-point 2-D 8×8 inverse DCT: column pass keeping Pass1Bits
    * fractional bits, row pass descaled by ConstBits+Pass1Bits+3, then
    * +128 level shift and clamp — all Long arithmetic, so hostile
    * coefficient magnitudes cannot overflow. `coef` is natural order;
    * output samples land in `out` (row-major 64). */
  private def idct8x8(coef: Array[Long], out: Array[Int]): Unit = {
    val ws = new Array[Long](64)
    var c = 0
    while (c < 8) { // column pass
      val s0 = coef(c); val s1 = coef(8 + c); val s2 = coef(16 + c)
      val s3 = coef(24 + c); val s4 = coef(32 + c); val s5 = coef(40 + c)
      val s6 = coef(48 + c); val s7 = coef(56 + c)
      if (s1 == 0 && s2 == 0 && s3 == 0 && s4 == 0 && s5 == 0 && s6 == 0 && s7 == 0) {
        // constant column (the overwhelmingly common sparse case) —
        // numerically identical to the full path, verified in spec
        val v = s0 << Pass1Bits
        var r = 0
        while (r < 8) { ws(r * 8 + c) = v; r += 1 }
      } else {
        val z1e = (s2 + s6) * F0_541196100
        val t2 = z1e + s6 * (-F1_847759065)
        val t3 = z1e + s2 * F0_765366865
        val t0 = (s0 + s4) << ConstBits
        val t1 = (s0 - s4) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = s7; var o1 = s5; var o2 = s3; var o3 = s1
        var z1 = o0 + o3; var z2 = o1 + o2
        var z3 = o0 + o2; var z4 = o1 + o3
        val z5 = (z3 + z4) * F1_175875602
        o0 *= F0_298631336
        o1 *= F2_053119869
        o2 *= F3_072711026
        o3 *= F1_501321110
        z1 *= -F0_899976223
        z2 *= -F2_562915447
        z3 = z3 * (-F1_961570560) + z5
        z4 = z4 * (-F0_390180644) + z5
        o0 += z1 + z3; o1 += z2 + z4
        o2 += z2 + z3; o3 += z1 + z4
        val sh = ConstBits - Pass1Bits
        ws(c) = descale(t10 + o3, sh)
        ws(56 + c) = descale(t10 - o3, sh)
        ws(8 + c) = descale(t11 + o2, sh)
        ws(48 + c) = descale(t11 - o2, sh)
        ws(16 + c) = descale(t12 + o1, sh)
        ws(40 + c) = descale(t12 - o1, sh)
        ws(24 + c) = descale(t13 + o0, sh)
        ws(32 + c) = descale(t13 - o0, sh)
      }
      c += 1
    }
    var r = 0
    while (r < 8) { // row pass
      val o = r * 8
      val s0 = ws(o); val s1 = ws(o + 1); val s2 = ws(o + 2); val s3 = ws(o + 3)
      val s4 = ws(o + 4); val s5 = ws(o + 5); val s6 = ws(o + 6); val s7 = ws(o + 7)
      val z1e = (s2 + s6) * F0_541196100
      val t2 = z1e + s6 * (-F1_847759065)
      val t3 = z1e + s2 * F0_765366865
      val t0 = (s0 + s4) << ConstBits
      val t1 = (s0 - s4) << ConstBits
      val t10 = t0 + t3; val t13 = t0 - t3
      val t11 = t1 + t2; val t12 = t1 - t2
      var o0 = s7; var o1 = s5; var o2 = s3; var o3 = s1
      var z1 = o0 + o3; var z2 = o1 + o2
      var z3 = o0 + o2; var z4 = o1 + o3
      val z5 = (z3 + z4) * F1_175875602
      o0 *= F0_298631336
      o1 *= F2_053119869
      o2 *= F3_072711026
      o3 *= F1_501321110
      z1 *= -F0_899976223
      z2 *= -F2_562915447
      z3 = z3 * (-F1_961570560) + z5
      z4 = z4 * (-F0_390180644) + z5
      o0 += z1 + z3; o1 += z2 + z4
      o2 += z2 + z3; o3 += z1 + z4
      val sh = ConstBits + Pass1Bits + 3
      @inline def px(v: Long): Int = {
        val x = descale(v, sh) + 128L
        if (x < 0L) 0 else if (x > 255L) 255 else x.toInt
      }
      out(o) = px(t10 + o3)
      out(o + 7) = px(t10 - o3)
      out(o + 1) = px(t11 + o2)
      out(o + 6) = px(t11 - o2)
      out(o + 2) = px(t12 + o1)
      out(o + 5) = px(t12 - o1)
      out(o + 3) = px(t13 + o0)
      out(o + 4) = px(t13 - o0)
      r += 1
    }
  }

  /** Entropy-decode the interleaved scan: unstuff/segment at restart
    * markers, Huffman-decode every MCU (one 8×8 block per component at
    * 1×1 sampling), dequantize, IDCT, assemble component planes, crop,
    * and color-convert (JFIF YCbCr→RGB, 16-bit fixed point) if 3
    * components. */
  private def decodeScan(b: Array[Byte], scanStart: Int, frame: JpegFrame,
                         scanSel: Seq[(Int, Int, Int)],
                         quant: Array[Array[Int]], huffDc: Array[HuffTable],
                         huffAc: Array[HuffTable],
                         restartInterval: Int): Option[JpegRaster] = {
    val w = frame.w; val h = frame.h
    val nc = frame.comps.length
    if (w.toLong * h * nc > (64L << 20)) return None
    // a single-component scan is non-interleaved: its MCU is one block
    // regardless of the declared factors (T.81 A.2.2), so the effective
    // sampling ratio is 1; interleaved 3-component scans use the real
    // factors with luma = max (guarded at SOF)
    val sh = Array.tabulate(nc)(i => if (nc == 1) 1 else frame.comps(i).sh)
    val sv = Array.tabulate(nc)(i => if (nc == 1) 1 else frame.comps(i).sv)
    val hMax = sh.max
    val vMax = sv.max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val totalMcus = mcusX.toLong * mcusY
    if (totalMcus > Int.MaxValue) return None
    // per-component decode context
    val qt = new Array[Array[Int]](nc)
    val dct = new Array[HuffTable](nc)
    val act = new Array[HuffTable](nc)
    scanSel.foreach { case (ci, td, ta) =>
      val tq = frame.comps(ci).tq
      if (tq > 3 || quant(tq) == null) return None
      if (td > 3 || ta > 3 || huffDc(td) == null || huffAc(ta) == null) return None
      qt(ci) = quant(tq)
      dct(ci) = huffDc(td)
      act(ci) = huffAc(ta)
    }
    // segment the entropy data at restart markers, unstuffing 0xFF00
    val (segments, _) = entropySegments(b, scanStart)
    // decode MCUs
    val strides = Array.tabulate(nc)(i => mcusX * sh(i) * 8)
    val planes = Array.tabulate(nc)(i => new Array[Byte](strides(i) * mcusY * sv(i) * 8))
    val pred = new Array[Int](nc)
    val coefZZ = new Array[Int](64)
    val coefNat = new Array[Long](64)
    val samples = new Array[Int](64)
    var seg = 0
    var reader = new BitReader(segments(seg))
    var mcu = 0
    val perSeg = if (restartInterval > 0) restartInterval else Int.MaxValue
    // decode one entropy-coded block of component ci into `samples`
    def decodeBlock(ci: Int): Boolean = {
      java.util.Arrays.fill(coefZZ, 0)
      val t = huffDecode(reader, dct(ci))
      if (t < 0 || t > 15) return false
      val diffBits = reader.receive(t)
      if (diffBits < 0) return false
      pred(ci) += extend(diffBits, t)
      coefZZ(0) = pred(ci)
      var k = 1
      var eob = false
      while (!eob && k < 64) {
        val rs = huffDecode(reader, act(ci))
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 else eob = true
        } else {
          k += r
          if (k > 63) return false
          val vb = reader.receive(s)
          if (vb < 0) return false
          coefZZ(k) = extend(vb, s)
          k += 1
        }
      }
      val q = qt(ci)
      var z = 0
      while (z < 64) { coefNat(ZigzagNat(z)) = coefZZ(z).toLong * q(z); z += 1 }
      idct8x8(coefNat, samples)
      true
    }
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % perSeg == 0) {
        seg += 1
        if (seg >= segments.length) return None
        reader = new BitReader(segments(seg))
        java.util.Arrays.fill(pred, 0)
      }
      val mcuX = (mcu % mcusX).toInt
      val mcuY = (mcu / mcusX).toInt
      var ci = 0
      while (ci < nc) {
        // the component's sh(ci)×sv(ci) blocks, raster order in the MCU
        var byi = 0
        while (byi < sv(ci)) {
          var bxi = 0
          while (bxi < sh(ci)) {
            if (!decodeBlock(ci)) return None
            val plane = planes(ci)
            val stride = strides(ci)
            val bx = (mcuX * sh(ci) + bxi) * 8
            val by = (mcuY * sv(ci) + byi) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                plane((by + yy) * stride + bx + xx) = samples(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bxi += 1
          }
          byi += 1
        }
        ci += 1
      }
      mcu += 1
    }
    assembleJpeg(w, h, nc, planes, strides, sh, sv, hMax, vMax)
  }

  /** Crop + upsample (box replication — each chroma sample covers its
    * hMax/sh × vMax/sv pixel box exactly) + color-convert: the shared
    * finisher for sequential and progressive decode. */
  private def assembleJpeg(w: Int, h: Int, nc: Int, planes: Array[Array[Byte]],
                           strides: Array[Int], sh: Array[Int], sv: Array[Int],
                           hMax: Int, vMax: Int): Option[JpegRaster] = {
    if (nc == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * strides(0), out, y * w, w)
        y += 1
      }
      Some(JpegRaster(w, h, 1, out))
    } else {
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = planes(0)(y * strides(0) + x) & 0xff
          val cb = (planes(1)((y * sv(1) / vMax) * strides(1) + x * sh(1) / hMax) & 0xff) - 128
          val cr = (planes(2)((y * sv(2) / vMax) * strides(2) + x * sh(2) / hMax) & 0xff) - 128
          val o = (y * w + x) * 3
          out(o) = clamp255(yv + (((91881 * cr) + 32768) >> 16)).toByte
          out(o + 1) = clamp255(yv + (((-22554 * cb - 46802 * cr) + 32768) >> 16)).toByte
          out(o + 2) = clamp255(yv + (((116130 * cb) + 32768) >> 16)).toByte
          x += 1
        }
        y += 1
      }
      Some(JpegRaster(w, h, 3, out))
    }
  }

  /** Unstuff (0xFF00 → 0xFF) and split the entropy-coded data starting
    * at `start` into restart-interval segments; returns the segments
    * plus the offset of the marker that ended the scan (the 0xFF
    * position, or the buffer end). */
  private def entropySegments(b: Array[Byte], start: Int): (Seq[Array[Byte]], Int) = {
    val segments = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    var p = start
    var done = false
    while (!done && p < b.length) {
      val v = u8(b, p)
      if (v != 0xff) { cur.write(v); p += 1 }
      else if (p + 1 >= b.length) done = true
      else {
        val m = u8(b, p + 1)
        if (m == 0x00) { cur.write(0xff); p += 2 }
        else if (m >= 0xd0 && m <= 0xd7) {
          segments += cur.toByteArray; cur.reset(); p += 2
        } else done = true // EOI or any other marker ends the scan
      }
    }
    segments += cur.toByteArray
    (segments.toSeq, p)
  }

  /** Accumulated DCT coefficients of a progressive frame: per
    * component, the MCU-padded block grid with one zigzag-order 64-int
    * block per cell, filled in by successive scans and dequantized +
    * IDCTed only once EOI arrives. */
  private final class ProgJpegState(val frame: JpegFrame) {
    val nc: Int = frame.comps.length
    // a single-component frame has no interleave, so its declared
    // factors are irrelevant (same contract as the sequential path)
    val sh: Array[Int] = Array.tabulate(nc)(i => if (nc == 1) 1 else frame.comps(i).sh)
    val sv: Array[Int] = Array.tabulate(nc)(i => if (nc == 1) 1 else frame.comps(i).sv)
    val hMax: Int = sh.max
    val vMax: Int = sv.max
    val mcusX: Int = (frame.w + 8 * hMax - 1) / (8 * hMax)
    val mcusY: Int = (frame.h + 8 * vMax - 1) / (8 * vMax)
    // storage grid: padded to MCU boundaries (interleaved DC scans
    // cover the padding blocks; non-interleaved scans leave them 0)
    val wb: Array[Int] = Array.tabulate(nc)(i => mcusX * sh(i))
    val hb: Array[Int] = Array.tabulate(nc)(i => mcusY * sv(i))
    // non-interleaved scan grid: blocks covering the component's own
    // samples, NOT padded to MCU multiples (T.81 A.2.2)
    val wbNI: Array[Int] =
      Array.tabulate(nc)(i => ((frame.w * sh(i) + hMax - 1) / hMax + 7) / 8)
    val hbNI: Array[Int] =
      Array.tabulate(nc)(i => ((frame.h * sv(i) + vMax - 1) / vMax + 7) / 8)
    val coefs: Array[Array[Int]] =
      Array.tabulate(nc)(i => new Array[Int](wb(i) * hb(i) * 64))
    var scans: Int = 0
  }

  private object ProgJpegState {
    def create(frame: JpegFrame): Option[ProgJpegState] = {
      val nc = frame.comps.length
      if (frame.w.toLong * frame.h * nc > (64L << 20)) return None
      val st = new ProgJpegState(frame)
      // hostile SOF must not allocate unbounded coefficient memory
      val cells = (0 until nc).map(i => st.wb(i).toLong * st.hb(i) * 64).sum
      if (cells > (32L << 20)) None else Some(st)
    }
  }

  /** One progressive scan (T.81 Annex G): DC first/refine (interleaved
    * or single-component), AC first/refine (single-component, spectral
    * band Ss..Se, successive-approximation bit Al, EOB runs, refinement
    * correction bits). Mutates `st.coefs`; returns the offset of the
    * marker that ended the scan, or -1 on any malformed input. */
  private def progressiveScan(b: Array[Byte], scanStart: Int, st: ProgJpegState,
                              scanSel: Seq[(Int, Int, Int)],
                              ss: Int, se: Int, ah: Int, al: Int,
                              huffDc: Array[HuffTable], huffAc: Array[HuffTable],
                              restartInterval: Int): Int = {
    val ns = scanSel.length
    val isDc = ss == 0
    val refine = ah > 0
    if (isDc) { if (se != 0) return -1 }
    else if (ns != 1 || se < ss || se > 63) return -1
    if (al > 13 || ah > 14) return -1
    if (scanSel.map(_._1).distinct.length != ns) return -1
    // resolve tables up front: DC first needs a DC table, AC scans an
    // AC table; DC refinement is raw bits and needs neither
    val dct = new Array[HuffTable](st.nc)
    val act = new Array[HuffTable](st.nc)
    scanSel.foreach { case (ci, td, ta) =>
      if (isDc && !refine) {
        if (td > 3 || huffDc(td) == null) return -1
        dct(ci) = huffDc(td)
      }
      if (!isDc) {
        if (ta > 3 || huffAc(ta) == null) return -1
        act(ci) = huffAc(ta)
      }
    }
    val (segments, endPos) = entropySegments(b, scanStart)
    var seg = 0
    var reader = new BitReader(segments(seg))
    val pred = new Array[Int](st.nc)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al
    // ── per-block decoders ──
    def dcFirst(ci: Int, off: Int): Boolean = {
      val t = huffDecode(reader, dct(ci))
      if (t < 0 || t > 15) return false
      val diffBits = reader.receive(t)
      if (diffBits < 0) return false
      pred(ci) += extend(diffBits, t)
      st.coefs(ci)(off) = pred(ci) << al
      true
    }
    def dcRefine(ci: Int, off: Int): Boolean = {
      val bit = reader.bit()
      if (bit < 0) return false
      if (bit == 1) st.coefs(ci)(off) |= p1
      true
    }
    def acFirst(ci: Int, off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val c = st.coefs(ci)
      var k = ss
      while (k <= se) {
        val rs = huffDecode(reader, act(ci))
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s != 0) {
          k += r
          if (k > se) return false
          val v = reader.receive(s)
          if (v < 0) return false
          c(off + k) = extend(v, s) << al
          k += 1
        } else if (r == 15) k += 16 // ZRL: sixteen zero coefficients
        else {
          eobrun = (1 << r) - 1 // this block is the run's first member
          if (r > 0) {
            val e = reader.receive(r)
            if (e < 0) return false
            eobrun += e
          }
          return true
        }
      }
      true
    }
    // the G.1.2.3 correction-bit algorithm: newly significant
    // coefficients arrive as ±2^Al; every already-nonzero coefficient
    // crossed on the way (and the whole band once the EOB run starts)
    // consumes one correction bit
    def acRefine(ci: Int, off: Int): Boolean = {
      val c = st.coefs(ci)
      def correct(idx: Int): Boolean = {
        val bit = reader.bit()
        if (bit < 0) return false
        if (bit == 1 && (c(idx) & p1) == 0)
          c(idx) += (if (c(idx) >= 0) p1 else m1)
        true
      }
      var k = ss
      if (eobrun == 0) {
        var outer = true
        while (outer && k <= se) {
          val rs = huffDecode(reader, act(ci))
          if (rs < 0) return false
          var r = rs >> 4
          val s = rs & 15
          var newVal = 0
          if (s != 0) {
            if (s != 1) return false // new coefficients are always ±1 here
            val bit = reader.bit()
            if (bit < 0) return false
            newVal = if (bit == 1) p1 else m1
          } else if (r != 15) {
            eobrun = 1 << r
            if (r > 0) {
              val e = reader.receive(r)
              if (e < 0) return false
              eobrun += e
            }
            outer = false // rest of the band is EOB-run territory
          }
          if (outer) {
            // advance past r zero-history coefficients, correcting the
            // nonzero ones crossed on the way
            var advancing = true
            while (advancing && k <= se) {
              if (c(off + k) != 0) {
                if (!correct(off + k)) return false
                k += 1
              } else if (r == 0) advancing = false // landed on the target
              else { r -= 1; k += 1 }
            }
            if (newVal != 0) {
              if (k > se) return false
              c(off + k) = newVal
            }
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          if (c(off + k) != 0 && !correct(off + k)) return false
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    def decodeUnit(ci: Int, off: Int): Boolean =
      if (isDc) { if (refine) dcRefine(ci, off) else dcFirst(ci, off) }
      else { if (refine) acRefine(ci, off) else acFirst(ci, off) }
    // ── unit loop: MCUs when interleaved, component blocks when not ──
    val perSeg = if (restartInterval > 0) restartInterval else Int.MaxValue
    def atRestart(unit: Int): Boolean = {
      if (restartInterval > 0 && unit > 0 && unit % perSeg == 0) {
        seg += 1
        if (seg >= segments.length) return false
        reader = new BitReader(segments(seg))
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      true
    }
    if (ns == 1) {
      val ci = scanSel.head._1
      val cols = st.wbNI(ci); val total = cols * st.hbNI(ci)
      var u = 0
      while (u < total) {
        if (!atRestart(u)) return -1
        val off = ((u / cols) * st.wb(ci) + u % cols) * 64
        if (!decodeUnit(ci, off)) return -1
        u += 1
      }
    } else {
      val total = st.mcusX * st.mcusY
      var mcu = 0
      while (mcu < total) {
        if (!atRestart(mcu)) return -1
        val mcuX = mcu % st.mcusX
        val mcuY = mcu / st.mcusX
        scanSel.foreach { case (ci, _, _) =>
          var byi = 0
          while (byi < st.sv(ci)) {
            var bxi = 0
            while (bxi < st.sh(ci)) {
              val off = ((mcuY * st.sv(ci) + byi) * st.wb(ci) +
                mcuX * st.sh(ci) + bxi) * 64
              if (!decodeUnit(ci, off)) return -1
              bxi += 1
            }
            byi += 1
          }
        }
        mcu += 1
      }
    }
    st.scans += 1
    endPos
  }

  /** Dequantize + IDCT every accumulated block, then run the shared
    * crop/upsample/color finisher. */
  private def finishProgressive(st: ProgJpegState,
                                quant: Array[Array[Int]]): Option[JpegRaster] = {
    val frame = st.frame
    val nc = st.nc
    val qt = new Array[Array[Int]](nc)
    var ci = 0
    while (ci < nc) {
      val tq = frame.comps(ci).tq
      if (tq > 3 || quant(tq) == null) return None
      qt(ci) = quant(tq)
      ci += 1
    }
    val strides = Array.tabulate(nc)(i => st.wb(i) * 8)
    val planes = Array.tabulate(nc)(i => new Array[Byte](strides(i) * st.hb(i) * 8))
    val coefNat = new Array[Long](64)
    val samples = new Array[Int](64)
    ci = 0
    while (ci < nc) {
      val c = st.coefs(ci)
      val q = qt(ci)
      val plane = planes(ci)
      val stride = strides(ci)
      var blk = 0
      val nBlks = st.wb(ci) * st.hb(ci)
      while (blk < nBlks) {
        val off = blk * 64
        var z = 0
        while (z < 64) { coefNat(ZigzagNat(z)) = c(off + z).toLong * q(z); z += 1 }
        idct8x8(coefNat, samples)
        val bx = (blk % st.wb(ci)) * 8
        val by = (blk / st.wb(ci)) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            plane((by + yy) * stride + bx + xx) = samples(yy * 8 + xx).toByte
            xx += 1
          }
          yy += 1
        }
        blk += 1
      }
      ci += 1
    }
    assembleJpeg(frame.w, frame.h, nc, planes, strides, st.sh, st.sv, st.hMax, st.vMax)
  }

  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  // ── GIF ─────────────────────────────────────────────────────────────

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Logical screen descriptor (little-endian 16-bit dims) + a block walk
    * counting image descriptors — the real frame count for animated GIFs.
    * Color resolution bits give the original palette bit depth. */
  private def parseGif(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 13) return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w == 0 || h == 0) return None
    val flags = u8(b, 10)
    val depth = ((flags >> 4) & 0x7) + 1
    var i = 13
    if ((flags & 0x80) != 0) i += 3 * (1 << ((flags & 0x7) + 1)) // global color table
    var frames = 0
    var done = false
    def skipSubBlocks(start: Int): Int = {
      var p = start
      while (p < b.length && u8(b, p) != 0) p += 1 + u8(b, p)
      p + 1 // past the terminator
    }
    while (!done && i < b.length) {
      u8(b, i) match {
        case 0x2c => // image descriptor
          if (i + 10 > b.length) { done = true }
          else {
            frames += 1
            val lflags = u8(b, i + 9)
            var p = i + 10
            if ((lflags & 0x80) != 0) p += 3 * (1 << ((lflags & 0x7) + 1))
            p += 1 // LZW minimum code size
            i = skipSubBlocks(p)
          }
        case 0x21 => // extension: introducer, label, sub-blocks
          i = skipSubBlocks(i + 2)
        case 0x3b => done = true // trailer
        case _ => done = true // malformed past the frames we already saw
      }
    }
    if (frames == 0) frames = 1 // header-only blob: LSD still describes one image
    Some(MediaMeta("gif", width = Some(w), height = Some(h),
      nFrames = Some(frames), bitDepth = Some(depth)))
  }

  /** Decoded GIF frames: per frame the row-major COLOR-INDEX bytes
    * (the color table lookup is the caller's business — the fixtures
    * use a grayscale identity table, so index ≡ luma). */
  final case class GifRaster(width: Int, height: Int, frames: Seq[Array[Byte]])

  /** FULL raster decode for non-interlaced GIFs — a complete, general
    * LZW decoder (variable code width 3..12 bits LSB-first, dictionary
    * growth, CLEAR/EOI handling, the k-omega-k self-referencing case) in
    * plain byte arithmetic; no codec library. Frames must be full-size
    * at origin (the fixtures' shape; partial-update animation is a real
    * codec's compositing job). Interlaced frames are deinterlaced via
    * the spec's four-pass row order. Local color tables are skipped
    * (the raster is color INDEXES; see [[gifFramesRgb]] for table
    * resolution). Returns None for malformed streams or out-of-range
    * codes; decoding stops cleanly at EOI or stream end. */
  def gifFrames(b: Array[Byte]): Option[GifRaster] = {
    if (!isGif(b) || b.length < 13) return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > (64L << 20)) return None
    val flags = u8(b, 10)
    var i = 13
    if ((flags & 0x80) != 0) i += 3 * (1 << ((flags & 7) + 1)) // skip GCT
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (i < b.length && u8(b, i) != 0x3b) {
      u8(b, i) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
          i += 1
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return None
          val iw = le16(b, i + 5); val ih = le16(b, i + 7)
          val ifl = u8(b, i + 9)
          if (le16(b, i + 1) != 0 || le16(b, i + 3) != 0 || iw != w || ih != h)
            return None // partial-update frame: compositing out of scope
          val interlaced = (ifl & 0x40) != 0
          i += 10
          if ((ifl & 0x80) != 0) i += 3 * (1 << ((ifl & 7) + 1)) // local table
          if (i >= b.length) return None
          val mcs = u8(b, i); i += 1
          if (mcs < 2 || mcs > 8) return None
          // concatenate the LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && u8(b, i) != 0) {
            val n = u8(b, i)
            if (i + 1 + n > b.length) return None
            data.write(b, i + 1, n)
            i += 1 + n
          }
          i += 1 // terminator
          val decoded = lzwDecode(data.toByteArray, mcs, iw * ih) match {
            case Some(px) => px
            case None => return None
          }
          frames += (if (interlaced) deinterlace(decoded, iw, ih) else decoded)
        case _ => return None
      }
    }
    if (frames.isEmpty) None else Some(GifRaster(w, h, frames.toSeq))
  }

  /** GIF frames with color tables RESOLVED: per frame the row-major
    * RGB bytes (3 per pixel) plus the count of transparent pixels. */
  final case class GifRgbRaster(width: Int, height: Int,
                                frames: Seq[Array[Byte]], transparent: Seq[Int])

  /** [[gifFrames]] plus the parts a real-world GIF needs resolved: the
    * ACTIVE color table per frame (local when the image descriptor
    * carries one, else the global table — a frame with neither is
    * malformed), and the Graphic Control Extension's transparency
    * (label 0xf9: when the packed transparency flag is set, pixels of
    * the declared index are counted per frame; GCE state applies to
    * the next image only, per spec). Out-of-table indexes → None. */
  def gifFramesRgb(b: Array[Byte]): Option[GifRgbRaster] = {
    if (!isGif(b) || b.length < 13) return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > (64L << 20)) return None
    val flags = u8(b, 10)
    var i = 13
    var global: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (1 << ((flags & 7) + 1))
      if (i + n > b.length) return None
      global = java.util.Arrays.copyOfRange(b, i, i + n)
      i += n
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val transCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var transIdx = -1 // pending GCE transparency, next image only
    while (i < b.length && u8(b, i) != 0x3b) {
      u8(b, i) match {
        case 0x21 =>
          if (i + 2 > b.length) return None
          val label = u8(b, i + 1)
          if (label == 0xf9 && i + 7 <= b.length && u8(b, i + 2) >= 4) {
            val packed = u8(b, i + 3)
            transIdx = if ((packed & 1) != 0) u8(b, i + 6) else -1
          }
          i += 2
          while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
          i += 1
        case 0x2c =>
          if (i + 10 > b.length) return None
          val iw = le16(b, i + 5); val ih = le16(b, i + 7)
          val ifl = u8(b, i + 9)
          if (le16(b, i + 1) != 0 || le16(b, i + 3) != 0 || iw != w || ih != h)
            return None
          val interlaced = (ifl & 0x40) != 0
          i += 10
          var table = global
          if ((ifl & 0x80) != 0) {
            val n = 3 * (1 << ((ifl & 7) + 1))
            if (i + n > b.length) return None
            table = java.util.Arrays.copyOfRange(b, i, i + n)
            i += n
          }
          if (table == null) return None // no active color table
          if (i >= b.length) return None
          val mcs = u8(b, i); i += 1
          if (mcs < 2 || mcs > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && u8(b, i) != 0) {
            val n = u8(b, i)
            if (i + 1 + n > b.length) return None
            data.write(b, i + 1, n)
            i += 1 + n
          }
          i += 1
          val idx0 = lzwDecode(data.toByteArray, mcs, iw * ih) match {
            case Some(px) => px
            case None => return None
          }
          val idx = if (interlaced) deinterlace(idx0, iw, ih) else idx0
          val nColors = table.length / 3
          val rgb = new Array[Byte](iw * ih * 3)
          var nTrans = 0
          var p = 0
          while (p < idx.length) {
            val ci = idx(p) & 0xff
            if (ci >= nColors) return None
            if (ci == transIdx) nTrans += 1
            rgb(3 * p) = table(3 * ci)
            rgb(3 * p + 1) = table(3 * ci + 1)
            rgb(3 * p + 2) = table(3 * ci + 2)
            p += 1
          }
          frames += rgb
          transCounts += nTrans
          transIdx = -1 // GCE consumed by this image
        case _ => return None
      }
    }
    if (frames.isEmpty) None
    else Some(GifRgbRaster(w, h, frames.toSeq, transCounts.toSeq))
  }

  /** GIF interlace row order (spec appendix E): pass 1 every 8th row
    * from 0, pass 2 every 8th from 4, pass 3 every 4th from 2, pass 4
    * every 2nd from 1. Transmitted row k lands on raster row
    * `order(k)`. */
  private[codec] def interlaceOrder(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var k = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { out(k) = r; k += 1; r += step }
    }
    out
  }

  private def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val order = interlaceOrder(h)
    val out = new Array[Byte](px.length)
    var k = 0
    while (k < h) {
      System.arraycopy(px, k * w, out, order(k) * w, w)
      k += 1
    }
    out
  }

  /** General GIF-flavor LZW: codes packed LSB-first, width grows from
    * minCodeSize+1 up to 12 bits as the dictionary fills, CLEAR resets,
    * EOI (or stream end) stops. Emits exactly `expected` bytes or None. */
  private[codec] def lzwDecode(data: Array[Byte], mcs: Int, expected: Int): Option[Array[Byte]] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var outLen = 0
    var codeSize = mcs + 1
    var nextCode = eoi + 1
    var prev = -1
    var acc = 0L; var nbits = 0; var di = 0
    val stack = new Array[Byte](4096)
    def emitChain(code: Int): Int = { // returns the chain's FIRST byte
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      if (outLen < expected) { out(outLen) = c.toByte; outLen += 1 }
      while (sp > 0) {
        sp -= 1
        if (outLen < expected) { out(outLen) = stack(sp); outLen += 1 }
      }
      first
    }
    var running = true
    while (running) {
      while (nbits < codeSize && di < data.length) {
        acc |= (data(di) & 0xffL) << nbits; nbits += 8; di += 1
      }
      if (nbits < codeSize) running = false // stream end
      else {
        val code = (acc & ((1L << codeSize) - 1)).toInt
        acc >>= codeSize; nbits -= codeSize
        if (code == clear) {
          codeSize = mcs + 1; nextCode = eoi + 1; prev = -1
        } else if (code == eoi) running = false
        else if (prev == -1) {
          if (code >= clear) return None // first code after clear must be literal
          emitChain(code)
          prev = code
        } else if (code < nextCode) {
          val first = emitChain(code)
          if (nextCode < 4096) {
            prefix(nextCode) = prev; suffix(nextCode) = first.toByte; nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        } else if (code == nextCode && nextCode < 4096) {
          // the k-omega-k case: entry being defined is itself emitted
          prefix(nextCode) = prev
          suffix(nextCode) = {
            var c = prev
            while (c >= clear) c = prefix(c)
            c.toByte
          }
          nextCode += 1
          emitChain(nextCode - 1)
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          prev = code
        } else return None // out-of-range code
        if (outLen >= expected) running = false
      }
    }
    if (outLen == expected) Some(out) else None
  }

  // ── WAV ─────────────────────────────────────────────────────────────

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** RIFF chunk walk: `fmt ` gives channels / sample rate / bits per
    * sample; `data` size over block align gives the sample-frame count,
    * and frames over rate the duration. Chunks are even-padded. */
  private def parseWav(b: Array[Byte]): Option[MediaMeta] = {
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val id = tag(b, i)
      val size = le32(b, i + 4) // 0 .. 2^32-1: advance in Long, never Int
      if (id == "fmt " && size >= 16 && i + 24 <= b.length) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        // size may describe bytes beyond this blob (header-only sample) —
        // the declared size is still the authoritative frame count
        dataSize = size
      }
      // even padding; a giant declared size simply walks past the blob end
      i = math.min(i.toLong + 8L + size + (size & 1L), b.length.toLong).toInt
    }
    if (channels <= 0 || rate <= 0) return None
    val frames =
      if (dataSize >= 0 && blockAlign > 0) Some(math.min(dataSize / blockAlign, Int.MaxValue).toInt)
      else None
    val durMs = frames.map(f => f.toLong * 1000L / rate)
    Some(MediaMeta("wav", nFrames = frames, bitDepth = Some(bits).filter(_ > 0),
      channels = Some(channels), sampleRate = Some(rate), durationMs = durMs))
  }

  /** Decoded 16-bit PCM: `samples` is the interleaved frame-major
    * stream (frame 0 ch 0, frame 0 ch 1, …), exactly as stored. */
  final case class WavPcm(channels: Int, sampleRate: Int, samples: Array[Short])

  /** FULL sample decode for 16-bit PCM WAVs — the one format in the
    * parser family whose payload needs no codec library: the data chunk
    * IS the samples, little-endian int16 interleaved. Returns None for
    * anything that is not a PCM (format code 1) 16-bit WAV, and
    * truncates to the bytes actually present in the blob (a header-only
    * sample whose declared data size exceeds the blob decodes to the
    * prefix that exists — never a read past the end). */
  def wavPcm16(b: Array[Byte]): Option[WavPcm] = {
    if (!isWav(b)) return None
    var i = 12
    var fmtCode = -1; var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      if (id == "fmt " && size >= 16 && i + 24 <= b.length) {
        fmtCode = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        bits = le16(b, i + 22)
      } else if (id == "data" && dataOff < 0) {
        dataOff = i + 8
        dataLen = size
      }
      i = math.min(i.toLong + 8L + size + (size & 1L), b.length.toLong).toInt
    }
    if (fmtCode != 1 || channels <= 0 || rate <= 0 || bits != 16 || dataOff < 0)
      return None
    val avail = math.min(dataLen, (b.length - dataOff).toLong).toInt
    val n = avail / 2
    val out = new Array[Short](n)
    var j = 0
    while (j < n) {
      out(j) = ((b(dataOff + 2 * j) & 0xff) | (b(dataOff + 2 * j + 1) << 8)).toShort
      j += 1
    }
    Some(WavPcm(channels, rate, out))
  }

  // ── MP3 ─────────────────────────────────────────────────────────────

  /** An ID3v2 tag, or a raw MPEG-audio frame sync (11 set bits). The
    * sync is the weakest magic in the family — `parse` dispatches it
    * last, after every container with a real signature. */
  def isMp3(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
        (u8(b, 0) == 0xFF && (u8(b, 1) & 0xE0) == 0xE0))

  // kbps by [versionGroup 0=MPEG1 1=MPEG2/2.5][layer 1..3][index 1..14]
  private val Mp3Bitrates: Array[Array[Array[Int]]] = Array(
    Array(
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
    Array(
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  /** MPEG audio metadata from the first frame header — version/layer/
    * bitrate/samplerate tables per the public MPEG-1/2 audio spec — plus
    * the two duration sources real archives carry: a Xing/Info VBR tag
    * (frame count behind the layer-III side info → exact duration) or,
    * absent one, the CBR estimate `audio_bytes × 8 / bitrate` where the
    * audio span excludes a leading ID3v2 (synchsafe size) and a trailing
    * 128-byte ID3v1 `TAG` block. `n_frames` is the Xing MPEG-frame count
    * when declared (unlike WAV's PCM sample frames — documented here),
    * otherwise the floor of the CBR estimate. Free-form (index 0) and
    * reserved bitrates/samplerates reject: no guessed numbers. */
  private def parseMp3(b: Array[Byte]): Option[MediaMeta] = {
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // synchsafe 28-bit size; a high bit set anywhere is corruption
      if ((u8(b, 6) | u8(b, 7) | u8(b, 8) | u8(b, 9)) >= 0x80) return None
      val sz = (u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9)
      off = 10 + sz
    }
    if (off < 0 || off + 4 > b.length) return None
    if (!(u8(b, off) == 0xFF && (u8(b, off + 1) & 0xE0) == 0xE0)) return None
    val verBits = (u8(b, off + 1) >> 3) & 3 // 0=MPEG2.5 2=MPEG2 3=MPEG1
    val layerBits = (u8(b, off + 1) >> 1) & 3 // 1=III 2=II 3=I
    if (verBits == 1 || layerBits == 0) return None
    val layer = 4 - layerBits // 1..3
    val vGroup = if (verBits == 3) 0 else 1
    val brIdx = (u8(b, off + 2) >> 4) & 0xF
    val srIdx = (u8(b, off + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val baseRate = Array(44100, 48000, 32000)(srIdx)
    val rate = verBits match {
      case 3 => baseRate
      case 2 => baseRate / 2
      case _ => baseRate / 4
    }
    val kbps = Mp3Bitrates(vGroup)(layer - 1)(brIdx)
    val mono = ((u8(b, off + 3) >> 6) & 3) == 3
    val channels = if (mono) 1 else 2
    val samplesPerFrame =
      if (layer == 1) 384
      else if (layer == 2) 1152
      else if (vGroup == 0) 1152
      else 576
    // Xing/Info: behind the layer-III side info of the first frame
    val sideInfo =
      if (vGroup == 0) { if (mono) 17 else 32 }
      else { if (mono) 9 else 17 }
    val xingOff = off + 4 + sideInfo
    val xingFrames: Option[Int] =
      if (layer == 3 && xingOff + 12 <= b.length &&
        (tag(b, xingOff) == "Xing" || tag(b, xingOff) == "Info") &&
        (be32(b, xingOff + 4) & 1L) == 1L) {
        val f = be32(b, xingOff + 8)
        if (f > 0 && f <= Int.MaxValue) Some(f.toInt) else None
      } else None
    val hasId3v1 = b.length >= off + 128 + 4 &&
      b(b.length - 128) == 'T' && b(b.length - 127) == 'A' && b(b.length - 126) == 'G'
    val audioBytes = (b.length - off - (if (hasId3v1) 128 else 0)).toLong
    val durMs = xingFrames match {
      case Some(f) => Some(f.toLong * samplesPerFrame * 1000L / rate)
      case None if kbps > 0 && audioBytes > 0 => Some(audioBytes * 8L / kbps)
      case None => None
    }
    val frameLen = samplesPerFrame / 8 * (kbps * 1000) / rate
    val nFrames = xingFrames.orElse(
      if (frameLen > 0) Some(math.min(audioBytes / frameLen, Int.MaxValue.toLong).toInt) else None)
    Some(MediaMeta("mp3", nFrames = nFrames, channels = Some(channels),
      sampleRate = Some(rate), durationMs = durMs))
  }

  // ── FLAC ────────────────────────────────────────────────────────────

  def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  /** STREAMINFO is mandatory-first after `fLaC`: the packed 8 bytes at
    * block offset 10 carry sample rate (20 bits), channels−1 (3),
    * bits-per-sample−1 (5) and total inter-channel samples (36).
    * `n_frames` is total samples (the WAV convention); a zero total —
    * legal for live streams — leaves frames and duration unknown. */
  private def parseFlac(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 8 + 34) return None
    if ((u8(b, 4) & 0x7F) != 0) return None // STREAMINFO must be first
    val blen = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if (blen < 34) return None
    val o = 8 + 10
    val rate = (u8(b, o) << 12) | (u8(b, o + 1) << 4) | (u8(b, o + 2) >> 4)
    val ch = ((u8(b, o + 2) >> 1) & 7) + 1
    val bps = (((u8(b, o + 2) & 1) << 4) | (u8(b, o + 3) >> 4)) + 1
    val total = ((u8(b, o + 3) & 0xF).toLong << 32) | be32(b, o + 4)
    if (rate <= 0) return None
    val frames = if (total > 0 && total <= Int.MaxValue) Some(total.toInt) else None
    Some(MediaMeta("flac", nFrames = frames, bitDepth = Some(bps),
      channels = Some(ch), sampleRate = Some(rate),
      durationMs = if (total > 0) Some(total * 1000L / rate) else None))
  }

  // ── Ogg Vorbis ──────────────────────────────────────────────────────

  def isOgg(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'

  /** Vorbis identification header out of the first Ogg page (version-0
    * pages, packet `\x01vorbis`: channels u8, rate u32le), then a
    * forward page walk — 27-byte header + segment table + summed
    * lacing values, never a byte-pattern search (payloads may contain
    * `OggS`) — to the last page whose granule position is the total
    * PCM sample count. A walk that derails (truncated page) keeps the
    * deepest granule it reached; -1 granules (continuation pages)
    * never count. */
  private def parseOgg(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 28 || u8(b, 4) != 0) return None
    val nseg0 = u8(b, 26)
    val body0 = 27 + nseg0
    if (body0 + 16 > b.length) return None
    if (u8(b, body0) != 1) return None
    var k = 0
    val word = "vorbis"
    while (k < 6) {
      if (b(body0 + 1 + k) != word.charAt(k).toByte) return None
      k += 1
    }
    val ch = u8(b, body0 + 11)
    val rate = le32(b, body0 + 12)
    if (ch <= 0 || rate <= 0 || rate > Int.MaxValue) return None
    // page walk for the final granule position
    var lastGranule = -1L
    var i = 0
    var pages = 0
    while (i + 27 <= b.length && pages < (1 << 20) &&
      b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' && b(i + 3) == 'S') {
      val granule = le32(b, i + 6) | (le32(b, i + 10) << 32)
      val nseg = u8(b, i + 26)
      if (i + 27 + nseg > b.length) {
        i = b.length // truncated segment table: stop
      } else {
        var bodyLen = 0
        var s = 0
        while (s < nseg) { bodyLen += u8(b, i + 27 + s); s += 1 }
        if (granule >= 0) lastGranule = granule
        i += 27 + nseg + bodyLen
        pages += 1
      }
    }
    Some(MediaMeta("ogg", channels = Some(ch), sampleRate = Some(rate.toInt),
      nFrames = if (lastGranule > 0 && lastGranule <= Int.MaxValue) Some(lastGranule.toInt) else None,
      durationMs = if (lastGranule > 0) Some(lastGranule * 1000L / rate) else None))
  }

  // ── MP4 / ISO BMFF ──────────────────────────────────────────────────

  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && tag(b, 4) == "ftyp"

  /** ISO base-media box walk: size-prefixed boxes (u32; 1 → u64
    * largesize; 0 → to end-of-file) to `moov`, then `mvhd`
    * (timescale + duration, version 0 u32 / version 1 u64 fields) and
    * the first `trak`/`tkhd` with nonzero dimensions (16.16 fixed
    * width/height). Presentation duration over the movie timescale
    * gives milliseconds; a box walk that derails keeps what it has. */
  private def parseMp4(b: Array[Byte]): Option[MediaMeta] = {
    var timescale = 0L
    var duration = -1L
    var width = 0
    var height = 0

    // walks [start, end) one level deep; visit returns payload bounds
    def walk(start: Long, end: Long, visit: (String, Long, Long) => Unit): Unit = {
      var i = start
      var n = 0
      while (i + 8 <= end && n < 4096) {
        val sz0 = be32(b, i.toInt)
        val typ = tag(b, i.toInt + 4)
        var payload = i + 8
        var boxEnd =
          if (sz0 == 1L) {
            if (i + 16 > end) return
            payload = i + 16
            val hi = be32(b, i.toInt + 8); val lo = be32(b, i.toInt + 12)
            i + ((hi << 32) | lo)
          } else if (sz0 == 0L) end
          else i + sz0
        if (boxEnd < payload || boxEnd > end) boxEnd = end
        visit(typ, payload, boxEnd)
        if (boxEnd <= i) return // no forward progress: corrupt size
        i = boxEnd
        n += 1
      }
    }

    walk(0L, b.length.toLong, { (typ, ps, pe) =>
      if (typ == "moov") {
        walk(ps, pe, { (t2, qs, qe) =>
          if (t2 == "mvhd" && qs + 4 <= qe) {
            val ver = u8(b, qs.toInt)
            if (ver == 0 && qs + 20 <= qe) {
              timescale = be32(b, qs.toInt + 12)
              duration = be32(b, qs.toInt + 16)
            } else if (ver == 1 && qs + 32 <= qe) {
              timescale = be32(b, qs.toInt + 20)
              duration = (be32(b, qs.toInt + 24) << 32) | be32(b, qs.toInt + 28)
            }
          } else if (t2 == "trak") {
            walk(qs, qe, { (t3, rs, re) =>
              if (t3 == "tkhd" && width == 0 && rs + 4 <= re) {
                val ver = u8(b, rs.toInt)
                val dimOff = if (ver == 1) rs + 88 else rs + 76
                if (dimOff + 8 <= re) {
                  val w = (be32(b, dimOff.toInt) >> 16).toInt
                  val h = (be32(b, dimOff.toInt + 4) >> 16).toInt
                  if (w > 0 && h > 0) { width = w; height = h }
                }
              }
            })
          }
        })
      }
    })

    if (timescale <= 0) return None
    Some(MediaMeta("mp4",
      width = if (width > 0) Some(width) else None,
      height = if (height > 0) Some(height) else None,
      durationMs = if (duration >= 0) Some(duration * 1000L / timescale) else None))
  }

  /** TIFF magic: `II*\0` (little-endian) or `MM\0*` (big-endian). */
  def isTiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  /** TIFF pixel decode — baseline TIFF 6.0 for the shapes archives
    * actually hold: 8-bit grayscale (photometric 0 or 1) and 8-bit
    * RGB, strips (any RowsPerStrip split), uncompressed or LZW
    * (compression 5 — MSB-first codes, the [[PdfCodec]] decoder; TIFF
    * always runs EarlyChange = 1) with the horizontal-differencing
    * predictor (317 = 2), BOTH byte orders (`II`/`MM`). Output is the
    * family's expanded row-major 8-bit RGB raster (photometric 0 —
    * WhiteIsZero — inverts, gray replicates). Returns None for tiles,
    * other bit depths/compressions, short strips, and rasters over
    * the 64 MiB cap — a funnel class, never a crash. */
  def tiffPixels(b: Array[Byte]): Option[PngRaster] = {
    if (!isTiff(b)) return None
    val le = b(0) == 'I'
    def r16(o: Int): Int =
      if (o + 2 > b.length) -1
      else if (le) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    def r32(o: Int): Long =
      if (o + 4 > b.length) -1L
      else if (le) (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
      else ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = r16(ifd.toInt)
    if (n <= 0 || n > 512) return None
    // tag → (type, count, entry offset of the value/offset field)
    val entries = scala.collection.mutable.Map[Int, (Int, Long, Int)]()
    var e = 0
    while (e < n) {
      val eo = ifd.toInt + 2 + e * 12
      if (eo + 12 > b.length) return None
      entries(r16(eo)) = (r16(eo + 2), r32(eo + 4), eo + 8)
      e += 1
    }
    def typeSize(t: Int): Int = t match {
      case 1 => 1; case 3 => 2; case 4 => 4; case _ => 0
    }
    def values(tag: Int): Option[Array[Long]] = entries.get(tag).flatMap {
      case (t, cnt, vo) =>
        val ts = typeSize(t)
        if (ts == 0 || cnt < 0 || cnt > 65536) return None
        val total = ts * cnt
        val base = if (total <= 4) vo.toLong else r32(vo)
        if (base < 0 || base + total > b.length) return None
        val out = new Array[Long](cnt.toInt)
        var i = 0
        while (i < cnt) {
          out(i) = ts match {
            case 1 => (b(base.toInt + i) & 0xFF).toLong
            case 2 => r16(base.toInt + i * 2).toLong
            case _ => r32(base.toInt + i * 4)
          }
          i += 1
        }
        Some(out)
    }
    def first(tag: Int, default: Long = -1L): Long =
      values(tag).flatMap(_.headOption).getOrElse(default)

    val w = first(256).toInt
    val h = first(257).toInt
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > (64L << 20)) return None
    val spp = first(277, 1L).toInt
    if (spp != 1 && spp != 3) return None
    val bpsOk = values(258) match {
      case Some(a) => a.length == spp && a.forall(_ == 8L)
      case None => false // bps defaults to 1-bit: out of scope
    }
    if (!bpsOk) return None
    val comp = first(259, 1L).toInt
    if (comp != 1 && comp != 5) return None
    val photo = first(262).toInt
    if (!(photo == 0 || photo == 1 || photo == 2)) return None
    if ((photo == 2) != (spp == 3)) return None
    val pred = first(317, 1L).toInt
    if (pred != 1 && pred != 2) return None
    if (entries.contains(322)) return None // tiled: out of scope
    val rps0 = first(278, h.toLong)
    val rps = if (rps0 <= 0 || rps0 > h) h else rps0.toInt
    val offsets = values(273).getOrElse(return None)
    val counts = values(279).getOrElse(return None)
    val nStrips = (h + rps - 1) / rps
    if (offsets.length != nStrips || counts.length != nStrips) return None

    val rowSize = w * spp
    val raster = new Array[Byte](rowSize * h)
    var strip = 0
    while (strip < nStrips) {
      val rows = math.min(rps, h - strip * rps)
      val need = rows * rowSize
      val so = offsets(strip)
      val sc = counts(strip)
      if (so < 0 || sc < 0 || so + sc > b.length) return None
      val raw = java.util.Arrays.copyOfRange(b, so.toInt, (so + sc).toInt)
      val data =
        if (comp == 1) raw
        else PdfCodec.lzwMsb(raw, 1, need + rowSize).getOrElse(return None)
      if (data.length < need) return None
      if (pred == 2) {
        var y = 0
        while (y < rows) {
          var x = 1
          while (x < w) {
            var s = 0
            while (s < spp) {
              val o = y * rowSize + x * spp + s
              data(o) = (data(o) + data(o - spp)).toByte
              s += 1
            }
            x += 1
          }
          y += 1
        }
      }
      System.arraycopy(data, 0, raster, strip * rps * rowSize, need)
      strip += 1
    }

    val out = new Array[Byte](w * h * 3)
    var i = 0
    val np = w * h
    while (i < np) {
      if (spp == 3) {
        out(i * 3) = raster(i * 3)
        out(i * 3 + 1) = raster(i * 3 + 1)
        out(i * 3 + 2) = raster(i * 3 + 2)
      } else {
        val v0 = raster(i) & 0xFF
        val v = if (photo == 0) 255 - v0 else v0
        out(i * 3) = v.toByte; out(i * 3 + 1) = v.toByte; out(i * 3 + 2) = v.toByte
      }
      i += 1
    }
    Some(PngRaster(w, h, out))
  }

  /** BMP magic: 'BM' + a plausible DIB header size. */
  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  /** BMP pixel decode — the uncompressed-raster face of the decoder
    * family (BI_RGB only; RLE and bitfields reject): 24-bit BGR,
    * 32-bit BGRA (alpha parsed-then-dropped) and 8-bit palette, each
    * bottom-up (positive height, the Windows default) or top-down
    * (negative height). Any BITMAPINFOHEADER-or-later DIB size (40,
    * 108, 124 — V4/V5 headers extend, never relocate, the core
    * fields) is accepted; rows are 4-byte padded per the format. The
    * output is the same expanded row-major 8-bit RGB raster every
    * other decoder emits ([[PngRaster]]), so downstream raster
    * operators see one shape. Returns None for truncated pixel data,
    * palette indexes past the table, and rasters over the 64 MiB
    * allocation cap (hostile headers must not allocate unbounded). */
  def bmpPixels(b: Array[Byte]): Option[PngRaster] = {
    if (!isBmp(b) || b.length < 54) return None
    val dataOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER: not supported
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h <= 0 || planes != 1 || compression != 0) return None
    if (!(bpp == 8 || bpp == 24 || bpp == 32)) return None
    if (w.toLong * h * 3 > (64L << 20)) return None
    val clrUsed = le32(b, 46).toInt
    val nPal = if (bpp == 8) (if (clrUsed > 0) clrUsed else 256) else 0
    if (nPal > 256) return None
    val palOff = 14 + dibSize.toInt
    if (bpp == 8 && palOff + nPal * 4 > b.length) return None
    val rowBytes = ((w * bpp / 8) + 3) & ~3
    if (dataOff < 0 || dataOff + rowBytes.toLong * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val ro = dataOff.toInt + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        bpp match {
          case 24 =>
            out(o) = b(ro + x * 3 + 2) // R (stored BGR)
            out(o + 1) = b(ro + x * 3 + 1)
            out(o + 2) = b(ro + x * 3)
          case 32 =>
            out(o) = b(ro + x * 4 + 2)
            out(o + 1) = b(ro + x * 4 + 1)
            out(o + 2) = b(ro + x * 4)
          case _ =>
            val idx = b(ro + x) & 0xff
            if (idx >= nPal) return None
            val po = palOff + idx * 4 // stored BGRA quads
            out(o) = b(po + 2)
            out(o + 1) = b(po + 1)
            out(o + 2) = b(po)
        }
        x += 1
      }
      y += 1
    }
    Some(PngRaster(w, h, out))
  }
}
