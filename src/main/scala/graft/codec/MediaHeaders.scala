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
    else None

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

  /** FULL pixel decode for 8-bit truecolor non-interlaced PNGs — zlib
    * inflate (java.util.zip, in every JVM) plus the five scanline
    * filters inverted per the spec; no codec library involved. Returns
    * None for any other PNG flavor (palette, alpha, 16-bit, interlaced
    * — a real codec's job), for truncated/corrupt zlib streams, for a
    * stream that inflates to the wrong length, and for rasters over
    * 64 MiB (a hostile IHDR must not allocate unbounded memory). */
  def pngPixels(b: Array[Byte]): Option[PngRaster] = {
    if (!isPng(b) || b.length < 33 || tag(b, 12) != "IHDR") return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0) return None
    // 8-bit truecolor (color 2), deflate, adaptive filters, no interlace
    if (u8(b, 24) != 8 || u8(b, 25) != 2 || u8(b, 26) != 0 ||
      u8(b, 27) != 0 || u8(b, 28) != 0) return None
    val stride = w * 3
    val rawLen = h * (stride + 1)
    if (rawLen > (64L << 20)) return None
    // concatenate IDAT chunk data (the zlib stream may span chunks)
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      val typ = tag(b, i + 4)
      if (typ == "IEND") done = true
      else if (typ == "IDAT" && len > 0 && i + 8 + len <= b.length)
        idat.write(b, i + 8, len.toInt)
      i = math.min(i.toLong + 12L + math.max(0L, len), b.length.toLong).toInt
    }
    if (idat.size() == 0) return None
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
    // invert the per-row filter (spec 9.2); all arithmetic mod 256
    val out = new Array[Byte]((h * stride).toInt)
    val bpp = 3
    var y = 0
    while (y < h) {
      val ft = raw(y.toInt * (stride.toInt + 1)) & 0xff
      if (ft > 4) return None
      val ri = y.toInt * (stride.toInt + 1) + 1
      val oi = y.toInt * stride.toInt
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) out(oi + x - bpp) & 0xff else 0
        val up = if (y > 0) out(oi - stride.toInt + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(oi - stride.toInt + x - bpp) & 0xff else 0
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
        out(oi + x) = (((raw(ri + x) & 0xff) + pred) & 0xff).toByte
        x += 1
      }
      y += 1
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
    * codec's compositing job). Returns None for interlaced or
    * local-color-table frames, malformed streams, or out-of-range
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
          if ((ifl & 0x40) != 0) return None // interlaced
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
          frames += (lzwDecode(data.toByteArray, mcs, iw * ih) match {
            case Some(px) => px
            case None => return None
          })
        case _ => return None
      }
    }
    if (frames.isEmpty) None else Some(GifRaster(w, h, frames.toSeq))
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
}
