package graft.codec

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Deterministic REAL media-container fixtures: given a seed, emit a
  * genuine PNG / JPEG / GIF / WAV blob whose header fields are pure
  * arithmetic on the seed — so an independent engine (the DuckDB oracle)
  * can compute the expected [[MediaHeaders]] parse of each blob without
  * parsing anything. This closes the loop the deterministic stub cannot:
  * build real container bytes on one side, parse them with the real
  * header parsers on the other, compare field-for-field.
  *
  * Blobs are header-accurate (correct magic, structure, sizes, PNG CRCs),
  * with minimal payloads — a pixel decoder would reject the image data,
  * but no header parser reads that far, and keeping payloads tiny lets a
  * 500-row corpus carry half a million synthetic containers cheaply.
  *
  * The seed → field map (mirrored by the `mm_real_decode` oracle SQL):
  *   format = seed % 4 → png | jpeg | gif | wav
  *   images: width = 1 + seed % 640, height = 1 + seed % 480
  *   gif:    n_frames = 1 + seed % 3
  *   wav:    channels = 1 + seed % 2, sample_rate = 8000 * (1 + seed % 5),
  *           n_frames (sample frames) = 1 + seed % 50
  */
object MediaFixtures {

  def build(seed: Long): Array[Byte] = {
    val s = math.floorMod(seed, 4L).toInt
    val w = (1L + math.floorMod(seed, 640L)).toInt
    val h = (1L + math.floorMod(seed, 480L)).toInt
    s match {
      case 0 => png(w, h)
      case 1 => jpeg(w, h)
      case 2 => gif(w, h, nFrames = (1L + math.floorMod(seed, 3L)).toInt)
      case _ => wav(
        channels = (1L + math.floorMod(seed, 2L)).toInt,
        sampleRate = 8000 * (1L + math.floorMod(seed, 5L)).toInt,
        frames = (1L + math.floorMod(seed, 50L)).toInt,
        sample = (i, c) => pcmSample(seed, i, c))
    }
  }

  /** Deterministic 16-bit PCM sample for frame `i`, channel `c` of the
    * seed-`s` WAV fixture — pure arithmetic, so the resample oracle can
    * recompute the decoded stream in SQL without touching bytes:
    * ((s·31 + i·7 + c·13 + 11) mod 65536) − 32768. */
  def pcmSample(seed: Long, frame: Int, channel: Int): Int =
    math.floorMod(seed * 31L + frame * 7L + channel * 13L + 11L, 65536L).toInt - 32768

  // ── PNG: sig + IHDR + (token) IDAT + IEND, real CRCs ────────────────

  def png(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0) // 8-bit truecolor
    chunk(out, "IHDR", ihdr)
    // token zlib stream (one empty stored block) — header parsers stop
    // before IDAT; a pixel decoder would reject it, by design
    chunk(out, "IDAT", Array[Byte](0x78, 0x9c.toByte, 0x03, 0x00, 0x00, 0x00, 0x00, 0x01))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Deterministic 8-bit sample for pixel (x, y) channel `c` of the
    * seed-`s` raster fixtures — pure arithmetic, so the pixel-decode
    * oracles recompute decoded rasters in SQL without touching bytes:
    * (s·31 + x·7 + y·13 + c·11 + 5) mod 256. */
  def pixel(seed: Long, x: Int, y: Int, c: Int): Int =
    math.floorMod(seed * 31L + x * 7L + y * 13L + c * 11L + 5L, 256L).toInt

  /** Fully REAL PNG: 8-bit truecolor with `pix(x, y, c)` pixel data,
    * per-row filter types from `filterOf(y)` (all five PNG filters are
    * genuinely applied — the encoder computes the residuals the decoder
    * must invert), scanlines zlib-deflated with java.util.zip.Deflater.
    * Unlike the header-only [[png]], this blob decodes end-to-end
    * ([[MediaHeaders.pngPixels]]); the compressed BYTES are not part of
    * any oracle contract (only the decoded pixels are), so Deflater's
    * exact output encoding is free to vary. */
  def pngReal(w: Int, h: Int, pix: (Int, Int, Int) => Int,
              filterOf: Int => Int = _ => 0,
              interlaced: Boolean = false): Array[Byte] =
    pngEncode(w, h, bpp = 3, colorType = 2, plte = null,
      (x, y, c) => pix(x, y, c), filterOf, interlaced)

  /** Fully REAL 8-bit GRAYSCALE PNG (color type 0): same genuine
    * deflate + filter machinery, one sample per pixel. */
  def pngRealGray(w: Int, h: Int, pix: (Int, Int) => Int,
                  filterOf: Int => Int = _ => 0): Array[Byte] =
    pngEncode(w, h, bpp = 1, colorType = 0, plte = null,
      (x, y, _) => pix(x, y), filterOf)

  /** Fully REAL 8-bit PALETTE PNG (color type 3): a genuine PLTE chunk
    * (`palette` = 3·n RGB bytes) and index samples `idx(x, y)` through
    * the same deflate + filter machinery. */
  def pngRealIndexed(w: Int, h: Int, palette: Array[Byte], idx: (Int, Int) => Int,
                     filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(palette.length > 0 && palette.length % 3 == 0 && palette.length <= 768,
      s"bad palette: ${palette.length} bytes")
    pngEncode(w, h, bpp = 1, colorType = 3, plte = palette,
      (x, y, _) => { val v = idx(x, y); require(v * 3 < palette.length); v },
      filterOf)
  }

  private def pngEncode(w: Int, h: Int, bpp: Int, colorType: Int,
                        plte: Array[Byte], pix: (Int, Int, Int) => Int,
                        filterOf: Int => Int,
                        interlaced: Boolean = false): Array[Byte] =
    pngEncodeEx(w, h, colorType, depth = 8, plte, pix, filterOf, interlaced)

  /** Fully REAL PNG over the COMPLETE legal IHDR matrix: any color
    * type (0 gray / 2 truecolor / 3 palette / 4 gray+alpha / 6 RGBA)
    * at any legal depth (1/2/4/8/16 where the spec allows), sequential
    * or Adam7-interlaced. `sample(x, y, ch)` returns the raw sample
    * value at the declared depth (0..2^depth-1); sub-byte samples pack
    * MSB-first, 16-bit samples write big-endian, and each Adam7 pass
    * filters independently in transmission order. */
  def pngRealEx(w: Int, h: Int, colorType: Int, depth: Int, plte: Array[Byte],
                sample: (Int, Int, Int) => Int,
                filterOf: Int => Int = _ => 0,
                interlaced: Boolean = false): Array[Byte] =
    pngEncodeEx(w, h, colorType, depth, plte, sample, filterOf, interlaced)

  private def pngEncodeEx(w: Int, h: Int, colorType: Int, depth: Int,
                          plte: Array[Byte], sample: (Int, Int, Int) => Int,
                          filterOf: Int => Int,
                          interlaced: Boolean): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dims: ${w}x$h")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => throw new IllegalArgumentException(s"bad color type $colorType")
    }
    val depthOk = colorType match {
      case 0 => Seq(1, 2, 4, 8, 16).contains(depth)
      case 3 => Seq(1, 2, 4, 8).contains(depth)
      case _ => depth == 8 || depth == 16
    }
    require(depthOk, s"illegal depth $depth for color type $colorType")
    require((colorType == 3) == (plte != null), "PLTE iff palette color type")
    val bitsPerPx = channels * depth
    val fbpp = math.max(1, bitsPerPx / 8)
    def scanBytes(pw: Int): Int = (pw * bitsPerPx + 7) / 8
    val passes =
      if (interlaced) MediaHeaders.Adam7.filter { case (x0, y0, _, _) => w > x0 && h > y0 }
        .map { case (x0, y0, dx, dy) =>
          (x0, y0, dx, dy, (w - x0 + dx - 1) / dx, (h - y0 + dy - 1) / dy)
        }
      else Seq((0, 0, 1, 1, w, h))
    val raw = new Array[Byte](passes.map { case (_, _, _, _, pw, ph) => ph * (1 + scanBytes(pw)) }.sum)
    var o = 0
    var tRow = 0 // transmitted-scanline index, drives the filter cycle
    for ((x0, y0, dx, dy, pw, ph) <- passes) {
      val sb = scanBytes(pw)
      val prior = new Array[Int](sb)
      val cur = new Array[Int](sb)
      var j = 0
      while (j < ph) {
        java.util.Arrays.fill(cur, 0)
        var i = 0
        while (i < pw) {
          val sx = x0 + i * dx; val sy = y0 + j * dy
          if (depth == 8) {
            var ch = 0
            while (ch < channels) {
              cur(i * channels + ch) = sample(sx, sy, ch) & 0xff
              ch += 1
            }
          } else if (depth == 16) {
            var ch = 0
            while (ch < channels) {
              val v = sample(sx, sy, ch) & 0xffff
              cur((i * channels + ch) * 2) = v >> 8
              cur((i * channels + ch) * 2 + 1) = v & 0xff
              ch += 1
            }
          } else {
            val v = sample(sx, sy, 0) & ((1 << depth) - 1)
            val bitPos = i * depth
            cur(bitPos >> 3) |= v << (8 - depth - (bitPos & 7))
          }
          i += 1
        }
        val ft = filterOf(tRow)
        require(ft >= 0 && ft <= 4, s"bad filter $ft")
        raw(o) = ft.toByte; o += 1
        i = 0
        while (i < sb) {
          val a = if (i >= fbpp) cur(i - fbpp) else 0
          val b = if (j > 0) prior(i) else 0
          val cc = if (i >= fbpp && j > 0) prior(i - fbpp) else 0
          val pred = ft match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case _ => // Paeth
              val p = a + b - cc
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - cc)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
          }
          raw(o) = ((cur(i) - pred) & 0xff).toByte; o += 1
          i += 1
        }
        System.arraycopy(cur, 0, prior, 0, sb)
        tRow += 1
        j += 1
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    chunk(out, "IHDR", be32(w) ++ be32(h) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0, if (interlaced) 1 else 0))
    if (plte != null) chunk(out, "PLTE", plte)
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    out.write(be32(data.length), 0, 4)
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    out.write(be32(crc.getValue.toInt), 0, 4)
  }

  // ── JPEG: SOI + APP0(JFIF) + SOF0 + EOI ─────────────────────────────

  def jpeg(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte), 0, 2)
    // APP0 JFIF v1.1, no thumbnail
    val app0 = "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    marker(out, 0xe0, app0)
    // SOF0: 8-bit precision, h, w, 3 components (YCbCr, standard sampling)
    val sof = Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    marker(out, 0xc0, sof)
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte), 0, 2)
    out.toByteArray
  }

  private def marker(out: ByteArrayOutputStream, m: Int, payload: Array[Byte]): Unit = {
    out.write(Array[Byte](0xff.toByte, m.toByte), 0, 2)
    out.write(be16(payload.length + 2), 0, 2)
    out.write(payload, 0, payload.length)
  }

  /** MSB-first bit packer with JPEG 0xFF → 0xFF00 byte stuffing; the
    * shared entropy-data sink of the baseline and progressive
    * encoders. `flushPad` pads the tail byte with 1-bits (T.81 F.1.2.3). */
  private final class JpegBitSink(out: ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      require(len >= 1 && len <= 24)
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val byte = ((acc >> (nbits - 8)) & 0xff).toInt
        out.write(byte)
        if (byte == 0xff) out.write(0x00)
        nbits -= 8
      }
    }
    def flushPad(): Unit = if (nbits > 0) {
      val byte = (((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt
      out.write(byte)
      if (byte == 0xff) out.write(0x00)
      nbits = 0; acc = 0L
    }
  }

  private def jpegCategory(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Magnitude bits per T.81 F.1.2.1: positives as-is, negatives in
    * cat-bit one's complement. */
  private def putJpegMagnitude(bits: JpegBitSink, v: Int, cat: Int): Unit =
    if (cat > 0) bits.putBits(if (v < 0) v + (1 << cat) - 1 else v, cat)

  /** Flat canonical AC symbols of the baseline encoder: EOB, ZRL and
    * every (run 0–15, size 1–10) at 8 bits. */
  private val JpegAcSymsBase: Array[Int] =
    Array(0x00, 0xf0) ++ (for (r <- 0 until 16; s <- 1 to 10) yield (r << 4) | s)

  /** The progressive encoder additionally needs the EOBn run-length
    * symbols (r 1–14, size 0) for its end-of-band runs. */
  private val JpegAcSymsProg: Array[Int] = JpegAcSymsBase ++ (1 to 14).map(_ << 4)

  /** Emit the generated flat canonical DHT pair (DC categories 0–11 at
    * 4 bits, the given AC symbol list at 8 bits) and return the AC
    * symbol → code-index map (canonical code = list index). */
  private def emitJpegHuffTables(out: ByteArrayOutputStream,
                                 acSyms: Array[Int]): Map[Int, Int] = {
    val dcBits = Array.tabulate(16)(l => if (l == 3) 12 else 0)
    val acBits = Array.tabulate(16)(l => if (l == 7) acSyms.length else 0)
    marker(out, 0xc4, (0x00.toByte +: (dcBits.map(_.toByte) ++ (0 to 11).map(_.toByte))).toArray)
    marker(out, 0xc4, (0x10.toByte +: (acBits.map(_.toByte) ++ acSyms.map(_.toByte))).toArray)
    acSyms.zipWithIndex.toMap
  }

  /** Splice a REAL EXIF APP1 segment (TIFF header + one-entry IFD0
    * carrying orientation tag 0x0112, either byte order) into a JPEG
    * right after SOI — what a camera writes, built byte-for-byte so
    * [[MediaHeaders.exifOrientation]]'s IFD walk is exercised against
    * genuine TIFF structure in both endiannesses. */
  def jpegWithExif(jpeg: Array[Byte], orientation: Int,
                   littleEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"bad orientation: $orientation")
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG")
    def w16(v: Int): Array[Byte] =
      if (littleEndian) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def w32(v: Long): Array[Byte] =
      if (littleEndian) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tiff =
      (if (littleEndian) "II".getBytes("US-ASCII") else "MM".getBytes("US-ASCII")) ++
        w16(42) ++ w32(8L) ++ // IFD0 at offset 8
        w16(1) ++ // one entry
        w16(0x0112) ++ w16(3) ++ w32(1L) ++ (w16(orientation) ++ Array[Byte](0, 0)) ++
        w32(0L) // no next IFD
    val seg = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = seg.length + 2
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ seg
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** Fully REAL baseline JPEG: a complete DQT/SOF0/DHT/SOS stream whose
    * entropy data is genuinely Huffman-coded — decodable by ANY baseline
    * decoder (including the JDK's own `javax.imageio`, which the spec
    * uses as the independent reference, and
    * [[MediaHeaders.jpegPixels]]).
    *
    * Inputs are the QUANTIZED DCT coefficient blocks directly
    * (`coefOf(comp, bx, by)` → 64 values in zigzag order, |DC| ≤ 2047,
    * |AC| ≤ 1023) with one zigzag-order quant table per component —
    * choosing coefficients in the frequency domain is what keeps the
    * decode EXACT arithmetic on the seed: encode is then lossless, and
    * a DC-only block decodes to precisely
    * `clamp(((dc·q + 4) >> 3) + 128)`, the closed form the DuckDB
    * oracles replay. Components: 1 (grayscale) or 3 (YCbCr 4:4:4).
    *
    * Huffman tables are GENERATED flat canonical tables (all 12 DC
    * categories at 4 bits; EOB, ZRL and every (run 0–15, size 1–10)
    * symbol at 8 bits) — spec-legal, driven through the general
    * table-building machinery on both sides, and free of any table
    * literals. `restartEvery` > 0 inserts DRI/RSTn markers.
    * `sampling` sets per-component (H, V) factors (default all 1×1);
    * e.g. `Seq((2,2),(1,1),(1,1))` emits genuine 4:2:0 with the
    * four-luma-then-chroma MCU interleave, `coefOf`'s (bx, by) always
    * indexing the COMPONENT's own block grid. */
  def jpegReal(w: Int, h: Int, qtables: Seq[Array[Int]],
               coefOf: (Int, Int, Int) => Array[Int],
               restartEvery: Int = 0,
               sampling: Seq[(Int, Int)] = Nil): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dims: ${w}x$h")
    require(qtables.nonEmpty && qtables.length <= 3 && qtables.length != 2,
      s"1 or 3 components, got ${qtables.length}")
    qtables.foreach(q => require(q.length == 64 && q.forall(v => v >= 1 && v <= 255),
      "quant entries must be 1..255"))
    val nc = qtables.length
    val samp = if (sampling.isEmpty) Seq.fill(nc)((1, 1)) else sampling
    require(samp.length == nc, s"sampling must have $nc entries")
    samp.foreach { case (sx, sy) =>
      require(sx >= 1 && sx <= 2 && sy >= 1 && sy <= 2, s"sampling 1..2 only: ($sx,$sy)")
    }
    require(samp.forall(s => s._1 <= samp.head._1 && s._2 <= samp.head._2),
      "component 0 must carry the max sampling factors")
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte), 0, 2) // SOI
    qtables.zipWithIndex.foreach { case (q, tq) =>
      marker(out, 0xdb, (tq.toByte +: q.map(_.toByte)).toArray)
    }
    if (restartEvery > 0) marker(out, 0xdd, be16(restartEvery))
    val sof = Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](nc.toByte) ++
      (0 until nc).flatMap(ci => Seq((ci + 1).toByte,
        ((samp(ci)._1 << 4) | samp(ci)._2).toByte, ci.toByte))
    marker(out, 0xc0, sof)
    val acIndex = emitJpegHuffTables(out, JpegAcSymsBase)
    val sos = Array[Byte](nc.toByte) ++
      (0 until nc).flatMap(ci => Seq((ci + 1).toByte, 0x00.toByte)) ++
      Array[Byte](0, 63, 0)
    marker(out, 0xda, sos)
    val bits = new JpegBitSink(out)
    def putBits(code: Int, len: Int): Unit = bits.putBits(code, len)
    def flushPad(): Unit = bits.flushPad()
    def category(v: Int): Int = jpegCategory(v)
    def putMagnitude(v: Int, cat: Int): Unit = putJpegMagnitude(bits, v, cat)
    // single-component scans are non-interleaved (MCU = 1 block, ratio 1)
    val hMax = if (nc == 1) 1 else samp.head._1
    val vMax = if (nc == 1) 1 else samp.head._2
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val pred = new Array[Int](nc)
    def encodeBlock(ci: Int, bx: Int, by: Int): Unit = {
      val zz = coefOf(ci, bx, by)
      require(zz.length == 64, s"coef block must be 64, got ${zz.length}")
      val diff = zz(0) - pred(ci)
      pred(ci) = zz(0)
      require(math.abs(diff) <= 2047, s"DC diff out of range: $diff")
      val dcCat = category(diff)
      putBits(dcCat, 4)
      putMagnitude(diff, dcCat)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = zz(k)
        if (v == 0) run += 1
        else {
          while (run >= 16) { putBits(acIndex(0xf0), 8); run -= 16 }
          val s = category(v)
          require(s >= 1 && s <= 10, s"AC coefficient out of range: $v")
          putBits(acIndex((run << 4) | s), 8)
          putMagnitude(v, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) putBits(acIndex(0x00), 8) // EOB
    }
    var rstIdx = 0
    var mcu = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
        flushPad()
        out.write(Array[Byte](0xff.toByte, (0xd0 | rstIdx).toByte), 0, 2)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mcuX = mcu % mcusX
      val mcuY = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val (csh, csv) = if (nc == 1) (1, 1) else samp(ci)
        var byi = 0
        while (byi < csv) {
          var bxi = 0
          while (bxi < csh) {
            encodeBlock(ci, mcuX * csh + bxi, mcuY * csv + byi)
            bxi += 1
          }
          byi += 1
        }
        ci += 1
      }
      mcu += 1
    }
    flushPad()
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte), 0, 2) // EOI
    out.toByteArray
  }

  /** Fully REAL progressive JPEG (SOF2, T.81 Annex G) over the same
    * quantized-coefficient interface as [[jpegReal]] — decodable by any
    * progressive decoder (the spec pins it against `javax.imageio` and
    * against the baseline twin, which must decode byte-identically
    * since both paths reconstruct the same coefficients exactly).
    *
    * Scan script: one DC first scan (interleaved when 3 components) at
    * successive-approximation bit `dcAl`, then DC refinement scans down
    * to bit 0; per component, one AC first scan per spectral band at
    * bit `acAl`, then AC refinement scans down to bit 0. AC scans are
    * non-interleaved (T.81 mandates single-component AC scans) and use
    * genuine EOB runs; refinement scans use the G.1.2.3 correction-bit
    * buffering. `bands` must be ascending, disjoint, within 1..63 —
    * bands never listed are simply never transmitted (their
    * coefficients decode as zero), which is itself spec-legal.
    * `coefOf` must be pure: each scan re-reads the blocks. */
  def jpegProgressive(w: Int, h: Int, qtables: Seq[Array[Int]],
                      coefOf: (Int, Int, Int) => Array[Int],
                      restartEvery: Int = 0,
                      sampling: Seq[(Int, Int)] = Nil,
                      dcAl: Int = 1, acAl: Int = 1,
                      bands: Seq[(Int, Int)] = Seq((1, 5), (6, 63))): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dims: ${w}x$h")
    require(qtables.nonEmpty && qtables.length <= 3 && qtables.length != 2,
      s"1 or 3 components, got ${qtables.length}")
    qtables.foreach(q => require(q.length == 64 && q.forall(v => v >= 1 && v <= 255),
      "quant entries must be 1..255"))
    require(dcAl >= 0 && dcAl <= 10 && acAl >= 0 && acAl <= 10, "Al out of range")
    bands.foldLeft(0) { case (prev, (ss, se)) =>
      require(ss > prev && ss >= 1 && se >= ss && se <= 63, s"bad band ($ss,$se)")
      se
    }
    val nc = qtables.length
    val samp = if (sampling.isEmpty) Seq.fill(nc)((1, 1)) else sampling
    require(samp.length == nc, s"sampling must have $nc entries")
    samp.foreach { case (sx, sy) =>
      require(sx >= 1 && sx <= 2 && sy >= 1 && sy <= 2, s"sampling 1..2 only: ($sx,$sy)")
    }
    require(samp.forall(s => s._1 <= samp.head._1 && s._2 <= samp.head._2),
      "component 0 must carry the max sampling factors")
    val hMax = if (nc == 1) 1 else samp.head._1
    val vMax = if (nc == 1) 1 else samp.head._2
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    def shOf(ci: Int) = if (nc == 1) 1 else samp(ci)._1
    def svOf(ci: Int) = if (nc == 1) 1 else samp(ci)._2
    // cache every block once: the padded MCU grid (DC scans cover it;
    // AC scans address the non-interleaved sub-grid)
    val wb = Array.tabulate(nc)(ci => mcusX * shOf(ci))
    val hb = Array.tabulate(nc)(ci => mcusY * svOf(ci))
    val wbNI = Array.tabulate(nc)(ci => ((w * shOf(ci) + hMax - 1) / hMax + 7) / 8)
    val hbNI = Array.tabulate(nc)(ci => ((h * svOf(ci) + vMax - 1) / vMax + 7) / 8)
    val blocks = Array.tabulate(nc) { ci =>
      Array.tabulate(hb(ci) * wb(ci)) { i =>
        val zz = coefOf(ci, i % wb(ci), i / wb(ci))
        require(zz.length == 64, s"coef block must be 64, got ${zz.length}")
        require(math.abs(zz(0)) <= 2047, s"DC out of range: ${zz(0)}")
        zz.iterator.drop(1).foreach(v =>
          require(math.abs(v) <= 1023, s"AC coefficient out of range: $v"))
        zz
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte), 0, 2) // SOI
    qtables.zipWithIndex.foreach { case (q, tq) =>
      marker(out, 0xdb, (tq.toByte +: q.map(_.toByte)).toArray)
    }
    if (restartEvery > 0) marker(out, 0xdd, be16(restartEvery))
    val sof = Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](nc.toByte) ++
      (0 until nc).flatMap(ci => Seq((ci + 1).toByte,
        ((samp(ci)._1 << 4) | samp(ci)._2).toByte, ci.toByte))
    marker(out, 0xc2, sof)
    val acIndex = emitJpegHuffTables(out, JpegAcSymsProg)
    def sosHeader(cis: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit =
      marker(out, 0xda, Array[Byte](cis.length.toByte) ++
        cis.flatMap(ci => Seq((ci + 1).toByte, 0x00.toByte)) ++
        Array[Byte](ss.toByte, se.toByte, ((ah << 4) | al).toByte))
    // ── DC scans: one MCU-interleaved pass per approximation bit ──
    def dcScan(al: Int, first: Boolean): Unit = {
      sosHeader(0 until nc, 0, 0, if (first) 0 else al + 1, al)
      val bits = new JpegBitSink(out)
      val pred = new Array[Int](nc)
      var rstIdx = 0
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          bits.flushPad()
          out.write(Array[Byte](0xff.toByte, (0xd0 | rstIdx).toByte), 0, 2)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        val mcuX = mcu % mcusX
        val mcuY = mcu / mcusX
        var ci = 0
        while (ci < nc) {
          var byi = 0
          while (byi < svOf(ci)) {
            var bxi = 0
            while (bxi < shOf(ci)) {
              val dc = blocks(ci)((mcuY * svOf(ci) + byi) * wb(ci) +
                mcuX * shOf(ci) + bxi)(0)
              if (first) {
                // the DC point transform is an ARITHMETIC shift (G.1.2.1)
                val pt = dc >> al
                val diff = pt - pred(ci)
                pred(ci) = pt
                val cat = jpegCategory(diff)
                require(cat <= 11, s"DC diff out of table range: $diff")
                bits.putBits(cat, 4)
                putJpegMagnitude(bits, diff, cat)
              } else bits.putBits((dc >> al) & 1, 1) // refinement: raw bit
              bxi += 1
            }
            byi += 1
          }
          ci += 1
        }
        mcu += 1
      }
      bits.flushPad()
    }
    dcScan(dcAl, first = true)
    var al = dcAl - 1
    while (al >= 0) { dcScan(al, first = false); al -= 1 }
    // ── AC scans: non-interleaved, per component per band ──
    def acFirstScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sosHeader(Seq(ci), ss, se, 0, al)
      val bits = new JpegBitSink(out)
      var eobrun = 0
      def emitEobrun(): Unit = if (eobrun > 0) {
        val nb = 31 - Integer.numberOfLeadingZeros(eobrun)
        bits.putBits(acIndex(nb << 4), 8)
        if (nb > 0) bits.putBits(eobrun & ((1 << nb) - 1), nb)
        eobrun = 0
      }
      var rstIdx = 0
      val cols = wbNI(ci); val total = cols * hbNI(ci)
      var u = 0
      while (u < total) {
        if (restartEvery > 0 && u > 0 && u % restartEvery == 0) {
          emitEobrun(); bits.flushPad()
          out.write(Array[Byte](0xff.toByte, (0xd0 | rstIdx).toByte), 0, 2)
          rstIdx = (rstIdx + 1) % 8
        }
        val zz = blocks(ci)((u / cols) * wb(ci) + u % cols)
        var r = 0
        var k = ss
        while (k <= se) {
          val v = zz(k)
          val mag = math.abs(v) >> al // AC point transform: magnitude shift
          if (mag == 0) r += 1
          else {
            emitEobrun()
            while (r > 15) { bits.putBits(acIndex(0xf0), 8); r -= 16 }
            val s = jpegCategory(mag)
            bits.putBits(acIndex((r << 4) | s), 8)
            putJpegMagnitude(bits, if (v < 0) -mag else mag, s)
            r = 0
          }
          k += 1
        }
        if (r > 0) {
          eobrun += 1
          if (eobrun == 0x7fff) emitEobrun()
        }
        u += 1
      }
      emitEobrun()
      bits.flushPad()
    }
    // the G.1.2.3 encoder: correction bits buffer behind the symbol (or
    // EOBn) they belong to; `prevBits` rides the pending EOB run,
    // `curBits` the current block's crossed-nonzero history
    def acRefineScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sosHeader(Seq(ci), ss, se, al + 1, al)
      val bits = new JpegBitSink(out)
      var eobrun = 0
      val prevBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      val curBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      def emitEobrun(): Unit = if (eobrun > 0) {
        val nb = 31 - Integer.numberOfLeadingZeros(eobrun)
        bits.putBits(acIndex(nb << 4), 8)
        if (nb > 0) bits.putBits(eobrun & ((1 << nb) - 1), nb)
        prevBits.foreach(bit => bits.putBits(bit, 1))
        prevBits.clear()
        eobrun = 0
      }
      def emitCur(): Unit = { curBits.foreach(bit => bits.putBits(bit, 1)); curBits.clear() }
      var rstIdx = 0
      val cols = wbNI(ci); val total = cols * hbNI(ci)
      var u = 0
      while (u < total) {
        if (restartEvery > 0 && u > 0 && u % restartEvery == 0) {
          emitEobrun(); bits.flushPad()
          out.write(Array[Byte](0xff.toByte, (0xd0 | rstIdx).toByte), 0, 2)
          rstIdx = (rstIdx + 1) % 8
        }
        val zz = blocks(ci)((u / cols) * wb(ci) + u % cols)
        // index of the last newly-significant coefficient: ZRLs beyond
        // it fold into the EOB run instead
        var eobPos = ss - 1
        var k = ss
        while (k <= se) {
          if ((math.abs(zz(k)) >> al) == 1) eobPos = k
          k += 1
        }
        var r = 0
        k = ss
        while (k <= se) {
          val mag = math.abs(zz(k)) >> al
          if (mag == 0) r += 1
          else {
            while (r > 15 && k <= eobPos) {
              emitEobrun()
              bits.putBits(acIndex(0xf0), 8)
              r -= 16
              emitCur()
            }
            if (mag > 1) curBits += (mag & 1) // already significant: one bit
            else {
              emitEobrun()
              bits.putBits(acIndex((r << 4) | 1), 8)
              bits.putBits(if (zz(k) >= 0) 1 else 0, 1)
              emitCur()
              r = 0
            }
          }
          k += 1
        }
        if (r > 0 || curBits.nonEmpty) {
          eobrun += 1
          prevBits ++= curBits
          curBits.clear()
          if (eobrun == 0x7fff || prevBits.length > 900) emitEobrun()
        }
        u += 1
      }
      emitEobrun()
      bits.flushPad()
    }
    var ci = 0
    while (ci < nc) {
      bands.foreach { case (ss, se) => acFirstScan(ci, ss, se, acAl) }
      var aal = acAl - 1
      while (aal >= 0) {
        bands.foreach { case (ss, se) => acRefineScan(ci, ss, se, aal) }
        aal -= 1
      }
      ci += 1
    }
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte), 0, 2) // EOI
    out.toByteArray
  }

  // ── GIF89a: LSD + n 1×1 frames + trailer ────────────────────────────

  def gif(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(le16(w), 0, 2)
    out.write(le16(h), 0, 2)
    out.write(Array[Byte](0x70, 0, 0), 0, 3) // no GCT, color resolution 8-bit
    (0 until nFrames).foreach { _ =>
      // image descriptor: 1×1 at origin, no local color table
      out.write(Array[Byte](0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0), 0, 10)
      // LZW min code size + one 1-byte sub-block + terminator
      out.write(Array[Byte](2, 1, 0, 0), 0, 4)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Fully REAL GIF89a: global 256-entry grayscale color table (entry
    * i = (i,i,i)) and `frames` full-size image frames whose color
    * INDICES are `pix(x, y, frame)` — encoded as a genuine LZW stream.
    * The encoder uses the spec's reset facility (a CLEAR code before
    * every pixel code) so it never grows the dictionary: fixed 9-bit
    * codes, trivially correct, and decodable by ANY conformant GIF LZW
    * decoder — including the general one in
    * [[MediaHeaders.gifFrames]], whose dictionary machinery gets its
    * real-stream exercise from spec fixtures with growing dictionaries.
    */
  def gifReal(w: Int, h: Int, frames: Int, pix: (Int, Int, Int) => Int,
              interlaced: Boolean = false): Array[Byte] = {
    require(w >= 1 && h >= 1 && frames >= 1, s"bad geometry: ${w}x$h x$frames")
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(le16(w), 0, 2)
    out.write(le16(h), 0, 2)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // bg index, aspect
    var ci = 0
    while (ci < 256) { out.write(ci); out.write(ci); out.write(ci); ci += 1 }
    val clear = 256; val eoi = 257; val codeWidth = 9
    (0 until frames).foreach { f =>
      out.write(Array[Byte](0x2c, 0, 0, 0, 0), 0, 5)
      out.write(le16(w), 0, 2)
      out.write(le16(h), 0, 2)
      out.write(if (interlaced) 0x40 else 0) // no local color table
      out.write(8) // LZW min code size
      // pack 9-bit codes LSB-first: CLEAR px CLEAR px … EOI; an
      // interlaced frame transmits its rows in the spec's 4-pass order
      val bits = new ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      def put(code: Int): Unit = {
        acc |= code.toLong << nbits; nbits += codeWidth
        while (nbits >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      }
      val rowOrder =
        if (interlaced) MediaHeaders.interlaceOrder(h) else Array.tabulate(h)(identity)
      var k = 0
      while (k < h) {
        val y = rowOrder(k)
        var x = 0
        while (x < w) { put(clear); put(pix(x, y, f) & 0xff); x += 1 }
        k += 1
      }
      put(eoi)
      if (nbits > 0) bits.write((acc & 0xff).toInt)
      val data = bits.toByteArray
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n)
        out.write(data, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Real-world-shaped GIF: per-frame LOCAL 256-entry color tables
    * (`tableOf(frame, index)` → packed 0xRRGGBB) over a deliberately
    * misleading global table (all-zero — a decoder that resolves
    * through the global table instead of the frame's local one
    * produces black frames and fails the oracle), plus an optional
    * Graphic Control Extension declaring `transparentIdx` before every
    * frame. Pixel indexes from `pix(x, y, frame)` via the same real
    * LZW encoding as [[gifReal]]. */
  def gifRealPalette(w: Int, h: Int, frames: Int, pix: (Int, Int, Int) => Int,
                     tableOf: (Int, Int) => Int,
                     transparentIdx: Option[Int] = None): Array[Byte] = {
    require(w >= 1 && h >= 1 && frames >= 1, s"bad geometry: ${w}x$h x$frames")
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(le16(w), 0, 2)
    out.write(le16(h), 0, 2)
    out.write(0xf7) // global table present (all zeros — local must win)
    out.write(0); out.write(0)
    var z = 0
    while (z < 768) { out.write(0); z += 1 }
    val clear = 256; val eoi = 257; val codeWidth = 9
    (0 until frames).foreach { f =>
      transparentIdx.foreach { t =>
        out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0x01, 0, 0), 0, 6)
        out.write(t & 0xff)
        out.write(0) // terminator
      }
      out.write(Array[Byte](0x2c, 0, 0, 0, 0), 0, 5)
      out.write(le16(w), 0, 2)
      out.write(le16(h), 0, 2)
      out.write(0x87) // local color table, 256 entries
      var ci = 0
      while (ci < 256) {
        val v = tableOf(f, ci)
        out.write((v >> 16) & 0xff); out.write((v >> 8) & 0xff); out.write(v & 0xff)
        ci += 1
      }
      out.write(8) // LZW min code size
      val bits = new ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      def put(code: Int): Unit = {
        acc |= code.toLong << nbits; nbits += codeWidth
        while (nbits >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { put(clear); put(pix(x, y, f) & 0xff); x += 1 }
        y += 1
      }
      put(eoi)
      if (nbits > 0) bits.write((acc & 0xff).toInt)
      val data = bits.toByteArray
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n)
        out.write(data, off, n)
        off += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ── WAV: RIFF/WAVE + fmt (PCM) + data (real 16-bit samples) ─────────

  /** Zero-filled samples — the header-fixture form the parser fuzz uses. */
  def wav(channels: Int, sampleRate: Int, frames: Int): Array[Byte] =
    wav(channels, sampleRate, frames, (_, _) => 0)

  /** `sample(frame, channel)` fills the interleaved 16-bit LE data chunk —
    * unlike the other fixture payloads this one is genuinely decodable,
    * which is what lets [[graft.operators.Multimodal.resamplePcm]] run a
    * REAL decode+resample against an arithmetic oracle. */
  def wav(channels: Int, sampleRate: Int, frames: Int,
          sample: (Int, Int) => Int): Array[Byte] = {
    val blockAlign = 2 * channels // 16-bit PCM
    val dataSize = frames * blockAlign
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    out.write(le32(36 + dataSize), 0, 4)
    out.write("WAVE".getBytes("US-ASCII"), 0, 4)
    out.write("fmt ".getBytes("US-ASCII"), 0, 4)
    out.write(le32(16), 0, 4)
    out.write(le16(1), 0, 2) // PCM
    out.write(le16(channels), 0, 2)
    out.write(le32(sampleRate), 0, 4)
    out.write(le32(sampleRate * blockAlign), 0, 4)
    out.write(le16(blockAlign), 0, 2)
    out.write(le16(16), 0, 2) // bits per sample
    out.write("data".getBytes("US-ASCII"), 0, 4)
    out.write(le32(dataSize), 0, 4)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        out.write(le16(sample(i, c)), 0, 2)
        c += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** Real BMP (BITMAPINFOHEADER, BI_RGB): 24-bit BGR, 32-bit BGRA
    * (deterministic junk alpha the decoder must drop) or 8-bit
    * palette (`palette(i) = (i, 2i, 3i) mod 256`, indexes from
    * `idx`), rows 4-byte padded, bottom-up unless `topDown`. */
  def bmpReal(w: Int, h: Int, pix: (Int, Int, Int) => Int, bpp: Int,
              topDown: Boolean, idx: (Int, Int) => Int = (_, _) => 0): Array[Byte] = {
    require(bpp == 8 || bpp == 24 || bpp == 32)
    val rowBytes = ((w * bpp / 8) + 3) & ~3
    val nPal = if (bpp == 8) 256 else 0
    val dataOff = 14 + 40 + nPal * 4
    val size = dataOff + rowBytes * h
    val out = new java.io.ByteArrayOutputStream(size)
    out.write('B'); out.write('M')
    out.write(le32(size)); out.write(le32(0)); out.write(le32(dataOff))
    out.write(le32(40)); out.write(le32(w))
    out.write(le32(if (topDown) -h else h))
    out.write(le16(1)); out.write(le16(bpp))
    out.write(le32(0)) // BI_RGB
    out.write(le32(rowBytes * h)); out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(if (nPal > 0) 256 else 0)); out.write(le32(0))
    if (nPal > 0) {
      var i = 0
      while (i < 256) { // stored BGRA: (3i, 2i, i, 0)
        out.write((3 * i) % 256); out.write((2 * i) % 256); out.write(i); out.write(0)
        i += 1
      }
    }
    val row = new Array[Byte](rowBytes)
    val ys = if (topDown) 0 until h else (h - 1) to 0 by -1
    ys.foreach { y =>
      java.util.Arrays.fill(row, 0.toByte)
      var x = 0
      while (x < w) {
        bpp match {
          case 24 =>
            row(x * 3) = pix(x, y, 2).toByte // B
            row(x * 3 + 1) = pix(x, y, 1).toByte
            row(x * 3 + 2) = pix(x, y, 0).toByte
          case 32 =>
            row(x * 4) = pix(x, y, 2).toByte
            row(x * 4 + 1) = pix(x, y, 1).toByte
            row(x * 4 + 2) = pix(x, y, 0).toByte
            row(x * 4 + 3) = ((x * 5 + y * 3) % 256).toByte // junk alpha
          case _ =>
            row(x) = idx(x, y).toByte
        }
        x += 1
      }
      out.write(row)
    }
    out.toByteArray
  }

  /** Real baseline TIFF: 8-bit gray or RGB strips in EITHER byte
    * order, optionally LZW-compressed (MSB-first via
    * [[PdfFixtures.lzwEncodeMsb]] — the TIFF flavor) and horizontal-
    * predictor differenced; `whiteIsZero` writes photometric 0 (the
    * decoder must invert). Strip layout: header, strip data, IFD,
    * external value arrays — tags ascending per the spec. */
  def tiffReal(w: Int, h: Int, pix: (Int, Int, Int) => Int, rgb: Boolean,
               littleEndian: Boolean, lzw: Boolean, predictor2: Boolean,
               rowsPerStrip: Int, whiteIsZero: Boolean = false): Array[Byte] = {
    val spp = if (rgb) 3 else 1
    val rowSize = w * spp
    val rps = math.max(1, math.min(rowsPerStrip, h))
    val nStrips = (h + rps - 1) / rps
    // raw raster, row-major
    val raster = new Array[Byte](rowSize * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until spp)
      raster(y * rowSize + x * spp + c) = pix(x, y, c).toByte
    // per-strip payloads (predictor then compression)
    val strips = (0 until nStrips).map { k =>
      val rows = math.min(rps, h - k * rps)
      val d = java.util.Arrays.copyOfRange(raster, k * rps * rowSize,
        k * rps * rowSize + rows * rowSize)
      if (predictor2) {
        for (y <- 0 until rows; x <- (w - 1) until 0 by -1; s <- 0 until spp) {
          val o = y * rowSize + x * spp + s
          d(o) = (d(o) - d(o - spp)).toByte
        }
      }
      if (lzw) PdfFixtures.lzwEncodeMsb(d) else d
    }
    val stripOffsets = strips.scanLeft(8)((acc, s) => acc + s.length).init
    val ifdOff = 8 + strips.map(_.length).sum

    def p16(v: Int): Array[Byte] =
      if (littleEndian) le16(v) else be16(v)
    def p32(v: Int): Array[Byte] =
      if (littleEndian) le32(v) else be32(v)

    final case class Entry(tag: Int, typ: Int, count: Int, inline: Array[Byte],
                           external: Array[Byte])
    def shortEntry(tag: Int, v: Int) =
      Entry(tag, 3, 1, p16(v) ++ Array[Byte](0, 0), Array.emptyByteArray)
    def longEntry(tag: Int, v: Int) =
      Entry(tag, 4, 1, p32(v), Array.emptyByteArray)
    def longArrayEntry(tag: Int, vs: Seq[Int], extOff: Int) =
      if (vs.length == 1) longEntry(tag, vs.head)
      else Entry(tag, 4, vs.length, p32(extOff),
        vs.flatMap(p32).toArray)

    // two passes: external arrays land after the IFD, offsets known
    // once the entry count is fixed
    val photometric = if (rgb) 2 else if (whiteIsZero) 0 else 1
    val tags0 = Seq(256, 257, 258, 259, 262, 273, 277, 278, 279) ++
      (if (predictor2) Seq(317) else Nil)
    val nEntries = tags0.length
    val ifdSize = 2 + nEntries * 12 + 4
    var extOff = ifdOff + ifdSize
    def takeExt(n: Int): Int = { val o = extOff; extOff += n; o }
    val entries = tags0.map {
      case 256 => longEntry(256, w)
      case 257 => longEntry(257, h)
      case 258 =>
        if (spp == 1) shortEntry(258, 8)
        else Entry(258, 3, 3, p32(takeExt(6)),
          p16(8) ++ p16(8) ++ p16(8))
      case 259 => shortEntry(259, if (lzw) 5 else 1)
      case 262 => shortEntry(262, photometric)
      case 273 =>
        if (nStrips == 1) longEntry(273, stripOffsets.head)
        else longArrayEntry(273, stripOffsets, takeExt(4 * nStrips))
      case 277 => shortEntry(277, spp)
      case 278 => longEntry(278, rps)
      case 279 =>
        if (nStrips == 1) longEntry(279, strips.head.length)
        else longArrayEntry(279, strips.map(_.length), takeExt(4 * nStrips))
      case 317 => shortEntry(317, 2)
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(if (littleEndian) 'I' else 'M')
    out.write(if (littleEndian) 'I' else 'M')
    out.write(p16(42))
    out.write(p32(ifdOff))
    strips.foreach(out.write)
    out.write(p16(nEntries))
    entries.foreach { en =>
      out.write(p16(en.tag)); out.write(p16(en.typ)); out.write(p32(en.count))
      out.write(en.inline)
    }
    out.write(p32(0)) // no next IFD
    entries.foreach(en => out.write(en.external))
    out.toByteArray
  }

  // ── audio/video container fixtures (deterministic, seed-free) ───────

  /** MPEG-1/2 Layer III stream: `nFrames` equal-length frames (padding
    * bit clear) whose payload bytes derive from the frame index, behind
    * an optional ID3v2 pad (synchsafe size) and before an optional
    * ID3v1 trailer. `xing=true` plants a Xing tag (FRAMES flag) behind
    * the correct side-info span of the first frame. mpeg1=false writes
    * MPEG-2 (576 samples/frame, halved sample rates). */
  def mp3(mpeg1: Boolean, brIdx: Int, srIdx: Int, mono: Boolean, nFrames: Int,
          xing: Boolean, id3v2Pad: Int = -1, id3v1: Boolean = false): Array[Byte] = {
    val kbps = (if (mpeg1) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))(brIdx)
    val rate = Array(44100, 48000, 32000)(srIdx) / (if (mpeg1) 1 else 2)
    val spf = if (mpeg1) 1152 else 576
    val frameLen = spf / 8 * (kbps * 1000) / rate
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Pad >= 0) {
      out.write("ID3".getBytes); out.write(4); out.write(0); out.write(0)
      out.write((id3v2Pad >> 21) & 0x7F); out.write((id3v2Pad >> 14) & 0x7F)
      out.write((id3v2Pad >> 7) & 0x7F); out.write(id3v2Pad & 0x7F)
      out.write(new Array[Byte](id3v2Pad))
    }
    val verBits = if (mpeg1) 3 else 2
    val h1 = 0xE0 | (verBits << 3) | (1 << 1) | 1 // sync low, layer III, no CRC
    val h2 = (brIdx << 4) | (srIdx << 2) // padding 0, private 0
    val h3 = (if (mono) 3 else 0) << 6
    val sideInfo = if (mpeg1) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }
    for (f <- 0 until nFrames) {
      val body = new Array[Byte](frameLen - 4)
      for (j <- body.indices) body(j) = ((f * 31 + j * 7) % 251).toByte
      if (f == 0 && xing) {
        java.util.Arrays.fill(body, 0, sideInfo, 0.toByte)
        System.arraycopy("Xing".getBytes, 0, body, sideInfo, 4)
        System.arraycopy(be32(1), 0, body, sideInfo + 4, 4) // FRAMES flag
        System.arraycopy(be32(nFrames), 0, body, sideInfo + 8, 4)
      }
      out.write(0xFF); out.write(h1); out.write(h2); out.write(h3)
      out.write(body)
    }
    if (id3v1) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      out.write(tag)
    }
    out.toByteArray
  }

  /** `fLaC` + a last-flagged STREAMINFO block with the packed
    * rate/channels/bps/total-samples fields (36-bit total). */
  def flac(rate: Int, channels: Int, bps: Int, totalSamples: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    out.write(0x80); out.write(0); out.write(0); out.write(34) // last, type 0, len 34
    out.write(be16(1024)); out.write(be16(1024)) // min/max blocksize
    out.write(0); out.write(0); out.write(64) // min framesize u24
    out.write(0); out.write(16); out.write(0) // max framesize u24
    out.write((rate >> 12) & 0xFF)
    out.write((rate >> 4) & 0xFF)
    out.write(((rate & 0xF) << 4) | (((channels - 1) & 7) << 1) | (((bps - 1) >> 4) & 1))
    out.write((((bps - 1) & 0xF) << 4) | ((totalSamples >> 32) & 0xF).toInt)
    out.write(be32((totalSamples & 0xFFFFFFFFL).toInt))
    out.write(new Array[Byte](16)) // md5
    out.toByteArray
  }

  /** Ogg/Vorbis: a BOS page holding the identification packet, then
    * `dataPages` audio pages with evenly spaced granule positions up to
    * `granule` (EOS on the last). Page payloads are index-derived. */
  def oggVorbis(rate: Int, channels: Int, granule: Long, dataPages: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def page(hdrType: Int, gran: Long, seq: Int, payload: Array[Byte]): Unit = {
      out.write("OggS".getBytes); out.write(0); out.write(hdrType)
      out.write(le32((gran & 0xFFFFFFFFL).toInt)); out.write(le32(((gran >> 32) & 0xFFFFFFFFL).toInt))
      out.write(le32(0x5EED)); out.write(le32(seq)); out.write(le32(0)) // serial, seq, crc(unchecked)
      // lacing: 255-runs + terminator
      val full = payload.length / 255; val rem = payload.length % 255
      out.write(full + 1)
      for (_ <- 0 until full) out.write(255)
      out.write(rem)
      out.write(payload)
    }
    val id = new java.io.ByteArrayOutputStream()
    id.write(1); id.write("vorbis".getBytes)
    id.write(le32(0)) // vorbis version
    id.write(channels); id.write(le32(rate))
    id.write(le32(0)); id.write(le32(0)); id.write(le32(0)) // bitrates
    id.write(0xB8); id.write(1) // blocksizes, framing
    page(0x02, 0L, 0, id.toByteArray) // BOS, granule 0
    for (p <- 1 to dataPages) {
      val payload = Array.tabulate(40 + p % 7)(j => ((p * 53 + j * 11) % 247).toByte)
      val gran = granule * p / dataPages
      page(if (p == dataPages) 0x04 else 0x00, gran, p, payload)
    }
    out.toByteArray
  }

  /** ISO-BMFF skeleton: `ftyp` + `moov{mvhd, trak{tkhd}}` + `mdat`.
    * `version` 0/1 selects the 32/64-bit mvhd+tkhd field layout. */
  def mp4(timescale: Int, duration: Long, w: Int, h: Int, version: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ typ.getBytes ++ payload
    val mvhd =
      if (version == 0)
        box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
          be32(timescale) ++ be32(duration.toInt) ++ new Array[Byte](80))
      else
        box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
          be32(timescale) ++ be32((duration >> 32).toInt) ++ be32((duration & 0xFFFFFFFFL).toInt) ++
          new Array[Byte](80))
    val tkhd =
      if (version == 0)
        box("tkhd", Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
          be32(duration.toInt) ++ new Array[Byte](8) ++ new Array[Byte](8) ++
          new Array[Byte](36 - 4) ++ be32(0x40000000) ++ // identity matrix tail
          be32(w << 16) ++ be32(h << 16))
      else
        box("tkhd", Array[Byte](1, 0, 0, 7) ++ new Array[Byte](16) ++ be32(1) ++ be32(0) ++
          be32((duration >> 32).toInt) ++ be32((duration & 0xFFFFFFFFL).toInt) ++
          new Array[Byte](8) ++ new Array[Byte](8) ++
          new Array[Byte](36 - 4) ++ be32(0x40000000) ++
          be32(w << 16) ++ be32(h << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val mdat = box("mdat", Array.tabulate(24)(j => (j * 17 % 250).toByte))
    box("ftyp", "isom".getBytes ++ be32(0x200) ++ "isomiso2".getBytes) ++ moov ++ mdat
  }

  // ── byte writers ────────────────────────────────────────────────────

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
}
