package graft.codec

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.apache.spark.sql.Row

/** Byte-accurate container fixtures through the real header parsers —
  * and through the full decodeMeta stage, alongside a stub-path blob. */
class MediaHeadersSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** A genuine 1×1 RGBA PNG (the canonical minimal transparent pixel). */
  private val png1x1 = hex(
    "89504e470d0a1a0a" +
      "0000000d49484452 0000000100000001 0806000000 1f15c489" +
      "0000000d49444154 789c626001000000ffff0300 0006000557bfabd4" + // wrong crc is fine: not validated
      "0000000049454e44 ae426082")

  /** An APNG head: same IHDR, then an acTL chunk declaring 3 frames. */
  private val apngHead = hex(
    "89504e470d0a1a0a" +
      "0000000d49484452 0000002000000010 0806000000 00000000" + // 32×16
      "00000008 6163544c 00000003 00000000 00000000" + // acTL: num_frames=3, num_plays=0
      "0000000049444154") // IDAT begins (no data needed)

  /** Minimal JFIF JPEG: APP0 + SOF0 (8-bit, 3 components, 3 wide 2 high). */
  private val jpegMin = hex(
    "ffd8" +
      "ffe0 0010 4a46494600 0101 00 0001 0001 00 00" + // APP0 JFIF, 16 bytes
      "ffc0 0011 08 0002 0003 03 01 1100 02 1101 03 1101" + // SOF0 h=2 w=3, 3 comps
      "ffd9")

  /** Animated GIF89a: 4×5 screen, 2-entry global palette, two 1×1 frames. */
  private val gifAnim = hex(
    "474946383961" + // GIF89a
      "0400 0500" + // logical screen 4×5 (LE)
      "f0" + // flags: GCT present, color resolution 7+1=8 bits, GCT size 2^1=2
      "00 00" + // bg color, aspect
      "000000 ffffff" + // global color table (2 × RGB)
      "21f9 04 00 0a00 00 00" + // graphic control extension (sub-block 4, term)
      "2c 0000 0000 0100 0100 00" + "02" + "01 00" + "00" + // frame 1 + LZW + subblocks
      "21f9 04 00 0a00 00 00" +
      "2c 0000 0000 0100 0100 00" + "02" + "01 00" + "00" + // frame 2
      "3b")

  /** PCM WAV: stereo, 44.1 kHz, 16-bit, 400 data bytes = 100 frames. */
  private val wavPcm: Array[Byte] = {
    val data = new Array[Byte](400)
    hex("52494646" + "24010000" + "57415645" + // RIFF, size 292 (not checked), WAVE
      "666d7420 10000000" + // "fmt ", 16
      "0100" + "0200" + "44ac0000" + "10b10200" + "0400" + "1000" + // PCM, 2ch, 44100, 4-align, 16-bit
      "64617461 90010000") ++ data // "data", 400
  }

  test("png: IHDR dimensions, depth, channels; single frame") {
    val m = MediaHeaders.parse(png1x1).get
    assert(m == MediaHeaders.MediaMeta("png", width = Some(1), height = Some(1),
      nFrames = Some(1), bitDepth = Some(8), channels = Some(4)))
  }

  test("apng: acTL frame count before IDAT") {
    val m = MediaHeaders.parse(apngHead).get
    assert((m.width, m.height, m.nFrames) == (Some(32), Some(16), Some(3)))
  }

  test("jpeg: SOF0 dimensions, precision, components behind APP0") {
    val m = MediaHeaders.parse(jpegMin).get
    assert(m == MediaHeaders.MediaMeta("jpeg", width = Some(3), height = Some(2),
      nFrames = Some(1), bitDepth = Some(8), channels = Some(3)))
  }

  test("gif: LSD dimensions, palette depth, animated frame count") {
    val m = MediaHeaders.parse(gifAnim).get
    assert(m == MediaHeaders.MediaMeta("gif", width = Some(4), height = Some(5),
      nFrames = Some(2), bitDepth = Some(8)))
  }

  test("wav: fmt geometry, data frame count, duration") {
    val m = MediaHeaders.parse(wavPcm).get
    assert(m == MediaHeaders.MediaMeta("wav", nFrames = Some(100),
      bitDepth = Some(16), channels = Some(2), sampleRate = Some(44100),
      durationMs = Some(100L * 1000 / 44100)))
  }

  test("wavPcm16: decodes exactly the interleaved samples the fixture wrote") {
    val blob = MediaFixtures.wav(channels = 2, sampleRate = 16000, frames = 5,
      sample = (i, c) => i * 100 + c * 7 - 250) // mixes negative and positive
    val p = MediaHeaders.wavPcm16(blob).get
    assert(p.channels == 2 && p.sampleRate == 16000)
    assert(p.samples.toSeq == (0 until 5).flatMap(i => Seq(i * 100 - 250, i * 100 + 7 - 250)).map(_.toShort))
    // extreme 16-bit values survive the LE round trip
    val edge = MediaHeaders.wavPcm16(
      MediaFixtures.wav(1, 8000, 3, (i, _) => Seq(-32768, 0, 32767)(i))).get
    assert(edge.samples.toSeq == Seq(-32768, 0, 32767).map(_.toShort))
    // a truncated blob decodes the prefix that exists, never throws
    val cut = MediaHeaders.wavPcm16(blob.dropRight(7)).get
    assert(cut.samples.length == (blob.length - 44 - 7) / 2)
    // zero-filled geometry fixture decodes too (all zeros)
    val z = MediaHeaders.wavPcm16(wavPcm).get
    assert(z.samples.length == 200 && z.samples.forall(_ == 0))
    // non-wav containers refuse
    assert(MediaHeaders.wavPcm16(png1x1).isEmpty)
    assert(MediaHeaders.wavPcm16(jpegMin).isEmpty)
    assert(MediaHeaders.wavPcm16("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("pngPixels: real deflate round trip inverts all five scanline filters") {
    def pix(x: Int, y: Int, c: Int): Int = (x * 7 + y * 13 + c * 11 + 5) % 256
    // every row a different filter type, cycling through all five
    val blob = MediaFixtures.pngReal(13, 10, pix, filterOf = y => y % 5)
    val r = MediaHeaders.pngPixels(blob).get
    assert(r.width == 13 && r.height == 10 && r.rgb.length == 13 * 10 * 3)
    for (y <- 0 until 10; x <- 0 until 13; c <- 0 until 3)
      assert((r.rgb((y * 13 + x) * 3 + c) & 0xff) == pix(x, y, c),
        s"pixel ($x,$y,$c) filter ${y % 5}")
    // 1x1 edge (no left/up neighbors on any filter)
    for (ft <- 0 to 4) {
      val one = MediaHeaders.pngPixels(MediaFixtures.pngReal(1, 1, pix, _ => ft)).get
      assert(one.rgb.map(_ & 0xff).toSeq == Seq(pix(0, 0, 0), pix(0, 0, 1), pix(0, 0, 2)))
    }
    // refusals: header-only fixture (token IDAT inflates short), truncation,
    // non-truecolor flavors, corrupt zlib
    assert(MediaHeaders.pngPixels(png1x1).isEmpty)
    assert(MediaHeaders.pngPixels(blob.take(60)).isEmpty)
    val corrupt = blob.clone(); corrupt(45) = (corrupt(45) ^ 0x5a).toByte
    assert(MediaHeaders.pngPixels(corrupt).isEmpty ||
      MediaHeaders.pngPixels(corrupt).get.rgb.length == 13 * 10 * 3) // a bit flip may survive zlib but never crashes
  }

  test("pngPixels: grayscale and palette color types decode; ImageIO agrees byte-for-byte") {
    def gray(x: Int, y: Int): Int = (x * 7 + y * 13 + 5) % 256
    val gblob = MediaFixtures.pngRealGray(11, 9, gray, filterOf = y => y % 5)
    val gr = MediaHeaders.pngPixels(gblob).get
    assert(gr.rgb.length == 11 * 9 * 3)
    val gimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gblob))
    for (y <- 0 until 9; x <- 0 until 11) {
      val o = (y * 11 + x) * 3
      assert((gr.rgb(o) & 0xff) == gray(x, y) && gr.rgb(o) == gr.rgb(o + 1)
        && gr.rgb(o + 1) == gr.rgb(o + 2))
      assert(gimg.getRaster.getSample(x, y, 0) == gray(x, y), s"ImageIO gray ($x,$y)")
    }
    // palette: 256-entry PLTE, every index used somewhere
    val plte = Array.tabulate(768)(i => ((i / 3) * 31 + (i % 3) * 11 + 7).toByte)
    def idx(x: Int, y: Int): Int = (x * 5 + y * 11 + 3) % 256
    val pblob = MediaFixtures.pngRealIndexed(14, 8, plte, idx, filterOf = y => y % 5)
    val pr = MediaHeaders.pngPixels(pblob).get
    val pimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pblob))
    for (y <- 0 until 8; x <- 0 until 14; c <- 0 until 3) {
      val expect = plte(3 * idx(x, y) + c) & 0xff
      assert((pr.rgb((y * 14 + x) * 3 + c) & 0xff) == expect, s"palette ($x,$y,$c)")
      val rgb = pimg.getRGB(x, y)
      val ch = c match { case 0 => (rgb >> 16) & 0xff; case 1 => (rgb >> 8) & 0xff; case _ => rgb & 0xff }
      assert(ch == expect, s"ImageIO palette ($x,$y,$c)")
    }
    // a short palette with in-range indexes decodes…
    val shortPlte = Array.tabulate(30)(i => i.toByte) // 10 entries
    val ok = MediaFixtures.pngRealIndexed(4, 4, shortPlte, (x, y) => (x + y) % 10)
    assert(MediaHeaders.pngPixels(ok).isDefined)
    // …but an index PAST the palette must refuse, not read out of bounds.
    // Build the malformed blob by hand: 10-entry PLTE, index byte 200.
    val refuse = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
      def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        out.write(be32(data.length), 0, 4)
        val t = typ.getBytes("US-ASCII")
        val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
        out.write(t, 0, 4); out.write(data, 0, data.length)
        out.write(be32(crc.getValue.toInt), 0, 4)
      }
      chunk("IHDR", be32(2) ++ be32(1) ++ Array[Byte](8, 3, 0, 0, 0))
      chunk("PLTE", shortPlte)
      val raw = Array[Byte](0, 200.toByte, 200.toByte) // filter 0 + two index bytes
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val comp = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
      defl.end()
      chunk("IDAT", comp.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    assert(MediaHeaders.pngPixels(refuse).isEmpty)
  }

  test("gifFrames: fixture LZW decodes; a REAL growing-dictionary stream decodes too") {
    def pix(x: Int, y: Int, f: Int): Int = (x * 3 + y * 5 + f * 17 + 2) % 256
    val blob = MediaFixtures.gifReal(9, 7, 3, pix)
    val g = MediaHeaders.gifFrames(blob).get
    assert(g.width == 9 && g.height == 7 && g.frames.length == 3)
    for (f <- 0 until 3; y <- 0 until 7; x <- 0 until 9)
      assert((g.frames(f)(y * 9 + x) & 0xff) == pix(x, y, f), s"($x,$y,$f)")
    assert(MediaHeaders.parse(blob).get.nFrames.contains(3), "header parser agrees")

    // textbook LZW COMPRESSOR (dictionary growth, width bumps) written
    // here independently; the decoder must invert it — this is the path
    // the clear-code fixture encoder deliberately never exercises,
    // including the k-omega-k self-reference on repetitive input
    def lzwEncode(pixels: Array[Int], mcs: Int): Array[Byte] = {
      val clear = 1 << mcs; val eoi = clear + 1
      var dict = scala.collection.mutable.Map.empty[List[Int], Int]
      var nextCode = eoi + 1
      var codeSize = mcs + 1
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      def put(code: Int): Unit = {
        acc |= code.toLong << nbits; nbits += codeSize
        while (nbits >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      }
      put(clear)
      var cur = List.empty[Int]
      for (p <- pixels) {
        val ext = cur :+ p
        if (cur.isEmpty || (ext.length == 1 && p < clear) || dict.contains(ext)) cur = ext
        else {
          put(if (cur.length == 1) cur.head else dict(cur))
          if (nextCode < 4096) {
            dict(ext) = nextCode; nextCode += 1
            // GIF encoders bump width when nextCode EXCEEDS the width
            if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          }
          cur = List(p)
        }
      }
      if (cur.nonEmpty) put(if (cur.length == 1) cur.head else dict(cur))
      put(eoi)
      if (nbits > 0) bits.write((acc & 0xff).toInt)
      bits.toByteArray
    }
    // repetitive input triggers k-omega-k; the varied tail grows the
    // dictionary across a width bump (16-color alphabet, mcs=4: codes
    // widen 5 -> 6 -> 7 bits as entries pass 32 and 64)
    val pixels = Array.fill(40)(7) ++ (0 until 300).map(i => (i * i + 3) % 16).toArray
    val mcs = 4
    val stream = lzwEncode(pixels, mcs)
    val decoded = MediaHeaders.lzwDecode(stream, mcs, pixels.length).get
    assert(decoded.map(_ & 0xff).toSeq == pixels.toSeq,
      "general decoder must invert an independent textbook LZW compressor")
    // and a pure k-omega-k opener: "aaaa..." forces code==nextCode immediately
    val rep = Array.fill(64)(5)
    val repDecoded = MediaHeaders.lzwDecode(lzwEncode(rep, mcs), mcs, rep.length).get
    assert(repDecoded.map(_ & 0xff).toSeq == rep.toSeq)
  }

  test("pngPixels: Adam7 interlaced decodes equal to the sequential twin at every size") {
    def pix(x: Int, y: Int, c: Int): Int = (x * 7 + y * 13 + c * 11 + 5) % 256
    // sizes crossing every pass-existence boundary (1..9) plus larger
    for ((w, h) <- Seq((1, 1), (2, 3), (4, 4), (5, 8), (8, 5), (9, 9), (13, 10), (17, 11))) {
      val plain = MediaHeaders.pngPixels(
        MediaFixtures.pngReal(w, h, pix, filterOf = y => y % 5)).get
      val adam = MediaHeaders.pngPixels(
        MediaFixtures.pngReal(w, h, pix, filterOf = y => y % 5, interlaced = true)).get
      assert(adam.width == w && adam.height == h)
      assert(plain.rgb.sameElements(adam.rgb), s"Adam7 mismatch at ${w}x$h")
    }
    // ImageIO agrees on an interlaced truecolor image (lossless, exact)
    val blob = MediaFixtures.pngReal(13, 10, pix, filterOf = y => y % 5, interlaced = true)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    for (y <- 0 until 10; x <- 0 until 13) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == pix(x, y, 0) && ((rgb >> 8) & 0xff) == pix(x, y, 1)
        && (rgb & 0xff) == pix(x, y, 2), s"ImageIO Adam7 ($x,$y)")
    }
  }

  test("pngPixels: the COMPLETE legal IHDR matrix decodes; ImageIO agrees byte-for-byte") {
    val plte = Array.tabulate(768)(i => ((i / 3) * 31 + (i % 3) * 11 + 7).toByte)
    def sample(depth: Int)(x: Int, y: Int, ch: Int): Int =
      (x * 7 + y * 13 + ch * 11 + 5) % (1 << depth)
    val matrix = Seq(
      (0, 1), (0, 2), (0, 4), (0, 8), (0, 16), // grayscale
      (2, 8), (2, 16), // truecolor
      (3, 1), (3, 2), (3, 4), (3, 8), // palette
      (4, 8), (4, 16), // gray + alpha
      (6, 8), (6, 16)) // RGBA
    for ((ct, depth) <- matrix; interlaced <- Seq(false, true)) {
      val label = s"ct=$ct depth=$depth adam7=$interlaced"
      val w = 13; val h = 10
      val usePlte = if (ct == 3) plte else null
      val blob = MediaFixtures.pngRealEx(w, h, ct, depth, usePlte, sample(depth),
        filterOf = y => y % 5, interlaced = interlaced)
      val r = MediaHeaders.pngPixels(blob).getOrElse(fail(s"decode failed: $label"))
      assert(r.width == w && r.height == h && r.rgb.length == w * h * 3, label)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      assert(img != null, s"ImageIO refused: $label")
      for (y <- 0 until h; x <- 0 until w) {
        // the expected RGB from the declared expansion contract
        def s8(ch: Int): Int = depth match {
          case 16 => sample(16)(x, y, ch) >> 8
          case 8 => sample(8)(x, y, ch)
          case d => sample(d)(x, y, ch) * 255 / ((1 << d) - 1)
        }
        val (er, eg, eb) = ct match {
          case 0 | 4 => (s8(0), s8(0), s8(0))
          case 2 | 6 => (s8(0), s8(1), s8(2))
          case _ =>
            val idx = sample(depth)(x, y, 0)
            (plte(3 * idx) & 0xff, plte(3 * idx + 1) & 0xff, plte(3 * idx + 2) & 0xff)
        }
        val o = (y * w + x) * 3
        assert((r.rgb(o) & 0xff) == er && (r.rgb(o + 1) & 0xff) == eg
          && (r.rgb(o + 2) & 0xff) == eb, s"$label pixel ($x,$y)")
        // ImageIO cross-check on RAW samples (getRGB would run the
        // gray→sRGB colorspace transform); palette images go through
        // getRGB, whose IndexColorModel returns the PLTE entry as-is
        if (ct == 3) {
          val rgb = img.getRGB(x, y)
          assert(((rgb >> 16) & 0xff) == er && ((rgb >> 8) & 0xff) == eg
            && (rgb & 0xff) == eb, s"ImageIO $label pixel ($x,$y)")
        } else {
          val bands = if (ct == 0 || ct == 4) 1 else 3
          for (band <- 0 until bands)
            assert(img.getRaster.getSample(x, y, band) == sample(depth)(x, y, band),
              s"ImageIO $label pixel ($x,$y) band $band")
        }
      }
    }
  }

  test("gifFrames: interlaced frames deinterlace to the raster-order twin at every height") {
    def pix(x: Int, y: Int, f: Int): Int = (x * 3 + y * 5 + f * 17 + 2) % 256
    // every height 1..20 exercises all pass-boundary cases (h=1 only
    // pass 1; h=2 adds pass 4; h=3..4 pass 3; h=5+ all four)
    for (h <- 1 to 20) {
      val plain = MediaHeaders.gifFrames(MediaFixtures.gifReal(7, h, 2, pix)).get
      val inter = MediaHeaders.gifFrames(
        MediaFixtures.gifReal(7, h, 2, pix, interlaced = true)).get
      for (f <- 0 until 2)
        assert(plain.frames(f).sameElements(inter.frames(f)), s"h=$h frame $f")
    }
    // the permutation really is a permutation at every height
    for (h <- 1 to 40) {
      val o = MediaHeaders.interlaceOrder(h)
      assert(o.sorted.sameElements(Array.tabulate(h)(identity)), s"order h=$h")
    }
  }

  test("gifFramesRgb: local table wins over global, GCE is consume-once, global is the fallback") {
    def pix(x: Int, y: Int, f: Int): Int = (x * 3 + y * 5 + f * 7) % 256
    def table(f: Int, ci: Int): Int = {
      val r = (f * 11 + ci * 3 + 1) % 256
      val g = (f * 7 + ci * 9 + 2) % 256
      val b = (f * 3 + ci * 7 + 3) % 256
      (r << 16) | (g << 8) | b
    }
    // two frames, local tables, transparency on index 9 for BOTH frames
    // (the fixture writes a GCE before each frame)
    val blob = MediaFixtures.gifRealPalette(6, 4, 2, pix, table, transparentIdx = Some(9))
    val g = MediaHeaders.gifFramesRgb(blob).getOrElse(fail("decode failed"))
    assert(g.width == 6 && g.height == 4 && g.frames.length == 2)
    for (f <- 0 until 2; y <- 0 until 4; x <- 0 until 6) {
      val v = table(f, pix(x, y, f))
      val p = (y * 6 + x) * 3
      assert((g.frames(f)(p) & 0xff) == ((v >> 16) & 0xff), s"r f=$f ($x,$y)")
      assert((g.frames(f)(p + 1) & 0xff) == ((v >> 8) & 0xff), s"g f=$f")
      assert((g.frames(f)(p + 2) & 0xff) == (v & 0xff), s"b f=$f")
    }
    for (f <- 0 until 2) {
      val expected = (for (y <- 0 until 4; x <- 0 until 6 if pix(x, y, f) == 9) yield 1).sum
      assert(g.transparent(f) == expected, s"transparent count f=$f")
    }
    // global-table fallback: gifReal has a global grayscale identity
    // table and no local ones — rgb = index replicated
    val plain = MediaFixtures.gifReal(5, 3, 1, (x, y, f) => (x + y * 4 + f) % 256)
    val pg = MediaHeaders.gifFramesRgb(plain).getOrElse(fail("global fallback failed"))
    assert(pg.transparent == Seq(0)) // no GCE anywhere
    for (y <- 0 until 3; x <- 0 until 5) {
      val ci = (x + y * 4) % 256
      val p = (y * 5 + x) * 3
      assert((pg.frames(0)(p) & 0xff) == ci && (pg.frames(0)(p + 1) & 0xff) == ci &&
        (pg.frames(0)(p + 2) & 0xff) == ci)
    }
    // index raster unchanged by the RGB path
    val idx = MediaHeaders.gifFrames(blob).get
    assert(idx.frames(0).zipWithIndex.forall { case (b, i) =>
      (b & 0xff) == pix(i % 6, i / 6, 0)
    })
  }

  test("unrecognized and truncated blobs parse to None") {
    assert(MediaHeaders.parse("hello world".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(MediaHeaders.parse(png1x1.take(20)).isEmpty) // sig ok, IHDR cut
    assert(MediaHeaders.parse(hex("ffd8ffd9")).isEmpty) // EOI before SOF
    assert(MediaHeaders.parse(wavPcm.take(20)).isEmpty) // fmt cut
  }

  test("parsers never throw: random bytes, random truncations, magic + garbage") {
    val rnd = new scala.util.Random(13)
    // the full decoders face the same arbitrary bytes the header parsers
    // do — fuzz them with decodable fixtures in the pool so bit flips
    // land INSIDE real zlib/LZW/PCM streams, not just headers
    def jq = Array.tabulate(64)(i => if (i == 0) 5 else 16)
    def jcoef(c: Int, bx: Int, by: Int): Array[Int] =
      Array.tabulate(64)(i => if (i == 0) bx * 7 + by - 20 else if (i < 6) i - 3 else 0)
    val fixtures = Seq(png1x1, apngHead, jpegMin, gifAnim, wavPcm,
      MediaFixtures.pngReal(6, 5, (x, y, c) => (x + y + c) % 256, y => y % 5),
      MediaFixtures.gifReal(5, 4, 2, (x, y, f) => (x * 2 + y + f) % 256),
      MediaFixtures.wav(2, 8000, 9, (i, c) => i * 1000 - 4000 + c),
      MediaFixtures.jpegReal(10, 9, Seq(jq), jcoef),
      MediaFixtures.jpegProgressive(10, 9, Seq(jq), jcoef, dcAl = 2),
      MediaFixtures.jpegWithExif(MediaFixtures.jpegReal(10, 9, Seq(jq), jcoef),
        orientation = 6, littleEndian = true),
      MediaFixtures.jpegWithExif(MediaFixtures.jpegReal(10, 9, Seq(jq), jcoef),
        orientation = 3, littleEndian = false),
      MediaFixtures.gifRealPalette(5, 4, 2, (x, y, f) => (x + y + f) % 256,
        (f, ci) => (ci << 16) | (f << 8) | 7, transparentIdx = Some(3)),
      webpVp8(12, 9), webpVp8l(12, 9, alpha = true),
      webpVp8x(12, 9, alpha = false, anim = true),
      MediaFixtures.mp3(mpeg1 = true, brIdx = 9, srIdx = 0, mono = false,
        nFrames = 2, xing = true, id3v2Pad = 8, id3v1 = true),
      MediaFixtures.flac(44100, 2, 16, 500L),
      MediaFixtures.oggVorbis(48000, 2, 9000L, 2),
      MediaFixtures.mp4(1000, 4321, 64, 48, version = 1))
    for (_ <- 0 until 2000) {
      val b = rnd.nextInt(4) match {
        case 0 => Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte) // pure noise
        case 1 => fixtures(rnd.nextInt(fixtures.size)).take(rnd.nextInt(60)) // truncation
        case 2 => // valid magic, garbage body
          val f = fixtures(rnd.nextInt(fixtures.size))
          f.take(12) ++ Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
        case _ => // bit-flipped fixture
          val f = fixtures(rnd.nextInt(fixtures.size)).clone()
          if (f.nonEmpty) { val i = rnd.nextInt(f.length); f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte }
          f
      }
      // must return Some or None, never throw — headers AND full decoders
      MediaHeaders.parse(b)
      MediaHeaders.pngPixels(b)
      MediaHeaders.gifFrames(b)
      MediaHeaders.wavPcm16(b)
      MediaHeaders.jpegPixels(b)
      MediaHeaders.exifOrientation(b)
      MediaHeaders.gifFramesRgb(b)
    }
  }

  test("decodeMeta: real containers get real metadata, text falls to the stub") {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, png1x1), Row(2L, jpegMin), Row(3L, gifAnim), Row(4L, wavPcm),
      Row(5L, "just some text".getBytes("UTF-8")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = Multimodal.decodeMeta(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[String]("format") == "png")
    assert(out(1L).getAs[Int]("width") == 1 && out(1L).getAs[Int]("height") == 1)
    assert(out(2L).getAs[String]("format") == "jpeg")
    assert(out(2L).getAs[Int]("width") == 3 && out(2L).getAs[Int]("height") == 2)
    assert(out(3L).getAs[String]("format") == "gif")
    assert(out(3L).getAs[Int]("n_frames") == 2)
    assert(out(4L).getAs[String]("format") == "wav")
    assert(out(4L).getAs[Int]("sample_rate") == 44100)
    assert(out(4L).getAs[Int]("n_frames") == 100)
    assert(out(4L).isNullAt(out(4L).fieldIndex("width"))) // audio has no pixels
    // stub path: format null, fake dims follow the pinned byte arithmetic
    val t = out(5L)
    assert(t.isNullAt(t.fieldIndex("format")))
    val bytes = "just some text".getBytes("UTF-8")
    assert(t.getAs[Int]("width") == 16 + ((bytes(0) & 0xff) % 64) * 16)
    assert(t.getAs[Int]("n_frames") == 1 + bytes.length % 30)
  }

  test("decodeMeta is columnar: no RDD hop in the gating stage, null blobs read empty") {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = true)))
    // parallelize (NOT a local relation) so constant folding cannot
    // collapse the plan to LocalTableScan and mask a real RDD hop
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, png1x1), Row(2L, null)), 2), schema)
    val out = Multimodal.decodeMeta(df, "media_id", "blob")
    val plan = out.queryExecution.executedPlan.toString
    // exactly ONE ExistingRDD — the parallelize SOURCE scanning
    // (media_id, blob); the old shape re-materialized through a SECOND
    // ExistingRDD scanning the meta columns (byte_len, width, ...)
    assert("ExistingRDD".r.findAllIn(plan).size == 1,
      s"meta gate must be an expression over the source, not a second RDD hop:\n$plan")
    assert(plan.contains("graft_media_meta") || plan.contains("MediaMeta"),
      s"expression visible in plan:\n$plan")
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[String]("format") == "png")
    // the id contract stays LOUD: a null id raises, never a silent
    // null media_id that downstream joins would drop
    val nullIdSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val badDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null, png1x1)), 1), nullIdSchema)
    intercept[Exception] {
      Multimodal.decodeMeta(badDf, "media_id", "blob").collect()
    }
    // NULL blob ≡ empty media: byte_len 0, stub dims of the empty blob
    val n = rows(2L)
    assert(n.getAs[Long]("byte_len") == 0L && n.isNullAt(n.fieldIndex("format")))
    assert(n.getAs[Int]("width") == 16 && n.getAs[Int]("height") == 16 &&
      n.getAs[Int]("n_frames") == 1)
  }

  test("bmpPixels: 24-bit bottom-up round-trips the fixture arithmetic") {
    val b = MediaFixtures.bmpReal(5, 3, (x, y, c) => MediaFixtures.pixel(9L, x, y, c),
      bpp = 24, topDown = false)
    val r = MediaHeaders.bmpPixels(b).get
    assert(r.width == 5 && r.height == 3)
    for (y <- 0 until 3; x <- 0 until 5; c <- 0 until 3)
      assert((r.rgb((y * 5 + x) * 3 + c) & 0xff) == MediaFixtures.pixel(9L, x, y, c),
        s"($x,$y,$c)")
  }

  test("bmpPixels: 32-bit top-down drops alpha; bottom-up flip is observable") {
    val td = MediaHeaders.bmpPixels(MediaFixtures.bmpReal(4, 2,
      (x, y, c) => MediaFixtures.pixel(3L, x, y, c), bpp = 32, topDown = true)).get
    for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
      assert((td.rgb((y * 4 + x) * 3 + c) & 0xff) == MediaFixtures.pixel(3L, x, y, c))
    // same pixels stored bottom-up decode to the SAME raster
    val bu = MediaHeaders.bmpPixels(MediaFixtures.bmpReal(4, 2,
      (x, y, c) => MediaFixtures.pixel(3L, x, y, c), bpp = 24, topDown = false)).get
    assert(java.util.Arrays.equals(td.rgb, bu.rgb))
  }

  test("bmpPixels: 8-bit palette resolves BGRA quads to RGB") {
    val b = MediaFixtures.bmpReal(3, 2, (_, _, _) => 0, bpp = 8,
      topDown = false, idx = (x, y) => (x * 7 + y * 13 + 5) % 256)
    val r = MediaHeaders.bmpPixels(b).get
    for (y <- 0 until 2; x <- 0 until 3) {
      val i = (x * 7 + y * 13 + 5) % 256
      val o = (y * 3 + x) * 3
      assert((r.rgb(o) & 0xff) == i)
      assert((r.rgb(o + 1) & 0xff) == (2 * i) % 256)
      assert((r.rgb(o + 2) & 0xff) == (3 * i) % 256)
    }
  }

  test("bmpPixels: rejections — RLE, core header, truncation, huge dims") {
    val ok = MediaFixtures.bmpReal(4, 4, (x, y, c) => 1, bpp = 24, topDown = false)
    assert(MediaHeaders.bmpPixels(ok).nonEmpty)
    val rle = ok.clone(); rle(30) = 1 // compression = BI_RLE8
    assert(MediaHeaders.bmpPixels(rle).isEmpty)
    assert(MediaHeaders.bmpPixels(java.util.Arrays.copyOfRange(ok, 0, 60)).isEmpty)
    val huge = ok.clone()
    huge(18) = -1; huge(19) = -1; huge(20) = -1; huge(21) = 0x7f // width ~2^31
    assert(MediaHeaders.bmpPixels(huge).isEmpty)
    assert(MediaHeaders.bmpPixels(null).isEmpty)
    assert(MediaHeaders.bmpPixels("BMnope".getBytes).isEmpty)
  }

  test("tiffPixels: RGB round-trips in both byte orders, any strip split") {
    for (le <- Seq(true, false); rps <- Seq(1, 3, 16)) {
      val b = MediaFixtures.tiffReal(5, 4, (x, y, c) => MediaFixtures.pixel(11L, x, y, c),
        rgb = true, littleEndian = le, lzw = false, predictor2 = false,
        rowsPerStrip = rps)
      val r = MediaHeaders.tiffPixels(b).get
      assert(r.width == 5 && r.height == 4)
      for (y <- 0 until 4; x <- 0 until 5; c <- 0 until 3)
        assert((r.rgb((y * 5 + x) * 3 + c) & 0xff) == MediaFixtures.pixel(11L, x, y, c),
          s"le=$le rps=$rps ($x,$y,$c)")
    }
  }

  test("tiffPixels: LZW strips with the horizontal predictor invert exactly") {
    val b = MediaFixtures.tiffReal(7, 5, (x, y, c) => MediaFixtures.pixel(4L, x, y, c),
      rgb = true, littleEndian = true, lzw = true, predictor2 = true,
      rowsPerStrip = 2)
    val r = MediaHeaders.tiffPixels(b).get
    for (y <- 0 until 5; x <- 0 until 7; c <- 0 until 3)
      assert((r.rgb((y * 7 + x) * 3 + c) & 0xff) == MediaFixtures.pixel(4L, x, y, c))
  }

  test("tiffPixels: grayscale replicates; WhiteIsZero inverts") {
    val black = MediaHeaders.tiffPixels(MediaFixtures.tiffReal(4, 3,
      (x, y, _) => MediaFixtures.pixel(6L, x, y, 0), rgb = false,
      littleEndian = false, lzw = false, predictor2 = false,
      rowsPerStrip = 3)).get
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3)
      assert((black.rgb((y * 4 + x) * 3 + c) & 0xff) == MediaFixtures.pixel(6L, x, y, 0))
    val white = MediaHeaders.tiffPixels(MediaFixtures.tiffReal(4, 3,
      (x, y, _) => MediaFixtures.pixel(6L, x, y, 0), rgb = false,
      littleEndian = true, lzw = true, predictor2 = true,
      rowsPerStrip = 2, whiteIsZero = true)).get
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3)
      assert((white.rgb((y * 4 + x) * 3 + c) & 0xff) ==
        255 - MediaFixtures.pixel(6L, x, y, 0))
  }

  test("tiffPixels: rejections — tiles, bad depth, short strip, truncation") {
    val ok = MediaFixtures.tiffReal(4, 4, (_, _, _) => 7, rgb = true,
      littleEndian = true, lzw = false, predictor2 = false, rowsPerStrip = 4)
    assert(MediaHeaders.tiffPixels(ok).nonEmpty)
    assert(MediaHeaders.tiffPixels(java.util.Arrays.copyOfRange(ok, 0, 20)).isEmpty)
    assert(MediaHeaders.tiffPixels(null).isEmpty)
    assert(MediaHeaders.tiffPixels("II*junkjunk".getBytes).isEmpty)
  }

  // ── WebP: all three first-chunk forms over hand-assembled RIFF bytes ──

  private def webpLe16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def webpLe32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def webpRiff(fourcc: String, payload: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ webpLe32(4 + 8 + payload.length) ++
      "WEBP".getBytes ++ fourcc.getBytes ++ webpLe32(payload.length) ++ payload

  private def webpVp8(w: Int, h: Int, keyframe: Boolean = true,
                      sync: Array[Byte] = Array(0x9D.toByte, 0x01, 0x2A)): Array[Byte] =
    webpRiff("VP8 ", Array[Byte]((if (keyframe) 0 else 1).toByte, 0, 0) ++ sync ++
      webpLe16(w) ++ webpLe16(h) ++ Array[Byte](7, 7))

  private def webpVp8l(w: Int, h: Int, alpha: Boolean, sig: Int = 0x2F): Array[Byte] = {
    val bits = (w - 1) | ((h - 1) << 14) | ((if (alpha) 1 else 0) << 28)
    webpRiff("VP8L", Array[Byte](sig.toByte) ++ webpLe32(bits) ++ Array[Byte](3))
  }

  private def webpVp8x(w: Int, h: Int, alpha: Boolean, anim: Boolean): Array[Byte] = {
    val flags = (if (anim) 0x02 else 0) | (if (alpha) 0x10 else 0)
    webpRiff("VP8X", Array[Byte](flags.toByte, 0, 0, 0) ++
      Array(((w - 1) & 0xFF).toByte, (((w - 1) >> 8) & 0xFF).toByte, (((w - 1) >> 16) & 0xFF).toByte) ++
      Array(((h - 1) & 0xFF).toByte, (((h - 1) >> 8) & 0xFF).toByte, (((h - 1) >> 16) & 0xFF).toByte))
  }

  test("webp: VP8 lossy keyframe dims behind the sync code; 14-bit mask live") {
    val m = MediaHeaders.parse(webpVp8(320, 240)).get
    assert(m.format == "webp" && m.width.contains(320) && m.height.contains(240))
    assert(m.nFrames.contains(1) && m.channels.contains(3) && m.bitDepth.contains(8))
    // the upper 2 bits of each 16-bit field are scaling hints, not size
    val scaled = MediaHeaders.parse(webpVp8(320 | 0x4000, 240 | 0x8000)).get
    assert(scaled.width.contains(320) && scaled.height.contains(240))
  }

  test("webp: VP8L packed dims-minus-1; alpha bit drives channels") {
    val m = MediaHeaders.parse(webpVp8l(16384, 4000, alpha = false)).get
    assert(m.width.contains(16384) && m.height.contains(4000) && m.channels.contains(3))
    val a = MediaHeaders.parse(webpVp8l(1, 1, alpha = true)).get
    assert(a.width.contains(1) && a.height.contains(1) && a.channels.contains(4))
  }

  test("webp: VP8X 24-bit dims; ANIMATION makes n_frames observably unknown") {
    val still = MediaHeaders.parse(webpVp8x(70000, 5, alpha = true, anim = false)).get
    assert(still.width.contains(70000) && still.height.contains(5))
    assert(still.nFrames.contains(1) && still.channels.contains(4))
    val anim = MediaHeaders.parse(webpVp8x(2, 3, alpha = false, anim = true)).get
    assert(anim.nFrames.isEmpty && anim.channels.contains(3))
  }

  // ── MP3 / FLAC / OGG / MP4 container metadata ──

  test("mp3: Xing frame count beats the CBR estimate; ID3v2 skip and ID3v1 subtraction live") {
    // MPEG1 L3 stereo 128k@44100, 50 frames, Xing
    val x = MediaHeaders.parse(MediaFixtures.mp3(mpeg1 = true, brIdx = 9, srIdx = 0,
      mono = false, nFrames = 50, xing = true)).get
    assert(x.format == "mp3" && x.channels.contains(2) && x.sampleRate.contains(44100))
    assert(x.nFrames.contains(50) && x.durationMs.contains(50L * 1152 * 1000 / 44100))
    // CBR mono 64k@32000 behind an ID3v2 pad: frameLen 288, exact division
    val c = MediaHeaders.parse(MediaFixtures.mp3(mpeg1 = true, brIdx = 5, srIdx = 2,
      mono = true, nFrames = 40, xing = false, id3v2Pad = 100)).get
    assert(c.channels.contains(1) && c.sampleRate.contains(32000))
    assert(c.nFrames.contains(40) && c.durationMs.contains(40L * 36))
    // MPEG2 L3 with a trailing ID3v1: the 128-byte tag never counts as audio
    val two = MediaHeaders.parse(MediaFixtures.mp3(mpeg1 = false, brIdx = 8, srIdx = 0,
      mono = false, nFrames = 30, xing = false, id3v1 = true)).get
    assert(two.sampleRate.contains(22050) && two.durationMs.contains(30L * 26))
    assert(two.nFrames.contains(30))
  }

  test("mp3: rejections — free bitrate, reserved rate/version, corrupt synchsafe, short") {
    val ok = MediaFixtures.mp3(mpeg1 = true, brIdx = 9, srIdx = 0, mono = false,
      nFrames = 3, xing = false)
    assert(MediaHeaders.parse(ok).nonEmpty)
    val freeBr = ok.clone(); freeBr(2) = (freeBr(2) & 0x0F).toByte // bitrate idx 0
    assert(MediaHeaders.parse(freeBr).isEmpty)
    val badSr = ok.clone(); badSr(2) = (badSr(2) | 0x0C).toByte // samplerate idx 3
    assert(MediaHeaders.parse(badSr).isEmpty)
    val badVer = ok.clone(); badVer(1) = 0xEB.toByte // version bits 01 reserved
    assert(MediaHeaders.parse(badVer).isEmpty)
    val id3 = MediaFixtures.mp3(mpeg1 = true, brIdx = 9, srIdx = 0, mono = false,
      nFrames = 3, xing = false, id3v2Pad = 30)
    val badSynch = id3.clone(); badSynch(6) = 0x80.toByte
    assert(MediaHeaders.parse(badSynch).isEmpty)
    assert(MediaHeaders.parse(id3.take(9)).isEmpty)
  }

  test("flac: packed STREAMINFO bitfields; zero total samples is observably unknown") {
    val m = MediaHeaders.parse(MediaFixtures.flac(44100, 2, 16, 123456L)).get
    assert(m.format == "flac" && m.sampleRate.contains(44100) && m.channels.contains(2))
    assert(m.bitDepth.contains(16) && m.nFrames.contains(123456))
    assert(m.durationMs.contains(123456L * 1000 / 44100))
    val odd = MediaHeaders.parse(MediaFixtures.flac(96000, 8, 24, 1L)).get
    assert(odd.channels.contains(8) && odd.bitDepth.contains(24) && odd.durationMs.contains(0L))
    val live = MediaHeaders.parse(MediaFixtures.flac(48000, 1, 16, 0L)).get
    assert(live.nFrames.isEmpty && live.durationMs.isEmpty)
    assert(MediaHeaders.parse(MediaFixtures.flac(44100, 2, 16, 9L).take(20)).isEmpty)
  }

  test("ogg: identification packet + page walk to the last granule, not a byte search") {
    val m = MediaHeaders.parse(MediaFixtures.oggVorbis(48000, 2, 96000L, 3)).get
    assert(m.format == "ogg" && m.sampleRate.contains(48000) && m.channels.contains(2))
    assert(m.nFrames.contains(96000) && m.durationMs.contains(2000L))
    // one data page; payload bytes may contain 'OggS' yet never derail the walk
    val one = MediaHeaders.parse(MediaFixtures.oggVorbis(8000, 1, 4000L, 1)).get
    assert(one.durationMs.contains(500L))
    val noVorbis = MediaFixtures.oggVorbis(8000, 1, 100L, 1).clone()
    noVorbis(28 + 1) = 'x'.toByte // break the 'vorbis' word in the id packet
    assert(MediaHeaders.parse(noVorbis).isEmpty)
    assert(MediaHeaders.parse(MediaFixtures.oggVorbis(8000, 1, 100L, 1).take(27)).isEmpty)
  }

  test("mp4: mvhd/tkhd in both versions; v1 keeps 64-bit durations exact") {
    val v0 = MediaHeaders.parse(MediaFixtures.mp4(600, 1234, 640, 360, version = 0)).get
    assert(v0.format == "mp4" && v0.width.contains(640) && v0.height.contains(360))
    assert(v0.durationMs.contains(1234L * 1000 / 600))
    val big = (1L << 32) + 90000L * 7 + 3
    val v1 = MediaHeaders.parse(MediaFixtures.mp4(90000, big, 1920, 1080, version = 1)).get
    assert(v1.width.contains(1920) && v1.height.contains(1080))
    assert(v1.durationMs.contains(big * 1000 / 90000))
    assert(MediaHeaders.parse(MediaFixtures.mp4(600, 5, 1, 1, 0).take(30)).isEmpty)
  }

  test("webp: rejections — interframe, bad sync, bad VP8L sig, unknown chunk, truncation") {
    assert(MediaHeaders.parse(webpVp8(4, 4, keyframe = false)).isEmpty)
    assert(MediaHeaders.parse(webpVp8(4, 4, sync = Array(0x9D.toByte, 0x01, 0x2B))).isEmpty)
    assert(MediaHeaders.parse(webpVp8l(4, 4, alpha = false, sig = 0x30)).isEmpty)
    assert(MediaHeaders.parse(webpRiff("ALPH", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18))).isEmpty)
    assert(MediaHeaders.parse(webpVp8(4, 4).take(25)).isEmpty)
    assert(MediaHeaders.parse(webpVp8x(4, 4, alpha = false, anim = false).take(29)).isEmpty)
  }
}
