package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure-JVM baseline JPEG codec pair: [[MediaFixtures.jpegReal]]
  * (a complete DQT/SOF0/DHT/SOS encoder over quantized coefficient
  * blocks) against [[MediaHeaders.jpegPixels]] (Huffman + dequant +
  * fixed-point Loeffler IDCT), and BOTH against the JDK's own
  * independent baseline decoder (`javax.imageio`) — the same
  * two-implementations discipline the GIF LZW decoder gets from the
  * textbook compressor.
  *
  * The contract tiers:
  *  - DC-only blocks decode to EXACTLY `clamp(((dc·q + 4) >> 3) + 128)`
  *    — the closed form the DuckDB oracle replays (any IDCT that is
  *    correct on constant blocks must produce it, and ImageIO agrees
  *    byte-for-byte).
  *  - General AC blocks: the JPEG standard allows ±1 per-sample IDCT
  *    variance between conformant implementations, so the ImageIO
  *    cross-check pins |delta| ≤ 1; determinism of OUR decoder is
  *    pinned exactly by a golden fingerprint.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def q(dc: Int, ac: Int = 16): Array[Int] =
    Array.tabulate(64)(i => if (i == 0) dc else ac)

  private def clamp(v: Int): Int = math.max(0, math.min(255, v))

  private def imageIoGray(blob: Array[Byte]): Option[java.awt.image.BufferedImage] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))

  test("DC-only grayscale decodes to the closed-form value; ImageIO agrees exactly") {
    def dcOf(bx: Int, by: Int): Int = ((bx * 7 + by * 13 + 3) % 256) - 128
    val w = 20; val h = 11; val qdc = 5
    val blob = MediaFixtures.jpegReal(w, h, Seq(q(qdc)),
      (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dcOf(bx, by) else 0))
    // the header parser still sees a plain baseline JPEG
    val meta = MediaHeaders.parse(blob).get
    assert(meta.format == "jpeg" && meta.width.contains(w) && meta.height.contains(h)
      && meta.channels.contains(1))
    val p = MediaHeaders.jpegPixels(blob).get
    assert(p.width == w && p.height == h && p.channels == 1 && p.pixels.length == w * h)
    val img = imageIoGray(blob).get
    for (y <- 0 until h; x <- 0 until w) {
      val expect = clamp(((dcOf(x / 8, y / 8) * qdc + 4) >> 3) + 128)
      val got = p.pixels(y * w + x) & 0xff
      assert(got == expect, s"($x,$y): got $got expect $expect")
      assert(img.getRaster.getSample(x, y, 0) == expect,
        s"ImageIO disagrees with the closed form at ($x,$y)")
    }
  }

  test("general AC blocks: ImageIO within the standard's ±1 IDCT variance; golden fingerprint exact") {
    def coef(bx: Int, by: Int): Array[Int] = Array.tabulate(64) { i =>
      if (i == 0) ((bx * 11 + by * 5) % 200) - 100
      else if (i < 20) (((bx + by + i) * 37) % 15) - 7
      else 0
    }
    val w = 37; val h = 29
    val blob = MediaFixtures.jpegReal(w, h, Seq(q(2, 4)), (_, bx, by) => coef(bx, by))
    val p = MediaHeaders.jpegPixels(blob).get
    val img = imageIoGray(blob).get
    var maxd = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(img.getRaster.getSample(x, y, 0) - (p.pixels(y * w + x) & 0xff))
      if (d > maxd) maxd = d
    }
    assert(maxd <= 1, s"IDCT divergence beyond the standard's tolerance: $maxd")
    // exact determinism golden for OUR decoder (sum + first/last)
    var sum = 0L
    p.pixels.foreach(b => sum += (b & 0xff))
    assert((sum, p.pixels(0) & 0xff, p.pixels(w * h - 1) & 0xff) ==
      ((117799L, 114, 125)),
      s"golden fingerprint moved: (${sum}, ${p.pixels(0) & 0xff}, ${p.pixels(w * h - 1) & 0xff})")
  }

  test("4:4:4 color: DC-only YCbCr converts through the fixed-point JFIF matrix; ImageIO within ±1") {
    val w = 23; val h = 17
    def dc(c: Int, bx: Int, by: Int): Int = ((bx * 7 + by * 13 + c * 29 + 3) % 200) - 100
    val qs = Seq(q(5), q(8), q(8))
    val blob = MediaFixtures.jpegReal(w, h, qs,
      (c, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(c, bx, by) else 0))
    val p = MediaHeaders.jpegPixels(blob).get
    assert(p.channels == 3 && p.pixels.length == w * h * 3)
    val img = imageIoGray(blob).get
    for (y <- 0 until h; x <- 0 until w) {
      // our exact integer contract, replayable from seed arithmetic
      val yv = clamp(((dc(0, x / 8, y / 8) * 5 + 4) >> 3) + 128)
      val cb = clamp(((dc(1, x / 8, y / 8) * 8 + 4) >> 3) + 128) - 128
      val cr = clamp(((dc(2, x / 8, y / 8) * 8 + 4) >> 3) + 128) - 128
      val er = clamp(yv + ((91881 * cr + 32768) >> 16))
      val eg = clamp(yv + ((-22554 * cb - 46802 * cr + 32768) >> 16))
      val eb = clamp(yv + ((116130 * cb + 32768) >> 16))
      val o = (y * w + x) * 3
      assert((p.pixels(o) & 0xff) == er && (p.pixels(o + 1) & 0xff) == eg
        && (p.pixels(o + 2) & 0xff) == eb, s"color mismatch at ($x,$y)")
      val rgb = img.getRGB(x, y)
      assert(math.abs(((rgb >> 16) & 0xff) - er) <= 1
        && math.abs(((rgb >> 8) & 0xff) - eg) <= 1
        && math.abs((rgb & 0xff) - eb) <= 1,
        s"ImageIO color conversion beyond ±1 at ($x,$y)")
    }
  }

  test("restart markers: DRI/RSTn segmentation resets DC predictors; decode stays exact") {
    def dcOf(bx: Int, by: Int): Int = ((bx * 7 + by * 13 + 3) % 256) - 128
    val w = 40; val h = 16; val qdc = 5
    val blob = MediaFixtures.jpegReal(w, h, Seq(q(qdc)),
      (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dcOf(bx, by) else 0),
      restartEvery = 3)
    val p = MediaHeaders.jpegPixels(blob).get
    val img = imageIoGray(blob).get
    for (y <- 0 until h; x <- 0 until w) {
      val expect = clamp(((dcOf(x / 8, y / 8) * qdc + 4) >> 3) + 128)
      assert((p.pixels(y * w + x) & 0xff) == expect)
      assert(img.getRaster.getSample(x, y, 0) == expect)
    }
  }

  test("4:2:0: four-luma MCU interleave decodes; uniform chroma agrees with ImageIO within ±1") {
    // w, h > 16 → multiple MCUs per axis plus edge cropping
    val w = 21; val h = 19
    def dcY(bx: Int, by: Int): Int = ((bx * 7 + by * 13 + 3) % 200) - 100
    val qs = Seq(q(5), q(8), q(8))
    // uniform chroma: ANY conformant upsampling filter of a constant
    // plane is the constant, so ImageIO must agree byte-for-byte
    val blob = MediaFixtures.jpegReal(w, h, qs,
      (c, bx, by) => Array.tabulate(64)(i =>
        if (i != 0) 0 else if (c == 0) dcY(bx, by) else if (c == 1) 40 else -25),
      sampling = Seq((2, 2), (1, 1), (1, 1)))
    val meta = MediaHeaders.parse(blob).get
    assert(meta.width.contains(w) && meta.height.contains(h) && meta.channels.contains(3))
    val p = MediaHeaders.jpegPixels(blob).get
    assert(p.channels == 3)
    val img = imageIoGray(blob).get
    val cb = clamp(((40 * 8 + 4) >> 3) + 128) - 128
    val cr = clamp(((-25 * 8 + 4) >> 3) + 128) - 128
    for (y <- 0 until h; x <- 0 until w) {
      val yv = clamp(((dcY(x / 8, y / 8) * 5 + 4) >> 3) + 128)
      val er = clamp(yv + ((91881 * cr + 32768) >> 16))
      val eg = clamp(yv + ((-22554 * cb - 46802 * cr + 32768) >> 16))
      val eb = clamp(yv + ((116130 * cb + 32768) >> 16))
      val o = (y * w + x) * 3
      assert((p.pixels(o) & 0xff) == er && (p.pixels(o + 1) & 0xff) == eg
        && (p.pixels(o + 2) & 0xff) == eb, s"closed-form mismatch at ($x,$y)")
      val rgb = img.getRGB(x, y)
      assert(math.abs(((rgb >> 16) & 0xff) - er) <= 1
        && math.abs(((rgb >> 8) & 0xff) - eg) <= 1
        && math.abs((rgb & 0xff) - eb) <= 1, s"ImageIO disagrees at ($x,$y)")
    }
  }

  test("4:2:0 varying chroma: box-replication contract is exact on the 2x2 pixel boxes") {
    val w = 20; val h = 14
    def dc(c: Int, bx: Int, by: Int): Int = ((bx * 7 + by * 13 + c * 29 + 3) % 200) - 100
    val blob = MediaFixtures.jpegReal(w, h, Seq(q(5), q(8), q(8)),
      (c, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(c, bx, by) else 0),
      sampling = Seq((2, 2), (1, 1), (1, 1)))
    val p = MediaHeaders.jpegPixels(blob).get
    for (y <- 0 until h; x <- 0 until w) {
      // chroma block index on the chroma grid: pixel/2 then /8
      val yv = clamp(((dc(0, x / 8, y / 8) * 5 + 4) >> 3) + 128)
      val cb = clamp(((dc(1, x / 16, y / 16) * 8 + 4) >> 3) + 128) - 128
      val cr = clamp(((dc(2, x / 16, y / 16) * 8 + 4) >> 3) + 128) - 128
      val er = clamp(yv + ((91881 * cr + 32768) >> 16))
      val eg = clamp(yv + ((-22554 * cb - 46802 * cr + 32768) >> 16))
      val eb = clamp(yv + ((116130 * cb + 32768) >> 16))
      val o = (y * w + x) * 3
      assert((p.pixels(o) & 0xff) == er && (p.pixels(o + 1) & 0xff) == eg
        && (p.pixels(o + 2) & 0xff) == eb, s"replication contract broken at ($x,$y)")
    }
  }

  test("4:2:2: horizontal-only subsampling replicates chroma across x pairs") {
    val w = 19; val h = 10
    def dc(c: Int, bx: Int, by: Int): Int = ((bx * 11 + by * 3 + c * 17 + 5) % 200) - 100
    val blob = MediaFixtures.jpegReal(w, h, Seq(q(4), q(6), q(6)),
      (c, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(c, bx, by) else 0),
      sampling = Seq((2, 1), (1, 1), (1, 1)))
    val p = MediaHeaders.jpegPixels(blob).get
    for (y <- 0 until h; x <- 0 until w) {
      val yv = clamp(((dc(0, x / 8, y / 8) * 4 + 4) >> 3) + 128)
      val cb = clamp(((dc(1, x / 16, y / 8) * 6 + 4) >> 3) + 128) - 128
      val cr = clamp(((dc(2, x / 16, y / 8) * 6 + 4) >> 3) + 128) - 128
      val er = clamp(yv + ((91881 * cr + 32768) >> 16))
      val o = (y * w + x) * 3
      assert((p.pixels(o) & 0xff) == er, s"4:2:2 mismatch at ($x,$y)")
    }
  }

  test("out-of-scope and malformed streams return None, never throw") {
    val good = MediaFixtures.jpegReal(16, 16, Seq(q(5)),
      (_, bx, by) => Array.tabulate(64)(i => if (i == 0) bx + by else 0))
    assert(MediaHeaders.jpegPixels(good).isDefined)
    // header-only fixture (no SOS) → None
    assert(MediaHeaders.jpegPixels(MediaFixtures.jpeg(32, 24)).isEmpty)
    // progressive SOF2 → None (flip the SOF marker byte)
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(MediaHeaders.jpegPixels(prog).isEmpty)
    // truncations at every length decode or fail cleanly
    (0 until good.length by 7).foreach { n =>
      MediaHeaders.jpegPixels(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    // bit flips in the entropy stream decode or fail cleanly
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = (rnd.nextInt(256)).toByte
      MediaHeaders.jpegPixels(mut) // must not throw
    }
  }
}
