package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Pins the progressive-JPEG codec pair: [[MediaFixtures.jpegProgressive]]
  * (SOF2 with spectral selection, successive approximation, EOB runs and
  * G.1.2.3 refinement correction bits) against
  * [[MediaHeaders.jpegPixels]]'s multi-scan coefficient accumulator.
  *
  * The load-bearing invariant: progressive transmission is a LOSSLESS
  * reordering of the same quantized coefficients, so a progressive blob
  * must decode BYTE-IDENTICALLY to its baseline twin through our own
  * decoder — any error in point transforms, EOB-run accounting,
  * correction bits, band bookkeeping or scan geometry breaks equality
  * on the first divergent coefficient. ImageIO (the JDK's independent
  * progressive decoder) cross-checks within the standard's ±1 IDCT
  * variance, and exactly on DC-only closed forms.
  */
class JpegProgressiveSpec extends AnyFunSuite {

  private def q(dc: Int, ac: Int = 16): Array[Int] =
    Array.tabulate(64)(i => if (i == 0) dc else ac)

  private def clamp(v: Int): Int = math.max(0, math.min(255, v))

  private def imageIo(blob: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null, "ImageIO refused the progressive stream")
    img
  }

  /** decode both encodings of the same coefficients and require byte
    * equality; returns the decoded progressive raster */
  private def twins(w: Int, h: Int, qs: Seq[Array[Int]],
                    coefOf: (Int, Int, Int) => Array[Int],
                    restartEvery: Int = 0,
                    sampling: Seq[(Int, Int)] = Nil,
                    dcAl: Int = 1, acAl: Int = 1,
                    bands: Seq[(Int, Int)] = Seq((1, 5), (6, 63)))
  : MediaHeaders.JpegRaster = {
    val base = MediaFixtures.jpegReal(w, h, qs, coefOf,
      restartEvery = restartEvery, sampling = sampling)
    val prog = MediaFixtures.jpegProgressive(w, h, qs, coefOf,
      restartEvery = restartEvery, sampling = sampling,
      dcAl = dcAl, acAl = acAl, bands = bands)
    val pb = MediaHeaders.jpegPixels(base).getOrElse(fail("baseline decode failed"))
    val pp = MediaHeaders.jpegPixels(prog).getOrElse(fail("progressive decode failed"))
    assert(pp.width == pb.width && pp.height == pb.height && pp.channels == pb.channels)
    assert(java.util.Arrays.equals(pp.pixels, pb.pixels),
      "progressive decode diverged from the baseline twin")
    pp
  }

  test("DC-only grayscale: closed form exact, ImageIO exact, baseline twin identical") {
    def dcOf(bx: Int, by: Int): Int = ((bx * 7 + by * 13 + 3) % 256) - 128
    val w = 20; val h = 11; val qdc = 5
    def coef(c: Int, bx: Int, by: Int): Array[Int] =
      Array.tabulate(64)(i => if (i == 0) dcOf(bx, by) else 0)
    val p = twins(w, h, Seq(q(qdc)), coef, dcAl = 2, acAl = 1)
    val prog = MediaFixtures.jpegProgressive(w, h, Seq(q(qdc)), coef, dcAl = 2)
    val meta = MediaHeaders.parse(prog).get
    assert(meta.format == "jpeg" && meta.width.contains(w) && meta.height.contains(h))
    val img = imageIo(prog)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = clamp(((dcOf(x / 8, y / 8) * qdc + 4) >> 3) + 128)
      assert((p.pixels(y * w + x) & 0xff) == expect, s"($x,$y)")
      assert(img.getRaster.getSample(x, y, 0) == expect, s"ImageIO ($x,$y)")
    }
  }

  test("general AC blocks across both bands: baseline twin identical, ImageIO within ±1") {
    def coef(c: Int, bx: Int, by: Int): Array[Int] = Array.tabulate(64) { i =>
      if (i == 0) ((bx * 11 + by * 5) % 200) - 100
      else if (i < 24) (((bx + by + i) * 37) % 15) - 7
      else if (i % 13 == 0) (((bx * 3 + by + i) * 17) % 9) - 4 // sparse high band
      else 0
    }
    val w = 37; val h = 29
    val p = twins(w, h, Seq(q(2, 4)), coef)
    val prog = MediaFixtures.jpegProgressive(w, h, Seq(q(2, 4)), coef)
    val img = imageIo(prog)
    var maxd = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(img.getRaster.getSample(x, y, 0) - (p.pixels(y * w + x) & 0xff))
      if (d > maxd) maxd = d
    }
    assert(maxd <= 1, s"IDCT divergence beyond the standard's tolerance: $maxd")
  }

  test("multi-level successive approximation (dcAl=3, acAl=2) stays lossless") {
    def coef(c: Int, bx: Int, by: Int): Array[Int] = Array.tabulate(64) { i =>
      if (i == 0) ((bx * 19 + by * 7 + 11) % 256) - 128
      else if (i < 15) (((bx * 2 + by * 3 + i) * 29) % 23) - 11
      else 0
    }
    twins(26, 18, Seq(q(3, 6)), coef, dcAl = 3, acAl = 2,
      bands = Seq((1, 2), (3, 14), (15, 63)))
  }

  test("4:2:0 color: interleaved DC scan + per-component AC scans match the baseline twin") {
    def coef(c: Int, bx: Int, by: Int): Array[Int] = Array.tabulate(64) { i =>
      if (i == 0) ((bx * 7 + by * 13 + c * 29 + 3) % 200) - 100
      else if (i < 10) (((bx + by * 2 + c + i) * 31) % 13) - 6
      else 0
    }
    val w = 21; val h = 19
    val qs = Seq(q(5), q(8), q(8))
    val p = twins(w, h, qs, coef, sampling = Seq((2, 2), (1, 1), (1, 1)))
    assert(p.channels == 3)
    val prog = MediaFixtures.jpegProgressive(w, h, qs, coef,
      sampling = Seq((2, 2), (1, 1), (1, 1)))
    imageIo(prog) // the JDK's progressive decoder accepts the stream
  }

  test("restart markers inside progressive scans: predictors and EOB runs reset per segment") {
    def coef(c: Int, bx: Int, by: Int): Array[Int] = Array.tabulate(64) { i =>
      if (i == 0) ((bx * 7 + by * 13 + 3) % 256) - 128
      else if (i == 5 && (bx + by) % 3 == 0) 4
      else 0
    }
    twins(40, 16, Seq(q(5)), coef, restartEvery = 3)
  }

  test("untransmitted spectral bands decode as zero coefficients") {
    def full(c: Int, bx: Int, by: Int): Array[Int] = Array.tabulate(64) { i =>
      if (i == 0) ((bx * 11 + by * 5) % 200) - 100
      else (((bx + by + i) * 37) % 15) - 7
    }
    // progressive sends only k ∈ [1,20]; baseline twin zeroes the rest
    def truncated(c: Int, bx: Int, by: Int): Array[Int] = {
      val zz = full(c, bx, by)
      Array.tabulate(64)(i => if (i <= 20) zz(i) else 0)
    }
    val w = 24; val h = 16
    val base = MediaFixtures.jpegReal(w, h, Seq(q(2, 4)), truncated)
    val prog = MediaFixtures.jpegProgressive(w, h, Seq(q(2, 4)), full,
      bands = Seq((1, 20)))
    val pb = MediaHeaders.jpegPixels(base).get
    val pp = MediaHeaders.jpegPixels(prog).get
    assert(java.util.Arrays.equals(pp.pixels, pb.pixels))
  }

  test("EOB-run + correction-bit stress: long runs of AC-empty blocks with sparse refinements") {
    // most blocks are DC-only (EOBn symbols with real extension bits);
    // every 7th block carries coefficients that become significant only
    // at the refinement level (mag 1 at Al=0), driving the buffered
    // correction-bit path through ZRL and EOBn emissions
    def coef(c: Int, bx: Int, by: Int): Array[Int] = Array.tabulate(64) { i =>
      val blk = bx + by * 97
      if (i == 0) (blk * 13 % 200) - 100
      else if (blk % 7 == 0 && i == 50) 1 // newly significant at the last bit
      else if (blk % 7 == 0 && i == 3) 9 // significant early, gets correction bits
      else 0
    }
    twins(96, 40, Seq(q(3, 8)), coef, acAl = 1, bands = Seq((1, 63)))
  }

  test("malformed progressive streams return None and never throw") {
    def coef(c: Int, bx: Int, by: Int): Array[Int] =
      Array.tabulate(64)(i => if (i == 0) bx + by else if (i == 4) 3 else 0)
    val good = MediaFixtures.jpegProgressive(24, 24, Seq(q(5)), coef)
    assert(MediaHeaders.jpegPixels(good).isDefined)
    // truncations at every length decode or fail cleanly — truncating
    // before EOI must not produce a raster (scans may be incomplete)
    (0 until good.length by 5).foreach { n =>
      MediaHeaders.jpegPixels(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    // bit flips anywhere decode or fail cleanly
    val rnd = new scala.util.Random(11)
    (0 until 800).foreach { _ =>
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      MediaHeaders.jpegPixels(mut) // must not throw
    }
    // SOF2 with the scans stripped (EOI right after DHT) → None
    val sosAt = (2 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val headOnly = java.util.Arrays.copyOf(good, sosAt + 2)
    headOnly(sosAt) = 0xff.toByte; headOnly(sosAt + 1) = 0xd9.toByte
    assert(MediaHeaders.jpegPixels(headOnly).isEmpty)
  }
}
