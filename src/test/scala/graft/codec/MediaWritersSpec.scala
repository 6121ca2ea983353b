package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Pins the container ENCODERS ([[MediaWriters]]) three ways: inverse
  * of the engine's own decoders, agreement with the JDK's independent
  * decoders (ImageIO for PNG, javax.sound for WAV — both offline), and
  * standards-level details a round trip alone can miss (CRC validity is
  * what ImageIO checks; byte determinism for WAV). */
class MediaWritersSpec extends AnyFunSuite {

  private def rgbOf(w: Int, h: Int)(f: (Int, Int, Int) => Int): Array[Byte] = {
    val a = new Array[Byte](w * h * 3)
    var i = 0
    while (i < a.length) {
      a(i) = f((i / 3) % w, i / (3 * w), i % 3).toByte
      i += 1
    }
    a
  }

  test("pngRgb is the exact inverse of pngPixels across dims and content") {
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1), (8, 6), (23, 17), (64, 1))) {
      val rgb = rgbOf(w, h)((x, y, c) => (x * 7 + y * 13 + c * 29 + w + h) % 256)
      val blob = MediaWriters.pngRgb(w, h, rgb)
      val p = MediaHeaders.pngPixels(blob).getOrElse(fail(s"decode failed ${w}x$h"))
      assert(p.width == w && p.height == h)
      assert(java.util.Arrays.equals(p.rgb, rgb), s"${w}x$h")
      // the header parser agrees on the metadata
      val meta = MediaHeaders.parse(blob).get
      assert(meta.format == "png" && meta.width.contains(w) && meta.height.contains(h))
    }
  }

  test("ImageIO (independent decoder, CRC-checking) reads pngRgb output byte-exactly") {
    val w = 19; val h = 11
    val rgb = rgbOf(w, h)((x, y, c) => (x * 31 + y * 5 + c * 77 + 3) % 256)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaWriters.pngRgb(w, h, rgb)))
    assert(img != null, "ImageIO refused the written PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val expect = rgb((y * w + x) * 3 + c) & 0xff
      val band = img.getRaster.getSample(x, y, c)
      assert(band == expect, s"($x,$y,$c)")
    }
  }

  test("wavPcm16 is the exact inverse of the WAV parser and is byte-deterministic") {
    for ((ch, rate, n) <- Seq((1, 8000, 1), (2, 44100, 17), (1, 16000, 50))) {
      val samples = Array.tabulate[Short](n * ch)(i => (i * 1543 - 20000).toShort)
      val blob = MediaWriters.wavPcm16(rate, ch, samples)
      assert(java.util.Arrays.equals(blob, MediaWriters.wavPcm16(rate, ch, samples)))
      val p = MediaHeaders.wavPcm16(blob).getOrElse(fail(s"decode failed $ch/$rate/$n"))
      assert(p.channels == ch && p.sampleRate == rate)
      assert(p.samples.sameElements(samples))
      val meta = MediaHeaders.parse(blob).get
      assert(meta.format == "wav" && meta.sampleRate.contains(rate))
    }
  }

  test("javax.sound (independent parser) accepts wavPcm16 output with the right format") {
    val samples = Array.tabulate[Short](24)(i => (i * 999 - 12000).toShort)
    val in = new java.io.ByteArrayInputStream(MediaWriters.wavPcm16(8000, 2, samples))
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(in)
    val fmt = ais.getFormat
    assert(fmt.getChannels == 2 && fmt.getSampleRate == 8000f &&
      fmt.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == 12)
    val data = ais.readAllBytes()
    // little-endian interleaved int16 — byte-for-byte the data chunk
    (0 until 24).foreach { i =>
      val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
      assert(v == samples(i), s"sample $i")
    }
  }

  test("writer validation refuses malformed input") {
    intercept[IllegalArgumentException](MediaWriters.pngRgb(0, 1, Array.emptyByteArray))
    intercept[IllegalArgumentException](MediaWriters.pngRgb(2, 2, new Array[Byte](11)))
    intercept[IllegalArgumentException](MediaWriters.wavPcm16(0, 1, Array.emptyByteArray.map(_.toShort)))
    intercept[IllegalArgumentException](MediaWriters.wavPcm16(8000, 2, new Array[Short](3)))
  }
}
