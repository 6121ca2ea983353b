package graft.operators

import graft.SparkSpec
import graft.codec.{MediaFixtures, MediaHeaders}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the media TRANSCODE operators: the written containers must
  * decode (engine decoder AND an independent reference computation)
  * to exactly the transform the operator claims, and undecodable
  * blobs must drop instead of producing rows. */
class TranscodeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = true)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  test("transcodePng: PNG and JPEG sources emit real PNGs holding the resized pixels") {
    val w = 20; val h = 14
    def pix(x: Int, y: Int, c: Int): Int = (x * 7 + y * 13 + c * 29 + 5) % 256
    val png = MediaFixtures.pngReal(w, h, pix, filterOf = y => y % 5)
    def dc(bx: Int, by: Int): Int = (bx * 9 + by * 17) % 200 - 100
    val qt = Array.tabulate(64)(i => if (i == 0) 6 else 16)
    val jpeg = MediaFixtures.jpegReal(w, h, Seq(qt),
      (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(bx, by) else 0))
    val out = Multimodal.transcodePng(
      df(Seq(Row(1L, png), Row(2L, jpeg), Row(3L, "not media".getBytes))),
      "media_id", "blob", maxW = 8, maxH = 6)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L), "garbage row must drop")
    for ((id, srcPix) <- Seq(
      1L -> ((x: Int, y: Int, c: Int) => pix(x, y, c)),
      2L -> ((x: Int, y: Int, c: Int) =>
        math.max(0, math.min(255, ((dc(x / 8, y / 8) * 6 + 4) >> 3) + 128))))) {
      val r = out(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      val ow = r.getInt(3); val oh = r.getInt(4)
      assert(ow == 8 && oh == 5) // 20x14 into 8x6: w-bound, oh = 14*8/20
      val p = MediaHeaders.pngPixels(r.getAs[Array[Byte]](5))
        .getOrElse(fail(s"written PNG undecodable for $id"))
      assert(p.width == ow && p.height == oh)
      for (oy <- 0 until oh; ox <- 0 until ow; c <- 0 until 3) {
        val expect = srcPix(ox * w / ow, oy * h / oh, c)
        assert((p.rgb((oy * ow + ox) * 3 + c) & 0xff) == expect, s"id=$id ($ox,$oy,$c)")
      }
    }
  }

  test("augmentPng: every variant is the exact index permutation, written as decodable PNG") {
    val w = 7; val h = 4 // asymmetric + odd dims exercise the crop floors
    def pix(x: Int, y: Int, c: Int): Int = (x * 41 + y * 17 + c * 5 + 9) % 256
    val png = MediaFixtures.pngReal(w, h, pix, filterOf = y => (y + 2) % 5)
    val out = Multimodal.augmentPng(df(Seq(Row(5L, png), Row(6L, "junk".getBytes))),
      "media_id", "blob")
      .collect().map(r => r.getString(1) -> r).toMap
    assert(out.keySet == Set("orig", "hflip", "vflip", "rot90", "crop"))
    val expect: Map[String, (Int, Int, (Int, Int, Int) => Int)] = Map(
      "orig" -> ((w, h, pix)),
      "hflip" -> ((w, h, (x, y, c) => pix(w - 1 - x, y, c))),
      "vflip" -> ((w, h, (x, y, c) => pix(x, h - 1 - y, c))),
      "rot90" -> ((h, w, (x, y, c) => pix(y, h - 1 - x, c))),
      "crop" -> (((w + 1) / 2, (h + 1) / 2, (x, y, c) => pix(w / 4 + x, h / 4 + y, c))))
    expect.foreach { case (variant, (ow, oh, f)) =>
      val r = out(variant)
      assert(r.getInt(2) == ow && r.getInt(3) == oh, variant)
      val p = MediaHeaders.pngPixels(r.getAs[Array[Byte]](4))
        .getOrElse(fail(s"$variant PNG undecodable"))
      assert(p.width == ow && p.height == oh)
      for (y <- 0 until oh; x <- 0 until ow; c <- 0 until 3)
        assert((p.rgb((y * ow + x) * 3 + c) & 0xff) == f(x, y, c), s"$variant ($x,$y,$c)")
    }
  }

  test("exifAutoOrient: all 8 orientations, both endiannesses, full parse+fix chain") {
    for (o <- 1 to 8; le <- Seq(true, false)) {
      // gray DC-only JPEG (block-constant closed form), spliced EXIF
      val q0 = 7
      def dc(bx: Int, by: Int): Int = (bx * 11 + by * 23) % 200 - 100
      def v(bx: Int, by: Int): Int =
        math.max(0, math.min(255, ((dc(bx, by) * q0 + 4) >> 3) + 128))
      val jw = 20; val jh = 12
      val jpeg = MediaFixtures.jpegWithExif(
        MediaFixtures.jpegReal(jw, jh,
          Seq(Array.tabulate(64)(i => if (i == 0) q0 else 16)),
          (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(bx, by) else 0)),
        orientation = o, littleEndian = le)
      assert(MediaHeaders.exifOrientation(jpeg).contains(o), s"parse o=$o le=$le")
      val out = Multimodal.exifAutoOrient(df(Seq(Row(1L, jpeg))), "media_id", "blob")
        .collect()
      assert(out.length == 1 && out(0).getInt(1) == o)
      val swap = o >= 5
      val ow = if (swap) jh else jw
      val oh = if (swap) jw else jh
      assert(out(0).getInt(2) == ow && out(0).getInt(3) == oh, s"dims o=$o")
      val p = MediaHeaders.pngPixels(out(0).getAs[Array[Byte]](4)).get
      // reference: apply the documented display-fix mapping directly
      for (oy <- 0 until oh; ox <- 0 until ow) {
        val (sx, sy) = o match {
          case 2 => (jw - 1 - ox, oy)
          case 3 => (jw - 1 - ox, jh - 1 - oy)
          case 4 => (ox, jh - 1 - oy)
          case 5 => (oy, ox)
          case 6 => (oy, jh - 1 - ox)
          case 7 => (jw - 1 - oy, jh - 1 - ox)
          case 8 => (jw - 1 - oy, ox)
          case _ => (ox, oy)
        }
        val expect = v(sx / 8, sy / 8)
        assert((p.rgb((oy * ow + ox) * 3) & 0xff) == expect, s"o=$o le=$le ($ox,$oy)")
      }
    }
    // no APP1 → orientation defaults to 1 (identity)
    val plain = MediaFixtures.jpegReal(9, 5, Seq(Array.tabulate(64)(i => if (i == 0) 5 else 16)),
      (_, bx, by) => Array.tabulate(64)(i => if (i == 0) bx + by else 0))
    assert(MediaHeaders.exifOrientation(plain).isEmpty)
    val r = Multimodal.exifAutoOrient(df(Seq(Row(2L, plain))), "media_id", "blob").collect()
    assert(r.length == 1 && r(0).getInt(1) == 1 && r(0).getInt(2) == 9)
  }

  test("spectralFeatures: DC closed form exact, a pure tone lands in its bin, frames drop tails") {
    // frame 0 = the Q10 cosine table itself at k=2 (a pure bin-2 tone),
    // frame 1 = constant 100 (pure DC); 5 tail samples must drop
    def s(i: Int, c: Int): Int =
      if (i < 16) Multimodal.Dft16CosQ10((2 * i) & 15).toInt
      else if (i < 32) 100
      else 7777
    val wav = MediaFixtures.wav(1, 8000, 37, s)
    val rows = Multimodal.spectralFeatures(
      df(Seq(Row(9L, wav))), "media_id", "blob")
      .collect().map(r => r.getInt(2) -> r).toMap
    assert(rows.size == 9 && rows.values.forall(_.getLong(3) == 2L), "37 samples = 2 frames")
    // DC: power = ((Σs)·1024)² >> 20 = (Σs)² exactly, per frame
    val sum0 = (0 until 16).map(i => s(i, 0)).sum.toLong
    val sum1 = 16L * 100
    assert(rows(0).getLong(4) == sum0 * sum0 + sum1 * sum1, "DC closed form")
    // the tone frame dominates bin 2: power(2) > 4x any other non-DC bin
    val byBin = (1 to 8).map(k => k -> rows(k).getLong(4)).toMap
    assert((1 to 8).filter(_ != 2).forall(k => byBin(2) > 4 * byBin(k)),
      s"tone must concentrate in bin 2: $byBin")
    // independent double-precision DFT agrees within quantization error
    for (k <- 0 to 8) {
      var exact = 0.0
      for (f <- 0 until 2) {
        var re = 0.0; var im = 0.0
        for (i <- 0 until 16) {
          val ang = 2 * math.Pi * i * k / 16
          re += s(f * 16 + i, 0) * math.cos(ang)
          im -= s(f * 16 + i, 0) * math.sin(ang)
        }
        exact += re * re + im * im
      }
      val got = rows(k).getLong(4).toDouble
      assert(math.abs(got - exact) <= 0.02 * exact + 2000, s"bin $k: $got vs $exact")
    }
  }

  test("transcodeWav: the rewritten file carries the resampled stream at the new rate") {
    val rate = 8000; val n = 20; val ch = 2; val target = 16000
    def s(k: Int, c: Int): Int = k * 1000 - 9000 + c * 3
    val wav = MediaFixtures.wav(ch, rate, n, s)
    val out = Multimodal.transcodeWav(
      df(Seq(Row(7L, wav), Row(8L, "noise".getBytes))),
      "media_id", "blob", targetRate = target).collect()
    assert(out.length == 1 && out(0).getLong(0) == 7L)
    assert(out(0).getInt(1) == rate && out(0).getLong(2) == n.toLong)
    val p = MediaHeaders.wavPcm16(out(0).getAs[Array[Byte]](3)).get
    assert(p.sampleRate == target && p.channels == ch)
    val frames = p.samples.length / ch
    assert(frames == n * target / rate)
    // independent reference: the resamplePcm interpolation formula
    for (j <- 0 until frames; c <- 0 until ch) {
      val posNum = j.toLong * rate
      val k = (posNum / target).toInt
      val k1 = math.min(k + 1, n - 1)
      val frac = (posNum % target).toInt
      val expect = s(k, c) + (((s(k1, c) - s(k, c)).toLong * frac) / target).toInt
      assert(p.samples(j * ch + c) == expect.toShort, s"($j,$c)")
    }
  }
}
