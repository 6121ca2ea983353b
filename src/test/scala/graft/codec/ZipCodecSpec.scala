package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ZIP shard container: exact inverse round trip, byte
  * determinism, the size arithmetic the SQL oracles replay
  * (30+46+2·nameLen+payload per member, +22 EOCD), CRC enforcement,
  * and — the independent-implementation check every graft codec
  * carries — java.util.zip reading our archives AND our parser reading
  * java.util.zip's DEFLATE output. */
class ZipCodecSpec extends AnyFunSuite {

  private def payload(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 53 + n) % 256).toByte)

  test("write/parse is an exact inverse; bytes deterministic; sizes arithmetic") {
    val members = Seq(0, 1, 100, 4096).zipWithIndex.map {
      case (n, i) => (f"m$i%012d.bin", payload(n))
    }
    val zip = ZipCodec.write(members)
    assert(java.util.Arrays.equals(zip, ZipCodec.write(members)), "byte determinism")
    val expected = members.map { case (nm, p) => 30 + 46 + 2 * nm.length + p.length }.sum + 22
    assert(zip.length == expected, "oracle size arithmetic")
    val back = ZipCodec.parse(zip).getOrElse(fail("parse failed"))
    assert(back.map(_._1) == members.map(_._1))
    back.zip(members).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(ZipCodec.parse(ZipCodec.write(Nil)).contains(Seq.empty))
  }

  test("java.util.zip (independent implementation) reads our archives") {
    val members = Seq(("alpha.bin", payload(700)), ("beta.bin", payload(13)))
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(ZipCodec.write(members)))
    members.foreach { case (name, p) =>
      val e = zis.getNextEntry
      assert(e != null && e.getName == name)
      assert(java.util.Arrays.equals(zis.readAllBytes(), p), name)
    }
    assert(zis.getNextEntry == null)
  }

  test("our parser reads java.util.zip's DEFLATE output (foreign-archive path)") {
    val members = Seq(("a.bin", payload(900)), ("b.bin", "hello zip".getBytes("UTF-8")))
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    members.foreach { case (name, p) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(p); zos.closeEntry()
    }
    zos.close()
    val back = ZipCodec.parse(bos.toByteArray).getOrElse(fail("refused deflate zip"))
    assert(back.map(_._1) == members.map(_._1))
    back.zip(members).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("structural violations and CRC mismatches return None, never throw") {
    val good = ZipCodec.write(Seq(("x.bin", payload(64))))
    assert(ZipCodec.parse(Array[Byte](1, 2, 3)).isEmpty, "no EOCD")
    assert(ZipCodec.parse(good.take(good.length - 5)).isEmpty, "truncated EOCD")
    // flip one payload byte: CRC stored in headers no longer matches
    val corrupt = good.clone(); corrupt(40) = (corrupt(40) ^ 0x1).toByte
    assert(ZipCodec.parse(corrupt).isEmpty, "crc mismatch")
    // unsupported method: patch central directory's method field to 99
    val cdOff = // EOCD cd-offset field lives 6 bytes from the end (comment empty)
      (good(good.length - 6) & 0xff) | ((good(good.length - 5) & 0xff) << 8) |
        ((good(good.length - 4) & 0xff) << 16) | ((good(good.length - 3) & 0xff) << 24)
    val badMethod = good.clone(); badMethod(cdOff + 10) = 99.toByte
    assert(ZipCodec.parse(badMethod).isEmpty, "unsupported method")
    // trailing comment after EOCD: backward scan must still find it
    val withComment = good ++ "a benign archive comment".getBytes("US-ASCII")
    assert(ZipCodec.parse(withComment).isDefined, "comment-tolerant EOCD scan")
  }
}
