package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Pins the USTAR shard container: exact inverse round trip, byte
  * determinism, padding edge cases at every block boundary, checksum
  * enforcement, and — the independent-decoder check the media codecs
  * all carry — GNU tar itself listing and extracting the archives. */
class TarCodecSpec extends AnyFunSuite {

  private def payload(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + n) % 256).toByte)

  test("write/parse is an exact inverse across block-boundary payload sizes") {
    val members = Seq(0, 1, 511, 512, 513, 1024, 1025).zipWithIndex.map {
      case (n, i) => (f"m$i%012d.bin", payload(n))
    }
    val tar = TarCodec.write(members)
    assert(tar.length % 512 == 0)
    assert(java.util.Arrays.equals(tar, TarCodec.write(members)), "byte determinism")
    val back = TarCodec.parse(tar).getOrElse(fail("parse failed"))
    assert(back.map(_._1) == members.map(_._1))
    back.zip(members).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(TarCodec.parse(TarCodec.write(Nil)).contains(Seq.empty))
  }

  test("GNU tar (independent implementation) lists and extracts the archive") {
    val members = Seq(("alpha.bin", payload(700)), ("beta.bin", payload(13)))
    val dir = java.nio.file.Files.createTempDirectory("graft-tar")
    val f = dir.resolve("shard.tar")
    java.nio.file.Files.write(f, TarCodec.write(members))
    import scala.sys.process._
    val listing = Seq("tar", "-tf", f.toString).!!.trim.split("\n").toSeq
    assert(listing == Seq("alpha.bin", "beta.bin"))
    assert(Seq("tar", "-xf", f.toString, "-C", dir.toString).! == 0)
    members.foreach { case (name, p) =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(dir.resolve(name)), p), name)
    }
    // and the inverse: OUR parser reads GNU tar's own output
    val gnuTar = dir.resolve("gnu.tar")
    assert(Seq("tar", "-cf", gnuTar.toString, "-C", dir.toString,
      "alpha.bin", "beta.bin").! == 0)
    val fromGnu = TarCodec.parse(java.nio.file.Files.readAllBytes(gnuTar))
      .getOrElse(fail("our parser refused GNU tar output"))
    val byName = fromGnu.toMap
    members.foreach { case (name, p) =>
      assert(java.util.Arrays.equals(byName(name), p), s"gnu $name")
    }
  }

  test("malformed archives parse to None, never throw") {
    val good = TarCodec.write(Seq(("a.bin", payload(600))))
    assert(TarCodec.parse(Array.emptyByteArray).isEmpty)
    assert(TarCodec.parse(good.take(512)).isEmpty) // header, no data/terminator
    assert(TarCodec.parse(good.dropRight(512)).isEmpty) // half a terminator
    val badCk = good.clone(); badCk(200) = (badCk(200) ^ 1).toByte
    assert(TarCodec.parse(badCk).isEmpty, "checksum must be enforced")
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      TarCodec.parse(mut) // must not throw
    }
    intercept[IllegalArgumentException](TarCodec.write(Seq(("", payload(1)))))
    intercept[IllegalArgumentException](TarCodec.write(Seq(("x" * 101, payload(1)))))
  }
}
