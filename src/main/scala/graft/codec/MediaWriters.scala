package graft.codec

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Container ENCODERS — the write side of the media path. The decode
  * stack ([[MediaHeaders]]) lets the engine read every container the
  * fixtures build; these writers let it EMIT normalized artifacts
  * (thumbnails, resampled audio) as real standards-conformant files a
  * downstream consumer can open — the read-transform-write loop a
  * 100 TB media pipeline actually runs, with no codec library.
  *
  * Determinism contract: the WAV writer is byte-deterministic (PCM is
  * uncompressed). The PNG writer's IDAT bytes depend on the JVM's zlib
  * build, so oracles pin the DECODED pixels of written files (round
  * trip through [[MediaHeaders.pngPixels]] and independent decoders),
  * never the compressed bytes themselves.
  *
  * Mirrors the container layouts the reference pipeline ships around as
  * opaque blobs; cf. the byte-level codec duties in
  * `conduit-cockroachdb`'s encoding layer (encoding.go:1). */
object MediaWriters {

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Truecolor 8-bit PNG (color type 2, bit depth 8, no interlace):
    * filter-type-0 scanlines deflated into a single IDAT, CRC32-chunked
    * per spec. Readable by [[MediaHeaders.pngPixels]] and any PNG
    * decoder (the spec cross-checks javax.imageio). */
  def pngRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dims: ${w}x$h")
    require(rgb.length == w * h * 3, s"rgb must be w*h*3, got ${rgb.length}")
    val stride = 1 + w * 3
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      // raw(y * stride) = 0: filter type None
      System.arraycopy(rgb, y * w * 3, raw, y * stride + 1, w * 3)
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val idat = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), 0, 8)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length), 0, 4)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(body, 0, body.length)
      val crc = new CRC32()
      crc.update(tb)
      crc.update(body)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Canonical 16-bit PCM WAV: RIFF / fmt (PCM, 16-bit) / data with
    * little-endian interleaved samples — byte-deterministic, the exact
    * layout [[MediaHeaders.wavPcm16]] parses back. */
  def wavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate >= 1 && channels >= 1, s"bad rate/channels: $sampleRate/$channels")
    require(samples.length % channels == 0,
      s"samples (${samples.length}) must interleave $channels channels evenly")
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    out.write(le32(36 + dataLen), 0, 4)
    out.write("WAVE".getBytes("US-ASCII"), 0, 4)
    out.write("fmt ".getBytes("US-ASCII"), 0, 4)
    out.write(le32(16), 0, 4)
    out.write(le16(1), 0, 2) // PCM
    out.write(le16(channels), 0, 2)
    out.write(le32(sampleRate), 0, 4)
    out.write(le32(sampleRate * channels * 2), 0, 4) // byte rate
    out.write(le16(channels * 2), 0, 2) // block align
    out.write(le16(16), 0, 2) // bits per sample
    out.write("data".getBytes("US-ASCII"), 0, 4)
    out.write(le32(dataLen), 0, 4)
    var i = 0
    while (i < samples.length) {
      out.write(samples(i) & 0xff)
      out.write((samples(i) >> 8) & 0xff)
      i += 1
    }
    out.toByteArray
  }
}
