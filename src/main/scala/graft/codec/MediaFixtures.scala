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
