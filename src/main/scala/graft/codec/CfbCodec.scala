package graft.codec

import scala.util.control.NonFatal

/** Bounded OLE2 Compound File Binary reader — the container under
  * every legacy Office document (`.doc`, `.xls`, `.ppt`, MSI): a
  * FAT-style filesystem-in-a-file, parsed from scratch against the
  * public [MS-CFB] layout. This is the third container substrate
  * beside [[ZipCodec]] (OPC/OOXML) and [[TarCodec]]:
  *
  *   - 512-byte header: magic D0 CF 11 E0 A1 B1 1A E1, sector shift
  *     (9 → 512-byte sectors for v3, 12 → 4096 for v4), first
  *     directory sector, miniFAT head/count, DIFAT head/count and the
  *     109 in-header DIFAT entries;
  *   - FAT: the sector-chain table, located via DIFAT (header entries
  *     first, then DIFAT sectors whose last slot links the next);
  *   - directory: 128-byte entries (UTF-16LE name, object type,
  *     start sector, stream size) walked LINEARLY over the directory
  *     chain — the red-black sibling tree is writer layout, and a
  *     tolerant reader takes every stream entry it can see;
  *   - streams ≥ 4096 bytes read straight off the FAT chain; smaller
  *     ones live in the MINI stream (the root entry's stream, 64-byte
  *     mini sectors) addressed through the miniFAT.
  *
  * NEVER-THROW doctrine: every chain walk is step-capped by the
  * sector count (cycle guard), every size is bounds-checked, and
  * [[parse]] catches NonFatal at the API edge. Truncated or cyclic
  * containers yield None — a funnel class, never a crash. */
object CfbCodec {

  final case class CfbFile(streams: Map[String, Array[Byte]])

  private val MaxInput = 256 << 20
  private val MaxStream = 64 << 20
  private val MaxDirSectors = 4096

  private final val EndOfChain = 0xFFFFFFFE
  private final val FreeSect = 0xFFFFFFFF

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  def parse(b: Array[Byte]): Option[CfbFile] = {
    try parseInner(b)
    catch { case NonFatal(_) => None }
  }

  /** True iff the blob opens with the CFB magic — the `.doc`/`.xls`/
    * `.ppt` router test (cheap, first 8 bytes). */
  def isCfb(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      b(0) == 0xD0.toByte && b(1) == 0xCF.toByte && b(2) == 0x11.toByte &&
      b(3) == 0xE0.toByte && b(4) == 0xA1.toByte && b(5) == 0xB1.toByte &&
      b(6) == 0x1A.toByte && b(7) == 0xE1.toByte

  private def parseInner(b: Array[Byte]): Option[CfbFile] = {
    if (b == null || b.length < 512 || b.length > MaxInput) return None
    if (!isCfb(b)) return None
    val sectorShift = u16(b, 30)
    if (sectorShift != 9 && sectorShift != 12) return None
    val ssz = 1 << sectorShift
    val miniShift = u16(b, 32)
    if (miniShift != 6) return None
    val nFat = u32(b, 44).toInt
    val dirStart = u32(b, 48).toInt
    val miniCutoff = u32(b, 56)
    val miniFatStart = u32(b, 60).toInt
    val nMiniFat = u32(b, 64).toInt
    val difatStart = u32(b, 68).toInt
    val nDifat = u32(b, 72).toInt
    val nSectors = (b.length - 512) / ssz // sectors actually present

    def sectorAt(id: Int): Int = 512 + id * ssz // byte offset; caller checks

    // ── DIFAT: the list of FAT sector ids — 109 in the header, the
    // rest in DIFAT sectors chained via their last slot
    val fatSectors = new scala.collection.mutable.ArrayBuffer[Int]
    var k = 0
    while (k < 109 && fatSectors.size < nFat) {
      val v = u32(b, 76 + k * 4)
      if (v != FreeSect && v <= Int.MaxValue) fatSectors += v.toInt
      k += 1
    }
    var difat = difatStart
    var difatSteps = 0
    while (difat != EndOfChain && difat >= 0 && fatSectors.size < nFat) {
      difatSteps += 1
      if (difatSteps > nDifat + 1 || difatSteps > nSectors + 1) return None
      val off = sectorAt(difat)
      if (off + ssz > b.length) return None
      val perSector = ssz / 4 - 1
      var j = 0
      while (j < perSector && fatSectors.size < nFat) {
        val v = u32(b, off + j * 4)
        if (v != FreeSect && v <= Int.MaxValue) fatSectors += v.toInt
        j += 1
      }
      val next = u32(b, off + ssz - 4)
      difat = if (next > Int.MaxValue) EndOfChain else next.toInt
      if (next == FreeSect) difat = EndOfChain
    }
    if (fatSectors.size < nFat) return None

    // ── FAT: flatten the FAT sectors into one index → next-sector map
    val fat = new Array[Long](nFat * (ssz / 4))
    var fi = 0
    var fsi = 0
    while (fsi < fatSectors.size) {
      val off = sectorAt(fatSectors(fsi))
      if (off + ssz > b.length) return None
      var j = 0
      while (j < ssz / 4) { fat(fi) = u32(b, off + j * 4); fi += 1; j += 1 }
      fsi += 1
    }

    /** Read a FAT chain into a byte array, size-capped, cycle-guarded
      * (a revisited sector means a FAT loop: corrupt, not slow). */
    def readChain(start: Int, size: Long): Option[Array[Byte]] = {
      if (size < 0 || size > MaxStream) return None
      val out = new Array[Byte](size.toInt)
      val seen = new java.util.BitSet(fat.length)
      var pos = 0
      var sec = start
      var steps = 0
      while (pos < size && sec != EndOfChain) {
        steps += 1
        if (steps > nSectors + 1 || sec < 0 || sec >= fat.length) return None
        if (seen.get(sec)) return None
        seen.set(sec)
        val off = sectorAt(sec)
        if (off + ssz > b.length) return None
        val take = math.min(ssz, size.toInt - pos)
        System.arraycopy(b, off, out, pos, take)
        pos += take
        val nxt = fat(sec)
        sec = if (nxt == (EndOfChain & 0xFFFFFFFFL)) EndOfChain
        else if (nxt > Int.MaxValue) return None
        else nxt.toInt
      }
      if (pos < size) None else Some(out)
    }

    // ── directory: walk the chain, parse 128-byte entries linearly
    final case class Dir(name: String, typ: Int, start: Int, size: Long)
    val dirs = new scala.collection.mutable.ArrayBuffer[Dir]
    var dsec = dirStart
    var dsteps = 0
    while (dsec != EndOfChain) {
      dsteps += 1
      if (dsteps > MaxDirSectors || dsteps > nSectors + 1 ||
        dsec < 0 || dsec >= fat.length) return None
      val off = sectorAt(dsec)
      if (off + ssz > b.length) return None
      var e = 0
      while (e < ssz / 128 ) {
        val eo = off + e * 128
        val nameLen = u16(b, eo + 64) // bytes incl. terminator
        val typ = b(eo + 66) & 0xFF
        if (typ != 0 && nameLen >= 2 && nameLen <= 64) {
          val chars = (nameLen - 2) / 2
          val sb = new StringBuilder(chars)
          var ci = 0
          while (ci < chars) { sb.append(u16(b, eo + ci * 2).toChar); ci += 1 }
          val startL = u32(b, eo + 116)
          val start = if (startL > Int.MaxValue) EndOfChain else startL.toInt
          val size = if (sectorShift == 9) u32(b, eo + 120)
          else u32(b, eo + 120) | (u32(b, eo + 124) << 32)
          dirs += Dir(sb.toString, typ, start, size)
        }
        e += 1
      }
      val nxt = fat(dsec)
      dsec = if (nxt == (EndOfChain & 0xFFFFFFFFL)) EndOfChain
      else if (nxt > Int.MaxValue) return None
      else nxt.toInt
    }

    val rootOpt = dirs.find(_.typ == 5)
    if (rootOpt.isEmpty) return None
    val root = rootOpt.get

    // ── mini stream + miniFAT (only if any small stream needs them)
    lazy val miniStream: Array[Byte] =
      readChain(root.start, root.size).getOrElse(Array.emptyByteArray)
    lazy val miniFat: Array[Long] = {
      val raw = readChain(miniFatStart, nMiniFat.toLong * ssz)
        .getOrElse(Array.emptyByteArray)
      val out = new Array[Long](raw.length / 4)
      var j = 0
      while (j < out.length) { out(j) = u32(raw, j * 4); j += 1 }
      out
    }

    def readMiniChain(start: Int, size: Long): Option[Array[Byte]] = {
      if (size < 0 || size > MaxStream) return None
      val out = new Array[Byte](size.toInt)
      val seen = new java.util.BitSet(miniFat.length)
      var pos = 0
      var sec = start
      var steps = 0
      while (pos < size && sec != EndOfChain) {
        steps += 1
        if (steps > miniFat.length + 1 || sec < 0 || sec >= miniFat.length)
          return None
        if (seen.get(sec)) return None
        seen.set(sec)
        val off = sec * 64
        if (off + 64 > miniStream.length && off + (size - pos) > miniStream.length)
          return None
        val take = math.min(64, size.toInt - pos)
        if (off + take > miniStream.length) return None
        System.arraycopy(miniStream, off, out, pos, take)
        pos += take
        val nxt = miniFat(sec)
        sec = if (nxt == (EndOfChain & 0xFFFFFFFFL)) EndOfChain
        else if (nxt > Int.MaxValue) return None
        else nxt.toInt
      }
      if (pos < size) None else Some(out)
    }

    val streams = scala.collection.mutable.Map[String, Array[Byte]]()
    var di = 0
    while (di < dirs.size) {
      val d = dirs(di)
      if (d.typ == 2 && d.size >= 0) {
        val data =
          if (d.size < miniCutoff) readMiniChain(d.start, d.size)
          else readChain(d.start, d.size)
        data match {
          case Some(x) => streams(d.name) = x
          case None => return None // torn stream: the container is corrupt
        }
      }
      di += 1
    }
    Some(CfbFile(streams.toMap))
  }

  // ──────────────────────────────────────────────────────────────────
  // Writer — the deterministic fixture substrate (the ZipCodec.write
  // counterpart): v3 layout, 512-byte sectors, streams under the 4096
  // cutoff ride the mini stream (so the reader's miniFAT path is
  // always live), larger ones the FAT. DIFAT stays in-header (109 FAT
  // sectors bound the writer at ~28 MB — fixtures are far smaller).
  // ──────────────────────────────────────────────────────────────────

  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
    b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
  }
  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Serialize `streams` into a CFB container. Stream order is
    * preserved in the directory; every byte is a pure function of the
    * input (zero timestamps/CLSIDs), so fixtures are deterministic. */
  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val Ssz = 512
    val small = streams.filter(_._2.length < 4096)
    val big = streams.filter(_._2.length >= 4096)

    // mini stream: each small stream padded to 64-byte mini sectors
    val miniStarts = scala.collection.mutable.Map[String, Int]()
    var miniSecs = 0
    small.foreach { case (nm, data) =>
      miniStarts(nm) = miniSecs
      miniSecs += math.max(1, ceilDiv(data.length, 64))
    }
    val miniData = new Array[Byte](miniSecs * 64)
    small.foreach { case (nm, data) =>
      System.arraycopy(data, 0, miniData, miniStarts(nm) * 64, data.length)
    }
    val nMiniFatSecs = if (miniSecs == 0) 0 else ceilDiv(miniSecs * 4, Ssz)
    val nMiniStreamSecs = ceilDiv(miniData.length, Ssz)

    val nDirEntries = 1 + streams.size
    val nDirSecs = math.max(1, ceilDiv(nDirEntries * 128, Ssz))
    val bigSecs = big.map { case (_, d) => ceilDiv(d.length, Ssz) }
    val nBigSecs = bigSecs.sum

    // fixed point for the FAT sector count
    var nFatSecs = 1
    var guard = 0
    while (guard < 64) {
      val total = nFatSecs + nDirSecs + nMiniFatSecs + nMiniStreamSecs + nBigSecs
      val need = math.max(1, ceilDiv(total * 4, Ssz))
      if (need == nFatSecs) guard = 64 else { nFatSecs = need; guard += 1 }
    }
    require(nFatSecs <= 109, "fixture writer caps at in-header DIFAT")

    val dirStart = nFatSecs
    val miniFatStart = if (nMiniFatSecs == 0) EndOfChain else dirStart + nDirSecs
    val miniStreamStart =
      if (nMiniStreamSecs == 0) EndOfChain
      else dirStart + nDirSecs + nMiniFatSecs
    var nextBig = dirStart + nDirSecs + nMiniFatSecs + nMiniStreamSecs
    val bigStarts = scala.collection.mutable.Map[String, Int]()
    big.zip(bigSecs).foreach { case ((nm, _), secs) =>
      bigStarts(nm) = nextBig; nextBig += secs
    }
    val totalSecs = nextBig
    val out = new Array[Byte](512 + totalSecs * Ssz)

    // header
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    magic.zipWithIndex.foreach { case (v, i) => out(i) = v.toByte }
    putU16(out, 24, 0x003E) // minor
    putU16(out, 26, 0x0003) // major: v3
    putU16(out, 28, 0xFFFE) // little-endian
    putU16(out, 30, 9) // sector shift
    putU16(out, 32, 6) // mini shift
    putU32(out, 44, nFatSecs)
    putU32(out, 48, dirStart)
    putU32(out, 56, 4096) // mini cutoff
    putU32(out, 60, if (nMiniFatSecs == 0) EndOfChain & 0xFFFFFFFFL else miniFatStart.toLong)
    putU32(out, 64, nMiniFatSecs)
    putU32(out, 68, EndOfChain & 0xFFFFFFFFL) // no DIFAT sectors
    putU32(out, 72, 0)
    var i = 0
    while (i < 109) {
      putU32(out, 76 + i * 4,
        if (i < nFatSecs) i.toLong else FreeSect & 0xFFFFFFFFL)
      i += 1
    }

    def sectorOff(id: Int): Int = 512 + id * Ssz

    // FAT
    val fat = Array.fill(nFatSecs * (Ssz / 4))(FreeSect & 0xFFFFFFFFL)
    def chain(start: Int, count: Int): Unit = {
      var k = 0
      while (k < count) {
        fat(start + k) =
          if (k == count - 1) EndOfChain & 0xFFFFFFFFL else (start + k + 1).toLong
        k += 1
      }
    }
    (0 until nFatSecs).foreach(s => fat(s) = 0xFFFFFFFDL) // FATSECT
    chain(dirStart, nDirSecs)
    if (nMiniFatSecs > 0) chain(miniFatStart, nMiniFatSecs)
    if (nMiniStreamSecs > 0) chain(miniStreamStart, nMiniStreamSecs)
    big.zip(bigSecs).foreach { case ((nm, _), secs) => chain(bigStarts(nm), secs) }
    fat.zipWithIndex.foreach { case (v, k) => putU32(out, sectorOff(0) + k * 4, v) }

    // directory
    def writeEntry(idx: Int, name: String, typ: Int, child: Int,
                   right: Int, start: Long, size: Long): Unit = {
      val off = sectorOff(dirStart) + idx * 128
      val n = math.min(name.length, 31)
      var c = 0
      while (c < n) { putU16(out, off + c * 2, name.charAt(c)); c += 1 }
      putU16(out, off + 64, (n + 1) * 2)
      out(off + 66) = typ.toByte
      out(off + 67) = 1 // black
      putU32(out, off + 68, FreeSect & 0xFFFFFFFFL) // left
      putU32(out, off + 72, if (right < 0) FreeSect & 0xFFFFFFFFL else right.toLong)
      putU32(out, off + 76, if (child < 0) FreeSect & 0xFFFFFFFFL else child.toLong)
      putU32(out, off + 116, start)
      putU32(out, off + 120, size & 0xFFFFFFFFL)
      putU32(out, off + 124, 0)
    }
    writeEntry(0, "Root Entry", 5, if (streams.nonEmpty) 1 else -1, -1,
      if (nMiniStreamSecs == 0) EndOfChain & 0xFFFFFFFFL else miniStreamStart.toLong,
      miniData.length.toLong)
    streams.zipWithIndex.foreach { case ((nm, data), k) =>
      val start =
        if (data.length < 4096) miniStarts(nm).toLong else bigStarts(nm).toLong
      val right = if (k + 1 < streams.size) k + 2 else -1
      writeEntry(k + 1, nm, 2, -1, right, start, data.length.toLong)
    }

    // miniFAT
    if (nMiniFatSecs > 0) {
      val mf = Array.fill(nMiniFatSecs * (Ssz / 4))(FreeSect & 0xFFFFFFFFL)
      small.foreach { case (nm, data) =>
        val st = miniStarts(nm)
        val cnt = math.max(1, ceilDiv(data.length, 64))
        var k = 0
        while (k < cnt) {
          mf(st + k) =
            if (k == cnt - 1) EndOfChain & 0xFFFFFFFFL else (st + k + 1).toLong
          k += 1
        }
      }
      mf.zipWithIndex.foreach { case (v, k) =>
        putU32(out, sectorOff(miniFatStart) + k * 4, v)
      }
    }

    // mini stream payload
    if (nMiniStreamSecs > 0)
      System.arraycopy(miniData, 0, out, sectorOff(miniStreamStart), miniData.length)

    // big streams
    big.foreach { case (nm, data) =>
      System.arraycopy(data, 0, out, sectorOff(bigStarts(nm)), data.length)
    }
    out
  }
}
