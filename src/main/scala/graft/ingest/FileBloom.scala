package graft.ingest

import scala.util.hashing.MurmurHash3

/** Per-file Bloom filter over a high-cardinality key column — the
  * file-pruning index for point lookups (SURVEY §4: the reference leans
  * on database indexes for `WHERE txid = $1` / `WHERE addr = $1`; a
  * file-based column store needs its own skipping structure, because
  * random keys defeat parquet min/max stats). Indexed columns per table
  * are listed in [[TableStore.IndexedColumns]] (txn.txid,
  * txn_participation.addr).
  *
  * One bloom per committed data file, built from the batch at stage time
  * and committed in the SAME metastate write as the manifest and the
  * watermark — so the index can never disagree with the committed file
  * set. A lookup consults the blooms driver-side and reads only the files
  * that might contain the txid: O(fpp × files) data files touched instead
  * of every file in the table. Files without an entry (pre-index data,
  * freshly compacted output before its rebuild) are conservatively read.
  *
  * Sizing: bits = n·⌈log2(1/fpp)⌉/ln2 ≈ 9.6 bits/key at the default 1%
  * fpp, k = 7 probes, double hashing over two murmur3 seeds. A file of
  * 20k keys costs ~24 KB of index — ~0.1% of the data it covers.
  */
object FileBloom {

  final case class Bloom(k: Int, bits: Array[Long]) {
    private def mBits: Long = bits.length.toLong * 64

    def mightContain(key: String): Boolean = {
      val (h1, h2) = hashPair(key)
      var i = 0
      while (i < k) {
        val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, mBits)
        if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
        i += 1
      }
      true
    }

    def encode: String = {
      val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      bits.foreach(bb.putLong)
      s"$k:${java.util.Base64.getEncoder.encodeToString(bb.array())}"
    }
  }

  def build(keys: Iterable[String], fpp: Double = 0.01): Bloom = {
    val n = math.max(1, keys.size)
    val bitsPerKey = math.ceil(-math.log(fpp) / (math.log(2) * math.log(2)))
    val m = ((n * bitsPerKey).toLong + 63) / 64 * 64
    val k = math.max(1, math.round(bitsPerKey * math.log(2)).toInt)
    val arr = new Array[Long]((m / 64).toInt)
    keys.foreach { key =>
      val (h1, h2) = hashPair(key)
      var i = 0
      while (i < k) {
        val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
        arr((idx >>> 6).toInt) |= (1L << (idx & 63))
        i += 1
      }
    }
    Bloom(k, arr)
  }

  def decode(s: String): Bloom = {
    val sep = s.indexOf(':')
    val k = s.substring(0, sep).toInt
    val bytes = java.util.Base64.getDecoder.decode(s.substring(sep + 1))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val arr = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < arr.length) { arr(i) = bb.getLong(); i += 1 }
    Bloom(k, arr)
  }

  /** Two independent 64-bit hashes via seeded murmur3 pairs (double
    * hashing: probe_i = h1 + i·h2). h2 forced odd so probes cycle the
    * whole bit space even when m is a power of two. */
  private def hashPair(key: String): (Long, Long) = {
    val a = MurmurHash3.stringHash(key, 0x9747b28c)
    val b = MurmurHash3.stringHash(key, 0x1b873593)
    val c = MurmurHash3.stringHash(key, 0x85ebca6b)
    val d = MurmurHash3.stringHash(key, 0xc2b2ae35)
    val h1 = (a.toLong << 32) | (b.toLong & 0xffffffffL)
    val h2 = ((c.toLong << 32) | (d.toLong & 0xffffffffL)) | 1L
    (h1, h2)
  }
}
