package graft.tools

import graft.expressions.MinHashImpl
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Single-thread throughput of the MinHash signature kernel: the permuted
  * family (ONE md5 per shingle + k linear permutations,
  * [[graft.expressions.MinHashImpl]]) against the previous k-digest family
  * (k md5s per shingle, reimplemented here as the baseline). Same
  * tokenization, same shingling, same corpus — the delta is purely the
  * per-shingle digest count, which at 100 TB IS the dedup signature cost.
  *
  * `sbt "runMain graft.tools.MinHashThroughputProbe [docs] [k]"`
  */
object MinHashThroughputProbe {

  /** The round-3 family: slot i = min over shingles of md5(i ‖ "|" ‖ s).
    *
    * Byte-level shingle assembly MIRRORS [[MinHashImpl.eval]] (tokens
    * decoded to bytes once, shingle built with arraycopy, no per-shingle
    * strings) so the printed speedup isolates the ONE difference the probe
    * claims to measure — k digests per shingle vs one — rather than
    * conflating it with baseline allocation overhead. */
  private def kDigestEval(tokens: ArrayData, n: Int, k: Int): Array[Array[Byte]] = {
    val m = tokens.numElements()
    if (m < n) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val pfx = Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))
    val toks = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) {
      toks(t) = if (tokens.isNullAt(t)) null else tokens.getUTF8String(t).getBytes
      t += 1
    }
    val mins = new Array[Array[Byte]](k)
    var j = 0
    while (j <= m - n) {
      var len = 0
      var c = 0
      while (c < n) {
        val tb = toks(j + c)
        if (tb != null) len += (if (len > 0) 1 else 0) + tb.length
        c += 1
      }
      val sh = new Array[Byte](len)
      var pos = 0
      c = 0
      while (c < n) {
        val tb = toks(j + c)
        if (tb != null) {
          if (pos > 0) { sh(pos) = ' '.toByte; pos += 1 }
          System.arraycopy(tb, 0, sh, pos, tb.length)
          pos += tb.length
        }
        c += 1
      }
      var i = 0
      while (i < k) {
        md.reset(); md.update(pfx(i)); md.update(sh)
        val d = md.digest()
        if (mins(i) == null || java.util.Arrays.compareUnsigned(d, mins(i)) < 0) mins(i) = d
        i += 1
      }
      j += 1
    }
    mins
  }

  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toInt else 20000
    val k = if (args.length > 1) args(1).toInt else 8
    val n = 3
    val rnd = new scala.util.Random(7)
    val corpus = Array.tabulate(docs) { _ =>
      ArrayData.toArrayData(Array.fill(40 + rnd.nextInt(160))(
        UTF8String.fromString(s"w${rnd.nextInt(5000)}")))
    }
    val shingles = corpus.map(t => math.max(0, t.numElements() - n + 1)).map(_.toLong).sum

    def time(label: String)(body: => Unit): Double = {
      body // warm
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[minhash-probe] $label%-16s $s%8.3f s  ${shingles / s / 1e6}%6.2f M shingles/s")
      s
    }
    val tOld = time("k-digest (old)") { corpus.foreach(kDigestEval(_, n, k)) }
    val tNew = time("permuted (new)") { corpus.foreach(MinHashImpl.eval(_, n, k)) }
    println(f"[minhash-probe] speedup ${tOld / tNew}%.2f x at k=$k")
  }
}
