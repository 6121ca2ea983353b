package graft.tools

import graft.ingest.{MetaLog, TableStore}

/** Measures the metadata layer's per-commit cost over chain-scale batch
  * counts — the thing the old single-document metastate could not do
  * (it re-rendered the FULL manifest + bloom map on every commit:
  * O(history) per batch, quadratic total).
  *
  * Drives [[MetaLog]] directly with realistic per-batch payloads (3
  * manifest appends + 3 round-stat lines + 2 bloom lines + 2 scalar
  * sets, ≈ one micro-batch's commit record) for N batches, printing the
  * wall time of each window of commits plus a fresh reader's
  * cold-materialization time at the end. Numbers quoted in PLANS.md.
  *
  * No SparkSession needed: the commit path under test is pure
  * driver-side IO, which is exactly the point — it must stay flat while
  * the data jobs around it scale out.
  */
object MetaLogProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(6000)
    val window = 500
    val root = java.nio.file.Files.createTempDirectory("graft-metalog-probe").toString
    val log = new MetaLog(root) // default checkpointInterval = 64

    // a representative SQ8-size bloom line payload (~160 chars of base64)
    val bloomEnc = "A" * 160
    var t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      val f = s"rbkt=${i / 10}/part-$i-00000000.c000.snappy.parquet"
      log.append(
        sets = Seq(
          TableStore.MetaNextRound -> (i + 1).toString,
          TableStore.MetaSpecialAccounts -> s"""{"fee":"A$i","rwd":"B$i"}"""),
        appends = Seq(
          "manifest.txn" -> f,
          "manifest.txn_participation" -> f,
          "manifest.block_header" -> f,
          "roundstats.txn" -> s"$f\t$i:$i",
          "roundstats.txn_participation" -> s"$f\t$i:$i",
          "roundstats.block_header" -> s"$f\t$i:$i",
          "bloom.txid.txn" -> s"$f\t$bloomEnc",
          "bloom.addr.txn_participation" -> s"$f\t$bloomEnc"))
      i += 1
      if (i % window == 0) {
        val dt = (System.nanoTime() - t0) / 1e6
        println(f"[metalog-probe] commits ${i - window}%5d..$i%5d: $dt%8.1f ms  (${dt / window}%.3f ms/commit)")
        t0 = System.nanoTime()
      }
    }
    // cold reader: checkpoint + tail materialization
    t0 = System.nanoTime()
    val reader = new MetaLog(root)
    val st = reader.state()
    println(f"[metalog-probe] cold read at $n commits: ${(System.nanoTime() - t0) / 1e6}%.1f ms " +
      s"(version ${reader.version}, ${st("manifest.txn").linesIterator.size} manifest lines)")
    // warm re-read (version-gated cache hit)
    t0 = System.nanoTime()
    reader.state()
    println(f"[metalog-probe] warm re-read: ${(System.nanoTime() - t0) / 1e6}%.3f ms")
  }
}
