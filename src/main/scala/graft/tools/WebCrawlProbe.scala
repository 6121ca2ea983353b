package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the web-archive layer at corpus replication ×{1,8,32} on
  * sf0.1: WARC shard packing (the one byte-carrying shuffle),
  * `.warc.gz` packing (adds the per-record deflate), and the read side
  * (inflate + parse + the 11-step HTML extraction). Shard count scales
  * with replication so per-task work stays constant — the 100 TB
  * question is whether throughput scales with input, i.e. whether the
  * plan is scheduling-bound or compute-bound, and which stage pays the
  * compression bill. Usage: runMain graft.tools.WebCrawlProbe [sfDir] */
object WebCrawlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shell = concat(
      lit("<html><head><script>let i = 1 < 2;</script></head><body><h1>Doc "),
      col("doc_id").cast("string"),
      lit("</h1><p>"), coalesce(col("text"), lit("")),
      lit("</p><br><p>A &amp; B&nbsp;end</p></body></html>"))
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), shell.as("html")).cache()
    val n0 = docs.count()
    def timed(what: String, k: Int, n: Long)(body: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[web-probe] $what%-12s x$k%-3d $best%6.2f s  ${n / best / 1000}%8.1fk blobs/s")
    }
    for (k <- Seq(1, 8, 32)) {
      val n = n0 * k
      val blobs = docs.crossJoin(spark.range(k).select(col("id").as("r")))
        .select((col("doc_id") * 32 + col("r")).as("doc_id"),
          pmod(col("doc_id") * 32 + col("r"), lit(8 * k)).cast("int").as("shard"),
          concat(lit("https://d"), pmod(col("doc_id"), lit(50)).cast("string"),
            lit(".example.com/p"), col("doc_id").cast("string")).as("uri"),
          col("html").cast("binary").as("blob"))
        .localCheckpoint()
      timed("warc-pack", k, n) {
        graft.operators.Sharding.packWarcShards(blobs, "shard", "doc_id", "uri", "blob")
          .select(sum(col("n_warc_bytes"))).head
      }
      timed("warcgz-pack", k, n) {
        graft.operators.Sharding.packWarcGzShards(blobs, "shard", "doc_id", "uri", "blob")
          .select(sum(col("n_gz_bytes"))).head
      }
      val gz = graft.operators.Sharding
        .packWarcGzShards(blobs, "shard", "doc_id", "uri", "blob").localCheckpoint()
      timed("gz-read-extr", k, n) {
        graft.operators.Sharding.readWarcGzRecords(gz, "shard", "warcgz")
          .select(graft.operators.TextOps.htmlExtract(col("blob").cast("string")).as("t"))
          .select(sum(length(col("t")))).head
      }
      Seq(blobs, gz).foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
