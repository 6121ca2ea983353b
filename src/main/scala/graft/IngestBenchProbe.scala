package graft

import graft.codec.BlockCodec
import graft.ingest.{BlockIngest, TableStore}
import graft.queries.EngineQueries
import org.apache.spark.sql.SparkSession

/** Ingest throughput probe: N rounds × M txns through the full batch
  * path, reported as rounds/sec and txn rows/sec (PLANS.md records it). */
object IngestBenchProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.lift(0).map(_.toInt).getOrElse(200)
    val txnsPerRound = args.lift(1).map(_.toInt).getOrElse(100)
    val batches = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-ingest-bench").toString
    val store = new TableStore(spark, root, nBuckets = 16)
    BlockIngest.initGenesis(store, (0 until 40).map(i =>
      (graft.codec.Codecs.addressEncode(Array.tabulate(32)(j => ((i * 31 + j * 7) % 251).toByte)),
        1000000L, "{}")), "ingest-bench")

    val blocks = EngineQueries.syntheticBlocks(rounds, txnsPerRound)
    val json = blocks.map(BlockCodec.blockToJson)
    val perBatch = (rounds + batches - 1) / batches

    val t0 = System.nanoTime()
    json.grouped(perBatch).foreach { chunk =>
      BlockIngest.applyBlocks(store, spark.createDataset(chunk))
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val txnRows = store.read("txn").count()
    println(f"ingested $rounds rounds ($txnRows txn rows) in $batches batches: " +
      f"$secs%.1fs = ${rounds / secs}%.1f rounds/s, ${txnRows / secs}%.0f txn rows/s")
    spark.stop()
  }
}
