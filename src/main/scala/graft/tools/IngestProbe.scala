package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ingest._
import graft.codec.BlockCodec
import graft.queries.EngineQueries
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.range(10).count()

    // `compact` mode: file-count growth under the seal-time compaction
    // cadence over 10k+ rounds (roundsPerPartition shrunk to 1000 so the
    // run seals ten buckets; the cadence itself is scale-free). Expect:
    // sealed buckets collapse to ~1 file each right after the batch that
    // seals them, so total manifest files saw-tooth around (active-bucket
    // files + #sealed buckets) instead of growing linearly in batches.
    if (args.contains("compact")) {
      val root = java.nio.file.Files.createTempDirectory("graft-probe-compact").toString
      val store = new TableStore(spark, root, nBuckets = 8, roundsPerPartition = 1000L)
      BlockIngest.initGenesis(store,
        (0 until 40).map(i => (EngineQueries.addr(i), 1000000L, "{}")), network = "graft-bench")
      import spark.implicits._
      val batchRounds = 500
      for (b <- 0 until 21) {
        val blocks = EngineQueries.syntheticBlocks(
          rounds = batchRounds, txnsPerRound = 4, startRound = b * batchRounds)
        val t0 = System.nanoTime()
        BlockIngest.applyBlocks(store, spark.createDataset(blocks.map(BlockCodec.blockToJson)))
        val dt = (System.nanoTime() - t0) / 1e9
        val m = store.manifest("txn")
        val byBkt = m.groupBy(_.takeWhile(_ != '/'))
        val active = s"rbkt=${((b + 1) * batchRounds) / 1000}"
        val sealedMax = byBkt.collect { case (k, fs) if k != active => fs.size }.maxOption.getOrElse(0)
        println(f"[probe-compact] batch $b%2d (rounds ${(b + 1) * batchRounds}%6d): " +
          f"$dt%5.2f s, txn manifest files=${m.size}%4d, buckets=${byBkt.size}%3d, " +
          f"max sealed-bucket files=$sealedMax%3d")
      }
      spark.stop()
      return
    }
    for (i <- 1 to 2) {
      val root = java.nio.file.Files.createTempDirectory("graft-probe").toString
      val store = new TableStore(spark, root, nBuckets = 8)
      var t0 = System.nanoTime()
      BlockIngest.initGenesis(store,
        (0 until 40).map(i => (EngineQueries.addr(i), 1000000L, "{}")), network = "graft-bench")
      println(f"[probe] genesis: ${(System.nanoTime()-t0)/1e9}%.2f s")
      import spark.implicits._
      val blocks = EngineQueries.syntheticBlocks(rounds = 12, txnsPerRound = 20)
      t0 = System.nanoTime()
      BlockIngest.applyBlocks(store, spark.createDataset(blocks.map(BlockCodec.blockToJson)))
      println(f"[probe] applyBlocks: ${(System.nanoTime()-t0)/1e9}%.2f s")
      t0 = System.nanoTime()
      val (txns, _) = graft.query.Api.transactions(store, graft.query.Api.TransactionFilter(
        address = Some(EngineQueries.addr(1)), limit = Some(500)))
      txns.count()
      println(f"[probe] read query: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // Throughput sweep: per-batch fixed cost amortizes with batch size —
    // blocks/sec is the metric that matters against the reference's
    // block-at-a-time COPY pipeline.
    for (rounds <- Seq(12, 60, 300)) {
      val root = java.nio.file.Files.createTempDirectory("graft-probe-tp").toString
      val store = new TableStore(spark, root, nBuckets = 8)
      BlockIngest.initGenesis(store,
        (0 until 40).map(i => (EngineQueries.addr(i), 1000000L, "{}")), network = "graft-bench")
      import spark.implicits._
      val blocks = EngineQueries.syntheticBlocks(rounds = rounds, txnsPerRound = 20)
      val json = blocks.map(BlockCodec.blockToJson)
      val t0 = System.nanoTime()
      BlockIngest.applyBlocks(store, spark.createDataset(json))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] batch rounds=$rounds%4d (${rounds * 22} txn rows): $dt%.2f s = ${rounds / dt}%.1f blocks/s, ${rounds * 22 / dt}%.0f txn/s")
    }
    spark.stop()
  }
}
