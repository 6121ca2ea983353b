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
    // `streamdedup` mode: real block ingest COMPOSED with streaming
    // near-dup dedup per micro-batch over 5k+ rounds — the end-to-end
    // continuous-pipeline shape. The check is twofold: blocks/s holds
    // ≥100 with dedup in the loop, and per-batch dedup cost stays FLAT
    // as the stored band index grows (the index scan is pruned to the
    // batch's band keys; an unpruned scan would grow linearly in
    // batches).
    if (args.contains("streamdedup")) {
      val root = java.nio.file.Files.createTempDirectory("graft-probe-sd").toString
      val store = new TableStore(spark, root, nBuckets = 8)
      val indexDir = java.nio.file.Files.createTempDirectory("graft-probe-sd-idx").toString
      BlockIngest.initGenesis(store,
        (0 until 40).map(i => (EngineQueries.addr(i), 1000000L, "{}")), network = "graft-bench")
      import spark.implicits._
      // args: streamdedup [batchRounds] — 5k rounds total either way
      val batchRounds = args.dropWhile(_ != "streamdedup").drop(1).headOption
        .map(_.toInt).getOrElse(500)
      require(batchRounds > 0 && 5000 % batchRounds == 0,
        s"batchRounds must be a positive divisor of 5000, got $batchRounds")
      val nBatches = 5000 / batchRounds
      // non-linear word mix: a linear (seed + j·C) form makes different
      // seeds produce SHIFTED copies of one global word cycle (huge
      // accidental n-gram overlap); murmur keeps unique docs unique
      def words(seed: Long, n: Int): String =
        (0 until n).map(j =>
          s"w${math.floorMod(scala.util.hashing.MurmurHash3.productHash((seed, j)).toLong, 5000L)}")
          .mkString(" ")
      for (b <- 0 until nBatches) {
        val blocks = EngineQueries.syntheticBlocks(
          rounds = batchRounds, txnsPerRound = 4, startRound = b * batchRounds)
        val t0 = System.nanoTime()
        BlockIngest.applyBlocks(store, spark.createDataset(blocks.map(BlockCodec.blockToJson)))
        val tIngest = (System.nanoTime() - t0) / 1e9
        // one document per round; every 5th is a recurring template, so
        // later batches carry real cross-batch near-dups
        val docs = (0 until batchRounds).map { i =>
          val id = (b * batchRounds + i).toLong
          val text =
            if (i % 5 == 0) s"recurring boilerplate notice ${words(i % 17, 30)}"
            else s"unique ${words(id, 30)}"
          (id, text)
        }.toDF("doc_id", "text")
        val t1 = System.nanoTime()
        val survivors = graft.streaming.StreamingDedup
          .processBatch(docs, b, "doc_id", "text", indexDir).count()
        val tDedup = (System.nanoTime() - t1) / 1e9
        println(f"[probe-sd] batch $b%2d rounds=${(b + 1) * batchRounds}%5d: " +
          f"ingest=$tIngest%5.2f s dedup=$tDedup%5.2f s " +
          f"${batchRounds / (tIngest + tDedup)}%6.1f blocks/s survivors=$survivors%4d")
      }
      spark.stop()
      return
    }
    // `streamsem` mode: same composition with the SEMANTIC streaming
    // dedup — per batch, embedding rows dedup against a durable IVF-cell
    // vector index. Flatness of the dedup column proves the probed-cell
    // pruning; survivors prove first-wins across batches.
    if (args.contains("streamsem")) {
      val root = java.nio.file.Files.createTempDirectory("graft-probe-ss").toString
      val store = new TableStore(spark, root, nBuckets = 8)
      val indexDir = java.nio.file.Files.createTempDirectory("graft-probe-ss-idx").toString
      BlockIngest.initGenesis(store,
        (0 until 40).map(i => (EngineQueries.addr(i), 1000000L, "{}")), network = "graft-bench")
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val dims = 16
      val batchRounds = 500
      def vec(seed: Long): Seq[Float] = {
        val r = new scala.util.Random(seed)
        Seq.fill(dims)(r.nextFloat() * 2 - 1)
      }
      val rc = new scala.util.Random(3)
      val cents = (0L until 16L).map(c => (c, Seq.fill(dims)(rc.nextFloat() * 2 - 1)))
        .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
        .localCheckpoint()
      for (b <- 0 until 10) {
        val blocks = EngineQueries.syntheticBlocks(
          rounds = batchRounds, txnsPerRound = 4, startRound = b * batchRounds)
        val t0 = System.nanoTime()
        BlockIngest.applyBlocks(store, spark.createDataset(blocks.map(BlockCodec.blockToJson)))
        val tIngest = (System.nanoTime() - t0) / 1e9
        // every 5th row is a slightly-perturbed copy of one of 17 template
        // vectors — real cross-batch semantic dups
        val rows = (0 until batchRounds).map { i =>
          val id = (b * batchRounds + i).toLong
          val v =
            if (i % 5 == 0) vec(1000 + i % 17).map(x => (x * 0.98f + 0.002f))
            else vec(id)
          (id, v)
        }
        val docs = rows.toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
        val t1 = System.nanoTime()
        val survivors = graft.streaming.StreamingSemanticDedup
          .processBatch(docs, b, "id", "v", cents, "id", indexDir, minCos = 0.99)
          .count()
        val tDedup = (System.nanoTime() - t1) / 1e9
        println(f"[probe-ss] batch $b%2d rounds=${(b + 1) * batchRounds}%5d: " +
          f"ingest=$tIngest%5.2f s semdedup=$tDedup%5.2f s " +
          f"${batchRounds / (tIngest + tDedup)}%6.1f blocks/s survivors=$survivors%4d")
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
