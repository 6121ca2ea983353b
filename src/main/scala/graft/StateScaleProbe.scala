package graft
import graft.codec.{BlockCodec, Codecs}
import graft.ingest.{BlockIngest, TableStore}
import graft.model._
import org.apache.spark.sql.SparkSession

/** Validates the bucketed-store claim: a small delta batch merges in the
  * same time against a large state as against a small one (touched-bucket
  * pruning — cost tracks batch size, not accumulated table size). */
object StateScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def addr(i: Int) = Codecs.addressEncode(Array.tabulate(32)(j => ((i * 7 + j) % 251).toByte))

    for (nAccounts <- Seq(10000, 1000000)) {
      val store = new TableStore(spark,
        java.nio.file.Files.createTempDirectory(s"scale$nAccounts").toString, nBuckets = 64)
      BlockIngest.initGenesis(store,
        (0 until nAccounts).map(i => (addr(i), 1000L + i, "{}")), "scale-net")
      // one warm batch, then time a 10-account-delta round
      def mkBlock(r: Long) = Block(round = r, timestamp = 1700000000L + r,
        genesisId = "s", feeSink = addr(0), rewardsPool = addr(1), txnCounter = r,
        payset = Vector.empty,
        delta = LedgerDelta(accounts =
          (0 until 10).map(i => AccountDelta(addr(i * 37 % nAccounts), 5000L + r + i)).toVector))
      BlockIngest.applyBlocks(store, spark.createDataset(Seq(BlockCodec.blockToJson(mkBlock(0)))))
      val t0 = System.nanoTime()
      BlockIngest.applyBlocks(store, spark.createDataset(Seq(BlockCodec.blockToJson(mkBlock(1)))))
      println(f"state=$nAccounts%,d accounts: 10-delta merge took ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
