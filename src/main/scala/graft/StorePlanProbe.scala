package graft
import graft.codec.BlockCodec
import graft.ingest.{BlockIngest, TableStore}
import graft.query.Api
import org.apache.spark.sql.SparkSession
object StorePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val store = new TableStore(spark, java.nio.file.Files.createTempDirectory("probe").toString, 4)
    BlockIngest.initGenesis(store, Seq((graft.queries.EngineQueries.syntheticBlocks(1,1).head.feeSink, 1L, "{}")), "n")
    BlockIngest.applyBlocks(store,
      spark.createDataset(graft.queries.EngineQueries.syntheticBlocks(6, 5).map(BlockCodec.blockToJson)))
    val (df, _) = Api.transactions(store, Api.TransactionFilter(minRound = Some(4), maxRound = Some(5)))
    df.explain("formatted")
    // Point lookup: the account scan must carry PartitionFilters on the
    // single bkt the address hashes to (driver-side bucketOfValue twin).
    val addr = graft.queries.EngineQueries.addr(1)
    println(s"--- account point lookup (addr bucket = ${store.bucketOfValue(addr)}) ---")
    val (acct, _) = Api.accounts(store, Api.AccountQueryOptions(equalToAddress = Some(addr)))
    acct.explain("formatted")
    spark.stop()
  }
}
