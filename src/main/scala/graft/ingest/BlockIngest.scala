package graft.ingest

import graft.codec.BlockCodec
import graft.model._
import graft.state.StateMerge
import graft.transform.{BlockTransforms, DeltaTransforms}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch apply of a micro-batch of blocks (SURVEY.md §3.1's Spark
  * equivalent): ordering guard against metastate, idempotent append of
  * txn/participation/header by round partition, six state merges, metastate
  * bump. Structured Streaming wraps this in foreachBatch
  * (graft.streaming.StreamIngest); the reference's serializable transaction
  * + tolerated unique violations (cockroach.go:136-199) become the
  * round-partition overwrite + single driver-side commit point.
  *
  * Input is one JSON document per block (graft.codec.BlockCodec), parsed in
  * the executors — the recursive inner-txn tree never needs a Spark schema.
  */
object BlockIngest {

  /** Pool for intra-batch write parallelism (9 independent table writes).
    * Bounded and shared: one pool regardless of how many stores exist. */
  private lazy val ingestPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(9, r => {
        val t = new Thread(r, "graft-ingest")
        t.setDaemon(true)
        t
      }))

  /** Strict-ordering guard (cockroach.go:142-146): rounds already accounted
    * are dropped (idempotent replay); the remainder must start at
    * `nextRound` and be gap-free. Returns the rounds to apply. */
  def orderingGuard(rounds: Seq[Long], nextRound: Long): Seq[Long] = {
    val relevant = rounds.filter(_ >= nextRound)
    require(relevant.distinct.length == relevant.length,
      s"duplicate rounds in batch: ${relevant.diff(relevant.distinct).distinct.sorted.take(5).mkString(",")}")
    val fresh = relevant.distinct.sorted
    if (fresh.isEmpty) return fresh
    require(fresh.head == nextRound,
      s"adding block round ${fresh.head} but next round to account is $nextRound")
    fresh.zipWithIndex.foreach { case (r, i) =>
      require(r == nextRound + i, s"round gap: expected ${nextRound + i}, got $r")
    }
    fresh
  }

  def applyBlocks(store: TableStore, blocksJson: Dataset[String]): Unit = {
    val spark = store.spark
    import spark.implicits._

    val ds = blocksJson.cache()
    try {
      val next = store.nextRound
      // One pre-pass job collects everything the driver needs: rounds for
      // the ordering guard AND the special-accounts doc of the newest block
      // (avoids a second parse-everything job at the end of the batch).
      val roundInfo = ds.map { s =>
        val b = BlockCodec.blockFromJson(s)
        (b.round, BlockTransforms.specialAccountsJson(b))
      }.collect().toSeq
      val fresh = orderingGuard(roundInfo.map(_._1), next)
      if (fresh.isEmpty) return
      val lastRound = fresh.last
      val specialAccounts = roundInfo.filter(_._1 == lastRound).head._2

      val freshDs = ds.filter(s => BlockCodec.blockFromJson(s).round >= next).cache()

      // The reference runs the txn/participation COPY concurrently with the
      // state-upsert batch (cockroach.go:167-199). Same here: each append
      // and each merge targets a distinct table directory, so they are
      // independent Spark jobs — run them from a thread pool and let the
      // scheduler interleave stages. The metastate bump below stays the
      // single serial commit point.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = BlockIngest.ingestPool

      val writes = Seq(
        Future {
          store.appendByRound("txn",
            conform(freshDs.flatMap(s => BlockTransforms.flattenBlock(BlockCodec.blockFromJson(s))).toDF(), "txn"))
        },
        Future {
          store.appendByRound("txn_participation",
            conform(freshDs.flatMap(s => BlockTransforms.participationRows(BlockCodec.blockFromJson(s))).toDF(), "txn_participation"))
        },
        Future {
          store.appendByRound("block_header",
            conform(freshDs.map(s => BlockTransforms.headerRow(BlockCodec.blockFromJson(s))).toDF(), "block_header"))
        },
        Future {
          mergeSoft(store, "account", Seq("addr"),
            Seq("microalgos", "rewardsbase", "rewards_total", "account_data"),
            freshDs.flatMap(s => DeltaTransforms.accountDeltaRows(BlockCodec.blockFromJson(s))).toDF(),
            ktCol = Some(("ktPresent", "keytype")))
        },
        Future {
          mergeSoft(store, "asset", Seq("id"),
            Seq("creator_addr", "params"),
            freshDs.flatMap(s => DeltaTransforms.assetDeltaRows(BlockCodec.blockFromJson(s))).toDF())
        },
        Future {
          mergeSoft(store, "account_asset", Seq("addr", "assetid"),
            Seq("amount", "frozen"),
            freshDs.flatMap(s => DeltaTransforms.accountAssetDeltaRows(BlockCodec.blockFromJson(s))).toDF())
        },
        Future {
          mergeSoft(store, "app", Seq("id"),
            Seq("creator", "params"),
            freshDs.flatMap(s => DeltaTransforms.appDeltaRows(BlockCodec.blockFromJson(s))).toDF())
        },
        Future {
          mergeSoft(store, "account_app", Seq("addr", "app"),
            Seq("localstate"),
            freshDs.flatMap(s => DeltaTransforms.accountAppDeltaRows(BlockCodec.blockFromJson(s))).toDF())
        },
        Future {
          mergeHard(store, "app_box", Seq("app", "name"), Seq("value"),
            freshDs.flatMap(s => DeltaTransforms.appBoxDeltaRows(BlockCodec.blockFromJson(s))).toDF())
        })
      Await.result(Future.sequence(writes), Duration.Inf)

      // B7 + watermark bump — the single commit point of the micro-batch.
      store.putMetastate(TableStore.MetaSpecialAccounts -> specialAccounts)
      store.setNextRound(lastRound + 1)
    } finally ds.unpersist()
  }

  /** EnsureInitialImport (helpers.go:11-48): first run seeds genesis;
    * restarts verify the network/genesis guard instead of reseeding; a
    * different network is a hard error. */
  def ensureInitialImport(
      store: TableStore,
      allocations: Seq[(String, Long, String)],
      network: String): Unit =
    store.metastate.get(TableStore.MetaNetwork) match {
      case None => initGenesis(store, allocations, network)
      case Some(existing) if existing == network => // already initialized
      case Some(existing) =>
        throw new IllegalStateException(
          s"genesis hash not matching the database: db=$existing, init=$network")
    }

  /** A2: genesis loader (cockroach.go:213-280) — seed `account` (one row
    * per allocation, created_at = 0), record network, import state = 0. */
  def initGenesis(
      store: TableStore,
      allocations: Seq[(String, Long, String)], // (addr, microalgos, accountDataJson)
      network: String): Unit = {
    val spark = store.spark
    import spark.implicits._
    val rows = allocations.map { case (addr, algos, data) =>
      AccountRow(addr, algos, 0, 0, deleted = false, created_at = 0,
        closed_at = None, keytype = None, account_data = Some(data))
    }
    val accountDf = conform(rows.toDF(), "account").localCheckpoint(true)
    val touched = (0 until store.nBuckets).toSeq
    store.writeStateBuckets("account", "addr", accountDf, touched)
    store.putMetastate(TableStore.MetaNetwork -> network)
    store.setNextRound(0L)
  }

  // ── helpers ─────────────────────────────────────────────────────────

  /** Cast to the authoritative table schema (case classes encode e.g.
    * BigDecimal as Decimal(38,18), the table stores Decimal(20,0)). */
  private[ingest] def conform(df: DataFrame, table: String): DataFrame = {
    val schema = TableStore.Schemas(table)
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  private def mergeSoft(
      store: TableStore, table: String, keys: Seq[String], payload: Seq[String],
      deltas: DataFrame, ktCol: Option[(String, String)] = None): Unit = {
    // one job: the touched-bucket set doubles as the emptiness check
    val touched = deltas
      .select(pmod(xxhash64(col(keys.head)), lit(store.nBuckets)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val state = store.readStateBuckets(table, touched)
    val merged = StateMerge.mergeSoftDelete(state, deltas, keys, payload, ktCol)
    // Sever lineage before overwriting the partitions we just read.
    // (Production on a real cluster: transactional table format or
    // write-to-staging + swap; localCheckpoint is the local-mode analogue.)
    val pinned = conform(merged, table).localCheckpoint(true)
    store.writeStateBuckets(table, keys.head, pinned, touched)
  }

  private def mergeHard(
      store: TableStore, table: String, keys: Seq[String], payload: Seq[String],
      deltas: DataFrame): Unit = {
    val touched = deltas
      .select(pmod(xxhash64(col(keys.head)), lit(store.nBuckets)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val state = store.readStateBuckets(table, touched)
    val merged = StateMerge.mergeHardDelete(state, deltas, keys, payload)
    val pinned = conform(merged, table).localCheckpoint(true)
    store.writeStateBuckets(table, keys.head, pinned, touched)
  }
}
