package graft.streaming

import graft.ingest.MetaLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-partitioned durable ledger with ATOMIC compaction — the shared
  * storage shape under the streaming verticals' cross-batch memory (the
  * crawl seen-set, the heavy-hitters cell deltas): per micro-batch one
  * `batch=<id>` parquet partition (dynamic overwrite ⇒ replay
  * idempotent), periodically folded into a BASE snapshot.
  *
  * The old fold rewrote the live directory in place (localCheckpoint the
  * read, static-overwrite the same path) — a crash between the
  * overwrite's delete and its commit lost the only copy, and a batch
  * committed mid-rewrite was deleted with it. This is the MetaLog
  * pointer pattern instead (the [[graft.ingest.VectorIndex]] compaction
  * shape): the compacted rows land in a fresh SIBLING dir
  * `<root>/base/g<uuid>`, then ONE atomic MetaLog append flips the
  * pointer `(baseDir, horizon)`, then absorbed partitions delete. Every
  * window is safe: crash before the append leaves an orphan dir the next
  * compaction sweeps (the pointer still names the old state); crash
  * after it leaves absorbed partitions on disk that the horizon filter
  * already excludes; a batch committed DURING compaction writes
  * `batch ≥ belowBatch`, which the compactor neither reads nor deletes.
  *
  * Readers resolve `pointer.base ∪ live partitions in [horizon,
  * belowBatch)` — no lock, no stop-the-stream. The one retained
  * contract (same as every replayable ledger here): `belowBatch` must
  * sit at or below the stream's replayable horizon, because a replayed
  * batch whose rows were absorbed would re-derive them against a base
  * that already contains them. Compaction itself is single-maintainer
  * (concurrent compactors could sweep each other's uncommitted dirs —
  * the [[graft.ingest.VectorIndex.vacuum]] contract). */
object BatchLedger {

  private def parsePointer(v: String): (String, Long) = {
    val i = v.lastIndexOf(' ')
    (v.substring(0, i), v.substring(i + 1).toLong)
  }

  /** Sentinel pointer value meaning "no base, no horizon" — MetaLog has
    * no key deletion (set-only KV), so a rebuild that must UNDO a
    * committed compaction appends this instead. */
  private val Cleared = "-"

  /** Current (relative base dir, horizon): batches `< horizon` live in
    * the base, partitions `≥ horizon` are authoritative on disk. */
  def pointer(rootDir: String, key: String): Option[(String, Long)] =
    new MetaLog(rootDir).state().get(key).filterNot(_ == Cleared).map(parsePointer)

  /** Atomically clear the pointer: readers fall back to live partitions
    * only (horizon −∞, no base) — the rebuild-from-scratch commit point.
    * No-op (no append) when the pointer is already absent/cleared. */
  def resetPointer(rootDir: String, key: String): Unit =
    if (pointer(rootDir, key).isDefined)
      new MetaLog(rootDir).append(Seq(key -> Cleared))

  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = hadoopFs(spark, path)
    fs.exists(p)
  }

  /** Read a parquet dir that may legitimately be absent or hollow.
    * ONLY the two benign shapes map to `None`: the dir does not exist,
    * or schema inference finds no data files (an all-absorbed live dir
    * holding just `_SUCCESS` — Spark raises `AnalysisException` there).
    * Anything else — a corrupt footer, a permission error, a transient
    * FS/object-store failure on a COMMITTED base dir — propagates:
    * swallowing it would silently serve empty ledger state (a crawl
    * seen-set that re-admits everything, a heavy-hitters fold that
    * undercounts), which is a correctness loss, not a robustness win. */
  /** Inferred-schema cache keyed on the ledger path: the streaming
    * verticals read the SAME ledger dirs once per micro-batch, and each
    * uncached read pays a footer schema-inference job (~30-60 ms of
    * driver+job time; several ledgers per batch across every
    * `engine_stream_*` line). A ledger's schema never changes across
    * batches (the writer contract), so the first successful inference
    * is authoritative for the path's lifetime. The schema always comes
    * from the actual files — never from a caller-declared twin, whose
    * latent width mismatches (int vs long) would turn into read
    * failures. Entries are path-keyed and tiny; ledger paths are
    * per-invocation temp dirs, so the map stays small and never stale
    * (the one same-path rebuild, prefixIndexBuild, recreates the same
    * schema). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private[streaming] def cachedRead(spark: SparkSession, path: String): DataFrame = {
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
  }

  private def tryRead(spark: SparkSession, path: String): Option[DataFrame] =
    if (!exists(spark, path)) None
    else
      try Some(cachedRead(spark, path))
      catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** base ∪ live partitions with `horizon ≤ batch < belowBatch`; `empty`
    * when neither exists. Base rows surface with `batch = -1` so callers
    * keep one schema whether a row came from the snapshot or a live
    * partition (they only touch the data columns). */
  def read(spark: SparkSession, rootDir: String, sub: String, key: String,
           belowBatch: Option[Long], empty: => DataFrame): DataFrame = {
    val ptr = pointer(rootDir, key)
    val horizon = ptr.map(_._2).getOrElse(Long.MinValue)
    val base = ptr.flatMap { case (rel, _) => tryRead(spark, s"$rootDir/$rel") }
      .map(_.withColumn("batch", lit(-1L)))
    val live = tryRead(spark, s"$rootDir/$sub").map { df =>
      // partition columns read back INT; normalize so the union with the
      // base's literal -1L resolves to one type
      val norm = df.withColumn("batch", col("batch").cast("long"))
      belowBatch.foldLeft(norm.filter(col("batch") >= horizon)) {
        (d, b) => d.filter(col("batch") < b)
      }
    }
    (base, live) match {
      case (Some(b), Some(l)) => l.unionByName(b.select(l.columns.map(col): _*))
      case (Some(b), None)    => b
      case (None, Some(l))    => l
      case (None, None)       => empty
    }
  }

  /** Fold the current base plus live partitions with `horizon ≤ batch <
    * belowBatch` through `absorb` into a new base generation and commit
    * it atomically; then sweep the absorbed partitions and every base
    * dir the new pointer does not reference (which also collects any
    * orphan a crashed earlier attempt left). `absorb` is where a ledger
    * states its merge algebra: identity for disjoint-key ledgers (crawl
    * canonicals admit once), an aggregating fold for delta ledgers
    * (heavy-hitters cells sum). Returns the new base dir. */
  def compact(spark: SparkSession, rootDir: String, sub: String, key: String,
              belowBatch: Long, absorb: DataFrame => DataFrame = identity): String = {
    val cur = pointer(rootDir, key)
    val horizon = cur.map(_._2).getOrElse(Long.MinValue)
    require(belowBatch > horizon,
      s"belowBatch $belowBatch must exceed the committed horizon $horizon")
    val base = cur.flatMap { case (rel, _) => tryRead(spark, s"$rootDir/$rel") }
    val live = tryRead(spark, s"$rootDir/$sub").map(
      _.filter(col("batch").cast("long") >= horizon &&
        col("batch").cast("long") < belowBatch).drop("batch"))
    val union = (base.toSeq ++ live.toSeq).reduceOption(_ unionByName _)
      .getOrElse(throw new IllegalStateException(
        s"nothing to compact under $rootDir ($sub, $key)"))
    // base generations are namespaced PER SUB-LEDGER: several ledgers
    // can share one rootDir (the prefix index keeps sets + prefix side
    // by side), and the orphan sweep below must never collect a sibling
    // ledger's committed generation
    val rel = s"base/$sub/g${java.util.UUID.randomUUID().toString.take(8)}"
    absorb(union).write.mode("errorifexists").parquet(s"$rootDir/$rel")
    new MetaLog(rootDir).append(Seq(key -> s"$rel $belowBatch")) // the commit point
    // post-commit sweep; a crash here only leaves dirs the pointer ignores
    val (fs, liveP) = hadoopFs(spark, s"$rootDir/$sub")
    if (fs.exists(liveP)) fs.listStatus(liveP).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("batch=")) {
        val b = scala.util.Try(n.stripPrefix("batch=").toLong).getOrElse(Long.MaxValue)
        // anything under the NEW horizon is by definition absorbed (this
        // compaction) or stale (below the old horizon — left by a prior
        // crash-after-commit, invisible to readers but otherwise
        // accumulating forever); sweep it all
        if (b < belowBatch) fs.delete(st.getPath, true)
      }
    }
    val (bfs, baseP) = hadoopFs(spark, s"$rootDir/base/$sub")
    if (bfs.exists(baseP)) bfs.listStatus(baseP).foreach { st =>
      if (s"base/$sub/${st.getPath.getName}" != rel) bfs.delete(st.getPath, true)
    }
    s"$rootDir/$rel"
  }

  /** Row cap for batch-side broadcast admission — the pre-existing 2M
    * gate every streaming vertical used. */
  val MaxBroadcastRows: Long = 2000000L

  /** BYTE cap for batch-side broadcast admission. The row cap alone was
    * calibrated on 8-byte id frames; the ledger discipline also
    * broadcasts URL/string-key frames, and 2M canonical URLs at 100+
    * bytes each is hundreds of MB per broadcast, several times per
    * micro-batch — memory pressure right at the gate boundary. 64 MiB
    * of key payload (~640k 100-byte URLs) keeps every broadcast in the
    * territory the row gate intended; past it the big-big sort-merge
    * floor is the honest plan. */
  val MaxBroadcastKeyBytes: Long = 64L << 20

  /** Byte-aware broadcast admission gate: ONE aggregate pass over a
    * (typically already-checkpointed) key frame counting rows and key
    * payload bytes — `octet_length` for string/binary columns, a flat 8
    * bytes for fixed-width ones. True iff BOTH `rows ≤ maxRows` and
    * `bytes ≤ maxBytes`: an id-only frame passes at the full row cap
    * (16 MB of longs), a long-URL frame trips the byte cap far earlier.
    * This is the gate every `gatedProbe`/`gatedAntiSemi` caller should
    * compute over the frame whose columns actually ride the broadcasts
    * it guards (or a byte-superset of them). */
  def broadcastable(keys: DataFrame, byteCols: Seq[String],
                    maxRows: Long = MaxBroadcastRows,
                    maxBytes: Long = MaxBroadcastKeyBytes): Boolean = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val widths = byteCols.map { c =>
      keys.schema(c).dataType match {
        case StringType | BinaryType => coalesce(octet_length(col(c)).cast("long"), lit(0L))
        case _                       => lit(8L)
      }
    }
    val row = keys.agg(count(lit(1)).as("n"),
      sum(widths.reduceOption(_ + _).getOrElse(lit(0L))).as("b")).head()
    val n = row.getLong(0)
    val b = if (row.isNullAt(1)) 0L else row.getLong(1)
    n <= maxRows && b <= maxBytes
  }

  /** The gated ledger-probe discipline, in one place — seven streaming
    * sites hand-rolled this shape through rounds 13-14 and two of the
    * round-14 self-review bugs (an ungated broadcast, a drain-order
    * slip) were exactly that duplication biting.
    *
    * The invariant: CORPUS-sized ledger state must never shuffle per
    * micro-batch. When the batch is small (`gate` — compute it with
    * [[broadcastable]] over the batch keys), the batch's keys broadcast
    * INTO the ledger scan (`left_semi` builds its RIGHT ⇒ the ledger
    * streams map-side, zero ledger shuffle), the ≤batch-sized hit set
    * is folded (`fold` states the ledger's merge algebra: identity for
    * admit-once key sets, `groupBy.sum` for delta ledgers,
    * `groupBy.min` for hop depths), checkpointed, and handed back
    * broadcast-wrapped for the join against the batch. Past the gate —
    * a backfill batch — the folded FULL ledger returns unwrapped and
    * the big-big sort-merge join is the floor.
    *
    * `batchKeys` must be distinct or naturally unique (callers either
    * `.distinct()` or pass keys a `groupBy` already deduped — no hidden
    * distinct here, so no extra exchange on the already-unique sites).
    *
    * CONTRACT: `fold` must be ROW-NON-INCREASING — a merge algebra
    * (identity / groupBy.sum / groupBy.min / groupBy.max over the hit
    * set), never a join, explode, or generator. The gate admits a
    * broadcast because |hits| ≤ |batchKeys| ≤ the byte-aware cap; an
    * expanding fold would broadcast PAST the admission gate this
    * helper exists to enforce, silently. Every in-repo fold is a
    * shrink; new callers own keeping it that way. Returns `(probe side
    * ready to join, checkpoints for the caller to unpersist when the
    * batch is done)`. */
  def gatedProbe(ledger: DataFrame, batchKeys: DataFrame, keyCols: Seq[String],
                 gate: Boolean,
                 fold: DataFrame => DataFrame = identity): (DataFrame, Seq[DataFrame]) =
    if (gate) {
      val hits = fold(ledger.join(broadcast(batchKeys), keyCols, "left_semi"))
        .localCheckpoint()
      (broadcast(hits), Seq(hits))
    } else (fold(ledger), Seq.empty)

  /** [[gatedProbe]] + the anti/semi pair against the batch — the
    * admission shape itself: `anti` = batch rows whose keys the ledger
    * has never seen (admit), `semi` = rows it has (duplicate). Both are
    * LAZY — a caller using only one pays only for that one. */
  def gatedAntiSemi(batch: DataFrame, ledger: DataFrame, batchKeys: DataFrame,
                    keyCols: Seq[String], gate: Boolean)
      : (DataFrame, DataFrame, Seq[DataFrame]) = {
    val (probe, cps) = gatedProbe(ledger, batchKeys, keyCols, gate)
    (batch.join(probe, keyCols, "left_anti"),
      batch.join(probe, keyCols, "left_semi"), cps)
  }
}
