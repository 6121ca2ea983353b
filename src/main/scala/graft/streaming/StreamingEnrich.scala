package graft.streaming

import graft.ingest.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming AS-OF enrichment — joining a live stream against the
  * engine's MAINTAINED tables (state, append tables, metastate) without
  * torn reads. The hazard it exists for: a micro-batch that reads a
  * store table twice (or lazily, after the join plan finally executes)
  * while the concurrent ingest pipeline commits between those reads
  * would enrich half its rows against the old table and half against
  * the new one. Reference posture analogue: the read API pins one
  * `round` for a whole paged query (`idb.go` result paging); here the
  * pin is one metadata-log version for a whole micro-batch.
  *
  * Composition, not new machinery: `foreachBatch` (the per-batch driver
  * hook) + `TableStore.readAsOf`/`metastateAt` (the snapshot read path
  * the batch engine already has). The version is captured ONCE per
  * batch; every read through the [[Snapshot]] resolves manifests from
  * that version, so later commits are invisible no matter when Spark
  * actually executes the enrichment plan — the manifest's file list is
  * materialized at snapshot-read time, and data files are immutable
  * (append tables never rewrite in place).
  *
  * Scale: the snapshot read is a plain pruned parquet scan (same as the
  * batch path), the stream side is batch-sized, and nothing here adds
  * state — enrichment output is Append-mode by construction.
  */
object StreamingEnrich {

  /** A store view pinned to one metadata-log version. Every read is
    * as-of that version: a commit landing mid-batch cannot tear the
    * batch's enrichment, and two reads of the same table in one batch
    * always agree. */
  final case class Snapshot(store: TableStore, version: Long) {
    /** Append table as of the pinned version (manifest-subset scan). */
    def read(table: String): DataFrame = store.readAsOf(table, version)
    /** Metastate as of the pinned version. */
    def metastate: Map[String, String] = store.metastateAt(version)
  }

  /** Start a streaming query whose every micro-batch is enriched
    * against ONE pinned [[Snapshot]] of `store` (captured at batch
    * start, so each batch sees the freshest COMPLETE commit, and only
    * that). `enrich` builds the enriched frame; `sink` lands it
    * (idempotent by batchId, the usual exactly-once contract). */
  def enrichEachBatch(stream: DataFrame, store: TableStore,
                      checkpointDir: Option[String] = None)
                     (enrich: (DataFrame, Snapshot) => DataFrame)
                     (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val snap = Snapshot(store, store.metaVersion)
        sink(enrich(batch, snap), batchId)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
