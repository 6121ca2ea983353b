package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The C-family stateful merge (SURVEY.md §2.C): keyed last-writer-wins
  * upsert with SCD-style lineage columns, reproducing the reference's 15
  * `INSERT ... ON CONFLICT (pk) DO UPDATE` prepared statements
  * (writer.go:39-114) as one declarative full-outer merge:
  *
  *   - payload columns: last delta in round order wins; absent key keeps
  *     current state (ON CONFLICT updates only payload columns);
  *   - `created_at`: preserved from the first insert (never in any UPDATE
  *     list) — `coalesce(state.created_at, first delta round)`;
  *   - `closed_at`: set by deletes only — `coalesce(last delete round,
  *     state.closed_at)`; a re-create does NOT clear it (upsert statements
  *     do not touch closed_at);
  *   - `deleted`: whatever the last operation says;
  *   - `keytype` (account only): updated only by deltas that carry a
  *     keytype change, preserved otherwise — including across deletes
  *     (delete_account vs delete_account_update_keytype, writer.go:62-76;
  *     pinned by the reference's keytype-preservation test);
  *   - a delete for a never-seen key still inserts a tombstone row with
  *     created_at = closed_at = round (the create-delete-same-round family
  *     of golden tests).
  *
  * Scale notes: the merge is a single shuffle on the primary key (the
  * delta side is reduced map-side first). graft.ingest.TableStore stores
  * state hash-bucketed on the key so only touched buckets are read and
  * rewritten — merge cost tracks batch size, not accumulated state size.
  */
object StateMerge {

  /** Reduce a delta frame to one row per key: final payload by round order,
    * plus `_first_round` / `_last_delete_round` lineage aggregates.
    * `ktCol` marks the optional presence-gated column (account.keytype).
    *
    * Ordering is (round, seq) desc: `seq` is the statement's position
    * within its block, so two statements for the same key in one block
    * resolve to the later one — the order the reference applies them in —
    * instead of an arbitrary tie pick. Frames without a seq column (ad-hoc
    * callers) fall back to round-only ordering.
    */
  def reduceDeltas(deltas: DataFrame, keys: Seq[String], ktCol: Option[(String, String)]): DataFrame = {
    val keyCols = keys.map(col)
    val ord =
      if (deltas.columns.contains("seq")) Seq(desc("round"), desc("seq"))
      else Seq(desc("round"))
    val w = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
    val lineage = deltas.groupBy(keyCols: _*).agg(
      min("round").as("_first_round"),
      max(when(col("isDelete"), col("round"))).as("_last_delete_round"))
    val last = deltas
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val withLineage = last.join(lineage, keys)
    ktCol match {
      case Some((presentCol, valueCol)) =>
        val ktLast = deltas
          .filter(col(presentCol))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .select(keyCols :+ col(valueCol).as("_kt_value") :+ lit(true).as("_kt_present"): _*)
        withLineage
          .drop(presentCol, valueCol)
          .join(ktLast, keys, "left_outer")
      case None => withLineage
    }
  }

  /** Full-outer merge of current state with reduced deltas.
    *
    * @param payload  payload column names (delta overwrites state)
    * @param ktCol    optional presence-gated column kept from state unless
    *                 a delta carried it
    */
  def mergeSoftDelete(
      state: DataFrame,
      deltas: DataFrame,
      keys: Seq[String],
      payload: Seq[String],
      ktCol: Option[(String, String)] = None): DataFrame = {
    val reduced = reduceDeltas(deltas, keys, ktCol).withColumn("_in_batch", lit(true))
    val d = reduced.columns.filterNot(keys.contains).foldLeft(reduced) {
      (df, c) => df.withColumnRenamed(c, s"_d_$c")
    }
    val joined = state.join(d, keys, "full_outer")
    val inBatch = coalesce(col("_d__in_batch"), lit(false))

    def pick(c: String): Column = when(inBatch, col(s"_d_$c")).otherwise(col(c)).as(c)

    val outCols: Seq[Column] =
      keys.map(col) ++
        payload.map(pick) ++
        Seq(
          when(inBatch, col("_d_isDelete")).otherwise(col("deleted")).as("deleted"),
          coalesce(col("created_at"), col("_d__first_round")).as("created_at"),
          coalesce(col("_d__last_delete_round"), col("closed_at")).as("closed_at")) ++
        ktCol.map { case (_, valueCol) =>
          when(coalesce(col("_d__kt_present"), lit(false)), col("_d__kt_value"))
            .otherwise(col(valueCol)).as(valueCol)
        }.toSeq

    joined.select(outCols: _*)
  }

  /** app_box semantics (C7): plain upsert, HARD delete (`DELETE FROM`),
    * no lineage columns (writer.go:108-113, delete matrix golden tests). */
  def mergeHardDelete(
      state: DataFrame,
      deltas: DataFrame,
      keys: Seq[String],
      payload: Seq[String]): DataFrame = {
    val reduced = reduceDeltas(deltas, keys, None).withColumn("_in_batch", lit(true))
    val d = reduced.columns.filterNot(keys.contains).foldLeft(reduced) {
      (df, c) => df.withColumnRenamed(c, s"_d_$c")
    }
    val joined = state.join(d, keys, "full_outer")
    val inBatch = coalesce(col("_d__in_batch"), lit(false))
    joined
      .filter(!(inBatch && col("_d_isDelete"))) // hard delete drops the row
      .select(keys.map(col) ++ payload.map(c =>
        when(inBatch, col(s"_d_$c")).otherwise(col(c)).as(c)): _*)
  }
}
