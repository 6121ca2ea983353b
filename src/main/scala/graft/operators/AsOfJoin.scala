package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for every left row, the LATEST right row at or before
  * its time (per key): the enrichment shape of event analytics (join
  * each event to the most recent state/price/reference row). Spark has
  * no native as-of join; this composes one from built-ins instead of a
  * custom SparkPlan, and the composition IS the classic sort-merge
  * as-of:
  *
  *   tag both sides, union, ONE shuffle+sort per (key, time, side),
  *   carry the last right row forward as a SINGLE struct with
  *   `last(_, ignoreNulls) over (rows unbounded preceding)`, keep the
  *   left rows, project the struct's fields.
  *
  * One exchange and one sort total — the same cost envelope a dedicated
  * as-of physical operator would pay, with Catalyst/Tungsten running
  * the sort and the window state being O(1) (one carried struct, no
  * buffering of the right side).
  *
  * The single-struct carry matters for correctness, not just cost: all
  * payload columns always come from the SAME right row, and a matched
  * right row whose payload column is NULL yields that null (per-column
  * `last(ignoreNulls)` would skip past it to an older right row, and
  * could mix fields from different right rows).
  *
  * Semantics notes:
  *   - `strict = false` (default) matches right rows with
  *     `right.t <= left.t` (DuckDB/pandas ASOF default); `strict = true`
  *     requires `right.t < left.t`.
  *   - ties among right rows at the same (key, t) resolve to the LAST
  *     row under ascending payload-struct order (deterministic;
  *     pre-dedupe the right side per (key, t) if another rule is
  *     wanted).
  *   - null join keys never match, as in SQL: Spark's window
  *     partitioning groups null keys together, so the carried payload
  *     is explicitly nulled for null-key left rows.
  *   - unmatched left rows keep null payloads (LEFT OUTER as-of).
  *   - internal column names (`_t`, `_side`, `_ps`, `_carried`) and the output
  *     `asof_*` names must not collide with caller columns — enforced
  *     loudly.
  *   - hot-key note: the window partitions by key only, so one
  *     pathologically hot key serializes into one task (CPU-bound, the
  *     frame is O(1), not memory-bound). If that ever dominates,
  *     pre-split hot keys by a coarse time slice and carry each slice's
  *     boundary right-row into the next slice before the window.
  */
object AsOfJoin {

  def asofJoinLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   payloads: Seq[String], strict: Boolean = false): DataFrame = {
    require(payloads.nonEmpty, "need at least one right payload column")
    val reserved = Seq("_t", "_side", "_ps", "_carried") ++ payloads.map(p => s"asof_$p")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"caller columns collide with as-of internals: ${clash.mkString(", ")}")
    val leftOut = left.columns.toSeq
    val leftOnly = leftOut.filterNot(keys.contains)
    val rSchema = right.schema
    val lSchema = left.schema
    val psType = org.apache.spark.sql.types.StructType(payloads.map(p => rSchema(p)))

    val l2 = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side"),
          lit(null).cast(psType).as("_ps")) ++
        leftOnly.map(col): _*)
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side"),
          struct(payloads.map(col): _*).as("_ps")) ++
        leftOnly.map(c => lit(null).cast(lSchema(c).dataType).as(c)): _*)

    // inclusive: right (side 0) sorts BEFORE left at an equal time, so
    // the left row sees it; strict: left first, so it does not.
    val sideOrder = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, sideOrder, col("_ps").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // a null key never matches (SQL semantics) — the window would group
    // null keys together, so null-key left rows get their payload nulled.
    // ignoreNulls skips the left rows' null struct but NOT a matched
    // right row's null field: the whole right row is carried as one value.
    val keyIsNull = keys.map(col(_).isNull).reduceOption(_ || _).getOrElse(lit(false))
    l2.unionByName(r2)
      .withColumn("_carried",
        when(keyIsNull, lit(null).cast(psType))
          .otherwise(last(col("_ps"), ignoreNulls = true).over(w)))
      .filter(col("_side") === 1)
      .select(leftOut.map(col) ++
        payloads.map(p => col("_carried").getField(p).as(s"asof_$p")): _*)
  }
}
