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
  *   carry the last non-null right payload forward with
  *   `last(_, ignoreNulls) over (rows unbounded preceding)`, keep the
  *   left rows.
  *
  * One exchange and one sort total — the same cost envelope a dedicated
  * as-of physical operator would pay, with Catalyst/Tungsten running
  * the sort and the window state being O(1) per payload column (no
  * buffering of the right side).
  *
  * Semantics notes:
  *   - `strict = false` (default) matches right rows with
  *     `right.t <= left.t` (DuckDB/pandas ASOF default); `strict = true`
  *     requires `right.t < left.t`.
  *   - ties among right rows at the same (key, t) resolve to the LAST
  *     payload under ascending payload order (deterministic; pre-dedupe
  *     the right side per (key, t) if another rule is wanted).
  *   - null join keys never match, as in SQL: Spark's window
  *     partitioning groups null keys together, so the carried payload
  *     is explicitly nulled for null-key left rows.
  *   - unmatched left rows keep null payloads (LEFT OUTER as-of).
  *   - internal column names (`_t`, `_side`, `_p_*`) and the output
  *     `asof_*` names must not collide with caller columns — enforced
  *     loudly.
  */
object AsOfJoin {

  def asofJoinLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   payloads: Seq[String], strict: Boolean = false): DataFrame = {
    require(payloads.nonEmpty, "need at least one right payload column")
    val reserved = Seq("_t", "_side") ++ payloads.map(p => s"_p_$p") ++
      payloads.map(p => s"asof_$p")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"caller columns collide with as-of internals: ${clash.mkString(", ")}")
    val leftOut = left.columns.toSeq
    val leftOnly = leftOut.filterNot(keys.contains)
    val rSchema = right.schema
    val lSchema = left.schema

    val l2 = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side")) ++
        payloads.map(p => lit(null).cast(rSchema(p).dataType).as(s"_p_$p")) ++
        leftOnly.map(col): _*)
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
        payloads.map(p => col(p).as(s"_p_$p")) ++
        leftOnly.map(c => lit(null).cast(lSchema(c).dataType).as(c)): _*)

    // inclusive: right (side 0) sorts BEFORE left at an equal time, so
    // the left row sees it; strict: left first, so it does not.
    val sideOrder = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc +: sideOrder +: payloads.map(p => col(s"_p_$p").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // a null key never matches (SQL semantics) — the window would group
    // null keys together, so null-key left rows get their payload nulled
    val keyIsNull = keys.map(col(_).isNull).reduceOption(_ || _).getOrElse(lit(false))
    l2.unionByName(r2)
      .select(col("*") +: payloads.map(p =>
        when(keyIsNull, lit(null))
          .otherwise(last(col(s"_p_$p"), ignoreNulls = true).over(w)).as(s"asof_$p")): _*)
      .filter(col("_side") === 1)
      .select(leftOut.map(col) ++ payloads.map(p => col(s"asof_$p")): _*)
  }
}
