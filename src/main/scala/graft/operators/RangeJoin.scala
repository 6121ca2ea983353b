package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — left points joined to right INTERVALS that
  * contain them — without the BroadcastNestedLoop/cartesian product
  * Spark plans for a bare inequality join. The standard bucketization:
  * pick a bin width, explode each right interval into every bin it
  * overlaps, land each left point in its single bin, EQUI-join on
  * (keys, bin), then apply the exact containment predicate.
  *
  * Cost model (the 100 TB posture): the shuffle is hash-partitioned on
  * (keys, bin) like any equi-join; the right side inflates by
  * avg(interval span / binWidth + 1), and each candidate pair meets in
  * EXACTLY one bin (the left point's), so no post-join dedup is needed.
  * Pick binWidth near the typical interval span: too small inflates
  * the right side, too large degrades toward per-bin cartesian chunks.
  * Catalyst still prunes/pushes around the join since it is a plain
  * equi-join under the hood.
  */
object RangeJoin {

  /** Inner join `left` points to `right` intervals:
    * `left.pointCol ∈ [right.loCol, right.hiCol]` (inclusive both ends),
    * plus optional equi `keys`. Point and bounds must be numeric (bin
    * with longs — timestamps go through unix_micros upstream). Emits
    * left.* ++ right.* (minus the right's key columns).
    *
    * `maxBins` guards the explode: one open-ended sentinel interval
    * (`hi = Long.MaxValue`) or a binWidth picked for the wrong unit
    * would otherwise explode a single row into up to 2³¹ bins and kill
    * the job at 100 TB. Any interval spanning more than `maxBins` bins
    * fails FAST at the scan with an actionable message — cap open-ended
    * intervals at the domain's real maximum (e.g. `least(hi, maxTs)`)
    * or raise binWidth before joining. */
  def binnedIntervalJoin(left: DataFrame, right: DataFrame,
                         pointCol: String, loCol: String, hiCol: String,
                         binWidth: Long, keys: Seq[String] = Nil,
                         maxBins: Long = 10000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBins > 0, "maxBins must be positive")
    require(!left.columns.contains("_bin") && !right.columns.contains("_bin"),
      "a caller column named _bin would be silently overwritten and dropped")
    val l = left.withColumn("_bin", floor(col(pointCol) / binWidth))
    val loBin = floor(col(loCol) / binWidth)
    val hiBin = floor(col(hiCol) / binWidth)
    // null bounds stay a null sequence (explode drops the row, as before);
    // a REVERSED interval (hi < lo — corrupted or sentinel-swapped row)
    // is dropped the same way BEFORE the span check: its negative span
    // would pass the guard while sequence(lo, hi) counts DOWN and can
    // explode into up to 2^31 bins — and such a row can never satisfy
    // the containment filter anyway
    val guarded = when(hiBin < loBin, lit(null).cast("array<bigint>"))
      .when(coalesce(hiBin - loBin < lit(maxBins), lit(true)),
        sequence(loBin, hiBin))
      .otherwise(raise_error(concat(
        lit(s"range-join interval spans more than $maxBins bins of width $binWidth: ["),
        col(loCol), lit(", "), col(hiCol),
        lit("] — cap open-ended intervals at the domain max or raise binWidth"))))
    val r = right.withColumn("_bin", explode(guarded))
    l.join(r, keys :+ "_bin", "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
