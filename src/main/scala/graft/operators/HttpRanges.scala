package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTTP 206 partial-content reassembly — archive fetchers resume
  * interrupted downloads with `Range:` requests, so one resource
  * arrives as N `(start, end)` byte slices that may be shuffled,
  * torn, or double-fetched. Reassembly is a per-resource fold:
  *
  *   - parts sort by `(start, end)` (`sort_array` over structs — the
  *     lexicographic struct order IS the byte order; arrival order is
  *     never trusted);
  *   - one `aggregate` pass walks the sorted parts tracking the
  *     expected next offset: `start > pos` records a GAP (tail
  *     truncation — `pos < total` at the end — is also a gap),
  *     `start < pos` records an OVERLAP (double-fetch), both can
  *     co-occur (`mixed`);
  *   - the body reassembles (parts joined in order) ONLY for a
  *     `complete` resource — a gapped body is corruption with a
  *     plausible length, worse than no body (the PDF ok-empty
  *     lesson).
  *
  * Verdict ∈ `complete | gap | overlap | mixed`. Scale: ONE shuffle
  * (the groupBy on the resource key) with map-side partial collect;
  * per-group memory is one resource's parts — bounded by document
  * size, same envelope as every decoder in the funnel. */
object HttpRanges {

  /** `(urlCol, verdict, n_parts, total_len, body)` per resource;
    * `body` is null unless complete. Column names in the output:
    * `verdict`, `n_parts`, `total_len`, `body`. */
  def reassemble(df: DataFrame, urlCol: String, startCol: String,
                 endCol: String, totalCol: String, partCol: String): DataFrame = {
    val grouped = df.groupBy(col(urlCol)).agg(
      sort_array(collect_list(struct(
        col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"),
        col(partCol).as("p")))).as("_parts"),
      max(col(totalCol)).cast("long").as("total_len"))
    val zero = struct(lit(0L).as("pos"), lit(false).as("gap"),
      lit(false).as("overlap"))
    val walked = aggregate(col("_parts"), zero, (st, x) => struct(
      greatest(st.getField("pos"), x.getField("e")).as("pos"),
      (st.getField("gap") || (x.getField("s") > st.getField("pos"))).as("gap"),
      (st.getField("overlap") || (x.getField("s") < st.getField("pos")))
        .as("overlap")))
    val withWalk = grouped.withColumn("_w", walked)
    val gap = col("_w").getField("gap") ||
      (col("_w").getField("pos") < col("total_len"))
    val overlap = col("_w").getField("overlap")
    val verdict = when(gap && overlap, "mixed")
      .when(gap, "gap")
      .when(overlap, "overlap")
      .otherwise("complete")
    withWalk
      .withColumn("verdict", verdict)
      .withColumn("n_parts", size(col("_parts")))
      .withColumn("body", when(col("verdict") === "complete",
        array_join(transform(col("_parts"), _.getField("p")), "")))
      .drop("_parts", "_w")
  }

  /** Convenience: same walk, body replaced by its md5 (the compare
    * form the funnels report). */
  def reassembleDigest(df: DataFrame, urlCol: String, startCol: String,
                       endCol: String, totalCol: String,
                       partCol: String): DataFrame =
    reassemble(df, urlCol, startCol, endCol, totalCol, partCol)
      .withColumn("body_md5", md5(col("body").cast("binary")))
      .drop("body")
}
