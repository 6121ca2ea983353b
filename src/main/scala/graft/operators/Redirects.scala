package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Redirect-chain resolution — the frontier stage between fetching and
  * admission: a crawl that stores `/old → /new` responses must resolve
  * every frontier URL to its FINAL target before dedup (the canonical
  * seen-set must key on where content actually lives) and must bound
  * the walk (redirect loops are a live-site reality, not a data bug).
  *
  * Relational shape: the edge table `(src, dst)` is one row per
  * redirecting URL; resolution is `maxHops` successive left joins of
  * the frontier's current target against it — each join advances every
  * still-redirecting row one hop while resolved rows pass through
  * unchanged (their target has no outgoing edge). A final probe join
  * classifies rows whose target STILL redirects after `maxHops` as
  * `redirect_loop`. At 100 TB both frames are corpus-sized hash joins
  * on the URL key (broadcast when the edge side is small — chains are
  * rare); for deep chains compose the EDGE table with itself log2(k)
  * times (doubling) instead of k frontier joins — real chains are
  * 1–3 hops, so the linear walk is the honest default. */
object Redirects {

  /** Resolve `urls[urlCol]` through `edges(srcCol → dstCol)` for at
    * most `maxHops` hops. Output: the input columns plus `final_url`,
    * `n_hops` (edges actually followed, ≤ maxHops), and `status`
    * (`resolved` | `redirect_loop` — the latter meaning the final
    * target still has an outgoing edge, i.e. a cycle or a chain longer
    * than the bound). Contract: `srcCol` must be unique in `edges` (an
    * HTTP URL has ONE redirect target) — a duplicate src would fan out
    * frontier rows at its hop. */
  def resolve(urls: DataFrame, urlCol: String, edges: DataFrame,
              srcCol: String, dstCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1 (got $maxHops)")
    val e = edges.select(col(srcCol).cast("string").as("_src"),
      col(dstCol).cast("string").as("_dst"))
    var cur = urls
      .withColumn("final_url", col(urlCol).cast("string"))
      .withColumn("n_hops", lit(0L))
    for (i <- 0 until maxHops) {
      // fresh alias per round: re-joining one DataFrame instance against
      // its own previous join output trips self-join ambiguity
      val eR = e.select(col("_src").as(s"_s$i"), col("_dst").as(s"_d$i"))
      cur = cur.join(eR, cur("final_url") === col(s"_s$i"), "left_outer")
        .withColumn("n_hops",
          col("n_hops") + when(col(s"_d$i").isNotNull, 1L).otherwise(0L))
        .withColumn("final_url", coalesce(col(s"_d$i"), col("final_url")))
        .drop(s"_s$i", s"_d$i")
    }
    val probe = e.select(col("_src").as("_sp")).distinct()
    cur.join(probe, cur("final_url") === col("_sp"), "left_outer")
      .withColumn("status",
        when(col("_sp").isNotNull, lit("redirect_loop")).otherwise(lit("resolved")))
      .drop("_sp")
  }
}
