package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Suite-level PLAN audit on the capstone queries — the class of
  * regression per-operator specs can't see: a query that still returns
  * the right rows while its plan rots (an extra corpus scan, a
  * mapPartitions leak into a declarative chain, or the round-14
  * plan-audit find — PushPredicateThroughNonJoin substituting a
  * multiply-referenced Column chain into a pushed filter until one
  * Filter node was a measured 66 KB of condition text and 20× the
  * runtime).
  *
  * Three instruments per capstone:
  *   - EXACT parquet-scan count (an extra scan = a lost reuse),
  *   - EXACT ExistingRDD count (mapPartitions escapes show up here;
  *     mm_corpus_build's single RDD scan is the ADJUDICATED heavy
  *     raster-decoder path, pinned at exactly one),
  *   - a cap on the largest single plan-node text (the 66 KB-condition
  *     class — any node past 8 KB means some chain got re-inlined).
  *
  * Plus the StreamingCrawl admission-plan shape (batch keys broadcast
  * INTO the ledger scan: BroadcastHashJoin, zero shuffle exchange) and
  * a sanity case proving the node-size cap actually catches the
  * re-composed pre-round-14 URL chain. */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Count detail-section nodes `(n) <name>` in a formatted plan. */
  private def countNodes(plan: String, name: String): Int =
    plan.linesIterator.count(_.matches(s"\\(\\d+\\) $name\\s*"))

  /** Largest single optimized-plan node description — the instrument
    * that measures the 66 KB-filter class directly. */
  private def maxNodeChars(df: DataFrame): Int =
    df.queryExecution.optimizedPlan
      .collect { case n => n.simpleString(Int.MaxValue).length }.max

  private val NodeCap = 8192

  private def audit(name: String, scans: Int, rdds: Int): Unit = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = formatted(df)
    assert(countNodes(plan, "Scan parquet") == scans,
      s"$name: expected exactly $scans parquet scans\n$plan")
    assert(countNodes(plan, "Scan ExistingRDD") == rdds,
      s"$name: expected exactly $rdds ExistingRDD scans\n$plan")
    val worst = maxNodeChars(df)
    assert(worst <= NodeCap,
      s"$name: largest plan node is $worst chars (> $NodeCap) — a Column " +
        "chain got re-inlined; make it a native expression or stage the selects")
  }

  test("pipeline_article_corpus: one scan, no RDD escape, bounded nodes") {
    audit("pipeline_article_corpus", scans = 1, rdds = 0)
  }

  test("pipeline_corpus_build: one scan, no RDD escape, bounded nodes") {
    audit("pipeline_corpus_build", scans = 1, rdds = 0)
  }

  test("mm_corpus_build: two scans plus exactly the one adjudicated decoder RDD") {
    audit("mm_corpus_build", scans = 2, rdds = 1)
  }

  test("StreamingCrawl admission plan: keys broadcast into the ledger scan, zero shuffle") {
    import spark.implicits._
    val dir = s"${tmpDir("graft-planaudit-ledger")}/seen"
    (1 to 100).map(i => (s"http://a.org/p$i", i.toLong))
      .toDF("canonical", "id").write.parquet(dir)
    val ledger = spark.read.parquet(dir).select("canonical")
    val batch = Seq(("http://a.org/p1", 1L), ("http://b.org/x", 2L))
      .toDF("canonical", "id")
    val (anti, semi, cps) = graft.streaming.BatchLedger.gatedAntiSemi(
      batch, ledger, batch.select("canonical"), Seq("canonical"), gate = true)
    for ((frame, label) <- Seq((anti, "anti"), (semi, "semi"))) {
      val plan = frame.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$label: the hit set must broadcast back into the batch join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$label: the admission path must never shuffle the ledger:\n$plan")
    }
    cps.foreach(_.unpersist(blocking = true))
  }

  test("sanity: the node cap catches the re-composed pre-round-14 URL chain") {
    import spark.implicits._
    // the replaced urlCanonicalize Column chain, verbatim shape: the
    // host/path/query extraction references the url argument ~6 times,
    // so composing it over a resolve step and pushing a filter through
    // re-inlines the whole upstream tree per reference
    def oldCanon(url: Column): Column = {
      val pat = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
      val scheme = lower(regexp_extract(url, pat, 1))
      val host0 = lower(regexp_extract(url, pat, 2))
      val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
        .when(scheme === "https", regexp_replace(host0, ":443$", ""))
        .otherwise(host0)
      val path0 = regexp_extract(url, pat, 3)
      val path = when(path0 === "", lit("/")).otherwise(path0)
      val q = array_join(
        array_sort(filter(split(regexp_extract(url, pat, 4), "&"),
          x => x =!= "" && !x.startsWith("utm_"))), "&")
      when(scheme === "", lit(null).cast("string"))
        .otherwise(concat(scheme, lit("://"), host, path,
          when(q === "", lit("")).otherwise(concat(lit("?"), q))))
    }
    // a REAL scan underneath — over a local literal relation the
    // optimizer constant-folds the whole chain away and nothing is
    // measured; the 66 KB class needs pushdown toward a data source
    val dir = s"${tmpDir("graft-planaudit-chain")}/pages"
    Seq(("http://a.org/", "x")).toDF("src", "raw").write.parquet(dir)
    val df = spark.read.parquet(dir)
    // composed + filtered: pushdown substitutes the chain into the
    // filter condition — exactly the 66 KB class
    val composed = df
      .select(col("src"),
        oldCanon(oldCanon(concat(col("src"), col("raw")))).as("url"))
      .filter(col("url").isNotNull && col("url") =!= col("src"))
    assert(maxNodeChars(composed) > NodeCap,
      "the audit must flag the re-composed chain (did the optimizer change?)")
    // the native-expression path stays bounded — same semantics, one node
    val native = df
      .select(col("src"),
        graft.operators.TextOps.urlCanonicalize(
          graft.operators.TextOps.urlCanonicalize(
            concat(col("src"), col("raw")))).as("url"))
      .filter(col("url").isNotNull && col("url") =!= col("src"))
    assert(maxNodeChars(native) <= NodeCap)
  }
}
