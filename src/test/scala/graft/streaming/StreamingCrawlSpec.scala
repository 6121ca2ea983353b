package graft.streaming

import graft.SparkSpec
import graft.operators.Robots
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the streaming crawl admission vertical: canonical-URL frontier
  * identity (differently-spelled re-fetches collapse), robots gating,
  * within-batch and cross-batch dedup, replay idempotence of the seen
  * ledger, and byte-identical WARC shard replay. */
class StreamingCrawlSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("url", StringType, nullable = true),
    StructField("blob", BinaryType, nullable = true)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private def page(s: String) = s.getBytes("UTF-8")

  private def rules = {
    import spark.implicits._
    Robots.rulesFrame(
      Seq(("a.org", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"))
        .toDF("domain", "txt"), "domain", "txt")
  }

  private def outcomes(m: org.apache.spark.sql.DataFrame): Map[Long, String] =
    m.collect().map(r => r.getLong(0) -> r.getString(4)).toMap

  test("canonicalize, robots gate, batch + ledger dedup, replay idempotence") {
    val ledger = tmpDir("graft-scrawl-ledger")
    val shards = tmpDir("graft-scrawl-shards")
    val batch0 = df(Seq(
      Row(1L, "HTTP://A.ORG:80/x?b=2&a=1#frag", page("one")),
      Row(2L, "http://a.org/x?a=1&b=2", page("one again")), // same canonical as 1
      Row(3L, "http://a.org/private/secret", page("blocked")),
      Row(4L, "http://a.org/private/ok/fine", page("allowed by Allow")),
      Row(5L, "not a url at all", page("junk")),
      Row(6L, "http://a.org/y", page("two"))))
    val m0 = StreamingCrawl.processBatch(batch0, 0L, "id", "url", "blob",
      rules, "graftbot", ledger, Some(shards))
    val o0 = outcomes(m0)
    m0.unpersist(false)
    assert(o0 == Map(1L -> "admitted", 2L -> "duplicate", 3L -> "robots_blocked",
      4L -> "admitted", 5L -> "invalid", 6L -> "admitted"))

    // batch 1: a re-fetch of 1's canonical spelled a THIRD way, plus a
    // fresh page; the ledger must reject the former only
    val batch1 = df(Seq(
      Row(11L, "http://a.org:80/x?b=2&a=1&utm_source=z", page("one re-fetched")),
      Row(12L, "http://a.org/z", page("three"))))
    val m1 = StreamingCrawl.processBatch(batch1, 1L, "id", "url", "blob",
      rules, "graftbot", ledger, Some(shards))
    val o1 = outcomes(m1)
    m1.unpersist(false)
    assert(o1 == Map(11L -> "duplicate", 12L -> "admitted"))

    // replay batch 1 (failure recovery): same outcomes, ledger does not
    // double-admit, and the WARC shard bytes are byte-identical
    val before = spark.read.parquet(s"$shards/warcs").filter(col("batch") === 1)
      .select("shard", "warc").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val m1r = StreamingCrawl.processBatch(batch1, 1L, "id", "url", "blob",
      rules, "graftbot", ledger, Some(shards))
    assert(outcomes(m1r) == o1, "replayed batch must reproduce its outcomes")
    m1r.unpersist(false)
    val after = spark.read.parquet(s"$shards/warcs").filter(col("batch") === 1)
      .select("shard", "warc").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(after == before, "replayed WARC shards must be byte-identical")
    val seen = spark.read.parquet(s"$ledger/seen")
    assert(seen.count() == seen.select("canonical").distinct().count(),
      "replay must not double-admit a canonical")

    // the admitted pages are really in the archives: parse every shard
    // back and check payload identity for arrival 6
    val all = spark.read.parquet(s"$shards/warcs").select("warc").collect()
      .flatMap(r => graft.codec.WarcCodec.parse(r.getAs[Array[Byte]](0)).get)
    val by = all.map(r => r.recordId -> new String(r.payload, "UTF-8")).toMap
    assert(by("urn:graft:000000000006") == "two")
    assert(by.keySet == Set(1L, 4L, 6L, 12L).map(i => f"urn:graft:$i%012d"),
      "exactly the four admitted pages are archived")
  }

  test("compact: absorbed partitions fold into the base; admission unchanged") {
    val ledger = tmpDir("graft-scrawl-lc")
    def b(id: Long, path: String) = Row(id, s"http://a.org/$path", page(path))
    val m0 = StreamingCrawl.processBatch(df(Seq(b(1L, "p0"), b(2L, "p1"))),
      0L, "id", "url", "blob", rules, "graftbot", ledger)
    m0.unpersist(false)
    val m1 = StreamingCrawl.processBatch(df(Seq(b(3L, "p2"))),
      1L, "id", "url", "blob", rules, "graftbot", ledger)
    m1.unpersist(false)
    StreamingCrawl.compact(spark, ledger, belowBatch = 1L)
    val ptr = BatchLedger.pointer(ledger, StreamingCrawl.SeenPointerKey)
    assert(ptr.exists(_._2 == 1L), s"pointer must commit horizon 1: $ptr")
    val liveParts = new java.io.File(s"$ledger/seen").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(liveParts == Set("batch=1"), s"batch 0 absorbed, batch 1 intact: $liveParts")
    val seen = BatchLedger.read(spark, ledger, "seen",
      StreamingCrawl.SeenPointerKey, None, empty = spark.emptyDataFrame)
    assert(seen.count() == 3, "compaction must not lose or duplicate keys")
    // admission against the compacted ledger: every earlier canonical
    // still rejects, a fresh one still admits
    val m2 = StreamingCrawl.processBatch(
      df(Seq(b(11L, "p0"), b(12L, "p2"), b(13L, "p9"))),
      2L, "id", "url", "blob", rules, "graftbot", ledger)
    assert(outcomes(m2) == Map(11L -> "duplicate", 12L -> "duplicate",
      13L -> "admitted"))
    m2.unpersist(false)
    // second-generation compaction absorbs the old base + batches 1-2
    StreamingCrawl.compact(spark, ledger, belowBatch = 3L)
    assert(BatchLedger.pointer(ledger, StreamingCrawl.SeenPointerKey)
      .exists(_._2 == 3L))
    assert(new java.io.File(s"$ledger/base/seen").listFiles().count(_.isDirectory) == 1,
      "the superseded base generation must be swept")
    val m3 = StreamingCrawl.processBatch(df(Seq(b(21L, "p9"), b(22L, "pA"))),
      3L, "id", "url", "blob", rules, "graftbot", ledger)
    assert(outcomes(m3) == Map(21L -> "duplicate", 22L -> "admitted"))
    m3.unpersist(false)
  }

  test("compact is crash-safe and live: mid-compact batch survives, orphan base swept") {
    val ledger = tmpDir("graft-scrawl-lx")
    def b(id: Long, path: String) = Row(id, s"http://a.org/$path", page(path))
    StreamingCrawl.processBatch(df(Seq(b(1L, "q0"))), 0L,
      "id", "url", "blob", rules, "graftbot", ledger).unpersist(false)
    // a crashed earlier compaction attempt: base dir written, pointer
    // NEVER committed — must be invisible to reads and swept by the next
    // successful compaction
    import spark.implicits._
    Seq(("http://a.org/ghost", 99L)).toDF("canonical", "id")
      .write.parquet(s"$ledger/base/seen/gdeadbeef")
    val mG = StreamingCrawl.processBatch(df(Seq(b(2L, "ghost"))), 1L,
      "id", "url", "blob", rules, "graftbot", ledger)
    assert(outcomes(mG) == Map(2L -> "admitted"),
      "an uncommitted base generation must not shadow admissions")
    mG.unpersist(false)
    // the mid-compact arrival: batch 2 commits while the compactor (which
    // absorbs only batch < 2) runs — its partition must survive the sweep
    StreamingCrawl.processBatch(df(Seq(b(3L, "q2"))), 2L,
      "id", "url", "blob", rules, "graftbot", ledger).unpersist(false)
    StreamingCrawl.compact(spark, ledger, belowBatch = 2L)
    val liveParts = new java.io.File(s"$ledger/seen").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(liveParts == Set("batch=2"), s"the in-flight batch survives: $liveParts")
    val baseDirs = new java.io.File(s"$ledger/base/seen").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(!baseDirs.contains("gdeadbeef") && baseDirs.size == 1,
      s"orphan swept, one committed generation: $baseDirs")
    // ledger contents: exactly the three admitted canonicals, ghost's
    // uncommitted row gone with its orphan dir
    val seen = BatchLedger.read(spark, ledger, "seen",
      StreamingCrawl.SeenPointerKey, None, empty = spark.emptyDataFrame)
    assert(seen.select("canonical").as[String].collect().sorted.toSeq ==
      Seq("http://a.org/ghost", "http://a.org/q0", "http://a.org/q2"))
  }

  test("politeness: per-host pacing from robots delays carries across batches and replay") {
    import spark.implicits._
    val ledger = tmpDir("graft-scrawl-pol")
    val polRules = Robots.rulesFrame(
      Seq(("a.org", "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n"),
        ("b.org", "User-agent: *\nDisallow: /none\n")).toDF("domain", "txt"),
      "domain", "txt")
    val delays = Robots.selectDelay(
      Robots.delaysFrame(
        Seq(("a.org", "User-agent: *\nCrawl-delay: 2\n")).toDF("domain", "txt"),
        "domain", "txt"),
      "graftbot", defaultMs = 500L)
    def fetchAts(m: org.apache.spark.sql.DataFrame): Map[Long, (String, Long)] =
      m.filter(col("outcome") === "admitted")
        .select(col("id"), col("domain"), col("fetch_at_ms"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val b0 = df(Seq(
      Row(1L, "http://a.org/x1", page("1")),
      Row(2L, "http://a.org/x2", page("2")),
      Row(3L, "http://a.org/x3", page("3")),
      Row(4L, "http://b.org/y1", page("4"))))
    val m0 = StreamingCrawl.processBatch(b0, 0L, "id", "url", "blob",
      polRules, "graftbot", ledger, delays = Some(delays), defaultDelayMs = 500L)
    val f0 = fetchAts(m0)
    m0.unpersist(false)
    // a.org spaces its three admissions at its 2s crawl-delay in
    // arrival order; b.org (no declared delay) takes the default
    assert(f0 == Map(
      1L -> ("a.org", 0L), 2L -> ("a.org", 2000L), 3L -> ("a.org", 4000L),
      4L -> ("b.org", 0L)))
    // batch 1: a.org's horizon carries — it reserved 3 slots (6s), so
    // its next fetch starts at 6000, not 0
    val b1 = df(Seq(
      Row(11L, "http://a.org/x4", page("5")),
      Row(12L, "http://b.org/y2", page("6"))))
    val m1 = StreamingCrawl.processBatch(b1, 1L, "id", "url", "blob",
      polRules, "graftbot", ledger, delays = Some(delays), defaultDelayMs = 500L)
    val f1 = fetchAts(m1)
    m1.unpersist(false)
    assert(f1 == Map(11L -> ("a.org", 6000L), 12L -> ("b.org", 500L)))
    // replay of batch 1 reads the same horizon (own delta excluded)
    val m1r = StreamingCrawl.processBatch(b1, 1L, "id", "url", "blob",
      polRules, "graftbot", ledger, delays = Some(delays), defaultDelayMs = 500L)
    assert(fetchAts(m1r) == f1, "replay must reproduce the schedule")
    m1r.unpersist(false)
    // compaction folds horizon deltas by SUM; a later batch still sees 8s
    StreamingCrawl.compact(spark, ledger, belowBatch = 2L)
    val b2 = df(Seq(Row(21L, "http://a.org/x5", page("7"))))
    val m2 = StreamingCrawl.processBatch(b2, 2L, "id", "url", "blob",
      polRules, "graftbot", ledger, delays = Some(delays), defaultDelayMs = 500L)
    assert(fetchAts(m2) == Map(21L -> ("a.org", 8000L)),
      "compacted horizons must sum, not union")
    m2.unpersist(false)
  }

  test("redirects: 3xx rows never admit, targets canonicalize for the frontier") {
    import spark.implicits._
    import org.apache.spark.sql.types.IntegerType
    val ledger = tmpDir("graft-scrawl-redir")
    val schema2 = schema
      .add(StructField("status", IntegerType, nullable = true))
      .add(StructField("location", StringType, nullable = true))
    def df2(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema2)
    val b0 = df2(Seq(
      Row(1L, "http://a.org/old", page("moved"), 301,
        "HTTP://A.ORG:80/new?b=2&a=1#frag"), // target canonicalizes
      Row(2L, "http://a.org/tmp", page("tmp"), 302, null), // no Location
      Row(3L, "http://a.org/page", page("content"), 200, null),
      Row(4L, "http://a.org/private/x", page("blocked"), 200, null)))
    val m0 = StreamingCrawl.processBatch(b0, 0L, "id", "url", "blob",
      rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    val rows = m0.collect().map(r =>
      r.getLong(0) -> ((r.getString(4), Option(r.getString(7))))).toMap
    m0.unpersist(false)
    assert(rows(1L) == (("redirect_permanent", Some("http://a.org/new?a=1&b=2"))),
      "301 splits to the permanent class; the Location target canonicalizes")
    assert(rows(2L) == (("redirect", None)),
      "302 stays temporary; a missing Location still classifies")
    assert(rows(3L)._1 == "admitted" && rows(4L)._1 == "robots_blocked")
    // redirect sources never touched the seen ledger: a re-fetch is
    // still a redirect, and the TARGET fetched later admits normally
    val b1 = df2(Seq(
      Row(11L, "http://a.org/old", page("moved again"), 301, "http://a.org/new?a=1&b=2"),
      Row(12L, "http://a.org/new?a=1&b=2", page("the target"), 200, null)))
    val m1 = StreamingCrawl.processBatch(b1, 1L, "id", "url", "blob",
      rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    val r1 = m1.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    m1.unpersist(false)
    assert(r1 == Map(11L -> "redirect_permanent", 12L -> "admitted"),
      "re-fetched redirect stays a redirect (never duplicate); the target admits")
  }

  test("redirect frontier loop: relative Locations resolve, targets fetch exactly once, hops cap") {
    import spark.implicits._
    import org.apache.spark.sql.types.IntegerType
    val ledger = tmpDir("graft-scrawl-floop")
    val schema2 = schema
      .add(StructField("status", IntegerType, nullable = true))
      .add(StructField("location", StringType, nullable = true))
    def df2(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema2)
    val b0 = df2(Seq(
      Row(1L, "http://a.org/old/index.html", page("m"), 301, "/new/page"), // absolute path
      Row(2L, "http://a.org/x/y/z", page("m"), 301, "../up"),              // dot-segment
      Row(3L, "http://a.org/dir/cur", page("m"), 301, "next?b=2&a=1")))    // sibling + query
    val m0 = StreamingCrawl.processBatch(b0, 0L, "id", "url", "blob",
      rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    val tgt = m0.collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(tgt(1L) == "http://a.org/new/page", "absolute-path Location resolves")
    assert(tgt(2L) == "http://a.org/x/up", "../ folds against the request directory")
    assert(tgt(3L) == "http://a.org/dir/next?a=1&b=2",
      "sibling reference resolves; query canonicalizes")
    // frontier feed: all three targets, hop 1 (sources were seed fetches)
    val f0 = StreamingCrawl.redirectFrontier(m0, ledger, 0L)
    m0.unpersist(false)
    assert(f0.collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("http://a.org/new/page" -> 1, "http://a.org/x/up" -> 1,
        "http://a.org/dir/next?a=1&b=2" -> 1))
    // batch 1 FETCHES the first target (admits) while another source
    // re-discovers it: the next frontier must not re-enqueue a target
    // the seen ledger now holds — fetched exactly once across batches
    val b1 = df2(Seq(
      Row(11L, "http://a.org/new/page", page("target content"), 200, null),
      Row(12L, "http://a.org/another", page("m"), 301, "/new/page")))
    val m1 = StreamingCrawl.processBatch(b1, 1L, "id", "url", "blob",
      rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    val r1 = m1.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(r1 == Map(11L -> "admitted", 12L -> "redirect_permanent"))
    val f1 = StreamingCrawl.redirectFrontier(m1, ledger, 1L,
      hops = Some(f0.select(col("url"), col("hop"))))
    m1.unpersist(false)
    assert(f1.count() == 0,
      "an admitted target never re-enters the frontier: fetched exactly once")
    // hop cap: a source already at maxHops depth stops its chain; the
    // other sources (depth 0) still feed through
    val mAgain = StreamingCrawl.processBatch(b0, 2L, "id", "url", "blob",
      rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    val deep = Seq(("http://a.org/old/index.html", 5)).toDF("url", "hop")
    val fCap = StreamingCrawl.redirectFrontier(mAgain, ledger, 2L,
      hops = Some(deep), maxHops = 5)
    mAgain.unpersist(false)
    assert(fCap.collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("http://a.org/x/up" -> 1, "http://a.org/dir/next?a=1&b=2" -> 1),
      "a chain at maxHops drops its tail; fresh chains keep flowing")
  }

  test("301 alias ledger: permanent moves rewrite future enqueues; 302 records nothing") {
    import spark.implicits._
    import org.apache.spark.sql.types.IntegerType
    val ledger = tmpDir("graft-scrawl-alias")
    val schema2 = schema
      .add(StructField("status", IntegerType, nullable = true))
      .add(StructField("location", StringType, nullable = true))
    def df2(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema2)
    // batch 0: a 301 (records an alias), a 302 (records nothing), a 200
    val m0 = StreamingCrawl.processBatch(df2(Seq(
      Row(1L, "http://a.org/moved", page("m"), 301, "/dest"),
      Row(2L, "http://a.org/tmp", page("m"), 302, "/elsewhere"),
      Row(3L, "http://a.org/dest", page("the destination"), 200, null))),
      0L, "id", "url", "blob", rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    m0.count(); m0.unpersist(false)
    val aliases = spark.read.parquet(s"$ledger/aliases")
      .select("alias", "target").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(aliases == Map("http://a.org/moved" -> "http://a.org/dest"),
      "exactly the permanent move records; the 302 stays live, unmapped")
    // batch 1: a page LINKS to the moved URL — the frontier rewrites it
    // to the (already-admitted) destination, which the seen ledger
    // drains: the alias is never re-fetched, the 301 never re-learned
    val m1 = StreamingCrawl.processBatch(df2(Seq(
      Row(11L, "http://a.org/hub",
        page("""<a href="/moved">stale</a><a href="/fresh">new</a>"""),
        200, null))),
      1L, "id", "url", "blob", rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    val f1 = StreamingCrawl.linkFrontier(
      Seq(("http://a.org/hub",
        """<a href="/moved">stale</a><a href="/fresh">new</a>"""))
        .toDF("url", "html"),
      "url", "html", ledger, 1L)
    m1.unpersist(false)
    assert(f1.select("url").as[String].collect().toSet == Set("http://a.org/fresh"),
      "the stale link rewrote to the admitted destination and drained; only the fresh target enqueues")
    // a NEWER 301 re-points the alias: max_by(as_of) wins on read...
    val m2 = StreamingCrawl.processBatch(df2(Seq(
      Row(21L, "http://a.org/moved", page("m"), 301, "/dest2"))),
      2L, "id", "url", "blob", rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    m2.count(); m2.unpersist(false)
    val f2 = StreamingCrawl.linkFrontier(
      Seq(("http://a.org/hub2", """<a href="/moved">stale</a>"""))
        .toDF("url", "html"),
      "url", "html", ledger, 2L)
    assert(f2.select("url").as[String].collect().toSet == Set("http://a.org/dest2"),
      "the newest declaration wins the rewrite")
    // ...and compaction folds with the SAME algebra: rewrite unchanged
    StreamingCrawl.compact(spark, ledger, belowBatch = 3L)
    val f3 = StreamingCrawl.linkFrontier(
      Seq(("http://a.org/hub3", """<a href="/moved">stale</a>"""))
        .toDF("url", "html"),
      "url", "html", ledger, 3L)
    assert(f3.select("url").as[String].collect().toSet == Set("http://a.org/dest2"),
      "compaction never changes a rewrite")
  }

  test("attach: MemoryStream wiring lands batch-partitioned outcomes") {
    val ledger = tmpDir("graft-scrawl-l2")
    val out = tmpDir("graft-scrawl-o2")
    val ckpt = tmpDir("graft-scrawl-k2")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Array[Byte])]
    val q = StreamingCrawl.attach(mem.toDF().toDF("id", "url", "blob"),
      "id", "url", "blob", rules, "graftbot", ledger, out, ckpt)
    try {
      mem.addData(Seq((1L, "http://a.org/p1", page("p1"))))
      q.processAllAvailable()
      mem.addData(Seq((2L, "HTTP://A.ORG/p1", page("p1 again")),
        (3L, "http://a.org/p2", page("p2"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("id"), col("outcome"), col("batch").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "admitted", 0L), (2L, "duplicate", 1L),
      (3L, "admitted", 1L)))
  }

  test("304 Not Modified classifies as not_modified: no redirect, no duplicate, no frontier") {
    import org.apache.spark.sql.types.IntegerType
    val ledger = tmpDir("graft-scrawl-304")
    val schema2 = schema
      .add(StructField("status", IntegerType, nullable = true))
      .add(StructField("location", StringType, nullable = true))
    def df2(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema2)
    // batch 0 admits the page; batch 1 revisits conditionally and the
    // server answers 304 — a healthy revisit, not waste
    val shards = tmpDir("graft-scrawl-304-sh")
    val m0 = StreamingCrawl.processBatch(
      df2(Seq(Row(1L, "http://a.org/page", page("v1"), 200, null))),
      0L, "id", "url", "blob", rules, "graftbot", ledger, Some(shards),
      statusCol = Some("status"), locationCol = Some("location"))
    assert(outcomes(m0) == Map(1L -> "admitted")); m0.unpersist(false)
    val m1 = StreamingCrawl.processBatch(
      df2(Seq(Row(11L, "http://a.org/page", page(""), 304, null),
        Row(12L, "http://a.org/page", page("refetch"), 200, null))),
      1L, "id", "url", "blob", rules, "graftbot", ledger, Some(shards),
      statusCol = Some("status"), locationCol = Some("location"))
    val r1 = m1.collect().map(r => r.getLong(0) -> ((r.getString(4), Option(r.getString(7))))).toMap
    assert(r1(11L) == (("not_modified", None)),
      "304 is the conditional-fetch confirmation, never redirect or duplicate")
    assert(r1(12L)._1 == "duplicate", "an unconditional re-fetch still reads duplicate")
    // 304 rows never feed the frontier
    assert(StreamingCrawl.redirectFrontier(m1, ledger, 1L).count() == 0)
    m1.unpersist(false)
    // … but they DO land in the archive as payload-less revisit records
    // (server-not-modified profile) whose WARC-Refers-To resolves
    // through the seen ledger to the record holding the bytes
    val revs = spark.read.parquet(s"$shards/revisits")
      .filter(col("batch").cast("long") === 1L).select("warc").collect()
      .flatMap(r => graft.codec.WarcCodec.parse(r.getAs[Array[Byte]](0)).get)
    assert(revs.length == 1, "one revisit for arrival 11; the duplicate stays policy-dropped")
    val rv = revs.head
    assert(rv.warcType == "revisit" && rv.recordId == "urn:graft:000000000011")
    assert(rv.payload.isEmpty && rv.targetUri.contains("http://a.org/page"))
    assert(rv.extras.contains("WARC-Refers-To" -> "<urn:graft:000000000001>"),
      "the reference resolves to batch 0's admitted record")
    assert(rv.extras.exists { case (k, v) =>
      k == "WARC-Profile" && v.endsWith("server-not-modified") })
    // replay idempotence: the revisit partition overwrites itself
    val m1r = StreamingCrawl.processBatch(
      df2(Seq(Row(11L, "http://a.org/page", page(""), 304, null),
        Row(12L, "http://a.org/page", page("refetch"), 200, null))),
      1L, "id", "url", "blob", rules, "graftbot", ledger, Some(shards),
      statusCol = Some("status"), locationCol = Some("location"))
    m1r.unpersist(false)
    assert(spark.read.parquet(s"$shards/revisits")
      .filter(col("batch").cast("long") === 1L)
      .agg(sum("n_records")).head.getLong(0) == 1L)
  }

  test("same-batch admit + 304: the revisit resolves to the in-batch record") {
    // a merged/replayed feed can carry a page's 200 admission and a 304
    // confirmation for the SAME canonical in one micro-batch — the
    // referent set is the prior ledger PLUS this batch's own
    // admissions, so the revisit record must point at the record
    // admitted moments earlier, not silently skip
    import org.apache.spark.sql.types.IntegerType
    val ledger = tmpDir("graft-scrawl-304same")
    val shards = tmpDir("graft-scrawl-304same-sh")
    val schema2 = schema
      .add(StructField("status", IntegerType, nullable = true))
      .add(StructField("location", StringType, nullable = true))
    def df2(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema2)
    val m0 = StreamingCrawl.processBatch(
      df2(Seq(Row(1L, "http://a.org/page", page("v1"), 200, null),
        Row(2L, "HTTP://A.ORG/page", page(""), 304, null))),
      0L, "id", "url", "blob", rules, "graftbot", ledger, Some(shards),
      statusCol = Some("status"), locationCol = Some("location"))
    assert(outcomes(m0) == Map(1L -> "admitted", 2L -> "not_modified"))
    m0.unpersist(false)
    val revs = spark.read.parquet(s"$shards/revisits").select("warc").collect()
      .flatMap(r => graft.codec.WarcCodec.parse(r.getAs[Array[Byte]](0)).get)
    assert(revs.length == 1)
    assert(revs.head.extras.contains("WARC-Refers-To" -> "<urn:graft:000000000001>"),
      "the 304 refers to the record its OWN batch admitted")
  }

  test("validator ledger: admission stores ETag/Last-Modified; the plan and the 304 close the loop") {
    import spark.implicits._
    import org.apache.spark.sql.types.IntegerType
    val ledger = tmpDir("graft-scrawl-validators")
    val shards = tmpDir("graft-scrawl-validators-sh")
    val schema2 = schema
      .add(StructField("status", IntegerType, nullable = true))
      .add(StructField("location", StringType, nullable = true))
      .add(StructField("etag", StringType, nullable = true))
      .add(StructField("lm", StringType, nullable = true))
    def df2(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema2)
    // batch 0: two admissions — one carries an ETag + Last-Modified,
    // one carries NOTHING (must not enter the validator ledger)
    val m0 = StreamingCrawl.processBatch(
      df2(Seq(
        Row(1L, "http://a.org/page", page("v1"), 200, null, "\"e1\"", "lm1"),
        Row(2L, "http://a.org/bare", page("v2"), 200, null, null, null))),
      0L, "id", "url", "blob", rules, "graftbot", ledger, Some(shards),
      statusCol = Some("status"), locationCol = Some("location"),
      validatorCols = Some(("etag", "lm")))
    assert(outcomes(m0) == Map(1L -> "admitted", 2L -> "admitted"))
    m0.unpersist(false)
    val stored = StreamingCrawl.validators(spark, ledger).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(stored == Set(("http://a.org/page", "\"e1\"", "lm1")),
      "only validator-bearing admissions enter the ledger")
    // the request plan: a due revisit of /page rides the stored
    // validators; /bare (no validators) plans unconditional
    val history = Seq(
      ("http://a.org/page", 0L, true), ("http://a.org/page", 10000L, true),
      ("http://a.org/bare", 0L, true), ("http://a.org/bare", 10000L, true))
      .toDF("url", "ts", "changed")
    val plan = graft.operators.Recrawl.conditionalPlan(
      graft.operators.Recrawl.schedule(history, "url", "ts", "changed"),
      StreamingCrawl.validators(spark, ledger), nowMs = 100000L)
      .collect().map(r => r.getString(0) ->
        ((r.getString(2), Option(r.getString(3)), Option(r.getString(4))))).toMap
    assert(plan("http://a.org/page") ==
      (("conditional", Some("\"e1\""), Some("lm1"))),
      "the due revisit carries exactly the validators admission stored")
    assert(plan("http://a.org/bare") == (("unconditional", None, None)))
    // the conditional fetch happens; the server answers 304; the
    // revisit record resolves against the admission that EARNED the
    // validator (batch 0's record 1)
    val m1 = StreamingCrawl.processBatch(
      df2(Seq(Row(11L, "http://a.org/page", page(""), 304, null, null, null))),
      1L, "id", "url", "blob", rules, "graftbot", ledger, Some(shards),
      statusCol = Some("status"), locationCol = Some("location"),
      validatorCols = Some(("etag", "lm")))
    assert(outcomes(m1) == Map(11L -> "not_modified"))
    m1.unpersist(false)
    val revs = spark.read.parquet(s"$shards/revisits").select("warc").collect()
      .flatMap(r => graft.codec.WarcCodec.parse(r.getAs[Array[Byte]](0)).get)
    assert(revs.length == 1)
    assert(revs.head.extras.contains("WARC-Refers-To" -> "<urn:graft:000000000001>"))
    // compaction folds the validator ledger (disjoint keys, identity)
    StreamingCrawl.compact(spark, ledger, belowBatch = 2L)
    val afterCompact = StreamingCrawl.validators(spark, ledger).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(afterCompact == stored, "compaction preserves the validator set")
  }

  test("observations ledger + requestPlan: the whole loop from durable state") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val ledger = tmpDir("graft-scrawl-obs")
    val schema2 = schema
      .add(StructField("status", IntegerType, nullable = true))
      .add(StructField("location", StringType, nullable = true))
      .add(StructField("etag", StringType, nullable = true))
      .add(StructField("lm", StringType, nullable = true))
      .add(StructField("seq", LongType, nullable = true))
    def df2(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema2)
    def step(rows: Seq[Row], b: Long) = {
      val m = StreamingCrawl.processBatch(df2(rows), b, "id", "url", "blob",
        rules, "graftbot", ledger,
        statusCol = Some("status"), locationCol = Some("location"),
        validatorCols = Some(("etag", "lm")), seqCol = Some("seq"))
      m.count(); m.unpersist(false)
    }
    // batch 0 at t=1000: /page admits (new content, etag stored);
    // /static admits too
    step(Seq(
      Row(1L, "http://a.org/page", page("v1"), 200, null, "\"e1\"", null, 1000L),
      Row(2L, "http://a.org/static", page("s1"), 200, null, null, null, 1000L)), 0L)
    // batch 1 at t=11000: /page 304 (no change), /static re-fetch reads
    // duplicate (no change), a redirect observes NOTHING
    step(Seq(
      Row(11L, "http://a.org/page", page(""), 304, null, null, null, 11000L),
      Row(12L, "http://a.org/static", page("s1"), 200, null, null, null, 11000L),
      Row(13L, "http://a.org/moved", page(""), 301, "http://a.org/page", null, null, 11000L)), 1L)
    // folded observations: both urls (n_obs 2, n_changed 1, last 11000)
    // → interval = 1000*4//3 = 1333, due at 12333
    val plan = StreamingCrawl.requestPlan(spark, ledger, nowMs = 12333L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), Option(r.getString(3))))).toMap
    assert(plan.keySet == Set("http://a.org/page", "http://a.org/static"),
      "the redirect source never entered the observation ledger")
    assert(plan("http://a.org/page") == ((12333L, "conditional", Some("\"e1\""))),
      "the due revisit plans a conditional request on the stored ETag")
    assert(plan("http://a.org/static") == ((12333L, "unconditional", None)))
    // nothing due yet → empty plan
    assert(StreamingCrawl.requestPlan(spark, ledger, nowMs = 12332L).count() == 0)
    // replay idempotence: re-running batch 1 overwrites its own deltas
    step(Seq(
      Row(11L, "http://a.org/page", page(""), 304, null, null, null, 11000L),
      Row(12L, "http://a.org/static", page("s1"), 200, null, null, null, 11000L),
      Row(13L, "http://a.org/moved", page(""), 301, "http://a.org/page", null, null, 11000L)), 1L)
    // … and compaction folds with the SAME algebra the read uses
    StreamingCrawl.compact(spark, ledger, belowBatch = 2L)
    val after = StreamingCrawl.requestPlan(spark, ledger, nowMs = 12333L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), Option(r.getString(3))))).toMap
    assert(after == plan, "replay + compaction never change the plan")
  }

  test("redirect frontier is robots-polite: disallowed targets never enter") {
    import spark.implicits._
    import org.apache.spark.sql.types.IntegerType
    val ledger = tmpDir("graft-scrawl-polite")
    val schema2 = schema
      .add(StructField("status", IntegerType, nullable = true))
      .add(StructField("location", StringType, nullable = true))
    def df2(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema2)
    // a.org disallows /private (the shared `rules` fixture); one 301
    // points into it, one to an allowed path, one to an UNKNOWN domain
    // (no rules → default allowed)
    val m0 = StreamingCrawl.processBatch(df2(Seq(
      Row(1L, "http://a.org/x", page("m"), 301, "/private/secret"),
      Row(2L, "http://a.org/y", page("m"), 301, "/public/ok"),
      Row(3L, "http://a.org/z", page("m"), 301, "http://other.net/p"))),
      0L, "id", "url", "blob", rules, "graftbot", ledger,
      statusCol = Some("status"), locationCol = Some("location"))
    val f = StreamingCrawl.redirectFrontier(m0, ledger, 0L, rules = Some(rules),
      agent = "graftbot")
    val got = f.select("url").as[String].collect().toSet
    m0.unpersist(false)
    assert(got == Set("http://a.org/public/ok", "http://other.net/p"),
      "the disallowed target is filtered before any fetch; unknown domains default allowed")
  }

  test("attach with frontierDir: per-batch frontier partitions, hop carry, drain on fetch") {
    import spark.implicits._
    import org.apache.spark.sql.types.IntegerType
    implicit val sqlCtx = spark.sqlContext
    val ledger = tmpDir("graft-scrawl-l3")
    val out = tmpDir("graft-scrawl-o3")
    val ckpt = tmpDir("graft-scrawl-k3")
    val frontier = tmpDir("graft-scrawl-f3")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Array[Byte], Option[Int], Option[String])]
    val q = StreamingCrawl.attach(
      mem.toDF().toDF("id", "url", "blob", "status", "location"),
      "id", "url", "blob", rules, "graftbot", ledger, out, ckpt,
      statusCol = Some("status"), locationCol = Some("location"),
      frontierDir = Some(frontier), maxHops = 2)
    try {
      // batch 0: one 301 with a RELATIVE target, one plain fetch
      mem.addData(Seq(
        (1L, "http://a.org/old/x", page("m"), Some(301), Some("../hop/y")),
        (2L, "http://a.org/p1", page("p1"), Some(200), None)))
      q.processAllAvailable()
      val f0 = spark.read.parquet(frontier).filter(col("batch").cast("long") === 0L)
        .select("url", "hop").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(f0 == Map("http://a.org/hop/y" -> 1), "relative target resolved into the frontier")
      // batch 1: the fetcher follows the frontier — target admits; it
      // ALSO answers 301 onward (hop 2, still within maxHops = 2)
      mem.addData(Seq(
        (11L, "http://a.org/hop/y", page("m"), Some(301), Some("/hop/z"))))
      q.processAllAvailable()
      val f1 = spark.read.parquet(frontier).filter(col("batch").cast("long") === 1L)
        .select("url", "hop").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(f1 == Map("http://a.org/hop/z" -> 2), "hop depth carried from the prior frontier")
      // compaction between batches folds the hops ledger (min-per-url)
      // into a base generation; hop depth must survive the fold — batch
      // 2's chain arithmetic reads from the compacted base, not from
      // replayed frontier partitions
      StreamingCrawl.compact(spark, ledger, belowBatch = 2L)
      assert(graft.streaming.BatchLedger
        .pointer(ledger, StreamingCrawl.HopsPointerKey).isDefined,
        "compaction commits a hops base pointer")
      // batch 2: z answers 301 again — hop 3 exceeds maxHops, chain stops
      mem.addData(Seq(
        (21L, "http://a.org/hop/z", page("m"), Some(301), Some("/hop/w"))))
      q.processAllAvailable()
      val f2 = spark.read.parquet(frontier).filter(col("batch").cast("long") === 2L)
      assert(f2.count() == 0, "the hop cap stops the unrolled chain after compaction")
    } finally q.stop()
  }
  test("discoverLinks: schemes filter, relative resolution, dedup, per-host budget") {
    import spark.implicits._
    val pages = Seq(
      ("http://a.org/dir/index.html",
        """<a href="/top">t</a><a href="sub/page?b=2&a=1#f">s</a>""" +
        """<a href="mailto:x@y.org">m</a><a href="javascript:void(0)">j</a>""" +
        """<a href="#frag">f</a><a href="http://b.org/abs">abs</a>""" +
        """<img src="/top">dup-target</img><a href="http://a.org/dir/index.html">self</a>"""),
      ("http://a.org/other",
        """<a href="/top">same target from a second page</a>"""))
      .toDF("url", "html")
    val got = StreamingCrawl.discoverLinks(pages, "url", "html")
      .orderBy("url").collect()
      .map(r => (r.getString(1), r.getAs[Long]("n_sources"), r.getString(0))).toSeq
    assert(got == Seq(
      ("http://a.org/dir/sub/page?a=1&b=2", 1L, "a.org"),
      ("http://a.org/top", 3L, "a.org"), // two pages + one src attr
      ("http://b.org/abs", 1L, "b.org")),
      s"got $got")
    // the per-host budget drops targets in md5 order, host-locally
    val fan = Seq(("http://c.org/hub",
      (1 to 9).map(i => s"""<a href="/p$i">x</a>""").mkString +
        """<a href="http://d.org/lone">y</a>""")).toDF("url", "html")
    val capped = StreamingCrawl.discoverLinks(fan, "url", "html", perHostBudget = 3)
      .select("domain", "url").collect().map(r => (r.getString(0), r.getString(1)))
    assert(capped.count(_._1 == "c.org") == 3, "budget caps the hub's fan-out")
    assert(capped.count(_._1 == "d.org") == 1, "other hosts keep their targets")
    val expect3 = (1 to 9).map(i => s"http://c.org/p$i")
      .sortBy(u => { val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(u.getBytes("UTF-8")).map("%02x".format(_)).mkString })
      .take(3).toSet
    assert(capped.filter(_._1 == "c.org").map(_._2).toSet == expect3,
      "membership is the first-n keys in md5 order — any engine replays it")
  }

  test("linkFrontier: hop inheritance, robots gate, seen-ledger drain, budget") {
    import spark.implicits._
    val ledger = tmpDir("graft-scrawl-lf")
    // seed the seen ledger: /already was fetched in batch 0
    Seq(("http://a.org/already", 1L)).toDF("canonical", "id")
      .withColumn("batch", lit(0L))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$ledger/seen")
    val pages = Seq(
      ("http://a.org/start",
        """<a href="/fresh">n</a><a href="/already">seen</a>""" +
        """<a href="/private/x">blocked</a><a href="/private/ok/y">allowed</a>"""))
      .toDF("url", "html")
    // the discovering page sits at hop 3; targets inherit 4
    val hops = Seq(("http://a.org/start", 3)).toDF("url", "hop")
    val got = StreamingCrawl.linkFrontier(pages, "url", "html", ledger, 1L,
      hops = Some(hops), maxHops = 5, rules = Some(rules), agent = "graftbot")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("http://a.org/fresh" -> 4, "http://a.org/private/ok/y" -> 4),
      s"got $got — seen target drained, robots-disallowed never entered, hops inherit")
    // at maxHops the chain stops
    val capped = StreamingCrawl.linkFrontier(pages, "url", "html", ledger, 1L,
      hops = Some(Seq(("http://a.org/start", 5)).toDF("url", "hop")),
      maxHops = 5, rules = Some(rules), agent = "graftbot")
    assert(capped.count() == 0, "a page at maxHops discovers nothing")
  }

  test("linkFrontier: seen targets drain BEFORE the budget — no slot starvation") {
    import spark.implicits._
    val ledger = tmpDir("graft-scrawl-lf-budget")
    // the seen url md5-sorts ahead of the fresh one, so a budget spent
    // before the drain would hand it the host's only slot every batch
    val candidates = Seq("http://a.org/seenpage", "http://a.org/freshpage")
    def h(u: String) = { val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(u.getBytes("UTF-8")).map("%02x".format(_)).mkString }
    val Seq(first, second) = candidates.sortBy(h)
    Seq((first, 1L)).toDF("canonical", "id").withColumn("batch", lit(0L))
      .write.mode("overwrite").partitionBy("batch").parquet(s"$ledger/seen")
    val pages = Seq(("http://a.org/hub",
      candidates.map(u => s"""<a href="$u">x</a>""").mkString)).toDF("url", "html")
    val got = StreamingCrawl.linkFrontier(pages, "url", "html", ledger, 1L,
      perHostBudget = 1)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(second),
      s"the md5-first SEEN target must not consume the budget slot: got $got")
  }

  test("attach with discoverLinks: anchor targets join the frontier and drain on fetch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ledger = tmpDir("graft-scrawl-l4")
    val out = tmpDir("graft-scrawl-o4")
    val ckpt = tmpDir("graft-scrawl-k4")
    val frontier = tmpDir("graft-scrawl-f4")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Array[Byte])]
    val q = StreamingCrawl.attach(mem.toDF().toDF("id", "url", "blob"),
      "id", "url", "blob", rules, "graftbot", ledger, out, ckpt,
      frontierDir = Some(frontier), maxHops = 3, discoverLinks = true)
    try {
      // batch 0: a seed page linking two targets (one robots-blocked)
      mem.addData(Seq((1L, "http://a.org/seed",
        page("""<a href="/l1">x</a><a href="/private/no">y</a>"""))))
      q.processAllAvailable()
      val f0 = spark.read.parquet(frontier).filter(col("batch").cast("long") === 0L)
        .select("url", "hop").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(f0 == Map("http://a.org/l1" -> 1),
        "anchor target enqueued at hop 1; disallowed target never entered")
      // batch 1: the fetcher follows l1, which links onward to l2 — the
      // hop ledger carries depth, l1 itself never re-enqueues
      mem.addData(Seq((2L, "http://a.org/l1", page("""<a href="/l2">z</a>"""))))
      q.processAllAvailable()
      val f1 = spark.read.parquet(frontier).filter(col("batch").cast("long") === 1L)
        .select("url", "hop").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(f1 == Map("http://a.org/l2" -> 2), s"got $f1 — depth carried through the hops ledger")
      // batch 2: l2 links to depth 4 > maxHops 3 — chain stops; a page
      // re-linking the already-fetched seed does not re-enqueue it
      mem.addData(Seq((3L, "http://a.org/l2",
        page("""<a href="/l3">w</a><a href="/seed">back</a>"""))))
      q.processAllAvailable()
      val f2 = spark.read.parquet(frontier).filter(col("batch").cast("long") === 2L)
        .select("url", "hop").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(f2 == Map("http://a.org/l3" -> 3),
        s"got $f2 — seed drained via the seen ledger; l3 is the last hop under the cap")
    } finally q.stop()
  }

  test("page directives: noindex classifies (links still follow), nofollow bars links (page admits)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ledger = tmpDir("graft-scrawl-l5")
    val out = tmpDir("graft-scrawl-o5")
    val ckpt = tmpDir("graft-scrawl-k5")
    val frontier = tmpDir("graft-scrawl-f5")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Array[Byte], String)]
    val q = StreamingCrawl.attach(mem.toDF().toDF("id", "url", "blob", "xrt"),
      "id", "url", "blob", rules, "graftbot", ledger, out, ckpt,
      frontierDir = Some(frontier), maxHops = 3, discoverLinks = true,
      pageDirectives = true, xRobotsCol = Some("xrt"))
    try {
      mem.addData(Seq(
        // plain page: admits, its link enqueues
        (1L, "http://a.org/seed", page("""<a href="/f1">x</a>"""), null),
        // meta NOFOLLOW: the page itself ADMITS, its link never enters
        (2L, "http://a.org/nf",
          page("""<meta name="robots" content="nofollow"><a href="/nf1">y</a>"""),
          null),
        // meta NOINDEX: outcome class (not a silent drop, not admitted,
        // no seen entry) — but its link STILL follows (noindex bars the
        // page, not its links)
        (3L, "http://a.org/ni",
          page("""<meta name="robots" content="noindex"><a href="/ni1">z</a>"""),
          null),
        // header noindex, agent-prefixed: same class via the other channel
        (4L, "http://a.org/nih", page("""plain body"""), "graftbot: noindex"),
        // alien agent prefix: not ours — admits normally
        (5L, "http://a.org/alien", page("""alien body"""), "otherbot: noindex")))
      q.processAllAvailable()
      val o0 = spark.read.parquet(out).filter(col("batch").cast("long") === 0L)
        .select("id", "outcome").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(o0 == Map(1L -> "admitted", 2L -> "admitted", 3L -> "noindexed",
        4L -> "noindexed", 5L -> "admitted"), s"got $o0")
      val f0 = spark.read.parquet(frontier).filter(col("batch").cast("long") === 0L)
        .select("url").as[String].collect().toSet
      assert(f0 == Set("http://a.org/f1", "http://a.org/ni1"),
        s"got $f0 — nofollow page's target barred; noindex page's target follows")
      // noindexed pages never enter the seen ledger...
      val seen = spark.read.parquet(s"$ledger/seen")
        .select("canonical").as[String].collect().toSet
      assert(!seen.exists(_.contains("/ni")) && seen.exists(_.endsWith("/seed")))
      // ...so a re-fetch after the directive LIFTS admits cleanly
      mem.addData(Seq(
        (11L, "http://a.org/ni", page("""no directives anymore"""), null)))
      q.processAllAvailable()
      val o1 = spark.read.parquet(out).filter(col("batch").cast("long") === 1L)
        .select("id", "outcome").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(o1 == Map(11L -> "admitted"),
        s"got $o1 — a lifted noindex must admit on re-fetch")
    } finally q.stop()
  }
}
