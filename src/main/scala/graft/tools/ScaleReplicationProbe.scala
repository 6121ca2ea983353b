package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replication scale probe for the COMPOSED heavyweights — the artifact
  * that converts the 100 TB plan-shape arguments into measurements: the
  * sf corpus replicated ×1/×10/×32 through four composed pipelines
  * (corpus build, exact-run dedup, stored-IVF serve, duplicate
  * clustering), recording wall, shuffle-write volume, and max single
  * task time at each size. Near-linear wall + flat-ish max-task =
  * the plan distributes; a superlinear line or a ballooning max task
  * names the operator that would fall over first on a real cluster.
  *
  * Replication semantics per pipeline (they differ deliberately):
  * - corpus build: replica-salted TEXT (novel content — the growth path
  *   where nothing collapses and every stage does ×N work);
  * - exact-run dedup: UNMODIFIED text under fresh ids (×N duplication —
  *   gram document-frequencies grow ×N, stressing the hot-gram
  *   broadcast split, which is the point);
  * - IVF serve: replica-perturbed embeddings under fresh ids (corpus
  *   ×N, fixed query set — serve cost should track probed-cell volume,
  *   linear in N at fixed nlist);
  * - clustering: unmodified text under fresh ids (duplicate families
  *   grow ×N members → candidate pairs per bucket grow ×N²; the
  *   BoundedCollect caps + dropped-id accumulator are the designed
  *   guard, and the probe records what they drop).
  *
  * Usage: runMain graft.tools.ScaleReplicationProbe [sfDir] [reps] [only]
  *   (reps comma-separated, default "1,10,32"; `only` = comma-separated
  *   label PREFIXES to run — everything else skips, for re-measuring a
  *   subset without paying the prefix-join ×32 bodies)
  */
object ScaleReplicationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("1,10,32").split(",").map(_.trim.toInt).toSeq
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(label: String): Boolean = only.forall(_.exists(label.startsWith))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shufW = 0L
    @volatile var maxTask = 0L
    val durs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.taskMetrics != null)
          shufW += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) {
          maxTask = math.max(maxTask, te.taskInfo.duration)
          durs.add(te.taskInfo.duration)
        }
    }
    // each body call builds its own checkpointed fixture; drop the blocks
    // after every run or the x64 frames accumulate in the block manager
    // and evictions masquerade as straggler tasks (the Bench r09 lesson)
    def clearBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    // clearBetween=false for bodies that REUSE a checkpoint built outside
    // the timed body (unpersisting a localCheckpoint invalidates it - the
    // lineage is gone, the second run would die on missing blocks)
    def timed(label: String, clearBetween: Boolean = true)(body: => Long): Unit = {
      if (!want(label)) return
      body // warm (codegen/JIT; fresh frames every call, so no cache reuse)
      if (clearBetween) clearBlocks()
      shufW = 0; maxTask = 0; durs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val v = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      clearBlocks()
      // p95-vs-max disambiguates "one straggler" from "per-task load
      // grew because the probe fixes 32 partitions while data grows"
      val ds = durs.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      val p95 = if (ds.isEmpty) 0L else ds((ds.length * 95) / 100 min (ds.length - 1))
      println(f"[scale-probe] $label%-28s wall $wall%7.2f s  shufW ${shufW / 1024}%9d KiB  maxTask ${maxTask}%6d ms  p95 ${p95}%6d ms  out $v%d")
    }

    def docsTimes(rep: Int, saltText: Boolean): DataFrame = {
      val base = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("source"))
      val rf = base.crossJoin(spark.range(rep).select(col("id").as("_rep")))
      val text =
        if (saltText) concat_ws(" ", concat(lit("rep"), col("_rep")), col("text"))
        else col("text")
      rf.select((col("doc_id") + col("_rep") * 10000000L).as("doc_id"),
        text.as("text"), col("source"))
        .repartition(32) // replicas spread like arriving data, not 1 task/replica
        // materialized OUTSIDE the timed body: the replication crossJoin
        // is fixture scaffolding (a few scan tasks doing xN concat/copy
        // work) and was polluting maxTask with a linear-in-N task that
        // no real pipeline contains
        .localCheckpoint()
    }

    for (rep <- reps) {
      println(s"── replication x$rep ──")

      // 1. corpus build (gates → exact dedup → hash sample → shard+pack)
      timed(s"corpus_build x$rep") {
        val stops = Seq("the", "a", "of", "and", "to", "in", "is")
        val d0 = docsTimes(rep, saltText = true)
        val ws = graft.operators.TextOps.tokens(col("text"))
        val (n, _, sr) = graft.operators.TextOps.qualityMetrics(ws, stops)
        val cleaned = d0
          .select(col("doc_id"), col("text"), n.as("n_tokens"),
            graft.operators.TextOps.langIdEn(ws, Seq("the", "a", "of", "and"), 2).as("plang"),
            sr.as("sr"))
          .filter(col("plang") === "en" && col("n_tokens") >= 5 && col("sr") <= 0.5)
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(min("doc_id").cast("long").as("doc_id"), min("text").as("text"),
            min("n_tokens").cast("long").as("n_tokens"))
        graft.operators.Sharding.packSequences(
          graft.operators.Sharding.sampleByHash(cleaned, "text", permille = 600),
          "doc_id", "n_tokens", keyCol = "text", nShards = 8, seqLen = 256).count()
      }

      // 1b. article funnel (charset decode → block main-content → C4 →
      //     exact dedup → domain cap, the pipeline_article_corpus shape):
      //     replica-salted text (novel pages, the growth path) EXCEPT
      //     every tenth page, a byte-identical syndicated mirror shared
      //     across replicas — its dedup group grows ×N, so the keep-min
      //     groupBy carries real duplicate mass, not only unique hashes.
      //     Per-row stages (decode, block split, C4) ride the scan; the
      //     two shuffles are the dedup groupBy and the bounded-heap cap
      //     (payload-through-the-heap form — the earlier semi-join-back
      //     evaluated the whole funnel twice; see samplePerGroupRows).
      //     SUM over the capped output keeps the anti-pruning guard
      //     uniform with the other bodies.
      timed(s"article_funnel x$rep") {
        import spark.implicits._
        val base = graft.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
          .crossJoin(spark.range(rep).select(col("id").as("_rep")))
          .select((col("doc_id") + col("_rep") * 10000000L).as("doc_id"),
            concat_ws(" ", concat(lit("rep"), col("_rep")), col("text")).as("text"))
          .repartition(32)
        val pages = base.as[(Long, String)].mapPartitions(_.map { case (id, text) =>
          val page =
            if (id % 10 == 9)
              "<html><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
                "<div class=\"post\"><p>The shared syndicated wire story repeats verbatim across mirrors. " +
                "It has five sentences to pass the gate. Three now follows here! " +
                "Shall it pass? Yes indeed it does.</p></div>" +
                "<footer>Copyright <a href=\"/l\">legal</a> <a href=\"/p\">privacy</a></footer></body></html>"
            else
              "<html><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
                s"<h1>Doc $id</h1><div class=\"post\"><p>" + text + " — €1 ends here.</p>" +
                "<p>One more thought ends here. Another follows! Shall we? Yes indeed.</p></div>" +
                "<footer>Copyright <a href=\"/l\">legal</a> <a href=\"/p\">privacy</a></footer></body></html>"
          (id, graft.codec.CharsetCodec.encode(page,
            if (id % 2 == 0) "windows-1252" else "utf-8"))
        }).toDF("doc_id", "raw").localCheckpoint()
        val decoded = graft.operators.TextOps.decodeCharset(pages, "raw", "charset", "html")
        val main = decoded.select(col("doc_id"),
          graft.operators.TextOps.mainContent(col("html")).as("t"))
        val kept = graft.operators.TextOps.c4Filter(main, "doc_id", "t")
          .filter(col("verdict") === "kept")
        val dd = kept.groupBy(md5(col("clean_text").cast("binary")).as("h"))
          .agg(min("doc_id").cast("long").as("doc_id"),
            count(lit(1)).cast("long").as("group_size"))
        val dom = dd.select(col("doc_id"), col("group_size"),
          pmod(col("doc_id"), lit(50)).cast("string").as("domain"))
        graft.operators.Sharding.samplePerGroupRows(dom, "domain", "doc_id", 3,
            Seq("group_size"))
          .agg(sum(col("group_size") + col("doc_id"))).head.getLong(0)
      }

      // 2. exact-run dedup (duplicated grams: df grows xN, hot path live).
      //    SUM the computed columns, never count(): the operator ends in
      //    a left-outer join against a unique-key aggregate, which
      //    count() lets Catalyst ELIMINATE — the whole gram pipeline
      //    optimized away and the row measured fixture-checkpoint cost
      //    only (caught in round 13: shufW identical to the fixture at
      //    every replication; the Bench count-pruning gotcha, join form)
      timed(s"exact_run_dedup x$rep") {
        graft.operators.TextOps.exactRunDedupText(
            docsTimes(rep, saltText = false), "doc_id", "text", n = 5)
          .agg(sum(col("n_kept") + length(col("clean_text")))).head.getLong(0)
      }

      // 2b. hotDf A/B — measured OUTCOME (kept as the record): timings
      //     and shuffle volume are IDENTICAL at 4096 vs 65536 at every
      //     replication, and p95 ≈ max at every size — the growing
      //     maxTask is balanced per-task load under the probe's fixed
      //     32 partitions (a cluster scales partitions with input), not
      //     gram-key skew; this corpus' gram df distribution doesn't
      //     straddle the two thresholds.
      timed(s"exact_run_dedup x$rep hotDf=4k") {
        graft.operators.TextOps.exactRunDedupText(
            docsTimes(rep, saltText = false), "doc_id", "text", n = 5,
            hotDf = 4096L)
          .agg(sum(col("n_kept") + length(col("clean_text")))).head.getLong(0)
      }

      // 3. stored-IVF serve: publish once per size, time ONLY the serve
      if (want("ivf_stored_serve")) locally {
        val emb = graft.Tables.embeddings(spark, sfDir)
        val perturbed = emb.crossJoin(spark.range(rep).select(col("id").as("_rep")))
          .select((col("vec_id") + col("_rep") * 10000000L).as("vec_id"),
            transform(col("embedding"),
              x => (x + col("_rep").cast("float") * lit(0.001f)).cast("float"))
              .as("embedding"))
          .repartition(32).localCheckpoint() // build cost excluded from serve
        val root = java.nio.file.Files.createTempDirectory(s"graft-scale-ivf$rep").toString
        val store = new graft.ingest.TableStore(spark, root, nBuckets = 2)
        graft.ingest.VectorIndex.publish(store, "probe",
          emb.filter(col("vec_id").between(1, 8)).select(col("vec_id"), col("embedding")))
        val queries = emb.filter(col("vec_id") < 4)
        timed(s"ivf_stored_serve x$rep", clearBetween = false) {
          graft.ingest.VectorIndex.ivfTopKBatch(store, "probe",
            perturbed.filter(col("vec_id") > 8), "vec_id", "embedding",
            queries = queries, queryIdCol = "vec_id",
            k = 8, probes = 1).count()
        }
      }

      // 4. duplicate clustering (families xN → per-bucket pairs xN²;
      //    caps + accumulator are the guard under test)
      if (want("dedup_clusters")) locally {
        val dropped = spark.sparkContext.longAccumulator(s"dropped-x$rep")
        timed(s"dedup_clusters x$rep") {
          val pairs = graft.operators.Dedup.lshCandidatePairs(
            docsTimes(rep, saltText = false), "doc_id", "text",
            shingleN = 3, k = 8, bands = 4, droppedAcc = Some(dropped))
          graft.operators.Dedup.duplicateClusters(pairs).count()
        }
        println(s"[scale-probe]   clusters x$rep bucket-cap dropped ids: ${dropped.value}")
      }

      // 4b. the quadratic mitigated: replica families are EXACT
      //     duplicates, and a production pipeline collapses those with
      //     the hash groupBy BEFORE banding (pipeline_corpus_build's
      //     own stage order) — near-dup machinery then sees one
      //     representative per family and the N² pair mass never forms.
      timed(s"clusters_precollapsed x$rep") {
        val d0 = docsTimes(rep, saltText = false)
        val canon = d0.groupBy(md5(col("text")).as("_h"))
          .agg(min("doc_id").as("doc_id"), min("text").as("text"))
          .drop("_h")
        graft.operators.Dedup.duplicateClusters(
          graft.operators.Dedup.lshCandidatePairs(canon, "doc_id", "text",
            shingleN = 3, k = 8, bands = 4)).count()
      }

      // 5. exact-threshold PPJoin (round-10 heavyweight): salted text
      //    makes every replica a DISTINCT set one token off its family,
      //    so within-family candidate mass grows ~N² — the documented
      //    adversarial case; the length/positional filters and the
      //    hot-token salted join are the guards under test.
      def prefixReps(rep: Int) = {
        val d0 = docsTimes(rep, saltText = true)
        val sets = d0.select(col("doc_id"), array_sort(array_distinct(
          graft.operators.TextOps.tokens(col("text")))).as("ts"))
        sets.groupBy(md5(concat_ws(" ", col("ts")).cast("binary")).as("_fp"))
          .agg(min(col("doc_id")).as("id"), first(col("ts")).as("ts"))
          .select("id", "ts")
      }
      timed(s"prefix_join x$rep") {
        graft.operators.Dedup.prefixFilterPairs(prefixReps(rep), "id", "ts", 900).count()
      }

      // 5b. the end-to-end exact-threshold dedup (join → union-find →
      //     canonical keep) — pair mass feeds clustering, so this is
      //     where a candidate flood would compound.
      timed(s"prefix_clusters x$rep") {
        val pairs = graft.operators.Dedup.prefixFilterPairs(prefixReps(rep), "id", "ts", 900)
        graft.operators.Dedup.duplicateClusters(pairs, aCol = "id_a", bCol = "id_b").count()
      }

      // 5c. the stored-index ARRIVAL path (engine_stream_prefix's
      //     kernel): index built once on the xN corpus OUTSIDE the
      //     timed body; the measured cost is what a streaming batch
      //     pays per arrival — probe under the frozen ordering. Wall
      //     should track the batch's candidate/pair mass, not corpus
      //     size (that is the point of storing the index).
      if (want("prefix_incremental")) locally {
        val allP = prefixReps(rep).localCheckpoint()
        val bP = allP.filter(pmod(col("id"), lit(20)) === 0).localCheckpoint()
        val cP = allP.filter(pmod(col("id"), lit(20)) =!= 0).localCheckpoint()
        val pdir = java.nio.file.Files.createTempDirectory("graft-scale-ppidx").toString
        graft.operators.Dedup.prefixIndexBuild(cP, "id", "ts", 900, pdir)
        timed(s"prefix_incremental x$rep", clearBetween = false) {
          graft.operators.Dedup.incrementalPrefixPairs(bP, "id", "ts", pdir).count()
        }
      }

      // 6. web-corpus funnel from the WIRE (HTTP de-frame →
      //    Content-Encoding gunzip on every third row → charset gate →
      //    extraction → quality gates → exact dedup → per-domain cap —
      //    the round-12 pipeline_web_corpus entry): per-row decode and
      //    regex dominate and scale linearly; the only exchanges are
      //    the dedup groupBy and the cap.
      timed(s"web_corpus x$rep") {
        import spark.implicits._
        val stops = Seq("the", "a", "of", "and", "to", "in", "is")
        val payloads = docsTimes(rep, saltText = true)
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, text) =>
            val shell =
              "<html><head><style>p { x }</style><script>let a = 1 < 2;</script></head>" +
                s"<body><!-- c --><p>$text</p><br><p>A &amp; B&nbsp;tail — €1</p></body></html>"
            val encoded = graft.codec.CharsetCodec.encode(shell,
              if (id % 2 == 0) "windows-1252" else "utf-8")
            val wire =
              if (id % 3 == 0) graft.codec.HttpCodec.write(200, "OK",
                Seq("Content-Type" -> "text/html", "Content-Encoding" -> "gzip"),
                graft.codec.GzipCodec.gzipMember(encoded))
              else graft.codec.HttpCodec.write(200, "OK",
                Seq("Content-Type" -> "text/html"), encoded)
            (id, wire)
          })
          .toDF("doc_id", "wire")
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, wire) =>
            (id, graft.codec.HttpCodec.parse(wire)
              .getOrElse(sys.error(s"wire parse failed: $id")).body)
          })
          .toDF("doc_id", "payload")
        val ws = graft.operators.TextOps.tokens(col("clean"))
        val (n, _, sr) = graft.operators.TextOps.qualityMetrics(ws, stops)
        val gated = graft.operators.TextOps
          .decodeCharset(payloads, "payload", "charset", "html")
          .select(col("doc_id"),
            graft.operators.TextOps.htmlExtract(col("html")).as("clean"))
          .select(col("doc_id"), col("clean"), n.as("n_tokens"),
            graft.operators.TextOps.langIdEn(ws, Seq("the", "a", "of", "and"), 2).as("plang"),
            sr.as("sr"))
          .filter(col("plang") === "en" && col("n_tokens") >= 5 && col("sr") <= 0.5)
        val dedup = gated.groupBy(md5(col("clean").cast("binary")).as("h"))
          .agg(min("doc_id").cast("long").as("doc_id"),
            count(lit(1)).cast("long").as("group_size"))
        val dom = dedup.select(col("doc_id"), col("group_size"),
          concat(lit("d"), pmod(col("doc_id"), lit(50)).cast("string"),
            lit(".example.com")).as("domain"))
        graft.operators.Sharding.samplePerGroupRows(dom, "domain", "doc_id", 3,
          Seq("group_size")).count()
      }

      // 6b. LINK DISCOVERY (round-14 arrival): explode every page's
      //     anchors → native resolve/normalize/canonicalize chain →
      //     target dedup with in-degree → per-host budget through the
      //     bounded heap. Replica-unique targets grow the row count ×N
      //     (the novel-content path) while each domain's /shared hub
      //     grows its in-degree ×N (the dedup-mass path); at ×32 each
      //     of the 50 hosts holds ~6k distinct targets against a
      //     budget of 1000, so the heap's cap actually fires — the
      //     link-farm guard measured doing its job, not idling.
      if (want("link_")) timed(s"link_discovery x$rep") {
        val pages = docsTimes(rep, saltText = false)
          .select(col("doc_id"), pmod(col("doc_id"), lit(50)).as("m"))
          .select(
            concat(lit("http://d"), col("m"), lit(".example.com/hub"), col("doc_id"))
              .as("url"),
            concat(
              concat(lit("<a href=\"p"), col("doc_id"), lit("x/a\">u</a>")),
              concat(lit("<a href=\"../p"), col("doc_id"), lit("y/b?b=2&a=1\">v</a>")),
              lit("<a href=\"/shared\">s</a>"),
              lit("<a href=\"mailto:x@y\">m</a>")).as("html"))
        graft.streaming.StreamingCrawl
          .discoverLinks(pages, "url", "html", perHostBudget = 1000)
          .select(sum(length(col("url")) + col("n_sources"))).head.getLong(0)
      }

      // 6''. politeness × frontier budget, COMPOSED (round 16): the
      //     prioritized per-host budget heap feeding the politeness
      //     dispatcher across two real processBatch steps, under a
      //     SKEWED host mix (every even doc's hub sits on host 0 — at
      //     ×32 the hot host discovers ~160k distinct targets against
      //     a budget of 2000). The composition property under test:
      //     the budget bounds every politeness window partition by
      //     construction (slots = row_number per host over ADMITTED
      //     rows ≤ budget), and the horizon ledger's per-batch read is
      //     a gated probe over O(hosts) delta rows — so neither the
      //     heap nor the ledger can interact quadratically however
      //     skewed the discovery side gets. maxTask ≈ p95 holding at
      //     ×32 is that argument measured.
      if (want("polite_")) timed(s"polite_budget x$rep") {
        import spark.implicits._
        val pages = docsTimes(rep, saltText = false)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit(0L))
              .otherwise(pmod(col("doc_id"), lit(50))).as("m"))
          .select(
            concat(lit("http://h"), col("m"), lit(".example.com/hub"),
              col("doc_id")).as("url"),
            concat(
              concat(lit("<a href=\"p"), col("doc_id"), lit("a\">x</a>")),
              concat(lit("<a href=\"p"), col("doc_id"), lit("b\">y</a>")),
              lit("<a href=\"/top\">t</a>")).as("html"))
        val frontier = graft.streaming.StreamingCrawl
          .discoverLinksPrioritized(pages, "url", "html", perHostBudget = 2000)
        val rules = graft.operators.Robots.rulesFrame(
          (0 until 50).map(h =>
            (s"h$h.example.com", s"User-agent: *\nDisallow:\nCrawl-delay: ${1 + h % 5}\n"))
            .toDF("domain", "txt"), "domain", "txt")
        val delays = graft.operators.Robots.selectDelay(
          graft.operators.Robots.delaysFrame(
            (0 until 50).map(h =>
              (s"h$h.example.com", s"User-agent: *\nCrawl-delay: ${1 + h % 5}\n"))
              .toDF("domain", "txt"), "domain", "txt"),
          "graftbot", defaultMs = 1000L)
        val ledger = java.nio.file.Files
          .createTempDirectory("graft-polbudget").toString
        val b0 = frontier
          .select(monotonically_increasing_id().as("id"), col("url"),
            lit(Array.emptyByteArray).as("blob"))
          .localCheckpoint()
        val m0 = graft.streaming.StreamingCrawl.processBatch(b0, 0L,
          "id", "url", "blob", rules, "graftbot", ledger,
          delays = Some(delays))
        m0.count()
        // batch 1: the same hosts fetch fresh paths — the horizon
        // ledger must carry batch 0's reservations without refolding
        // anything corpus-sized
        val b1 = b0.select((col("id") + 1000000000L).as("id"),
          concat(col("url"), lit("z")).as("url"), col("blob"))
        val m1 = graft.streaming.StreamingCrawl.processBatch(b1, 1L,
          "id", "url", "blob", rules, "graftbot", ledger,
          delays = Some(delays))
        val out = m1.agg(sum(coalesce(col("fetch_at_ms"), lit(0L))))
          .head.getLong(0)
        Seq(m0, m1, b0).foreach(_.unpersist(blocking = false))
        out
      }

      // 6'. PDF front gate (round 15): build + extract per row — pure
      //     CPU riding the scan (the adjudicated mapPartitions decoder
      //     shape), so wall must grow sublinearly with ×N on idle
      //     cores and the ONLY shuffle is the closing sum. Fresh ids
      //     per replica so nothing dedups away.
      if (want("pdf_")) timed(s"pdf_extract x$rep") {
        import spark.implicits._
        val blobs = docsTimes(rep, saltText = false)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.PdfFixtures.docPdf(id))))
          .toDF("doc_id", "payload")
        graft.operators.Pdf.extractText(blobs, "doc_id", "payload")
          .agg(sum(length(col("text")))).head.getLong(0)
      }

      // 7. CHAR-granularity dedup tier (round-12 arrival): the exact
      //    all-positions explode is one row per char — the shape that
      //    needs measured ×N rows before anyone trusts it at 100 TB —
      //    and the anchored variant is the production path (winnowed
      //    minimizer anchors, ~w× less volume, lower-envelope
      //    guarantee). Unmodified text under fresh ids, the exact-run
      //    semantics: gram df grows ×N, cross-doc mass dominated by
      //    the replica families.
      //    (sum-forced like exact_run_dedup above — the same prunable
      //    unique-key outer-join tail)
      timed(s"char_runs_exact x$rep") {
        graft.operators.TextOps.charRunCoverage(
            docsTimes(rep, saltText = false), "doc_id", "text", k = 20)
          .agg(sum(col("covered_chars") + col("max_run"))).head.getLong(0)
      }
      timed(s"char_runs_anchored_w4 x$rep") {
        graft.operators.TextOps.charRunCoverageAnchored(
            docsTimes(rep, saltText = false), "doc_id", "text", k = 20, w = 4)
          .agg(sum(col("covered_chars") + col("max_run"))).head.getLong(0)
      }
      timed(s"char_runs_anchored_w8 x$rep") {
        graft.operators.TextOps.charRunCoverageAnchored(
            docsTimes(rep, saltText = false), "doc_id", "text", k = 20, w = 8)
          .agg(sum(col("covered_chars") + col("max_run"))).head.getLong(0)
      }
      timed(s"char_cut x$rep") {
        graft.operators.TextOps.charRunDedupText(
            docsTimes(rep, saltText = false), "doc_id", "text", k = 20)
          .agg(sum(col("n_kept") + length(col("clean_text")))).head.getLong(0)
      }
      // the volume ratio the anchored tier buys: rows entering the
      // cross-doc stats/join stage (exact = every gram position,
      // anchored = selected minimizers)
      if (want("char_")) locally {
        import org.apache.spark.sql.graftbridge.Bridge
        val d0 = docsTimes(rep, saltText = false)
        def volume(minsOf: Option[Int]): Long = minsOf match {
          case None => d0.select(sum(greatest(length(col("text")) - 19, lit(0))))
            .head.getLong(0)
          case Some(w) =>
            val m = Bridge.column(graft.expressions.CharMinimizers(
              Bridge.expression(coalesce(col("text").cast("string"), lit(""))), 20, w))
            d0.select(sum(when(m.isNull, 0).otherwise(size(m)))).head.getLong(0)
        }
        val (e, a4, a8) = (volume(None), volume(Some(4)), volume(Some(8)))
        println(f"[scale-probe]   char tier volume x$rep: exact $e%d  anchored_w4 $a4%d (${e.toDouble / a4}%.2fx less)  anchored_w8 $a8%d (${e.toDouble / a8}%.2fx less)")
      }
    }
    spark.stop()
  }
}
