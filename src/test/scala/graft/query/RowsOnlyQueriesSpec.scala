package graft.query

import graft.{SparkEntry, SparkSpec}

/** Schema + row-count pins for the rows-only driver queries — the
  * entries with no DuckDB oracle (engine-internal tables;
  * engine-specific sketch values; the BPE family graduated to a
  * generated unrolled-iteration oracle in round 9 but keeps its pins
  * here as cheap fast-fail). Without these
  * pins a regression in any of them is invisible: the driver records only
  * that rows were produced. Run at sf0.001 to keep the suite cheap; every
  * assertion is derived from the query's own inputs, not transcribed
  * output, so a legitimate fixture change fails loudly rather than
  * silently shifting.
  */
class RowsOnlyQueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("rows-only queries: every registered query without an oracle is pinned here") {
    val oracled = SparkEntry.oracleSql.keySet
    val rowsOnly = SparkEntry.queries.keySet -- oracled
    assert(rowsOnly == Set(
      "corpus_length_percentiles_approx",
      "engine_ingest_e2e", "engine_snapshot_read",
      "text_compression_gate",
      "text_vocab_approx", "engine_snapshot_diff",
      "text_classifier_train",
      "engine_stream_drift",
      "engine_stream_corpus", "text_score_percentiles_approx",
      "text_heavyhitters_sketch", "engine_stream_media"),
      "a new rows-only query was registered without a pin in this spec")
  }

  // dedup_char_anchored graduated to a full DuckDB oracle in round 14
  // (the decile report replays both coverage chains in SQL) but keeps
  // its envelope pin here as cheap fast-fail on the INVARIANT the hash
  // cannot express: anchored ≤ exact on every doc, by construction.
  test("dedup_char_anchored: a strict lower envelope of the exact char-run coverage") {
    val df = run("dedup_char_anchored")
    assert(df.columns.toSeq == Seq("decile", "n_docs", "exact_covered",
      "anchored_covered", "envelope_violations"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(4) == 0L),
      "anchored coverage exceeded exact on some doc — the winnowing envelope broke")
    assert(rows.forall(r => r.getLong(3) <= r.getLong(2)))
    val (e, a) = (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    assert(a * 10 >= e * 5, s"anchored mass $a should stay a usable fraction of exact $e")
  }

  // engine_stream_prefix graduated to a full DuckDB oracle in round 16
  // (survivor sets are exact generator arithmetic); recompute pin
  // stays as fast-fail, the house precedent.
  test("engine_stream_prefix: the arithmetic fixture's exact survivor sets") {
    val df = run("engine_stream_prefix")
    assert(df.columns.toSeq == Seq("batch", "n_survivors", "survivor_id_sum"))
    val got = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch 0: fams 20-39 survive as ids 100-119 (sum 2190); batch 1:
    // new fams 40-49 survive as ids 240-249 (sum 2445) — every other
    // family must lose to the seed or a stored batch-0 survivor
    assert(got == Map(0L -> (20L, 2190L), 1L -> (10L, 2445L)))
  }

  test("engine_stream_media: twins collapse in batch 0, batch 1 rejects every re-upload") {
    val df = run("engine_stream_media")
    assert(df.columns.toSeq == Seq("batch", "kind", "n_admitted", "n_copies"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    // batch 0 admits both kinds; the PNG/JPEG twin pairs mean the image
    // copy count strictly exceeds the admitted count
    val img0 = rows((0L, "image"))
    assert(img0.getLong(2) > 0 && img0.getLong(3) > img0.getLong(2),
      "cross-format twins must collapse (copies > admitted)")
    assert(rows.contains((0L, "audio")) && rows((0L, "audio")).getLong(2) > 0)
    // batch 1: ONLY the novel images are admitted — every image and
    // audio re-upload is rejected by the cross-batch ledger, so no
    // batch-1 audio row exists at all
    assert(!rows.contains((1L, "audio")),
      "a rewritten-container audio re-upload slipped past the ledger")
    val img1 = rows((1L, "image"))
    assert(img1.getLong(2) >= 1 && img1.getLong(2) <= 20)
  }

  test("engine_stream_links: anchor targets budget-gate in, seen links drain, hops carry") {
    val df = run("engine_stream_links")
    assert(df.columns.toSeq == Seq("batch", "kind", "n"))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // batch 0: 200 seeds admit; 2 own targets per seed + 20 domain hubs
    // = 420 frontier rows. batch 1: the 20 hubs admit; each links one
    // already-fetched seed (drained by the seen ledger) and one fresh
    // /deep page, which enters at hop 2 via the hop carry.
    assert(got == Map(
      (0L, "admitted") -> 200L, (0L, "frontier") -> 420L,
      (1L, "admitted") -> 20L, (1L, "frontier") -> 20L,
      (1L, "frontier_hop2") -> 20L), s"got $got")
  }

  // engine_stream_redirects and engine_stream_links graduated to full
  // DuckDB oracles in round 16 (outcome/frontier counts are exact
  // fixture arithmetic); their recompute pins stay as cheap fast-fail,
  // the dedup_char_anchored precedent.
  test("engine_stream_redirects: targets discovered once, fetched once, frontier drains") {
    val df = run("engine_stream_redirects")
    assert(df.columns.toSeq == Seq("batch", "kind", "n"))
    val got = df.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // 300 seeds: ids ≡ 0 (mod 3) — 100 of them — answer 301 with a
    // relative Location (permanent → the split outcome class + alias
    // ledger rows); the rest admit. The frontier carries exactly the
    // 100 resolved targets. Batch 1 fetches all 100 (admitted via
    // redirect discovery) while the 50 ids ≡ 0 (mod 6) re-answer 301;
    // every re-discovered target is now in the seen ledger → frontier
    // drains to zero: fetched exactly once.
    assert(got == Map(
      (0L, "admitted") -> 200L, (0L, "redirect_permanent") -> 100L,
      (0L, "frontier") -> 100L,
      (1L, "admitted") -> 100L, (1L, "redirect_permanent") -> 50L,
      (1L, "frontier") -> 0L))
  }

  // engine_stream_web graduated to a full DuckDB oracle in round 16
  // (the web_crawl_plan_ledger pattern: the whole outcome/dedup/
  // politeness arithmetic replayed in SQL) but keeps this recompute
  // pin as cheap fast-fail, the dedup_char_anchored precedent.
  test("engine_stream_web: every aggregate recomputes from the seed") {
    val df = run("engine_stream_web")
    assert(df.columns.toSeq == Seq("batch", "outcome", "n", "n_domains",
      "max_fetch_ms", "max_delay_ms"))
    val full = df.collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val got = full.view.mapValues(v => (v._1, v._2)).toMap
    // replay the fixture arithmetic: ids < 400, m = id % 50, domains
    // with m % 3 = 0 disallow /Path
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ids = graft.Tables.documents(spark, sf).filter(col("doc_id") < 400)
      .select(col("doc_id")).as[Long].collect().toSeq.sorted
    def blocked(id: Long) = (id % 50) % 3 == 0
    def doms(s: Seq[Long]) = s.map(_ % 50).distinct.size.toLong
    val (b30, a30) = (ids.take(30).filter(blocked), ids.take(30).filterNot(blocked))
    val (blk, adm) = (ids.filter(blocked), ids.filterNot(blocked))
    assert(got((0L, "admitted")) == (adm.size.toLong, doms(adm)))
    assert(got((0L, "robots_blocked")) == ((blk.size + b30.size).toLong, doms(blk)))
    assert(got((0L, "duplicate")) == (a30.size.toLong, doms(a30)))
    assert(!got.contains((0L, "invalid")))
    val (b40, a40) = (ids.take(40).filter(blocked), ids.take(40).filterNot(blocked))
    val f25 = ids.take(25)
    assert(got((1L, "robots_blocked")) == (b40.size.toLong, doms(b40)),
      "batch-1 respellings of blocked URLs must re-block")
    assert(got((1L, "duplicate")) == (a40.size.toLong, doms(a40)),
      "the seen ledger must reject every allowed respelling")
    assert(got((1L, "admitted")) == (f25.size.toLong, doms(f25)),
      "fresh paths must all admit")
    assert(got((1L, "invalid")) == (5L, 0L))
    // politeness replay: robots declare Crawl-delay 1 + m%5 seconds;
    // per batch a host's admissions take slots at that spacing, and
    // batch 1 starts from the horizon batch 0 reserved (cnt0 · delay)
    def delayOf(m: Long) = (1L + m % 5) * 1000L
    val c0 = adm.groupBy(_ % 50).view.mapValues(_.size.toLong).toMap
    val c1 = f25.groupBy(_ % 50).view.mapValues(_.size.toLong).toMap
    val max0 = c0.map { case (m, c) => (c - 1) * delayOf(m) }.max
    val max1 = c1.map { case (m, c) => (c0.getOrElse(m, 0L) + c - 1) * delayOf(m) }.max
    assert(full((0L, "admitted"))._3 == max0, s"batch-0 schedule horizon")
    assert(full((1L, "admitted"))._3 == max1,
      "batch-1 schedule must start from the reserved horizon, not zero")
    assert(full((0L, "admitted"))._4 == c0.keys.map(delayOf).max)
    assert(full((1L, "admitted"))._4 == c1.keys.map(delayOf).max)
    // non-admitted outcomes carry no schedule (the -1 sentinel)
    assert(full((0L, "robots_blocked"))._3 == -1L && full((1L, "duplicate"))._3 == -1L)
  }

  test("text_score_percentiles_approx: sketch quantiles sit at exact ranks for small groups") {
    val df = run("text_score_percentiles_approx")
    assert(df.columns.toSeq == Seq("lang", "n", "approx_p10", "approx_p50", "approx_p90"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // exact per-lang sorted scores, recomputed through the same operator
    val scored = graft.operators.TextOps.classifierScore(
      graft.Tables.documents(spark, sf), "doc_id", "text",
      weightsPermille = Map(
        "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
        "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L),
      threshold = 0.02)
    val byLang = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id").as("doc"),
        org.apache.spark.sql.functions.col("lang"))
      .join(scored, Seq("doc"))
      .select("lang", "score").collect()
      .filter(!_.isNullAt(1))
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val lang = r.getString(0)
      val xs = byLang(lang)
      // GK sketch at accuracy 10000: exact rank for groups this small —
      // each reported quantile must be at the exact percentile position
      // (Spark's continuous approx_percentile definition: the smallest
      // value whose rank >= ceil(p * n)), up to the query's rounding
      def at(p: Double) = xs(math.max(0, math.ceil(p * xs.length).toInt - 1))
      assert(math.abs(r.getDouble(2) - at(0.1)) < 1e-6, s"$lang p10")
      assert(math.abs(r.getDouble(3) - at(0.5)) < 1e-6, s"$lang p50")
      assert(math.abs(r.getDouble(4) - at(0.9)) < 1e-6, s"$lang p90")
    }
  }

  test("engine_stream_corpus: funnel monotone, cross-batch dedup/budget visible, clean drift") {
    val df = run("engine_stream_corpus")
    assert(df.columns.toSeq == Seq("batch_id", "n_arrived", "n_valid",
      "n_gated", "n_unique", "n_admitted", "admitted_tokens", "checks_pass",
      "drift_alarm"))
    val rows = df.collect()
    assert(rows.length == 2 && rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val nDocs = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 400).count()
    assert(rows(0).getLong(1) == nDocs, "every corpus doc arrives in batch 0")
    rows.foreach { r =>
      // the funnel can only narrow: arrived ≥ valid ≥ gated ≥ unique ≥ admitted
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= r.getLong(3) &&
        r.getLong(3) >= r.getLong(4) && r.getLong(4) >= r.getLong(5))
      assert(r.getAs[Boolean]("checks_pass"), "fixture batches pass their expectations")
    }
    // batch 0: a clean slice of the gate-passing reference distribution
    assert(!rows(0).getAs[Boolean]("drift_alarm"),
      "a same-distribution slice must not trip the drift alarm")
    assert(rows(0).getLong(5) > 0L, "batch 0 admits a real corpus")
    // the template-heavy corpus really deduplicates within batch 0
    assert(rows(0).getLong(4) < rows(0).getLong(3),
      "near-dedup must remove documents from this template-generated corpus")
    // batch 1 = 10 exact copies + 5 over-budget novel src0 docs + 20
    // poisoned docs; all 35 pass validation and the gates, the copies die
    // in CROSS-BATCH dedup (stored band index), the novel src0 docs die
    // in the CROSS-BATCH budget (400 tokens can never fit a 300 budget),
    // the poison is admitted and must trip the drift monitor
    val b1 = rows(1)
    assert(b1.getLong(1) == 35L && b1.getLong(2) == 35L && b1.getLong(3) == 35L)
    assert(b1.getLong(4) == 25L, "exact copies rejected by the stored index")
    assert(b1.getLong(5) == 20L, "novel src0 docs rejected by the spent budget")
    assert(b1.getLong(6) == 20L * 305L, "poison tokens: 20 docs x 305 tokens")
    assert(b1.getAs[Boolean]("drift_alarm"), "the poisoned batch must alarm")
  }

  test("engine_stream_drift: clean batch quiet, shifted batch alarms, axes reported") {
    val df = run("engine_stream_drift")
    assert(df.columns.toSeq == Seq("batch_id", "n_rows", "mean_pc1", "var_pc1",
      "z_mean", "axis_cos", "eigval_ref", "eigval_new", "alarm"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(!rows(0).getAs[Boolean]("alarm"), "same-distribution quarter must not alarm")
    assert(rows(1).getAs[Boolean]("alarm"), "the +0.3 mean-shifted batch must alarm")
    rows.foreach { r =>
      val c = r.getAs[Double]("axis_cos")
      assert(c >= 0.0 && c <= 1.0 + 1e-12)
      assert(r.getAs[Double]("eigval_ref") > 0.0 && r.getAs[Double]("eigval_new") > 0.0)
    }
  }

  test("text_heavyhitters_sketch: CMS never underestimates, overestimate within eps bound") {
    val df = run("text_heavyhitters_sketch")
    assert(df.columns.toSeq == Seq("term", "exact_count", "cms_count"))
    val rows = df.collect()
    assert(rows.length == 20)
    val total = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.operators.TextOps.tokens(org.apache.spark.sql.functions.col("text"))))
      .count()
    rows.foreach { r =>
      val (exact, cms) = (r.getLong(1), r.getLong(2))
      assert(cms >= exact, s"CMS underestimated ${r.getString(0)}: $cms < $exact")
      assert(cms - exact <= math.max(1L, (0.0005 * 2 * total).toLong),
        s"${r.getString(0)} overestimate ${cms - exact} exceeds 2x eps bound")
    }
  }

  test("text_bpe_stored: stored-tokenizer encode covers every doc with the bound invariant") {
    val df = run("text_bpe_stored")
    assert(df.columns.toSeq == Seq("doc", "n_tokens", "n_bpe", "bpe_ratio"))
    assert(df.count() == graft.Tables.documents(spark, sf).count())
    assert(df.filter(org.apache.spark.sql.functions.col("n_bpe") <
      org.apache.spark.sql.functions.col("n_tokens")).count() == 0)
  }

  test("text_classifier_train: one row per epoch, loss from ln(2), finite trajectory") {
    val df = run("text_classifier_train")
    assert(df.columns.toSeq == Seq("epoch", "loss", "accuracy"))
    val rows = df.collect()
    assert(rows.length == 12 && rows.map(_.getLong(0)).toSeq == (0L until 12L))
    assert(math.abs(rows.head.getDouble(1) - math.log(2.0)) < 1e-9,
      "epoch 0 loss is exactly ln(2) at zero weights")
    assert(rows.forall(r => !r.getDouble(1).isNaN && r.getDouble(1) > 0))
    assert(rows.last.getDouble(1) < rows.head.getDouble(1), "training must reduce loss")
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  // engine_stream_validate graduated to a DATA-driven DuckDB oracle in
  // round 16 (violation counts recomputed from the documents table
  // itself); recompute pin stays as fast-fail, the house precedent.
  test("engine_stream_validate: two batches x four checks, cumulative = sum of batches") {
    val df = run("engine_stream_validate")
    assert(df.columns.toSeq == Seq("batch_id", "check_name", "tbl", "n_rows",
      "n_violations", "pass", "cum_rows", "cum_violations", "cum_pass"))
    val rows = df.collect()
    assert(rows.length == 8, "2 batches x 4 checks")
    val total = graft.Tables.documents(spark, sf).count()
    val b1 = rows.filter(_.getLong(0) == 1L)
    assert(b1.forall(_.getLong(6) == total), "batch-1 cumulative rows = whole corpus")
    rows.foreach(r => assert(r.getLong(7) >= r.getLong(4) || r.getLong(0) == 0L))
  }

  // engine_jsonl_quarantine and engine_stream_enrich graduated to
  // DuckDB oracles in round 16 (the quarantine side is DATA-driven;
  // the enrich side's constants ARE the snapshot-isolation proof);
  // recompute pins stay as fast-fail, the house precedent.
  test("engine_jsonl_quarantine: every line accounted for, ids and langs intact") {
    val df = run("engine_jsonl_quarantine")
    assert(df.columns.toSeq == Seq("n_good", "sum_ids", "n_langs", "n_corrupt"))
    val r = df.collect().head
    val docs = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 100)
    assert(r.getLong(0) == docs.count(), "every serialized doc parses back")
    assert(r.getLong(3) == 3L, "exactly the three injected broken lines quarantine")
    assert(r.getLong(1) == docs.agg(org.apache.spark.sql.functions.sum("doc_id"))
      .head.getLong(0), "ids survive the round-trip")
  }

  test("text_vocab_approx: one row per lang, sketch within 15% of the exact vocab it reports beside") {
    val df = run("text_vocab_approx")
    assert(df.columns.toSeq == Seq("lang", "n_tokens", "exact_vocab", "approx_vocab"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(2), r.getLong(3))
      assert(math.abs(approx - exact).toDouble / exact <= 0.15,
        s"HLL++ at default rsd must land within 15% (lang ${r.getString(0)}: $approx vs $exact)")
    }
  }

  test("text_compression_gate: one row per doc, ratio ordered columns, both gate branches live") {
    val df = run("text_compression_gate")
    assert(df.columns.toSeq == Seq("doc", "n_bytes", "deflate_bytes", "ratio", "keep"))
    assert(df.count() == graft.Tables.documents(spark, sf).count())
    val branches = df.groupBy("keep").count().collect().map(_.getBoolean(0)).toSet
    assert(branches.contains(true), "the keep band must be live on the driver corpus")
  }

  test("corpus_length_percentiles_approx: scalar sketch columns, one row per lang") {
    val df = run("corpus_length_percentiles_approx")
    assert(df.columns.toSeq == Seq("lang", "n", "approx_p10", "approx_p50", "approx_p90"))
    val langs = graft.Tables.documents(spark, sf).select("lang").distinct().count()
    val rows = df.collect()
    assert(rows.length.toLong == langs)
    // sketch values are engine-specific but must be ordered quantiles
    rows.foreach { r =>
      val (p10, p50, p90) = (r.getInt(2), r.getInt(3), r.getInt(4))
      assert(p10 <= p50 && p50 <= p90, s"quantiles out of order for ${r.getString(0)}")
    }
  }

  test("text_bpe_merges: 30 ranked merges; text_bpe_tokenize: one row per doc, ratio <= 1 bound sanity") {
    val merges = run("text_bpe_merges")
    assert(merges.columns.toSeq == Seq("rank", "left", "right"))
    assert(merges.count() == 30)
    val tok = run("text_bpe_tokenize")
    assert(tok.columns.toSeq == Seq("doc", "n_tokens", "n_bpe", "bpe_ratio"))
    assert(tok.count() == graft.Tables.documents(spark, sf).count())
    // BPE only ever merges: per-word piece count is bounded by word length,
    // and is at least 1, so n_bpe >= n_tokens for whitespace words.
    assert(tok.filter(org.apache.spark.sql.functions.col("n_bpe") <
      org.apache.spark.sql.functions.col("n_tokens")).count() == 0)
  }

  test("engine queries: stable schemas and fixture-determined row counts") {
    val e2e = run("engine_ingest_e2e")
    assert(e2e.columns.toSeq == Seq("round", "intra", "typeenum", "asset", "txid"))
    val e2eRows = e2e.count()
    val snap = run("engine_snapshot_read")
    assert(snap.columns.toSeq == Seq("view", "lo", "hi", "rows"))
    assert(snap.count() == 2, "one row per snapshot view")
    val diff = run("engine_snapshot_diff")
    assert(diff.columns.toSeq == Seq("op", "rows", "lo_round", "hi_round"))
    val dr = diff.collect()
    assert(dr.length == 1 && dr(0).getString(0) == "added" && dr(0).getLong(1) == 24,
      "append-only phase 2 diffs as exactly its 24 added txn rows")
    val enrich = run("engine_stream_enrich")
    assert(enrich.columns.toSeq == Seq("batch_id", "n_refs", "n_enriched", "hi_round"))
    assert(enrich.count() == 2, "two streaming micro-batches")
    // the ingest fixture is deterministic: same blocks -> same txn rows
    assert(e2eRows == 28, "8-round deterministic ingest fixture emits 28 txn rows")
  }
}
