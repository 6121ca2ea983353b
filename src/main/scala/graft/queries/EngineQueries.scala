package graft.queries

import graft.codec.{BlockCodec, Codecs}
import graft.ingest.{BlockIngest, TableStore}
import graft.model._
import graft.query.Api
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The engine's own write+read vertical exposed through the driver
  * surface: builds a deterministic synthetic chain, ingests it through the
  * full batch path (flatten → append → state merges → metastate), then
  * answers a read-API query over the maintained tables. rows-only check
  * (no SQL oracle — the tables are the engine's own), but the BENCH loop
  * times it, so ingest throughput is measured every round.
  */
object EngineQueries {

  def addr(i: Int): String = Codecs.addressEncode(
    Array.tabulate(32)(j => ((i * 31 + j * 7) % 251).toByte))

  /** Deterministic chain: `rounds` rounds × `txnsPerRound` pay/axfer txns
    * with per-round account/asset deltas and one app call with inners. */
  def syntheticBlocks(rounds: Int, txnsPerRound: Int, startRound: Int = 0): Seq[Block] =
    (startRound until startRound + rounds).map { r =>
      val payset = (0 until txnsPerRound).map { i =>
        val from = addr((r * 13 + i) % 40)
        val to = addr((r * 13 + i + 1) % 40)
        if (i % 3 == 2)
          SignedTxnWithAD(
            txn = Txn(txType = "axfer", sender = from, assetReceiver = to,
              xferAsset = 1000 + i % 5, assetAmount = BigInt(i + 1), fee = 1000,
              firstValid = r + 1, note = s"r$r-i$i".getBytes("UTF-8")),
            sig = Array.fill(64)(((r + i) % 127).toByte))
        else
          SignedTxnWithAD(
            txn = Txn(txType = "pay", sender = from, receiver = to,
              amount = BigInt((r + 1) * 100 + i), fee = 1000,
              firstValid = r + 1, note = s"r$r-i$i".getBytes("UTF-8")),
            sig = Array.fill(64)(((r + i) % 127).toByte))
      }.toVector :+ SignedTxnWithAD(
        txn = Txn(txType = "appl", sender = addr(1), applicationId = 900 + r % 3,
          accounts = Vector(addr(2)), fee = 1000),
        sig = Array.fill(64)(7.toByte),
        applyData = ApplyData(evalDelta = EvalDelta(innerTxns = Vector(
          SignedTxnWithAD(txn = Txn(txType = "pay", sender = addr(2),
            receiver = addr(3), amount = BigInt(r + 1)))))))

      val accounts = (0 until math.min(10, txnsPerRound)).map { i =>
        AccountDelta(addr((r * 13 + i) % 40), microAlgos = 1000000L + r * 1000 + i,
          rewardsBase = r, rewardedMicroAlgos = i,
          accountDataJson = s"""{"r":$r}""")
      }.toVector
      val assets = (0 until 3).map { i =>
        AssetResourceRecord(addr = addr(i), aidx = 1000 + i,
          paramsJson = Some(s"""{"an":"asset$i","un":"A$i"}"""),
          holding = Some(AssetHolding(BigInt(r * 10 + i + 1), frozen = false)))
      }.toVector
      Block(
        round = r, timestamp = 1700000000L + r * 4, rewardsLevel = r,
        genesisId = "graft-bench", genesisHash = Codecs.sha512_256("gb".getBytes),
        feeSink = addr(250 % 40), rewardsPool = addr(251 % 40),
        txnCounter = 10000 + r.toLong * (txnsPerRound + 2),
        payset = payset,
        delta = LedgerDelta(accounts = accounts, assetResources = assets))
    }

  val defs: Seq[QueryDef] = Seq(
    // End-to-end: ingest a 12-round chain (~12×22 txn rows incl. inners)
    // into a fresh store, then run the canonical read query (transactions
    // by address, newest-first). Exercises A1-A7, B1-B9, C1-C6, D, G.
    QueryDef.rowsOnly("engine_ingest_e2e") {
      (s, _) =>
        val root = java.nio.file.Files.createTempDirectory("graft-engine-q").toString
        val store = new TableStore(s, root, nBuckets = 8)
        BlockIngest.initGenesis(store,
          (0 until 40).map(i => (addr(i), 1000000L, "{}")), network = "graft-bench")
        import s.implicits._
        val blocks = syntheticBlocks(rounds = 12, txnsPerRound = 20)
        BlockIngest.applyBlocks(store, s.createDataset(blocks.map(BlockCodec.blockToJson)))
        val (txns, _) = Api.transactions(store, Api.TransactionFilter(
          address = Some(addr(1)), limit = Some(500)))
        txns.select("round", "intra", "typeenum", "asset", "txid")
          .orderBy(desc("round"), desc("intra"))
    },

    // Streaming AS-OF enrichment: a memory stream of round references is
    // enriched per micro-batch against block_header through ONE pinned
    // metastate version (StreamingEnrich) while a concurrent phase-2
    // ingest commits mid-batch — the torn-read trap the operator exists
    // to close. Output is the per-batch enrichment summary; the values
    // make the pinning visible to the driver: batch 0 (pinned before the
    // commit) resolves only phase-1 refs, batch 1 resolves the rest.
    // rows-only: engine tables + streaming, no SQL oracle.
    QueryDef.sql(
      "engine_stream_enrich",
      // ORACLED since round 16: the four counts are exact fixture
      // arithmetic whose WHOLE point is snapshot isolation — batch 0
      // references rounds {0,2,5,7} while rounds 4-7 commit MID-batch,
      // so exactly {0,2} enrich (a broken snapshot would read 4
      // enriched and hash-mismatch here); the re-sent refs {5,7}
      // enrich in batch 1 against the next snapshot.
      """SELECT CAST(0 AS BIGINT) AS batch_id, CAST(4 AS BIGINT) AS n_refs,
        |  CAST(2 AS BIGINT) AS n_enriched, CAST(2 AS BIGINT) AS hi_round
        |UNION ALL SELECT 1, 2, 2, 7 ORDER BY batch_id""".stripMargin) {
      (s, _) =>
        import s.implicits._
        implicit val sqlCtx = s.sqlContext
        val root = java.nio.file.Files.createTempDirectory("graft-engine-se").toString
        val store = new TableStore(s, root, nBuckets = 8)
        BlockIngest.initGenesis(store,
          (0 until 40).map(i => (addr(i), 1000000L, "{}")), network = "graft-bench")
        def ingest(start: Int, n: Int): Unit = BlockIngest.applyBlocks(store,
          s.createDataset(syntheticBlocks(rounds = n, txnsPerRound = 4,
            startRound = start).map(BlockCodec.blockToJson)))
        ingest(0, 4) // phase 1: rounds 0-3
        val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
        val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
        val trap = new java.util.concurrent.atomic.AtomicBoolean(true)
        val q = graft.streaming.StreamingEnrich.enrichEachBatch(
          mem.toDF().toDF("round_ref"), store) { (batch, snap) =>
          val hdr = snap.read("block_header").select(col("round"), col("realtime"))
          val joined = batch.join(hdr, col("round_ref") === col("round"), "left_outer")
          if (trap.getAndSet(false)) ingest(4, 4) // commits rounds 4-7 mid-batch
          joined
        } { (df, batchId) =>
          df.agg(count(lit(1)), count(col("round")), max(col("round"))).collect()
            .foreach(r => acc.add((batchId, r.getLong(0), r.getLong(1),
              if (r.isNullAt(2)) -1L else r.getLong(2))))
        }
        mem.addData(0L, 2L, 5L, 7L) // 5 and 7 exist only after the mid-batch commit
        q.processAllAvailable()
        mem.addData(5L, 7L)
        q.processAllAvailable()
        q.stop()
        // explicit schema: tuple toDF's TypeTag derivation is unreliable
        // inside these query lambdas (scala-reflect RefinedType failure)
        val schema = org.apache.spark.sql.types.StructType(
          Seq("batch_id", "n_refs", "n_enriched", "hi_round").map(
            org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.LongType)))
        val rows = acc.toArray(Array.empty[(Long, Long, Long, Long)]).toSeq.sortBy(_._1)
          .map(t => org.apache.spark.sql.Row(t._1, t._2, t._3, t._4))
        s.createDataFrame(new java.util.ArrayList(rows.asJava), schema)
          .orderBy("batch_id")
    },

    // Snapshot (time-travel) read: a two-phase-ingested store with the
    // metadata-log version pinned between phases; the query reads the txn
    // table both at head and as of the pin — the reproducible-corpus
    // contract (rows-only: engine tables). The pinned view must show ONLY
    // phase-1 rounds even though head has both, which the row values make
    // visible to the driver. The fixture store is built once per session
    // (ingest cost is engine_ingest_e2e's measurement; THIS query times
    // the as-of read path: stateAt replay + manifest-subset scan).
    QueryDef.rowsOnly("engine_snapshot_read") {
      (s, _) =>
        val (store, vPin) = snapshotFixture(s)
        def span(df: org.apache.spark.sql.DataFrame, view: String) =
          df.agg(lit(view).as("view"), min("round").as("lo"),
            max("round").as("hi"), count(lit(1)).as("rows"))
        span(store.readAsOf("txn", vPin), "pinned")
          .unionByName(span(store.read("txn"), "head"))
          .orderBy("view")
    },

    // ── Time-travel DIFF: what changed between the pinned phase-1
    //    snapshot and the head — the corpus-version audit. The phase-2
    //    ingest only appends, so the diff is pure 'added' rows spanning
    //    exactly the phase-2 rounds; 'removed' is structurally possible
    //    (prune rewrites) and reported when present. ──
    QueryDef.rowsOnly("engine_snapshot_diff") {
      (s, _) =>
        val (store, vPin) = snapshotFixture(s)
        store.diffAsOf("txn", vPin, store.metaVersion)
          .groupBy("_op")
          .agg(count(lit(1)).as("rows"),
            min("round").as("lo_round"), max("round").as("hi_round"))
          .withColumnRenamed("_op", "op")
          .orderBy("op")
    },

    // ── Streaming data-quality monitor vertical: the documents corpus
    //    arrives as two micro-batches (even/odd doc ids) through
    //    StreamingValidation — per-batch expectation counts plus the
    //    durable cumulative ledger (batch-partitioned parquet state,
    //    replay-idempotent; spec-pinned in StreamingValidationSpec).
    //    rows-only: the ledger is the engine's own state. ──
    QueryDef.sql(
      "engine_stream_validate",
      // ORACLED since round 16 — and unlike the arithmetic-fixture
      // graduations this one is DATA-driven: DuckDB recomputes every
      // check's violation count from the documents table itself (null
      // ≡ violation for Expect, count − count(DISTINCT) for Unique)
      // per parity batch, plus the cumulative ledger fold — so the
      // whole durable-validation vertical (per-batch report + ledger
      // cumulative) hash-matches at every sf whatever the data holds.
      """WITH b AS (SELECT doc_id % 2 AS batch_id, doc_id, text, n_chars
        |  FROM documents WHERE doc_id IS NOT NULL),
        |per AS (SELECT batch_id,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
        |  CAST(sum(CASE WHEN coalesce(length(text) > 0, false) THEN 0 ELSE 1 END)
        |    AS BIGINT) AS v_text,
        |  CAST(sum(CASE WHEN coalesce(n_chars = length(text), false) THEN 0 ELSE 1 END)
        |    AS BIGINT) AS v_chars,
        |  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS v_uni
        | FROM b GROUP BY batch_id),
        |checks AS (
        |  SELECT batch_id, 'doc_id_not_null' AS check_name, n_rows,
        |    v_null AS n_violations FROM per
        |  UNION ALL SELECT batch_id, 'text_nonempty', n_rows, v_text FROM per
        |  UNION ALL SELECT batch_id, 'chars_consistent', n_rows, v_chars FROM per
        |  UNION ALL SELECT batch_id, 'doc_id_unique', n_rows, v_uni FROM per),
        |cum AS (SELECT c.batch_id, c.check_name, c.n_rows, c.n_violations,
        |  sum(c2.n_rows) AS cum_rows, sum(c2.n_violations) AS cum_violations
        | FROM checks c JOIN checks c2
        |   ON c2.check_name = c.check_name AND c2.batch_id <= c.batch_id
        | GROUP BY c.batch_id, c.check_name, c.n_rows, c.n_violations)
        |SELECT CAST(batch_id AS BIGINT) AS batch_id, check_name,
        |  'documents' AS tbl, n_rows, n_violations,
        |  n_violations = 0 AS pass,
        |  CAST(cum_rows AS BIGINT) AS cum_rows,
        |  CAST(cum_violations AS BIGINT) AS cum_violations,
        |  cum_violations = 0 AS cum_pass
        |FROM cum ORDER BY batch_id, check_name""".stripMargin) {
      (s, d) =>
        import graft.operators.Validation.{Expect, Unique}
        val docs = graft.Tables.documents(s, d)
        val checks = Seq(
          Expect("doc_id_not_null", col("doc_id").isNotNull),
          Expect("text_nonempty", length(col("text")) > 0),
          Expect("chars_consistent", col("n_chars") === length(col("text"))),
          Unique("doc_id_unique", col("doc_id")))
        val st = java.nio.file.Files.createTempDirectory("graft-sval").toString
        val r0 = graft.streaming.StreamingValidation.processBatch(
          docs.filter(col("doc_id") % 2 === 0), 0L, "documents", checks, st)
        val r1 = graft.streaming.StreamingValidation.processBatch(
          docs.filter(col("doc_id") % 2 === 1), 1L, "documents", checks, st)
        r0.unionByName(r1).orderBy("batch_id", "check_name")
    },

    // ── Streaming embedding-drift vertical: reference moments trained on
    //    half the embeddings and persisted (the Pca.saveMoments deploy
    //    artifact), then two micro-batches — a clean quarter and a
    //    mean-shifted copy (+0.3 on every dim) — through StreamingDrift:
    //    per-batch z-score of the projection mean on the stored PC1,
    //    banked batch moments, and the incrementally re-solved axis. The
    //    shifted batch MUST alarm, the clean one must not (both branches
    //    live; spec-pinned in StreamingDriftSpec). rows-only: the
    //    ledger and moments are the engine's own state. ──
    QueryDef.rowsOnly("engine_stream_drift") {
      (s, d) =>
        val emb = graft.Tables.embeddings(s, d)
        val refDir = java.nio.file.Files.createTempDirectory("graft-drift-ref").toString
        val stDir = java.nio.file.Files.createTempDirectory("graft-drift-st").toString
        graft.operators.Pca.saveMoments(s,
          graft.operators.Pca.moments(emb.filter(col("vec_id") % 4 <= 1), "embedding"),
          refDir)
        val clean = emb.filter(col("vec_id") % 4 === 2)
        val shifted = emb.filter(col("vec_id") % 4 === 3)
          .select(col("vec_id"),
            transform(col("embedding"), x => (x + lit(0.3f)).cast("float")).as("embedding"))
        val r0 = graft.streaming.StreamingDrift.processBatch(
          clean, 0L, "vec_id", "embedding", refDir, stDir)
        val r1 = graft.streaming.StreamingDrift.processBatch(
          shifted, 1L, "vec_id", "embedding", refDir, stDir)
        r0.unionByName(r1).orderBy("batch_id")
    },

    // ── Streaming corpus-build CAPSTONE: the arrival-mode twin of
    //    pipeline_corpus_build — ONE attached stream (MemoryStream →
    //    foreachBatch) runs each micro-batch through the full composed
    //    funnel (validate → quality/lang gates → cross-batch dedup
    //    against the stored band index → per-source token budgets →
    //    drift monitor vs stored reference moments → durable corpus
    //    append), with every stage's ledger batch-partitioned and
    //    replay-idempotent (StreamingCorpusSpec pins replay across the
    //    whole composition). The corpus arrives as two micro-batches
    //    (even/odd doc ids); tight per-source budgets make the
    //    cross-batch remaining-budget read visible in batch 1's counts.
    //    rows-only: streams + engine ledgers, no SQL oracle. ──
    QueryDef.rowsOnly("engine_stream_corpus") {
      (s, d) =>
        import s.implicits._
        implicit val sqlCtx = s.sqlContext
        // 400-doc slice: the fixture's cost is per-batch composition
        // overhead x dedup verification on a template-heavy corpus; the
        // slice keeps the bench line honest while every funnel stage
        // still fires (the 100 TB path is the operator, not the fixture)
        val docs = graft.Tables.documents(s, d)
          .filter(col("doc_id") < 400)
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
            col("source"))
        // drift reference: quality-feature moments of the GATE-PASSING
        // slice (the deploy artifact a production build trains offline,
        // on the distribution the funnel is expected to admit — training
        // on the raw multilingual corpus would make the monitor flag the
        // en-gate's own selection bias instead of arrival anomalies)
        val sc = graft.streaming.StreamingCorpus
        val ws = graft.operators.TextOps.tokens(col("text"))
        val (nT, _, sr) = graft.operators.TextOps.qualityMetrics(ws, sc.DefaultStops)
        val gatePassing = docs.filter(
          graft.operators.TextOps.langIdEn(ws, sc.DefaultLangMarkers, 2) === "en" &&
            nT >= 5 && sr <= 0.5)
        val refDir = java.nio.file.Files.createTempDirectory("graft-scorp-ref").toString
        graft.operators.Pca.saveMoments(s,
          graft.operators.Pca.moments(
            sc.qualityFeatures(gatePassing, "doc_id", "text", sc.DefaultStops),
            "features"), refDir)
        val stateDir = java.nio.file.Files.createTempDirectory("graft-scorp-st").toString
        val corpusDir = java.nio.file.Files.createTempDirectory("graft-scorp-c").toString
        val outDir = java.nio.file.Files.createTempDirectory("graft-scorp-o").toString
        val ckptDir = java.nio.file.Files.createTempDirectory("graft-scorp-k").toString
        val checks = Seq(
          graft.operators.Validation.Expect("text_nonempty", length(col("text")) > 0),
          graft.operators.Validation.Unique("doc_id_unique", col("doc_id")))
        val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
        val q = graft.streaming.StreamingCorpus.attach(
          mem.toDF().toDF("doc_id", "text", "source"),
          "doc_id", "text", "source", checks,
          // src0/src1 squeezed (cross-batch remaining-budget read visible
          // in batch 1), everything else effectively unbudgeted
          budgets = Map("src0" -> 300L, "src1" -> 300L),
          defaultBudget = 100000000L,
          refDir, stateDir, corpusDir, outDir, ckptDir,
          // clean batches sit within sampling noise of the gate-passing
          // reference; the poisoned batch lands far beyond any threshold
          zThreshold = 8.0)
        val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        // batch 1 carries the three cross-batch proofs in one arrival:
        // - 10 EXACT COPIES of batch-0 docs (fresh ids): the stored band
        //   index must reject them (cross-batch dedup);
        // - 5 novel 400-token src0 docs: src0's 300-token budget can
        //   never fit them, whatever batch 0 admitted (cross-batch
        //   remaining-budget read, deterministic at every sf);
        // - 20 poisoned-source docs (~6x quality-feature shift, sized so
        //   the quantized-long drift moments stay in range): they pass
        //   every gate and the budget, and must trip the drift alarm.
        val copies = gatePassing.orderBy(col("doc_id")).limit(10)
          .select("text", "source").collect().zipWithIndex
          .map { case (r, i) => (300000L + i, r.getString(0), r.getString(1)) }
        val novelSrc0 = (0 until 5).map { i =>
          (200000L + i, "the size of the data and the run " +
            (0 until 392).map(j => s"n${i}_$j").mkString(" "), "src0") }
        val poisoned = (0 until 20).map { i =>
          (100000L + i, "the data of the run " +
            (0 until 300).map(j => s"w${i}_$j").mkString(" "), "poison") }
        try {
          mem.addData(rows.toSeq)
          q.processAllAvailable()
          mem.addData(copies.toSeq ++ novelSrc0 ++ poisoned)
          q.processAllAvailable()
        } finally q.stop()
        s.read.parquet(outDir)
          .select(col("batch_id"), col("n_arrived"), col("n_valid"),
            col("n_gated"), col("n_unique"), col("n_admitted"),
            col("admitted_tokens"), col("checks_pass"), col("drift_alarm"))
          .orderBy("batch_id")
    },

    // ── Streaming CRAWL admission: the web-acquisition stages run
    //    arrival-mode — one attached stream (MemoryStream → foreachBatch)
    //    runs each micro-batch of fetched pages through URL
    //    canonicalization (the frontier identity), the robots gate
    //    (domains with m % 3 = 0 disallow /Path), within-batch dedup,
    //    and cross-batch admission against the durable seen-set ledger;
    //    admitted pages land as per-batch WARC response shards. Batch 0
    //    carries a messy spelling of every URL plus 30 same-canonical
    //    respellings (within-batch duplicates); batch 1 carries a THIRD
    //    spelling of 40 batch-0 URLs (the ledger must reject every
    //    allowed one), 25 fresh paths (admitted), and 5 non-URLs
    //    (invalid). ORACLED since round 16 (the web_crawl_plan_ledger
    //    graduation pattern): every output aggregate — outcome class
    //    counts, distinct domains, and the POLITENESS maxima (per-host
    //    slot × crawl-delay within a batch, the hosts-ledger horizon
    //    carrying batch 0's reservations into batch 1's dispatch
    //    times) — is exact integer arithmetic of the fixture, so the
    //    DuckDB side replays canonicalization classes, the robots m%3
    //    gate, within/cross-batch dedup, and the whole logical-clock
    //    schedule blind to the engine. ──
    QueryDef.sql(
      "engine_stream_web",
      """WITH ids AS (SELECT doc_id AS id, doc_id % 50 AS m
        |  FROM documents WHERE doc_id < 400),
        |arr AS (
        |  SELECT 0 AS batch, id AS a, id, m, 'A' AS k FROM ids
        |  UNION ALL SELECT 0, 1000000 + id, id, m, 'B' FROM ids WHERE id < 30
        |  UNION ALL SELECT 1, 2000000 + id, id, m, 'C' FROM ids WHERE id < 40
        |  UNION ALL SELECT 1, 3000000 + id, id, m, 'F' FROM ids WHERE id < 25),
        |cls AS (SELECT batch, a, id, m, k,
        |    CASE WHEN k IN ('A','B','C') AND m % 3 = 0 THEN 'robots_blocked'
        |         WHEN k = 'B' OR k = 'C' THEN 'duplicate'
        |         ELSE 'admitted' END AS outcome,
        |    (1 + m % 5) * 1000 AS delay
        |  FROM arr),
        |adm AS (SELECT batch, a, m, delay,
        |    row_number() OVER (PARTITION BY batch, m ORDER BY a) - 1 AS slot
        |  FROM cls WHERE outcome = 'admitted'),
        |res0 AS (SELECT m, count(*) * max(delay) AS reserved
        |  FROM adm WHERE batch = 0 GROUP BY m),
        |sched AS (SELECT adm.batch, adm.delay,
        |    CASE WHEN adm.batch = 0 THEN adm.slot * adm.delay
        |         ELSE coalesce(r.reserved, 0) + adm.slot * adm.delay END AS fetch_at
        |  FROM adm LEFT JOIN res0 r ON adm.batch = 1 AND adm.m = r.m),
        |agg AS (SELECT batch, outcome, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT m) AS BIGINT) AS n_domains
        |  FROM cls GROUP BY batch, outcome),
        |fa AS (SELECT batch, max(fetch_at) AS mf, max(delay) AS md
        |  FROM sched GROUP BY batch)
        |SELECT CAST(agg.batch AS BIGINT) AS batch, agg.outcome, agg.n, agg.n_domains,
        |  CAST(CASE WHEN agg.outcome = 'admitted' THEN fa.mf ELSE -1 END AS BIGINT)
        |    AS max_fetch_ms,
        |  CAST(CASE WHEN agg.outcome = 'admitted' THEN fa.md ELSE -1 END AS BIGINT)
        |    AS max_delay_ms
        |FROM agg LEFT JOIN fa ON agg.batch = fa.batch
        |UNION ALL
        |SELECT 1, 'invalid', 5, 0, -1, -1
        |ORDER BY batch, outcome""".stripMargin) {
      (s, d) =>
        import s.implicits._
        implicit val sqlCtx = s.sqlContext
        val docs = graft.Tables.documents(s, d).filter(col("doc_id") < 400)
          .select(col("doc_id")).as[Long].collect().toSeq.sorted
        def urlA(id: Long) =
          s"HTTP://D${id % 50}.Example.COM:80/Path/p$id?b=2&a=1&utm_source=x#frag"
        def urlB(id: Long) = s"http://d${id % 50}.example.com/Path/p$id?a=1&b=2"
        def urlC(id: Long) =
          s"http://d${id % 50}.example.com:80/Path/p$id?utm_campaign=z&b=2&a=1#o"
        def urlF(id: Long) = s"https://d${id % 50}.example.com/fresh/p$id"
        def blob(id: Long) = s"<html>p$id</html>".getBytes("UTF-8")
        val robotsTxt = docs.map(_ % 50).distinct.map { m =>
          (s"d$m.example.com", "User-agent: *\nDisallow: /private\n" +
            s"Crawl-delay: ${1 + m % 5}\n" +
            (if (m % 3 == 0) "Disallow: /Path\n" else ""))
        }.toDF("domain", "txt")
        val rules = graft.operators.Robots.rulesFrame(robotsTxt, "domain", "txt")
        val delays = graft.operators.Robots.selectDelay(
          graft.operators.Robots.delaysFrame(robotsTxt, "domain", "txt"),
          "graftbot", defaultMs = 60000L)
        val ledgerDir = java.nio.file.Files.createTempDirectory("graft-scrawl-l").toString
        val outDir = java.nio.file.Files.createTempDirectory("graft-scrawl-o").toString
        val ckptDir = java.nio.file.Files.createTempDirectory("graft-scrawl-k").toString
        val shardDir = java.nio.file.Files.createTempDirectory("graft-scrawl-s").toString
        val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Array[Byte])]
        val q = graft.streaming.StreamingCrawl.attach(
          mem.toDF().toDF("id", "url", "blob"), "id", "url", "blob",
          rules, "graftbot", ledgerDir, outDir, ckptDir, Some(shardDir),
          delays = Some(delays))
        try {
          mem.addData(docs.map(id => (id, urlA(id), blob(id))) ++
            docs.take(30).map(id => (1000000L + id, urlB(id), blob(id))))
          q.processAllAvailable()
          mem.addData(docs.take(40).map(id => (2000000L + id, urlC(id), blob(id))) ++
            docs.take(25).map(id => (3000000L + id, urlF(id), blob(id))) ++
            (0 until 5).map(i => (4000000L + i, s"no scheme $i", Array.emptyByteArray)))
          q.processAllAvailable()
        } finally q.stop()
        s.read.parquet(outDir)
          .groupBy(col("batch").cast("long").as("batch"), col("outcome"))
          .agg(count(lit(1)).cast("long").as("n"),
            countDistinct(col("domain")).cast("long").as("n_domains"),
            // politeness surfaced: admitted rows carry per-host
            // robots-derived dispatch times on the logical clock;
            // batch 1's max exceeds batch 0's for re-fetched hosts
            // because the hosts ledger carries the reserved horizon
            coalesce(max(col("fetch_at_ms")), lit(-1L)).cast("long").as("max_fetch_ms"),
            coalesce(max(col("delay_ms")), lit(-1L)).cast("long").as("max_delay_ms"))
          .orderBy("batch", "outcome")
    },

    // ── Streaming REDIRECT loop: the frontier feed crawls discover
    //    through 3xx chains — batch 0 fetches 300 seeds of which every
    //    third answers 301 with a RELATIVE Location (../hop1/…, the
    //    RFC 9110 reality), [[StreamingCrawl.redirectFrontier]] turns
    //    the 100 resolved+canonicalized targets into batch 1's
    //    frontier, batch 1 fetches them (100 redirect-DISCOVERED
    //    admissions) while 50 sources re-answer the same 301 — and the
    //    next frontier is EMPTY: every re-discovered target is in the
    //    seen ledger, so a redirect target is fetched exactly once
    //    across batches. ORACLED since round 16: every count is exact
    //    fixture arithmetic — the m%3 redirect classes (permanent
    //    since the 301/308 split), the resolved-target frontier, and
    //    the batch-1 drain — replayed in SQL blind to the engine. ──
    QueryDef.sql(
      "engine_stream_redirects",
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 300),
        |c AS (
        |  SELECT 0 AS batch, 'admitted' AS kind, count(*) AS n
        |    FROM ids WHERE id % 3 != 0
        |  UNION ALL SELECT 0, 'frontier', count(*) FROM ids WHERE id % 3 = 0
        |  UNION ALL SELECT 0, 'redirect_permanent', count(*) FROM ids WHERE id % 3 = 0
        |  UNION ALL SELECT 1, 'admitted', count(*) FROM ids WHERE id % 3 = 0
        |  UNION ALL SELECT 1, 'frontier', 0
        |  UNION ALL SELECT 1, 'redirect_permanent', count(*) FROM ids WHERE id % 6 = 0)
        |SELECT CAST(batch AS BIGINT) AS batch, kind, CAST(n AS BIGINT) AS n
        |FROM c ORDER BY batch, kind""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val docs = graft.Tables.documents(s, d).filter(col("doc_id") < 300)
          .select(col("doc_id")).as[Long].collect().toSeq.sorted
        def srcU(id: Long) = s"http://d${id % 50}.example.com/r0/p$id"
        def blob(id: Long) = s"<html>p$id</html>".getBytes("UTF-8")
        val rules = graft.operators.Robots.rulesFrame(
          docs.map(_ % 50).distinct.map(m =>
            (s"d$m.example.com", "User-agent: *\nDisallow:\n")).toDF("domain", "txt"),
          "domain", "txt")
        val ledgerDir = java.nio.file.Files.createTempDirectory("graft-sredir-l").toString
        val b0 = docs.map { id =>
          if (id % 3 == 0) (id, srcU(id), blob(id), 301, s"../hop1/p$id")
          else (id, srcU(id), blob(id), 200, null: String)
        }.toDF("id", "url", "blob", "status", "location")
        val m0 = graft.streaming.StreamingCrawl.processBatch(b0, 0L, "id", "url",
          "blob", rules, "graftbot", ledgerDir,
          statusCol = Some("status"), locationCol = Some("location"))
        val f0 = graft.streaming.StreamingCrawl
          .redirectFrontier(m0, ledgerDir, 0L).localCheckpoint()
        val targets = f0.select("url").as[String].collect().sorted
        val b1 = (targets.zipWithIndex.toSeq.map { case (u, i) =>
            (500000L + i, u, blob(i.toLong), 200, null: String) } ++
          docs.filter(_ % 6 == 0).map(id =>
            (600000L + id, srcU(id), blob(id), 301, s"../hop1/p$id")))
          .toDF("id", "url", "blob", "status", "location")
        val m1 = graft.streaming.StreamingCrawl.processBatch(b1, 1L, "id", "url",
          "blob", rules, "graftbot", ledgerDir,
          statusCol = Some("status"), locationCol = Some("location"))
        val f1 = graft.streaming.StreamingCrawl.redirectFrontier(m1, ledgerDir, 1L,
          hops = Some(f0.select(col("url"), col("hop"))))
        // driver-sized result (a handful of outcome classes per batch):
        // materialize, then drop the batch checkpoints
        def oc(bid: Long, m: org.apache.spark.sql.DataFrame) = m
          .groupBy("outcome").agg(count(lit(1)).as("n")).collect()
          .map(r => (bid, r.getString(0), r.getLong(1)))
        val rows = (oc(0L, m0) ++ oc(1L, m1)).toSeq ++
          Seq((0L, "frontier", f0.count()), (1L, "frontier", f1.count()))
        Seq(m0, f0, m1).foreach(_.unpersist(false))
        rows.toDF("batch", "kind", "n").orderBy("batch", "kind")
    },

    // ── Streaming LINK-DISCOVERY loop: the frontier feed crawls grow
    //    from — batch 0 fetches 200 seed pages (10 per domain, 20
    //    domains), each linking two own-page targets plus the domain's
    //    /common hub; [[StreamingCrawl.linkFrontier]] resolves,
    //    canonicalizes, robots-gates, budget-caps and seen-drains them
    //    into a 420-target frontier (2×200 + 20 hubs). Batch 1 fetches
    //    the 20 hubs, each linking BACK to an already-fetched seed
    //    (drained by the seen ledger — fetched exactly once) and one
    //    fresh /deep target, which enters at hop 2 via the hop carry.
    //    ORACLED since round 16: seed admissions, the 2·seeds + hubs
    //    frontier, the hub admissions, and the hop-2 carry are all
    //    exact fixture arithmetic replayed in SQL. ──
    QueryDef.sql(
      "engine_stream_links",
      """WITH ids AS (SELECT doc_id AS id, doc_id % 20 AS m
        |  FROM documents WHERE doc_id < 200),
        |doms AS (SELECT DISTINCT m FROM ids),
        |c AS (
        |  SELECT 0 AS batch, 'admitted' AS kind,
        |    (SELECT count(*) FROM ids) AS n
        |  UNION ALL SELECT 0, 'frontier',
        |    2 * (SELECT count(*) FROM ids) + (SELECT count(*) FROM doms)
        |  UNION ALL SELECT 1, 'admitted', (SELECT count(*) FROM doms)
        |  UNION ALL SELECT 1, 'frontier', (SELECT count(*) FROM doms)
        |  UNION ALL SELECT 1, 'frontier_hop2', (SELECT count(*) FROM doms))
        |SELECT CAST(batch AS BIGINT) AS batch, kind, CAST(n AS BIGINT) AS n
        |FROM c ORDER BY batch, kind""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val docs = graft.Tables.documents(s, d).filter(col("doc_id") < 200)
          .select(col("doc_id")).as[Long].collect().toSeq.sorted
        def dom(id: Long) = s"d${id % 20}.example.com"
        def seedU(id: Long) = s"http://${dom(id)}/s$id"
        val rules = graft.operators.Robots.rulesFrame(
          docs.map(_ % 20).distinct.map(m =>
            (s"d$m.example.com", "User-agent: *\nDisallow:\n")).toDF("domain", "txt"),
          "domain", "txt")
        val ledgerDir = java.nio.file.Files.createTempDirectory("graft-slink-l").toString
        def seedHtml(id: Long) =
          s"""<a href="/s${id}a">a</a><a href="s${id}b">b</a><a href="/common">c</a>"""
        val b0 = docs.map(id => (id, seedU(id), seedHtml(id).getBytes("UTF-8")))
          .toDF("id", "url", "blob")
        val m0 = graft.streaming.StreamingCrawl.processBatch(b0, 0L, "id", "url",
          "blob", rules, "graftbot", ledgerDir)
        val pages0 = docs.map(id => (seedU(id), seedHtml(id))).toDF("url", "html")
        val f0 = graft.streaming.StreamingCrawl.linkFrontier(pages0, "url", "html",
          ledgerDir, 0L, maxHops = 3, rules = Some(rules), agent = "graftbot")
          .localCheckpoint()
        // batch 1: fetch each domain's /common hub; it links back to an
        // already-fetched seed and forward to one fresh /deep page
        val hubs = docs.map(_ % 20).distinct.sorted
        def hubHtml(m: Long) = s"""<a href="/s$m">back</a><a href="/deep$m">on</a>"""
        val b1 = hubs.map(m => (1000L + m, s"http://d$m.example.com/common",
          hubHtml(m).getBytes("UTF-8"))).toDF("id", "url", "blob")
        val m1 = graft.streaming.StreamingCrawl.processBatch(b1, 1L, "id", "url",
          "blob", rules, "graftbot", ledgerDir)
        val pages1 = hubs.map(m => (s"http://d$m.example.com/common", hubHtml(m)))
          .toDF("url", "html")
        val f1 = graft.streaming.StreamingCrawl.linkFrontier(pages1, "url", "html",
          ledgerDir, 1L, hops = Some(f0.select(col("url"), col("hop"))),
          maxHops = 3, rules = Some(rules), agent = "graftbot")
        def oc(bid: Long, m: org.apache.spark.sql.DataFrame) = m
          .groupBy("outcome").agg(count(lit(1)).as("n")).collect()
          .map(r => (bid, r.getString(0), r.getLong(1)))
        val hop2 = f1.filter(col("hop") === 2).count()
        val rows = (oc(0L, m0) ++ oc(1L, m1)).toSeq ++
          Seq((0L, "frontier", f0.count()), (1L, "frontier", f1.count()),
            (1L, "frontier_hop2", hop2))
        Seq(m0, f0, m1).foreach(_.unpersist(false))
        rows.toDF("batch", "kind", "n").orderBy("batch", "kind")
    },

    // ── Streaming EXACT-threshold dedup: the arrival-mode face of the
    //    stored prefix index (probe under the frozen ordering → fold
    //    survivors in), with an ARITHMETIC fixture: set(id, fam) =
    //    {g<fam>_0..9, u<id>}, so same-family sets have J = 10/12 =
    //    833‰ ≥ θ=800 and cross-family sets share nothing. Seed stores
    //    families 0-19; batch 0 (ids 100-179, fam = id % 40) collapses
    //    each family to its smallest id and drops families the seed
    //    holds → survivors are exactly ids 100-119 (fams 20-39);
    //    batch 1 (ids 200-299, fam = id % 50) must lose every family
    //    0-39 to seed-or-batch-0 SURVIVORS and admit the ten new fams
    //    40-49 → ids 240-249. rows-only: streams + engine index, no
    //    SQL oracle; StreamingPrefixDedupSpec pins the semantics, the
    //    pin spec these exact aggregates. ──
    QueryDef.sql(
      "engine_stream_prefix",
      // ORACLED since round 16: the survivor sets are exact generator
      // arithmetic — batch 0's families ≥ 20 are absent from the seed
      // index (fams 0-19), so their min-id within-batch winners (ids
      // 100-119) survive; batch 1's families ≥ 40 are absent from seed
      // AND stored batch-0 survivors, so ids 240-249 survive — the
      // whole stored-prefix-index + incremental-probe discipline
      // replayed blind to the engine.
      """WITH b0 AS (SELECT r AS id, r % 40 AS fam FROM range(100, 180) t(r)),
        |w0 AS (SELECT fam, min(id) AS id FROM b0 WHERE fam >= 20 GROUP BY fam),
        |b1 AS (SELECT r AS id, r % 50 AS fam FROM range(200, 300) t(r)),
        |w1 AS (SELECT fam, min(id) AS id FROM b1 WHERE fam >= 40 GROUP BY fam),
        |c AS (SELECT 0 AS batch, count(*) AS n, sum(id) AS s FROM w0
        |  UNION ALL SELECT 1, count(*), sum(id) FROM w1)
        |SELECT CAST(batch AS BIGINT) AS batch, CAST(n AS BIGINT) AS n_survivors,
        |  CAST(s AS BIGINT) AS survivor_id_sum FROM c ORDER BY batch""".stripMargin) {
      (s, d) =>
        import s.implicits._
        implicit val sqlCtx = s.sqlContext
        def toks(id: Long, fam: Long): Seq[String] =
          (0 until 10).map(k => s"g${fam}_$k") :+ s"u$id"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-spfx-i").toString
        val outDir = java.nio.file.Files.createTempDirectory("graft-spfx-o").toString
        val ckptDir = java.nio.file.Files.createTempDirectory("graft-spfx-k").toString
        graft.operators.Dedup.prefixIndexBuild(
          (0L until 20L).map(f => (f, toks(f, f))).toDF("id", "toks"),
          "id", "toks", 800, idxDir)
        val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[String])]
        val q = graft.streaming.StreamingPrefixDedup.attach(
          mem.toDF().toDF("id", "toks"), "id", "toks", idxDir, outDir, ckptDir)
        try {
          mem.addData((100L until 180L).map(id => (id, toks(id, id % 40))))
          q.processAllAvailable()
          mem.addData((200L until 300L).map(id => (id, toks(id, id % 50))))
          q.processAllAvailable()
        } finally q.stop()
        s.read.parquet(outDir)
          .groupBy(col("batch").cast("long").as("batch"))
          .agg(count(lit(1)).cast("long").as("n_survivors"),
            sum("id").cast("long").as("survivor_id_sum"))
          .orderBy("batch")
    },

    // ── Streaming MULTIMODAL ingest: mm_corpus_build's arrival-mode
    //    twin — one attached stream (MemoryStream → foreachBatch) runs
    //    each micro-batch of raw container blobs through decode-metadata
    //    gates, cross-FORMAT image dedup (dHash) + container-independent
    //    audio identity (PCM digest), and cross-batch admission against
    //    the durable key ledger. Batch 1 carries the three cross-batch
    //    proofs: JPEG re-uploads of batch-0 PNGs (fresh ids — the ledger
    //    must reject across both batch AND format), batch-0 audio
    //    rewritten through the OTHER container builder (identity
    //    survives the container change), and genuinely novel images
    //    (admitted). rows-only: streams + engine ledgers, no SQL oracle;
    //    StreamingMediaSpec pins the per-row semantics, the pin spec the
    //    aggregate shape. ──
    QueryDef.rowsOnly("engine_stream_media") {
      (s, d) =>
        import s.implicits._
        implicit val sqlCtx = s.sqlContext
        def imgParams(sb: Long) =
          ((1 + sb % 24).toInt, (1 + sb % 18).toInt, (1 + sb % 16).toInt)
        def dcOf(sb: Long)(bx: Int, by: Int): Int =
          (((sb * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt
        def pngOf(sb: Long, filterSeed: Long): Array[Byte] = {
          val (w, h, q0) = imgParams(sb)
          def v(bx: Int, by: Int): Int =
            math.max(0, math.min(255, ((dcOf(sb)(bx, by) * q0 + 4) >> 3) + 128))
          graft.codec.MediaFixtures.pngReal(w, h, (x, y, _) => v(x / 8, y / 8),
            filterOf = y => ((filterSeed + y) % 5).toInt)
        }
        def jpegOf(sb: Long): Array[Byte] = {
          val (w, h, q0) = imgParams(sb)
          graft.codec.MediaFixtures.jpegReal(w, h,
            Seq(Array.tabulate(64)(i => if (i == 0) q0 else 16)),
            (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dcOf(sb)(bx, by) else 0))
        }
        def audioParams(id: Long) =
          ((8000 * (1 + id % 5)).toInt, (1 + id % 2).toInt, (1 + id % 50).toInt)
        def blobFor(id: Long): Array[Byte] = (id % 3) match {
          case 0 => pngOf(id / 3, id)
          case 1 => jpegOf(id / 3)
          case _ =>
            val (rate, nch, ns) = audioParams(id)
            graft.codec.MediaFixtures.wav(nch, rate, ns,
              (i, c) => graft.codec.MediaFixtures.pcmSample(id, i, c))
        }
        val ids = graft.Tables.documents(s, d).filter(col("doc_id") < 240)
          .select(col("doc_id")).as[Long].collect().toSeq.sorted
        val ledgerDir = java.nio.file.Files.createTempDirectory("graft-smedia-l").toString
        val outDir = java.nio.file.Files.createTempDirectory("graft-smedia-o").toString
        val ckptDir = java.nio.file.Files.createTempDirectory("graft-smedia-k").toString
        val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
        val q = graft.streaming.StreamingMedia.attach(
          mem.toDF().toDF("media_id", "blob"), "media_id", "blob",
          ledgerDir, outDir, ckptDir)
        // batch 1: only re-uploads of rows that PASSED batch 0's gates
        // (a gated row's key never reached the ledger, so re-uploading
        // it would test nothing)
        val reupImg = ids.filter(id => id % 3 == 0 && {
          val (w, h, _) = imgParams(id / 3); w.toLong * h >= 16
        }).take(20).map(id => (100000L + id, jpegOf(id / 3)))
        val reupAud = ids.filter(id => id % 3 == 2 && {
          val (rate, _, ns) = audioParams(id); ns >= 10 && rate >= 16000
        }).take(20).map { id =>
          val (rate, nch, ns) = audioParams(id)
          (200000L + id, graft.codec.MediaWriters.wavPcm16(rate, nch,
            Array.tabulate[Short](ns * nch)(j =>
              graft.codec.MediaFixtures.pcmSample(id, j / nch, j % nch).toShort)))
        }
        val fresh = (0 until 20).map(i => (300000L + i, pngOf(777000L + i, i)))
        try {
          mem.addData(ids.map(id => (id, blobFor(id))))
          q.processAllAvailable()
          mem.addData(reupImg ++ reupAud ++ fresh)
          q.processAllAvailable()
        } finally q.stop()
        s.read.parquet(outDir)
          .groupBy(col("batch").cast("long").as("batch"), col("kind"))
          .agg(count(lit(1)).cast("long").as("n_admitted"),
            sum(col("batch_copies")).cast("long").as("n_copies"))
          .orderBy("batch", "kind")
    },

    // ── ORC source/sink round trip: the corpus slice written to ORC and
    //    read back through Spark's native ORC reader, then content-
    //    aggregated. NOT rows-only: the oracle computes the same
    //    aggregate over the parquet source, so a hash match proves the
    //    round trip preserved every id, language, text byte (distinct
    //    md5), and length — format-conversion correctness as a first-
    //    class checked query, the TextSources JSONL/CSV sibling. ──
    QueryDef.sql(
      "engine_orc_roundtrip",
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_texts,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id < 300""".stripMargin) {
      (s, d) =>
        val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
        graft.Tables.documents(s, d).filter(col("doc_id") < 300)
          .write.mode("overwrite").orc(dir)
        s.read.orc(dir)
          .agg(count(lit(1)).as("n_docs"),
            sum("doc_id").as("sum_ids"),
            countDistinct("lang").as("n_langs"),
            countDistinct(md5(col("text").cast("binary"))).as("n_texts"),
            sum(length(col("text"))).as("sum_chars"))
    },

    // ── JSONL ingest vertical with quarantine: the corpus serialized to
    //    JSONL + three injected broken lines, read back through
    //    TextSources — every line accounted for (good + corrupt = total),
    //    ids and languages surviving the round-trip intact. rows-only:
    //    the fixture file is the engine's own. ──
    QueryDef.sql(
      "engine_jsonl_quarantine",
      // ORACLED since round 16, DATA-driven: every well-formed line
      // round-trips (to_json escapes embedded newlines/quotes, the
      // quarantine reader recovers the row), so the good-side counts
      // recompute from the documents table itself and the corrupt side
      // is exactly the three injected non-JSON lines.
      """SELECT CAST(count(*) AS BIGINT) AS n_good,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(3 AS BIGINT) AS n_corrupt
        |FROM documents WHERE doc_id < 100""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val docs = graft.Tables.documents(s, d).filter(col("doc_id") < 100)
        val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
        val lines = docs
          .select(to_json(struct(col("doc_id"), col("text"), col("lang"))).as("line"))
          .unionByName(Seq("BROKEN {", "also not json", "{\"doc_id\": 999 trailing")
            .toDF("line"))
        lines.coalesce(1).write.mode("overwrite").text(dir)
        val (good, bad) = graft.sources.TextSources.readJsonlWithQuarantine(
          s, dir, org.apache.spark.sql.types.StructType
            .fromDDL("doc_id BIGINT, text STRING, lang STRING"))
        good.agg(count(lit(1)).as("n_good"),
            sum("doc_id").as("sum_ids"),
            countDistinct("lang").as("n_langs"))
          .crossJoin(bad.agg(count(lit(1)).as("n_corrupt")))
    },

    // ── Streaming cardinality vertical — NOT rows-only, because the
    //    register lattice makes an external oracle possible: two
    //    micro-batches (doc_id split even/odd) max-merge into the
    //    durable register table, and merged-registers-of-halves ≡
    //    registers-of-whole, so DuckDB re-derives the final estimate
    //    from the documents table alone. A hash match proves the
    //    streaming merge path computes exactly the batch sketch. ──
    QueryDef.sql(
      "engine_stream_cardinality",
      """WITH h AS (SELECT DISTINCT text AS w FROM documents WHERE text IS NOT NULL),
        |rr AS (SELECT (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS bucket,
        |              substr(md5(w), 3, 16) AS tail FROM h),
        |z AS (SELECT bucket, tail, length(regexp_extract(tail, '^(0*)', 1)) AS nz FROM rr),
        |dv AS (SELECT bucket, nz, strpos('0123456789abcdef', substr(tail, nz + 1, 1)) - 1 AS d FROM z),
        |rho AS (SELECT bucket, CASE WHEN nz >= 16 THEN 40 ELSE
        |          least(4 * nz + CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1
        |                              WHEN d >= 2 THEN 2 ELSE 3 END + 1, 40) END AS rho
        |        FROM dv),
        |regs0 AS (SELECT bucket, CAST(max(rho) AS INTEGER) AS register FROM rho GROUP BY bucket),
        |regs AS (SELECT CAST(b.range AS INTEGER) AS bucket, coalesce(r0.register, 0) AS register
        |         FROM range(0, 256) b LEFT JOIN regs0 r0 ON r0.bucket = b.range),
        |agg AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (40 - register)) AS BIGINT) AS s_sum,
        |               CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |        FROM regs)
        |SELECT agg.n_zero,
        |  round(((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0
        |        * 1099511627776.0 / CAST(agg.s_sum AS DOUBLE), 4) AS hll_estimate
        |FROM agg""".stripMargin) {
      (s, d) =>
        val idx = java.nio.file.Files.createTempDirectory("graft-scard").toString
        val docs = graft.Tables.documents(s, d)
        graft.streaming.StreamingCardinality.processBatch(
          docs.filter(col("doc_id") % 2 === 0), 0L, "text", idx)
        graft.streaming.StreamingCardinality.processBatch(
          docs.filter(col("doc_id") % 2 === 1), 1L, "text", idx)
          .select("n_zero", "hll_estimate")
    },

    // ── Streaming-DSIR vertical, ORACLE-pinned: batch 0 (even doc_ids)
    //    builds the count ledger, batch 1 (odd doc_ids) is scored
    //    against it — exactly scoreFromCounts(odd, counts(even)), which
    //    DuckDB re-derives: stats CTEs over the even half, the generated
    //    fixed-point-log ladder, per-doc sums over the odd half with
    //    unseen buckets neutral. A hash match proves the ledger
    //    write/read/serve path loses nothing. ──
    QueryDef.sql(
      "engine_stream_importance",
      s"""WITH te AS (SELECT doc_id, coalesce(lang = 'en', false) AS is_t,
         |              list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
         |            FROM documents WHERE doc_id % 2 = 0),
         |ee AS (SELECT doc_id, is_t, unnest(ws) AS w FROM te),
         |ebe AS (SELECT doc_id, is_t,
         |          CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(w), 1, 8)[i]) - 1)
         |               * power(16, 8 - i) for i in range(1, 9) ]) AS BIGINT) % 1024 AS INTEGER) AS b
         |        FROM ee),
         |dbe AS (SELECT doc_id, is_t, b, CAST(count(*) AS BIGINT) AS occ FROM ebe GROUP BY 1, 2, 3),
         |stats AS (SELECT b, CAST(sum(CASE WHEN is_t THEN occ ELSE 0 END) + 1 AS BIGINT) AS t,
         |                 CAST(sum(occ) + 1 AS BIGINT) AS r FROM dbe GROUP BY b),
         |tots AS (SELECT CAST(sum(t) AS BIGINT) AS tt, CAST(sum(r) AS BIGINT) AS rt FROM stats),
         |nd AS (SELECT b, t * rt AS num, r * tt AS den FROM stats, tots),
         |${DsirOracle.fixedPointLog2Cte("nd")},
         |to_ AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
         |        FROM documents WHERE doc_id % 2 = 1),
         |eo AS (SELECT doc_id, unnest(ws) AS w FROM to_),
         |ebo AS (SELECT doc_id,
         |          CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(w), 1, 8)[i]) - 1)
         |               * power(16, 8 - i) for i in range(1, 9) ]) AS BIGINT) % 1024 AS INTEGER) AS b
         |        FROM eo),
         |dbo AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS occ FROM ebo GROUP BY 1, 2),
         |pd AS (SELECT dbo.doc_id, CAST(sum(coalesce(sbq.sb, 0) * dbo.occ) AS BIGINT) AS raw,
         |              CAST(sum(dbo.occ) AS BIGINT) AS n
         |       FROM dbo LEFT JOIN sbq USING (b) GROUP BY dbo.doc_id)
         |SELECT t.doc_id AS doc, coalesce(pd.n, 0) AS n_tokens,
         |  coalesce(pd.raw, 0) AS imp_q8,
         |  coalesce(pd.raw, 0) >= 1 AS admitted
         |FROM to_ t LEFT JOIN pd ON pd.doc_id = t.doc_id
         |ORDER BY doc""".stripMargin) {
      (s, d) =>
        val idx = java.nio.file.Files.createTempDirectory("graft-simp").toString
        val docs = graft.Tables.documents(s, d)
          .withColumn("is_en", coalesce(col("lang") === "en", lit(false)))
        graft.streaming.StreamingImportance.processBatch(
          docs.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "text", "is_en", idx, 1L)
        graft.streaming.StreamingImportance.processBatch(
          docs.filter(col("doc_id") % 2 === 1), 1L, "doc_id", "text", "is_en", idx, 1L)
          .orderBy("doc")
    },

    // ── Streaming heavy-hitters vertical, ORACLE-pinned via additivity:
    //    two micro-batches (even/odd doc_ids) fold their CMS cell deltas
    //    into the ledger; since cells are a commutative monoid, the
    //    union-summed ledger must equal the whole-corpus sketch — so the
    //    final probe round shares text_cms_heavy's oracle verbatim and a
    //    hash match proves the delta-ledger write/read/serve path. ──
    QueryDef.sql(
      "engine_stream_heavyhitters",
      """WITH t AS (SELECT list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT unnest(ws) AS w FROM t),
        |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS true_cnt FROM e GROUP BY w),
        |cr AS (SELECT wc.w, wc.true_cnt, r.range AS r,
        |         CAST(CAST(list_sum([ (strpos('0123456789abcdef',
        |                 substr(md5(CAST(r.range AS VARCHAR) || ':' || wc.w), 1, 8)[i]) - 1)
        |                 * power(16, 8 - i) for i in range(1, 9) ]) AS BIGINT)
        |              % 1024 AS INTEGER) AS b
        |       FROM wc, range(0, 4) r),
        |cells AS (SELECT r, b, CAST(sum(true_cnt) AS BIGINT) AS c FROM cr GROUP BY r, b),
        |probes AS (SELECT w, true_cnt FROM wc ORDER BY true_cnt DESC, w LIMIT 20)
        |SELECT p.w, p.true_cnt, CAST(min(c.c) AS BIGINT) AS cms_est
        |FROM probes p JOIN cr ON cr.w = p.w JOIN cells c ON c.r = cr.r AND c.b = cr.b
        |GROUP BY p.w, p.true_cnt
        |ORDER BY p.true_cnt DESC, p.w""".stripMargin) {
      (s, d) =>
        val idx = java.nio.file.Files.createTempDirectory("graft-shh").toString
        val docs = graft.Tables.documents(s, d)
        val probes = docs
          .select(explode(graft.operators.TextOps.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("true_cnt"))
          .orderBy(col("true_cnt").desc, col("w").asc).limit(20)
        graft.streaming.StreamingHeavyHitters.processBatch(
          docs.filter(col("doc_id") % 2 === 0), 0L, "text", probes, "w", idx)
        graft.streaming.StreamingHeavyHitters.processBatch(
          docs.filter(col("doc_id") % 2 === 1), 1L, "text", probes, "w", idx)
          .select(col("w"), col("true_cnt"), col("cms_est"))
          .orderBy(col("true_cnt").desc, col("w").asc)
    },

    // ── Streaming percentiles vertical, ORACLE-pinned via additivity:
    //    two micro-batches write histogram deltas, the union-summed
    //    ledger must equal the whole-corpus histogram, so the final
    //    quantile report matches DuckDB's quantile_cont over the raw
    //    table (n = non-null value count — the histogram cannot know
    //    about null-valued rows). ──
    QueryDef.sql(
      "engine_stream_percentiles",
      """SELECT lang,
        |  CAST(count(length(text)) AS BIGINT) AS n,
        |  round(CAST(quantile_cont(length(text), 0.1) AS DOUBLE), 4) AS p10,
        |  round(CAST(quantile_cont(length(text), 0.5) AS DOUBLE), 4) AS p50,
        |  round(CAST(quantile_cont(length(text), 0.9) AS DOUBLE), 4) AS p90
        |FROM documents GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        val idx = java.nio.file.Files.createTempDirectory("graft-sperc").toString
        val docs = graft.Tables.documents(s, d)
        val qs = Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9)
        graft.streaming.StreamingPercentiles.processBatch(
          docs.filter(col("doc_id") % 2 === 0), 0L, "lang", length(col("text")), idx, qs)
        graft.streaming.StreamingPercentiles.processBatch(
          docs.filter(col("doc_id") % 2 === 1), 1L, "lang", length(col("text")), idx, qs)
          .select(col("g").as("lang"), col("n"), col("p10"), col("p50"), col("p90"))
          .orderBy(asc_nulls_last("lang"))
    },
  )

  // one fixture per session: (store, pinned version after phase 1)
  private val snapshotStores =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, (TableStore, Long)]()
  private def snapshotFixture(s: SparkSession): (TableStore, Long) =
    snapshotStores.computeIfAbsent(s, s => {
      val root = java.nio.file.Files.createTempDirectory("graft-engine-tt").toString
      val store = new TableStore(s, root, nBuckets = 8)
      BlockIngest.initGenesis(store,
        (0 until 40).map(i => (addr(i), 1000000L, "{}")), network = "graft-bench")
      import s.implicits._
      def ingest(start: Int): Unit = BlockIngest.applyBlocks(store,
        s.createDataset(syntheticBlocks(rounds = 3, txnsPerRound = 6,
          startRound = start).map(BlockCodec.blockToJson)))
      ingest(0)
      val vPin = store.metaVersion
      ingest(3)
      (store, vPin)
    })
}
