package graft.queries

import graft.Tables
import graft.operators.{Dedup, Multimodal, Sharding, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Dedup / similarity / multimodal operators bound to the driver corpus
  * with DuckDB oracles (the training-data-pipeline mandate). The library
  * implementations live in graft.operators; each entry here exercises one
  * through the correctness gate.
  *
  * The oracles replicate the exact same md5-based constructions in DuckDB
  * SQL (list comprehensions + list_min), so a hash match pins the whole
  * pipeline — tokenization, shingling, signature, banding, pairing.
  */
object DedupSimilarityQueries {

  // Shared DuckDB fragments (kept in one place so every oracle tokenizes
  // and shingles identically).
  private val DuckToks =
    "list_filter(string_split(trim(text), ' '), w -> w <> '')"
  private def duckShingles(ws: String, n: Int): String =
    s"CASE WHEN len($ws) >= $n THEN [array_to_string(list_slice($ws, j, j + ${n - 1}), ' ') for j in range(1, len($ws) - ${n - 2})] ELSE CAST([] AS VARCHAR[]) END"
  // Permuted MinHash, the exact twin of graft.expressions.MinHashImpl:
  // h = unsigned 32-bit head of md5(shingle); slot i = (a_i*h + b_i) % P.
  // The a_i/b_i literals are rendered from MinHashImpl.coeffs so both
  // engines share one definition; every product is < 2^63 (a_i < P < 2^31,
  // h < 2^32), so UBIGINT arithmetic never overflows.
  private def duckSig(sh: String, k: Int): String = {
    val (as, bs) = graft.expressions.MinHashImpl.coeffs(k)
    val p = graft.expressions.MinHashImpl.Prime
    (0 until k).map(i =>
      s"list_min(list_transform($sh, s -> (${as(i)} * CAST('0x' || substr(md5(s), 1, 8) AS UBIGINT) + ${bs(i)}) % $p))")
      .mkString("[", ", ", "]")
  }
  private def duckJaccard(a: String, b: String): String =
    s"round(CAST(len(list_intersect($a, $b)) AS DOUBLE) / nullif(len(list_distinct(list_concat($a, $b))), 0), 4)"
  // Per-doc 16-bit SimHash over `documents` — the term-for-term twin of
  // Dedup.simhash16Relational; shared by the fingerprint query and the
  // near-dup-pairs query so both oracles carry one signature definition.
  private def duckSimhash16: String = {
    val sums = (0 until 16).map { bit =>
      val p = bit / 4 + 1
      val q = 1 << (bit % 4)
      s"sum(CASE WHEN w IS NULL THEN 0 ELSE 2 * (((strpos('0123456789abcdef', substr(h, $p, 1)) - 1) // $q) % 2) - 1 END) AS s$bit"
    }.mkString(",\n    ")
    val bits = (0 until 16).map(bit =>
      s"(CASE WHEN s$bit > 0 THEN '1' ELSE '0' END)").mkString(" || ")
    s"""SELECT doc_id, $bits AS simhash
       |FROM (
       |  SELECT doc_id,
       |    $sums
       |  FROM (SELECT doc_id, md5(w) AS h, w
       |        FROM (SELECT doc_id,
       |                unnest(CASE WHEN len(ws) = 0 THEN [NULL] ELSE ws END) AS w
       |              FROM (SELECT doc_id, $DuckToks AS ws FROM documents)))
       |  GROUP BY doc_id)""".stripMargin
  }

  // Per-doc 64-bit SimHash votes (s0..s63) — the inner aggregate shared
  // by the bit-string and signed-BIGINT assemblies below; term-for-term
  // twin of Dedup.simhash64Relational's vote stage.
  private def duckSimhash64Votes: String = {
    val sums = (0 until 64).map { bit =>
      val p = bit / 4 + 1
      val q = 1 << (bit % 4)
      s"sum(CASE WHEN w IS NULL THEN 0 ELSE 2 * (((strpos('0123456789abcdef', substr(h, $p, 1)) - 1) // $q) % 2) - 1 END) AS s$bit"
    }.mkString(",\n    ")
    s"""SELECT doc_id,
       |    $sums
       |  FROM (SELECT doc_id, md5(w) AS h, w
       |        FROM (SELECT doc_id,
       |                unnest(CASE WHEN len(ws) = 0 THEN [NULL] ELSE ws END) AS w
       |              FROM (SELECT doc_id, $DuckToks AS ws FROM documents)))
       |  GROUP BY doc_id""".stripMargin
  }
  // 64-char bit string, char i+1 = bit i (the banding/hamming form).
  private def duckSimhash64Bits: String = {
    val bits = (0 until 64).map(bit =>
      s"(CASE WHEN s$bit > 0 THEN '1' ELSE '0' END)").mkString(" || ")
    s"SELECT doc_id, $bits AS simhash FROM ($duckSimhash64Votes)"
  }
  // Signed BIGINT assembly: Σ_{bit<63} sign_bit·2^bit, bit 63 adds
  // Long.MinValue — exact signed arithmetic, no unsigned 2^63 (the twin
  // of Dedup.simhash64Relational's closing select).
  private def duckSimhash64Long: String = {
    val terms = (0 until 63).map(bit =>
      s"(CASE WHEN s$bit > 0 THEN ${1L << bit} ELSE 0 END)") :+
      "(CASE WHEN s63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END)"
    s"""SELECT doc_id, CAST(${terms.mkString(" + ")} AS BIGINT) AS simhash64
       |FROM ($duckSimhash64Votes)""".stripMargin
  }

  // One stored-index build per (kind, sfDir) per JVM: production trains/
  // encodes ONCE and serves many queries, so repeated driver runs of the
  // stored-index queries must time the SCAN, not a rebuild. (Verify and
  // Bench are separate JVMs — each pays one build, then reuses.)
  private val storedIndexCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, org.apache.spark.sql.SparkSession), graft.ingest.TableStore]()
  private def storedIndex(kind: String, d: String, s: org.apache.spark.sql.SparkSession)
                         (build: graft.ingest.TableStore => Unit): graft.ingest.TableStore = {
    // a cached store pins its SparkSession, so the session is part of
    // the cache key: a different live session for the same (kind, dir)
    // gets its own store instead of frames bound to a stopped/foreign
    // context, and the atomic computeIfAbsent replaces the old
    // check-then-act staleness probe. Entries for stopped sessions
    // linger but are bounded by sessions-per-JVM (test suites).
    storedIndexCache.computeIfAbsent((kind, d, s), { _ =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-vidx-$kind").toString
      val store = new graft.ingest.TableStore(s, root, nBuckets = 2)
      build(store)
      store
    })
  }

  // Shared oracle for the batched-IVF queries (sim_ivf_batch probes=2/k=5,
  // sim_ivf_stored probes=1/k=8 — the stored artifact must change nothing
  // about the answer): corpus assignment + query probing + per-query
  // ranking, all through window functions.
  private def ivfBatchOracle(probes: Int, k: Int): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
       |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8),
       |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4),
       |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
       |s AS (SELECT vec_id, cid,
       |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |      FROM u GROUP BY 1, 2),
       |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
       |      FROM s),
       |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
       |uq AS (SELECT q.qid, c.cid, unnest(q.qe) AS x, unnest(c.cv) AS y FROM q, c),
       |sq AS (SELECT qid, cid,
       |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |       FROM uq GROUP BY 1, 2),
       |rq AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
       |       FROM sq),
       |qp AS (SELECT qid, cid FROM rq WHERE rn <= $probes),
       |cand AS (SELECT qp.qid, a.vec_id FROM asg a JOIN qp ON a.cid = qp.cid),
       |u2 AS (SELECT cand.qid, cand.vec_id, unnest(e.embedding) AS x, unnest(qe2.embedding) AS y
       |       FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
       |                 JOIN embeddings qe2 ON qe2.vec_id = cand.qid),
       |s2 AS (SELECT qid, vec_id,
       |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |       FROM u2 GROUP BY 1, 2),
       |rk AS (SELECT qid, vec_id, round(dot / sqrt(na * nb), 4) AS cos_sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY round(dot / sqrt(na * nb), 4) DESC, vec_id) AS rn
       |       FROM s2 WHERE na * nb > 0)
       |SELECT qid AS query_id, vec_id, cos_sim, CAST(rn AS INT) AS "rank"
       |FROM rk WHERE rn <= $k ORDER BY query_id, "rank"""".stripMargin

  // Shared oracle for the stored/appended PQ code-tier queries
  // (sim_pq_stored_codes probes=2/k=6, sim_pq_appended probes=1/k=5):
  // merged IVF assignment + PQ code construction, parameterized the
  // same way as ivfBatchOracle.
  private def pqStoredOracle(probes: Int, k: Int): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |cbk AS (SELECT vec_id - 1 AS code, embedding AS cbv FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
        |js AS (SELECT CAST(range AS INT) AS j FROM range(8)),
        |corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 16),
        |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM corpus v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |uq AS (SELECT q.qid, c.cid, unnest(q.qe) AS x, unnest(c.cv) AS y FROM q, c),
        |sq AS (SELECT qid, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM uq GROUP BY 1, 2),
        |rq AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |       FROM sq),
        |qp AS (SELECT qid, cid FROM rq WHERE rn <= $probes),
        |cand AS (SELECT qp.qid, a.vec_id FROM asg a JOIN qp ON a.cid = qp.cid),
        |cu AS (SELECT v.vec_id, js.j, cbk.code,
        |        unnest(list_slice(v.embedding, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cbk.cbv, js.j*8+1, js.j*8+8)) AS y
        |      FROM corpus v, js, cbk),
        |d AS (SELECT vec_id, j, code,
        |        round(sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 4) AS l2
        |      FROM cu GROUP BY 1, 2, 3),
        |pasg AS (SELECT vec_id, j, code FROM (
        |          SELECT vec_id, j, code,
        |            row_number() OVER (PARTITION BY vec_id, j ORDER BY l2, code) AS rn FROM d)
        |        WHERE rn = 1),
        |lu AS (SELECT q.qid, js.j, cbk.code,
        |        unnest(list_slice(q.qe, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cbk.cbv, js.j*8+1, js.j*8+8)) AS y
        |      FROM q, js, cbk),
        |lut AS (SELECT qid, j, code, round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS term
        |        FROM lu GROUP BY 1, 2, 3),
        |sc AS (SELECT l.qid, p.vec_id, round(sum(l.term), 4) AS adc_score
        |       FROM pasg p JOIN lut l ON p.j = l.j AND p.code = l.code
        |       JOIN cand ON cand.qid = l.qid AND cand.vec_id = p.vec_id
        |       GROUP BY 1, 2),
        |rk AS (SELECT qid, vec_id, adc_score,
        |        row_number() OVER (PARTITION BY qid ORDER BY adc_score DESC, vec_id) AS rn
        |       FROM sc)
        |SELECT qid AS query_id, vec_id AS id, adc_score, CAST(rn AS INT) AS "rank"
        |FROM rk WHERE rn <= $k ORDER BY query_id, "rank"""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── MinHash signature + LSH band hashes per document. ──────────────
    QueryDef.sql(
      "dedup_minhash_sig",
      s"""SELECT doc_id,
         |  array_to_string([md5(array_to_string(list_slice(sig, 2*b+1, 2*b+2), '|')) for b in range(0, 4)], ',') AS bands
         |FROM (SELECT doc_id, ${duckSig("sh", 8)} AS sig
         |      FROM (SELECT doc_id, ${duckShingles("ws", 3)} AS sh
         |            FROM (SELECT doc_id, $DuckToks AS ws FROM documents)))
         |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Dedup.minhashSignatures(QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text", 3, 8)
          .select(col("doc").as("doc_id"),
            when(col("sig").isNotNull,
              concat_ws(",", Dedup.bandHashes(col("sig"), 4, 2)))
              .otherwise(lit(null)).as("bands"))
          .orderBy("doc_id")
    },

    // ── LSH candidate pairs + exact n-gram Jaccard verification. ───────
    QueryDef.sql(
      "dedup_lsh_pairs",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
         |        CAST(count(*) AS BIGINT) AS n_shared_bands
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_shared_bands,
         |  ${duckJaccard("x.shd", "y.shd")} AS jaccard
         |FROM p JOIN shd x ON x.doc_id = p.doc_a JOIN shd y ON y.doc_id = p.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
        Dedup.lshCandidatePairs(QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4)
          .orderBy("doc_a", "doc_b")
    },

    // ── LSH parameter PLANNER: for every power-of-two (bands, rows)
    //    split of the 8-slot signature, the S-curve numbers (threshold
    //    (1/b)^(1/r), collision probability at j=0.5/0.7/0.9) and the
    //    MEASURED distinct candidate-pair count at that banding — the
    //    table that picks (b, r) before a dedup run commits to a cutoff.
    //    Engine-portable math shapes: thresholds by repeated sqrt, powers
    //    as left-associated multiply chains — no library pow() whose
    //    last-ulp could straddle the rounding boundary. ──
    {
      val k = 8
      val combos = Seq(1, 2, 4, 8)
      def chain(l: String, p: Int) = List.fill(p)(l).mkString(" * ")
      def root(inner: String, r: Int): String = {
        var s0 = inner; var rr = r
        while (rr > 1) { s0 = s"sqrt($s0)"; rr /= 2 }
        s0
      }
      val bandCtes = combos.map { b =>
        val r = k / b
        s"""b$b AS (SELECT doc_id, i AS band_idx, md5(array_to_string(list_slice(sig, $r*i+1, $r*i+$r), '|')) AS band_hash
           |      FROM m, (SELECT unnest(range(0, $b)) AS i)),
           |n$b AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT a.doc_id AS x, c.doc_id AS y FROM b$b a JOIN b$b c USING (band_idx, band_hash) WHERE a.doc_id < c.doc_id))""".stripMargin
      }.mkString(",\n")
      val rowsSel = combos.map { b =>
        val r = k / b
        def p(j: String) =
          s"round(1.0 - ${chain(s"(1.0 - ${chain(s"CAST($j AS DOUBLE)", r)})", b)}, 4)"
        val th =
          if (r == 1) s"round(CAST(1.0 AS DOUBLE) / $b, 4)"
          else s"round(${root(s"CAST(1.0 AS DOUBLE) / $b", r)}, 4)"
        s"SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band, $th AS threshold, ${p("0.5")} AS p_at_j05, ${p("0.7")} AS p_at_j07, ${p("0.9")} AS p_at_j09, n$b.n AS n_candidates FROM n$b"
      }.mkString("\nUNION ALL ")
      QueryDef.sql(
        "dedup_lsh_planner",
        s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
           |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
           |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
           |$bandCtes
           |SELECT * FROM ($rowsSel) ORDER BY bands""".stripMargin) { (s, d) =>
        Dedup.lshPlan(QueryDef.fanOutIfNarrow(Tables.documents(s, d)),
            "doc_id", "text", shingleN = 3, k = 8)
          .orderBy("bands")
      }
    },

    // ── Edit-distance verification of LSH candidates: Levenshtein over
    //    the candidate pairs the bands surfaced — the character-level
    //    second opinion on gram-level similarity (a pair can share every
    //    3-gram shingle yet differ by scattered single-character edits —
    //    OCR noise, diacritic damage — which Jaccard under-weights and
    //    edit distance counts one by one). INTEGER output: both engines
    //    implement the same DP, so the distance is oracle-exact with no
    //    float doctrine needed; the similarity ratio is ONE closing
    //    division. Scale: distance runs ONLY on the banded candidates
    //    (O(len²) per pair is why it can't be the primary dedup at
    //    corpus scale — the bands bound the pair count first). ──
    QueryDef.sql(
      "dedup_edit_verify",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist,
         |  CAST(greatest(length(x.text), length(y.text)) AS BIGINT) AS max_len,
         |  round(1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
         |    / nullif(greatest(length(x.text), length(y.text)), 0), 4) AS edit_sim
         |FROM p JOIN documents x ON x.doc_id = p.doc_a
         |       JOIN documents y ON y.doc_id = p.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
            shingleN = 3, k = 8, bands = 4)
          .select("doc_a", "doc_b")
        val txt = docs.select(col("doc_id"), col("text"))
        pairs
          .join(txt.select(col("doc_id").as("doc_a"), col("text").as("_ta")), Seq("doc_a"))
          .join(txt.select(col("doc_id").as("doc_b"), col("text").as("_tb")), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("_ta"), col("_tb")).cast("long").as("edit_dist"),
            greatest(length(col("_ta")), length(col("_tb"))).cast("long").as("max_len"))
          .withColumn("edit_sim",
            round(lit(1.0) - col("edit_dist").cast("double") /
              when(col("max_len") === 0, lit(null)).otherwise(col("max_len")), 4))
          .orderBy("doc_a", "doc_b")
    },

    // ── Containment scoring over LSH candidate pairs — the asymmetric
    //    dup relation Jaccard structurally misses (a quote inside an
    //    article: intersection/union ≈ 0 but intersection/|quote| ≈ 1).
    //    Same banding machinery, intersection by two equi-joins of the
    //    bounded pair list against distinct (doc, gram); the `contained`
    //    gate is integer-exact (n_common·1000 vs min·permille). ──
    QueryDef.sql(
      "dedup_containment_pairs",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |g AS (SELECT doc_id, unnest(list_distinct(sh)) AS g FROM sh),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
         |ic AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_common
         |       FROM p JOIN g ga ON ga.doc_id = p.doc_a
         |              JOIN g gb ON gb.doc_id = p.doc_b AND gb.g = ga.g
         |       GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b, coalesce(ic.n_common, 0) AS n_common,
         |  sa.n AS n_a, sb.n AS n_b,
         |  round(coalesce(ic.n_common, 0) / CAST(least(sa.n, sb.n) AS DOUBLE), 4) AS containment,
         |  coalesce(ic.n_common, 0) * 1000 >= least(sa.n, sb.n) * 900 AS contained
         |FROM p JOIN sz sa ON sa.doc_id = p.doc_a
         |       JOIN sz sb ON sb.doc_id = p.doc_b
         |       LEFT JOIN ic ON ic.doc_a = p.doc_a AND ic.doc_b = p.doc_b
         |ORDER BY p.doc_a, p.doc_b""".stripMargin) {
      (s, d) =>
        Dedup.containmentPairs(QueryDef.fanOutIfNarrow(Tables.documents(s, d)),
            "doc_id", "text", shingleN = 3, k = 8, bands = 4, minPermille = 900)
          .orderBy("doc_a", "doc_b")
    },

    // ── Source-duplication provenance MATRIX: LSH near-dup pairs rolled
    //    up to (source_a, source_b) — WHICH sources copy from which (a
    //    mirror site, a syndicated feed, a scraper double-crawl), the
    //    decision input for source-level dedup ordering that doc-level
    //    pair lists can't show. Pure composition: the SAME banding
    //    machinery, verified pairs (jaccard ≥ 0.5) joined to the doc→
    //    source map twice, unordered pair normalized source_a ≤ source_b.
    //    Scale: the rollup collapses map-side; the source map is a
    //    two-column projection of the corpus (no text travels). ──
    QueryDef.sql(
      "dedup_source_matrix",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |v AS (SELECT doc_a, doc_b FROM p
         |      JOIN shd x ON x.doc_id = p.doc_a JOIN shd y ON y.doc_id = p.doc_b
         |      WHERE ${duckJaccard("x.shd", "y.shd")} >= 0.5),
         |src AS (SELECT doc_id, source FROM documents)
         |SELECT least(sa.source, sb.source) AS source_a,
         |  greatest(sa.source, sb.source) AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM v JOIN src sa ON sa.doc_id = v.doc_a
         |       JOIN src sb ON sb.doc_id = v.doc_b
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
            shingleN = 3, k = 8, bands = 4)
          .filter(col("jaccard") >= 0.5)
        val src = docs.select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("_sa")), Seq("doc_a"))
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("_sb")), Seq("doc_b"))
          .select(least(col("_sa"), col("_sb")).as("source_a"),
            greatest(col("_sa"), col("_sb")).as("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("source_a", "source_b")
    },

    // ── Chunk-granularity LSH near-dup pairs: the sub-document shape —
    //    a doc that copies ONE paragraph from another never band-collides
    //    at doc level (the copied span is a small minority of its
    //    shingles), but its 32-token windows do. Pure composition:
    //    chunkTokens → composite chunk key → the SAME lshCandidatePairs
    //    operator, keys unpacked back to (doc, chunk) for provenance.
    //    Chunks below shingleN can't shingle and are dropped on both
    //    sides; chunk_idx < 1000 holds by construction at any corpus the
    //    composite key serves (32-token stride × 1000 = 32k-token docs;
    //    longer docs get a wider key, not a different plan). ──
    QueryDef.sql(
      "dedup_chunk_lsh_pairs",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sdoc AS (SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) > 0),
         |c AS (SELECT doc_id, ws,
         |        unnest(range(0, CASE WHEN n <= 8 THEN 1 ELSE (n - 8 + 23) // 24 END)) AS chunk_idx
         |      FROM sdoc),
         |ch AS (SELECT doc_id * 1000 + chunk_idx AS cid,
         |         list_slice(ws, chunk_idx * 24 + 1, chunk_idx * 24 + 32) AS cw
         |       FROM c WHERE len(list_slice(ws, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) >= 3),
         |sh AS (SELECT cid, ${duckShingles("cw", 3)} AS sh FROM ch),
         |shd AS (SELECT cid, list_distinct(sh) AS shd FROM sh),
         |m AS (SELECT cid, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT cid, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.cid AS cid_a, c.cid AS cid_b,
         |        CAST(count(*) AS BIGINT) AS n_shared_bands
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.cid < c.cid GROUP BY 1, 2)
         |SELECT CAST(cid_a // 1000 AS BIGINT) AS doc_a, CAST(cid_a % 1000 AS BIGINT) AS chunk_a,
         |  CAST(cid_b // 1000 AS BIGINT) AS doc_b, CAST(cid_b % 1000 AS BIGINT) AS chunk_b,
         |  n_shared_bands, ${duckJaccard("x.shd", "y.shd")} AS jaccard
         |FROM p JOIN shd x ON x.cid = p.cid_a JOIN shd y ON y.cid = p.cid_b
         |ORDER BY doc_a, chunk_a, doc_b, chunk_b""".stripMargin) {
      (s, d) =>
        val chunks = graft.operators.TextOps.chunkTokens(
            QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
            chunkSize = 32, overlap = 8)
          .filter(col("n_tokens") >= 3)
          .select((col("doc") * 1000 + col("chunk_idx")).as("chunk_id"),
            col("chunk_text").as("text"))
        Dedup.lshCandidatePairs(chunks, "chunk_id", "text",
            shingleN = 3, k = 8, bands = 4)
          .select(
            expr("CAST(doc_a div 1000 AS BIGINT)").as("da"),
            expr("CAST(doc_a % 1000 AS BIGINT)").as("chunk_a"),
            expr("CAST(doc_b div 1000 AS BIGINT)").as("db"),
            expr("CAST(doc_b % 1000 AS BIGINT)").as("chunk_b"),
            col("n_shared_bands"), col("jaccard"))
          .withColumnsRenamed(Map("da" -> "doc_a", "db" -> "doc_b"))
          .orderBy("doc_a", "chunk_a", "doc_b", "chunk_b")
    },

    // ── Duplicate-cluster resolution: connected components (min-id
    //    label) over the LSH pair graph — pair generation's missing
    //    half: a transitive family of near-dups collapses to one
    //    canonical doc (keep doc == cluster). Spark runs iterative
    //    min-label propagation; the oracle computes the same components
    //    with a recursive transitive-closure CTE. ──
    QueryDef.sql(
      "dedup_clusters",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |r AS (SELECT a, b FROM e
         |      UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a)
         |SELECT a AS doc, least(a, min(b)) AS cluster
         |FROM r GROUP BY a ORDER BY doc""".stripMargin) {
      (s, d) =>
        val pairs = Dedup.lshCandidatePairs(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4)
        Dedup.duplicateClusters(pairs).orderBy("doc")
    },

    // ── Leakage-safe train/val/test split: hash the near-dup CLUSTER
    //    id, not the doc id — a paraphrase family can never straddle
    //    the train/eval boundary (the within-corpus sibling of
    //    decontamination). Same LSH clusters as dedup_clusters;
    //    singletons key on their own id. Aggregated per (split,
    //    cluster) first — partial-agg, no count-distinct Expand. ──
    QueryDef.sql(
      "pipeline_split_leakage_safe",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |r AS (SELECT a, b FROM e
         |      UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
         |lbl AS (SELECT a AS doc, least(a, min(b)) AS cluster FROM r GROUP BY a),
         |k AS (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS ck,
         |        len(list_filter(string_split(trim(d.text), ' '), w -> w <> '')) AS nt
         |      FROM documents d LEFT JOIN lbl l ON l.doc = d.doc_id),
         |c AS (SELECT ck,
         |        CAST(CAST('0x' || substr(md5(CAST(ck AS VARCHAR)), 1, 8) AS UBIGINT) % 1000 AS INT) AS bkt,
         |        CAST(count(*) AS BIGINT) AS cnt, CAST(sum(nt) AS BIGINT) AS tok
         |      FROM k GROUP BY ck)
         |SELECT CASE WHEN bkt < 900 THEN 'train' WHEN bkt < 950 THEN 'val' ELSE 'test' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(cnt) AS BIGINT) AS n_docs,
         |  CAST(sum(tok) AS BIGINT) AS n_tokens
         |FROM c GROUP BY 1 ORDER BY split""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        val clusters = Dedup.duplicateClusters(
          Dedup.lshCandidatePairs(docs, "doc_id", "text", shingleN = 3, k = 8, bands = 4))
        graft.operators.Sharding
          .splitLeakageSafe(docs, "doc_id", clusters)
          .groupBy("split", "cluster_key")
          .agg(count(lit(1)).as("cnt"),
            sum(size(TextOps.tokens(col("text")))).as("tok"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_clusters"),
            sum("cnt").as("n_docs"),
            sum("tok").as("n_tokens"))
          .orderBy("split")
    },

    // ── Benchmark decontamination: flag corpus docs sharing 3-gram
    //    content with the "eval set" (docs 0-9) — the overlap audit any
    //    training corpus needs before a benchmark claim. Benchmark
    //    shingle set broadcasts; corpus streams through one scan. ──
    QueryDef.sql(
      "pipeline_decontaminate",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, list_distinct(${duckShingles("ws", 3)}) AS shd FROM t),
         |bench AS (SELECT DISTINCT unnest(shd) AS g FROM sh WHERE doc_id < 10),
         |corp AS (SELECT doc_id, shd FROM sh WHERE doc_id >= 10),
         |u AS (SELECT doc_id, unnest(shd) AS g FROM corp),
         |hits AS (SELECT u.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |         FROM u JOIN bench USING (g) GROUP BY 1)
         |SELECT c.doc_id AS doc, CAST(len(c.shd) AS BIGINT) AS n_shingles,
         |  COALESCE(h.n_hits, 0) AS n_hits,
         |  round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / nullif(len(c.shd), 0), 4) AS contamination
         |FROM corp c LEFT JOIN hits h ON h.doc_id = c.doc_id
         |ORDER BY doc""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        TextOps.contamination(
            docs.filter(col("doc_id") >= 10), "doc_id", "text",
            benchmark = docs.filter(col("doc_id") < 10), benchTextCol = "text",
            shingleN = 3)
          .orderBy("doc")
    },

    // ── Bloom-PRUNED decontamination: same answer as the exact query
    //    above — the oracle is literally the same SQL — through the
    //    too-big-to-broadcast path: benchmark grams become a broadcast
    //    Bloom sketch, corpus grams are pruned map-side, and an exact
    //    confirm join kills the sketch's false positives. At 100 TB the
    //    benchmark union can be billions of grams (no broadcast, and a
    //    full corpus-gram shuffle join is the bottleneck); the sketch
    //    cuts shuffled volume to O(hits + fpp·grams) while changing
    //    nothing about the result, which is exactly what the shared
    //    oracle proves. ──
    QueryDef.sql(
      "pipeline_decontaminate_bloom",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, list_distinct(${duckShingles("ws", 3)}) AS shd FROM t),
         |bench AS (SELECT DISTINCT unnest(shd) AS g FROM sh WHERE doc_id < 10),
         |corp AS (SELECT doc_id, shd FROM sh WHERE doc_id >= 10),
         |u AS (SELECT doc_id, unnest(shd) AS g FROM corp),
         |hits AS (SELECT u.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |         FROM u JOIN bench USING (g) GROUP BY 1)
         |SELECT c.doc_id AS doc, CAST(len(c.shd) AS BIGINT) AS n_shingles,
         |  COALESCE(h.n_hits, 0) AS n_hits,
         |  round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / nullif(len(c.shd), 0), 4) AS contamination
         |FROM corp c LEFT JOIN hits h ON h.doc_id = c.doc_id
         |ORDER BY doc""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        TextOps.contaminationBloomPruned(
            docs.filter(col("doc_id") >= 10), "doc_id", "text",
            benchmark = docs.filter(col("doc_id") < 10), benchTextCol = "text",
            shingleN = 3)
          .orderBy("doc")
    },

    // ── SURGICAL decontamination: cut benchmark-overlapping SPANS, keep
    //    the doc — dropping a whole long document because one quoted
    //    benchmark sentence rode along wastes everything else it knows.
    //    Removal = position covered by a 3-gram present in the bench
    //    set (docs 0-9); the span-union fold of text_exact_dedup with a
    //    broadcast membership test instead of corpus gram stats. ──
    QueryDef.sql(
      "pipeline_decontaminate_cut",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |b AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws FROM t
         |      WHERE len(ws) >= 3 AND doc_id >= 10),
         |bench AS (SELECT DISTINCT unnest(${duckShingles("ws", 3)}) AS gram FROM t WHERE doc_id < 10),
         |g AS (SELECT doc_id,
         |        unnest(range(1, len(ws) - 1)) AS pos,
         |        unnest([array_to_string(list_slice(ws, j, j + 2), ' ') for j in range(1, len(ws) - 1)]) AS gram
         |      FROM b),
         |rp AS (SELECT g.doc_id, g.pos FROM g JOIN bench USING (gram)),
         |cov AS (SELECT DISTINCT doc_id, pos + o AS p FROM rp, (SELECT unnest(range(0, 3)) AS o) oo),
         |tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, unnest(ws) AS w FROM b),
         |kept AS (SELECT tok.doc_id, tok.p, tok.w FROM tok
         |         LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.p = tok.p
         |         WHERE cov.p IS NULL),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |          string_agg(w, ' ' ORDER BY p) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT b.doc_id AS doc, b.n_tokens,
         |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |  coalesce(agg.clean_text, '') AS clean_text
         |FROM b LEFT JOIN agg ON agg.doc_id = b.doc_id
         |ORDER BY doc""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        TextOps.contaminationCutText(
            docs.filter(col("doc_id") >= 10), "doc_id", "text",
            benchmark = docs.filter(col("doc_id") < 10), benchTextCol = "text",
            n = 3)
          .orderBy("doc")
    },

    // ── Contamination provenance: WHICH benchmark item (docs 0-9)
    //    overlaps which corpus doc and by how many shared 3-grams —
    //    the reviewable audit behind the decontamination decision (the
    //    aggregate count can't distinguish one heavy match from ten
    //    light ones). Pairs with ≥ 3 shared grams only. ──
    QueryDef.sql(
      "pipeline_decontaminate_provenance",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, list_distinct(${duckShingles("ws", 3)}) AS shd FROM t),
         |bench AS (SELECT DISTINCT doc_id AS bench_doc, unnest(shd) AS g FROM sh WHERE doc_id < 10),
         |u AS (SELECT doc_id, unnest(shd) AS g FROM sh WHERE doc_id >= 10)
         |SELECT u.doc_id AS doc, bench.bench_doc,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM u JOIN bench USING (g)
         |GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY doc, bench_doc""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        TextOps.contaminationProvenance(
            docs.filter(col("doc_id") >= 10), "doc_id", "text",
            benchmark = docs.filter(col("doc_id") < 10),
            benchIdCol = "doc_id", benchTextCol = "text",
            shingleN = 3, minShared = 3L)
          .orderBy("doc", "bench_doc")
    },

    // ── Cross-document repeated n-gram coverage: the exact-substring
    //    dedup signal (grams recurring ACROSS docs; within-doc repeats
    //    are text_repetition's job). One shuffle on the gram, min≠max
    //    doc id instead of count-distinct — constant state per gram. ──
    QueryDef.sql(
      "text_crossdup_coverage",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(${duckShingles("ws", 3)})) AS g FROM t),
         |st AS (SELECT g, min(doc_id) AS mind, max(doc_id) AS maxd FROM sh GROUP BY g)
         |SELECT sh.doc_id AS doc,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN st.mind <> st.maxd THEN 1 ELSE 0 END) AS BIGINT) AS n_crossdup,
         |  round(CAST(sum(CASE WHEN st.mind <> st.maxd THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS crossdup_frac
         |FROM sh JOIN st USING (g)
         |GROUP BY 1 ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.crossDupCoverage(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text", n = 3)
          .orderBy("doc")
    },

    // ── End of the dedup pipeline: pairs → clusters → keep ONE
    //    canonical doc per family (smallest id), plus every never-paired
    //    doc. The oracle anti-joins the recursive-closure drop list. ──
    QueryDef.sql(
      "dedup_keep_canonical",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |r AS (SELECT a, b FROM e
         |      UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
         |lbl AS (SELECT a AS doc, least(a, min(b)) AS cluster FROM r GROUP BY a)
         |SELECT d.doc_id, d.lang
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc FROM lbl WHERE doc <> cluster)
         |ORDER BY d.doc_id""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        val clusters = Dedup.duplicateClusters(
          Dedup.lshCandidatePairs(docs, "doc_id", "text", shingleN = 3, k = 8, bands = 4))
        Dedup.keepCanonical(docs, "doc_id", clusters)
          .select("doc_id", "lang").orderBy("doc_id")
    },

    // ── Prefix-filtering similarity join — the EXACT-threshold
    //    all-pairs complement to LSH (AllPairs/PPJoin family): every
    //    pair with token-set Jaccard ≥ 0.9, guaranteed, no band
    //    tuning, no probabilistic recall. Representatives first (exact
    //    dedup over the set fingerprint — identical sets pair
    //    quadratically and are exact dedup's job), then the rare-first
    //    prefix join + exact verify. The oracle brute-force-verifies
    //    candidates from ANY shared token (a strict superset of prefix
    //    candidates) — so a prefix that misses a true pair (theorem
    //    violated by an implementation bug) shows up as a missing row,
    //    and permille values pin the exact-arithmetic verify. ──
    QueryDef.sql(
      "dedup_prefix_join",
      s"""WITH t AS (SELECT doc_id, list_sort(list_distinct($DuckToks)) AS ts
         |  FROM documents),
         |reps AS (SELECT min(doc_id) AS sid, any_value(ts) AS ts FROM t
         |  GROUP BY md5(array_to_string(ts, ' '))),
         |e AS (SELECT sid, unnest(ts) AS tok FROM reps),
         |cand AS (SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
         |  FROM e a JOIN e b ON a.tok = b.tok AND a.sid < b.sid),
         |v AS (SELECT id_a, id_b,
         |    len(list_intersect(ra.ts, rb.ts)) AS i,
         |    len(ra.ts) + len(rb.ts) - len(list_intersect(ra.ts, rb.ts)) AS u
         |  FROM cand JOIN reps ra ON id_a = ra.sid JOIN reps rb ON id_b = rb.sid)
         |SELECT id_a, id_b, CAST(i * 1000 // u AS BIGINT) AS jac_permille
         |FROM v WHERE i * 1000 >= 900 * u ORDER BY id_a, id_b""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val sets = Tables.documents(s, d)
          .select(col("doc_id"),
            array_sort(array_distinct(TextOps.tokens(col("text")))).as("ts"))
        val reps = sets
          .groupBy(md5(concat_ws(" ", col("ts")).cast("binary")).as("_fp"))
          .agg(min(col("doc_id")).as("id"), first(col("ts")).as("ts"))
          .select("id", "ts")
        Dedup.prefixFilterPairs(reps, "id", "ts", 900)
          .orderBy("id_a", "id_b")
    },

    // ── INCREMENTAL exact-threshold join — the arrival path the PPJoin
    //    family lacked: the corpus (doc_id % 5 ≠ 0) builds a STORED
    //    prefix index (frozen df ordering + prefix rows + token sets),
    //    and the batch (doc_id % 5 = 0) probes it WITHOUT re-tokenizing
    //    the corpus — batch-vs-corpus candidates against the stored
    //    prefix rows, batch-vs-batch against its own, both under the
    //    frozen total order (unseen tokens sort rarest-first, so the
    //    prefix theorem holds exactly; spec pins corpus-pairs ∪ probe ≡
    //    one-shot on the union). The oracle brute-force-verifies from
    //    ANY shared token between a batch rep and anything — a strict
    //    superset of prefix candidates — so a stale-ordering recall
    //    loss anywhere breaks the row set. ──
    QueryDef.sql(
      "dedup_prefix_incremental",
      s"""WITH tc AS (SELECT doc_id, list_sort(list_distinct($DuckToks)) AS ts
         |  FROM documents WHERE doc_id % 5 <> 0),
         |rc AS (SELECT min(doc_id) AS sid, any_value(ts) AS ts FROM tc
         |  GROUP BY md5(array_to_string(ts, ' '))),
         |tb AS (SELECT doc_id, list_sort(list_distinct($DuckToks)) AS ts
         |  FROM documents WHERE doc_id % 5 = 0),
         |rb AS (SELECT min(doc_id) AS sid, any_value(ts) AS ts FROM tb
         |  GROUP BY md5(array_to_string(ts, ' '))),
         |allr AS (SELECT sid, ts FROM rc UNION ALL SELECT sid, ts FROM rb),
         |eb AS (SELECT sid, unnest(ts) AS tok FROM rb),
         |ea AS (SELECT sid, unnest(ts) AS tok FROM allr),
         |cand AS (SELECT DISTINCT least(a.sid, b.sid) AS id_a,
         |                greatest(a.sid, b.sid) AS id_b
         |  FROM eb a JOIN ea b ON a.tok = b.tok AND a.sid <> b.sid),
         |v AS (SELECT id_a, id_b,
         |    len(list_intersect(ra.ts, rz.ts)) AS i,
         |    len(ra.ts) + len(rz.ts) - len(list_intersect(ra.ts, rz.ts)) AS u
         |  FROM cand JOIN allr ra ON id_a = ra.sid JOIN allr rz ON id_b = rz.sid)
         |SELECT id_a, id_b, CAST(i * 1000 // u AS BIGINT) AS jac_permille
         |FROM v WHERE i * 1000 >= 900 * u ORDER BY id_a, id_b""".stripMargin) {
      (s, d) =>
        def reps(dd: org.apache.spark.sql.DataFrame) = dd
          .select(col("doc_id"),
            array_sort(array_distinct(TextOps.tokens(col("text")))).as("ts"))
          .groupBy(md5(concat_ws(" ", col("ts")).cast("binary")).as("_fp"))
          .agg(min(col("doc_id")).as("id"), first(col("ts")).as("ts"))
          .select("id", "ts")
        val docs = Tables.documents(s, d)
        val idxDir = java.nio.file.Files.createTempDirectory("graft-ppidx").toString
        Dedup.prefixIndexBuild(
          reps(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)), "id", "ts", 900, idxDir)
        Dedup.incrementalPrefixPairs(
          reps(docs.filter(pmod(col("doc_id"), lit(5)) === 0)), "id", "ts", idxDir)
          .orderBy("id_a", "id_b")
    },

    // ── Prefix join → union-find → canonical keep: the exact-threshold
    //    dedup END-TO-END (what a J ≥ 0.9 near-dup pass actually ships:
    //    survivors + how much each absorbed). The oracle computes TRUE
    //    undirected connected components by UNROLLED min-label
    //    propagation (24 generated rounds over the symmetrized edge
    //    list — the BPE unrolled-iteration doctrine; a recursive
    //    closure is quadratic×degree on near-clique dedup graphs and a
    //    monotone-chain shortcut is only valid on cliques). 24 rounds
    //    cover any plausible dedup-graph diameter, and an unconverged
    //    oracle fails LOUDLY as a hash mismatch, never silently. ──
    QueryDef.sql(
      "dedup_prefix_clusters",
      s"""WITH t AS (SELECT doc_id, list_sort(list_distinct($DuckToks)) AS ts
         |  FROM documents),
         |reps AS (SELECT min(doc_id) AS sid, any_value(ts) AS ts FROM t
         |  GROUP BY md5(array_to_string(ts, ' '))),
         |ex AS (SELECT sid, unnest(ts) AS tok FROM reps),
         |cand AS (SELECT DISTINCT a.sid AS ia, b.sid AS ib
         |  FROM ex a JOIN ex b ON a.tok = b.tok AND a.sid < b.sid),
         |e AS (SELECT ia, ib FROM cand JOIN reps ra ON ia = ra.sid JOIN reps rb ON ib = rb.sid
         |  WHERE len(list_intersect(ra.ts, rb.ts)) * 1000 >=
         |        900 * (len(ra.ts) + len(rb.ts) - len(list_intersect(ra.ts, rb.ts)))),
         |ud AS MATERIALIZED (SELECT ia AS a, ib AS b FROM e UNION ALL SELECT ib, ia FROM e),
         |l0 AS MATERIALIZED (SELECT sid AS node, sid AS l FROM reps),
         |${(0 until 24).map(t =>
            // MATERIALIZED is load-bearing: each round reads the previous
            // one twice; inlined CTEs would expand to 2^24 base scans
            s"l${t + 1} AS MATERIALIZED (SELECT c.node, least(c.l, coalesce(min(n.l), c.l)) AS l\n" +
            s"  FROM l$t c LEFT JOIN ud ON c.node = ud.a LEFT JOIN l$t n ON ud.b = n.node\n" +
            s"  GROUP BY c.node, c.l)").mkString(",\n")},
         |sizes AS (SELECT l AS cluster, count(*) AS n FROM l24 GROUP BY l)
         |SELECT f.node AS doc_id, CAST(s.n AS BIGINT) AS n_members
         |FROM l24 f JOIN sizes s ON f.l = s.cluster
         |WHERE f.node = f.l
         |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val sets = Tables.documents(s, d)
          .select(col("doc_id"),
            array_sort(array_distinct(TextOps.tokens(col("text")))).as("ts"))
        val reps = sets
          .groupBy(md5(concat_ws(" ", col("ts")).cast("binary")).as("_fp"))
          .agg(min(col("doc_id")).as("id"), first(col("ts")).as("ts"))
          .select("id", "ts")
        val pairs = Dedup.prefixFilterPairs(reps, "id", "ts", 900)
        val clusters = Dedup.duplicateClusters(pairs, aCol = "id_a", bCol = "id_b")
        val sizes = clusters.groupBy("cluster").agg(count(lit(1)).as("_n"))
        Dedup.keepCanonical(reps, "id", clusters)
          .join(sizes, col("id") === col("cluster"), "left_outer")
          .select(col("id").as("doc_id"),
            coalesce(col("_n"), lit(1L)).cast("long").as("n_members"))
          .orderBy("doc_id")
    },

    // ── Jaccard histogram over the LSH candidate pairs: the lexical
    //    twin of sim_threshold_sweep — the curve that calibrates
    //    minJaccard before a dedup run commits to a cutoff. One pass,
    //    conditional sums; ladder rungs are corpus-informed. ──
    QueryDef.sql(
      "dedup_jaccard_histogram",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |j AS (SELECT ${duckJaccard("x.shd", "y.shd")} AS jc
         |      FROM p JOIN shd x ON x.doc_id = p.doc_a JOIN shd y ON y.doc_id = p.doc_b)
         |SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         |  CAST(sum(CASE WHEN jc >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS ge_020,
         |  CAST(sum(CASE WHEN jc >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS ge_040,
         |  CAST(sum(CASE WHEN jc >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS ge_060,
         |  CAST(sum(CASE WHEN jc >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS ge_080,
         |  CAST(sum(CASE WHEN jc >= 0.99 THEN 1 ELSE 0 END) AS BIGINT) AS ge_099
         |FROM j""".stripMargin) {
      (s, d) =>
        val pairs = Dedup.lshCandidatePairs(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4)
        def ge(t: Double, name: String) =
          sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(name)
        pairs.agg(count(lit(1)).as("n_candidates"),
          ge(0.2, "ge_020"), ge(0.4, "ge_040"), ge(0.6, "ge_060"),
          ge(0.8, "ge_080"), ge(0.99, "ge_099"))
    },

    // ── The dedup LADDER: survivors per tier in pipeline order — exact
    //    (content hash, keep min id) then near-dup LSH clustering run
    //    on the EXACT survivors only (the real pipeline order: the
    //    cheap tier shrinks the corpus before the fuzzy tier bands it).
    //    Per-language cumulative counts, the dedup twin of
    //    pipeline_filter_funnel. ──
    QueryDef.sql(
      "dedup_ladder",
      s"""WITH RECURSIVE d AS (SELECT doc_id, coalesce(lang, '??') AS lang, text FROM documents),
         |ex AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY text),
         |s1 AS (SELECT d.doc_id, d.lang, d.text FROM d JOIN ex USING (doc_id)),
         |t AS (SELECT doc_id, $DuckToks AS ws FROM s1),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |r AS (SELECT a, b FROM e
         |      UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
         |lbl AS (SELECT a AS doc, least(a, min(b)) AS cluster FROM r GROUP BY a),
         |s2 AS (SELECT s1.doc_id, s1.lang FROM s1
         |       WHERE s1.doc_id NOT IN (SELECT doc FROM lbl WHERE doc <> cluster))
         |SELECT d.lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(s1k.doc_id) AS BIGINT) AS after_exact,
         |  CAST(count(s2k.doc_id) AS BIGINT) AS after_neardup
         |FROM d
         |LEFT JOIN (SELECT doc_id FROM s1) s1k ON s1k.doc_id = d.doc_id
         |LEFT JOIN (SELECT doc_id FROM s2) s2k ON s2k.doc_id = d.doc_id
         |GROUP BY d.lang ORDER BY lang""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), coalesce(col("lang"), lit("??")).as("lang"), col("text"))
        val exactKeep = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val s1 = docs.join(exactKeep, Seq("doc_id"), "left_semi")
        val clusters = Dedup.duplicateClusters(
          Dedup.lshCandidatePairs(QueryDef.fanOutIfNarrow(s1), "doc_id", "text",
            shingleN = 3, k = 8, bands = 4))
        val s2 = Dedup.keepCanonical(s1, "doc_id", clusters).select("doc_id")
        docs
          .join(s1.select(col("doc_id"), lit(1).as("_s1")), Seq("doc_id"), "left_outer")
          .join(s2.select(col("doc_id"), lit(1).as("_s2")), Seq("doc_id"), "left_outer")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            count(col("_s1")).as("after_exact"),
            count(col("_s2")).as("after_neardup"))
          .orderBy("lang")
    },

    // ── Dedup observability report: per language, how much duplication
    //    each tier sees — exact (distinct text groups) and near-dup
    //    (docs appearing in ≥1 LSH candidate pair; membership only, no
    //    closure). The report a pipeline run ships next to its output.
    //    Expand-free: distinct counts go through (lang, text) /
    //    membership pre-aggregation, never count-distinct. ──
    QueryDef.sql(
      "corpus_dedup_report",
      s"""WITH d AS (SELECT doc_id, coalesce(lang, '??') AS lang, text FROM documents),
         |ex AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(DISTINCT text) AS BIGINT) AS n_exact_unique
         |       FROM d GROUP BY lang),
         |t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |mem AS (SELECT DISTINCT doc FROM (
         |          SELECT doc_a AS doc FROM p UNION ALL SELECT doc_b FROM p)),
         |nd AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS neardup_docs
         |       FROM mem JOIN d ON d.doc_id = mem.doc GROUP BY d.lang)
         |SELECT ex.lang, ex.n_docs, ex.n_exact_unique,
         |  ex.n_docs - ex.n_exact_unique AS exact_dup_docs,
         |  coalesce(nd.neardup_docs, 0) AS neardup_docs,
         |  round(CAST(coalesce(nd.neardup_docs, 0) AS DOUBLE) / ex.n_docs, 4) AS neardup_rate
         |FROM ex LEFT JOIN nd USING (lang)
         |ORDER BY lang""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), coalesce(col("lang"), lit("??")).as("lang"), col("text"))
        // Expand-free distinct: (lang, text) pre-aggregation
        val ex = docs.groupBy("lang", "text").agg(count(lit(1)).as("_n"))
          .groupBy("lang")
          .agg(sum("_n").as("n_docs"), count(lit(1)).as("n_exact_unique"))
        val pairs = Dedup.lshCandidatePairs(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4)
        val members = pairs.select(col("doc_a").as("doc_id"))
          .unionByName(pairs.select(col("doc_b").as("doc_id")))
          .distinct()
        val nd = members.join(docs, Seq("doc_id"))
          .groupBy("lang").agg(count(lit(1)).as("neardup_docs"))
        ex.join(nd, Seq("lang"), "left_outer")
          .select(col("lang"), col("n_docs"), col("n_exact_unique"),
            (col("n_docs") - col("n_exact_unique")).as("exact_dup_docs"),
            coalesce(col("neardup_docs"), lit(0L)).as("neardup_docs"),
            round(coalesce(col("neardup_docs"), lit(0L)).cast("double") / col("n_docs"), 4)
              .as("neardup_rate"))
          .orderBy("lang")
    },

    // ── Quality-aware canonical selection: keep the highest-quality
    //    member of each duplicate cluster (score = doc length here; any
    //    score column composes), ties to the smallest id — min-id keep
    //    throws away the clean copy whenever the boilerplate-laden one
    //    got the smaller id. Only the cluster GROUPING is used, so
    //    Spark's min-id labels and the oracle's least-of-pair labels
    //    select identical survivors. Argmax is min(struct(-score, id)):
    //    partial-agg, no rank window — the biggest family collapses
    //    map-side. ──
    QueryDef.sql(
      "dedup_keep_best",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |r AS (SELECT a, b FROM e
         |      UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
         |lbl AS (SELECT a AS doc, least(a, min(b)) AS cluster FROM r GROUP BY a),
         |scored AS (SELECT l.doc, l.cluster, length(d.text) AS sc
         |           FROM lbl l JOIN documents d ON d.doc_id = l.doc),
         |keep AS (SELECT doc FROM (
         |           SELECT doc, row_number() OVER (PARTITION BY cluster
         |             ORDER BY sc DESC, doc) AS rn FROM scored) WHERE rn = 1)
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS score
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc FROM lbl)
         |   OR d.doc_id IN (SELECT doc FROM keep)
         |ORDER BY d.doc_id""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
          .select(col("doc_id"), col("text"),
            length(col("text")).cast("long").as("score"))
        val clusters = Dedup.duplicateClusters(
          Dedup.lshCandidatePairs(docs, "doc_id", "text", shingleN = 3, k = 8, bands = 4))
        Dedup.keepBestInCluster(docs, "doc_id", "score", clusters)
          .select("doc_id", "score").orderBy("doc_id")
    },

    // ── 16-bit SimHash fingerprint. ────────────────────────────────────
    QueryDef.sql(
      "dedup_simhash",
      s"""$duckSimhash16
         |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Dedup.simhash16(QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text").orderBy("doc_id")
    },

    // ── SimHash near-dup pairs (pigeonhole-banded Hamming ball). ───────
    // The oracle forms the SAME candidate set declaratively (agree on
    // ≥1 block, expressed as an OR over the block substrings generated
    // from the same simhashBlockBounds the Spark plan uses) and the
    // same exact prune; the pigeonhole identity makes both equal the
    // full Hamming-ball pair set, which is what the hash match pins.
    QueryDef.sql(
      "dedup_simhash_pairs", {
        val k = 2
        val bounds = Dedup.simhashBlockBounds(k + 1)
        val bandEq = (0 until k + 1).map { i =>
          val (p, w) = (bounds(i) + 1, bounds(i + 1) - bounds(i))
          s"substr(a.simhash, $p, $w) = substr(b.simhash, $p, $w)"
        }.mkString(" OR ")
        val ham = (1 to 16).map(i =>
          s"(CASE WHEN substr(sa, $i, 1) <> substr(sb, $i, 1) THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH s AS ($duckSimhash16),
           |c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |             a.simhash AS sa, b.simhash AS sb
           |      FROM s a JOIN s b ON a.doc_id < b.doc_id AND ($bandEq))
           |SELECT id_a, id_b, CAST($ham AS BIGINT) AS hamming
           |FROM c
           |WHERE $ham <= $k
           |ORDER BY id_a, id_b""".stripMargin
      }) {
      (s, d) =>
        Dedup.simhashNearDupPairs(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text", maxHamming = 2)
          .orderBy("id_a", "id_b")
    },

    // ── Hamming histogram over the SimHash ball: pair counts at each
    //    distance 0..3 in one pass over the banded k=3 candidates —
    //    completes the calibration-curve family (cosine ladder, Jaccard
    //    histogram, Hamming here): pick maxHamming where the count
    //    inflects. Pigeonhole recall is exact inside the ball, so
    //    counts are true, not probabilistic. ──
    QueryDef.sql(
      "dedup_simhash_histogram", {
        val k = 3
        val bounds = Dedup.simhashBlockBounds(k + 1)
        val bandEq = (0 until k + 1).map { i =>
          val (p, w) = (bounds(i) + 1, bounds(i + 1) - bounds(i))
          s"substr(a.simhash, $p, $w) = substr(b.simhash, $p, $w)"
        }.mkString(" OR ")
        val ham = (1 to 16).map(i =>
          s"(CASE WHEN substr(sa, $i, 1) <> substr(sb, $i, 1) THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH s AS ($duckSimhash16),
           |c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |             a.simhash AS sa, b.simhash AS sb
           |      FROM s a JOIN s b ON a.doc_id < b.doc_id AND ($bandEq)),
           |h AS (SELECT CAST($ham AS BIGINT) AS hd FROM c WHERE $ham <= $k)
           |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(CASE WHEN hd = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
           |  CAST(sum(CASE WHEN hd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
           |  CAST(sum(CASE WHEN hd = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
           |  CAST(sum(CASE WHEN hd = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3
           |FROM h""".stripMargin
      }) {
      (s, d) =>
        val pairs = Dedup.simhashNearDupPairs(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text", maxHamming = 3)
        def h(v: Int) = sum(when(col("hamming") === v, 1L).otherwise(0L)).as(s"h$v")
        pairs.agg(count(lit(1)).as("n_pairs"), h(0), h(1), h(2), h(3))
    },

    // ── Production-width 64-bit SimHash fingerprint (one LONG/doc). ────
    QueryDef.sql(
      "dedup_simhash64",
      s"""$duckSimhash64Long
         |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Dedup.simhash64(QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text")
          .orderBy("doc_id")
    },

    // ── 64-bit SimHash near-dup pairs: pigeonhole banding at k=3 →
    //    4 blocks of 16 bits (block width 64/(k+1) keeps the bucket key
    //    space at 65k values; see simhash64NearDupPairs' posture note).
    //    The oracle forms the same candidate set declaratively on the
    //    bit-string form and the same exact hamming prune; pigeonhole
    //    makes both equal the full Hamming-ball pair set. ──
    QueryDef.sql(
      "dedup_simhash64_pairs", {
        val k = 3
        val bounds = Dedup.simhashBlockBounds(k + 1, 64)
        val bandEq = (0 until k + 1).map { i =>
          val (p, w) = (bounds(i) + 1, bounds(i + 1) - bounds(i))
          s"substr(a.simhash, $p, $w) = substr(b.simhash, $p, $w)"
        }.mkString(" OR ")
        val ham = (1 to 64).map(i =>
          s"(CASE WHEN substr(sa, $i, 1) <> substr(sb, $i, 1) THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH s AS ($duckSimhash64Bits),
           |c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |             a.simhash AS sa, b.simhash AS sb
           |      FROM s a JOIN s b ON a.doc_id < b.doc_id AND ($bandEq))
           |SELECT id_a, id_b, CAST($ham AS BIGINT) AS hamming
           |FROM c
           |WHERE $ham <= $k
           |ORDER BY id_a, id_b""".stripMargin
      }) {
      (s, d) =>
        Dedup.simhash64NearDupPairs(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text", maxHamming = 3)
          .orderBy("id_a", "id_b")
    },

    // ── 64-bit Hamming histogram at k=7 — the classic 8-blocks-of-8-bits
    //    banding, and the saturation evidence next to the 16-bit
    //    histogram: the same corpus that packs 1.57M pairs into the
    //    16-bit ball leaves the 64-bit ball holding only true
    //    near-duplicates (the fingerprint space stopped colliding). ──
    QueryDef.sql(
      "dedup_simhash64_histogram", {
        val k = 7
        val bounds = Dedup.simhashBlockBounds(k + 1, 64)
        val bandEq = (0 until k + 1).map { i =>
          val (p, w) = (bounds(i) + 1, bounds(i + 1) - bounds(i))
          s"substr(a.simhash, $p, $w) = substr(b.simhash, $p, $w)"
        }.mkString(" OR ")
        val ham = (1 to 64).map(i =>
          s"(CASE WHEN substr(sa, $i, 1) <> substr(sb, $i, 1) THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val hsums = (0 to k).map(v =>
          s"CAST(sum(CASE WHEN hd = $v THEN 1 ELSE 0 END) AS BIGINT) AS h$v")
          .mkString(",\n           |  ")
        s"""WITH s AS ($duckSimhash64Bits),
           |c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |             a.simhash AS sa, b.simhash AS sb
           |      FROM s a JOIN s b ON a.doc_id < b.doc_id AND ($bandEq)),
           |h AS (SELECT CAST($ham AS BIGINT) AS hd FROM c WHERE $ham <= $k)
           |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           |  $hsums
           |FROM h""".stripMargin
      }) {
      (s, d) =>
        val pairs = Dedup.simhash64NearDupPairs(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text", maxHamming = 7)
        def h(v: Int) = sum(when(col("hamming") === v, 1L).otherwise(0L)).as(s"h$v")
        pairs.agg(count(lit(1)).as("n_pairs"),
          h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7))
    },

    // ── n-gram Jaccard similarity scan vs a query document. ────────────
    QueryDef.sql(
      "dedup_jaccard_topk",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |s AS (SELECT doc_id, list_distinct(${duckShingles("ws", 3)}) AS shd FROM t),
         |q AS (SELECT shd AS qsh FROM s WHERE doc_id = 0)
         |SELECT s.doc_id, ${duckJaccard("s.shd", "q.qsh")} AS jaccard
         |FROM s, q WHERE s.doc_id <> 0
         |ORDER BY jaccard DESC, doc_id LIMIT 20""".stripMargin) {
      (s, d) =>
        val shd = array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d)).select(col("doc_id"), shd.as("shd"))
        val q = docs.filter(col("doc_id") === 0).select(col("shd").as("qsh"))
        docs.filter(col("doc_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("doc_id"),
            round(Dedup.jaccard(col("shd"), col("qsh")), 4).as("jaccard"))
          .orderBy(desc("jaccard"), asc("doc_id"))
          .limit(20)
    },

    // ── Banding RECALL against brute-force ground truth: every pair with
    //    true Jaccard ≥ 0.5 on a bounded slice (doc_id < 1000 — all-pairs
    //    is the MEASUREMENT, not the production path) vs the pairs the
    //    8-slot/4-band machinery surfaces. The one-row report is the
    //    empirical check of the S-curve numbers the LSH planner predicts.
    //    Measured recall is 1.0 tri-scale — honest reading: this corpus's
    //    near-dups are near-exact (j ≈ 1, where the curve saturates); the
    //    ~0.68-at-j=0.5 prediction would bite on borderline pairs the
    //    template pool doesn't generate;
    //    candidates surfaced but below threshold count as precision
    //    overhead, not recall. ──
    QueryDef.sql(
      "dedup_banding_recall",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents WHERE doc_id < 1000),
         |s AS (SELECT doc_id, list_distinct(${duckShingles("ws", 3)}) AS shd FROM t),
         |tp AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |       FROM s a JOIN s c ON a.doc_id < c.doc_id
         |       WHERE ${duckJaccard("a.shd", "c.shd")} >= 0.5),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |cp AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
         |       FROM b a JOIN b c USING (band_idx, band_hash)
         |       WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
         |fnd AS (SELECT tp.doc_a, tp.doc_b FROM tp JOIN cp USING (doc_a, doc_b))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM tp) AS n_true,
         |  (SELECT CAST(count(*) AS BIGINT) FROM cp) AS n_candidates,
         |  (SELECT CAST(count(*) AS BIGINT) FROM fnd) AS n_found,
         |  round((SELECT count(*) FROM fnd) /
         |        CAST(nullif((SELECT count(*) FROM tp), 0) AS DOUBLE), 4) AS recall""".stripMargin) {
      (s, d) =>
        // One pass, no checkpoints: the earlier form localCheckpoint'ed
        // truth/cand/sets and crossJoined three separate count aggregates,
        // so every invocation paid three eager materialization jobs (and
        // leaked their blocks) — the r09 bench billed that at 8× the warm
        // profile. truth and cand are each computed exactly once below:
        // flag them and FULL-OUTER join on the pair key, then one aggregate
        // reads n_true / n_candidates / n_found off the flags (sum skips
        // nulls; the product flag is non-null only where both sides hit).
        val slice = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).filter(col("doc_id") < 1000))
        val shd = array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))
        val sets = slice.select(col("doc_id"), shd.as("shd"))
        val truth = sets.as("a").join(sets.as("c"),
            col("a.doc_id") < col("c.doc_id"))
          .where(Dedup.jaccard(col("a.shd"), col("c.shd")) >= 0.5)
          .select(col("a.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"),
            lit(1L).as("is_true"))
        val cand = Dedup.lshCandidatePairs(slice, "doc_id", "text",
            shingleN = 3, k = 8, bands = 4)
          .select(col("doc_a"), col("doc_b"), lit(1L).as("is_cand"))
        truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
          .agg(
            coalesce(sum(col("is_true")), lit(0L)).as("n_true"),
            coalesce(sum(col("is_cand")), lit(0L)).as("n_candidates"),
            coalesce(sum(col("is_true") * col("is_cand")), lit(0L)).as("n_found"))
          .select(col("n_true"), col("n_candidates"), col("n_found"),
            round(col("n_found").cast("double") /
              when(col("n_true") === 0, lit(null)).otherwise(col("n_true")), 4)
              .as("recall"))
    },

    // ── Matryoshka retrieval funnel: coarse-rank the corpus on the
    //    FIRST 16 of 64 dims (the MRL prefix — a quarter of the IO and
    //    arithmetic), full-dim re-rank only the 50-row shortlist. The
    //    output carries both cosines, recording how much the coarse
    //    order lied. The final rank window runs over ≤ k rows. ──
    QueryDef.sql(
      "sim_mrl_topk",
      """WITH q AS (SELECT list_slice(embedding, 1, 16) AS qp, embedding AS qf
        |           FROM embeddings WHERE vec_id = 0),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
        |up AS (SELECT v.vec_id, unnest(list_slice(v.embedding, 1, 16)) AS x, unnest(q.qp) AS y FROM v, q),
        |sp AS (SELECT vec_id,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM up GROUP BY 1),
        |cp AS (SELECT vec_id, round(dot / sqrt(na * nb), 4) AS cos_prefix
        |       FROM sp WHERE na * nb > 0),
        |short AS (SELECT vec_id, cos_prefix FROM cp
        |          ORDER BY cos_prefix DESC, vec_id LIMIT 50),
        |uf AS (SELECT s.vec_id, s.cos_prefix, unnest(e.embedding) AS x, unnest(q.qf) AS y
        |       FROM short s JOIN embeddings e ON e.vec_id = s.vec_id, q),
        |sf AS (SELECT vec_id, cos_prefix,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM uf GROUP BY 1, 2),
        |cf AS (SELECT vec_id, cos_prefix, round(dot / sqrt(na * nb), 4) AS cos_full
        |       FROM sf WHERE na * nb > 0)
        |SELECT vec_id, cos_prefix, cos_full,
        |  CAST(row_number() OVER (ORDER BY cos_full DESC, vec_id) AS INTEGER) AS rank
        |FROM cf ORDER BY cos_full DESC, vec_id LIMIT 10""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.matryoshkaTopK(
            emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
            query = emb.filter(col("vec_id") === 0),
            prefixDims = 16, kCand = 50, k = 10)
          .orderBy("rank")
    },

    // ── Embedding near-dup pairs via sign-LSH buckets. ─────────────────
    QueryDef.sql(
      "sim_neardup_pairs", {
        val bucket = (1 to 6).map(i =>
          s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
        s"""WITH b AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
           |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.embedding AS ea, c.embedding AS eb
           |      FROM b a JOIN b c USING (bucket) WHERE a.vec_id < c.vec_id),
           |u AS (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM p),
           |s AS (SELECT id_a, id_b,
           |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
           |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
           |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
           |      FROM u GROUP BY 1, 2)
           |SELECT id_a, id_b, round(dot / sqrt(na * nb), 4) AS cos_sim
           |FROM s WHERE na * nb > 0 AND round(dot / sqrt(na * nb), 4) > 0.3
           |ORDER BY id_a, id_b""".stripMargin
      }) {
      (s, d) =>
        Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          p = 6, minCos = 0.3)
          .orderBy("id_a", "id_b")
    },

    // ── IVF (inverted-file) ANN probe: centroids 1..8, query vec 0. ────
    QueryDef.sql(
      "sim_ivf_topk",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8 OR vec_id = 0),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, round(dot / sqrt(na * nb), 4) AS sim,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |qc AS (SELECT cid FROM asg WHERE vec_id = 0),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |cand AS (SELECT a.vec_id FROM asg a, qc WHERE a.cid = qc.cid AND a.vec_id <> 0),
        |u2 AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(qv.qe) AS y
        |       FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, qv),
        |s2 AS (SELECT vec_id,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM u2 GROUP BY 1)
        |SELECT vec_id, round(dot / sqrt(na * nb), 4) AS cos_sim
        |FROM s2 WHERE na * nb > 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopK(
          emb.filter(col("vec_id") > 8),
          "vec_id", "embedding",
          centroids = emb.filter(col("vec_id").between(1, 8)),
          centroidIdCol = "vec_id",
          query = emb.filter(col("vec_id") === 0),
          k = 10)
    },

    // ── IVF-SQ8: float assignment picks the probed cluster, scoring runs
    //    on the int8 lattice — the composed production ANN shape (probe
    //    fraction × 4 less IO). Oracle chains the sim_ivf_topk assignment
    //    SQL with the sim_cosine_topk_int8 lattice. ──
    QueryDef.sql(
      "sim_ivf_topk_int8",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8 OR vec_id = 0),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |qc AS (SELECT cid FROM asg WHERE vec_id = 0),
        |z AS (SELECT vec_id, embedding,
        |        list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS maxabs
        |      FROM embeddings),
        |qz AS (SELECT vec_id,
        |        CASE WHEN maxabs > 0 THEN
        |          [GREATEST(-127.0, LEAST(127.0, FLOOR(127.0 * CAST(x AS DOUBLE) / maxabs + 0.5))) for x in embedding]
        |        ELSE [0.0 * CAST(x AS DOUBLE) for x in embedding] END AS q
        |      FROM z),
        |qv AS (SELECT q AS qe FROM qz WHERE vec_id = 0),
        |cand AS (SELECT a.vec_id FROM asg a, qc WHERE a.cid = qc.cid AND a.vec_id <> 0),
        |u2 AS (SELECT e.vec_id, unnest(e.q) AS x, unnest(qv.qe) AS y
        |       FROM qz e JOIN cand ON cand.vec_id = e.vec_id, qv),
        |s2 AS (SELECT vec_id, sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nb
        |       FROM u2 GROUP BY 1)
        |SELECT vec_id, round(dot / sqrt(na * nb), 4) AS cos_sim
        |FROM s2 WHERE na > 0 AND nb > 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopK(
          emb.filter(col("vec_id") > 8),
          "vec_id", "embedding",
          centroids = emb.filter(col("vec_id").between(1, 8)),
          centroidIdCol = "vec_id",
          query = emb.filter(col("vec_id") === 0),
          k = 10, scoreQuantized = true)
    },

    // ── Bulk k-NN join: the top-3 neighbors of EVERY vector through
    //    shared IVF cells (probe side explodes 2 cells, assigned side
    //    holds 1) — the semantic-dedup / hard-negative-mining primitive,
    //    sub-quadratic by cell construction. ──
    QueryDef.sql(
      "sim_knn_join",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id AS id_b, cid FROM r WHERE rn = 1),
        |qasg AS (SELECT vec_id AS id_a, cid FROM r WHERE rn <= 2),
        |p AS (SELECT id_a, id_b FROM qasg JOIN asg USING (cid) WHERE id_a <> id_b),
        |u2 AS (SELECT p.id_a, p.id_b, unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
        |       FROM p JOIN embeddings ea ON ea.vec_id = p.id_a
        |              JOIN embeddings eb ON eb.vec_id = p.id_b),
        |s2 AS (SELECT id_a, id_b,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM u2 GROUP BY 1, 2),
        |sc AS (SELECT id_a, id_b, round(dot / sqrt(na * nb), 4) AS cos_sim
        |       FROM s2 WHERE na * nb > 0),
        |rk AS (SELECT id_a, id_b, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos_sim DESC, id_b) AS INTEGER) AS rank
        |       FROM sc)
        |SELECT id_a, id_b, cos_sim, rank FROM rk WHERE rank <= 3
        |ORDER BY id_a, rank""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.knnJoin(
            emb.filter(col("vec_id") > 8), "vec_id", "embedding",
            centroids = emb.filter(col("vec_id").between(1, 8)),
            centroidIdCol = "vec_id", k = 3, probes = 2)
          .orderBy("id_a", "rank")
    },

    // ── Hard-negative mining: per query, top-k corpus rows whose cosine
    //    sits INSIDE (0.30, 0.85] — above is a positive/near-dup (useless
    //    or harmful as a negative), below is an easy negative the model
    //    already separates. Same cell-bucketed candidate join + bounded
    //    heap as sim_knn_join; the band filters map-side before the heap,
    //    so rank is dense within the band. Queries = vec_id > 8 ∧ ≡ 0
    //    (mod 50); corpus = the rest; centroids 1..8 as elsewhere. ──
    QueryDef.sql(
      "sim_hard_negatives",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8 AND vec_id % 50 = 0),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8 AND vec_id % 50 <> 0),
        |ub AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |sb AS (SELECT vec_id, cid,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM ub GROUP BY 1, 2),
        |asg AS (SELECT vec_id AS id_b, cid FROM (
        |          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |            ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn FROM sb) WHERE rn = 1),
        |ua AS (SELECT q.vec_id, c.cid, unnest(q.embedding) AS x, unnest(c.cv) AS y FROM q, c),
        |sa AS (SELECT vec_id, cid,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM ua GROUP BY 1, 2),
        |qasg AS (SELECT vec_id AS id_a, cid FROM (
        |           SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn FROM sa) WHERE rn <= 2),
        |p AS (SELECT id_a, id_b FROM qasg JOIN asg USING (cid) WHERE id_a <> id_b),
        |u2 AS (SELECT p.id_a, p.id_b, unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
        |       FROM p JOIN embeddings ea ON ea.vec_id = p.id_a
        |              JOIN embeddings eb ON eb.vec_id = p.id_b),
        |s2 AS (SELECT id_a, id_b,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM u2 GROUP BY 1, 2),
        |sc AS (SELECT id_a, id_b, round(dot / sqrt(na * nb), 4) AS cos_sim
        |       FROM s2 WHERE na * nb > 0),
        |bd AS (SELECT * FROM sc WHERE cos_sim > 0.30 AND cos_sim <= 0.85),
        |rk AS (SELECT id_a, id_b, cos_sim,
        |         CAST(row_number() OVER (PARTITION BY id_a ORDER BY cos_sim DESC, id_b) AS INTEGER) AS rank
        |       FROM bd)
        |SELECT id_a, id_b, cos_sim, rank FROM rk WHERE rank <= 5
        |ORDER BY id_a, rank""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val pool = emb.filter(col("vec_id") > 8)
        Similarity.hardNegatives(
            queries = pool.filter(col("vec_id") % 50 === 0),
            corpus = pool.filter(col("vec_id") % 50 =!= 0),
            "vec_id", "embedding",
            centroids = emb.filter(col("vec_id").between(1, 8)),
            centroidIdCol = "vec_id",
            k = 5, bandLo = 0.30, bandHi = 0.85, probes = 2)
          .orderBy("id_a", "rank")
    },

    // ── IVF-PQ: the canonical billion-vector composition — float
    //    assignment picks the probed cells (same CTE as sim_ivf_topk),
    //    PQ codes score the probed fraction (same lattice as
    //    sim_pq_adc_topk, codebook rows 9..24 so it never overlaps the
    //    IVF centroids 1..8). ──
    QueryDef.sql(
      "sim_ivf_pq_topk",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 24 OR vec_id = 0),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |qc AS (SELECT cid FROM asg WHERE vec_id = 0),
        |cand AS (SELECT a.vec_id FROM asg a, qc WHERE a.cid = qc.cid AND a.vec_id <> 0),
        |cb AS (SELECT vec_id - 9 AS code, embedding AS cv2 FROM embeddings WHERE vec_id BETWEEN 9 AND 24),
        |js AS (SELECT CAST(range AS INT) AS j FROM range(8)),
        |u2 AS (SELECT e.vec_id, js.j, cb.code,
        |        unnest(list_slice(e.embedding, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cb.cv2, js.j*8+1, js.j*8+8)) AS y
        |      FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, js, cb),
        |d2 AS (SELECT vec_id, j, code,
        |        round(sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 4) AS l2
        |      FROM u2 GROUP BY 1, 2, 3),
        |pasg AS (SELECT vec_id, j, code FROM (
        |           SELECT vec_id, j, code,
        |             row_number() OVER (PARTITION BY vec_id, j ORDER BY l2, code) AS rn FROM d2)
        |         WHERE rn = 1),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |lu AS (SELECT js.j, cb.code,
        |        unnest(list_slice(qv.qe, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cb.cv2, js.j*8+1, js.j*8+8)) AS y
        |      FROM qv, js, cb),
        |lut AS (SELECT j, code, round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS term
        |        FROM lu GROUP BY 1, 2)
        |SELECT pa.vec_id, round(sum(l.term), 4) AS adc_score
        |FROM pasg pa JOIN lut l ON pa.j = l.j AND pa.code = l.code
        |GROUP BY 1
        |ORDER BY adc_score DESC, pa.vec_id LIMIT 10""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val seedRows = emb.filter(col("vec_id").between(9, 24)).orderBy("vec_id")
          .select(col("embedding").cast("array<float>"))
          .collect().map(_.getSeq[Float](0).toSeq).toSeq
        Similarity.ivfTopK(
          emb.filter(col("vec_id") > 24), "vec_id", "embedding",
          centroids = emb.filter(col("vec_id").between(1, 8)),
          centroidIdCol = "vec_id",
          query = emb.filter(col("vec_id") === 0),
          k = 10,
          pqCodebooks = Some(Similarity.pqCodebooksFromRows(seedRows, m = 8)))
    },

    // ── BATCHED IVF: a query SET (vecs 0-3) against one corpus scan,
    //    probes=2, per-query top-5. Probe lists and query vectors ride
    //    the broadcast as columns; per-query top-k dies in the bounded
    //    heap. The oracle replays assignment + probing + ranking per
    //    query with window functions. ──────────────────────────────────
    QueryDef.sql(
      "sim_ivf_batch",
      ivfBatchOracle(probes = 2, k = 5)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopKBatch(
          emb.filter(col("vec_id") > 8), "vec_id", "embedding",
          centroids = emb.filter(col("vec_id").between(1, 8)),
          centroidIdCol = "vec_id",
          queries = emb.filter(col("vec_id") < 4), queryIdCol = "vec_id",
          k = 5, probes = 2)
          .orderBy("query_id", "rank")
    },

    // ── STORED-INDEX IVF: centroids are published into a TableStore as
    //    a named, versioned index object (one metastate commit flips the
    //    pointer), and the query routes through VectorIndex.load — no
    //    per-call training or corpus-side centroid collect. Same oracle
    //    construction as sim_ivf_batch with probes=1/k=8: the stored
    //    artifact must change nothing about the answer. ────────────────
    QueryDef.sql(
      "sim_ivf_stored",
      ivfBatchOracle(probes = 1, k = 8)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val store = storedIndex("ivf", d, s) { st =>
          graft.ingest.VectorIndex.publish(st, "driver",
            emb.filter(col("vec_id").between(1, 8)).select(col("vec_id"), col("embedding")))
        }
        graft.ingest.VectorIndex.ivfTopKBatch(store, "driver",
          emb.filter(col("vec_id") > 8), "vec_id", "embedding",
          queries = emb.filter(col("vec_id") < 4), queryIdCol = "vec_id",
          k = 8, probes = 1)
          .orderBy("query_id", "rank")
    },

    // ── INCREMENTALLY APPENDED INDEX (the daily-ingest lifecycle): the
    //    corpus arrives in TWO batches, each encoded ONLY once under the
    //    published centroids and registered as an immutable delta
    //    segment (one atomic metastate commit per append); the query
    //    scans the segment UNION's stored cell assignments — no row is
    //    ever re-encoded, and the answer must equal one-shot assignment
    //    over the whole corpus (same centroids ⇒ same cells), which is
    //    exactly what the oracle computes. ─────────────────────────────
    QueryDef.sql(
      "sim_ivf_appended",
      ivfBatchOracle(probes = 2, k = 7)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val store = storedIndex("ivfapp", d, s) { st =>
          graft.ingest.VectorIndex.publish(st, "inc",
            emb.filter(col("vec_id").between(1, 8)).select(col("vec_id"), col("embedding")))
          graft.ingest.VectorIndex.appendCorpus(st, "inc",
            emb.filter(col("vec_id") > 8 && col("vec_id") % 2 === 0),
            "vec_id", "embedding")
          graft.ingest.VectorIndex.appendCorpus(st, "inc",
            emb.filter(col("vec_id") > 8 && col("vec_id") % 2 === 1),
            "vec_id", "embedding")
        }
        graft.ingest.VectorIndex.ivfSegmentsTopKBatch(store, "inc",
          emb.filter(col("vec_id") < 4), "vec_id", "embedding",
          k = 7, probes = 2, outIdCol = "vec_id")
          .orderBy("query_id", "rank")
    },

    // ── SEMANTIC decontamination: per corpus vector, max cosine to any
    //    eval-set vector + threshold flag — the embedding-space twin of
    //    pipeline_decontaminate (n-gram overlap misses paraphrases). The
    //    eval side broadcasts; the max dies map-side. ──
    QueryDef.sql(
      "pipeline_decontaminate_semantic",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 6),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 16),
        |u AS (SELECT v.vec_id, q.qid, unnest(v.embedding) AS x, unnest(q.qe) AS y FROM v, q),
        |s AS (SELECT vec_id, qid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |c AS (SELECT vec_id, max(round(dot / sqrt(na * nb), 4)) AS max_eval_sim
        |      FROM s WHERE na * nb > 0 GROUP BY 1)
        |SELECT v.vec_id, c.max_eval_sim,
        |       coalesce(c.max_eval_sim >= 0.3, FALSE) AS contaminated
        |FROM v LEFT JOIN c ON v.vec_id = c.vec_id ORDER BY v.vec_id""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.semanticContamination(
          emb.filter(col("vec_id") > 16), "vec_id", "embedding",
          evalSet = emb.filter(col("vec_id") < 6), threshold = 0.3)
          .orderBy("vec_id")
    },

    // ── INCREMENTALLY APPENDED PQ INDEX: same lifecycle as
    //    sim_ivf_appended but through the code tier — two appends encode
    //    only their delta into (id, cid, codes) segments under the
    //    published centroids+codebooks, and the batched ADC query scans
    //    the segment union's codes (never the float vectors). The oracle
    //    is the same merged IVF+PQ construction as sim_pq_stored_codes
    //    (k=5, probes=1 distinguishes it): stored-vs-appended must
    //    change nothing about the answer. ──────────────────────────────
    QueryDef.sql(
      "sim_pq_appended",
      pqStoredOracle(probes = 1, k = 5)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val store = storedIndex("pqapp", d, s) { st =>
          val seedRows = emb.filter(col("vec_id").between(1, 16)).orderBy("vec_id")
            .select(col("embedding").cast("array<float>"))
            .collect().map(_.getSeq[Float](0).toSeq).toSeq
          graft.ingest.VectorIndex.publish(st, "pqinc",
            emb.filter(col("vec_id").between(1, 8)).select(col("vec_id"), col("embedding")),
            Some(Similarity.pqCodebooksFromRows(seedRows, m = 8)))
          graft.ingest.VectorIndex.appendCorpus(st, "pqinc",
            emb.filter(col("vec_id") > 16 && col("vec_id") % 2 === 0),
            "vec_id", "embedding")
          graft.ingest.VectorIndex.appendCorpus(st, "pqinc",
            emb.filter(col("vec_id") > 16 && col("vec_id") % 2 === 1),
            "vec_id", "embedding")
        }
        graft.ingest.VectorIndex.ivfSegmentsTopKBatch(store, "pqinc",
          emb.filter(col("vec_id") < 4), "vec_id", "embedding",
          k = 5, probes = 1, outIdCol = "id")
          .orderBy("query_id", "rank")
    },

    // ── BATCHED full-scan ADC: every query's LUT is DATA (PQAdcLut →
    //    broadcast), scored against one pass over the code column
    //    (PQADCScoreDyn) — N queries, one corpus scan, no per-query
    //    plan. Same codebooks and lattice as sim_pq_adc_topk. ──────────
    QueryDef.sql(
      "sim_pq_adc_batch",
      """WITH cb AS (SELECT vec_id - 1 AS code, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
        |js AS (SELECT CAST(range AS INT) AS j FROM range(8)),
        |corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 16),
        |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4),
        |u AS (SELECT c.vec_id, js.j, cb.code,
        |        unnest(list_slice(c.embedding, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS y
        |      FROM corpus c, js, cb),
        |d AS (SELECT vec_id, j, code,
        |        round(sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 4) AS l2
        |      FROM u GROUP BY 1, 2, 3),
        |asg AS (SELECT vec_id, j, code FROM (
        |          SELECT vec_id, j, code,
        |            row_number() OVER (PARTITION BY vec_id, j ORDER BY l2, code) AS rn FROM d)
        |        WHERE rn = 1),
        |lu AS (SELECT q.qid, js.j, cb.code,
        |        unnest(list_slice(q.qe, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS y
        |      FROM q, js, cb),
        |lut AS (SELECT qid, j, code, round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS term
        |        FROM lu GROUP BY 1, 2, 3),
        |sc AS (SELECT l.qid, a.vec_id, round(sum(l.term), 4) AS adc_score
        |       FROM asg a JOIN lut l ON a.j = l.j AND a.code = l.code
        |       GROUP BY 1, 2),
        |rk AS (SELECT qid, vec_id, adc_score,
        |        row_number() OVER (PARTITION BY qid ORDER BY adc_score DESC, vec_id) AS rn
        |       FROM sc)
        |SELECT qid AS query_id, vec_id, adc_score, CAST(rn AS INT) AS "rank"
        |FROM rk WHERE rn <= 10 ORDER BY query_id, "rank"""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val seedRows = emb.filter(col("vec_id").between(1, 16)).orderBy("vec_id")
          .select(col("embedding").cast("array<float>"))
          .collect().map(_.getSeq[Float](0).toSeq).toSeq
        Similarity.pqAdcTopKBatch(
          emb.filter(col("vec_id") > 16), "vec_id", "embedding",
          Similarity.pqCodebooksFromRows(seedRows, m = 8),
          queries = emb.filter(col("vec_id") < 4), queryIdCol = "vec_id",
          k = 10)
          .orderBy("query_id", "rank")
    },

    // ── STORED CODE TABLE (the billion-vector serving layout): the
    //    corpus is encoded ONCE into an (id, cid, codes) parquet tied to
    //    the published index version, and the batched query path scans
    //    m-byte codes only — the float vectors are never read at query
    //    time (spec-asserted on ReadSchema). Oracle merges the IVF
    //    assignment and PQ code constructions. ─────────────────────────
    QueryDef.sql(
      "sim_pq_stored_codes",
      pqStoredOracle(probes = 2, k = 6)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val store = storedIndex("pq", d, s) { st =>
          val seedRows = emb.filter(col("vec_id").between(1, 16)).orderBy("vec_id")
            .select(col("embedding").cast("array<float>"))
            .collect().map(_.getSeq[Float](0).toSeq).toSeq
          graft.ingest.VectorIndex.publish(st, "pq",
            emb.filter(col("vec_id").between(1, 8)).select(col("vec_id"), col("embedding")),
            Some(Similarity.pqCodebooksFromRows(seedRows, m = 8)))
          graft.ingest.VectorIndex.encodeCorpus(st, "pq",
            emb.filter(col("vec_id") > 16), "vec_id", "embedding")
        }
        graft.ingest.VectorIndex.scanCodesTopKBatch(store, "pq",
          emb.filter(col("vec_id") < 4), "vec_id", "embedding", k = 6, probes = 2)
          .orderBy("query_id", "rank")
    },

    // ── PQ/ADC: the compression tier (m=8 bytes per vector, 32× vs
    //    float32). Codebooks are the first 16 corpus rows sliced into 8
    //    subspaces (deterministic + SQL-expressible, so the WHOLE
    //    encode→LUT→scan path is oracle-pinned); query vec 0 scans the
    //    codes with its precomputed LUT. trainPqCodebooks is the quality
    //    path (PQSpec pins it beats seeds); this query pins mechanics. ──
    QueryDef.sql(
      "sim_pq_adc_topk",
      """WITH cb AS (SELECT vec_id - 1 AS code, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
        |js AS (SELECT CAST(range AS INT) AS j FROM range(8)),
        |corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 16),
        |u AS (SELECT c.vec_id, js.j, cb.code,
        |        unnest(list_slice(c.embedding, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS y
        |      FROM corpus c, js, cb),
        |d AS (SELECT vec_id, j, code,
        |        round(sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 4) AS l2
        |      FROM u GROUP BY 1, 2, 3),
        |asg AS (SELECT vec_id, j, code FROM (
        |          SELECT vec_id, j, code,
        |            row_number() OVER (PARTITION BY vec_id, j ORDER BY l2, code) AS rn FROM d)
        |        WHERE rn = 1),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |lu AS (SELECT js.j, cb.code,
        |        unnest(list_slice(qv.qe, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS y
        |      FROM qv, js, cb),
        |lut AS (SELECT j, code, round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS term
        |        FROM lu GROUP BY 1, 2)
        |SELECT a.vec_id, round(sum(l.term), 4) AS adc_score
        |FROM asg a JOIN lut l ON a.j = l.j AND a.code = l.code
        |GROUP BY a.vec_id
        |ORDER BY adc_score DESC, a.vec_id LIMIT 20""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val seedRows = emb.filter(col("vec_id").between(1, 16)).orderBy("vec_id")
          .select(col("embedding").cast("array<float>"))
          .collect().map(_.getSeq[Float](0).toSeq).toSeq
        Similarity.pqAdcTopK(
          emb.filter(col("vec_id") > 16), "vec_id", "embedding",
          Similarity.pqCodebooksFromRows(seedRows, m = 8),
          query = emb.filter(col("vec_id") === 0), k = 20)
    },

    // ── PQ quantization recall: |ADC top-20 ∩ EXACT-dot top-20| / 20 —
    //    the compression-quality number a PQ deployment monitors, the
    //    code-tier sibling of sim_ann_recall. Exact side is the DOT
    //    product (what ADC approximates), so the number isolates
    //    quantization loss, not metric mismatch. ──
    QueryDef.sql(
      "sim_pq_recall",
      """WITH cb AS (SELECT vec_id - 1 AS code, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
        |js AS (SELECT CAST(range AS INT) AS j FROM range(8)),
        |corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 16),
        |u AS (SELECT c.vec_id, js.j, cb.code,
        |        unnest(list_slice(c.embedding, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS y
        |      FROM corpus c, js, cb),
        |d AS (SELECT vec_id, j, code,
        |        round(sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 4) AS l2
        |      FROM u GROUP BY 1, 2, 3),
        |asg AS (SELECT vec_id, j, code FROM (
        |          SELECT vec_id, j, code,
        |            row_number() OVER (PARTITION BY vec_id, j ORDER BY l2, code) AS rn FROM d)
        |        WHERE rn = 1),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |lu AS (SELECT js.j, cb.code,
        |        unnest(list_slice(qv.qe, js.j*8+1, js.j*8+8)) AS x,
        |        unnest(list_slice(cb.cv, js.j*8+1, js.j*8+8)) AS y
        |      FROM qv, js, cb),
        |lut AS (SELECT j, code, round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS term
        |        FROM lu GROUP BY 1, 2),
        |adc AS (SELECT a.vec_id FROM (
        |          SELECT a.vec_id, round(sum(l.term), 4) AS adc_score
        |          FROM asg a JOIN lut l ON a.j = l.j AND a.code = l.code
        |          GROUP BY a.vec_id ORDER BY adc_score DESC, a.vec_id LIMIT 20) a),
        |ue AS (SELECT c.vec_id, unnest(c.embedding) AS x, unnest(qv.qe) AS y FROM corpus c, qv),
        |ex AS (SELECT vec_id FROM (
        |         SELECT vec_id, round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 4) AS dot
        |         FROM ue GROUP BY vec_id ORDER BY dot DESC, vec_id LIMIT 20))
        |SELECT CAST(20 AS BIGINT) AS k,
        |  CAST(count(a.vec_id) AS BIGINT) AS n_overlap,
        |  round(count(a.vec_id) / 20.0, 4) AS recall
        |FROM ex e LEFT JOIN adc a ON a.vec_id = e.vec_id""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val corpus = emb.filter(col("vec_id") > 16)
        val query = emb.filter(col("vec_id") === 0)
        val seedRows = emb.filter(col("vec_id").between(1, 16)).orderBy("vec_id")
          .select(col("embedding").cast("array<float>"))
          .collect().map(_.getSeq[Float](0).toSeq).toSeq
        val adc = Similarity.pqAdcTopK(corpus, "vec_id", "embedding",
            Similarity.pqCodebooksFromRows(seedRows, m = 8), query, k = 20)
          .select(col("vec_id").as("adc_hit"))
        val exact = corpus.crossJoin(broadcast(query.select(col("embedding").as("_q"))))
          .select(col("vec_id"),
            round(graft.expressions.VectorExpressions.vectorDot(col("embedding"), col("_q")), 4)
              .as("_dot"))
          .filter(col("_dot").isNotNull)
          .orderBy(desc("_dot"), asc("vec_id")).limit(20)
          .select("vec_id")
        exact.join(adc, exact("vec_id") === adc("adc_hit"), "left_outer")
          .agg(lit(20L).as("k"),
            count(col("adc_hit")).as("n_overlap"),
            round(count(col("adc_hit")).cast("double") / 20.0, 4).as("recall"))
    },

    // ── Media EXACT dedup: content-hash over the binary column (the
    //    image/audio twin of dedup_exact — byte-identical assets recur
    //    massively in web crawls; md5-of-blob groups them engine-
    //    portably). Keep = min id per hash; one partial-agg shuffle on
    //    the hash, no binary payload travels (hash computed map-side). ──
    QueryDef.sql(
      "mm_exact_dedup",
      """SELECT md5(coalesce(text, '')) AS content_hash,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(min(doc_id) AS BIGINT) AS keep_id
        |FROM documents
        |GROUP BY 1 ORDER BY content_hash""".stripMargin) {
      // oracle hashes the VARCHAR (DuckDB md5 has no BLOB overload); the
      // bytes are identical because the blob IS the text's UTF-8
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            md5(encode(coalesce(col("text"), lit("")), "UTF-8")).as("content_hash"))
          .groupBy("content_hash")
          .agg(count(lit(1)).as("n_copies"), min("doc_id").cast("long").as("keep_id"))
          .orderBy("content_hash")
    },

    // ── Multimodal metadata: opaque binary + typed metadata columns. ───
    QueryDef.sql(
      "mm_binary_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  lower(substr(hex(encode(text)), 1, 8)) AS format_sig,
        |  CAST(1 + octet_length(encode(text)) % 30 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val blob = encode(col("text"), "UTF-8")
        Tables.documents(s, d)
          .select(col("doc_id"),
            length(blob).cast("long").as("byte_len"),
            lower(hex(substring(blob, 1, 4))).as("format_sig"),
            (lit(1) + length(blob) % 30).cast("int").as("n_frames"))
          .orderBy("doc_id")
    },

    // ── Multimodal decode stage with a REAL oracle: the stub codec is
    //    deterministic byte arithmetic, so the mapPartitions output is
    //    pinned bit-for-bit against DuckDB hex arithmetic — the decode
    //    PLUMBING (schema, per-partition batch shape, null handling) is
    //    what's under test; a real codec replaces only stubDecode's body. ──
    QueryDef.sql(
      "mm_decode_meta",
      """WITH b AS (SELECT doc_id, encode(coalesce(text, '')) AS blob FROM documents),
        |h AS (SELECT doc_id, octet_length(blob) AS len, hex(blob) AS hx FROM b),
        |v AS (SELECT doc_id, len,
        |        CASE WHEN len > 0 THEN 16*(strpos('0123456789ABCDEF', substr(hx,1,1))-1)
        |               + (strpos('0123456789ABCDEF', substr(hx,2,1))-1) ELSE 0 END AS b0,
        |        CASE WHEN len > 1 THEN 16*(strpos('0123456789ABCDEF', substr(hx,3,1))-1)
        |               + (strpos('0123456789ABCDEF', substr(hx,4,1))-1) ELSE 0 END AS b1,
        |        lower(substr(hx, 1, 8)) AS format_sig
        |      FROM h)
        |SELECT doc_id, CAST(len AS BIGINT) AS byte_len, format_sig,
        |  CAST(16 + (b0 % 64) * 16 AS INT) AS width,
        |  CAST(16 + (b1 % 64) * 16 AS INT) AS height,
        |  CAST(1 + len % 30 AS INT) AS n_frames
        |FROM v ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val media = Tables.documents(s, d)
          .select(col("doc_id"), encode(coalesce(col("text"), lit("")), "UTF-8").as("blob"))
        Multimodal.decodeMeta(media, "doc_id", "blob", sniff = false)
          .select(col("media_id").as("doc_id"), col("byte_len"), col("format_sig"),
            col("width"), col("height"), col("n_frames"))
          .orderBy("doc_id")
    },

    // ── Multimodal decode + feature pipeline (mapPartitions batch shape)
    //    with a REAL oracle: the stub features are an L1-normalized byte
    //    histogram, so the query de-normalizes back to integer bucket
    //    counts (features[i] · max(byte_len,1), exact to ±1 ulp, rounded)
    //    and DuckDB recomputes the same counts from hex arithmetic.
    //    Integer counts are engine-portable where 4-decimal rounding of
    //    the ratios is not (half-up vs banker's tie hazard). ─────────────
    QueryDef.sql(
      "mm_decode_features", {
        val countCols = (0 until 8).map(i =>
          s"CAST(coalesce(c$i, 0) AS BIGINT) AS c$i").mkString(", ")
        val sums = (0 until 8).map(i =>
          s"sum(CASE WHEN bkt = $i THEN 1 ELSE 0 END) AS c$i").mkString(", ")
        s"""WITH b AS (SELECT doc_id, encode(coalesce(text, '')) AS blob FROM documents),
           |h AS (SELECT doc_id, octet_length(blob) AS len, hex(blob) AS hx FROM b),
           |m AS (SELECT doc_id, len, lower(substr(hx, 1, 8)) AS format_sig,
           |        CASE WHEN len > 0 THEN 16*(strpos('0123456789ABCDEF', substr(hx,1,1))-1)
           |               + (strpos('0123456789ABCDEF', substr(hx,2,1))-1) ELSE 0 END AS b0,
           |        CASE WHEN len > 1 THEN 16*(strpos('0123456789ABCDEF', substr(hx,3,1))-1)
           |               + (strpos('0123456789ABCDEF', substr(hx,4,1))-1) ELSE 0 END AS b1
           |      FROM h),
           |u AS (SELECT doc_id, unnest(range(1, len + 1)) AS j, hx FROM h),
           |k AS (SELECT doc_id,
           |        (strpos('0123456789ABCDEF', substr(hx, 2*j, 1)) - 1) % 8 AS bkt
           |      FROM u),
           |c AS (SELECT doc_id, $sums FROM k GROUP BY doc_id)
           |SELECT m.doc_id, CAST(len AS BIGINT) AS byte_len, format_sig,
           |  CAST(16 + (b0 % 64) * 16 AS INT) AS width,
           |  CAST(16 + (b1 % 64) * 16 AS INT) AS height,
           |  CAST(1 + len % 30 AS INT) AS n_frames,
           |  $countCols
           |FROM m LEFT JOIN c USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      }) {
      (s, d) =>
        val media = Tables.documents(s, d)
          .select(col("doc_id"), encode(coalesce(col("text"), lit("")), "UTF-8").as("blob"))
        val meta = Multimodal.decodeMeta(media, "doc_id", "blob", sniff = false)
        val feats = Multimodal.extractFeatures(media, "doc_id", "blob")
        val total = greatest(col("byte_len"), lit(1L)).cast("double")
        val counts = (0 until 8).map(i =>
          round(element_at(col("features"), i + 1) * total).cast("long").as(s"c$i"))
        meta.join(feats, "media_id")
          .select(Seq(col("media_id").as("doc_id"), col("byte_len"), col("format_sig"),
            col("width"), col("height"), col("n_frames")) ++ counts: _*)
          .orderBy("doc_id")
    },

    // ── Frame sampling: every stride-th frame index per media row — the
    //    explode shape of a video pipeline, pinned by a DuckDB range
    //    oracle (Spark sequence is stop-INCLUSIVE, DuckDB range is
    //    stop-EXCLUSIVE: sequence(0, n-1, s) ≡ range(0, n, s)). ──────────
    QueryDef.sql(
      "mm_frame_sample",
      """WITH b AS (SELECT doc_id, octet_length(encode(coalesce(text, ''))) AS len FROM documents),
        |f AS (SELECT doc_id, CAST(1 + len % 30 AS INT) AS n_frames FROM b),
        |x AS (SELECT doc_id, n_frames, unnest(range(0, n_frames, 3)) AS fi FROM f)
        |SELECT doc_id, n_frames, CAST(fi AS INT) AS frame_idx
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin) {
      (s, d) =>
        val media = Tables.documents(s, d)
          .select(col("doc_id"), encode(coalesce(col("text"), lit("")), "UTF-8").as("blob"))
        val meta = Multimodal.decodeMeta(media, "doc_id", "blob", sniff = false)
        Multimodal.sampleFrames(meta, stride = 3)
          .select(col("media_id").as("doc_id"), col("n_frames"), col("frame_idx"))
          .orderBy("doc_id", "frame_idx")
    },

    // ── REAL container decode, closed-loop: build genuine PNG/JPEG/GIF/
    //    WAV blobs whose header fields are pure doc_id arithmetic
    //    (graft.codec.MediaFixtures), parse them with the real header
    //    parsers (graft.codec.MediaHeaders via decodeMeta), and let DuckDB
    //    compute the expected fields from the same arithmetic WITHOUT
    //    parsing — any endianness/offset bug in builder or parser breaks
    //    the hash. ──────────────────────────────────────────────────────
    QueryDef.sql(
      "mm_real_decode",
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif' ELSE 'wav' END AS format,
        |  CASE WHEN doc_id % 4 < 3 THEN CAST(1 + doc_id % 640 AS INT) END AS width,
        |  CASE WHEN doc_id % 4 < 3 THEN CAST(1 + doc_id % 480 AS INT) END AS height,
        |  CAST(CASE doc_id % 4 WHEN 2 THEN 1 + doc_id % 3 WHEN 3 THEN 1 + doc_id % 50 ELSE 1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 4 = 3 THEN 16 ELSE 8 END AS INT) AS bit_depth,
        |  CASE doc_id % 4 WHEN 0 THEN CAST(3 AS INT) WHEN 1 THEN CAST(3 AS INT)
        |       WHEN 3 THEN CAST(1 + doc_id % 2 AS INT) END AS channels,
        |  CASE WHEN doc_id % 4 = 3 THEN CAST(8000 * (1 + doc_id % 5) AS INT) END AS sample_rate,
        |  CASE WHEN doc_id % 4 = 3
        |       THEN CAST((1 + doc_id % 50) * 1000 // (8000 * (1 + doc_id % 5)) AS BIGINT) END AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.MediaFixtures.build(id))))
          .toDF("doc_id", "blob")
        Multimodal.decodeMeta(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("format"), col("width"),
            col("height"), col("n_frames"), col("bit_depth"), col("channels"),
            col("sample_rate"), col("duration_ms"))
          .orderBy("doc_id")
    },

    // ── Bounded-box thumbnail planning + stub resample over the REAL
    //    containers: aspect-preserving dims by exact cross-product
    //    compare (w·maxH ≥ h·maxW — no float ratio), no upscaling,
    //    audio rows pass through null; the resample itself is a marked
    //    stub behind the one-init-per-partition batch shape, but the
    //    byte sizing (out_w·out_h) is real and the oracle re-derives
    //    dims + sizing from the fixture arithmetic without parsing. ──
    QueryDef.sql(
      "mm_resize_plan",
      """WITH f AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 < 3 THEN CAST(1 + doc_id % 640 AS BIGINT) END AS w,
        |    CASE WHEN doc_id % 4 < 3 THEN CAST(1 + doc_id % 480 AS BIGINT) END AS h
        |  FROM documents),
        |r AS (SELECT doc_id, w, h,
        |    CASE WHEN w IS NULL THEN NULL
        |         WHEN w <= 64 AND h <= 48 THEN w
        |         WHEN w * 48 >= h * 64 THEN 64
        |         ELSE greatest((w * 48) // h, 1) END AS ow,
        |    CASE WHEN w IS NULL THEN NULL
        |         WHEN w <= 64 AND h <= 48 THEN h
        |         WHEN w * 48 >= h * 64 THEN greatest((h * 64) // w, 1)
        |         ELSE 48 END AS oh
        |  FROM f)
        |SELECT doc_id, CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
        |  CAST(ow * oh AS BIGINT) AS thumb_bytes
        |FROM r ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.MediaFixtures.build(id))))
          .toDF("doc_id", "blob")
        val meta = Multimodal.decodeMeta(blobs, "doc_id", "blob")
        Multimodal.resizeStub(meta, maxW = 64, maxH = 48)
          .select(col("media_id").as("doc_id"), col("out_w"), col("out_h"),
            length(col("thumb")).cast("long").as("thumb_bytes"))
          .orderBy("doc_id")
    },

    // ── Audio resample planning over the REAL WAV containers — the
    //    resizeDims twin for the audio modality: out samples for a 16 kHz
    //    target in exact truncating integer arithmetic, out bytes under
    //    16-bit PCM; image/video rows pass through null. Oracle
    //    re-derives everything from the fixture arithmetic. ──
    QueryDef.sql(
      "mm_audio_resample_plan",
      """WITH f AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 3 THEN CAST(8000 * (1 + doc_id % 5) AS BIGINT) END AS rate,
        |    CASE WHEN doc_id % 4 = 3 THEN CAST(1 + doc_id % 2 AS BIGINT) END AS ch,
        |    CASE WHEN doc_id % 4 = 3 THEN CAST(1 + doc_id % 50 AS BIGINT) END AS ns
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(rate AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
        |  ns AS in_samples, CAST(16000 AS INT) AS out_rate,
        |  (ns * 16000) // rate AS out_samples,
        |  ((ns * 16000) // rate) * ch * 2 AS out_bytes
        |FROM f ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.MediaFixtures.build(id))))
          .toDF("doc_id", "blob")
        Multimodal.resamplePlan(Multimodal.decodeMeta(blobs, "doc_id", "blob"),
            targetRate = 16000)
          .select(col("media_id").as("doc_id"), col("sample_rate"), col("channels"),
            col("in_samples"), col("out_rate"), col("out_samples"), col("out_bytes"))
          .orderBy("doc_id")
    },

    // ── REAL PCM decode + resample — the execution of the plan above:
    //    the WAV fixtures carry genuine 16-bit PCM whose sample values
    //    are pure seed arithmetic (MediaFixtures.pcmSample), Spark
    //    decodes the actual data-chunk BYTES and linear-interpolates to
    //    16 kHz in exact integer arithmetic, and DuckDB recomputes the
    //    whole resampled stream from the arithmetic without touching a
    //    byte — count/sum/min/max/first/last per (media, channel) pin
    //    every decoded sample and every interpolation step. Any
    //    endianness, interleave, offset, or rounding bug breaks the
    //    hash. ──
    QueryDef.sql(
      "mm_pcm_resample",
      """WITH f AS (SELECT doc_id,
        |    CAST(8000 * (1 + doc_id % 5) AS BIGINT) AS rate,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS nch,
        |    CAST(1 + doc_id % 50 AS BIGINT) AS ns
        |  FROM documents WHERE doc_id % 4 = 3),
        |cc AS (SELECT doc_id, rate, ns, unnest(range(0, nch)) AS c FROM f),
        |o AS (SELECT doc_id, rate, ns, c, (ns * 16000) // rate AS n_out,
        |        unnest(range(0, (ns * 16000) // rate)) AS j
        |      FROM cc),
        |v AS (SELECT doc_id, rate, ns, c, n_out, j,
        |        (j * rate) // 16000 AS k,
        |        least((j * rate) // 16000 + 1, ns - 1) AS k1,
        |        (j * rate) % 16000 AS frac
        |      FROM o),
        |s AS (SELECT doc_id, rate, ns, c, n_out, j, frac,
        |        ((doc_id * 31 + k * 7 + c * 13 + 11) % 65536) - 32768 AS s0,
        |        ((doc_id * 31 + k1 * 7 + c * 13 + 11) % 65536) - 32768 AS s1
        |      FROM v),
        |r AS (SELECT doc_id, rate, ns, c, n_out, j,
        |        s0 + ((s1 - s0) * frac) // 16000 AS v
        |      FROM s)
        |SELECT doc_id, CAST(c AS INT) AS channel, CAST(rate AS INT) AS in_rate,
        |  CAST(16000 AS INT) AS out_rate, ns AS n_in,
        |  CAST(count(*) AS BIGINT) AS n_out,
        |  CAST(sum(v) AS BIGINT) AS sum_out,
        |  CAST(min(v) AS INT) AS min_out, CAST(max(v) AS INT) AS max_out,
        |  CAST(sum(CASE WHEN j = 0 THEN v ELSE 0 END) AS INT) AS first_out,
        |  CAST(sum(CASE WHEN j = n_out - 1 THEN v ELSE 0 END) AS INT) AS last_out
        |FROM r GROUP BY doc_id, c, rate, ns
        |ORDER BY doc_id, channel""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.MediaFixtures.build(id))))
          .toDF("doc_id", "blob")
        Multimodal.resamplePcm(blobs, "doc_id", "blob", targetRate = 16000)
          .select(col("media_id").as("doc_id"), col("channel"), col("in_rate"),
            col("out_rate"), col("n_in"), col("n_out"), col("sum_out"),
            col("min_out"), col("max_out"), col("first_out"), col("last_out"))
          .orderBy("doc_id", "channel")
    },

    // ── REAL PNG pixel decode: genuinely zlib-deflated 8-bit truecolor
    //    fixtures with per-row filter types cycling through all five PNG
    //    filters ((doc_id + y) % 5 — the filter machinery is IN the
    //    oracle-checked path), inflated + unfiltered by the JVM's own
    //    zlib, fingerprinted per raster. DuckDB recomputes every decoded
    //    byte from the seed arithmetic without touching the blob. ──
    QueryDef.sql(
      "mm_png_pixels",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 18 AS BIGINT) AS h FROM documents),
        |u AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |v AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM u),
        |e AS (SELECT doc_id, w, h, x, y, unnest(range(0, 3)) AS c FROM v),
        |p AS (SELECT doc_id, w, h,
        |        (doc_id * 31 + x * 7 + y * 13 + c * 11 + 5) % 256 AS px
        |      FROM e)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px) AS BIGINT) AS sum_pix,
        |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
        |  CAST((doc_id * 31 + 5) % 256 AS INT) AS first_pix,
        |  CAST((doc_id * 31 + (w - 1) * 7 + (h - 1) * 13 + 22 + 5) % 256 AS INT) AS last_pix
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(id, x, y, c),
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        Multimodal.pngPixelStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_bytes"), col("sum_pix"), col("min_pix"), col("max_pix"),
            col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── REAL BMP pixel decode: BI_RGB fixtures across the format's
    //    live branches — 24-bit BGR bottom-up (the Windows default),
    //    32-bit BGRA top-down (deterministic junk alpha the decoder
    //    must DROP), 8-bit palette (BGRA quads resolved), 24-bit
    //    top-down — with 4-byte row padding in every width. The
    //    decoder emits the same expanded RGB raster as PNG/JPEG, and
    //    the oracle recomputes every decoded byte from seed arithmetic
    //    without seeing storage order, padding, or the palette
    //    indirection: a wrong bottom-up flip or palette miss shifts
    //    first/last/sum observably. ──
    QueryDef.sql(
      "mm_bmp_pixels",
      """WITH d AS (SELECT doc_id, doc_id % 4 AS v,
        |    CAST(1 + doc_id % 24 AS BIGINT) AS w,
        |    CAST(1 + doc_id % 18 AS BIGINT) AS h FROM documents),
        |u AS (SELECT doc_id, v, w, h, unnest(range(0, w)) AS x FROM d),
        |q AS (SELECT doc_id, v, w, h, x, unnest(range(0, h)) AS y FROM u),
        |e AS (SELECT doc_id, v, w, h, x, y, unnest(range(0, 3)) AS c FROM q),
        |p AS (SELECT doc_id, v, w, h, x, y, c,
        |    CASE WHEN v = 2 THEN
        |      CASE c WHEN 0 THEN (doc_id * 31 + x * 7 + y * 13 + 5) % 256
        |        WHEN 1 THEN (2 * ((doc_id * 31 + x * 7 + y * 13 + 5) % 256)) % 256
        |        ELSE (3 * ((doc_id * 31 + x * 7 + y * 13 + 5) % 256)) % 256 END
        |    ELSE (doc_id * 31 + x * 7 + y * 13 + c * 11 + 5) % 256 END AS px
        |  FROM e)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px) AS BIGINT) AS sum_pix,
        |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
        |  CAST(max(CASE WHEN x = 0 AND y = 0 AND c = 0 THEN px END) AS INT) AS first_pix,
        |  CAST(max(CASE WHEN x = w - 1 AND y = h - 1 AND c = 2 THEN px END) AS INT) AS last_pix
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            val fx = graft.codec.MediaFixtures
            val blob = (id % 4) match {
              case 0 => fx.bmpReal(w, h, (x, y, c) => fx.pixel(id, x, y, c),
                bpp = 24, topDown = false)
              case 1 => fx.bmpReal(w, h, (x, y, c) => fx.pixel(id, x, y, c),
                bpp = 32, topDown = true)
              case 2 => fx.bmpReal(w, h, (_, _, _) => 0, bpp = 8,
                topDown = false,
                idx = (x, y) => ((id * 31 + x * 7 + y * 13 + 5) % 256).toInt)
              case _ => fx.bmpReal(w, h, (x, y, c) => fx.pixel(id, x, y, c),
                bpp = 24, topDown = true)
            }
            (id, blob)
          })
          .toDF("doc_id", "blob")
        Multimodal.bmpPixelStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_bytes"), col("sum_pix"), col("min_pix"), col("max_pix"),
            col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── WEBP METADATA — the modern web image container, metadata
    //    across its three first-chunk forms (dimensions only; VP8
    //    entropy decode is deliberately out of scope): VP8 lossy
    //    keyframes (sync-checked 14-bit dims), VP8L lossless (packed
    //    dims-minus-1, the alpha bit → channels), VP8X extended
    //    (24-bit dims; ANIMATION leaves n_frames NULL — counting
    //    means walking ANMF chunks, and a guessed 1 would be a lie).
    //    Routed through the same columnar MediaMetaExpr gate as every
    //    other sniffed format. The oracle replays the header
    //    arithmetic per variant. ──
    QueryDef.sql(
      "mm_webp_meta",
      """SELECT doc_id, 'webp' AS format,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 5000
        |    ELSE 1 + doc_id % 300 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4000
        |    ELSE 1 + doc_id % 200 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 AND doc_id % 2 = 0 THEN NULL
        |    ELSE 1 END AS INT) AS n_frames,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN 3
        |    WHEN 1 THEN CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 3 END
        |    ELSE CASE WHEN doc_id % 4 < 2 THEN 4 ELSE 3 END
        |  END AS INT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
            def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
              ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
            def riff(fourcc: String, payload: Array[Byte]) =
              "RIFF".getBytes ++ le32(4 + 8 + payload.length) ++
                "WEBP".getBytes ++ fourcc.getBytes ++ le32(payload.length) ++ payload
            val blob = (id % 3) match {
              case 0 =>
                val w = (1 + id % 300).toInt; val h = (1 + id % 200).toInt
                riff("VP8 ", Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A) ++
                  le16(w) ++ le16(h) ++ Array[Byte](7, 7))
              case 1 =>
                val w = (1 + id % 300).toInt; val h = (1 + id % 200).toInt
                val alpha = if (id % 2 == 1) 1 else 0
                val bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
                riff("VP8L", Array[Byte](0x2F) ++ le32(bits) ++ Array[Byte](3))
              case _ =>
                val w = (1 + id % 5000).toInt; val h = (1 + id % 4000).toInt
                val flags = (if (id % 2 == 0) 0x02 else 0) |
                  (if (id % 4 < 2) 0x10 else 0)
                riff("VP8X", Array[Byte](flags.toByte, 0, 0, 0) ++
                  Array(((w - 1) & 0xFF).toByte, (((w - 1) >> 8) & 0xFF).toByte,
                    (((w - 1) >> 16) & 0xFF).toByte) ++
                  Array(((h - 1) & 0xFF).toByte, (((h - 1) >> 8) & 0xFF).toByte,
                    (((h - 1) >> 16) & 0xFF).toByte))
            }
            (id, blob)
          })
          .toDF("doc_id", "blob")
        Multimodal.decodeMeta(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("format"),
            col("width"), col("height"), col("n_frames"), col("channels"))
          .orderBy("doc_id")
    },

    // ── MP3 METADATA — MPEG audio frame-header tables (version/layer/
    //    bitrate/samplerate) plus BOTH real-archive duration sources:
    //    a Xing VBR tag (exact frame count behind the layer-III side
    //    info) and the CBR byte estimate, with ID3v2 (synchsafe skip)
    //    and ID3v1 (trailer subtraction) live in the variants. The
    //    oracle replays the frame-length and duration arithmetic from
    //    the fixture parameters, blind to the bytes. ──
    QueryDef.sql(
      "mm_mp3_meta",
      """SELECT doc_id, 'mp3' AS format,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END AS INT) AS channels,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 32000
        |    WHEN 2 THEN 22050 ELSE 48000 END AS INT) AS sample_rate,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 40 + doc_id % 20
        |    WHEN 1 THEN 30 + doc_id % 10 WHEN 2 THEN 25 + doc_id % 15
        |    ELSE 20 + doc_id % 25 END AS INT) AS n_frames,
        |  CAST(CASE doc_id % 4
        |    WHEN 0 THEN ((40 + doc_id % 20) * 1152 * 1000) // 44100
        |    WHEN 1 THEN (30 + doc_id % 10) * 36
        |    WHEN 2 THEN (25 + doc_id % 15) * 26
        |    ELSE (20 + doc_id % 25) * 24 END AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val blob = (id % 4) match {
              case 0 => graft.codec.MediaFixtures.mp3(mpeg1 = true, brIdx = 9, srIdx = 0,
                mono = false, nFrames = (40 + id % 20).toInt, xing = true)
              case 1 => graft.codec.MediaFixtures.mp3(mpeg1 = true, brIdx = 5, srIdx = 2,
                mono = true, nFrames = (30 + id % 10).toInt, xing = false,
                id3v2Pad = (64 + id % 32).toInt)
              case 2 => graft.codec.MediaFixtures.mp3(mpeg1 = false, brIdx = 8, srIdx = 0,
                mono = false, nFrames = (25 + id % 15).toInt, xing = false,
                id3v1 = true)
              case _ => graft.codec.MediaFixtures.mp3(mpeg1 = true, brIdx = 11, srIdx = 1,
                mono = false, nFrames = (20 + id % 25).toInt, xing = true,
                id3v2Pad = (10 + id % 20).toInt, id3v1 = true)
            }
            (id, blob)
          })
          .toDF("doc_id", "blob")
        Multimodal.decodeMeta(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("format"), col("channels"),
            col("sample_rate"), col("n_frames"), col("duration_ms"))
          .orderBy("doc_id")
    },

    // ── FLAC + OGG VORBIS METADATA — the two open audio containers:
    //    FLAC's packed STREAMINFO bitfields (20-bit rate, 36-bit total
    //    samples) and Ogg's identification packet + the forward page
    //    walk to the final granule position (total PCM samples — a
    //    lacing-table walk, never a byte search). Oracle replays the
    //    fixture arithmetic per container. ──
    QueryDef.sql(
      "mm_audio_containers",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'flac' ELSE 'ogg' END AS format,
        |  CAST(1 + (doc_id // 2) % 2 AS INT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |    THEN CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END
        |    ELSE CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 44100
        |      ELSE 48000 END END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + 8 * ((doc_id // 4) % 2)
        |    ELSE NULL END AS INT) AS bit_depth,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1000 + doc_id % 9000
        |    ELSE 500 + doc_id % 5000 END AS INT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |    THEN ((1000 + doc_id % 9000) * 1000) //
        |      (CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |        WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END)
        |    ELSE ((500 + doc_id % 5000) * 1000) //
        |      (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 44100
        |        ELSE 48000 END) END AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val ch = (1 + (id / 2) % 2).toInt
            val blob =
              if (id % 2 == 0) {
                val rate = Array(8000, 16000, 22050, 44100, 48000)((id % 5).toInt)
                graft.codec.MediaFixtures.flac(rate, ch, bps = (16 + 8 * ((id / 4) % 2)).toInt,
                  totalSamples = 1000 + id % 9000)
              } else {
                val rate = Array(8000, 44100, 48000)((id % 3).toInt)
                graft.codec.MediaFixtures.oggVorbis(rate, ch, granule = 500 + id % 5000,
                  dataPages = (1 + id % 4).toInt)
              }
            (id, blob)
          })
          .toDF("doc_id", "blob")
        Multimodal.decodeMeta(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("format"), col("channels"),
            col("sample_rate"), col("bit_depth"), col("n_frames"),
            col("duration_ms"))
          .orderBy("doc_id")
    },

    // ── MP4 METADATA — ISO-BMFF box walk (ftyp → moov{mvhd, trak/
    //    tkhd}): presentation duration over the movie timescale in
    //    both the version-0 u32 and version-1 u64 field layouts (the
    //    v1 fixtures carry durations past 2^32 to keep the wide path
    //    live), 16.16 fixed-point track dimensions. The single-floor
    //    identity floor((k·ts + r)·1000/ts) = k·1000 + floor(r·1000/ts)
    //    keeps the oracle exact. ──
    QueryDef.sql(
      "mm_mp4_meta",
      """SELECT doc_id, 'mp4' AS format,
        |  CAST(16 + doc_id % 640 AS INT) AS width,
        |  CAST(16 + doc_id % 480 AS INT) AS height,
        |  CAST((1 + doc_id % 30) * 1000 +
        |    ((doc_id % 7 + CASE WHEN doc_id % 2 = 1 THEN 4294967296 ELSE 0 END) * 1000)
        |      // (CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END)
        |    AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val ts = Array(600, 1000, 90000)((id % 3).toInt)
            val base = (1 + id % 30) * ts + id % 7
            val dur = if (id % 2 == 1) base + (1L << 32) else base
            (id, graft.codec.MediaFixtures.mp4(ts, dur, (16 + id % 640).toInt,
              (16 + id % 480).toInt, version = (id % 2).toInt))
          })
          .toDF("doc_id", "blob")
        Multimodal.decodeMeta(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("format"), col("width"),
            col("height"), col("duration_ms"))
          .orderBy("doc_id")
    },

    // ── DECODER PARITY — the same seed raster wrapped as a real PNG
    //    (zlib + filters), a real BMP (bottom-up BGR + padding) and a
    //    real TIFF (big-endian LZW + predictor strips) must decode to
    //    the IDENTICAL expanded-RGB raster: the three container
    //    machineries cancel against each other, not just against the
    //    oracle. `all_equal` is byte-array equality Spark-side; the
    //    oracle's constant `true` IS the parity claim, and sum_pix
    //    pins which raster they all agreed on. ──
    QueryDef.sql(
      "mm_decoder_parity",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS w,
        |    CAST(1 + doc_id % 18 AS BIGINT) AS h FROM documents),
        |u AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |q AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM u),
        |e AS (SELECT doc_id, w, h, x, y, unnest(range(0, 3)) AS c FROM q),
        |p AS (SELECT doc_id, w, h,
        |    (doc_id * 31 + x * 7 + y * 13 + c * 11 + 5) % 256 AS px FROM e)
        |SELECT doc_id, true AS all_equal,
        |  CAST(sum(px) AS BIGINT) AS sum_pix
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            val fx = graft.codec.MediaFixtures
            def px(x: Int, y: Int, c: Int) = fx.pixel(id, x, y, c)
            val png = graft.codec.MediaHeaders.pngPixels(
              fx.pngReal(w, h, px, filterOf = y => ((id + y) % 5).toInt)).get
            val bmp = graft.codec.MediaHeaders.bmpPixels(
              fx.bmpReal(w, h, px, bpp = 24, topDown = false)).get
            val tif = graft.codec.MediaHeaders.tiffPixels(
              fx.tiffReal(w, h, px, rgb = true, littleEndian = false,
                lzw = true, predictor2 = true, rowsPerStrip = 3)).get
            val eq = java.util.Arrays.equals(png.rgb, bmp.rgb) &&
              java.util.Arrays.equals(bmp.rgb, tif.rgb)
            var sum = 0L
            png.rgb.foreach(v => sum += (v & 0xff))
            (id, eq, sum)
          })
          .toDF("doc_id", "all_equal", "sum_pix")
          .orderBy("doc_id")
    },

    // ── REAL TIFF pixel decode: baseline TIFF across its live
    //    branches — RGB and grayscale strips in BOTH byte orders, any
    //    RowsPerStrip split, LZW compression (MSB-first codes — the
    //    decoder shared with PDF's LZWDecode) with the horizontal
    //    predictor, and photometric 0 (WhiteIsZero — the decoder must
    //    INVERT). The oracle recomputes decoded bytes from seed
    //    arithmetic blind to endianness, strip geometry, compression
    //    and predictor: any one of them wrong shifts sum/first/last
    //    observably. ──
    QueryDef.sql(
      "mm_tiff_pixels",
      """WITH d AS (SELECT doc_id, doc_id % 6 AS v,
        |    CAST(1 + doc_id % 24 AS BIGINT) AS w,
        |    CAST(1 + doc_id % 18 AS BIGINT) AS h FROM documents),
        |u AS (SELECT doc_id, v, w, h, unnest(range(0, w)) AS x FROM d),
        |q AS (SELECT doc_id, v, w, h, x, unnest(range(0, h)) AS y FROM u),
        |e AS (SELECT doc_id, v, w, h, x, y, unnest(range(0, 3)) AS c FROM q),
        |p AS (SELECT doc_id, v, w, h, x, y, c,
        |    CASE WHEN v = 3 THEN (doc_id * 31 + x * 7 + y * 13 + 5) % 256
        |      WHEN v = 4 THEN 255 - ((doc_id * 31 + x * 7 + y * 13 + 5) % 256)
        |      ELSE (doc_id * 31 + x * 7 + y * 13 + c * 11 + 5) % 256 END AS px
        |  FROM e)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px) AS BIGINT) AS sum_pix,
        |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
        |  CAST(max(CASE WHEN x = 0 AND y = 0 AND c = 0 THEN px END) AS INT) AS first_pix,
        |  CAST(max(CASE WHEN x = w - 1 AND y = h - 1 AND c = 2 THEN px END) AS INT) AS last_pix
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            val fx = graft.codec.MediaFixtures
            def px(x: Int, y: Int, c: Int) = fx.pixel(id, x, y, c)
            def g(x: Int, y: Int, c: Int) = fx.pixel(id, x, y, 0)
            val blob = (id % 6) match {
              case 0 => fx.tiffReal(w, h, px, rgb = true, littleEndian = true,
                lzw = false, predictor2 = false, rowsPerStrip = h)
              case 1 => fx.tiffReal(w, h, px, rgb = true, littleEndian = false,
                lzw = false, predictor2 = false, rowsPerStrip = 3)
              case 2 => fx.tiffReal(w, h, px, rgb = true, littleEndian = true,
                lzw = true, predictor2 = true, rowsPerStrip = 4)
              case 3 => fx.tiffReal(w, h, g, rgb = false, littleEndian = false,
                lzw = false, predictor2 = false, rowsPerStrip = h)
              case 4 => fx.tiffReal(w, h, g, rgb = false, littleEndian = true,
                lzw = true, predictor2 = true, rowsPerStrip = 2,
                whiteIsZero = true)
              case _ => fx.tiffReal(w, h, px, rgb = true, littleEndian = false,
                lzw = true, predictor2 = false, rowsPerStrip = h)
            }
            (id, blob)
          })
          .toDF("doc_id", "blob")
        Multimodal.tiffPixelStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_bytes"), col("sum_pix"), col("min_pix"), col("max_pix"),
            col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── ADAM7-INTERLACED PNG decode: the fixture transmits seven
    //    independently-filtered passes (IHDR interlace = 1), the decoder
    //    must unfilter each pass against its own prior row and scatter
    //    onto the pass grids. The oracle is mm_png_pixels' raster
    //    arithmetic — it cannot see the interlace flag, so only a
    //    correct Adam7 reassembly matches. ──
    QueryDef.sql(
      "mm_png_adam7",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 18 AS BIGINT) AS h FROM documents),
        |u AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |v AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM u),
        |e AS (SELECT doc_id, w, h, x, y, unnest(range(0, 3)) AS c FROM v),
        |p AS (SELECT doc_id, w, h,
        |        (doc_id * 31 + x * 7 + y * 13 + c * 11 + 5) % 256 AS px
        |      FROM e)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px) AS BIGINT) AS sum_pix,
        |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
        |  CAST((doc_id * 31 + 5) % 256 AS INT) AS first_pix,
        |  CAST((doc_id * 31 + (w - 1) * 7 + (h - 1) * 13 + 22 + 5) % 256 AS INT) AS last_pix
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(id, x, y, c),
              filterOf = y => ((id + y) % 5).toInt, interlaced = true))
          })
          .toDF("doc_id", "blob")
        Multimodal.pngPixelStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_bytes"), col("sum_pix"), col("min_pix"), col("max_pix"),
            col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── PALETTE-PNG pixel decode: a genuine 256-entry PLTE chunk and
    //    index scanlines through the same zlib + five-filter machinery,
    //    then the palette lookup — the icon/web-graphic flavor. The
    //    oracle recomputes every RESOLVED RGB byte from the seed
    //    arithmetic of palette and indexes; a wrong PLTE offset, index
    //    interpretation, or filter bug breaks the hash. ──
    QueryDef.sql(
      "mm_png_palette",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 19 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 13 AS BIGINT) AS h FROM documents),
        |u AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |v AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM u),
        |e AS (SELECT doc_id, w, h,
        |        (doc_id + x * 5 + y * 11 + 3) % 256 AS idx,
        |        unnest(range(0, 3)) AS c FROM v),
        |p AS (SELECT doc_id, w, h,
        |        (doc_id * 7 + idx * 31 + c * 11) % 256 AS px FROM e)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px) AS BIGINT) AS sum_pix,
        |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
        |  CAST((doc_id * 7 + ((doc_id + 3) % 256) * 31) % 256 AS INT) AS first_pix,
        |  CAST((doc_id * 7 + ((doc_id + (w - 1) * 5 + (h - 1) * 11 + 3) % 256) * 31 + 22) % 256 AS INT)
        |    AS last_pix
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 19).toInt; val h = (1 + id % 13).toInt
            val plte = Array.tabulate(768)(i =>
              ((id * 7 + (i / 3) * 31 + (i % 3) * 11) % 256).toByte)
            (id, graft.codec.MediaFixtures.pngRealIndexed(w, h, plte,
              (x, y) => ((id + x * 5 + y * 11 + 3) % 256).toInt,
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        Multimodal.pngPixelStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_bytes"), col("sum_pix"), col("min_pix"), col("max_pix"),
            col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── REAL GIF raster decode: genuine LZW streams (the fixture
    //    encoder uses the spec's CLEAR-reset facility; the decoder is a
    //    full general variable-width LZW, spec-pinned against an
    //    independent textbook compressor), one fingerprint row per
    //    (doc, frame), oracle from the seed arithmetic. ──
    QueryDef.sql(
      "mm_gif_raster",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 12 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 9 AS BIGINT) AS h,
        |                  CAST(1 + doc_id % 3 AS BIGINT) AS nf FROM documents),
        |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS fr FROM d),
        |u AS (SELECT doc_id, w, h, fr, unnest(range(0, w)) AS x FROM f),
        |v AS (SELECT doc_id, w, h, fr, x, unnest(range(0, h)) AS y FROM u),
        |p AS (SELECT doc_id, w, h, fr,
        |        (doc_id * 31 + x * 7 + y * 13 + fr * 11 + 5) % 256 AS px
        |      FROM v)
        |SELECT doc_id, CAST(fr AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_px,
        |  CAST(sum(px) AS BIGINT) AS sum_idx,
        |  CAST(min(px) AS INT) AS min_idx, CAST(max(px) AS INT) AS max_idx,
        |  CAST((doc_id * 31 + fr * 11 + 5) % 256 AS INT) AS first_idx,
        |  CAST((doc_id * 31 + (w - 1) * 7 + (h - 1) * 13 + fr * 11 + 5) % 256 AS INT) AS last_idx
        |FROM p GROUP BY doc_id, fr, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 12).toInt; val h = (1 + id % 9).toInt
            val nf = (1 + id % 3).toInt
            (id, graft.codec.MediaFixtures.gifReal(w, h, nf,
              (x, y, f) => graft.codec.MediaFixtures.pixel(id, x, y, f)))
          })
          .toDF("doc_id", "blob")
        Multimodal.gifRasterStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("frame_idx"), col("width"),
            col("height"), col("n_px"), col("sum_idx"), col("min_idx"),
            col("max_idx"), col("first_idx"), col("last_idx"))
          .orderBy("doc_id", "frame_idx")
    },

    // ── INTERLACED GIF decode: the fixture transmits rows in the
    //    spec's four-pass order (flag 0x40 set), the decoder must
    //    restore raster order — the oracle is raster-order arithmetic
    //    and CANNOT see the flag, so only a correct deinterlacer
    //    matches. Dims cycle through every pass-boundary case. ──
    QueryDef.sql(
      "mm_gif_interlaced",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 12 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 9 AS BIGINT) AS h FROM documents),
        |u AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        |v AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM u),
        |p AS (SELECT doc_id, w, h, x, y,
        |        (doc_id * 31 + x * 7 + y * 13 + 5) % 256 AS px FROM v)
        |SELECT doc_id, CAST(0 AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_px,
        |  CAST(sum(px) AS BIGINT) AS sum_idx,
        |  CAST(min(px) AS INT) AS min_idx, CAST(max(px) AS INT) AS max_idx,
        |  CAST((doc_id * 31 + 5) % 256 AS INT) AS first_idx,
        |  CAST((doc_id * 31 + (w - 1) * 7 + (h - 1) * 13 + 5) % 256 AS INT) AS last_idx
        |FROM p GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 12).toInt; val h = (1 + id % 9).toInt
            (id, graft.codec.MediaFixtures.gifReal(w, h, 1,
              (x, y, _) => graft.codec.MediaFixtures.pixel(id, x, y, 0),
              interlaced = true))
          })
          .toDF("doc_id", "blob")
        Multimodal.gifRasterStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("frame_idx"), col("width"),
            col("height"), col("n_px"), col("sum_idx"), col("min_idx"),
            col("max_idx"), col("first_idx"), col("last_idx"))
          .orderBy("doc_id")
    },

    // ── REAL thumbnail resize — the execution of mm_resize_plan for
    //    rasters the engine genuinely decodes: PNG pixels through zlib,
    //    aspect-preserving 8×6 box by the same exact integer dims logic,
    //    nearest-neighbor sampling sx = ox·w div ow / sy = oy·h div oh.
    //    DuckDB replays every SAMPLED byte from the arithmetic; the
    //    resizeStub now covers only JPEG. ──
    QueryDef.sql(
      "mm_raster_resize",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 18 AS BIGINT) AS h FROM documents),
        |r AS (SELECT doc_id, w, h,
        |    CASE WHEN w <= 8 AND h <= 6 THEN w
        |         WHEN w * 6 >= h * 8 THEN 8
        |         ELSE greatest((w * 6) // h, 1) END AS ow,
        |    CASE WHEN w <= 8 AND h <= 6 THEN h
        |         WHEN w * 6 >= h * 8 THEN greatest((h * 8) // w, 1)
        |         ELSE 6 END AS oh
        |  FROM d),
        |u AS (SELECT doc_id, w, h, ow, oh, unnest(range(0, ow)) AS ox FROM r),
        |v AS (SELECT doc_id, w, h, ow, oh, ox, unnest(range(0, oh)) AS oy FROM u),
        |e AS (SELECT doc_id, w, h, ow, oh,
        |        (ox * w) // ow AS sx, (oy * h) // oh AS sy,
        |        unnest(range(0, 3)) AS c
        |      FROM v),
        |p AS (SELECT doc_id, w, h, ow, oh,
        |        (doc_id * 31 + sx * 7 + sy * 13 + c * 11 + 5) % 256 AS px
        |      FROM e)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
        |  CAST(ow * oh * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px) AS BIGINT) AS sum_pix,
        |  CAST((doc_id * 31 + 5) % 256 AS INT) AS first_pix,
        |  CAST((doc_id * 31 + (((ow - 1) * w) // ow) * 7
        |        + (((oh - 1) * h) // oh) * 13 + 22 + 5) % 256 AS INT) AS last_pix
        |FROM p GROUP BY doc_id, w, h, ow, oh ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(id, x, y, c),
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        Multimodal.resizePixels(blobs, "doc_id", "blob", maxW = 8, maxH = 6)
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("out_w"), col("out_h"), col("n_bytes"), col("sum_pix"),
            col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── Image TRANSCODE round trip — the engine WRITES media now: mixed
    //    sources (even docs a filtered PNG, odd docs a DC-only grayscale
    //    JPEG) decode through the unified raster path, resize into the
    //    8×6 box, and are re-ENCODED as real truecolor PNGs
    //    (MediaWriters.pngRgb: deflate + CRC32 chunks), which the query
    //    then re-decodes with the engine's own PNG decoder and
    //    fingerprints. The oracle replays source arithmetic + resize
    //    sampling per parity — it never sees a compressed byte, so only
    //    a correct decode→resize→encode→re-decode chain matches. Wrong
    //    CRC or a malformed chunk drops the row (count mismatch). ──
    QueryDef.sql(
      "mm_transcode_png",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 18 AS BIGINT) AS h,
        |                  CAST(1 + doc_id % 16 AS BIGINT) AS q FROM documents),
        |r AS (SELECT doc_id, w, h, q,
        |    CASE WHEN w <= 8 AND h <= 6 THEN w
        |         WHEN w * 6 >= h * 8 THEN 8
        |         ELSE greatest((w * 6) // h, 1) END AS ow,
        |    CASE WHEN w <= 8 AND h <= 6 THEN h
        |         WHEN w * 6 >= h * 8 THEN greatest((h * 8) // w, 1)
        |         ELSE 6 END AS oh
        |  FROM d),
        |u AS (SELECT doc_id, w, h, q, ow, oh, unnest(range(0, ow)) AS ox FROM r),
        |v AS (SELECT doc_id, w, h, q, ow, oh, ox, unnest(range(0, oh)) AS oy FROM u),
        |e AS (SELECT doc_id, w, h, q, ow, oh, ox, oy,
        |        (ox * w) // ow AS sx, (oy * h) // oh AS sy,
        |        unnest(range(0, 3)) AS c
        |      FROM v),
        |p AS (SELECT doc_id, ow, oh, ox, oy, c,
        |        CASE WHEN doc_id % 2 = 0
        |          THEN (doc_id * 31 + sx * 7 + sy * 13 + c * 11 + 5) % 256
        |          ELSE greatest(0, least(255,
        |            ((((doc_id * 31 + (sx // 8) * 7 + (sy // 8) * 13 + 3) % 256) - 128)
        |              * q + 4 + 8192) // 8 - 1024 + 128)) END AS px
        |      FROM e)
        |SELECT doc_id, CAST(ow AS INT) AS width, CAST(oh AS INT) AS height,
        |  CAST(ow * oh * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px) AS BIGINT) AS sum_pix,
        |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
        |  CAST(sum(CASE WHEN ox = 0 AND oy = 0 AND c = 0 THEN px ELSE 0 END) AS INT)
        |    AS first_pix,
        |  CAST(sum(CASE WHEN ox = ow - 1 AND oy = oh - 1 AND c = 2 THEN px ELSE 0 END) AS INT)
        |    AS last_pix
        |FROM p GROUP BY doc_id, ow, oh ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            val blob =
              if (id % 2 == 0)
                graft.codec.MediaFixtures.pngReal(w, h,
                  (x, y, c) => graft.codec.MediaFixtures.pixel(id, x, y, c),
                  filterOf = y => ((id + y) % 5).toInt)
              else {
                val q0 = (1 + id % 16).toInt
                val qt = Array.tabulate(64)(i => if (i == 0) q0 else 16)
                graft.codec.MediaFixtures.jpegReal(w, h, Seq(qt),
                  (_, bx, by) => Array.tabulate(64)(i =>
                    if (i == 0) (((id * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt
                    else 0))
              }
            (id, blob)
          })
          .toDF("doc_id", "blob")
        val thumbs = Multimodal.transcodePng(blobs, "doc_id", "blob", maxW = 8, maxH = 6)
        Multimodal.pngPixelStats(thumbs, "media_id", "png")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("n_bytes"), col("sum_pix"), col("min_pix"), col("max_pix"),
            col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── Audio TRANSCODE round trip — resample-and-REWRITE: WAV fixtures
    //    at doc-varied rates decode, linear-interpolate to 16 kHz with
    //    the exact resamplePcm arithmetic, and are re-encoded as
    //    canonical RIFF/WAV files (MediaWriters.wavPcm16), which the
    //    query re-decodes and fingerprints through resamplePcm at the
    //    SAME 16 kHz (identity passthrough: k = j, frac = 0). The oracle
    //    is the interpolation arithmetic with in_rate = the rewritten
    //    file's 16 kHz — any header field, byte order, interleave or
    //    length bug in the writer breaks the re-decode or the hash. ──
    QueryDef.sql(
      "mm_transcode_wav",
      """WITH f AS (SELECT doc_id,
        |    CAST(8000 * (1 + doc_id % 5) AS BIGINT) AS rate,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS nch,
        |    CAST(1 + doc_id % 50 AS BIGINT) AS ns
        |  FROM documents),
        |cc AS (SELECT doc_id, rate, ns, unnest(range(0, nch)) AS c FROM f),
        |o AS (SELECT doc_id, rate, ns, c, (ns * 16000) // rate AS n_out,
        |        unnest(range(0, (ns * 16000) // rate)) AS j
        |      FROM cc),
        |v AS (SELECT doc_id, rate, ns, c, n_out, j,
        |        (j * rate) // 16000 AS k,
        |        least((j * rate) // 16000 + 1, ns - 1) AS k1,
        |        (j * rate) % 16000 AS frac
        |      FROM o),
        |s AS (SELECT doc_id, c, n_out, j, frac,
        |        ((doc_id * 31 + k * 7 + c * 13 + 11) % 65536) - 32768 AS s0,
        |        ((doc_id * 31 + k1 * 7 + c * 13 + 11) % 65536) - 32768 AS s1
        |      FROM v),
        |r AS (SELECT doc_id, c, n_out, j,
        |        s0 + ((s1 - s0) * frac) // 16000 AS v
        |      FROM s)
        |SELECT doc_id, CAST(c AS INT) AS channel, CAST(16000 AS INT) AS in_rate,
        |  CAST(16000 AS INT) AS out_rate,
        |  CAST(n_out AS BIGINT) AS n_in, CAST(count(*) AS BIGINT) AS n_out,
        |  CAST(sum(v) AS BIGINT) AS sum_out,
        |  CAST(min(v) AS INT) AS min_out, CAST(max(v) AS INT) AS max_out,
        |  CAST(sum(CASE WHEN j = 0 THEN v ELSE 0 END) AS INT) AS first_out,
        |  CAST(sum(CASE WHEN j = n_out - 1 THEN v ELSE 0 END) AS INT) AS last_out
        |FROM r GROUP BY doc_id, c, n_out
        |ORDER BY doc_id, channel""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val rate = (8000 * (1 + id % 5)).toInt
            val nch = (1 + id % 2).toInt
            val ns = (1 + id % 50).toInt
            (id, graft.codec.MediaFixtures.wav(nch, rate, ns,
              (k, c) => (((id * 31 + k * 7 + c * 13 + 11) % 65536) - 32768).toInt))
          })
          .toDF("doc_id", "blob")
        val rewritten = Multimodal.transcodeWav(blobs, "doc_id", "blob", targetRate = 16000)
        Multimodal.resamplePcm(rewritten, "media_id", "wav", targetRate = 16000)
          .select(col("media_id").as("doc_id"), col("channel"), col("in_rate"),
            col("out_rate"), col("n_in"), col("n_out"), col("sum_out"),
            col("min_out"), col("max_out"), col("first_out"), col("last_out"))
          .orderBy("doc_id", "channel")
    },

    // ── Multimodal CORPUS BUILD capstone — pipeline_corpus_build's
    //    sibling for media: one declarative plan composing arrival
    //    (mixed containers: PNG / DC-only JPEG twins sharing a base
    //    seed, plus WAV audio), metadata validation gates riding the
    //    parsed decodeMeta columns (image area, audio rate/length),
    //    CROSS-FORMAT perceptual dedup (dHash groupBy keep-min: each
    //    (png, jpeg) twin collapses to one kept doc with no
    //    format-aware special case), and a unified keep-manifest. Every
    //    stage reuses an operator with its own oracle-pinned query;
    //    this pins their COMPOSITION. The oracle replays formats, dims,
    //    gates and the dHash closed form from seed arithmetic — blind
    //    to containers and to which format carried each image. ──
    QueryDef.sql(
      "mm_corpus_build", {
        def vAt(sx: String, sy: String): String =
          s"""greatest(0, least(255,
             |  ((((sb * 31 + (($sx) // 8) * 7 + (($sy) // 8) * 13 + 3) % 256) - 128) * q + 4 + 8192) // 8
             |    - 1024 + 128))""".stripMargin
        val g0 = vAt("(gx * w) // 9", "(gy * h) // 8")
        val g1 = vAt("((gx + 1) * w) // 9", "(gy * h) // 8")
        s"""WITH cls AS (SELECT doc_id, doc_id % 3 AS k, doc_id // 3 AS sb FROM documents),
           |im AS (SELECT doc_id, sb, CAST(1 + sb % 24 AS BIGINT) AS w,
           |              CAST(1 + sb % 18 AS BIGINT) AS h,
           |              CAST(1 + sb % 16 AS BIGINT) AS q
           |       FROM cls WHERE k < 2),
           |imk AS (SELECT * FROM im WHERE w * h >= 16),
           |u AS (SELECT doc_id, sb, w, h, q, unnest(range(0, 8)) AS gy FROM imk),
           |v AS (SELECT doc_id, sb, w, h, q, gy, unnest(range(0, 8)) AS gx FROM u),
           |b AS (SELECT doc_id, gy, gx,
           |        CASE WHEN $g1 > $g0 THEN
           |          CASE WHEN gy * 8 + gx = 63 THEN (-9223372036854775807 - 1)
           |               ELSE (CAST(1 AS BIGINT) << CAST(gy * 8 + gx AS INTEGER)) END
           |        ELSE 0 END AS term
           |      FROM v),
           |dh AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS dhash FROM b GROUP BY doc_id),
           |g AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
           |             CAST(count(*) AS BIGINT) AS group_size
           |      FROM dh GROUP BY dhash),
           |gi AS (SELECT 'image' AS kind, g.doc_id, g.group_size,
           |              CAST(m.w AS INT) AS width, CAST(m.h AS INT) AS height,
           |              CAST(NULL AS INT) AS sample_rate, CAST(NULL AS BIGINT) AS n_frames
           |       FROM g JOIN imk m ON g.doc_id = m.doc_id),
           |au AS (SELECT doc_id, CAST(8000 * (1 + doc_id % 5) AS BIGINT) AS rate,
           |              CAST(1 + doc_id % 50 AS BIGINT) AS ns
           |       FROM cls WHERE k = 2),
           |ga AS (SELECT 'audio' AS kind, doc_id, CAST(1 AS BIGINT) AS group_size,
           |              CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
           |              CAST(rate AS INT) AS sample_rate, ns AS n_frames
           |       FROM au WHERE ns >= 10 AND rate >= 16000)
           |SELECT * FROM gi UNION ALL SELECT * FROM ga ORDER BY doc_id""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val k = (id % 3).toInt
            if (k == 2) {
              val rate = (8000 * (1 + id % 5)).toInt
              val nch = (1 + id % 2).toInt
              val ns = (1 + id % 50).toInt
              (id, graft.codec.MediaFixtures.wav(nch, rate, ns,
                (i, c) => graft.codec.MediaFixtures.pcmSample(id, i, c)))
            } else {
              val sb = id / 3
              val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
              val q0 = (1 + sb % 16).toInt
              def dc(bx: Int, by: Int): Int = (((sb * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt
              def v(bx: Int, by: Int): Int =
                math.max(0, math.min(255, ((dc(bx, by) * q0 + 4) >> 3) + 128))
              val blob =
                if (k == 0)
                  graft.codec.MediaFixtures.pngReal(w, h, (x, y, _) => v(x / 8, y / 8),
                    filterOf = y => ((id + y) % 5).toInt)
                else {
                  val qt = Array.tabulate(64)(i => if (i == 0) q0 else 16)
                  graft.codec.MediaFixtures.jpegReal(w, h, Seq(qt),
                    (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(bx, by) else 0))
                }
              (id, blob)
            }
          })
          .toDF("doc_id", "blob")
        val meta = Multimodal.decodeMeta(blobs, "doc_id", "blob")
        // validation gates ride the PARSED metadata columns
        val imgKept = meta
          .filter(col("format").isin("png", "jpeg") &&
            col("width").cast("long") * col("height") >= 16)
          .select(col("media_id"), col("width"), col("height"))
        val imgBlobs = blobs.join(imgKept, col("doc_id") === imgKept("media_id"))
          .select(col("doc_id"), col("blob"))
        // cross-format perceptual dedup: keep the smallest doc per dhash
        val groups = Multimodal.dHash64(imgBlobs, "doc_id", "blob")
          .groupBy(col("dhash"))
          .agg(min(col("media_id")).cast("long").as("doc_id"),
            count(lit(1)).cast("long").as("group_size"))
        val images = groups
          .join(imgKept, groups("doc_id") === imgKept("media_id"))
          .select(lit("image").as("kind"), groups("doc_id"), col("group_size"),
            col("width"), col("height"),
            lit(null).cast("int").as("sample_rate"),
            lit(null).cast("long").as("n_frames"))
        val audio = meta
          .filter(col("format") === "wav" &&
            col("n_frames") >= 10 && col("sample_rate") >= 16000)
          .select(lit("audio").as("kind"), col("media_id").as("doc_id"),
            lit(1L).as("group_size"),
            lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
            col("sample_rate"), col("n_frames").cast("long").as("n_frames"))
        images.unionByName(audio).orderBy("doc_id")
    },

    // ── Training-time image AUGMENTATION — hflip / vflip / rot90 /
    //    center-crop as pure integer index permutations over really
    //    decoded pixels, each variant re-emitted as a real PNG and
    //    RE-DECODED for its fingerprint (so the write path sits inside
    //    the checked loop). The oracle replays every variant's source
    //    mapping per output pixel — no interpolation anywhere, every
    //    output byte IS a source byte, which is what makes the full
    //    augmentation family exactly replayable in SQL. ──
    QueryDef.sql(
      "mm_augment",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 18 AS BIGINT) AS h FROM documents),
        |vr AS (SELECT doc_id, w, h,
        |         unnest(['orig','hflip','vflip','rot90','crop']) AS variant FROM d),
        |dims AS (SELECT doc_id, w, h, variant,
        |    CASE variant WHEN 'rot90' THEN h WHEN 'crop' THEN (w + 1) // 2 ELSE w END AS ow,
        |    CASE variant WHEN 'rot90' THEN w WHEN 'crop' THEN (h + 1) // 2 ELSE h END AS oh
        |  FROM vr),
        |u AS (SELECT *, unnest(range(0, ow)) AS ox FROM dims),
        |v2 AS (SELECT *, unnest(range(0, oh)) AS oy FROM u),
        |e AS (SELECT doc_id, variant, w, h, ow, oh, ox, oy,
        |    CASE variant WHEN 'hflip' THEN w - 1 - ox WHEN 'rot90' THEN oy
        |         WHEN 'crop' THEN w // 4 + ox ELSE ox END AS sx,
        |    CASE variant WHEN 'vflip' THEN h - 1 - oy WHEN 'rot90' THEN h - 1 - ox
        |         WHEN 'crop' THEN h // 4 + oy ELSE oy END AS sy,
        |    unnest(range(0, 3)) AS c
        |  FROM v2),
        |p AS (SELECT doc_id, variant, ow, oh, ox, oy, c,
        |        (doc_id * 31 + sx * 7 + sy * 13 + c * 11 + 5) % 256 AS px
        |      FROM e)
        |SELECT doc_id, variant, CAST(ow AS INT) AS width, CAST(oh AS INT) AS height,
        |  CAST(ow * oh * 3 AS BIGINT) AS n_bytes,
        |  CAST(sum(px) AS BIGINT) AS sum_pix,
        |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
        |  CAST(sum(CASE WHEN ox = 0 AND oy = 0 AND c = 0 THEN px ELSE 0 END) AS INT)
        |    AS first_pix,
        |  CAST(sum(CASE WHEN ox = ow - 1 AND oy = oh - 1 AND c = 2 THEN px ELSE 0 END) AS INT)
        |    AS last_pix
        |FROM p GROUP BY doc_id, variant, ow, oh
        |ORDER BY doc_id, variant""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(id, x, y, c),
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        val vidx = when(col("variant") === "orig", 0)
          .when(col("variant") === "hflip", 1)
          .when(col("variant") === "vflip", 2)
          .when(col("variant") === "rot90", 3)
          .otherwise(4)
        val keyed = Multimodal.augmentPng(blobs, "doc_id", "blob")
          .select((col("media_id") * 5 + vidx).cast("long").as("vid"), col("png"))
        Multimodal.pngPixelStats(keyed, "vid", "png")
          .select(expr("media_id div 5").cast("long").as("doc_id"),
            element_at(
              array(lit("orig"), lit("hflip"), lit("vflip"), lit("rot90"), lit("crop")),
              (pmod(col("media_id"), lit(5)) + 1).cast("int")).as("variant"),
            col("width"), col("height"), col("n_bytes"), col("sum_pix"),
            col("min_pix"), col("max_pix"), col("first_pix"), col("last_pix"))
          .orderBy("doc_id", "variant")
    },

    // ── EXIF AUTO-ORIENT — real camera metadata driving a real pixel
    //    fix: every doc's JPEG carries a genuine APP1/TIFF IFD
    //    (endianness alternating per doc) whose orientation tag 1..8
    //    the engine parses and corrects as an index permutation, then
    //    re-emits upright as PNG and re-decodes. The oracle replays the
    //    TIFF value from arithmetic (it cannot parse), the display-fix
    //    mapping per orientation, and the decoded gray closed form —
    //    a wrong IFD offset, endianness branch, or inverse mapping
    //    breaks the hash. ──
    QueryDef.sql(
      "mm_exif_orient", {
        val vAt =
          """greatest(0, least(255,
            |  ((((doc_id * 31 + (sx // 8) * 7 + (sy // 8) * 13 + 3) % 256) - 128) * q + 4 + 8192) // 8
            |    - 1024 + 128))""".stripMargin
        s"""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS w,
           |                  CAST(1 + doc_id % 18 AS BIGINT) AS h,
           |                  CAST(1 + doc_id % 16 AS BIGINT) AS q,
           |                  CAST(1 + doc_id % 8 AS INT) AS o FROM documents),
           |dims AS (SELECT doc_id, w, h, q, o,
           |    CASE WHEN o >= 5 THEN h ELSE w END AS ow,
           |    CASE WHEN o >= 5 THEN w ELSE h END AS oh
           |  FROM d),
           |u AS (SELECT *, unnest(range(0, ow)) AS ox FROM dims),
           |v2 AS (SELECT *, unnest(range(0, oh)) AS oy FROM u),
           |e AS (SELECT doc_id, q, o, ow, oh, ox, oy,
           |    CASE o WHEN 2 THEN w - 1 - ox WHEN 3 THEN w - 1 - ox
           |           WHEN 5 THEN oy WHEN 6 THEN oy
           |           WHEN 7 THEN w - 1 - oy WHEN 8 THEN w - 1 - oy
           |           ELSE ox END AS sx,
           |    CASE o WHEN 3 THEN h - 1 - oy WHEN 4 THEN h - 1 - oy
           |           WHEN 5 THEN ox WHEN 6 THEN h - 1 - ox
           |           WHEN 7 THEN h - 1 - ox WHEN 8 THEN ox
           |           ELSE oy END AS sy
           |  FROM v2),
           |p AS (SELECT doc_id, o, ow, oh, ox, oy, $vAt AS px FROM e)
           |SELECT doc_id, CAST(o AS INT) AS orientation,
           |  CAST(ow AS INT) AS width, CAST(oh AS INT) AS height,
           |  CAST(ow * oh * 3 AS BIGINT) AS n_bytes,
           |  CAST(sum(px) * 3 AS BIGINT) AS sum_pix,
           |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
           |  CAST(sum(CASE WHEN ox = 0 AND oy = 0 THEN px ELSE 0 END) AS INT) AS first_pix,
           |  CAST(sum(CASE WHEN ox = ow - 1 AND oy = oh - 1 THEN px ELSE 0 END) AS INT)
           |    AS last_pix
           |FROM p GROUP BY doc_id, o, ow, oh ORDER BY doc_id""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
            val q0 = (1 + id % 16).toInt
            val jpeg = graft.codec.MediaFixtures.jpegReal(w, h,
              Seq(Array.tabulate(64)(i => if (i == 0) q0 else 16)),
              (_, bx, by) => Array.tabulate(64)(i =>
                if (i == 0) (((id * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt else 0))
            (id, graft.codec.MediaFixtures.jpegWithExif(jpeg,
              orientation = (1 + id % 8).toInt, littleEndian = id % 2 == 0))
          })
          .toDF("doc_id", "blob")
        val oriented = Multimodal.exifAutoOrient(blobs, "doc_id", "blob")
        val stats = Multimodal.pngPixelStats(
          oriented.select(col("media_id"), col("png")), "media_id", "png")
        stats.join(oriented.select(col("media_id").as("oid"), col("orientation")),
            stats("media_id") === col("oid"))
          .select(col("media_id").as("doc_id"), col("orientation"),
            col("width"), col("height"), col("n_bytes"), col("sum_pix"),
            col("min_pix"), col("max_pix"), col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── REAL-WORLD GIF decode: per-frame LOCAL color tables over a
    //    deliberately misleading all-zero global table (resolving
    //    through the wrong table → black frames → hash break), plus GCE
    //    transparency counted per frame. The oracle replays index
    //    arithmetic, each frame's table arithmetic, and the transparent
    //    count — a wrong table offset, frame/table pairing, or GCE
    //    consume-once rule breaks it. ──
    QueryDef.sql(
      "mm_gif_palette",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 12 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 9 AS BIGINT) AS h,
        |                  CAST(1 + doc_id % 3 AS BIGINT) AS nf,
        |                  CASE WHEN doc_id % 3 = 0 THEN doc_id % 251 END AS tidx
        |           FROM documents),
        |fr AS (SELECT doc_id, w, h, tidx, unnest(range(0, nf)) AS f FROM d),
        |u AS (SELECT doc_id, w, h, tidx, f, unnest(range(0, w)) AS x FROM fr),
        |v AS (SELECT doc_id, w, h, tidx, f, x, unnest(range(0, h)) AS y FROM u),
        |ix AS (SELECT doc_id, w, h, tidx, f, x, y,
        |        (doc_id * 31 + x * 7 + y * 13 + f * 29 + 5) % 256 AS ci
        |      FROM v),
        |p AS (SELECT doc_id, w, h, tidx, f, x, y, ci,
        |        (doc_id + f * 11 + ci * 3 + 1) % 256 AS r,
        |        (doc_id * 5 + f * 7 + ci * 9 + 2) % 256 AS g,
        |        (doc_id * 9 + f * 3 + ci * 7 + 3) % 256 AS bb
        |      FROM ix)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(sum(CASE WHEN ci = tidx THEN 1 ELSE 0 END) AS BIGINT) AS n_transparent,
        |  CAST(sum(r + g + bb) AS BIGINT) AS sum_rgb,
        |  CAST(min(least(r, g, bb)) AS INT) AS min_rgb,
        |  CAST(max(greatest(r, g, bb)) AS INT) AS max_rgb,
        |  CAST(sum(CASE WHEN x = 0 AND y = 0 THEN r ELSE 0 END) AS INT) AS first_rgb,
        |  CAST(sum(CASE WHEN x = w - 1 AND y = h - 1 THEN bb ELSE 0 END) AS INT) AS last_rgb
        |FROM p GROUP BY doc_id, f, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 12).toInt; val h = (1 + id % 9).toInt
            val nf = (1 + id % 3).toInt
            (id, graft.codec.MediaFixtures.gifRealPalette(w, h, nf,
              (x, y, f) => ((id * 31 + x * 7 + y * 13 + f * 29 + 5) % 256).toInt,
              tableOf = (f, ci) => {
                val r = ((id + f * 11 + ci * 3 + 1) % 256).toInt
                val g = ((id * 5 + f * 7 + ci * 9 + 2) % 256).toInt
                val b = ((id * 9 + f * 3 + ci * 7 + 3) % 256).toInt
                (r << 16) | (g << 8) | b
              },
              transparentIdx = if (id % 3 == 0) Some((id % 251).toInt) else None))
          })
          .toDF("doc_id", "blob")
        Multimodal.gifRgbStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("frame_idx"), col("width"),
            col("height"), col("n_transparent"), col("sum_rgb"), col("min_rgb"),
            col("max_rgb"), col("first_rgb"), col("last_rgb"))
          .orderBy("doc_id", "frame_idx")
    },

    // ── ROTATION-NORMALIZED near-dup — the claim mm_exif_orient exists
    //    for, proven end-to-end: each doc pair shares one logical image,
    //    the even doc stored upright, the odd doc stored ROTATED 90° CW
    //    with a real EXIF orientation-8 segment declaring it (the
    //    rot270 display fix un-does it). Upright dims are multiples of
    //    8, so the rotation is an exact block transpose and the rotated
    //    image stays DC-only-encodable. Raw dHash would miss every pair
    //    (gradients rotate); auto-orient FIRST, then the standard
    //    pigeonhole pairing — and every (even, odd) twin lands at
    //    hamming 0. The oracle computes one dhash per doc from the
    //    shared UPRIGHT closed form: it cannot even see the rotation,
    //    so only a correct EXIF parse + inverse mapping matches. ──
    QueryDef.sql(
      "mm_rotated_neardup", {
        def vAt(sx: String, sy: String): String =
          s"""greatest(0, least(255,
             |  ((((sb * 31 + (($sx) // 8) * 7 + (($sy) // 8) * 13 + 3) % 256) - 128) * q + 4 + 8192) // 8
             |    - 1024 + 128))""".stripMargin
        val g0 = vAt("(gx * w) // 9", "(gy * h) // 8")
        val g1 = vAt("((gx + 1) * w) // 9", "(gy * h) // 8")
        s"""WITH d AS (SELECT doc_id, doc_id // 2 AS sb FROM documents),
           |m AS (SELECT doc_id, sb, CAST(8 * (1 + sb % 3) AS BIGINT) AS w,
           |             CAST(8 * (1 + sb % 2) AS BIGINT) AS h,
           |             CAST(1 + sb % 16 AS BIGINT) AS q FROM d),
           |u AS (SELECT doc_id, sb, w, h, q, unnest(range(0, 8)) AS gy FROM m),
           |v AS (SELECT doc_id, sb, w, h, q, gy, unnest(range(0, 8)) AS gx FROM u),
           |b AS (SELECT doc_id, gy, gx,
           |        CASE WHEN $g1 > $g0 THEN
           |          CASE WHEN gy * 8 + gx = 63 THEN (-9223372036854775807 - 1)
           |               ELSE (CAST(1 AS BIGINT) << CAST(gy * 8 + gx AS INTEGER)) END
           |        ELSE 0 END AS term
           |      FROM v),
           |dh AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS dhash FROM b GROUP BY doc_id)
           |SELECT a.doc_id AS id_a, c.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
           |FROM dh a JOIN dh c ON a.doc_id < c.doc_id AND a.dhash = c.dhash
           |ORDER BY id_a, id_b""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val sb = id / 2
            val wB = (1 + sb % 3).toInt; val hB = (1 + sb % 2).toInt // blocks
            val q0 = (1 + sb % 16).toInt
            def dc(bx: Int, by: Int): Int = (((sb * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt
            val qt = Array.tabulate(64)(i => if (i == 0) q0 else 16)
            val blob =
              if (id % 2 == 0)
                graft.codec.MediaFixtures.jpegReal(wB * 8, hB * 8, Seq(qt),
                  (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(bx, by) else 0))
              else {
                // stored = upright rotated 90° CW at block level:
                // stored block (BX, BY) = upright block (BY, hB-1-BX),
                // stored dims (hB·8, wB·8); orientation 8 restores it
                val rotated = graft.codec.MediaFixtures.jpegReal(hB * 8, wB * 8, Seq(qt),
                  (_, bx, by) => Array.tabulate(64)(i =>
                    if (i == 0) dc(by, hB - 1 - bx) else 0))
                graft.codec.MediaFixtures.jpegWithExif(rotated,
                  orientation = 8, littleEndian = sb % 2 == 0)
              }
            (id, blob)
          })
          .toDF("doc_id", "blob")
        val upright = Multimodal.exifAutoOrient(blobs, "doc_id", "blob")
          .select(col("media_id"), col("png"))
        Multimodal.imageNearDupPairs(upright, "media_id", "png", maxHamming = 0)
          .orderBy("id_a", "id_b")
    },

    // ── Spectral audio features — exact-integer 16-point DFT band
    //    energies over decoded PCM (the speech/hiss/tone curation lens):
    //    both engines index the SAME Q10 cosine literals
    //    (Multimodal.Dft16CosQ10), so re/im/power replay bit-for-bit —
    //    per frame: re = Σ s·cos, im = Σ s·sin (sin = the table rotated
    //    by 12), power = (re² + im²) // 2^20, summed per (doc, channel,
    //    bin 0..8). A single wrong table entry, frame boundary, or
    //    rounding step breaks the hash. ──
    QueryDef.sql(
      "mm_audio_spectral",
      """WITH ct AS (SELECT unnest(range(0, 16)) AS j,
        |  unnest([1024, 946, 724, 392, 0, -392, -724, -946,
        |          -1024, -946, -724, -392, 0, 392, 724, 946]) AS v),
        |f AS (SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS nch,
        |    CAST(1 + doc_id % 50 AS BIGINT) AS ns
        |  FROM documents WHERE 1 + doc_id % 50 >= 16),
        |cc AS (SELECT doc_id, ns, ns // 16 AS n_frames, unnest(range(0, nch)) AS c FROM f),
        |fr AS (SELECT doc_id, c, n_frames, unnest(range(0, n_frames)) AS fi FROM cc),
        |kk AS (SELECT doc_id, c, n_frames, fi, unnest(range(0, 9)) AS k FROM fr),
        |ii AS (SELECT doc_id, c, n_frames, fi, k, unnest(range(0, 16)) AS i FROM kk),
        |t AS (SELECT doc_id, c, n_frames, fi, k, i,
        |        ((doc_id * 31 + (fi * 16 + i) * 7 + c * 13 + 11) % 65536) - 32768 AS s,
        |        (i * k) % 16 AS j1, ((i * k) % 16 + 12) % 16 AS j2
        |      FROM ii),
        |ri AS (SELECT doc_id, c, n_frames, fi, k,
        |        sum(t.s * c1.v) AS re, sum(t.s * c2.v) AS im
        |      FROM t JOIN ct c1 ON t.j1 = c1.j JOIN ct c2 ON t.j2 = c2.j
        |      GROUP BY doc_id, c, n_frames, fi, k),
        |pw AS (SELECT doc_id, c, n_frames, k,
        |        (re * re + im * im) // 1048576 AS p
        |      FROM ri)
        |SELECT doc_id, CAST(c AS INT) AS channel, CAST(k AS INT) AS bin,
        |  CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(sum(p) AS BIGINT) AS sum_power
        |FROM pw GROUP BY doc_id, c, k, n_frames
        |ORDER BY doc_id, channel, bin""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val rate = (8000 * (1 + id % 5)).toInt
            val nch = (1 + id % 2).toInt
            val ns = (1 + id % 50).toInt
            (id, graft.codec.MediaFixtures.wav(nch, rate, ns,
              (i, c) => graft.codec.MediaFixtures.pcmSample(id, i, c)))
          })
          .toDF("doc_id", "blob")
        Multimodal.spectralFeatures(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("channel"), col("bin"),
            col("n_frames"), col("sum_power"))
          .orderBy("doc_id", "channel", "bin")
    },

    // ── TAR SHARD round trip — the WebDataset-style distribution layer:
    //    every doc's WAV payload packs into its shard's USTAR archive
    //    (one shuffle on the shard id, one archive per group), the
    //    archives are PARSED BACK by the engine's own tar reader, and
    //    the recovered members decode through audioFeatures. The oracle
    //    replays shard assignment + every decoded sample from seed
    //    arithmetic — a wrong member boundary, padding, name, or
    //    misrouted member breaks the hash. ──
    QueryDef.sql(
      "mm_tar_shards",
      """WITH f AS (SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(8000 * (1 + doc_id % 5) AS BIGINT) AS rate,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS nch,
        |    CAST(1 + doc_id % 50 AS BIGINT) AS ns
        |  FROM documents),
        |cc AS (SELECT doc_id, shard, rate, ns, unnest(range(0, nch)) AS c FROM f),
        |o AS (SELECT doc_id, shard, rate, ns, c, unnest(range(0, ns)) AS i FROM cc),
        |v AS (SELECT doc_id, shard, rate, ns, c, i,
        |        ((doc_id * 31 + i * 7 + c * 13 + 11) % 65536) - 32768 AS s
        |      FROM o)
        |SELECT CAST(shard AS INT) AS shard, doc_id AS member_id,
        |  CAST(c AS INT) AS channel, ns AS n_samples,
        |  CAST(sum(s) AS BIGINT) AS sum_s,
        |  CAST(sum(s * s) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(s)) AS INT) AS peak
        |FROM v GROUP BY doc_id, shard, c, ns
        |ORDER BY member_id, channel""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val rate = (8000 * (1 + id % 5)).toInt
            val nch = (1 + id % 2).toInt
            val ns = (1 + id % 50).toInt
            (id, (id % 8).toInt, graft.codec.MediaFixtures.wav(nch, rate, ns,
              (i, c) => graft.codec.MediaFixtures.pcmSample(id, i, c)))
          })
          .toDF("doc_id", "shard", "blob")
        val tars = Sharding.packTarShards(blobs, "shard", "doc_id", "blob")
        val members = Sharding.readTarMembers(tars, "shard", "tar")
        val feats = Multimodal.audioFeatures(members, "member_id", "blob")
        feats.join(members.select(col("shard"), col("member_id")),
            feats("media_id") === members("member_id"))
          .select(col("shard"), col("media_id").as("member_id"), col("channel"),
            col("n_samples"), col("sum_s"), col("sum_sq"), col("peak"))
          .orderBy("member_id", "channel")
    },

    // ── TAR WRITER byte layout — tar is the one container whose WRITTEN
    //    bytes are oracle-safe (no compression, zero mtimes): per shard,
    //    the exact archive size is pure arithmetic — Σ members (512-byte
    //    header + payload padded to 512) + the 1024-byte terminator,
    //    with payload = the WAV fixture's 44 + ns·nch·2 bytes. A single
    //    padding or terminator bug shifts every size. ──
    QueryDef.sql(
      "mm_tar_shard_sizes",
      """WITH f AS (SELECT doc_id, doc_id % 8 AS shard,
        |    44 + (1 + doc_id % 50) * (1 + doc_id % 2) * 2 AS wav_bytes
        |  FROM documents)
        |SELECT CAST(shard AS INT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(sum(512 + ((wav_bytes + 511) // 512) * 512) + 1024 AS BIGINT) AS n_tar_bytes
        |FROM f GROUP BY shard ORDER BY shard""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val rate = (8000 * (1 + id % 5)).toInt
            val nch = (1 + id % 2).toInt
            val ns = (1 + id % 50).toInt
            (id, (id % 8).toInt, graft.codec.MediaFixtures.wav(nch, rate, ns,
              (i, c) => graft.codec.MediaFixtures.pcmSample(id, i, c)))
          })
          .toDF("doc_id", "shard", "blob")
        Sharding.packTarShards(blobs, "shard", "doc_id", "blob")
          .select(col("shard"), col("n_members"), col("n_tar_bytes"))
          .orderBy("shard")
    },

    // ── ZIP SHARD round trip + byte layout — the third deterministic
    //    container beside tar and WARC: STORED entries, zeroed DOS
    //    times, so the archive size is pure arithmetic (30-byte local
    //    header + 46-byte central entry + 2·16-byte name + payload per
    //    member, 22-byte EOCD) AND the payloads round-trip through the
    //    engine's own central-directory parser with CRC verification.
    //    One query pins both: exact shard byte sizes from the packer,
    //    md5 over the id-ordered payload concatenation from the
    //    reader — a header field, CRC, offset, or member-order bug
    //    breaks one of the two. ──
    QueryDef.sql(
      "mm_zip_shards",
      """WITH f AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |    'doc:' || doc_id || ':' || coalesce(text, '') AS payload
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(sum(30 + 46 + 32 + length(payload)) + 22 AS BIGINT) AS n_zip_bytes,
        |  md5(string_agg(payload, '' ORDER BY doc_id)) AS members_md5
        |FROM f GROUP BY shard ORDER BY shard""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"),
            concat(lit("doc:"), col("doc_id").cast("string"), lit(":"),
              coalesce(col("text"), lit(""))).as("payload"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, p) =>
            (id, (id % 8).toInt, p.getBytes("UTF-8"))
          })
          .toDF("doc_id", "shard", "blob")
        val zips = Sharding.packZipShards(blobs, "shard", "doc_id", "blob")
        val members = Sharding.readZipMembers(zips, "shard", "zip")
        val agg = members
          .groupBy(col("shard"))
          .agg(
            md5(array_join(
              transform(array_sort(collect_list(struct(col("member_id"), col("blob").cast("string").as("s")))),
                x => x("s")), "").cast("binary")).as("members_md5"))
        zips.select(col("shard"), col("n_members"), col("n_zip_bytes"))
          .join(agg, Seq("shard"))
          .select(col("shard"), col("n_members"), col("n_zip_bytes"), col("members_md5"))
          .orderBy("shard")
    },

    // ── Perceptual image fingerprint (dHash) over REAL decoded pixels:
    //    PNG decode → integer gray → 9×8 nearest-neighbor grid → 64
    //    horizontal-gradient sign bits as one LONG. The fixture builds
    //    brightness-shifted DUPLICATE images (same doc_id%100 base ⇒
    //    identical dims and gradients; doc_id÷100 adds a constant
    //    brightness shift) — dHash's defining invariance. The oracle
    //    replays decode + gray + sampling + gradient + signed bit-63
    //    assembly entirely from the seed arithmetic. ──
    QueryDef.sql(
      "mm_image_dhash", {
        def gray(sx: String, sy: String): String = {
          val t = (0 to 2).map(c =>
            s"(((sb * 31 + ($sx) * 7 + ($sy) * 13 + $c * 11 + 5) % 256) % 200 + sh * 3)")
          s"((${t.mkString(" + ")}) // 3)"
        }
        val g0 = gray("(gx * w) // 9", "(gy * h) // 8")
        val g1 = gray("((gx + 1) * w) // 9", "(gy * h) // 8")
        s"""WITH d AS (SELECT doc_id, doc_id % 100 AS sb, (doc_id // 100) % 3 AS sh FROM documents),
           |m AS (SELECT doc_id, sb, sh, CAST(1 + sb % 24 AS BIGINT) AS w,
           |             CAST(1 + sb % 18 AS BIGINT) AS h FROM d),
           |u AS (SELECT doc_id, sb, sh, w, h, unnest(range(0, 8)) AS gy FROM m),
           |v AS (SELECT doc_id, sb, sh, w, h, gy, unnest(range(0, 8)) AS gx FROM u),
           |b AS (SELECT doc_id, gy, gx,
           |        CASE WHEN $g1 > $g0 THEN
           |          CASE WHEN gy * 8 + gx = 63 THEN (-9223372036854775807 - 1)
           |               ELSE (CAST(1 AS BIGINT) << CAST(gy * 8 + gx AS INTEGER)) END
           |        ELSE 0 END AS term
           |      FROM v)
           |SELECT doc_id, CAST(sum(term) AS BIGINT) AS dhash
           |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val sb = id % 100; val sh = ((id / 100) % 3).toInt
            val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(sb, x, y, c) % 200 + sh * 3,
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        Multimodal.dHash64(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("dhash"))
          .orderBy("doc_id")
    },

    // ── Image NEAR-DUP pairs — multimodal dedup as a first-class
    //    operator: the 64-bit pigeonhole Hamming-ball machinery applied
    //    to the dHash longs, so brightness-shifted copies pair at
    //    hamming 0 without any all-pairs scan. The oracle computes the
    //    same dHash longs and takes the exact ball with xor+bit_count.
    //    ──
    QueryDef.sql(
      "mm_image_neardup_pairs", {
        def gray(sx: String, sy: String): String = {
          val t = (0 to 2).map(c =>
            s"(((sb * 31 + ($sx) * 7 + ($sy) * 13 + $c * 11 + 5) % 256) % 200 + sh * 3)")
          s"((${t.mkString(" + ")}) // 3)"
        }
        val g0 = gray("(gx * w) // 9", "(gy * h) // 8")
        val g1 = gray("((gx + 1) * w) // 9", "(gy * h) // 8")
        s"""WITH d AS (SELECT doc_id, doc_id % 100 AS sb, (doc_id // 100) % 3 AS sh FROM documents),
           |m AS (SELECT doc_id, sb, sh, CAST(1 + sb % 24 AS BIGINT) AS w,
           |             CAST(1 + sb % 18 AS BIGINT) AS h FROM d),
           |u AS (SELECT doc_id, sb, sh, w, h, unnest(range(0, 8)) AS gy FROM m),
           |v AS (SELECT doc_id, sb, sh, w, h, gy, unnest(range(0, 8)) AS gx FROM u),
           |b AS (SELECT doc_id, gy, gx,
           |        CASE WHEN $g1 > $g0 THEN
           |          CASE WHEN gy * 8 + gx = 63 THEN (-9223372036854775807 - 1)
           |               ELSE (CAST(1 AS BIGINT) << CAST(gy * 8 + gx AS INTEGER)) END
           |        ELSE 0 END AS term
           |      FROM v),
           |dh AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS dhash FROM b GROUP BY doc_id)
           |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           |  CAST(bit_count(xor(a.dhash, c.dhash)) AS BIGINT) AS hamming
           |FROM dh a JOIN dh c ON a.doc_id < c.doc_id
           |WHERE bit_count(xor(a.dhash, c.dhash)) <= 2
           |ORDER BY id_a, id_b""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val sb = id % 100; val sh = ((id / 100) % 3).toInt
            val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(sb, x, y, c) % 200 + sh * 3,
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        Multimodal.imageNearDupPairs(blobs, "doc_id", "blob", maxHamming = 2)
          .orderBy("id_a", "id_b")
    },

    // ── Audio features over REAL decoded PCM — the signal-level curation
    //    gate (energy, DC offset, zero-crossing rate, clip peak), all
    //    exact integers per (media, channel); the oracle replays every
    //    decoded sample from the fixture arithmetic. ──
    QueryDef.sql(
      "mm_audio_features",
      """WITH f AS (SELECT doc_id,
        |    CAST(8000 * (1 + doc_id % 5) AS BIGINT) AS rate,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS nch,
        |    CAST(1 + doc_id % 50 AS BIGINT) AS ns
        |  FROM documents WHERE doc_id % 4 = 3),
        |cc AS (SELECT doc_id, rate, ns, unnest(range(0, nch)) AS c FROM f),
        |o AS (SELECT doc_id, rate, ns, c, unnest(range(0, ns)) AS i FROM cc),
        |v AS (SELECT doc_id, rate, ns, c, i,
        |        ((doc_id * 31 + i * 7 + c * 13 + 11) % 65536) - 32768 AS s,
        |        CASE WHEN i > 0 THEN
        |          ((doc_id * 31 + (i - 1) * 7 + c * 13 + 11) % 65536) - 32768 END AS sp
        |      FROM o)
        |SELECT doc_id, CAST(c AS INT) AS channel, CAST(rate AS INT) AS sample_rate,
        |  ns AS n_samples, CAST(sum(s) AS BIGINT) AS sum_s,
        |  CAST(sum(s * s) AS BIGINT) AS sum_sq,
        |  CAST(sum(CASE WHEN i > 0 AND ((s < 0) <> (sp < 0)) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS zero_crossings,
        |  CAST(max(abs(s)) AS INT) AS peak
        |FROM v GROUP BY doc_id, c, rate, ns
        |ORDER BY doc_id, channel""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.MediaFixtures.build(id))))
          .toDF("doc_id", "blob")
        Multimodal.audioFeatures(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("channel"), col("sample_rate"),
            col("n_samples"), col("sum_s"), col("sum_sq"),
            col("zero_crossings"), col("peak"))
          .orderBy("doc_id", "channel")
    },

    // ── Multimodal → similarity bridge: gray-histogram image embeddings
    //    from REAL decoded pixels, then the standard broadcast-query
    //    cosine scan over them — image search running on the SAME
    //    similarity operator as the text/vector stack (integer count
    //    vectors, so both engines build the embedding bit-for-bit and
    //    cosine is the one IEEE step). ──
    QueryDef.sql(
      "mm_image_similarity", {
        def grayPix = {
          val t = (0 to 2).map(c =>
            s"(((sb * 31 + x * 7 + y * 13 + $c * 11 + 5) % 256) % 200 + sh * 3)")
          s"((${t.mkString(" + ")}) // 3)"
        }
        s"""WITH d AS (SELECT doc_id, doc_id % 100 AS sb, (doc_id // 100) % 3 AS sh FROM documents),
           |m AS (SELECT doc_id, sb, sh, CAST(1 + sb % 24 AS BIGINT) AS w,
           |             CAST(1 + sb % 18 AS BIGINT) AS h FROM d),
           |u AS (SELECT doc_id, sb, sh, w, h, unnest(range(0, w)) AS x FROM m),
           |v AS (SELECT doc_id, sb, sh, x, unnest(range(0, h)) AS y FROM u),
           |g AS (SELECT doc_id, $grayPix AS gr FROM v),
           |hb AS (SELECT doc_id, gr // 32 AS bin, CAST(count(*) AS BIGINT) AS cnt
           |       FROM g GROUP BY 1, 2),
           |grid AS (SELECT d.doc_id, r.range AS bin FROM d, range(0, 8) r),
           |hv AS (SELECT grid.doc_id, grid.bin, coalesce(hb.cnt, 0) AS cnt
           |       FROM grid LEFT JOIN hb ON hb.doc_id = grid.doc_id AND hb.bin = grid.bin),
           |q AS (SELECT bin, cnt AS qc FROM hv WHERE doc_id = 0),
           |s AS (SELECT hv.doc_id,
           |        sum(CAST(hv.cnt AS DOUBLE) * CAST(q.qc AS DOUBLE)) AS dot,
           |        sum(CAST(hv.cnt AS DOUBLE) * CAST(hv.cnt AS DOUBLE)) AS na,
           |        sum(CAST(q.qc AS DOUBLE) * CAST(q.qc AS DOUBLE)) AS nb
           |      FROM hv JOIN q USING (bin) WHERE hv.doc_id <> 0 GROUP BY 1)
           |SELECT doc_id, round(dot / sqrt(na * nb), 4) AS cos_sim
           |FROM s WHERE na * nb > 0
           |ORDER BY cos_sim DESC, doc_id LIMIT 20""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val sb = id % 100; val sh = ((id / 100) % 3).toInt
            val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(sb, x, y, c) % 200 + sh * 3,
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        val feats = Multimodal.imageHistogramFeatures(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"),
            col("features").cast("array<float>").as("features"))
        Similarity.cosineTopK(
          feats.filter(col("doc_id") =!= 0), "doc_id", "features",
          query = feats.filter(col("doc_id") === 0), k = 20)
    },

    // ── CROSS-MODAL dedup report — the policy view a multimodal corpus
    //    needs: which candidate pairs are duplicates by TEXT (LSH +
    //    jaccard ≥ 0.8), by IMAGE (equal dHash over really-decoded
    //    pixels), or by BOTH. One pass: each pair generator runs once,
    //    flags meet in a full-outer join, one aggregate reads the three
    //    counts (the dedup_banding_recall shape). The oracle recomputes
    //    both pair sets from scratch — text via the banding SQL, image
    //    via the dHash arithmetic — and takes the same counts. ──
    QueryDef.sql(
      "mm_crossmodal_dedup", {
        def gray(sx: String, sy: String): String = {
          val t = (0 to 2).map(c =>
            s"(((sb * 31 + ($sx) * 7 + ($sy) * 13 + $c * 11 + 5) % 256) % 200 + sh * 3)")
          s"((${t.mkString(" + ")}) // 3)"
        }
        val g0 = gray("(gx * w) // 9", "(gy * h) // 8")
        val g1 = gray("((gx + 1) * w) // 9", "(gy * h) // 8")
        s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
           |sh0 AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
           |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh0),
           |m0 AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh0),
           |b0 AS (SELECT doc_id, i AS band_idx,
           |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
           |      FROM m0, (SELECT unnest(range(0, 4)) AS i)),
           |cp AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b
           |       FROM b0 a JOIN b0 c USING (band_idx, band_hash)
           |       WHERE a.doc_id < c.doc_id GROUP BY 1, 2),
           |tp AS (SELECT id_a, id_b FROM cp
           |       JOIN shd x ON x.doc_id = cp.id_a JOIN shd y ON y.doc_id = cp.id_b
           |       WHERE ${duckJaccard("x.shd", "y.shd")} >= 0.8),
           |dd AS (SELECT doc_id, doc_id % 100 AS sb, (doc_id // 100) % 3 AS sh FROM documents),
           |mm AS (SELECT doc_id, sb, sh, CAST(1 + sb % 24 AS BIGINT) AS w,
           |             CAST(1 + sb % 18 AS BIGINT) AS h FROM dd),
           |uu AS (SELECT doc_id, sb, sh, w, h, unnest(range(0, 8)) AS gy FROM mm),
           |vv AS (SELECT doc_id, sb, sh, w, h, gy, unnest(range(0, 8)) AS gx FROM uu),
           |bb AS (SELECT doc_id, CASE WHEN $g1 > $g0 THEN
           |          CASE WHEN gy * 8 + gx = 63 THEN (-9223372036854775807 - 1)
           |               ELSE (CAST(1 AS BIGINT) << CAST(gy * 8 + gx AS INTEGER)) END
           |        ELSE 0 END AS term
           |      FROM vv),
           |dh AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS dhash FROM bb GROUP BY doc_id),
           |ip AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b
           |       FROM dh a JOIN dh c ON a.doc_id < c.doc_id WHERE a.dhash = c.dhash)
           |SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM tp) AS n_text_pairs,
           |  (SELECT CAST(count(*) AS BIGINT) FROM ip) AS n_image_pairs,
           |  (SELECT CAST(count(*) AS BIGINT) FROM tp JOIN ip USING (id_a, id_b)) AS n_both""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        val textPairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
            shingleN = 3, k = 8, bands = 4)
          .filter(col("jaccard") >= 0.8)
          .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"),
            lit(1L).as("is_text"))
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val sb = id % 100; val shv = ((id / 100) % 3).toInt
            val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(sb, x, y, c) % 200 + shv * 3,
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        val imgPairs = Multimodal.imageNearDupPairs(blobs, "doc_id", "blob", maxHamming = 0)
          .select(col("id_a"), col("id_b"), lit(1L).as("is_img"))
        textPairs.join(imgPairs, Seq("id_a", "id_b"), "full_outer")
          .agg(
            coalesce(sum(col("is_text")), lit(0L)).as("n_text_pairs"),
            coalesce(sum(col("is_img")), lit(0L)).as("n_image_pairs"),
            coalesce(sum(col("is_text") * col("is_img")), lit(0L)).as("n_both"))
    },

    // ── Video scene-cut detection over REAL decoded frames: per-frame
    //    dHash on the LZW-decoded GIF rasters, consecutive frames
    //    compared by Hamming distance. Frame pixels are md5-mixed (an
    //    AFFINE per-frame formula would make a re-seed a constant
    //    brightness shift, which dHash is — correctly — invariant to;
    //    measured: 0 cuts, the invariance proving itself). Every ODD
    //    doc hard-cuts at every frame boundary (each frame re-seeded),
    //    every EVEN doc is a static scene (hamming exactly 0); cut
    //    detectability honestly degrades with resolution (a 2-pixel-
    //    wide gif has ~8 active gradient bits). ──
    QueryDef.sql(
      "mm_video_scene_cuts", {
        def pix(sx: String, sy: String): String =
          s"CAST('0x' || substr(md5(sf || ':' || ($sx) || ':' || ($sy)), 1, 2) AS INTEGER)"
        val g0 = pix("(gx * w) // 9", "(gy * h) // 8")
        val g1 = pix("((gx + 1) * w) // 9", "(gy * h) // 8")
        s"""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 12 AS BIGINT) AS w,
           |                  CAST(1 + doc_id % 9 AS BIGINT) AS h,
           |                  CAST(1 + doc_id % 3 AS BIGINT) AS nf FROM documents),
           |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS fr FROM d),
           |sfc AS (SELECT doc_id, w, h, fr,
           |          doc_id + fr * (doc_id % 2) * 7919 AS sf FROM f),
           |u AS (SELECT doc_id, w, h, fr, sf, unnest(range(0, 8)) AS gy FROM sfc),
           |v AS (SELECT doc_id, w, h, fr, sf, gy, unnest(range(0, 8)) AS gx FROM u),
           |b AS (SELECT doc_id, fr, CASE WHEN $g1 > $g0 THEN
           |          CASE WHEN gy * 8 + gx = 63 THEN (-9223372036854775807 - 1)
           |               ELSE (CAST(1 AS BIGINT) << CAST(gy * 8 + gx AS INTEGER)) END
           |        ELSE 0 END AS term
           |      FROM v),
           |dh AS (SELECT doc_id, fr, CAST(sum(term) AS BIGINT) AS dhash
           |       FROM b GROUP BY doc_id, fr)
           |SELECT a.doc_id AS doc_id, CAST(a.fr AS INT) AS frame_idx,
           |  CAST(bit_count(xor(a.dhash, c.dhash)) AS BIGINT) AS hamming,
           |  bit_count(xor(a.dhash, c.dhash)) > 16 AS is_cut
           |FROM dh a JOIN dh c ON c.doc_id = a.doc_id AND c.fr = a.fr + 1
           |ORDER BY a.doc_id, frame_idx""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val md = java.security.MessageDigest.getInstance("MD5")
            it.map { id =>
              val w = (1 + id % 12).toInt; val h = (1 + id % 9).toInt
              val nf = (1 + id % 3).toInt
              (id, graft.codec.MediaFixtures.gifReal(w, h, nf,
                (x, y, f) => {
                  val sf = id + f.toLong * (id % 2) * 7919L
                  md.reset()
                  md.digest(s"$sf:$x:$y".getBytes("UTF-8"))(0) & 0xff
                }))
            }
          }
          .toDF("doc_id", "blob")
        val dh = Multimodal.frameDHash64(blobs, "doc_id", "blob")
        val a = dh.select(col("media_id").as("doc_id"), col("frame_idx"), col("dhash").as("_ha"))
        val b = dh.select(col("media_id").as("doc_id"),
          (col("frame_idx") - 1).as("frame_idx"), col("dhash").as("_hb"))
        a.join(b, Seq("doc_id", "frame_idx"))
          .select(col("doc_id"), col("frame_idx"),
            bit_count(col("_ha").bitwiseXOR(col("_hb"))).cast("long").as("hamming"))
          .withColumn("is_cut", col("hamming") > 16)
          .orderBy("doc_id", "frame_idx")
    },

    // ── Multimodal → STORED-INDEX lifecycle: the image embeddings from
    //    really-decoded pixels go through the same publish-once /
    //    serve-many IVF machinery as the text/vector stack (cells from
    //    stored centroids, probes=1 cell pruning, in-cell cosine
    //    re-rank). The oracle rebuilds the histogram vectors in SQL and
    //    replays assignment → probe → re-rank — the ivfBatchOracle
    //    skeleton with the embeddings table swapped for the arithmetic
    //    histogram CTE. ──
    QueryDef.sql(
      "mm_image_ivf", {
        def grayPix = {
          val t = (0 to 2).map(c =>
            s"(((sb * 31 + x * 7 + y * 13 + $c * 11 + 5) % 256) % 200 + sh * 3)")
          s"((${t.mkString(" + ")}) // 3)"
        }
        s"""WITH dd AS (SELECT doc_id, doc_id % 100 AS sb, (doc_id // 100) % 3 AS sh FROM documents),
           |mm AS (SELECT doc_id, sb, sh, CAST(1 + sb % 24 AS BIGINT) AS w,
           |             CAST(1 + sb % 18 AS BIGINT) AS h FROM dd),
           |uu AS (SELECT doc_id, sb, sh, w, h, unnest(range(0, w)) AS x FROM mm),
           |vv AS (SELECT doc_id, sb, sh, x, unnest(range(0, h)) AS y FROM uu),
           |g AS (SELECT doc_id, $grayPix AS gr FROM vv),
           |hb AS (SELECT doc_id, gr // 32 AS bin, CAST(count(*) AS BIGINT) AS cnt
           |       FROM g GROUP BY 1, 2),
           |grid AS (SELECT dd.doc_id, r.range AS bin FROM dd, range(0, 8) r),
           |emb AS (SELECT grid.doc_id AS vec_id,
           |          list(CAST(coalesce(hb.cnt, 0) AS DOUBLE) ORDER BY grid.bin) AS embedding
           |        FROM grid LEFT JOIN hb ON hb.doc_id = grid.doc_id AND hb.bin = grid.bin
           |        GROUP BY grid.doc_id),
           |c AS (SELECT vec_id AS cid, embedding AS cv FROM emb WHERE vec_id BETWEEN 1 AND 8),
           |v AS (SELECT vec_id, embedding FROM emb WHERE vec_id > 8),
           |q AS (SELECT vec_id AS qid, embedding AS qe FROM emb WHERE vec_id < 4),
           |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
           |s AS (SELECT vec_id, cid,
           |        sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nb
           |      FROM u GROUP BY 1, 2),
           |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
           |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
           |      FROM s WHERE na * nb > 0),
           |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
           |uq AS (SELECT q.qid, c.cid, unnest(q.qe) AS x, unnest(c.cv) AS y FROM q, c),
           |sq AS (SELECT qid, cid,
           |        sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nb
           |       FROM uq GROUP BY 1, 2),
           |rq AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
           |       FROM sq WHERE na * nb > 0),
           |qp AS (SELECT qid, cid FROM rq WHERE rn <= 1),
           |cand AS (SELECT qp.qid, a.vec_id FROM asg a JOIN qp ON a.cid = qp.cid),
           |u2 AS (SELECT cand.qid, cand.vec_id, unnest(e.embedding) AS x, unnest(qe2.embedding) AS y
           |       FROM cand JOIN emb e ON e.vec_id = cand.vec_id
           |                 JOIN emb qe2 ON qe2.vec_id = cand.qid),
           |s2 AS (SELECT qid, vec_id,
           |        sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nb
           |       FROM u2 GROUP BY 1, 2),
           |rk AS (SELECT qid, vec_id, round(dot / sqrt(na * nb), 4) AS cos_sim,
           |        row_number() OVER (PARTITION BY qid
           |          ORDER BY round(dot / sqrt(na * nb), 4) DESC, vec_id) AS rn
           |       FROM s2 WHERE na * nb > 0)
           |SELECT qid AS query_id, vec_id AS doc_id, cos_sim, CAST(rn AS INT) AS "rank"
           |FROM rk WHERE rn <= 8 ORDER BY query_id, "rank"""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val sb = id % 100; val shv = ((id / 100) % 3).toInt
            val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
            (id, graft.codec.MediaFixtures.pngReal(w, h,
              (x, y, c) => graft.codec.MediaFixtures.pixel(sb, x, y, c) % 200 + shv * 3,
              filterOf = y => ((id + y) % 5).toInt))
          })
          .toDF("doc_id", "blob")
        val feats = Multimodal.imageHistogramFeatures(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"),
            col("features").cast("array<float>").as("features"))
        val store = storedIndex("ivf_img", d, s) { st =>
          graft.ingest.VectorIndex.publish(st, "imgdriver",
            feats.filter(col("doc_id").between(1, 8)).select(col("doc_id"), col("features")))
        }
        graft.ingest.VectorIndex.ivfTopKBatch(store, "imgdriver",
          feats.filter(col("doc_id") > 8), "doc_id", "features",
          queries = feats.filter(col("doc_id") < 4), queryIdCol = "doc_id",
          k = 8, probes = 1)
          .orderBy("query_id", "rank")
    },

    // ── REAL baseline-JPEG pixel decode — the last pixel gap closed in
    //    pure JVM arithmetic: the fixture is a COMPLETE DQT/SOF0/DHT/SOS
    //    stream whose entropy data is genuinely Huffman-coded (flat
    //    canonical tables, decodable by any baseline decoder — the spec
    //    pins it against javax.imageio), and the engine decodes it with
    //    its own Huffman + dequant + fixed-point Loeffler IDCT. The
    //    fixtures choose QUANTIZED COEFFICIENTS in the frequency domain
    //    (DC-only blocks), which makes the decode exact seed arithmetic:
    //    every 8×8 block lands on clamp(((dc·q + 4) >> 3) + 128), the
    //    closed form DuckDB replays per block — any Huffman, predictor,
    //    dequant, IDCT, or cropping bug breaks the hash. ──
    QueryDef.sql(
      "mm_jpeg_pixels",
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 21 AS BIGINT) AS w,
        |                  CAST(1 + doc_id % 17 AS BIGINT) AS h,
        |                  CAST(1 + doc_id % 16 AS BIGINT) AS q FROM documents),
        |bx_ AS (SELECT doc_id, w, h, q, unnest(range(0, (w + 7) // 8)) AS bx FROM d),
        |by_ AS (SELECT doc_id, w, h, q, bx, unnest(range(0, (h + 7) // 8)) AS by FROM bx_),
        |v AS (SELECT doc_id, w, h, bx, by,
        |        least(8, w - bx * 8) * least(8, h - by * 8) AS cnt,
        |        greatest(0, least(255,
        |          ((((doc_id * 31 + bx * 7 + by * 13 + 3) % 256) - 128) * q + 4 + 8192) // 8
        |            - 1024 + 128)) AS px
        |      FROM by_)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(1 AS INT) AS channels, CAST(w * h AS BIGINT) AS n_bytes,
        |  CAST(sum(px * cnt) AS BIGINT) AS sum_pix,
        |  CAST(min(px) AS INT) AS min_pix, CAST(max(px) AS INT) AS max_pix,
        |  CAST(sum(CASE WHEN bx = 0 AND by = 0 THEN px ELSE 0 END) AS INT) AS first_pix,
        |  CAST(sum(CASE WHEN bx = (w - 1) // 8 AND by = (h - 1) // 8 THEN px ELSE 0 END) AS INT)
        |    AS last_pix
        |FROM v GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 21).toInt; val h = (1 + id % 17).toInt
            val q0 = (1 + id % 16).toInt
            val qt = Array.tabulate(64)(i => if (i == 0) q0 else 16)
            (id, graft.codec.MediaFixtures.jpegReal(w, h, Seq(qt),
              (_, bx, by) => Array.tabulate(64)(i =>
                if (i == 0) (((id * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt else 0)))
          })
          .toDF("doc_id", "blob")
        Multimodal.jpegPixelStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("channels"), col("n_bytes"), col("sum_pix"), col("min_pix"),
            col("max_pix"), col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── REAL 4:4:4 COLOR JPEG decode — three coefficient planes through
    //    the same entropy/IDCT path, then the fixed-point JFIF YCbCr→RGB
    //    matrix (16-bit scaled constants, +32768 rounding, >>16). The
    //    oracle replays the full chain per block: closed-form Y/Cb/Cr
    //    values, then the exact integer color conversion — a wrong
    //    constant, rounding offset, or channel order breaks the hash. ──
    QueryDef.sql(
      "mm_jpeg_color", {
        def shift16(t: String) = s"(($t + 32768 + 1073741824) // 65536 - 16384)"
        def plane(c: Int, qv: String) =
          s"""greatest(0, least(255,
             |  ((((doc_id * 31 + bx * 7 + by * 13 + $c * 29 + 3) % 200) - 100) * $qv + 4 + 8192) // 8
             |    - 1024 + 128))""".stripMargin
        s"""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 16 AS BIGINT) AS w,
           |                  CAST(1 + doc_id % 12 AS BIGINT) AS h,
           |                  CAST(1 + doc_id % 10 AS BIGINT) AS qy,
           |                  CAST(1 + doc_id % 6 AS BIGINT) AS qc FROM documents),
           |bx_ AS (SELECT doc_id, w, h, qy, qc, unnest(range(0, (w + 7) // 8)) AS bx FROM d),
           |by_ AS (SELECT doc_id, w, h, qy, qc, bx, unnest(range(0, (h + 7) // 8)) AS by FROM bx_),
           |p AS (SELECT doc_id, w, h, bx, by,
           |        least(8, w - bx * 8) * least(8, h - by * 8) AS cnt,
           |        ${plane(0, "qy")} AS yv,
           |        ${plane(1, "qc")} - 128 AS cb,
           |        ${plane(2, "qc")} - 128 AS cr
           |      FROM by_),
           |rgb AS (SELECT doc_id, w, h, bx, by, cnt,
           |        greatest(0, least(255, yv + ${shift16("91881 * cr")})) AS r,
           |        greatest(0, least(255, yv + ${shift16("-22554 * cb - 46802 * cr")})) AS g,
           |        greatest(0, least(255, yv + ${shift16("116130 * cb")})) AS b
           |      FROM p)
           |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           |  CAST(3 AS INT) AS channels, CAST(w * h * 3 AS BIGINT) AS n_bytes,
           |  CAST(sum((r + g + b) * cnt) AS BIGINT) AS sum_pix,
           |  CAST(min(least(r, g, b)) AS INT) AS min_pix,
           |  CAST(max(greatest(r, g, b)) AS INT) AS max_pix,
           |  CAST(sum(CASE WHEN bx = 0 AND by = 0 THEN r ELSE 0 END) AS INT) AS first_pix,
           |  CAST(sum(CASE WHEN bx = (w - 1) // 8 AND by = (h - 1) // 8 THEN b ELSE 0 END) AS INT)
           |    AS last_pix
           |FROM rgb GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 16).toInt; val h = (1 + id % 12).toInt
            val qy = (1 + id % 10).toInt; val qc = (1 + id % 6).toInt
            def qt(q0: Int) = Array.tabulate(64)(i => if (i == 0) q0 else 16)
            (id, graft.codec.MediaFixtures.jpegReal(w, h, Seq(qt(qy), qt(qc), qt(qc)),
              (c, bx, by) => Array.tabulate(64)(i =>
                if (i == 0) (((id * 31 + bx * 7 + by * 13 + c * 29 + 3) % 200) - 100).toInt
                else 0)))
          })
          .toDF("doc_id", "blob")
        Multimodal.jpegPixelStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("channels"), col("n_bytes"), col("sum_pix"), col("min_pix"),
            col("max_pix"), col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── REAL 4:2:0 JPEG decode — the dominant photo layout: genuine
    //    four-luma-then-chroma MCU interleave from the fixture encoder,
    //    decoded through the generalized MCU geometry with
    //    box-replication chroma upsampling (the integer-exact contract;
    //    T.81 mandates no filter). The oracle replays the whole chain
    //    PER PIXEL: luma block on the pixel grid, chroma block on the
    //    half-resolution grid, then the fixed-point color matrix — a
    //    wrong MCU order, plane stride, replication box, or crop breaks
    //    the hash. ──
    QueryDef.sql(
      "mm_jpeg_420", {
        def shift16(t: String) = s"(($t + 32768 + 1073741824) // 65536 - 16384)"
        def planeAt(c: Int, qv: String, bx: String, by: String) =
          s"""greatest(0, least(255,
             |  ((((doc_id * 31 + ($bx) * 7 + ($by) * 13 + $c * 29 + 3) % 200) - 100) * $qv + 4 + 8192) // 8
             |    - 1024 + 128))""".stripMargin
        s"""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 20 AS BIGINT) AS w,
           |                  CAST(1 + doc_id % 14 AS BIGINT) AS h,
           |                  CAST(1 + doc_id % 10 AS BIGINT) AS qy,
           |                  CAST(1 + doc_id % 6 AS BIGINT) AS qc FROM documents),
           |u AS (SELECT doc_id, w, h, qy, qc, unnest(range(0, w)) AS x FROM d),
           |v AS (SELECT doc_id, w, h, qy, qc, x, unnest(range(0, h)) AS y FROM u),
           |p AS (SELECT doc_id, w, h, x, y,
           |        ${planeAt(0, "qy", "x // 8", "y // 8")} AS yv,
           |        ${planeAt(1, "qc", "x // 16", "y // 16")} - 128 AS cb,
           |        ${planeAt(2, "qc", "x // 16", "y // 16")} - 128 AS cr
           |      FROM v),
           |rgb AS (SELECT doc_id, w, h, x, y,
           |        greatest(0, least(255, yv + ${shift16("91881 * cr")})) AS r,
           |        greatest(0, least(255, yv + ${shift16("-22554 * cb - 46802 * cr")})) AS g,
           |        greatest(0, least(255, yv + ${shift16("116130 * cb")})) AS b
           |      FROM p)
           |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           |  CAST(3 AS INT) AS channels, CAST(w * h * 3 AS BIGINT) AS n_bytes,
           |  CAST(sum(r + g + b) AS BIGINT) AS sum_pix,
           |  CAST(min(least(r, g, b)) AS INT) AS min_pix,
           |  CAST(max(greatest(r, g, b)) AS INT) AS max_pix,
           |  CAST(sum(CASE WHEN x = 0 AND y = 0 THEN r ELSE 0 END) AS INT) AS first_pix,
           |  CAST(sum(CASE WHEN x = w - 1 AND y = h - 1 THEN b ELSE 0 END) AS INT) AS last_pix
           |FROM rgb GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val w = (1 + id % 20).toInt; val h = (1 + id % 14).toInt
            val qy = (1 + id % 10).toInt; val qc = (1 + id % 6).toInt
            def qt(q0: Int) = Array.tabulate(64)(i => if (i == 0) q0 else 16)
            (id, graft.codec.MediaFixtures.jpegReal(w, h, Seq(qt(qy), qt(qc), qt(qc)),
              (c, bx, by) => Array.tabulate(64)(i =>
                if (i == 0) (((id * 31 + bx * 7 + by * 13 + c * 29 + 3) % 200) - 100).toInt
                else 0),
              sampling = Seq((2, 2), (1, 1), (1, 1))))
          })
          .toDF("doc_id", "blob")
        Multimodal.jpegPixelStats(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("width"), col("height"),
            col("channels"), col("n_bytes"), col("sum_pix"), col("min_pix"),
            col("max_pix"), col("first_pix"), col("last_pix"))
          .orderBy("doc_id")
    },

    // ── PROGRESSIVE JPEG decode (SOF2, T.81 Annex G) — the same
    //    seed-derived FULL-AC coefficients encoded twice per doc,
    //    baseline and progressive (doc-varied successive-approximation
    //    depths, band scripts, restart intervals, grayscale/4:4:4/4:2:0),
    //    both decoded by the engine's own multi-scan coefficient
    //    accumulator. Progressive transmission is a lossless reordering
    //    of the same quantized coefficients, so the two rasters must
    //    agree EXACTLY; the query joins the two fingerprint sets and
    //    emits the agreement verdict, with dims/byte-counts replayed by
    //    the oracle from the seed. A failed progressive decode drops its
    //    row (count mismatch); a single diverging pixel statistic flips
    //    twin_match. Decode rides the scan; the join is doc-keyed. ──
    QueryDef.sql(
      "mm_jpeg_progressive",
      """SELECT doc_id, CAST(1 + doc_id % 24 AS INT) AS width,
        |  CAST(1 + doc_id % 18 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
        |  CAST((1 + doc_id % 24) * (1 + doc_id % 18) *
        |       (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END) AS BIGINT) AS n_bytes,
        |  CAST(1 AS INT) AS twin_match
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        def blobsOf(progressive: Boolean) =
          Tables.documents(s, d).select(col("doc_id")).as[Long]
            .mapPartitions(_.map { id =>
              val w = (1 + id % 24).toInt; val h = (1 + id % 18).toInt
              val nc = if (id % 2 == 0) 1 else 3
              val qy = (1 + id % 8).toInt; val qc = (1 + id % 5).toInt
              def qt(q0: Int) = Array.tabulate(64)(i => if (i == 0) q0 else 16)
              val qs = if (nc == 1) Seq(qt(qy)) else Seq(qt(qy), qt(qc), qt(qc))
              val samp: Seq[(Int, Int)] =
                if (nc == 3 && id % 4 == 1) Seq((2, 2), (1, 1), (1, 1)) else Nil
              def coef(c: Int, bx: Int, by: Int): Array[Int] = Array.tabulate(64) { i =>
                if (i == 0) (((id * 31 + bx * 7 + by * 13 + c * 29 + 3) % 200) - 100).toInt
                else if (i < 20) ((bx + 2 * by + c + i) * 37) % 15 - 7
                else if (i % 11 == 0) ((bx * 3 + by + c + i) * 17) % 9 - 4
                else 0
              }
              val rst = if (id % 5 == 0) 2 else 0
              val blob =
                if (progressive)
                  graft.codec.MediaFixtures.jpegProgressive(w, h, qs, coef,
                    restartEvery = rst, sampling = samp,
                    dcAl = (id % 3).toInt, acAl = (id % 2).toInt,
                    bands = if (id % 2 == 0) Seq((1, 5), (6, 63))
                            else Seq((1, 2), (3, 20), (21, 63)))
                else
                  graft.codec.MediaFixtures.jpegReal(w, h, qs, coef,
                    restartEvery = rst, sampling = samp)
              (id, blob)
            })
            .toDF("doc_id", "blob")
        val base = Multimodal.jpegPixelStats(blobsOf(false), "doc_id", "blob").alias("b")
        val prog = Multimodal.jpegPixelStats(blobsOf(true), "doc_id", "blob").alias("p")
        base.join(prog, col("b.media_id") === col("p.media_id"))
          .select(col("b.media_id").as("doc_id"),
            col("b.width"), col("b.height"), col("b.channels"), col("b.n_bytes"),
            when(col("p.width") === col("b.width") &&
              col("p.height") === col("b.height") &&
              col("p.channels") === col("b.channels") &&
              col("p.n_bytes") === col("b.n_bytes") &&
              col("p.sum_pix") === col("b.sum_pix") &&
              col("p.min_pix") === col("b.min_pix") &&
              col("p.max_pix") === col("b.max_pix") &&
              col("p.first_pix") === col("b.first_pix") &&
              col("p.last_pix") === col("b.last_pix"), 1).otherwise(0)
              .cast("int").as("twin_match"))
          .orderBy("doc_id")
    },

    // ── CROSS-FORMAT perceptual dedup — the capstone the unified raster
    //    decode exists for: the SAME logical image stored losslessly
    //    (PNG, pixel = its block's closed-form value) and as a DC-only
    //    baseline JPEG (which decodes to exactly those values) produces
    //    IDENTICAL gray planes, so dHash pairs every (png, jpeg) twin at
    //    hamming 0 through the pigeonhole machinery — no all-pairs, no
    //    format-aware special case. The oracle computes one dhash per
    //    doc from the shared closed form (it cannot even see the format)
    //    and equality-joins. ──
    QueryDef.sql(
      "mm_crossformat_neardup", {
        // decoded gray at raster (x, y) = the closed-form block value
        def vAt(sx: String, sy: String): String =
          s"""greatest(0, least(255,
             |  ((((sb * 31 + (($sx) // 8) * 7 + (($sy) // 8) * 13 + 3) % 256) - 128) * q + 4 + 8192) // 8
             |    - 1024 + 128))""".stripMargin
        val g0 = vAt("(gx * w) // 9", "(gy * h) // 8")
        val g1 = vAt("((gx + 1) * w) // 9", "(gy * h) // 8")
        s"""WITH d AS (SELECT doc_id, doc_id // 2 AS sb FROM documents),
           |m AS (SELECT doc_id, sb, CAST(1 + sb % 24 AS BIGINT) AS w,
           |             CAST(1 + sb % 18 AS BIGINT) AS h,
           |             CAST(1 + sb % 16 AS BIGINT) AS q FROM d),
           |u AS (SELECT doc_id, sb, w, h, q, unnest(range(0, 8)) AS gy FROM m),
           |v AS (SELECT doc_id, sb, w, h, q, gy, unnest(range(0, 8)) AS gx FROM u),
           |b AS (SELECT doc_id, gy, gx,
           |        CASE WHEN $g1 > $g0 THEN
           |          CASE WHEN gy * 8 + gx = 63 THEN (-9223372036854775807 - 1)
           |               ELSE (CAST(1 AS BIGINT) << CAST(gy * 8 + gx AS INTEGER)) END
           |        ELSE 0 END AS term
           |      FROM v),
           |dh AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS dhash FROM b GROUP BY doc_id)
           |SELECT a.doc_id AS id_a, c.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
           |FROM dh a JOIN dh c ON a.doc_id < c.doc_id AND a.dhash = c.dhash
           |ORDER BY id_a, id_b""".stripMargin
      }) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val sb = id / 2
            val w = (1 + sb % 24).toInt; val h = (1 + sb % 18).toInt
            val q0 = (1 + sb % 16).toInt
            def dc(bx: Int, by: Int): Int = (((sb * 31 + bx * 7 + by * 13 + 3) % 256) - 128).toInt
            def v(bx: Int, by: Int): Int =
              math.max(0, math.min(255, ((dc(bx, by) * q0 + 4) >> 3) + 128))
            val blob =
              if (id % 2 == 0)
                graft.codec.MediaFixtures.pngReal(w, h, (x, y, _) => v(x / 8, y / 8),
                  filterOf = y => ((id + y) % 5).toInt)
              else {
                val qt = Array.tabulate(64)(i => if (i == 0) q0 else 16)
                graft.codec.MediaFixtures.jpegReal(w, h, Seq(qt),
                  (_, bx, by) => Array.tabulate(64)(i => if (i == 0) dc(bx, by) else 0))
              }
            (id, blob)
          })
          .toDF("doc_id", "blob")
        Multimodal.imageNearDupPairs(blobs, "doc_id", "blob", maxHamming = 0)
          .orderBy("id_a", "id_b")
    },

    // ── binaryFile ARRIVAL path: the same real containers, but arriving
    //    as individual FILES through Spark's binaryFile source (how raw
    //    media actually lands at scale — an object-store prefix of
    //    blobs, not a parquet column), media id recovered from the file
    //    name, then the SAME header-parse pipeline. The oracle is
    //    mm_real_decode's fixture arithmetic restricted to the written
    //    slice, so the file round trip + path-id recovery + parse are
    //    all hash-checked. At 100 TB the source partitions by file and
    //    the parse rides the read — no driver involvement; the
    //    driver-side fixture WRITE here is test scaffolding, not the
    //    operator. ──
    QueryDef.sql(
      "mm_binary_files",
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif' ELSE 'wav' END AS format,
        |  CASE WHEN doc_id % 4 < 3 THEN CAST(1 + doc_id % 640 AS INT) END AS width,
        |  CASE WHEN doc_id % 4 < 3 THEN CAST(1 + doc_id % 480 AS INT) END AS height,
        |  CAST(CASE doc_id % 4 WHEN 2 THEN 1 + doc_id % 3 WHEN 3 THEN 1 + doc_id % 50 ELSE 1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 4 = 3 THEN 16 ELSE 8 END AS INT) AS bit_depth
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val dir = java.nio.file.Files.createTempDirectory("graft-mmfiles")
        Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") < 200)
          .collect().map(_.getLong(0))
          .foreach { id =>
            java.nio.file.Files.write(dir.resolve(s"$id.bin"),
              graft.codec.MediaFixtures.build(id))
          }
        val blobs = s.read.format("binaryFile").load(dir.toString)
          .select(
            regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
            col("content").as("blob"))
        Multimodal.decodeMeta(blobs, "doc_id", "blob")
          .select(col("media_id").as("doc_id"), col("format"), col("width"),
            col("height"), col("n_frames"), col("bit_depth"))
          .orderBy("doc_id")
    },

    // ── Frame sampling over REAL containers: the n_frames driving the
    //    explode comes from actual header parsing (GIF image-descriptor
    //    walks, WAV sample-frame counts, PNG/JPEG single frames), not
    //    the stub; the oracle derives the same counts from the fixture
    //    arithmetic. stride 2, audio rows included (a WAV's "frames"
    //    are sample frames — the explode shape is the same). ───────────
    QueryDef.sql(
      "mm_real_frames",
      """WITH f AS (SELECT doc_id,
        |    CAST(CASE doc_id % 4 WHEN 2 THEN 1 + doc_id % 3 WHEN 3 THEN 1 + doc_id % 50 ELSE 1 END AS INT) AS n_frames
        |  FROM documents),
        |x AS (SELECT doc_id, n_frames, unnest(range(0, n_frames, 2)) AS fi FROM f)
        |SELECT doc_id, n_frames, CAST(fi AS INT) AS frame_idx
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.MediaFixtures.build(id))))
          .toDF("doc_id", "blob")
        val meta = Multimodal.decodeMeta(blobs, "doc_id", "blob")
        Multimodal.sampleFrames(meta, stride = 2)
          .select(col("media_id").as("doc_id"), col("n_frames"), col("frame_idx"))
          .orderBy("doc_id", "frame_idx")
    },

    // ── Winnowing fingerprint set (char 8-grams, window 4): min-hash per
    //    sliding position window, deduped — window FRAMES (ROWS BETWEEN)
    //    on both engines. ──────────────────────────────────────────────
    QueryDef.sql(
      "text_winnow_fingerprint",
      """WITH p AS (SELECT doc_id, text,
        |             unnest(range(1, greatest(length(text) - 6, 1))) AS i
        |           FROM documents WHERE length(text) >= 8),
        |h AS (SELECT doc_id, i, md5(substr(text, i, 8)) AS h,
        |        length(text) - 7 AS n FROM p),
        |w AS (SELECT doc_id, i, n,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |      FROM h)
        |SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(list(wmin))), ',') AS fingerprints
        |FROM w WHERE i - 1 <= greatest(n - 4, 0)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        // scalar (comma-joined) output: array-valued result columns risk
        // stringification mismatches in hash-compare harnesses
        TextOps.winnowingFingerprints(QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
          k = 8, window = 4)
          .select(col("doc").as("doc_id"),
            concat_ws(",", col("fingerprints")).as("fingerprints"))
          .orderBy("doc_id")
    },

    // ── IVF cell-balance report: rows per cell + the imbalance ratio
    //    (max cell / ideal uniform) — the index-health number that
    //    predicts probe tail latency (a probe into a hot cell scans
    //    that cell's whole posting list). Same assignment expression
    //    as every sim_ivf_* query; one partial-agg groupBy. ──
    QueryDef.sql(
      "sim_cell_balance",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |cnt AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_rows FROM asg GROUP BY cid),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_cells FROM cnt)
        |SELECT cnt.cid, cnt.n_rows,
        |  round(CAST(cnt.n_rows AS DOUBLE) / tot.total, 4) AS cell_frac,
        |  round(CAST(cnt.n_rows AS DOUBLE) * tot.n_cells / tot.total, 4) AS imbalance
        |FROM cnt, tot ORDER BY cid""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val cents: Seq[(Long, Seq[Float])] = emb.filter(col("vec_id").between(1, 8))
          .select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
          .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
        val cnt = emb.filter(col("vec_id") > 8)
          .select(Similarity.nearestCentroid(col("embedding"), cents, round4 = true).as("cid"))
          .groupBy("cid").agg(count(lit(1)).as("n_rows"))
        val tot = cnt.agg(sum("n_rows").as("total"), count(lit(1)).as("n_cells"))
        cnt.crossJoin(broadcast(tot))
          .select(col("cid"), col("n_rows"),
            round(col("n_rows").cast("double") / col("total"), 4).as("cell_frac"),
            round(col("n_rows").cast("double") * col("n_cells") / col("total"), 4)
              .as("imbalance"))
          .orderBy("cid")
    },

    // ── Recall-vs-probes curve: mean/min recall@5 at probes ∈ {1,2,4}
    //    — THE IVF tuning artifact (how many cells must a query touch
    //    for acceptable recall). Exact side computed once; integer-exact
    //    aggregation: sum of per-query overlaps with ONE closing
    //    division (avg of 0.2-steps would sum doubles order-
    //    dependently). Oracle CTE blocks are GENERATED per probe count
    //    from one template, so the three rungs cannot drift. ──
    QueryDef.sql(
      "sim_recall_probes_curve", {
        val perProbe = Seq(1, 2, 4).map { p =>
          s"""iv$p AS (SELECT qid, vec_id FROM (
             |  SELECT s2.qid, s2.vec_id, row_number() OVER (PARTITION BY s2.qid
             |    ORDER BY round(s2.dot / sqrt(s2.na * s2.nb), 4) DESC, s2.vec_id) AS rn
             |  FROM (SELECT cand.qid, cand.vec_id,
             |          sum(CAST(u2.x AS DOUBLE) * CAST(u2.y AS DOUBLE)) AS dot,
             |          sum(CAST(u2.x AS DOUBLE) * CAST(u2.x AS DOUBLE)) AS na,
             |          sum(CAST(u2.y AS DOUBLE) * CAST(u2.y AS DOUBLE)) AS nb
             |        FROM (SELECT qp.qid, a.vec_id
             |              FROM asg a JOIN (SELECT qid, cid FROM rq WHERE rn <= $p) qp
             |                ON a.cid = qp.cid) cand,
             |             LATERAL (SELECT unnest(e.embedding) AS x, unnest(q2.embedding) AS y
             |                      FROM embeddings e, embeddings q2
             |                      WHERE e.vec_id = cand.vec_id AND q2.vec_id = cand.qid) u2
             |        GROUP BY 1, 2) s2
             |  WHERE s2.na * s2.nb > 0) WHERE rn <= 5),
             |ov$p AS (SELECT e.qid, CAST(count(i.vec_id) AS BIGINT) AS ov
             |         FROM exact e LEFT JOIN iv$p i ON i.qid = e.qid AND i.vec_id = e.vec_id
             |         GROUP BY e.qid),
             |r$p AS (SELECT CAST($p AS BIGINT) AS probes,
             |          round(CAST(sum(ov) AS DOUBLE) / (count(*) * 5), 4) AS mean_recall,
             |          round(CAST(min(ov) AS DOUBLE) / 5, 4) AS min_recall
             |        FROM ov$p)""".stripMargin
        }.mkString(",\n")
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
           |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8),
           |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4),
           |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
           |s AS (SELECT vec_id, cid,
           |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
           |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
           |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
           |      FROM u GROUP BY 1, 2),
           |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
           |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
           |      FROM s),
           |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
           |uq AS (SELECT q.qid, c.cid, unnest(q.qe) AS x, unnest(c.cv) AS y FROM q, c),
           |sq AS (SELECT qid, cid,
           |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
           |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
           |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
           |       FROM uq GROUP BY 1, 2),
           |rq AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
           |       FROM sq),
           |ub AS (SELECT q.qid, v.vec_id, unnest(v.embedding) AS x, unnest(q.qe) AS y FROM v, q),
           |sb AS (SELECT qid, vec_id,
           |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
           |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
           |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
           |       FROM ub GROUP BY 1, 2),
           |exact AS (SELECT qid, vec_id FROM (
           |            SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
           |              ORDER BY round(dot / sqrt(na * nb), 4) DESC, vec_id) AS rn
           |            FROM sb WHERE na * nb > 0) WHERE rn <= 5),
           |$perProbe
           |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r4
           |ORDER BY probes""".stripMargin
      }) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val corpus = emb.filter(col("vec_id") > 8)
        val queries = emb.filter(col("vec_id") < 4)
        val cents = emb.filter(col("vec_id").between(1, 8))
        val exact = corpus.crossJoin(broadcast(
            queries.select(col("vec_id").as("qid"), col("embedding").as("_q"))))
          .select(col("qid"), col("vec_id"),
            round(Similarity.cosine(col("embedding"), col("_q")), 4).as("_cos"))
          .filter(col("_cos").isNotNull)
          .groupBy("qid")
          .agg(graft.expressions.BoundedCollect.boundedSortedCollect(
            struct((-col("_cos")).as("nc"), col("vec_id")), 5).as("_top"))
          .select(col("qid"), explode(col("_top")).as("_t"))
          .select(col("qid"), col("_t.vec_id").as("vec_id"))
        Seq(1, 2, 4).map { p =>
          val ivf = Similarity.ivfTopKBatch(corpus, "vec_id", "embedding",
              cents, "vec_id", queries, "vec_id", k = 5, probes = p)
            .select(col("query_id").as("qid"), col("vec_id").as("ivf_hit"))
          exact.join(ivf,
              exact("qid") === ivf("qid") && exact("vec_id") === ivf("ivf_hit"), "left_outer")
            .groupBy(exact("qid"))
            .agg(count(col("ivf_hit")).as("ov"))
            .agg(lit(p.toLong).as("probes"),
              round(sum("ov").cast("double") / (count(lit(1)) * 5), 4).as("mean_recall"),
              round(min("ov").cast("double") / 5, 4).as("min_recall"))
        }.reduce(_.unionByName(_)).orderBy("probes")
    },

    // ── Near-dup threshold calibration sweep: candidate-pair counts at
    //    a ladder of cosine thresholds in ONE pass over the sign-LSH
    //    bucketed pairs — the curve an operator reads to pick the
    //    semantic-dedup cutoff (too low merges topics, too high misses
    //    paraphrases). Conditional sums over one pair frame: the sweep
    //    costs one scan regardless of ladder length. Ladder calibrated
    //    to the corpus (bucketed-pair cosine maxes at 0.49 at sf0.1),
    //    so every rung is informative. ──
    QueryDef.sql(
      "sim_threshold_sweep", {
        val bucket = (1 to 6).map(i =>
          s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
        s"""WITH b AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
           |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.embedding AS ea, c.embedding AS eb
           |      FROM b a JOIN b c USING (bucket) WHERE a.vec_id < c.vec_id),
           |u AS (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM p),
           |s AS (SELECT id_a, id_b,
           |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
           |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
           |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
           |      FROM u GROUP BY 1, 2),
           |sc AS (SELECT round(dot / sqrt(na * nb), 4) AS cs FROM s WHERE na * nb > 0)
           |SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           |  CAST(sum(CASE WHEN cs >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS ge_010,
           |  CAST(sum(CASE WHEN cs >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS ge_020,
           |  CAST(sum(CASE WHEN cs >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS ge_030,
           |  CAST(sum(CASE WHEN cs >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS ge_040,
           |  CAST(sum(CASE WHEN cs >= 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS ge_045
           |FROM sc""".stripMargin
      }) {
      (s, d) =>
        val pairs = Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          p = 6, minCos = -2.0) // below any cosine: the ladder does the thresholding
        def ge(t: Double, name: String) =
          sum(when(col("cos_sim") >= t, 1L).otherwise(0L)).as(name)
        pairs.agg(count(lit(1)).as("n_candidates"),
          ge(0.1, "ge_010"), ge(0.2, "ge_020"), ge(0.3, "ge_030"),
          ge(0.4, "ge_040"), ge(0.45, "ge_045"))
    },

    // ── Embedding-corpus health stats: the one-row report a vector
    //    pipeline checks before indexing — row/dim counts, zero vectors
    //    (cosine-undefined), norm percentiles. Percentiles are
    //    selection-based (order-independent, exact ≡ quantile_cont);
    //    a norm MEAN would sum doubles order-dependently and is
    //    deliberately absent. ──
    QueryDef.sql(
      "sim_embedding_stats",
      """WITH u AS (SELECT vec_id, unnest(embedding) AS x FROM embeddings),
        |n AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS dims,
        |        round(sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm
        |      FROM u GROUP BY vec_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        |  min(dims) AS min_dims, max(dims) AS max_dims,
        |  CAST(sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_vectors,
        |  round(CAST(quantile_cont(norm, 0.1) AS DOUBLE), 4) AS p10_norm,
        |  round(CAST(quantile_cont(norm, 0.5) AS DOUBLE), 4) AS p50_norm,
        |  round(CAST(quantile_cont(norm, 0.9) AS DOUBLE), 4) AS p90_norm
        |FROM n""".stripMargin) {
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            size(col("embedding")).cast("long").as("dims"),
            round(sqrt(aggregate(col("embedding"),
              lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))), 4).as("norm"))
          .agg(count(lit(1)).as("n_vectors"),
            min("dims").as("min_dims"), max("dims").as("max_dims"),
            sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("zero_vectors"),
            round(expr("percentile(norm, 0.1)"), 4).as("p10_norm"),
            round(expr("percentile(norm, 0.5)"), 4).as("p50_norm"),
            round(expr("percentile(norm, 0.9)"), 4).as("p90_norm"))
    },

    // ── ANN recall@k as a first-class measured query: per probe query,
    //    |IVF(probes=1) top-5 ∩ exact top-5| / 5 — the approximation-
    //    quality number an ANN deployment monitors, here oracle-pinned
    //    (both sides are deterministic given the data, so recall is
    //    too). Exact side = brute-force bounded heap; IVF side = the
    //    production ivfTopKBatch. ──
    QueryDef.sql(
      "sim_ann_recall",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8),
        |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |uq AS (SELECT q.qid, c.cid, unnest(q.qe) AS x, unnest(c.cv) AS y FROM q, c),
        |sq AS (SELECT qid, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM uq GROUP BY 1, 2),
        |rq AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |       FROM sq),
        |qp AS (SELECT qid, cid FROM rq WHERE rn <= 1),
        |cand AS (SELECT qp.qid, a.vec_id FROM asg a JOIN qp ON a.cid = qp.cid),
        |u2 AS (SELECT cand.qid, cand.vec_id, unnest(e.embedding) AS x, unnest(qe2.embedding) AS y
        |       FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
        |                 JOIN embeddings qe2 ON qe2.vec_id = cand.qid),
        |s2 AS (SELECT qid, vec_id,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM u2 GROUP BY 1, 2),
        |iv AS (SELECT qid, vec_id FROM (
        |         SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |           ORDER BY round(dot / sqrt(na * nb), 4) DESC, vec_id) AS rn
        |         FROM s2 WHERE na * nb > 0) WHERE rn <= 5),
        |ub AS (SELECT q.qid, v.vec_id, unnest(v.embedding) AS x, unnest(q.qe) AS y FROM v, q),
        |sb AS (SELECT qid, vec_id,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM ub GROUP BY 1, 2),
        |exact AS (SELECT qid, vec_id FROM (
        |            SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |              ORDER BY round(dot / sqrt(na * nb), 4) DESC, vec_id) AS rn
        |            FROM sb WHERE na * nb > 0) WHERE rn <= 5)
        |SELECT e.qid AS query_id, CAST(5 AS BIGINT) AS k,
        |  CAST(count(i.vec_id) AS BIGINT) AS n_overlap,
        |  round(count(i.vec_id) / 5.0, 4) AS recall
        |FROM exact e LEFT JOIN iv i ON i.qid = e.qid AND i.vec_id = e.vec_id
        |GROUP BY e.qid ORDER BY query_id""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val corpus = emb.filter(col("vec_id") > 8)
        val queries = emb.filter(col("vec_id") < 4)
        val cents = emb.filter(col("vec_id").between(1, 8))
        val ivf = Similarity.ivfTopKBatch(corpus, "vec_id", "embedding",
            cents, "vec_id", queries, "vec_id", k = 5, probes = 1)
          .select(col("query_id").as("qid"), col("vec_id").as("ivf_hit"))
        val exact = corpus.crossJoin(broadcast(
            queries.select(col("vec_id").as("qid"), col("embedding").as("_q"))))
          .select(col("qid"), col("vec_id"),
            round(Similarity.cosine(col("embedding"), col("_q")), 4).as("_cos"))
          .filter(col("_cos").isNotNull)
          .groupBy("qid")
          .agg(graft.expressions.BoundedCollect.boundedSortedCollect(
            struct((-col("_cos")).as("nc"), col("vec_id")), 5).as("_top"))
          .select(col("qid"), explode(col("_top")).as("_t"))
          .select(col("qid"), col("_t.vec_id").as("vec_id"))
        exact.join(ivf,
            exact("qid") === ivf("qid") && exact("vec_id") === ivf("ivf_hit"), "left_outer")
          .groupBy(exact("qid").as("query_id"))
          .agg(lit(5L).as("k"),
            count(col("ivf_hit")).as("n_overlap"),
            round(count(col("ivf_hit")).cast("double") / 5.0, 4).as("recall"))
          .orderBy("query_id")
    },

    // ── Winnowing-fingerprint pairs (the MOSS shape): docs sharing ≥ 2
    //    DISCRIMINATIVE fingerprints (df in [2, 10]) share actual char
    //    runs; containment = shared / min(|A|,|B|) catches the short-
    //    doc-inside-long-doc case Jaccard rounds to 0. The df threshold
    //    is declarative so the oracle replicates it exactly — and it's
    //    also the hot-bucket guard (one fp sits in 68% of docs here:
    //    95M raw pairs vs 41k after the filter). ──
    QueryDef.sql(
      "dedup_winnow_pairs",
      """WITH p AS (SELECT doc_id, text,
        |             unnest(range(1, greatest(length(text) - 6, 1))) AS i
        |           FROM documents WHERE length(text) >= 8),
        |h AS (SELECT doc_id, i, md5(substr(text, i, 8)) AS h,
        |        length(text) - 7 AS n FROM p),
        |w AS (SELECT doc_id, i, n,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |      FROM h),
        |fp AS (SELECT DISTINCT doc_id AS doc, wmin AS fp
        |       FROM w WHERE i - 1 <= greatest(n - 4, 0)),
        |keep AS (SELECT fp FROM (SELECT fp, count(*) AS d FROM fp GROUP BY fp)
        |         WHERE d BETWEEN 2 AND 10),
        |disc AS (SELECT doc, fp.fp FROM fp JOIN keep USING (fp)),
        |sizes AS (SELECT doc, CAST(count(*) AS BIGINT) AS nfp FROM disc GROUP BY doc),
        |pr AS (SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
        |       FROM disc a JOIN disc b USING (fp) WHERE a.doc < b.doc
        |       GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pr.doc_a, pr.doc_b, pr.n_shared,
        |  round(CAST(pr.n_shared AS DOUBLE) / least(sa.nfp, sb.nfp), 4) AS containment
        |FROM pr JOIN sizes sa ON sa.doc = pr.doc_a JOIN sizes sb ON sb.doc = pr.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin) {
      (s, d) =>
        Dedup.winnowPairs(QueryDef.fanOutIfNarrow(Tables.documents(s, d)),
            "doc_id", "text", k = 8, window = 4, maxDf = 10L, minShared = 2L)
          .orderBy("doc_a", "doc_b")
    },

    // ── Rolling-hash document fingerprint (char 8-grams). ──────────────
    QueryDef.sql(
      "text_rolling_fingerprint",
      """SELECT doc_id,
        |  CASE WHEN length(text) >= 8
        |    THEN list_min([md5(substr(text, j, 8)) for j in range(1, length(text) - 6)])
        |    ELSE NULL END AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            TextOps.rollingFingerprint(col("text"), 8).as("fp"))
          .orderBy("doc_id")
    },

    // ── k-NN majority-vote labeling: predict labels for vectors 100-199
    //    from the labeled corpus (vec_id >= 200) through shared IVF
    //    cells — the auto-labeling primitive. Vote ties break to the
    //    smallest label on both engines. ──
    QueryDef.sql(
      "sim_knn_label",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id BETWEEN 100 AND 199),
        |v AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id >= 200),
        |uq AS (SELECT q.vec_id, c.cid, unnest(q.embedding) AS x, unnest(c.cv) AS y FROM q, c),
        |sq AS (SELECT vec_id, cid,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM uq GROUP BY 1, 2),
        |rq AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |         ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |       FROM sq),
        |qasg AS (SELECT vec_id AS id_a, cid FROM rq WHERE rn <= 2),
        |uv AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |sv AS (SELECT vec_id, cid,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM uv GROUP BY 1, 2),
        |rv AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |         ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |       FROM sv),
        |asg AS (SELECT vec_id AS id_b, cid FROM rv WHERE rn = 1),
        |p AS (SELECT DISTINCT id_a, id_b FROM qasg JOIN asg USING (cid)),
        |u2 AS (SELECT p.id_a, p.id_b, unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
        |       FROM p JOIN embeddings ea ON ea.vec_id = p.id_a
        |              JOIN embeddings eb ON eb.vec_id = p.id_b),
        |s2 AS (SELECT id_a, id_b,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM u2 GROUP BY 1, 2),
        |sc AS (SELECT id_a, id_b, round(dot / sqrt(na * nb), 4) AS cos_sim
        |       FROM s2 WHERE na * nb > 0),
        |rk AS (SELECT id_a, id_b,
        |         row_number() OVER (PARTITION BY id_a ORDER BY cos_sim DESC, id_b) AS rank
        |       FROM sc),
        |votes AS (SELECT rk.id_a, v.label, CAST(count(*) AS BIGINT) AS cnt
        |          FROM rk JOIN v ON v.vec_id = rk.id_b WHERE rk.rank <= 5
        |          GROUP BY 1, 2)
        |SELECT id_a AS vec_id, label AS pred_label, cnt AS votes FROM (
        |  SELECT id_a, label, cnt,
        |    row_number() OVER (PARTITION BY id_a ORDER BY cnt DESC, label) AS rn
        |  FROM votes) WHERE rn = 1
        |ORDER BY vec_id""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.knnLabel(
            queries = emb.filter(col("vec_id").between(100, 199)),
            corpus = emb.filter(col("vec_id") >= 200),
            "vec_id", "embedding", "label",
            centroids = emb.filter(col("vec_id").between(1, 8)),
            centroidIdCol = "vec_id", k = 5, probes = 2)
          .orderBy("vec_id")
    },

    // ── Incremental dedup: an incoming batch (doc_id >= 400) against the
    //    stored band index of an already-ingested corpus (doc_id < 400) —
    //    the daily-ingest shape: the corpus is never re-banded and never
    //    paired with itself; only batch×corpus candidates form. ──
    QueryDef.sql(
      "dedup_incremental_pairs",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("ws", 3)} AS sh FROM t),
         |shd AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
         |m AS (SELECT doc_id, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT doc_id, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.doc_id AS doc_new, c.doc_id AS doc_old,
         |        CAST(count(*) AS BIGINT) AS n_shared_bands
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.doc_id >= 400 AND c.doc_id < 400 GROUP BY 1, 2)
         |SELECT doc_new, doc_old, n_shared_bands,
         |  ${duckJaccard("x.shd", "y.shd")} AS jaccard
         |FROM p JOIN shd x ON x.doc_id = p.doc_new JOIN shd y ON y.doc_id = p.doc_old
         |ORDER BY doc_new, doc_old""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        val corpus = docs.filter(col("doc_id") < 400)
        val batch = docs.filter(col("doc_id") >= 400)
        val buckets = Dedup.bandBuckets(
          Dedup.bandIndex(corpus, "doc_id", "text", 3, 8, 4))
        Dedup.incrementalLshPairs(batch, "doc_id", "text", buckets, corpus)
          .orderBy("doc_new", "doc_old")
    },

    // ── Incremental CHUNK-level dedup: a new-doc batch's 32-token
    //    windows against the STORED chunk band index of the existing
    //    corpus — the arrival path of sub-document dedup (no corpus
    //    re-banding, no batch×corpus pairs; same composite-key plumbing
    //    as dedup_chunk_lsh_pairs through the same incremental core as
    //    dedup_incremental_pairs). Batch = docs ≥ 400, corpus < 400. ──
    QueryDef.sql(
      "dedup_chunk_incremental",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS ws FROM documents),
         |sdoc AS (SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) > 0),
         |c0 AS (SELECT doc_id, ws,
         |        unnest(range(0, CASE WHEN n <= 8 THEN 1 ELSE (n - 8 + 23) // 24 END)) AS chunk_idx
         |      FROM sdoc),
         |ch AS (SELECT doc_id * 1000 + chunk_idx AS cid,
         |         list_slice(ws, chunk_idx * 24 + 1, chunk_idx * 24 + 32) AS cw
         |       FROM c0 WHERE len(list_slice(ws, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) >= 3),
         |sh AS (SELECT cid, ${duckShingles("cw", 3)} AS sh FROM ch),
         |shd AS (SELECT cid, list_distinct(sh) AS shd FROM sh),
         |m AS (SELECT cid, ${duckSig("sh", 8)} AS sig FROM sh),
         |b AS (SELECT cid, i AS band_idx,
         |        md5(array_to_string(list_slice(sig, 2*i+1, 2*i+2), '|')) AS band_hash
         |      FROM m, (SELECT unnest(range(0, 4)) AS i)),
         |p AS (SELECT a.cid AS cid_new, c.cid AS cid_old,
         |        CAST(count(*) AS BIGINT) AS n_shared_bands
         |      FROM b a JOIN b c USING (band_idx, band_hash)
         |      WHERE a.cid >= 400000 AND c.cid < 400000 GROUP BY 1, 2)
         |SELECT CAST(cid_new // 1000 AS BIGINT) AS doc_new, CAST(cid_new % 1000 AS BIGINT) AS chunk_new,
         |  CAST(cid_old // 1000 AS BIGINT) AS doc_old, CAST(cid_old % 1000 AS BIGINT) AS chunk_old,
         |  n_shared_bands, ${duckJaccard("x.shd", "y.shd")} AS jaccard
         |FROM p JOIN shd x ON x.cid = p.cid_new JOIN shd y ON y.cid = p.cid_old
         |ORDER BY doc_new, chunk_new, doc_old, chunk_old""".stripMargin) {
      (s, d) =>
        def chunksOf(df: org.apache.spark.sql.DataFrame) =
          graft.operators.TextOps.chunkTokens(df, "doc_id", "text",
              chunkSize = 32, overlap = 8)
            .filter(col("n_tokens") >= 3)
            .select((col("doc") * 1000 + col("chunk_idx")).as("chunk_id"),
              col("chunk_text").as("text"))
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        val corpusChunks = chunksOf(docs.filter(col("doc_id") < 400))
        val batchChunks = chunksOf(docs.filter(col("doc_id") >= 400))
        val buckets = Dedup.bandBuckets(
          Dedup.bandIndex(corpusChunks, "chunk_id", "text", 3, 8, 4))
        Dedup.incrementalLshPairs(batchChunks, "chunk_id", "text", buckets, corpusChunks)
          .select(
            expr("CAST(doc_new div 1000 AS BIGINT)").as("dn"),
            expr("CAST(doc_new % 1000 AS BIGINT)").as("chunk_new"),
            expr("CAST(doc_old div 1000 AS BIGINT)").as("dold"),
            expr("CAST(doc_old % 1000 AS BIGINT)").as("chunk_old"),
            col("n_shared_bands"), col("jaccard"))
          .withColumnsRenamed(Map("dn" -> "doc_new", "dold" -> "doc_old"))
          .orderBy("doc_new", "chunk_new", "doc_old", "chunk_old")
    },

    // ── Semantic dedup (embedding space): IVF-cell-bucketed cosine pairs
    //    → connected components → keep one canonical vector per family.
    //    The oracle computes exact within-cell pairs and a recursive
    //    transitive closure over those above the threshold. ──
    QueryDef.sql(
      "sim_semantic_dedup",
      """WITH RECURSIVE c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
        |      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id),
        |u2 AS (SELECT p.ia, p.ib, unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
        |       FROM p JOIN embeddings ea ON ea.vec_id = p.ia
        |              JOIN embeddings eb ON eb.vec_id = p.ib),
        |s2 AS (SELECT ia, ib,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM u2 GROUP BY 1, 2),
        |sc AS (SELECT ia, ib FROM s2
        |       WHERE na * nb > 0 AND round(dot / sqrt(na * nb), 4) > 0.35),
        |e AS (SELECT ia AS a, ib AS b FROM sc UNION SELECT ib, ia FROM sc),
        |tc AS (SELECT a, b FROM e
        |       UNION SELECT tc.a, e.b FROM tc JOIN e ON tc.b = e.a),
        |lbl AS (SELECT a AS doc, least(a, min(b)) AS cluster FROM tc GROUP BY a)
        |SELECT v.vec_id FROM v
        |WHERE v.vec_id NOT IN (SELECT doc FROM lbl WHERE doc <> cluster)
        |ORDER BY vec_id""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.semanticDedup(
            emb.filter(col("vec_id") > 8), "vec_id", "embedding",
            centroids = emb.filter(col("vec_id").between(1, 8)),
            centroidIdCol = "vec_id", minCos = 0.35)
          .select("vec_id").orderBy("vec_id")
    },

    // ── Cluster-balanced sampling: assign to nearest of 8 centroid
    //    vectors (the shared sim_ivf assignment SQL), keep ≤ 15 ids per
    //    cell in md5 order — the diversity-preserving curation draw
    //    (a global sample draws by cluster mass and starves small
    //    cells). md5-order cut = the pipeline_sample_per_source idiom. ──
    QueryDef.sql(
      "sim_cluster_sample",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8),
        |u AS (SELECT v.vec_id, c.cid, unnest(v.embedding) AS x, unnest(c.cv) AS y FROM v, c),
        |s AS (SELECT vec_id, cid,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY round(dot / sqrt(na * nb), 4) DESC, cid) AS rn
        |      FROM s),
        |asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |k AS (SELECT cid, vec_id, row_number() OVER (PARTITION BY cid
        |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM asg)
        |SELECT cid, vec_id FROM k WHERE rn <= 15 ORDER BY cid, vec_id""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.clusterBalancedSample(
            emb.filter(col("vec_id") > 8), "vec_id", "embedding",
            centroids = emb.filter(col("vec_id").between(1, 8)),
            centroidIdCol = "vec_id", perCell = 15)
          .orderBy("cid", "vec_id")
    },

    // ── Deterministic distributed PCA (operators/Pca): exact quantized
    //    moments → driver-side power iteration → distributed projection.
    //    The oracle (PcaOracle) re-derives the WHOLE eigen-solve in SQL —
    //    unrolled quantized matmul/normalize steps, the pagerank doctrine
    //    applied to linear algebra — so all three stages hash-match
    //    bit-for-bit. v0 literal is the Scala-printed 1/√64 (both engines
    //    parse identical bits); 8 iterations is a report, not a
    //    convergence solver, same as graph_pagerank's 3. ──
    QueryDef.sql("sim_pca_cov", PcaOracle.covSql) { (s, d) =>
      graft.operators.Pca.covariance(Tables.embeddings(s, d), "embedding")
        .orderBy("pos_i", "pos_j")
    },
    QueryDef.sql(
      "sim_pca_top_pc",
      PcaOracle.topPcSql(iters = 8, v0lit = (1.0 / math.sqrt(64.0)).toString)) {
      (s, d) =>
        val s2 = s
        import s2.implicits._
        val m = graft.operators.Pca.topComponent(
          Tables.embeddings(s, d), "embedding", iters = 8)
        m.component.zipWithIndex
          .map { case (v, i) => (i.toLong, v, m.eigval) }.toSeq
          .toDF("pos", "loading", "eigval")
          .orderBy("pos")
    },
    // ── Leading-2 components via deflation: after PC1, subtract the
    //    rank-one term λ·v·vᵀ (one fixed double shape both engines
    //    share) and re-solve — power iteration on the deflated matrix
    //    converges to PC2 because the removed direction's eigenvalue is
    //    ~0. The oracle unrolls BOTH solves and the deflation. ──
    QueryDef.sql(
      "sim_pca_components",
      PcaOracle.componentsSql(k = 2, iters = 8,
        v0lit = (1.0 / math.sqrt(64.0)).toString)) {
      (s, d) =>
        val s2 = s
        import s2.implicits._
        val cs = graft.operators.Pca.topComponents(
          Tables.embeddings(s, d), "embedding", k = 2, iters = 8)
        cs.comps.zipWithIndex.flatMap { case ((v, lam), m) =>
          v.zipWithIndex.map { case (x, i) => (m.toLong, i.toLong, x, lam) }
        }.toDF("comp", "pos", "loading", "eigval")
          .orderBy("comp", "pos")
    },
    QueryDef.sql(
      "sim_pca_project",
      PcaOracle.projectSql(iters = 8, v0lit = (1.0 / math.sqrt(64.0)).toString)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val m = graft.operators.Pca.topComponent(emb, "embedding", iters = 8)
        graft.operators.Pca.project(emb, "vec_id", "embedding", m)
          .orderBy("vec_id")
    },

    // ── 2-D corpus map: every embedding's (pc1, pc2) coordinates — what
    //    a curation UI scatter-plots and a drift monitor bins. One extra
    //    scan after the moment pass (both folds ride it together). ──
    QueryDef.sql(
      "sim_pca_map",
      PcaOracle.mapSql(iters = 8, v0lit = (1.0 / math.sqrt(64.0)).toString)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val cs = graft.operators.Pca.topComponents(emb, "embedding", k = 2, iters = 8)
        graft.operators.Pca.projectMany(emb, "vec_id", "embedding", cs,
            Seq("pc1", "pc2"))
          .orderBy("vec_id")
    },

    // ── Embedding-space outliers: top-20 by the 2-component Mahalanobis
    //    score p₁²/λ₁ + p₂²/λ₂ — the curation gate for broken/degenerate
    //    embeddings (an encoder failure lands far from the corpus cloud
    //    along the dominant axes). Score shape is fixed and mirrored. ──
    QueryDef.sql(
      "sim_pca_outliers",
      PcaOracle.outliersSql(iters = 8, v0lit = (1.0 / math.sqrt(64.0)).toString)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val cs = graft.operators.Pca.topComponents(emb, "embedding", k = 2, iters = 8)
        val Seq((_, l1), (_, l2)) = cs.comps.toSeq
        graft.operators.Pca.projectMany(emb, "vec_id", "embedding", cs,
            Seq("_p1", "_p2"))
          .select(col("vec_id"),
            round(col("_p1") * col("_p1") / l1 + col("_p2") * col("_p2") / l2, 4)
              .as("score"))
          .orderBy(desc("score"), asc("vec_id")).limit(20)
    },

    // ── INCREMENTAL PCA — the O(delta) arrival path: the exact-long
    //    moment arrays are ADDITIVE, so a new batch costs one moment
    //    pass over the batch and an elementwise long merge; the corpus
    //    is never re-scanned, and nothing is approximate — the merged
    //    state IS the full-corpus state. Proven by the SHARED oracle:
    //    this query trains on the even half, persists/reloads those
    //    moments, appends the odd half, and must hash-match the SAME
    //    from-scratch componentsSql as sim_pca_components (the
    //    incremental-BM25 precedent). ──
    QueryDef.sql(
      "sim_pca_incremental",
      PcaOracle.componentsSql(k = 2, iters = 8,
        v0lit = (1.0 / math.sqrt(64.0)).toString)) {
      (s, d) =>
        val s2 = s
        import s2.implicits._
        val emb = Tables.embeddings(s, d)
        val mA = graft.operators.Pca.moments(
          emb.filter(col("vec_id") % 2 === 0), "embedding")
        val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString
        graft.operators.Pca.saveMoments(s, mA, dir)
        val merged = graft.operators.Pca.mergeMoments(
          graft.operators.Pca.loadMoments(s, dir),
          graft.operators.Pca.moments(
            emb.filter(col("vec_id") % 2 =!= 0), "embedding"))
        val cs = graft.operators.Pca.topComponentsFromMoments(
          merged._1, merged._2, merged._3, k = 2, iters = 8)
        cs.comps.zipWithIndex.flatMap { case ((v, lam), m) =>
          v.zipWithIndex.map { case (x, i) => (m.toLong, i.toLong, x, lam) }
        }.toDF("comp", "pos", "loading", "eigval")
          .orderBy("comp", "pos")
    },

    // ── Johnson–Lindenstrauss random projection 64 → 16 dims: the
    //    TRAIN-FREE reduction (the ±1 matrix is md5-derived from the dim
    //    indices alone — no RNG state, no stored model, any engine or
    //    future batch re-derives it; the arrival-path property PCA
    //    lacks). One scan, zero shuffles; each coordinate is an exact
    //    long fold closed by /2^32/√16. The oracle rebuilds the SAME
    //    matrix with DuckDB's own md5. ──
    QueryDef.sql(
      "sim_rp_project",
      """WITH sg AS (SELECT i, j, CASE WHEN substring(md5('rp' || CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1) IN ('0','1','2','3','4','5','6','7') THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn
        |      FROM (SELECT unnest(range(0, 64)) AS i), (SELECT unnest(range(0, 16)) AS j)),
        |u0 AS (SELECT vec_id, unnest(range(0, len(embedding))) AS i, unnest(embedding) AS xi FROM embeddings),
        |pr AS (SELECT u0.vec_id, sg.j, CAST(sum(CAST(round(CAST(u0.xi AS DOUBLE) * sg.sgn * 4294967296.0) AS BIGINT)) AS BIGINT) AS pq
        |       FROM u0 JOIN sg ON sg.i = u0.i GROUP BY 1, 2)
        |SELECT vec_id, CAST(j AS BIGINT) AS dim, CAST(pq AS DOUBLE) / 4294967296.0 / 4.0 AS y
        |FROM pr ORDER BY vec_id, dim""".stripMargin) {
      (s, d) =>
        Similarity.randomProject(Tables.embeddings(s, d), "vec_id", "embedding",
            dOut = 16)
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "y")))
          .select(col("vec_id"), col("dim").cast("long").as("dim"), col("y"))
          .orderBy("vec_id", "dim")
    },

    // ── Recall@10 of the 16-dim projected space vs exact 64-dim cosine
    //    — the JL quality number (4× less IO per scored pair; ε-distortion
    //    shows up exactly here). Projected-space scores use quantized-long
    //    dot/norms (order-free, oracle-exact); the exact side is the
    //    sim_ann_recall brute-force convention. ──
    QueryDef.sql(
      "sim_rp_recall",
      """WITH sg AS (SELECT i, j, CASE WHEN substring(md5('rp' || CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1) IN ('0','1','2','3','4','5','6','7') THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn
        |      FROM (SELECT unnest(range(0, 64)) AS i), (SELECT unnest(range(0, 16)) AS j)),
        |u0 AS (SELECT vec_id, unnest(range(0, len(embedding))) AS i, unnest(embedding) AS xi FROM embeddings),
        |pr AS (SELECT u0.vec_id, sg.j, CAST(sum(CAST(round(CAST(u0.xi AS DOUBLE) * sg.sgn * 4294967296.0) AS BIGINT)) AS BIGINT) AS pq
        |       FROM u0 JOIN sg ON sg.i = u0.i GROUP BY 1, 2),
        |pj AS (SELECT vec_id, j, CAST(pq AS DOUBLE) / 4294967296.0 / 4.0 AS y FROM pr),
        |pc AS (SELECT vec_id, j, y FROM pj WHERE vec_id > 8),
        |pq2 AS (SELECT vec_id AS qid, j, y FROM pj WHERE vec_id < 4),
        |pd AS (SELECT pq2.qid, pc.vec_id,
        |        CAST(sum(CAST(round(pq2.y * pc.y * 4294967296.0) AS BIGINT)) AS BIGINT) AS dq,
        |        CAST(sum(CAST(round(pq2.y * pq2.y * 4294967296.0) AS BIGINT)) AS BIGINT) AS naq,
        |        CAST(sum(CAST(round(pc.y * pc.y * 4294967296.0) AS BIGINT)) AS BIGINT) AS nbq
        |       FROM pq2 JOIN pc ON pc.j = pq2.j GROUP BY 1, 2),
        |rpk AS (SELECT qid, vec_id FROM (
        |          SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |            ORDER BY round((CAST(dq AS DOUBLE) / 4294967296.0) / sqrt((CAST(naq AS DOUBLE) / 4294967296.0) * (CAST(nbq AS DOUBLE) / 4294967296.0)), 4) DESC, vec_id) AS rn
        |          FROM pd WHERE naq > 0 AND nbq > 0) WHERE rn <= 10),
        |v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8),
        |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4),
        |ub AS (SELECT q.qid, v.vec_id, unnest(v.embedding) AS x, unnest(q.qe) AS y FROM v, q),
        |sb AS (SELECT qid, vec_id,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM ub GROUP BY 1, 2),
        |exact AS (SELECT qid, vec_id FROM (
        |            SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |              ORDER BY round(dot / sqrt(na * nb), 4) DESC, vec_id) AS rn
        |            FROM sb WHERE na * nb > 0) WHERE rn <= 10)
        |SELECT e.qid AS query_id, CAST(10 AS BIGINT) AS k,
        |  CAST(count(i.vec_id) AS BIGINT) AS n_overlap,
        |  round(count(i.vec_id) / 10.0, 4) AS recall
        |FROM exact e LEFT JOIN rpk i ON i.qid = e.qid AND i.vec_id = e.vec_id
        |GROUP BY e.qid ORDER BY query_id""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val proj = Similarity.randomProject(emb, "vec_id", "embedding", dOut = 16)
        val pc = proj.filter(col("vec_id") > 8)
        val pq = proj.filter(col("vec_id") < 4)
          .select(col("vec_id").as("qid"), col("proj").as("_q"))
        val rpTop = pc.crossJoin(broadcast(pq))
          .select(col("qid"), col("vec_id"),
            Similarity.quantCosine(col("_q"), col("proj")).as("_s"),
            Similarity.quantDot(col("_q"), col("_q")).as("_na"),
            Similarity.quantDot(col("proj"), col("proj")).as("_nb"))
          .filter(col("_na") > 0 && col("_nb") > 0)
          .groupBy("qid")
          .agg(graft.expressions.BoundedCollect.boundedSortedCollect(
            struct((-col("_s")).as("ns"), col("vec_id")), 10).as("_top"))
          .select(col("qid"), explode(col("_top")).as("_t"))
          .select(col("qid"), col("_t.vec_id").as("rp_hit"))
        val corpus = emb.filter(col("vec_id") > 8)
        val queries = emb.filter(col("vec_id") < 4)
        val exact = corpus.crossJoin(broadcast(
            queries.select(col("vec_id").as("qid"), col("embedding").as("_qe"))))
          .select(col("qid"), col("vec_id"),
            round(Similarity.cosine(col("embedding"), col("_qe")), 4).as("_cos"))
          .filter(col("_cos").isNotNull)
          .groupBy("qid")
          .agg(graft.expressions.BoundedCollect.boundedSortedCollect(
            struct((-col("_cos")).as("nc"), col("vec_id")), 10).as("_top"))
          .select(col("qid"), explode(col("_top")).as("_t"))
          .select(col("qid"), col("_t.vec_id").as("vec_id"))
        exact.join(rpTop,
            exact("qid") === rpTop("qid") && exact("vec_id") === rpTop("rp_hit"),
            "left_outer")
          .groupBy(exact("qid").as("query_id"))
          .agg(lit(10L).as("k"),
            count(col("rp_hit")).as("n_overlap"),
            round(count(col("rp_hit")) / 10.0, 4).as("recall"))
          .orderBy("query_id")
    },

    // ── JL dimension TUNING CURVE — recall@10 at dOut ∈ {16, 32, 48}
    //    against one shared exact-cosine ground truth: the sweep that
    //    turns sim_rp_recall's honest-but-weak single reading (~0.1-0.2
    //    at dOut=16 on this corpus) into an actionable knob — the
    //    ε ≈ √(ln n / k) distortion envelope predicts recall rising
    //    steeply with k, and the curve shows where the IO-savings/
    //    recall trade clears a pipeline's bar. Oracle rebuilds all
    //    three sign matrices with its own md5 and replays the
    //    quantized-long scoring per rung. ──
    QueryDef.sql(
      "sim_rp_recall_curve", {
        def rung(k: Int) =
          s"""sg$k AS (SELECT i, j, CASE WHEN substring(md5('rp' || CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1) IN ('0','1','2','3','4','5','6','7') THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn
             |      FROM (SELECT unnest(range(0, 64)) AS i), (SELECT unnest(range(0, $k)) AS j)),
             |pr$k AS (SELECT u0.vec_id, sg$k.j, CAST(sum(CAST(round(CAST(u0.xi AS DOUBLE) * sg$k.sgn * 4294967296.0) AS BIGINT)) AS BIGINT) AS pq
             |       FROM u0 JOIN sg$k ON sg$k.i = u0.i GROUP BY 1, 2),
             |pj$k AS (SELECT vec_id, j, CAST(pq AS DOUBLE) / 4294967296.0 / sqrt(CAST($k AS DOUBLE)) AS y FROM pr$k),
             |pd$k AS (SELECT a.qid, b.vec_id,
             |        CAST(sum(CAST(round(a.y * b.y * 4294967296.0) AS BIGINT)) AS BIGINT) AS dq,
             |        CAST(sum(CAST(round(a.y * a.y * 4294967296.0) AS BIGINT)) AS BIGINT) AS naq,
             |        CAST(sum(CAST(round(b.y * b.y * 4294967296.0) AS BIGINT)) AS BIGINT) AS nbq
             |       FROM (SELECT vec_id AS qid, j, y FROM pj$k WHERE vec_id < 4) a
             |       JOIN (SELECT vec_id, j, y FROM pj$k WHERE vec_id > 8) b ON a.j = b.j
             |       GROUP BY 1, 2),
             |rpk$k AS (SELECT qid, vec_id FROM (
             |          SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
             |            ORDER BY round((CAST(dq AS DOUBLE) / 4294967296.0) / sqrt((CAST(naq AS DOUBLE) / 4294967296.0) * (CAST(nbq AS DOUBLE) / 4294967296.0)), 4) DESC, vec_id) AS rn
             |          FROM pd$k WHERE naq > 0 AND nbq > 0) WHERE rn <= 10)""".stripMargin
        def recall(k: Int) =
          s"""SELECT CAST($k AS BIGINT) AS d_out, e.qid AS query_id, CAST(10 AS BIGINT) AS k,
             |  CAST(count(i.vec_id) AS BIGINT) AS n_overlap,
             |  round(count(i.vec_id) / 10.0, 4) AS recall
             |FROM exact e LEFT JOIN rpk$k i ON i.qid = e.qid AND i.vec_id = e.vec_id
             |GROUP BY e.qid""".stripMargin
        s"""WITH u0 AS (SELECT vec_id, unnest(range(0, len(embedding))) AS i, unnest(embedding) AS xi FROM embeddings),
           |ub AS (SELECT q.vec_id AS qid, v.vec_id, unnest(v.embedding) AS x, unnest(q.embedding) AS y
           |       FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 8) v,
           |            (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4) q),
           |sb AS (SELECT qid, vec_id,
           |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
           |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
           |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
           |       FROM ub GROUP BY 1, 2),
           |exact AS (SELECT qid, vec_id FROM (
           |            SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
           |              ORDER BY round(dot / sqrt(na * nb), 4) DESC, vec_id) AS rn
           |            FROM sb WHERE na * nb > 0) WHERE rn <= 10),
           |${Seq(16, 32, 48).map(rung).mkString(",\n")}
           |${Seq(16, 32, 48).map(recall).mkString("\nUNION ALL\n")}
           |ORDER BY d_out, query_id""".stripMargin
      }) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val exact = emb.filter(col("vec_id") > 8)
          .crossJoin(broadcast(emb.filter(col("vec_id") < 4)
            .select(col("vec_id").as("qid"), col("embedding").as("_qe"))))
          .select(col("qid"), col("vec_id"),
            round(Similarity.cosine(col("embedding"), col("_qe")), 4).as("_cos"))
          .filter(col("_cos").isNotNull)
          .groupBy("qid")
          .agg(graft.expressions.BoundedCollect.boundedSortedCollect(
            struct((-col("_cos")).as("nc"), col("vec_id")), 10).as("_top"))
          .select(col("qid"), explode(col("_top")).as("_t"))
          .select(col("qid"), col("_t.vec_id").as("vec_id"))
          .localCheckpoint()
        val curves = Seq(16, 32, 48).map { dout =>
          val proj = Similarity.randomProject(emb, "vec_id", "embedding", dOut = dout)
          val rpTop = proj.filter(col("vec_id") > 8)
            .crossJoin(broadcast(proj.filter(col("vec_id") < 4)
              .select(col("vec_id").as("qid"), col("proj").as("_q"))))
            .select(col("qid"), col("vec_id"),
              Similarity.quantCosine(col("_q"), col("proj")).as("_s"),
              Similarity.quantDot(col("_q"), col("_q")).as("_na"),
              Similarity.quantDot(col("proj"), col("proj")).as("_nb"))
            .filter(col("_na") > 0 && col("_nb") > 0)
            .groupBy("qid")
            .agg(graft.expressions.BoundedCollect.boundedSortedCollect(
              struct((-col("_s")).as("ns"), col("vec_id")), 10).as("_top"))
            .select(col("qid"), explode(col("_top")).as("_t"))
            .select(col("qid"), col("_t.vec_id").as("rp_hit"))
          exact.join(rpTop,
              exact("qid") === rpTop("qid") && exact("vec_id") === rpTop("rp_hit"),
              "left_outer")
            .groupBy(exact("qid").as("query_id"))
            .agg(count(col("rp_hit")).as("_n"))
            .select(lit(dout.toLong).as("d_out"), col("query_id"), lit(10L).as("k"),
              col("_n").as("n_overlap"), round(col("_n") / 10.0, 4).as("recall"))
        }
        curves.reduce(_ unionByName _).orderBy("d_out", "query_id")
    },

    // ── Deterministic distributed k-means (Lloyd's, 4 clusters, 3
    //    iterations) over the embedding corpus — content-deterministic
    //    residue-class seeding, quantized-long distances with the
    //    min(dq·k+j) tie-broken argmin, exact long component sums, and
    //    floor-divided dyadic centroid updates. The oracle unrolls every
    //    iteration (KMeansOracle); each Spark iteration is ONE
    //    treeAggregate pass (k·(d+1) longs per partition, no shuffle). ──
    QueryDef.sql(
      "sim_kmeans_train",
      KMeansOracle.trainSql(k = 4, iters = 3)) {
      (s, d) =>
        graft.operators.KMeans.trainFrame(
          Tables.embeddings(s, d), "vec_id", "embedding", k = 4, iters = 3)
    },

    // ── The k-means SERVE half: every vector's assignment under the
    //    trained model — the oracle replays training AND one more
    //    quantized-distance argmin round, so the full train→assign
    //    contract is pinned end to end. ──
    QueryDef.sql(
      "sim_kmeans_assign",
      KMeansOracle.assignSql(k = 4, iters = 3)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val m = graft.operators.KMeans.train(emb, "vec_id", "embedding",
          k = 4, iters = 3)
        graft.operators.KMeans.assign(emb, "vec_id", "embedding", m)
          .select("vec_id", "cluster")
          .orderBy("vec_id")
    },

    // ── Per-cluster inertia (within-cluster sum of quantized squared
    //    distances) — the elbow-curve ingredient, EXACT: dq values are
    //    already quantized longs, so per-cluster sums are bit-stable
    //    and the oracle replays them integer-for-integer. ──
    QueryDef.sql(
      "sim_kmeans_inertia",
      KMeansOracle.inertiaSql(k = 4, iters = 3)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val m = graft.operators.KMeans.train(emb, "vec_id", "embedding",
          k = 4, iters = 3)
        graft.operators.KMeans.assign(emb, "vec_id", "embedding", m)
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"), sum("dist_q").as("inertia_q"))
          .orderBy("cluster")
    },
  )
}
