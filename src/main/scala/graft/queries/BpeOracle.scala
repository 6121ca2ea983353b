package graft.queries

/** GENERATED DuckDB oracle for the BPE tokenizer family — the unrolled-
  * iteration precedent of `graph_pagerank` applied to tokenizer training:
  * each of the `nMerges` training steps is one literal CTE block (global
  * pair counts → argmax with the count-desc/pair-asc tie-break → left-to-
  * right non-overlapping merge application), so DuckDB re-derives the merge
  * table from the corpus independently instead of trusting Spark's output.
  *
  * The merge application uses `list_reduce` over singleton-wrapped symbols:
  * greedy last-element folding is EXACTLY left-to-right non-overlapping
  * application for a single rule, because a just-merged symbol `l||r` is
  * strictly longer than `l` and therefore can never re-match `l` (the
  * overlap case `applyMerge` skips by advancing two).
  *
  * Encoding unrolls the greedy lowest-rank-first loop (`Bpe.encodeWord`)
  * to `encodeSteps` steps: each step joins every word's adjacent pairs
  * against the derived merge table, takes the min rank present, and
  * applies that one rule; a word with no applicable pair passes through
  * unchanged, so extra steps are no-ops. Steps bound: each application
  * shortens the symbol list by ≥ 1, so max-word-length steps always
  * reach the fixpoint (driver corpus max token length is 8; callers pass
  * a measured bound, and `BpeSpec` pins the fixpoint claim).
  *
  * Every CTE is MATERIALIZED: the step chain references each previous
  * state twice (pair counts + rewrite), and DuckDB's default CTE inlining
  * would re-evaluate the whole prefix per reference — exponential blowup
  * (observed as "too many open files" from re-opened parquet scans).
  */
object BpeOracle {

  private val DuckToks = "list_filter(string_split(trim(text), ' '), x -> x <> '')"

  /** Training chain: w0 (word freq over `trainSrc`) → s0 (char symbols +
    * end mark) → [p_i pair counts, b_i argmax, s_i rewritten state] × n. */
  private def mergeBlocks(n: Int, trainSrc: String): String = {
    val head =
      s"""w0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f FROM (SELECT unnest($DuckToks) AS w FROM $trainSrc) GROUP BY w),
         |s0 AS MATERIALIZED (SELECT w, f, list_append(string_split(w, ''), '</w>') AS syms FROM w0 WHERE w <> '')""".stripMargin
    val steps = (1 to n).map { i =>
      val (p, b, sp, sn) = (s"p$i", s"b$i", s"s${i - 1}", s"s$i")
      s"""$p AS MATERIALIZED (SELECT pr.l AS l, pr.r AS r, sum(f) AS c FROM (SELECT f, unnest([{'l': syms[j], 'r': syms[j+1]} for j in range(1, len(syms))]) AS pr FROM $sp) GROUP BY 1, 2),
         |$b AS MATERIALIZED (SELECT l, r FROM $p ORDER BY c DESC, l, r LIMIT 1),
         |$sn AS MATERIALIZED (SELECT w, f, CASE WHEN $b.l IS NULL THEN syms ELSE list_reduce([[x] for x in syms], (acc, e) -> CASE WHEN acc[-1] = $b.l AND e[1] = $b.r THEN list_append(acc[1:len(acc)-1], $b.l || $b.r) ELSE list_concat(acc, e) END) END AS syms FROM $sp LEFT JOIN $b ON TRUE)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Oracle for `text_bpe_merges`: (rank, left, right) in rank order.
    * Exhaustion-safe: if pairs run out before `n` merges, every later
    * b_i is empty and contributes no row — ranks stay contiguous because
    * emptiness is monotone over steps. */
  def mergesSql(n: Int, trainSrc: String = "documents"): String = {
    val union = (1 to n)
      .map(i => s"""SELECT CAST(${i - 1} AS BIGINT) AS rank, l AS "left", r AS "right" FROM b$i""")
      .mkString("\nUNION ALL ")
    s"""WITH ${mergeBlocks(n, trainSrc)}
       |SELECT rank, "left", "right" FROM ($union) ORDER BY rank""".stripMargin
  }

  /** Oracle for `text_bpe_tokenize` / `text_bpe_stored`: derive the merge
    * table from `trainSrc`, then greedily encode every distinct corpus
    * word (`encodeSteps` unrolled min-rank steps) and reassemble per-doc
    * (doc, n_tokens, n_bpe, bpe_ratio). The ratio is one closing double
    * division of exact longs — bit-identical across engines. */
  def tokenizeSql(n: Int, encodeSteps: Int, trainSrc: String = "documents",
                  finalSelect: Option[String] = None): String = {
    val mg = (1 to n)
      .map(i => s"SELECT CAST(${i - 1} AS BIGINT) AS rank, l, r FROM b$i")
      .mkString("\nUNION ALL ")
    val enc = (1 to encodeSteps).map { k =>
      val (ep, ek) = (s"e${k - 1}", s"e$k")
      s"""q$k AS MATERIALIZED (SELECT u.w AS w, min(m.rank) AS mr FROM (SELECT w, unnest([{'l': syms[j], 'r': syms[j+1]} for j in range(1, len(syms))]) AS pr FROM $ep) u JOIN mg m ON m.l = u.pr.l AND m.r = u.pr.r GROUP BY u.w),
         |$ek AS MATERIALIZED (SELECT e.w, CASE WHEN m.l IS NULL THEN e.syms ELSE list_reduce([[x] for x in e.syms], (acc, el) -> CASE WHEN acc[-1] = m.l AND el[1] = m.r THEN list_append(acc[1:len(acc)-1], m.l || m.r) ELSE list_concat(acc, el) END) END AS syms FROM $ep e LEFT JOIN q$k q ON q.w = e.w LEFT JOIN mg m ON m.rank = q.mr)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${mergeBlocks(n, trainSrc)},
       |mg AS MATERIALIZED ($mg),
       |d0 AS MATERIALIZED (SELECT doc_id, $DuckToks AS ws FROM documents),
       |vw AS MATERIALIZED (SELECT DISTINCT unnest(ws) AS w FROM d0),
       |e0 AS MATERIALIZED (SELECT w, list_append(string_split(w, ''), '</w>') AS syms FROM vw),
       |$enc,
       |wl AS MATERIALIZED (SELECT w, CAST(len(syms) AS BIGINT) AS nb FROM e$encodeSteps),
       |tc AS MATERIALIZED (SELECT d0.doc_id AS doc, CAST(len(ws) AS BIGINT) AS n_tokens, coalesce(CAST(sum(wl.nb) AS BIGINT), 0) AS n_bpe FROM d0 LEFT JOIN (SELECT doc_id, unnest(ws) AS w FROM d0) t ON t.doc_id = d0.doc_id LEFT JOIN wl ON wl.w = t.w GROUP BY 1, 2)
       |${finalSelect.getOrElse("SELECT doc, n_tokens, n_bpe, CASE WHEN n_tokens = 0 THEN NULL ELSE CAST(n_bpe AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS bpe_ratio FROM tc ORDER BY doc")}""".stripMargin
  }

  /** [[tokenizeSql]] rolled up PER LANGUAGE — the tokenizer-equity
    * ("fertility") report: pieces per word and pieces per 100 chars by
    * the corpus `lang` column, over the same derived merges. */
  def fertilitySql(n: Int, encodeSteps: Int): String =
    tokenizeSql(n, encodeSteps, finalSelect = Some(
      """, f AS (SELECT dd.lang, tc.n_tokens, tc.n_bpe,
        |    CAST(coalesce(length(dd.text), 0) AS BIGINT) AS nc
        |  FROM tc JOIN documents dd ON dd.doc_id = tc.doc)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_words,
        |  CAST(sum(n_bpe) AS BIGINT) AS n_pieces,
        |  round(CAST(sum(n_bpe) AS DOUBLE) / nullif(sum(n_tokens), 0), 4) AS fertility,
        |  round(100.0 * sum(n_bpe) / nullif(sum(nc), 0), 4) AS pieces_per_100_chars
        |FROM f GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin))
}
