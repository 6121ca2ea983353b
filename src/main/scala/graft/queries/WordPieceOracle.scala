package graft.queries

/** GENERATED DuckDB oracle for the WordPiece tokenizer — the
  * [[BpeOracle]] unrolled-iteration doctrine applied to the
  * likelihood-ratio trainer: each training step is one literal CTE
  * block (symbol counts → pair counts → argmax by the FIXED-POINT
  * score key `(c * 10^24) div (ca * cb)` in HUGEINT with the
  * lexicographic tie-break → list_reduce merge application), so
  * DuckDB re-derives the merge table and vocabulary from the corpus
  * independently. Encoding unrolls the greedy longest-match walk
  * ([[graft.operators.WordPiece.encodeWord]]): each step joins every
  * live word position against the derived vocabulary (non-`##` pieces
  * at position 1, `##`-bodied pieces after), takes the LONGEST match,
  * and advances; a position with no match marks the word [UNK]
  * (n_pieces = 1). `encodeSteps` must cover the max corpus word
  * length (8 here — each step consumes ≥ 1 char); `wpGuardSql`
  * asserts that bound inside the oracle rather than assuming it.
  *
  * Every CTE is MATERIALIZED — the BpeOracle re-evaluation lesson. */
object WordPieceOracle {

  private val DuckToks = "list_filter(string_split(trim(text), ' '), x -> x <> '')"
  private val Scale = "1000000000000000000000000" // 10^24: the pinned fixed point

  /** Training chain: w0 word freq → s0 (first char + ##continuations)
    * → [u_i symbol counts, p_i pair counts, b_i argmax, s_i rewrite]
    * × n. */
  private def mergeBlocks(n: Int): String = {
    val head =
      s"""w0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f FROM (SELECT unnest($DuckToks) AS w FROM documents) GROUP BY w),
         |s0 AS MATERIALIZED (SELECT w, f, list_concat([w[1:1]], ['##' || x for x in string_split(w, '')[2:]]) AS syms FROM w0 WHERE w <> '')""".stripMargin
    val steps = (1 to n).map { i =>
      val (u, p, b, sp, sn) = (s"u$i", s"p$i", s"b$i", s"s${i - 1}", s"s$i")
      s"""$u AS MATERIALIZED (SELECT sym, CAST(sum(f) AS BIGINT) AS c FROM (SELECT f, unnest(syms) AS sym FROM $sp) GROUP BY 1),
         |$p AS MATERIALIZED (SELECT pr.l AS l, pr.r AS r, CAST(sum(f) AS BIGINT) AS c FROM (SELECT f, unnest([{'l': syms[j], 'r': syms[j+1]} for j in range(1, len(syms))]) AS pr FROM $sp) GROUP BY 1, 2),
         |$b AS MATERIALIZED (SELECT p.l AS l, p.r AS r, p.l || substr(p.r, 3) AS m FROM $p p JOIN $u ul ON ul.sym = p.l JOIN $u ur ON ur.sym = p.r ORDER BY (CAST(p.c AS HUGEINT) * CAST('$Scale' AS HUGEINT)) // (CAST(ul.c AS HUGEINT) * CAST(ur.c AS HUGEINT)) DESC, p.l, p.r LIMIT 1),
         |$sn AS MATERIALIZED (SELECT w, f, CASE WHEN $b.l IS NULL THEN syms ELSE list_reduce([[x] for x in syms], (acc, e) -> CASE WHEN acc[-1] = $b.l AND e[1] = $b.r THEN list_append(acc[1:len(acc)-1], $b.m) ELSE list_concat(acc, e) END) END AS syms FROM $sp LEFT JOIN $b ON TRUE)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Max-word-length guard (the UnigramOracle ADVICE lesson): a word
    * longer than the unrolled encode depth would surface only as an
    * unexplained hash mismatch — assert it as a first-class column
    * instead. Returns a 1-row CTE whose value errors the oracle when
    * the bound breaks. */
  private def guard(maxLen: Int): String =
    s"""gw AS MATERIALIZED (SELECT CASE WHEN max(length(w)) <= $maxLen THEN 0
       |  ELSE error('wordpiece oracle: corpus word exceeds unroll depth $maxLen') END AS ok FROM w0)""".stripMargin

  /** Oracle for `text_wordpiece_merges`: (rank, left, right, piece)
    * in rank order; exhaustion-safe like [[BpeOracle.mergesSql]]. */
  def mergesSql(n: Int): String = {
    val union = (1 to n)
      .map(i => s"""SELECT CAST(${i - 1} AS BIGINT) AS rank, l AS "left", r AS "right", m AS piece FROM b$i""")
      .mkString("\nUNION ALL ")
    s"""WITH ${mergeBlocks(n)}
       |SELECT rank, "left", "right", piece FROM ($union) ORDER BY rank""".stripMargin
  }

  /** Oracle for `text_wordpiece_tokenize`: derive vocab, greedily
    * encode every corpus word (`encodeSteps` unrolled longest-match
    * steps), reassemble per doc: (doc, n_tokens, n_pieces,
    * n_unk_words). */
  def tokenizeSql(n: Int, encodeSteps: Int): String =
    tokenizeSqlWith(n, encodeSteps,
      """SELECT doc, n_tokens, n_pieces, n_unk_words, (SELECT ok FROM gw) AS guard_ok
        |FROM tc ORDER BY doc""".stripMargin)

  /** [[tokenizeSql]] rolled up PER LANGUAGE — the tokenizer-equity
    * ("fertility") report over the same derived vocab (the
    * [[BpeOracle.fertilitySql]] shape): pieces per word and pieces
    * per 100 chars by the corpus `lang` column, plus the UNK-word
    * rate the other tokenizer families cannot even express. */
  def fertilitySql(n: Int, encodeSteps: Int): String =
    tokenizeSqlWith(n, encodeSteps,
      """, f AS (SELECT dd.lang, tc.n_tokens, tc.n_pieces, tc.n_unk_words,
        |    CAST(coalesce(length(dd.text), 0) AS BIGINT) AS nc
        |  FROM tc JOIN documents dd ON dd.doc_id = tc.doc)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_words,
        |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
        |  CAST(sum(n_unk_words) AS BIGINT) AS n_unk_words,
        |  round(CAST(sum(n_pieces) AS DOUBLE) / nullif(sum(n_tokens), 0), 4) AS fertility,
        |  round(100.0 * sum(n_pieces) / nullif(sum(nc), 0), 4) AS pieces_per_100_chars
        |FROM f GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin)

  private def tokenizeSqlWith(n: Int, encodeSteps: Int,
                              finalSelect: String): String = {
    val vocabUnion = (1 to n).map(i => s"SELECT m AS sym FROM b$i").mkString(" UNION ")
    val enc = (1 to encodeSteps).map { k =>
      val (gp, gk, mk) = (s"g${k - 1}", s"g$k", s"m$k")
      s"""$mk AS MATERIALIZED (SELECT g.w AS w, max(CASE WHEN g.pos = 1 THEN len(v.sym) ELSE len(v.sym) - 2 END) AS blen
         |  FROM $gp g JOIN vv v ON (CASE WHEN g.pos = 1
         |    THEN v.sym NOT LIKE '##%' AND v.sym = substr(g.w, CAST(g.pos AS INT), len(v.sym))
         |    ELSE v.sym LIKE '##%' AND len(v.sym) > 2 AND substr(v.sym, 3) = substr(g.w, CAST(g.pos AS INT), len(v.sym) - 2) END)
         |  WHERE g.pos <= len(g.w) AND NOT g.unk GROUP BY 1),
         |$gk AS MATERIALIZED (SELECT g.w,
         |  CASE WHEN g.pos > len(g.w) OR g.unk THEN g.pos ELSE g.pos + coalesce($mk.blen, 0) END AS pos,
         |  CASE WHEN g.pos > len(g.w) OR g.unk OR $mk.blen IS NULL THEN g.np ELSE g.np + 1 END AS np,
         |  CASE WHEN g.unk THEN true WHEN g.pos <= len(g.w) AND $mk.blen IS NULL THEN true ELSE false END AS unk
         |  FROM $gp g LEFT JOIN $mk ON $mk.w = g.w)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${mergeBlocks(n)},
       |${guard(encodeSteps)},
       |vv AS MATERIALIZED (SELECT DISTINCT sym FROM (SELECT unnest(syms) AS sym FROM s0) UNION $vocabUnion),
       |g0 AS MATERIALIZED (SELECT w, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np, false AS unk FROM w0 WHERE w <> ''),
       |$enc,
       |wl AS MATERIALIZED (SELECT w,
       |  CASE WHEN unk THEN CAST(1 AS BIGINT) ELSE np END AS np,
       |  CASE WHEN unk THEN 1 ELSE 0 END AS isunk FROM g$encodeSteps),
       |d0 AS MATERIALIZED (SELECT doc_id, $DuckToks AS ws FROM documents),
       |tc AS MATERIALIZED (SELECT d0.doc_id AS doc, CAST(len(ws) AS BIGINT) AS n_tokens,
       |  coalesce(CAST(sum(wl.np) AS BIGINT), 0) AS n_pieces,
       |  coalesce(CAST(sum(wl.isunk) AS BIGINT), 0) AS n_unk_words
       |  FROM d0 LEFT JOIN (SELECT doc_id, unnest(ws) AS w FROM d0) t ON t.doc_id = d0.doc_id
       |  LEFT JOIN wl ON wl.w = t.w GROUP BY 1, 2)
       |$finalSelect""".stripMargin
  }
}
