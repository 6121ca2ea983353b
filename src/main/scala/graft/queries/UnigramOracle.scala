package graft.queries

/** GENERATED DuckDB oracle for the unigram-LM tokenizer family — the
  * [[BpeOracle]] unrolled-iteration precedent applied to hard-EM
  * Viterbi training ([[graft.operators.Unigram]]): DuckDB re-derives
  * the seed substring counts, every EM round's Viterbi dynamic program
  * (one CTE per word position, argmin by the totally-ordered
  * `(k ASC, Σcount DESC, predecessor ASC)` objective via row_number),
  * the path walk that recovers each word's argmin segmentation (eight
  * unrolled back-steps through the position-union table), the M-step
  * re-count + prune, and the final encode pass — so the oracle trusts
  * nothing from Spark but the corpus itself.
  *
  * Bounds that make the unroll finite and exact: corpus words are ≤ 8
  * chars — ASSERTED in the seed CTE via DuckDB `error()`, because the
  * bound is load-bearing ONLY on the oracle side: the Spark operator
  * ([[graft.operators.Unigram.segment]]) segments words of any length,
  * while this unroll has exactly `MaxWordLen` DP positions, so a
  * longer token would silently truncate HERE and surface as an
  * unexplained hash mismatch. The guard turns that into a loud oracle
  * error instead. Pieces are ≤ `maxPieceLen` chars, and every count is
  * an exact BIGINT (the integer-exactness doctrine — this is WHY the
  * trainer is hard-EM, see the operator's scaladoc). Every CTE is
  * MATERIALIZED (the BpeOracle inlining lesson: the chain references
  * each state repeatedly and DuckDB's default inlining re-evaluates
  * the whole prefix per reference). */
object UnigramOracle {

  private val DuckToks =
    "list_filter(string_split(trim(text), ' '), x -> x <> '')"
  private val MaxWordLen = 8

  /** seed + `rounds` EM rounds + one encode DP; returns the WITH body
    * up to and including `D{rounds+1}` (encode DP) and `v{rounds}`
    * (final vocabulary). */
  private def chain(nVocab: Int, maxPieceLen: Int, rounds: Int,
                    trainSrc: String): String = {
    val seed =
      s"""toks AS MATERIALIZED (SELECT doc_id, unnest($DuckToks) AS w FROM $trainSrc),
         |w0 AS MATERIALIZED (SELECT
         |  CASE WHEN len(w) > $MaxWordLen
         |       THEN error('unigram oracle: word exceeds MaxWordLen=$MaxWordLen — the unrolled DP cannot represent it (the Spark operator can; extend the unroll)')
         |       ELSE w END AS w,
         |  CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY w),
         |subs AS MATERIALIZED (SELECT p, CAST(sum(f) AS BIGINT) AS c FROM (
         |  SELECT f, substr(w, i, l) AS p
         |  FROM w0, range(1, ${MaxWordLen + 1}) t1(i), range(1, ${maxPieceLen + 1}) t2(l)
         |  WHERE i + l - 1 <= len(w)) GROUP BY p),
         |v0 AS MATERIALIZED (
         |  SELECT p, c FROM subs WHERE len(p) = 1
         |  UNION ALL
         |  SELECT p, c FROM (SELECT p, c FROM subs WHERE len(p) > 1
         |    ORDER BY c DESC, p LIMIT $nVocab))""".stripMargin

    def dp(r: Int): String = {
      val v = s"v${r - 1}"
      val d0 = s"d${r}_0 AS MATERIALIZED (SELECT w, f, 0 AS k, CAST(0 AS BIGINT) AS s, -1 AS pi FROM w0)"
      val steps = (1 to MaxWordLen).map { j =>
        val branches = (math.max(0, j - maxPieceLen) until j).map { i =>
          s"""SELECT d.w AS w, d.f AS f, d.k + 1 AS k, d.s + v.c AS s, $i AS pi
             |      FROM d${r}_$i d JOIN $v v ON v.p = substr(d.w, ${i + 1}, ${j - i})
             |      WHERE len(d.w) >= $j""".stripMargin
        }.mkString("\n      UNION ALL\n")
        s"""d${r}_$j AS MATERIALIZED (
           |  SELECT w, f, k, s, pi FROM (
           |    SELECT w, f, k, s, pi,
           |      row_number() OVER (PARTITION BY w ORDER BY k, s DESC, pi) AS rn
           |    FROM (
           |      $branches
           |    )) WHERE rn = 1)""".stripMargin
      }
      val union = (1 to MaxWordLen)
        .map(j => s"SELECT $j AS j, w, f, k, s, pi FROM d${r}_$j")
        .mkString("\n  UNION ALL ")
      val dAll = s"D$r AS MATERIALIZED (\n  $union)"
      (d0 +: steps :+ dAll).mkString(",\n")
    }

    def em(r: Int): String = {
      val walk0 =
        s"t${r}_0 AS MATERIALIZED (SELECT w, f, j, pi FROM D$r WHERE j = len(w))"
      val walks = (1 until MaxWordLen).map { k =>
        s"""t${r}_$k AS MATERIALIZED (SELECT t.w AS w, t.f AS f, d.j AS j, d.pi AS pi
           |  FROM t${r}_${k - 1} t JOIN D$r d ON d.w = t.w AND d.j = t.pi
           |  WHERE t.pi > 0)""".stripMargin
      }
      val pUnion = (0 until MaxWordLen).map(k => s"SELECT * FROM t${r}_$k")
        .mkString(" UNION ALL ")
      s"""$walk0,
         |${walks.mkString(",\n")},
         |pieces$r AS MATERIALIZED (SELECT w, f, substr(w, pi + 1, j - pi) AS p
         |  FROM ($pUnion)),
         |u$r AS MATERIALIZED (SELECT p, CAST(sum(f) AS BIGINT) AS c
         |  FROM pieces$r GROUP BY p),
         |v$r AS MATERIALIZED (
         |  SELECT s0.p AS p, coalesce(u.c, 0) AS c
         |  FROM (SELECT p FROM v0 WHERE len(p) = 1) s0
         |  LEFT JOIN u$r u ON u.p = s0.p
         |  UNION ALL
         |  SELECT p, c FROM (SELECT u.p AS p, u.c AS c FROM u$r u
         |    WHERE len(u.p) > 1 ORDER BY u.c DESC, u.p LIMIT $nVocab))""".stripMargin
    }

    val emRounds = (1 to rounds).map(r => s"${dp(r)},\n${em(r)}")
    val encodeDp = dp(rounds + 1)
    (seed +: emRounds :+ encodeDp).mkString(",\n")
  }

  /** Oracle for `text_unigram_tokenize`: `(doc, n_tokens, n_pieces,
    * fertility)` per doc under the trained vocabulary — fertility is
    * one closing double division of exact longs. */
  def tokenizeSql(nVocab: Int, maxPieceLen: Int = 3, rounds: Int = 2,
                  trainSrc: String = "documents"): String =
    s"""WITH ${chain(nVocab, maxPieceLen, rounds, trainSrc)},
       |wk AS MATERIALIZED (SELECT w, k FROM D${rounds + 1} WHERE j = len(w)),
       |g AS (SELECT doc_id AS doc, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(k) AS BIGINT) AS n_pieces
       |  FROM toks JOIN wk USING (w) GROUP BY doc_id)
       |SELECT doc, n_tokens, n_pieces,
       |  CAST(n_pieces AS DOUBLE) / n_tokens AS fertility
       |FROM g ORDER BY doc""".stripMargin

  /** Oracle for `text_unigram_fertility`: the [[tokenizeSql]] per-doc
    * chain rolled up per corpus language — the tokenizer-equity report
    * (`text_bpe_fertility`'s shape under the unigram vocabulary).
    * Fertility is one closing double division of exact long sums. */
  def fertilitySql(nVocab: Int, maxPieceLen: Int = 3, rounds: Int = 2,
                   trainSrc: String = "documents"): String =
    s"""WITH ${chain(nVocab, maxPieceLen, rounds, trainSrc)},
       |wk AS MATERIALIZED (SELECT w, k FROM D${rounds + 1} WHERE j = len(w)),
       |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(k) AS BIGINT) AS n_pieces
       |  FROM toks JOIN wk USING (w) GROUP BY doc_id)
       |SELECT d.lang AS lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(g.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(g.n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(sum(g.n_pieces) AS DOUBLE) / sum(g.n_words) AS fertility
       |FROM g JOIN documents d USING (doc_id)
       |GROUP BY d.lang ORDER BY lang NULLS LAST""".stripMargin

  /** Oracle for `text_unigram_byte_fallback`: [[tokenizeSql]]'s chain,
    * with every doc's encode input carrying ONE appended OOV token
    * `☃☃<doc_id%10>` (U+2603 never occurs in the corpus — asserted by
    * construction of the fixture, and any drift would hash-mismatch
    * loudly). Under the byte-fallback contract its piece cost is EXACT
    * integer arithmetic the oracle replays without running the DP on
    * it: each ☃ is OOV → 3 UTF-8 bytes → 3 pieces, the digit is a
    * covered (or 1-byte-fallback) single → 1 piece — 7 pieces, 1
    * token, for every doc including the zero-token ones the plain
    * tokenize oracle drops (hence the LEFT join from the doc table:
    * the fallback token makes every doc encodable). */
  def byteFallbackSql(nVocab: Int, maxPieceLen: Int = 3, rounds: Int = 2,
                      trainSrc: String = "documents"): String =
    s"""WITH ${chain(nVocab, maxPieceLen, rounds, trainSrc)},
       |wk AS MATERIALIZED (SELECT w, k FROM D${rounds + 1} WHERE j = len(w)),
       |t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(k) AS BIGINT) AS s
       |  FROM toks JOIN wk USING (w) GROUP BY doc_id)
       |SELECT d.doc_id AS doc,
       |  CAST(coalesce(t.n, 0) + 1 AS BIGINT) AS n_tokens,
       |  CAST(coalesce(t.s, 0) + 7 AS BIGINT) AS n_pieces,
       |  CAST(coalesce(t.s, 0) + 7 AS DOUBLE) / (coalesce(t.n, 0) + 1)
       |    AS fertility
       |FROM $trainSrc d LEFT JOIN t USING (doc_id) ORDER BY doc""".stripMargin

  /** Oracle for `text_unigram_vocab`: the final piece table in
    * (count DESC, piece ASC) rank order — the stored artifact of the
    * train-once/encode-many contract. */
  def vocabSql(nVocab: Int, maxPieceLen: Int = 3, rounds: Int = 2,
               trainSrc: String = "documents"): String =
    s"""WITH ${chain(nVocab, maxPieceLen, rounds, trainSrc)}
       |SELECT CAST(row_number() OVER (ORDER BY c DESC, p) - 1 AS BIGINT) AS rank,
       |  p AS piece, CAST(c AS BIGINT) AS n
       |FROM v$rounds ORDER BY rank""".stripMargin
}
