package graft.queries

/** GENERATED DuckDB oracle for the deterministic PCA family
  * ([[graft.operators.Pca]]) — the unrolled-iteration precedent
  * (graph_pagerank, BpeOracle) applied to power iteration: DuckDB
  * re-derives the exact quantized moments, the covariance (one fixed
  * closing-division shape mirrored token-for-token), every power-
  * iteration step (quantized matmul, quantized normalizer, one division),
  * the Rayleigh eigenvalue, and the per-row projections — so the whole
  * eigen-solve is independently verified, not just its inputs.
  *
  * All CTEs MATERIALIZED (the step chain references each state twice;
  * default inlining re-evaluates the prefix exponentially — the BpeOracle
  * lesson). `v0lit` must be the Scala-printed double `1/√d` so both
  * engines parse identical bits (the pagerank literal doctrine).
  */
object PcaOracle {

  private val S = "4294967296.0"

  /** Moment + covariance chain over the embeddings table. */
  private def covBlocks: String =
    s"""u0 AS MATERIALIZED (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, unnest(embedding) AS xi FROM embeddings),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       |sm AS MATERIALIZED (SELECT i, CAST(sum(CAST(round(CAST(xi AS DOUBLE) * $S) AS BIGINT)) AS BIGINT) AS sq FROM u0 GROUP BY i),
       |qq AS MATERIALIZED (SELECT a.i AS i, b.i AS j, CAST(sum(CAST(round(CAST(a.xi AS DOUBLE) * CAST(b.xi AS DOUBLE) * $S) AS BIGINT)) AS BIGINT) AS q FROM u0 a JOIN u0 b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |cv AS MATERIALIZED (SELECT qq.i, qq.j, (CAST(qq.q AS DOUBLE) / $S) / nn.n - ((CAST(si.sq AS DOUBLE) / $S) / nn.n) * ((CAST(sj.sq AS DOUBLE) / $S) / nn.n) AS c FROM qq JOIN sm si ON si.i = qq.i JOIN sm sj ON sj.i = qq.j CROSS JOIN nn)""".stripMargin

  /** Unrolled power-iteration steps `${p}v0` → `${p}v{iters}` over the
    * matrix CTE `cvn(i, j, c)`; `p` prefixes the step names so deflated
    * re-solves can chain in one statement. */
  private def powerBlocks(iters: Int, v0lit: String,
                          cvn: String = "cv", p: String = ""): String = {
    val head = s"${p}v0 AS MATERIALIZED (SELECT i, CAST($v0lit AS DOUBLE) AS vv FROM sm)"
    val steps = (1 to iters).map { k =>
      s"""${p}u$k AS MATERIALIZED (SELECT $cvn.i AS i, CAST(sum(CAST(round($cvn.c * v.vv * $S) AS BIGINT)) AS BIGINT) AS uq FROM $cvn JOIN ${p}v${k - 1} v ON v.i = $cvn.j GROUP BY $cvn.i),
         |${p}w$k AS MATERIALIZED (SELECT i, CAST(uq AS DOUBLE) / $S AS wv FROM ${p}u$k),
         |${p}n$k AS MATERIALIZED (SELECT CAST(sum(CAST(round(wv * wv * $S) AS BIGINT)) AS BIGINT) AS nq FROM ${p}w$k),
         |${p}v$k AS MATERIALIZED (SELECT i, wv / sqrt(CAST(${p}n$k.nq AS DOUBLE) / $S) AS vv FROM ${p}w$k, ${p}n$k)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Oracle for `sim_pca_cov`: the full d×d covariance, 0-based dims. */
  def covSql: String =
    s"""WITH $covBlocks
       |SELECT i - 1 AS pos_i, j - 1 AS pos_j, c AS cov FROM cv ORDER BY pos_i, pos_j""".stripMargin

  /** Oracle for `sim_pca_top_pc`: first component + Rayleigh eigenvalue. */
  def topPcSql(iters: Int, v0lit: String): String =
    s"""WITH $covBlocks,
       |${powerBlocks(iters, v0lit)},
       |lam AS MATERIALIZED (SELECT CAST(sum(CAST(round(cv.c * a.vv * b.vv * $S) AS BIGINT)) AS BIGINT) AS lq FROM cv JOIN v$iters a ON a.i = cv.i JOIN v$iters b ON b.i = cv.j)
       |SELECT v.i - 1 AS pos, v.vv AS loading, CAST(lam.lq AS DOUBLE) / $S AS eigval FROM v$iters v, lam ORDER BY pos""".stripMargin

  /** Deflation chain for `k` components: each solve runs under prefix
    * `c{m}`, the eigenvalue lands in `lam{m}`, and the next solve runs on
    * the deflated matrix (`c - lam * v_i * v_j`, left-associated — the
    * SAME fixed shape as the Scala driver). */
  private def componentChain(k: Int, iters: Int, v0lit: String): String = {
    val blocks = Seq.newBuilder[String]
    var cvn = "cv"
    for (m <- 1 to k) {
      val p = s"c$m"
      blocks += powerBlocks(iters, v0lit, cvn, p)
      blocks += s"lam$m AS MATERIALIZED (SELECT CAST(sum(CAST(round($cvn.c * a.vv * b.vv * $S) AS BIGINT)) AS BIGINT) AS lq FROM $cvn JOIN ${p}v$iters a ON a.i = $cvn.i JOIN ${p}v$iters b ON b.i = $cvn.j)"
      if (m < k) {
        val next = s"cv$m"
        blocks += s"$next AS MATERIALIZED (SELECT $cvn.i, $cvn.j, $cvn.c - (CAST(lam$m.lq AS DOUBLE) / $S) * a.vv * b.vv AS c FROM $cvn CROSS JOIN lam$m JOIN ${p}v$iters a ON a.i = $cvn.i JOIN ${p}v$iters b ON b.i = $cvn.j)"
        cvn = next
      }
    }
    blocks.result().mkString(",\n")
  }

  /** Oracle for `sim_pca_components` (and, verbatim, for
    * `sim_pca_incremental` — the appended-moments path must be
    * bit-identical to from-scratch, so it SHARES this oracle: the
    * incremental-BM25 shared-oracle precedent). */
  def componentsSql(k: Int, iters: Int, v0lit: String): String = {
    val sel = (1 to k).map { m =>
      s"SELECT CAST(${m - 1} AS BIGINT) AS comp, v.i - 1 AS pos, v.vv AS loading, CAST(lam$m.lq AS DOUBLE) / $S AS eigval FROM c${m}v$iters v, lam$m"
    }.mkString("\nUNION ALL ")
    s"""WITH $covBlocks,
       |${componentChain(k, iters, v0lit)}
       |SELECT comp, pos, loading, eigval FROM ($sel) ORDER BY comp, pos""".stripMargin
  }

  /** Per-component projection CTE `p$m(vec_id, y)` against the mean. */
  private def projBlock(m: Int, iters: Int): String =
    s"p$m AS MATERIALIZED (SELECT u0.vec_id AS vec_id, CAST(sum(CAST(round((CAST(u0.xi AS DOUBLE) - mn.m) * v.vv * $S) AS BIGINT)) AS BIGINT) / $S AS y FROM u0 JOIN mn ON mn.i = u0.i JOIN c${m}v$iters v ON v.i = u0.i GROUP BY u0.vec_id)"

  /** Oracle for `sim_pca_map`: every row's (pc1, pc2) coordinates — the
    * 2-D corpus map. */
  def mapSql(iters: Int, v0lit: String): String =
    s"""WITH $covBlocks,
       |${componentChain(2, iters, v0lit)},
       |mn AS MATERIALIZED (SELECT i, (CAST(sq AS DOUBLE) / $S) / nn.n AS m FROM sm, nn),
       |${projBlock(1, iters)},
       |${projBlock(2, iters)}
       |SELECT p1.vec_id AS vec_id, p1.y AS pc1, p2.y AS pc2
       |FROM p1 JOIN p2 ON p2.vec_id = p1.vec_id ORDER BY vec_id""".stripMargin

  /** Oracle for `sim_pca_outliers`: top-20 by the 2-component
    * Mahalanobis score p₁²/λ₁ + p₂²/λ₂ — embedding-space outliers. */
  def outliersSql(iters: Int, v0lit: String): String =
    s"""WITH $covBlocks,
       |${componentChain(2, iters, v0lit)},
       |mn AS MATERIALIZED (SELECT i, (CAST(sq AS DOUBLE) / $S) / nn.n AS m FROM sm, nn),
       |${projBlock(1, iters)},
       |${projBlock(2, iters)}
       |SELECT p1.vec_id AS vec_id,
       |  round(p1.y * p1.y / (CAST(lam1.lq AS DOUBLE) / $S) + p2.y * p2.y / (CAST(lam2.lq AS DOUBLE) / $S), 4) AS score
       |FROM p1 JOIN p2 ON p2.vec_id = p1.vec_id CROSS JOIN lam1 CROSS JOIN lam2
       |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin

  /** Oracle for `sim_pca_project`: every row's coordinate along PC1. */
  def projectSql(iters: Int, v0lit: String): String =
    s"""WITH $covBlocks,
       |${powerBlocks(iters, v0lit)},
       |mn AS MATERIALIZED (SELECT i, (CAST(sq AS DOUBLE) / $S) / nn.n AS m FROM sm, nn)
       |SELECT u0.vec_id AS vec_id, CAST(sum(CAST(round((CAST(u0.xi AS DOUBLE) - mn.m) * v.vv * $S) AS BIGINT)) AS BIGINT) / $S AS pc1
       |FROM u0 JOIN mn ON mn.i = u0.i JOIN v$iters v ON v.i = u0.i GROUP BY u0.vec_id ORDER BY vec_id""".stripMargin
}
