package graft.queries

/** GENERATED DuckDB oracle for deterministic k-means
  * ([[graft.operators.KMeans]]) — the unrolled-iteration doctrine
  * (PcaOracle/BpeOracle) applied to Lloyd's: DuckDB re-derives the
  * content-deterministic seeds, every iteration's quantized distances,
  * the min(dq·k + j) tie-broken argmin, the exact long component sums,
  * and the truncation-divided dyadic centroid updates — so the whole
  * clustering loop is independently verified, not just its inputs.
  *
  * All CTEs MATERIALIZED (each iteration reads the previous centroid
  * frame twice — the BpeOracle inlining lesson). DuckDB's integer `//`
  * TRUNCATES toward zero (measured: -7//2 = -3), so the Scala side uses
  * plain truncating long division — floorDiv would drift one quantum on
  * every negative component sum.
  */
object KMeansOracle {

  private val S = "4294967296.0"

  def trainSql(k: Int, iters: Int): String = {
    val header =
      s"""u0 AS MATERIALIZED (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, CAST(unnest(embedding) AS DOUBLE) AS xi FROM embeddings),
         |sd AS MATERIALIZED (SELECT vec_id % $k AS j, min(vec_id) AS sid FROM embeddings GROUP BY 1),
         |c0 AS MATERIALIZED (SELECT sd.j, u0.i, u0.xi AS cv FROM sd JOIN u0 ON u0.vec_id = sd.sid)""".stripMargin
    val steps = (1 to iters).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (SELECT u0.vec_id, c.j,
         |    CAST(sum(CAST(round((u0.xi - c.cv) * (u0.xi - c.cv) * $S) AS BIGINT)) AS BIGINT) AS dq
         |  FROM u0 JOIN c$p c ON c.i = u0.i GROUP BY 1, 2),
         |a$t AS MATERIALIZED (SELECT vec_id, CAST(min(dq * $k + j) % $k AS BIGINT) AS j FROM d$t GROUP BY vec_id),
         |n$t AS MATERIALIZED (SELECT j, CAST(count(*) AS BIGINT) AS n FROM a$t GROUP BY j),
         |s$t AS MATERIALIZED (SELECT a.j, u0.i, CAST(sum(CAST(round(u0.xi * $S) AS BIGINT)) AS BIGINT) AS sq
         |  FROM a$t a JOIN u0 ON u0.vec_id = a.vec_id GROUP BY 1, 2),
         |c$t AS MATERIALIZED (
         |  SELECT s.j, s.i, CAST(s.sq // n.n AS DOUBLE) / $S AS cv FROM s$t s JOIN n$t n USING (j)
         |  UNION ALL
         |  SELECT c.j, c.i, c.cv FROM c$p c WHERE c.j NOT IN (SELECT j FROM n$t))""".stripMargin
    }
    s"""WITH ${(header +: steps).mkString(",\n")}
       |SELECT c.j AS cluster, coalesce(n.n, 0) AS n_members, c.i - 1 AS dim,
       |  CAST(round(c.cv * $S) AS BIGINT) AS cq
       |FROM c$iters c LEFT JOIN n$iters n USING (j)
       |ORDER BY cluster, dim""".stripMargin
  }

  /** Oracle for the SERVE half: every vector's assignment under the
    * trained model — one more quantized-distance/argmin round against
    * the final centroid frame. */
  def assignSql(k: Int, iters: Int): String = {
    val header =
      s"""u0 AS MATERIALIZED (SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, CAST(unnest(embedding) AS DOUBLE) AS xi FROM embeddings),
         |sd AS MATERIALIZED (SELECT vec_id % $k AS j, min(vec_id) AS sid FROM embeddings GROUP BY 1),
         |c0 AS MATERIALIZED (SELECT sd.j, u0.i, u0.xi AS cv FROM sd JOIN u0 ON u0.vec_id = sd.sid)""".stripMargin
    val steps = (1 to iters).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (SELECT u0.vec_id, c.j,
         |    CAST(sum(CAST(round((u0.xi - c.cv) * (u0.xi - c.cv) * $S) AS BIGINT)) AS BIGINT) AS dq
         |  FROM u0 JOIN c$p c ON c.i = u0.i GROUP BY 1, 2),
         |a$t AS MATERIALIZED (SELECT vec_id, CAST(min(dq * $k + j) % $k AS BIGINT) AS j FROM d$t GROUP BY vec_id),
         |n$t AS MATERIALIZED (SELECT j, CAST(count(*) AS BIGINT) AS n FROM a$t GROUP BY j),
         |s$t AS MATERIALIZED (SELECT a.j, u0.i, CAST(sum(CAST(round(u0.xi * $S) AS BIGINT)) AS BIGINT) AS sq
         |  FROM a$t a JOIN u0 ON u0.vec_id = a.vec_id GROUP BY 1, 2),
         |c$t AS MATERIALIZED (
         |  SELECT s.j, s.i, CAST(s.sq // n.n AS DOUBLE) / $S AS cv FROM s$t s JOIN n$t n USING (j)
         |  UNION ALL
         |  SELECT c.j, c.i, c.cv FROM c$p c WHERE c.j NOT IN (SELECT j FROM n$t))""".stripMargin
    }
    val serve =
      s"""ds AS (SELECT u0.vec_id, c.j,
         |    CAST(sum(CAST(round((u0.xi - c.cv) * (u0.xi - c.cv) * $S) AS BIGINT)) AS BIGINT) AS dq
         |  FROM u0 JOIN c$iters c ON c.i = u0.i GROUP BY 1, 2)
         |SELECT vec_id, CAST(min(dq * $k + j) % $k AS BIGINT) AS cluster
         |FROM ds GROUP BY vec_id ORDER BY vec_id""".stripMargin
    s"""WITH ${(header +: steps).mkString(",\n")},
       |${serve}""".stripMargin
  }

  /** Oracle for per-cluster inertia: the serve round's winning quantized
    * distances summed per cluster — dq recovered exactly from the
    * tie-break key ((min_key − j) / k, integer division exact because
    * min_key ≡ j (mod k)). */
  def inertiaSql(k: Int, iters: Int): String = {
    val base = assignSql(k, iters)
    val cut = base.lastIndexOf("SELECT vec_id,")
    // the prefix ends at the ds CTE's closing paren — append the argmin
    // rollup as two more CTE-equivalent steps
    s"""${base.substring(0, cut).trim.stripSuffix(")")}),
       |a AS (SELECT vec_id, CAST(min(dq * $k + j) AS BIGINT) AS mk FROM ds GROUP BY vec_id)
       |SELECT CAST(mk % $k AS BIGINT) AS cluster,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(sum((mk - mk % $k) // $k) AS BIGINT) AS inertia_q
       |FROM a GROUP BY 1 ORDER BY cluster""".stripMargin
  }
}
