package graft.queries

/** Generated DuckDB oracle fragment for the DSIR scorer's fixed-point
  * log ([[graft.operators.TextOps.withFixedPointLog2Q8]]): the 8
  * squaring steps unrolled as CTE pairs, mirroring the Spark
  * withColumn chain step for step (the PcaOracle/BpeOracle generated-
  * twin doctrine — one generator, so the two engines cannot drift in
  * step count or rounding).
  *
  * Input CTE must provide `(b, num, den)`; the fragment appends CTEs
  * ending in `sbq(b, sb)` with sb = floor-ish(256·log2(num/den)) in
  * exact long arithmetic.
  */
object DsirOracle {

  /** `p` prefixes every CTE name so two ladders can live in one WITH
    * (the PcaOracle deflation-prefix precedent). */
  def fixedPointLog2Cte(inputCte: String, p: String = ""): String = {
    val header =
      s"""${p}q AS (SELECT b, greatest((num * 65536) // den, 1) AS q0 FROM $inputCte),
         |${p}n0 AS (SELECT b, q0, CAST(length(bin(q0)) - 17 AS BIGINT) AS cc,
         |        CASE WHEN length(bin(q0)) - 17 >= 0
         |             THEN q0 // (CAST(1 AS BIGINT) << (length(bin(q0)) - 17))
         |             ELSE q0 * (CAST(1 AS BIGINT) << (17 - length(bin(q0)))) END AS m0,
         |        CAST(0 AS BIGINT) AS f0 FROM ${p}q)""".stripMargin
    val steps = (1 to 8).map { i =>
      val pr = i - 1
      s"""${p}i$i AS (SELECT b, cc, (m$pr * m$pr) // 65536 AS s,
         |        f$pr * 2 + CASE WHEN (m$pr * m$pr) // 65536 >= 131072 THEN 1 ELSE 0 END AS f$i
         |        FROM ${if (pr == 0) s"${p}n0" else s"${p}j$pr"}),
         |${p}j$i AS (SELECT b, cc, CASE WHEN s >= 131072 THEN s // 2 ELSE s END AS m$i, f$i FROM ${p}i$i)""".stripMargin
    }
    val footer = s"${p}sbq AS (SELECT b, cc * 256 + f8 AS sb FROM ${p}j8)"
    (Seq(header) ++ steps ++ Seq(footer)).mkString(",\n")
  }
}
