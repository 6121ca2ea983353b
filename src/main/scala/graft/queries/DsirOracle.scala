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

  def fixedPointLog2Cte(inputCte: String): String = {
    val header =
      s"""q AS (SELECT b, greatest((num * 65536) // den, 1) AS q0 FROM $inputCte),
         |n0 AS (SELECT b, q0, CAST(length(bin(q0)) - 17 AS BIGINT) AS cc,
         |        CASE WHEN length(bin(q0)) - 17 >= 0
         |             THEN q0 // (CAST(1 AS BIGINT) << (length(bin(q0)) - 17))
         |             ELSE q0 * (CAST(1 AS BIGINT) << (17 - length(bin(q0)))) END AS m0,
         |        CAST(0 AS BIGINT) AS f0 FROM q)""".stripMargin
    val steps = (1 to 8).map { i =>
      val p = i - 1
      s"""i$i AS (SELECT b, cc, (m$p * m$p) // 65536 AS s,
         |        f$p * 2 + CASE WHEN (m$p * m$p) // 65536 >= 131072 THEN 1 ELSE 0 END AS f$i
         |        FROM ${if (p == 0) "n0" else s"j$p"}),
         |j$i AS (SELECT b, cc, CASE WHEN s >= 131072 THEN s // 2 ELSE s END AS m$i, f$i FROM i$i)""".stripMargin
    }
    val footer = "sbq AS (SELECT b, cc * 256 + f8 AS sb FROM j8)"
    (Seq(header) ++ steps ++ Seq(footer)).mkString(",\n")
  }
}
