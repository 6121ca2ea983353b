package graft.expressions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The native codegen'd vector expressions against their composable HOF
  * reference implementations: bit-identical values on random data, same
  * NULL semantics on the edges, reachable from SQL. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(n: Int, dims: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong,
      Seq.fill(dims)(rnd.nextFloat() * 2 - 1),
      Seq.fill(dims)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "a", "b")
  }

  test("native dot and cosine are bit-identical to the HOF forms") {
    val df = randomVecs(500, 64)
    val diff = df.select(
      (Similarity.dot(col("a"), col("b")) =!= Similarity.dotHof(col("a"), col("b"))).as("d1"),
      (Similarity.cosine(col("a"), col("b")) =!= Similarity.cosineHof(col("a"), col("b"))).as("d2"))
      .filter(col("d1") || col("d2"))
    assert(diff.count() == 0)
  }

  test("NULL semantics: null side, zero norm, length mismatch, null element") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Some(Seq(3.0f, 4.0f))),
      (2L, Seq(1.0f, 2.0f), None),
      (3L, Seq(0.0f, 0.0f), Some(Seq(1.0f, 1.0f))),
      (4L, Seq(1.0f, 2.0f), Some(Seq(1.0f))))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("dot"),
      Similarity.cosine(col("a"), col("b")).as("cos"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(rows(1L)._1.contains(11.0))
    assert(rows(2L) == ((None, None))) // null side
    assert(rows(3L)._1.contains(0.0) && rows(3L)._2.isEmpty) // zero norm ⇒ cosine NULL
    assert(rows(4L) == ((None, None))) // length mismatch
  }

  test("registered SQL functions resolve and compute") {
    VectorExpressions.register(spark)
    val row = spark.sql(
      "SELECT graft_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "round(graft_cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 6) AS c").head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 1.0)
  }

  test("fingerprint family resolves from SQL with literal shape args") {
    VectorExpressions.register(spark)
    val row = spark.sql(
      "SELECT graft_simhash16(array('a','b')) AS sh, " +
        "size(graft_minhash_sig(array('a','b','c','d'), 2, 4)) AS nsig, " +
        "graft_winnow_fingerprint('abcdefghij', 4, 3) AS wf").head()
    assert(row.getString(0).length == 16 && row.getString(0).forall(c => c == '0' || c == '1'))
    assert(row.getInt(1) == 4)
    assert(row.getSeq[String](2).nonEmpty)
  }

  test("type check rejects non-float arrays") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Similarity.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }

  test("native expression stays inside whole-stage codegen") {
    // local relations constant-fold to LocalTableScan; use a file-backed
    // frame so a real codegen stage is planned
    val dir = tmpDir("graft-vec")
    randomVecs(10, 8).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .queryExecution.executedPlan.toString
    // "*(1) Project [cosinesim(...)]" — the * prefix marks a
    // WholeStageCodegen stage in the compact plan string
    assert(plan.contains("*(1) Project [cosinesim"))
  }
}
