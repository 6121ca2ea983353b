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

  test("NearestCentroids: argmax, tie→smallest id, degenerate rows, top-n order") {
    val cents = Seq(10L -> Seq(1.0f, 0.0f), 20L -> Seq(0.0f, 1.0f), 30L -> Seq(1.0f, 0.0f))
    val df = Seq(
      (1L, Some(Seq(1.0f, 0.1f))), // nearest axis-x; 10 and 30 tie → 10
      (2L, Some(Seq(0.1f, 1.0f))), // nearest axis-y → 20
      (3L, Some(Seq(0.0f, 0.0f))), // zero norm: all -2 → smallest id 10
      (4L, None), // null vec: same degenerate rule
      (5L, Some(Seq(1.0f)))) // length mismatch: same
      .toDF("id", "v")
    val out = df.select(col("id"),
      Similarity.nearestCentroid(col("v"), cents, round4 = true).as("cid"),
      Similarity.topCentroids(col("v"), cents, n = 3, round4 = true).as("top"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(out(1L)._1 == 10L && out(2L)._1 == 20L)
    assert(out(3L)._1 == 10L && out(4L)._1 == 10L && out(5L)._1 == 10L)
    assert(out(1L)._2 == Seq(10L, 30L, 20L)) // tie 10/30 before orthogonal 20
    assert(out(3L)._2 == Seq(10L, 20L, 30L)) // all tied at -2 → id order
  }

  test("NearestCentroids matches the relational crossJoin+window argmax on random data") {
    val rnd = new scala.util.Random(11)
    val cents = (0 until 8).map(c => (c.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = (0 until 300).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val viaExpr = df.select(col("id"),
      Similarity.nearestCentroid(col("v"), cents, round4 = true).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centDf = cents.toDF("_cid", "_cvec")
      .select(col("_cid"), col("_cvec").cast("array<float>").as("_cvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("_sim"), asc("_cid"))
    val viaWindow = df.crossJoin(broadcast(centDf))
      .select(col("id"), col("_cid"),
        round(Similarity.cosine(col("v"), col("_cvec")), 4).as("_sim"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaWindow)
  }

  test("TwoLevelNearestCentroids: all-branches == flat argmax; narrow search stays in-branch") {
    val rnd = new scala.util.Random(7)
    val cents = (0 until 64).map(c => (c.toLong * 3, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val idx = Similarity.buildCoarseIndex(cents, nCoarse = 8)
    assert(idx._2.map(_.size).sum == 64, "every fine centroid lands in exactly one branch")

    val df = ((0 until 200).map(i => (i.toLong, Some(Seq.fill(16)(rnd.nextFloat() * 2 - 1)))) ++
      Seq((500L, Some(Seq(0.0f))), (501L, None))) // degenerate rows assign too
      .toDF("id", "v")

    // searching EVERY branch is the flat argmax, bit-for-bit (same cosine,
    // same round4 lattice, same (sim desc, id asc) ties)
    val flat = df.select(col("id"),
      Similarity.topCentroids(col("v"), cents, n = 3, round4 = true).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val all = df.select(col("id"),
      Similarity.topCentroidsTwoLevel(col("v"), idx, n = 3, branches = 8, round4 = true).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(all == flat)

    // branches = 1 returns ids only from the single searched branch
    val byBranch = idx._2.zipWithIndex.flatMap { case (ids, b) => ids.map(_ -> b) }.toMap
    df.select(Similarity.topCentroidsTwoLevel(col("v"), idx, n = 3, branches = 1, round4 = true))
      .collect().foreach { r =>
        val picked = r.getSeq[Long](0)
        assert(picked.nonEmpty && picked.map(byBranch).distinct.size == 1,
          s"narrow search must stay within one branch, got $picked")
      }
  }

  test("ivfTopK with a two-level coarse index matches the flat path when all branches search") {
    val rnd = new scala.util.Random(13)
    val cents = (0 until 16).map(c => (c.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val centDf = cents.toDF("cid", "v")
      .select(col("cid"), col("v").cast("array<float>").as("v"))
    val corpus = (100 until 400).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val query = corpus.filter(col("id") === 100)
    val flat = Similarity.ivfTopK(corpus, "id", "v", centDf, "cid", query, k = 5, probes = 2)
      .collect().map(_.getLong(0)).toSeq
    // nCoarse = ceil(sqrt(16)) = 4; branches = 4 searches them all
    val two = Similarity.ivfTopK(corpus, "id", "v", centDf, "cid", query, k = 5, probes = 2,
      coarseBranches = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(two == flat)
    // a narrow two-level probe still returns k well-formed results
    val narrow = Similarity.ivfTopK(corpus, "id", "v", centDf, "cid", query, k = 5, probes = 2,
      coarseBranches = 1).collect()
    assert(narrow.length == 5 && narrow.head.getLong(0) == 100L,
      "the query vector itself must top its own probe")
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

    // The int8 pair stays inside codegen too — including over a
    // NON-NULLABLE input, where a mis-declared isNull local would fail
    // Janino compilation and silently fall back to interpreted execution.
    val q8 = df.select(Similarity.cosineInt8(
      Similarity.quantizeInt8(col("a")), Similarity.quantizeInt8(col("b"))).as("c"))
    assert(q8.queryExecution.executedPlan.toString.contains("*(1) Project [int8cosinesim"))
    q8.collect() // force codegen compilation, not just planning
  }

  test("int8 quantization: lattice values, clamp, scale cancellation, degenerates") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)), // maxabs 1.0 → [64, -127, 32, 0]
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector → all-zero lattice
      (3L, Seq(2.0f, 2.0f, 2.0f, 2.0f))) // scale cancels: q = [127,127,127,127]
      .toDF("id", "v")
    val q = df.select(col("id"), Similarity.quantizeInt8(col("v")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    // Math.round = floor(x+0.5): 127*0.5=63.5 → 64; 127*0.25=31.75 → 32
    assert(q(1L) == Seq[Byte](64, -127, 32, 0))
    assert(q(2L) == Seq[Byte](0, 0, 0, 0))
    assert(q(3L) == Seq[Byte](127, 127, 127, 127))

    // Quantized cosine: zero lattice ⇒ NULL (degenerate guard), parallel
    // lattices ⇒ 1.0 exactly (integer sums).
    val qq = df.select(col("id"),
      Similarity.cosineInt8(
        Similarity.quantizeInt8(col("v")),
        Similarity.quantizeInt8(typedLit(Seq(1.0f, 1.0f, 1.0f, 1.0f)))).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(qq(2L).isEmpty)
    assert(qq(3L).contains(1.0))
  }

  test("int8 cosine tracks exact cosine within the SQ8 error bound on random data") {
    val df = randomVecs(300, 64)
    val rows = df.select(
      Similarity.cosine(col("a"), col("b")).as("exact"),
      Similarity.cosineInt8(
        Similarity.quantizeInt8(col("a")), Similarity.quantizeInt8(col("b"))).as("q8"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      val err = math.abs(r.getDouble(0) - r.getDouble(1))
      // lattice perturbs each coordinate by ≤ 1/254 relative; the cosine
      // error stays well under 2% on non-adversarial vectors
      assert(err < 0.02, s"quantized cosine drifted: $err")
    }
    // SQL registration
    graft.expressions.VectorExpressions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_int8_cosine_sim(graft_int8_quantize(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))), " +
        "graft_int8_quantize(array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))))").head().getDouble(0)
    assert(math.abs(viaSql - 1.0) < 1e-9)
  }
}
