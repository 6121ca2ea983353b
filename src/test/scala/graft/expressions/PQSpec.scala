package graft.expressions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product quantization: encode semantics (argmin, ties, degenerates),
  * ADC = sum of LUT lookups, equality with a relational twin, and the
  * trained-codebook quality direction. */
class PQSpec extends SparkSpec {
  import spark.implicits._

  test("PQEncode: per-subspace argmin, tie→smallest code, degenerate→null") {
    // dims=4, m=2 subspaces of 2; 2 codes per subspace
    val cb = Seq(
      Seq(Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)), // subspace 0
      Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))) // subspace 1
    val df = Seq(
      (1L, Some(Seq(0.1f, 0.1f, 0.9f, 0.1f))), // sub0→code0, sub1→code0
      (2L, Some(Seq(0.9f, 0.9f, 0.1f, 0.9f))), // sub0→code1, sub1→code1
      (3L, Some(Seq(0.5f, 0.5f, 0.5f, 0.5f))), // both subspaces tie → code 0
      (4L, None), // null vector
      (5L, Some(Seq(1.0f, 2.0f)))) // wrong dims
      .toDF("id", "v")
    val out = df.select(col("id"), Similarity.pqEncode(col("v"), cb).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]](1))).toMap
    assert(out(1L).get.toSeq == Seq[Byte](0, 0))
    assert(out(2L).get.toSeq == Seq[Byte](1, 1))
    assert(out(3L).get.toSeq == Seq[Byte](0, 0), "L2 ties resolve to the smallest code")
    assert(out(4L).isEmpty && out(5L).isEmpty)
  }

  test("ADC score is exactly the sum of the query's LUT terms") {
    val cb = Seq(
      Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      Seq(Seq(2.0f, 0.0f), Seq(0.0f, 2.0f)))
    // query (1,2,3,4): lut[0] = [1.0, 2.0], lut[1] = [6.0, 8.0]
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 2.0f, 0.0f)), // codes (0,0) → 1 + 6 = 7
      (20L, Seq(0.0f, 1.0f, 0.0f, 2.0f))) // codes (1,1) → 2 + 8 = 10
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val query = Seq((0L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val got = Similarity.pqAdcTopK(corpus, "id", "v", cb, query, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((20L, 10.0), (10L, 7.0)))
  }

  test("pqAdcTopK equals a relational crossJoin+window twin on random data") {
    val rnd = new scala.util.Random(23)
    val dims = 16; val m = 4; val k = 8
    val rows = (0 until 200).map(i => (i.toLong, Seq.fill(dims)(rnd.nextFloat() * 2 - 1)))
    val corpus = rows.toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val seedRows = rows.take(k).map(_._2)
    val cb = Similarity.pqCodebooksFromRows(seedRows, m)
    val query = corpus.filter(col("id") === 100)

    val viaExpr = Similarity.pqAdcTopK(corpus, "id", "v", cb, query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // relational twin: explode subspaces × codes, argmin L2 (round4,
    // code tiebreak), join the query LUT (round4 dots), sum, rank
    val sub = dims / m
    val cbDf = (for (j <- 0 until m; c <- 0 until k)
      yield (j, c, cb(j)(c))).toDF("j", "code", "cv")
      .select(col("j"), col("code"), col("cv").cast("array<float>").as("cv"))
    val subspaced = corpus.select(col("id"), explode(array(
      (0 until m).map(j => struct(lit(j).as("j"),
        slice(col("v"), j * sub + 1, sub).as("sv"))): _*)).as("e"))
      .select(col("id"), col("e.j").as("j"), col("e.sv").as("sv"))
    val l2 = subspaced.join(cbDf, "j")
      .select(col("id"), col("j"), col("code"),
        round(aggregate(zip_with(col("sv"), col("cv"),
          (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, z) => acc + z), 4).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id", "j").orderBy(asc("d"), asc("code"))
    val codes = l2.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("j"), col("code"))
    val qv = query.select(col("v")).head().getSeq[Float](0)
    val lutDf = (for (j <- 0 until m; c <- 0 until k) yield {
      val d = (0 until sub).map(t => qv(j * sub + t).toDouble * cb(j)(c)(t)).sum
      (j, c, java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
    }).toDF("j", "code", "term")
    val viaRel = codes.join(lutDf, Seq("j", "code"))
      .groupBy("id").agg(round(sum("term"), 4).as("adc_score"))
      .orderBy(desc("adc_score"), asc("id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    assert(viaExpr == viaRel)
  }

  test("IVF-PQ composes with the two-level assigner (all branches == flat IVF-PQ)") {
    val rnd = new scala.util.Random(41)
    val cents = (0 until 16).map(c => (c.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val centDf = cents.toDF("cid", "v")
      .select(col("cid"), col("v").cast("array<float>").as("v"))
    val corpus = (100 until 300).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val query = corpus.filter(col("id") === 150)
    val cb = Similarity.pqCodebooksFromRows(
      (0 until 8).map(_ => Seq.fill(8)(rnd.nextFloat() * 2 - 1)), m = 4)
    val flat = Similarity.ivfTopK(corpus, "id", "v", centDf, "cid", query,
      k = 5, probes = 2, pqCodebooks = Some(cb))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val composed = Similarity.ivfTopK(corpus, "id", "v", centDf, "cid", query,
      k = 5, probes = 2, pqCodebooks = Some(cb), coarseBranches = 4) // all 4 branches
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(composed == flat,
      "two-level assignment searching every branch must not change IVF-PQ results")
  }

  test("trained codebooks reconstruct better than strided seeds") {
    val rnd = new scala.util.Random(31)
    val dims = 16; val m = 4; val k = 8
    // clustered data so training has structure to find
    val centers = (0 until 5).map(_ => Seq.fill(dims)(rnd.nextFloat() * 4 - 2))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + rnd.nextFloat() * 0.2f - 0.1f))
    }
    val corpus = rows.toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    // honest baseline: all seed rows drawn from ONE of the five clusters
    val seeded = Similarity.pqCodebooksFromRows(
      rows.filter(_._1 % 5 == 0).take(k).map(_._2), m)
    val trained = Similarity.trainPqCodebooks(corpus, "v", m, k)

    def mse(cb: Seq[Seq[Seq[Float]]]): Double = {
      val sub = dims / m
      rows.map { case (_, v) =>
        (0 until m).map { j =>
          cb(j).map(cent => (0 until sub).map { t =>
            val d = v(j * sub + t).toDouble - cent(t); d * d
          }.sum).min
        }.sum
      }.sum / rows.size
    }
    assert(mse(trained) < mse(seeded),
      s"training must reduce quantization error: ${mse(trained)} vs ${mse(seeded)}")
  }

  test("PQ expressions stay inside whole-stage codegen") {
    val dir = tmpDir("graft-pq")
    val rnd = new scala.util.Random(5)
    (0 until 50).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val cb = Similarity.pqCodebooksFromRows(
      (0 until 4).map(_ => Seq.fill(8)(rnd.nextFloat())), m = 2)
    val lut = Seq(Seq(1.0, 2.0, 3.0, 4.0), Seq(5.0, 6.0, 7.0, 8.0))
    val q = df.select(graft.expressions.VectorExpressions
      .pqAdcScore(Similarity.pqEncode(col("v"), cb), lut).as("s"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [pqadcscore(pqencode"),
      s"expected codegen'd PQ projection, got:\n$plan")
    q.collect() // force codegen compilation, not just planning
  }
}
