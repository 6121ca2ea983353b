package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Anisotropic fixture: variance concentrated along a known axis so the
    * dominant component is unambiguous (dims 0/1 carry the signal at 3:1,
    * the rest is small noise). */
  private def fixture(n: Int, d: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val t = rnd.nextGaussian()
      val v = Array.tabulate(d) {
        case 0 => (3.0 * t + 0.05 * rnd.nextGaussian()).toFloat
        case 1 => (1.0 * t + 0.05 * rnd.nextGaussian()).toFloat
        case _ => (0.05 * rnd.nextGaussian()).toFloat
      }
      (i.toLong, v.toSeq)
    }
  }

  /** Sequential twin: plain-Scala moments with the same quantization. */
  private def localMoments(rows: Seq[Seq[Float]]): (Long, Array[Long], Array[Array[Long]]) = {
    val d = rows.head.length
    def rnd(x: Double): Long =
      java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val s = Array.fill(d)(0L)
    val q = Array.fill(d, d)(0L)
    rows.foreach { r =>
      for (i <- 0 until d) {
        s(i) += rnd(r(i).toDouble * Pca.Scale)
        for (j <- 0 until d) q(i)(j) += rnd(r(i).toDouble * r(j).toDouble * Pca.Scale)
      }
    }
    (rows.size.toLong, s, q)
  }

  test("rnd: allocation-free quantizer ≡ BigDecimal HALF_UP on adversarial + random doubles") {
    def big(x: Double): Long =
      java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val adversarial = Seq(
      0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
      0.49999999999999994, -0.49999999999999994, // largest |double| below 0.5:
      // floor(x+0.5) alone would round these to ±1 (the add lands on 1.0)
      1.4999999999999998, -1.4999999999999998,
      0.0, -0.0, 1e-300, -1e-300, 4503599627370495.5, -4503599627370495.5,
      123456789.49999999, -123456789.49999999)
    adversarial.foreach { x =>
      assert(Pca.rnd(x) == big(x), s"quantizer mismatch at $x: ${Pca.rnd(x)} vs ${big(x)}")
    }
    val r = new scala.util.Random(99)
    (1 to 100000).foreach { _ =>
      val x = (r.nextDouble() - 0.5) * math.pow(10, r.nextInt(12).toDouble)
      assert(Pca.rnd(x) == big(x), s"quantizer mismatch at $x")
    }
  }

  test("moments: distributed ≡ sequential twin bit-for-bit, any partitioning") {
    val rows = fixture(200, 8)
    val df = rows.toDF("vec_id", "embedding")
    val (n1, s1, q1) = Pca.moments(df.repartition(1), "embedding")
    val (n2, s2, q2) = Pca.moments(df.repartition(13), "embedding")
    val (nl, sl, ql) = localMoments(rows.map(_._2))
    assert(n1 == nl && n2 == nl)
    assert(s1.sameElements(sl) && s2.sameElements(sl),
      "first moments must be exact longs, partition-independent")
    assert(q1.map(_.toSeq).toSeq == ql.map(_.toSeq).toSeq &&
      q2.map(_.toSeq).toSeq == ql.map(_.toSeq).toSeq,
      "second moments must be exact longs, partition-independent")
  }

  test("topComponent: recovers the planted dominant axis; unit norm; positive eigval") {
    val rows = fixture(400, 8)
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.topComponent(df, "embedding", iters = 8)
    val nrm = math.sqrt(m.component.map(v => v * v).sum)
    assert(math.abs(nrm - 1.0) < 1e-6, s"component must be unit norm, got $nrm")
    assert(m.eigval > 0.0)
    // planted axis is (3,1,0,...)/sqrt(10): |cos| with the component ≈ 1
    val axis = Array(3.0, 1.0, 0, 0, 0, 0, 0, 0).map(_ / math.sqrt(10.0))
    val cos = math.abs(m.component.zip(axis).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"dominant axis not recovered (|cos| = $cos)")
    // Rayleigh quotient of the component beats every coordinate axis
    val (n, s, q) = localMoments(rows.map(_._2))
    val c = Array.tabulate(8, 8)((i, j) =>
      (q(i)(j).toDouble / Pca.Scale) / n -
        ((s(i).toDouble / Pca.Scale) / n) * ((s(j).toDouble / Pca.Scale) / n))
    for (k <- 0 until 8)
      assert(m.eigval >= c(k)(k) - 1e-9,
        s"eigval ${m.eigval} below coordinate variance $k = ${c(k)(k)}")
  }

  test("project: zero-mean scores, variance equals the eigval, exact under repartition") {
    val rows = fixture(300, 8)
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.topComponent(df, "embedding", iters = 8)
    val p1 = Pca.project(df.repartition(1), "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p9 = Pca.project(df.repartition(9), "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p1 == p9, "projection must be bit-identical under any partitioning")
    val xs = p1.values.toSeq
    val mean = xs.sum / xs.size
    assert(math.abs(mean) < 1e-5, s"centered projection must have ~zero mean, got $mean")
    val varr = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
    assert(math.abs(varr - m.eigval) / m.eigval < 0.01,
      s"projection variance $varr must match the eigval ${m.eigval}")
  }

  test("topComponents: deflation yields orthogonal components with descending eigvals") {
    // well-separated planted spectrum (deflation orthogonality needs an
    // eigengap: with a degenerate tail, power iteration can stall inside
    // the noise subspace before suppressing the previous component)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val (a, b, c) = (rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian())
      val v = Array.tabulate(8) {
        case 0 => (3.0 * a + 0.02 * rnd.nextGaussian()).toFloat
        case 1 => (1.2 * b + 0.02 * rnd.nextGaussian()).toFloat
        case 2 => (0.5 * c + 0.02 * rnd.nextGaussian()).toFloat
        case _ => (0.02 * rnd.nextGaussian()).toFloat
      }
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cs = Pca.topComponents(df, "embedding", k = 3, iters = 10)
    assert(cs.comps.size == 3)
    val eig = cs.comps.map(_._2)
    assert(eig == eig.sortBy(-_), s"eigvals must descend, got $eig")
    for (Seq((a, _), (b, _)) <- cs.comps.combinations(2)) {
      val dot = math.abs(a.zip(b).map { case (x, y) => x * y }.sum)
      assert(dot < 1e-4, s"components must be orthogonal, |dot| = $dot")
    }
    // first solve of topComponents == topComponent exactly (same arithmetic)
    val m1 = Pca.topComponent(df, "embedding", iters = 10)
    assert(cs.comps.head._1.sameElements(m1.component) && cs.comps.head._2 == m1.eigval,
      "k=1 of the deflation chain must be bit-identical to the single solve")
  }

  test("incremental moments: merge(A, B) == moments(A ∪ B) exactly; save/load is identity") {
    val rows = fixture(300, 8)
    val (a, b) = rows.partition(_._1 % 3 == 0)
    val dfA = a.toDF("vec_id", "embedding")
    val dfB = b.toDF("vec_id", "embedding")
    val dfAll = rows.toDF("vec_id", "embedding")
    val mA = Pca.moments(dfA, "embedding")
    val mB = Pca.moments(dfB, "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pca-spec").toString
    Pca.saveMoments(spark, mA, dir)
    val merged = Pca.mergeMoments(Pca.loadMoments(spark, dir), mB)
    val full = Pca.moments(dfAll, "embedding")
    assert(merged._1 == full._1)
    assert(merged._2.sameElements(full._2),
      "appended first moments must equal full-corpus bit-for-bit")
    assert(merged._3.map(_.toSeq).toSeq == full._3.map(_.toSeq).toSeq,
      "appended second moments must equal full-corpus bit-for-bit")
    // and therefore the solve is identical too
    val c1 = Pca.topComponentsFromMoments(merged._1, merged._2, merged._3, 2, 8)
    val c2 = Pca.topComponentsFromMoments(full._1, full._2, full._3, 2, 8)
    assert(c1.comps.map(_._2) == c2.comps.map(_._2) &&
      c1.comps.zip(c2.comps).forall { case ((v1, _), (v2, _)) => v1.sameElements(v2) },
      "solve on merged moments must be bit-identical to from-scratch")
  }

  test("covariance frame: symmetric, diag nonnegative, matches the driver moments") {
    val rows = fixture(150, 6)
    val df = rows.toDF("vec_id", "embedding")
    val cov = Pca.covariance(df, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cov.size == 36)
    for (i <- 0 until 6; j <- 0 until 6) {
      assert(cov((i.toLong, j.toLong)) == cov((j.toLong, i.toLong)),
        s"covariance must be exactly symmetric at ($i,$j)")
    }
    for (i <- 0 until 6) assert(cov((i.toLong, i.toLong)) >= 0.0)
    val (n, s, q) = localMoments(rows.map(_._2))
    for (i <- 0 until 6; j <- 0 until 6) {
      val want = (q(i)(j).toDouble / Pca.Scale) / n -
        ((s(i).toDouble / Pca.Scale) / n) * ((s(j).toDouble / Pca.Scale) / n)
      assert(cov((i.toLong, j.toLong)) == want,
        s"distributed covariance must equal the twin bit-for-bit at ($i,$j)")
    }
  }
}
