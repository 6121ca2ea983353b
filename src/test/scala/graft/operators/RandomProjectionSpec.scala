package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("rpSigns: deterministic, ±1 only, md5-derived (engine-portable definition)") {
    val a = Similarity.rpSigns(64, 16)
    val b = Similarity.rpSigns(64, 16)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "pure function of the dims")
    assert(a.flatten.forall(s => s == 1.0 || s == -1.0))
    // transcribed md5 check: md5("rp0_0") = 2e2f...; first hex digit '2' < 8 -> +1
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest("rp0_0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = if (h.charAt(0) < '8') 1.0 else -1.0
    assert(a(0)(0) == want)
    // both signs must actually occur (a constant matrix projects to a line)
    assert(a.flatten.toSet == Set(1.0, -1.0))
  }

  test("randomProject: bit-identical under repartition; exact quantized fold") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 120).map(i =>
      (i.toLong, Seq.fill(64)((rnd.nextGaussian() * 0.1).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    def flat(p: Int) = Similarity.randomProject(df.repartition(p), "vec_id", "embedding", 16)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "y")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(flat(1) == flat(7), "projection must not depend on partitioning")
    // independent recomputation of one coordinate from the sign matrix
    val signs = Similarity.rpSigns(64, 16)
    def rnd2(x: Double): Long =
      java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val (vid, emb) = rows(17)
    val q = emb.indices.map(i => rnd2(emb(i).toDouble * signs(3)(i) * Pca.Scale)).sum
    val want = q.toDouble / Pca.Scale / math.sqrt(16.0)
    assert(flat(1)((vid, 3)) == want, "coordinate must equal the hand fold bit-for-bit")
  }

  test("randomProject: JL norm preservation within the ε envelope on a gaussian cloud") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 200).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val proj = Similarity.randomProject(df, "vec_id", "embedding", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ratios = rows.map { case (id, emb) =>
      val n0 = math.sqrt(emb.map(x => x.toDouble * x.toDouble).sum)
      val n1 = math.sqrt(proj(id).map(y => y * y).sum)
      n1 / n0
    }
    // ε ~ sqrt(ln n / k) is loose; on a 64→16 gaussian cloud the norm
    // ratio concentrates near 1 — assert the bulk lands in a wide band
    // and the mean is unbiased-ish
    val inBand = ratios.count(r => r > 0.5 && r < 1.5)
    assert(inBand >= 190, s"norm ratios must concentrate near 1, ${200 - inBand} outliers")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean norm ratio $mean drifted")
  }
}
