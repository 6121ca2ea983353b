package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("separates two well-separated blobs and converges") {
    // blob A around (10, 10), blob B around (-10, -10); ids interleave so
    // residue-class seeding starts one centroid in each blob
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 10f else -10f
      (i.toLong, Seq(base + (i % 5) * 0.1f, base - (i % 3) * 0.1f))
    }
    val m = KMeans.train(vecDf(rows), "vec_id", "embedding", k = 2, iters = 4)
    assert(m.sizes.sorted.toSeq === Seq(20L, 20L))
    val c0 = m.centroids(0)
    val c1 = m.centroids(1)
    // one centroid per blob, in the right place
    val (pos, neg) = if (c0(0) > 0) (c0, c1) else (c1, c0)
    assert(math.abs(pos(0) - 10.0) < 1.0 && math.abs(neg(0) + 10.0) < 1.0)
  }

  test("bit-identical under different partitionings") {
    val rows = (0 until 97).map(i =>
      (i.toLong, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 2.3).toFloat,
        ((i % 13) / 13.0).toFloat)))
    val narrow = KMeans.trainFrame(vecDf(rows).repartition(1),
      "vec_id", "embedding", k = 3, iters = 3).collect().toSeq
    val wide = KMeans.trainFrame(vecDf(rows).repartition(7),
      "vec_id", "embedding", k = 3, iters = 3).collect().toSeq
    assert(narrow === wide)
  }

  test("identical vectors: ties collapse to cluster 0, empties keep their seed") {
    val rows = (0 until 12).map(i => (i.toLong, Seq(1.0f, 2.0f)))
    val m = KMeans.train(vecDf(rows), "vec_id", "embedding", k = 3, iters = 2)
    assert(m.sizes.toSeq === Seq(12L, 0L, 0L))
    // empty clusters keep the (identical) seed centroid
    m.centroids.foreach { c =>
      assert(math.abs(c(0) - 1.0) < 1e-9 && math.abs(c(1) - 2.0) < 1e-9)
    }
  }

  test("assign is consistent with training sizes and deterministic") {
    val rows = (0 until 60).map { i =>
      val base = if (i % 2 == 0) 5f else -5f
      (i.toLong, Seq(base + (i % 7) * 0.1f, base - (i % 3) * 0.1f))
    }
    val df = vecDf(rows)
    val m = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 3)
    val a = KMeans.assign(df, "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // assignment histogram under the final centroids need not equal the
    // LAST TRAINING pass's sizes in general, but on converged blobs it does
    val hist = a.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(hist.values.toSeq.sorted === m.sizes.toSeq.sorted)
    // deterministic under repartitioning
    val b = KMeans.assign(df.repartition(7), "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b === a)
  }

  test("requires every residue class inhabited") {
    val rows = Seq((0L, Seq(1f, 1f)), (2L, Seq(2f, 2f))) // no id % 4 == 1
    intercept[IllegalArgumentException](
      KMeans.train(vecDf(rows), "vec_id", "embedding", k = 4, iters = 1))
  }
}
