package graft.streaming

import graft.SparkSpec
import graft.operators.Pca
import org.apache.spark.sql.functions._

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def cloud(n: Int, seed: Int, shift: Double = 0.0): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val t = rnd.nextGaussian()
      val v = Array.tabulate(8) {
        case 0 => (2.0 * t + shift + 0.05 * rnd.nextGaussian()).toFloat
        case 1 => (0.5 * t + shift + 0.05 * rnd.nextGaussian()).toFloat
        case _ => (0.05 * rnd.nextGaussian() + shift).toFloat
      }
      (i.toLong, v.toSeq)
    }
  }

  test("clean batch stays quiet, shifted batch alarms; axis stays put for clean data") {
    val refDir = java.nio.file.Files.createTempDirectory("drift-ref").toString
    val stDir = java.nio.file.Files.createTempDirectory("drift-st").toString
    val ref = cloud(400, 1).toDF("vec_id", "embedding")
    Pca.saveMoments(spark, Pca.moments(ref, "embedding"), refDir)

    val clean = cloud(200, 2).toDF("vec_id", "embedding")
    val r0 = StreamingDrift.processBatch(clean, 0L, "vec_id", "embedding",
      refDir, stDir).collect().head
    assert(!r0.getAs[Boolean]("alarm"),
      s"clean batch must not alarm (z = ${r0.getAs[Double]("z_mean")})")
    assert(r0.getAs[Double]("axis_cos") > 0.999,
      "dominant axis must not rotate on same-distribution data")

    val shifted = cloud(200, 3, shift = 0.5).toDF("vec_id", "embedding")
    val r1 = StreamingDrift.processBatch(shifted, 1L, "vec_id", "embedding",
      refDir, stDir).collect().head
    assert(r1.getAs[Boolean]("alarm"),
      s"mean-shifted batch must alarm (z = ${r1.getAs[Double]("z_mean")})")
  }

  test("attach: a real MemoryStream drive lands one report row per micro-batch") {
    val refDir = java.nio.file.Files.createTempDirectory("drift-ref3").toString
    val stDir = java.nio.file.Files.createTempDirectory("drift-st3").toString
    val outDir = java.nio.file.Files.createTempDirectory("drift-out3").toString
    val ckDir = java.nio.file.Files.createTempDirectory("drift-ck3").toString
    Pca.saveMoments(spark,
      Pca.moments(cloud(300, 8).toDF("vec_id", "embedding"), "embedding"), refDir)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingDrift.attach(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      refDir, stDir, outDir, ckDir)
    mem.addData(cloud(100, 9): _*)
    q.processAllAvailable()
    mem.addData(cloud(100, 10, shift = 0.6): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(outDir).orderBy("batch_id").collect()
    assert(out.length == 2, "one report row per micro-batch")
    assert(!out(0).getAs[Boolean]("alarm") && out(1).getAs[Boolean]("alarm"))
  }

  test("replayed batch reports bit-identically; cumulative moments equal the union") {
    val refDir = java.nio.file.Files.createTempDirectory("drift-ref2").toString
    val stDir = java.nio.file.Files.createTempDirectory("drift-st2").toString
    val refRows = cloud(300, 5)
    val ref = refRows.toDF("vec_id", "embedding")
    Pca.saveMoments(spark, Pca.moments(ref, "embedding"), refDir)

    val b0Rows = cloud(100, 6)
    val b1Rows = cloud(100, 7)
    val b0 = b0Rows.toDF("vec_id", "embedding")
    val b1 = b1Rows.toDF("vec_id", "embedding")
    val first = StreamingDrift.processBatch(b0, 0L, "vec_id", "embedding", refDir, stDir)
      .collect().head.toSeq
    StreamingDrift.processBatch(b1, 1L, "vec_id", "embedding", refDir, stDir)
    // replay batch 0: overwrites its own partition, reads only batch < 0
    val replay = StreamingDrift.processBatch(b0, 0L, "vec_id", "embedding", refDir, stDir)
      .collect().head.toSeq
    assert(first == replay, "replay must be bit-identical")

    // after both batches the banked + reference moments solve exactly like
    // a from-scratch solve on the union
    val r1 = StreamingDrift.processBatch(b1, 1L, "vec_id", "embedding", refDir, stDir)
      .collect().head
    val union = (refRows ++ b0Rows ++ b1Rows).zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val full = Pca.topComponents(union, "embedding", k = 1, iters = 8)
    assert(r1.getAs[Double]("eigval_new") == full.comps.head._2,
      "incremental eigval must equal from-scratch on the union bit-for-bit")
  }
}
