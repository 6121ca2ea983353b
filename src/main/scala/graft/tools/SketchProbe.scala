package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The sketch-vs-exact distinct-count ladder, measured: replicate the
  * document corpus N× (with a replica-salted key so distincts actually
  * grow), then time `count(DISTINCT key)`, `approx_count_distinct`, and
  * the oracle-pinned HLL register path at each size, recording shuffle
  * volume. The claim under test: exact distinct's exchange grows with
  * the distinct count (it must ship every distinct value) while the HLL
  * exchange stays O(registers·tasks) flat — the 100 TB reason the
  * sketch exists.
  *
  * Usage: runMain graft.tools.SketchProbe [sfDir] [maxReplicas]
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxRep = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shufW = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.taskMetrics != null)
          shufW += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def timed(label: String)(body: => Long): Unit = {
      body // warm
      shufW = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val v = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[sketch-probe] $label%-36s wall $wall%6.2f s  shufW ${shufW / 1024}%8d KiB  value $v%d")
    }

    var rep = 1
    while (rep <= maxRep) {
      val docs = graft.Tables.documents(spark, sfDir)
        .crossJoin(spark.range(rep).select(col("id").as("rep")))
        .select(concat_ws("#", col("rep"), col("text")).as("k"))
        .where(col("k").isNotNull)
      timed(s"exact count(DISTINCT) x$rep") {
        docs.agg(countDistinct("k")).collect().head.getLong(0)
      }
      timed(s"approx_count_distinct x$rep") {
        docs.agg(approx_count_distinct("k")).collect().head.getLong(0)
      }
      timed(s"hll registers+estimate x$rep") {
        graft.operators.Sketches.hllEstimate(
          graft.operators.Sketches.hllRegisters(docs, "k"))
          .collect().head.getAs[Double]("hll_estimate").toLong
      }
      // registers-only A/B: identical plan shape, only the per-row
      // (bucket, rho) computation differs
      timed(s"hll rows: codegen digest expr x$rep") {
        import graft.operators.Sketches
        docs.select(Sketches.hllBucketRhoFast(col("k")).as("br"))
          .select(col("br.bucket").as("bucket"), col("br.rho").as("rho"))
          .groupBy("bucket").agg(max("rho")).count()
      }
      timed(s"hll rows: portable hex chain x$rep") {
        import graft.operators.Sketches
        docs.select(Sketches.hllBucket(col("k")).as("bucket"),
            Sketches.hllRho(col("k")).as("rho"))
          .groupBy("bucket").agg(max("rho")).count()
      }
      rep *= 4
    }
    spark.stop()
  }
}
