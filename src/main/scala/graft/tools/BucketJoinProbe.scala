package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Native Spark bucketing as the co-located-join tool, measured: write
  * orders and lineitem `bucketBy(16, key)` into a warehouse, join on
  * the bucket key, and compare against the plain parquet join — plan
  * shape (Exchange count) and shuffle bytes. Bucketing pre-pays the
  * shuffle ONCE at write time; every subsequent join on the key reads
  * co-located buckets and sort-merges with NO exchange on either side —
  * at 100 TB that converts every fact-fact join on the distribution
  * key from a corpus-sized shuffle into a scan. (The engine's own
  * TableStore buckets its state tables the same way for point-lookup
  * pruning; this probe measures the JOIN dividend on Spark's native
  * path.)
  *
  * Usage: runMain graft.tools.BucketJoinProbe [sfDir]
  */
object BucketJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wh = java.nio.file.Files.createTempDirectory("bucketwh").toString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: the bucket story
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = graft.Tables.orders(spark, sfDir)
    val lineitem = graft.Tables.lineitem(spark, sfDir)
    orders.write.mode("overwrite").bucketBy(16, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(16, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    @volatile var shufW = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.taskMetrics != null)
          shufW += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def run(label: String, q: => org.apache.spark.sql.DataFrame): Unit = {
      q.count() // warm
      shufW = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = q.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      val plan = q.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      println(f"[bucket-probe] $label%-22s rows $n%8d  wall $wall%5.2f s  shufW ${shufW / 1024}%7d KiB  exchanges $nEx%d")
    }

    run("plain parquet join", {
      lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    })
    run("bucketed join", {
      spark.table("lineitem_b").join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    })
    spark.stop()
  }
}
