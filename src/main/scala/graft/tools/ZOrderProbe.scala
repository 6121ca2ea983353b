package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Does the z-order layout actually prune? Write lineitem-joined orders
  * three ways — unsorted, sorted by one key (custkey), sorted by the
  * Morton key over (custkey-bucket, date-bucket) — with small parquet
  * row groups, then run the same 2-D range predicate (a custkey band AND
  * a date band) against each layout and report bytes read + scan-output
  * rows. Row-group min/max statistics are what parquet prunes with: the
  * one-key sort gives tight custkey ranges but random date ranges per
  * group; the z-sort gives tight-ish ranges on BOTH, so groups failing
  * either band skip without a read. This is the 100 TB data-layout
  * story: the same predicate, orders-of-magnitude different IO, zero
  * query change.
  *
  * Usage: runMain graft.tools.ZOrderProbe [sfDir]
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Sharding

    // Materialized bucket columns — min/max pruning sees STORED columns,
    // not expressions, so the layout key must be physical (the same
    // reason real lakehouse tables persist their cluster keys).
    val base = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        to_date(col("l_shipdate")).as("ship"), col("l_extendedprice"))
      .withColumn("xb", (col("l_partkey") % 256).cast("long"))
      .withColumn("yb", Sharding.rangeBucket(
        datediff(col("ship"), lit("1995-01-01")), 0L, 2500L, 8))
    val keyed = base.withColumn("zval", Sharding.zorderValue(col("xb"), col("yb"), 8))

    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    def write(df: DataFrame, name: String): String = {
      val p = s"$root/$name"
      // ~64 KiB row groups so the sf0.1 table has enough groups to prune
      df.coalesce(1).write.option("parquet.block.size", 64 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .mode("overwrite").parquet(p)
      p
    }
    val layouts = Seq(
      "unsorted" -> write(keyed, "unsorted"),
      "xb-sorted" -> write(keyed.sortWithinPartitions("xb"), "bykey"),
      "z-sorted" -> write(keyed.sortWithinPartitions("zval"), "byz"))

    @volatile var input = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.taskMetrics != null)
          input += sc.stageInfo.taskMetrics.inputMetrics.bytesRead
    }
    for ((name, path) <- layouts) {
      // 2-D band: 16/256 of xb × 20/256 of yb
      val q = spark.read.parquet(path)
        .where(col("xb") >= 64 && col("xb") < 80 &&
          col("yb") >= 77 && col("yb") <= 96)
      q.count() // warm footers
      input = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = q.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[zorder-probe] $name%-16s rows $n%7d  input ${input / 1024}%7d KiB  wall $wall%5.2f s")
    }
    spark.stop()
  }
}
