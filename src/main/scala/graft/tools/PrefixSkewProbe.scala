package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** hotDf A/B for the exact-threshold prefix join under replication —
  * the follow-up to ScaleReplicationProbe's finding that prefix_join
  * x10 showed maxTask/p95 ≈ 2.8: replica tokens carry prefix df ≈ one
  * corpus (5 000 here), far under the default hotDf, so the salted
  * hot path never engaged and each rep token's df² candidate block
  * landed in one task. Args: sfDir, reps CSV, hotDfs CSV. */
object PrefixSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).getOrElse("10").split(",").map(_.trim.toInt).toSeq
    val hotDfs = args.lift(2).getOrElse("65536,4096,1024").split(",").map(_.trim.toLong).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var maxTask = 0L
    val durs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) {
          maxTask = math.max(maxTask, te.taskInfo.duration)
          durs.add(te.taskInfo.duration)
        }
    }
    def clearBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    def prefixReps(rep: Int) = {
      val base = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val rf = base.crossJoin(spark.range(rep).select(col("id").as("_rep")))
        .select((col("doc_id") + col("_rep") * 10000000L).as("doc_id"),
          concat_ws(" ", concat(lit("rep"), col("_rep")), col("text")).as("text"))
        .repartition(32)
      val sets = rf.select(col("doc_id"), array_sort(array_distinct(
        graft.operators.TextOps.tokens(col("text")))).as("ts"))
      sets.groupBy(md5(concat_ws(" ", col("ts")).cast("binary")).as("_fp"))
        .agg(min(col("doc_id")).as("id"), first(col("ts")).as("ts"))
        .select("id", "ts")
        .localCheckpoint()
    }

    for (rep <- reps) {
      val repsDf = prefixReps(rep)
      for (hd <- hotDfs) {
        maxTask = 0; durs.clear()
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = graft.operators.Dedup.prefixFilterPairs(repsDf, "id", "ts", 900, hd).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
        val ds = durs.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
        val p95 = if (ds.isEmpty) 0L else ds((ds.length * 95) / 100 min (ds.length - 1))
        println(f"[prefix-skew] x$rep%-3d hotDf=$hd%-6d wall $wall%7.2f s  maxTask ${maxTask}%6d ms  p95 ${p95}%6d ms  ratio ${maxTask.toDouble / math.max(p95, 1)}%5.2f  pairs $n%d")
      }
      clearBlocks()
    }
    spark.stop()
  }
}
