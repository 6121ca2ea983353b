package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the as-of join's hot-key behavior (VERDICT r5 #4): the
  * window partitions by key, so one pathologically hot key serializes
  * into one task. This probe runs the SAME join once with uniform keys
  * and once with 80% of all rows on a single key, and prints wall time
  * plus the task-duration histogram of each run — the evidence for
  * whether a coarse-time-slice pre-split is worth implementing.
  *
  * Usage: runMain graft.tools.AsOfSkewProbe [leftRows] (default 2M)
  */
object AsOfSkewProbe {
  def main(args: Array[String]): Unit = {
    val leftRows = args.headOption.map(_.toInt).getOrElse(2000000)
    val rightRows = leftRows / 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        durations.add(t.taskInfo.duration)
    })

    def keyCol(skewed: Boolean) =
      if (skewed) when(pmod(col("id"), lit(5)) < 4, 0L).otherwise(pmod(col("id"), lit(1000)))
      else pmod(col("id"), lit(1000))

    def run(tag: String, skewed: Boolean, sliceWidth: Long = 0L): Unit = {
      val left = spark.range(leftRows).select(col("id"),
        keyCol(skewed).as("k"), pmod(col("id") * 2654435761L, lit(1000000L)).as("t"))
      val right = spark.range(rightRows).select(
        keyCol(skewed).as("k"), pmod(col("id") * 40503L, lit(1000000L)).as("t"),
        col("id").as("v"))
      // aggregate OVER the carried payload so column pruning cannot
      // delete the window (a bare count() measures everything BUT the
      // as-of); warmup for codegen, then the timed run
      def force(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame): Long = {
        val joined =
          if (sliceWidth > 0)
            graft.operators.AsOfJoin.asofJoinLeftSliced(l, r, Seq("k"), "t", "t", Seq("v"), sliceWidth)
          else
            graft.operators.AsOfJoin.asofJoinLeft(l, r, Seq("k"), "t", "t", Seq("v"))
        joined.agg(count("asof_v")).head().getLong(0)
      }
      force(left.limit(1000), right.limit(1000))
      durations.clear()
      val t0 = System.nanoTime()
      val n = force(left, right)
      val wall = (System.nanoTime() - t0) / 1e9
      val ds = durations.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      def pct(p: Double) = if (ds.isEmpty) 0L else ds((p * (ds.length - 1)).toInt)
      println(f"[asof-skew] $tag%-8s rows=$n wall=$wall%.2f s tasks=${ds.length} " +
        f"p50=${pct(0.5)}ms p95=${pct(0.95)}ms max=${ds.lastOption.getOrElse(0L)}ms")
    }

    // alternate twice so JIT/codegen warmth can't favor either shape;
    // then the sliced mitigation on the same hot distribution
    // (time range is 1M, so width 10k ⇒ ~100 slices per key)
    run("uniform", skewed = false)
    run("hot80", skewed = true)
    run("uniform", skewed = false)
    run("hot80", skewed = true)
    run("hot80+sl", skewed = true, sliceWidth = 10000L)
    run("hot80+sl", skewed = true, sliceWidth = 10000L)
    spark.stop()
  }
}
