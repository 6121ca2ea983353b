package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume accounting for registered queries: run each named
  * query warm and report total shuffle bytes written/read, input bytes,
  * peak single-task duration, and task count — the direct evidence for
  * "which exchange becomes the bottleneck at 100×" and "is one task
  * carrying a skewed key". A query whose shuffle volume is a large
  * multiple of its input is re-materializing the corpus through the
  * exchange; a query whose max task dwarfs the median has a skew
  * problem no matter how good the total looks.
  *
  * Usage: runMain graft.tools.ShuffleProbe <q1,q2,...> [sfDir] */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shufW = 0L; @volatile var shufR = 0L
    @volatile var input = 0L; @volatile var tasks = 0L
    @volatile var maxTaskMs = 0L; @volatile var taskMs = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufW += m.shuffleWriteMetrics.bytesWritten
          shufR += m.shuffleReadMetrics.totalBytesRead
          input += m.inputMetrics.bytesRead
          taskMs += m.executorRunTime
        }
        tasks += sc.stageInfo.numTasks
      }
    }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: codegen + parquet footers
      shufW = 0; shufR = 0; input = 0; tasks = 0; maxTaskMs = 0; taskMs = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain stage-completed events
      spark.sparkContext.removeSparkListener(listener)
      println(f"[shuffle-probe] $name%-28s wall $wall%6.2f s  input ${input / 1024}%8d KiB  shufW ${shufW / 1024}%8d KiB  shufR ${shufR / 1024}%8d KiB  tasks $tasks%5d  cpu ${taskMs / 1000.0}%7.1f s")
    }
    spark.stop()
  }
}
