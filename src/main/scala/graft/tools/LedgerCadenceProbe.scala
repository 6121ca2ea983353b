package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Measures the COMPACTION CADENCE question for the crawl ledgers
  * (seen + hosts + hops): a 100 TB/day stream writes one parquet
  * partition per ledger per micro-batch, so after B batches every
  * ledger read lists and scans B partitions — compaction folds them
  * into one base, but each fold rewrites the whole ledger. The probe
  * runs `nBatches` real [[graft.streaming.StreamingCrawl.processBatch]]
  * steps (delays on, so the hosts ledger is live; a hop delta written
  * per batch the way `attach` does) under cadences {never, 8, 32} and
  * reports steady-state per-batch wall, total compact() wall, and the
  * final live-partition count per ledger.
  *
  * Usage: runMain graft.tools.LedgerCadenceProbe [nBatches] [rowsPerBatch]
  */
object LedgerCadenceProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(48)
    val rows = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("url", StringType, nullable = false),
      StructField("blob", BinaryType, nullable = true)))
    val rules = (0 until 16).map(h => (s"h$h.example.com", "*", true, "/"))
      .toDF("domain", "agent", "allow", "prefix")
    val delays = (0 until 16).map(h => (s"h$h.example.com", 200L + h))
      .toDF("domain", "delay_ms")

    def batchDf(b: Long) = {
      val rws = (0 until rows).map { i =>
        Row(b * rows + i,
          s"http://h${i % 16}.example.com/b$b/p$i",
          Array.emptyByteArray)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rws, 8), schema)
    }

    def liveParts(dir: String): Int = {
      val f = new java.io.File(dir)
      if (!f.exists()) 0
      else f.listFiles().count(_.getName.startsWith("batch="))
    }

    for (cadence <- Seq(0, 32, 8)) { // 0 = never
      val ledger = java.nio.file.Files
        .createTempDirectory(s"graft-cadence-$cadence").toString
      var batchWall = 0.0
      var tailWall = 0.0 // last quarter = steady state
      var compactWall = 0.0
      for (b <- 0L until nBatches) {
        val t0 = System.nanoTime()
        val o = graft.streaming.StreamingCrawl.processBatch(
          batchDf(b), b, "id", "url", "blob", rules, "probe", ledger,
          delays = Some(delays))
        o.count()
        o.unpersist(blocking = false)
        // the attach-shaped hop delta: this batch's discoveries
        (0 until rows / 10).map(i => (s"http://h${i % 16}.example.com/b${b + 1}/p$i", 1))
          .toDF("url", "hop").withColumn("batch", lit(b))
          .write.mode("overwrite").partitionBy("batch")
          .parquet(s"$ledger/hops")
        val dt = (System.nanoTime() - t0) / 1e9
        batchWall += dt
        if (b >= nBatches * 3 / 4) tailWall += dt
        if (cadence > 0 && b > 0 && b % cadence == 0) {
          val c0 = System.nanoTime()
          graft.streaming.StreamingCrawl.compact(spark, ledger, belowBatch = b)
          compactWall += (System.nanoTime() - c0) / 1e9
        }
      }
      val tailAvg = tailWall / (nBatches - nBatches * 3 / 4)
      println(f"[cadence] every=${if (cadence == 0) "never" else cadence.toString}%-5s " +
        f"total=$batchWall%6.1f s  steady/batch=$tailAvg%5.2f s  " +
        f"compact=$compactWall%5.1f s  " +
        f"parts seen=${liveParts(s"$ledger/seen")}%d hosts=${liveParts(s"$ledger/hosts")}%d " +
        f"hops=${liveParts(s"$ledger/hops")}%d")
    }
    spark.stop()
  }
}
