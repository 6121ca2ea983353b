package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the parquet sink codec trade (snappy / zstd / lz4 / none) on
  * the documents corpus: write time and on-disk bytes. The sink default
  * matters at 100 TB — output bytes are the replication+storage bill and
  * the next stage's scan time. Usage: runMain graft.tools.SinkCodecProbe [sfDir] */
object SinkCodecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir).cache()
    docs.count()
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    for (codec <- Seq("snappy", "zstd", "lz4", "gzip", "uncompressed")) {
      val dir = java.nio.file.Files.createTempDirectory(s"codec-$codec")
      // warm + timed
      var t = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        docs.write.mode("overwrite").option("compression", codec).parquet(dir.toString)
        t = math.min(t, (System.nanoTime() - t0) / 1e9)
      }
      val t0 = System.nanoTime()
      val n = spark.read.parquet(dir.toString).count()
      val tr = (System.nanoTime() - t0) / 1e9
      println(f"[codec-probe] $codec%-12s write $t%6.2f s  read $tr%5.2f s  bytes ${dirBytes(dir)}%10d  ($n rows)")
    }
    spark.stop()
  }
}
