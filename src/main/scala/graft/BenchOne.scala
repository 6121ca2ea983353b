package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    SparkEntry.entry(spark).count()
    for (name <- args(0).split(",")) {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, d).count()
        println(s"$name run$i: ${(System.nanoTime()-t0)/1e9}s rows=$n")
      }
    }
    spark.stop()
  }
}
