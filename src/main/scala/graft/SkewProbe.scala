package graft
import graft.operators.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Demonstrates hot-key spread: without salting one key = one shuffle
  * partition; salted, the hot key's rows split across `factor` salts. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val big = ((1 to 900000).map(i => (1L, s"hot$i")) ++
      (1 to 100000).map(i => (i.toLong % 7 + 2, s"v$i"))).toDF("k", "payload")
    val dim = (1L to 8L).map(i => (i, s"name$i")).toDF("k", "name")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    time("plain join+agg ")(big.join(dim, Seq("k")).groupBy("k", "name").count().count())
    time("salted join+agg")(Skew.saltedJoin(big, dim, Seq("k"), 8).groupBy("k", "name").count().count())
    val spread = Skew.saltedJoin(big, dim, Seq("k"), 8)
      .filter(col("k") === 1).select(spark_partition_id()).distinct().count()
    println(s"hot key spread across $spread partitions (unsalted: 1)")
    spark.stop()
  }
}
