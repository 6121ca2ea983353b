package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Micro-benchmark: native codegen'd vector expressions vs the HOF forms
  * at a scale where the per-element cost dominates (PLANS.md records the
  * result). */
object VecBenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vecbench").toString
    spark.range(500000)
      .select(col("id"),
        expr("transform(sequence(1, 64), i -> CAST(sin(id * i) AS FLOAT))").as("a"),
        expr("transform(sequence(1, 64), i -> CAST(cos(id * i) AS FLOAT))").as("b"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    def time(label: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s")
    }
    time("native cosine (500k x 64)")(
      df.select(Similarity.cosine(col("a"), col("b")).as("c")).agg(sum("c")).collect())
    time("HOF cosine    (500k x 64)")(
      df.select(Similarity.cosineHof(col("a"), col("b")).as("c")).agg(sum("c")).collect())
    spark.stop()
  }
}
