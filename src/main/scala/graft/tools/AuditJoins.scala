package graft.tools
import org.apache.spark.sql.SparkSession
object AuditJoins {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.01")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val marks = Seq(
          "BuildLeft" -> plan.contains("BuildLeft"),
          "Cartesian" -> plan.contains("Cartesian"),
          "SingleWindow" -> (plan.contains("Window") && plan.contains("SinglePartition")))
          .collect { case (m, true) => m }
        if (marks.nonEmpty) println(s"[audit] $name: ${marks.mkString(",")}")
      } catch { case e: Throwable => println(s"[audit] $name ERR ${e.getMessage.take(80)}") }
    }
    println("[audit] done")
    spark.stop()
  }
}
