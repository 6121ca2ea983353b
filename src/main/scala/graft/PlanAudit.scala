package graft
import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for representative queries — the
  * .explain feedback loop the scale posture is checked against. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("d3_time_range", "a8_scan_topk_desc", "e5_star_join_revenue",
        "d1_semijoin_keyset_page", "dedup_lsh_pairs", "f1_agg_pricing")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
