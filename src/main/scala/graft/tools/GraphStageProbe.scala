package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the graph queries' driver path: edge build,
  * collect, and the sequential twin, each timed separately. */
object GraphStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "300")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gr] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (i <- 1 to 2) {
      println(s"--- iter $i ---")
      val e = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") + 100000L).as("src"), col("o_custkey").as("dst"))
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct().cache()
      val n = t("edge build+count") { e.count() }
      val es = t("collect") { e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq }
      println(s"[gr] edges=$n")
      val r = t("pageRankLocal x3") { graft.operators.Graph.pageRankLocal(es, 3) }
      val h = t("hitsLocal x2") { graft.operators.Graph.hitsLocal(es, 2) }
      println(s"[gr] ranks=${r.size} hubs=${h._1.size}")
      e.unpersist(blocking = true)
    }
    spark.stop()
  }
}
