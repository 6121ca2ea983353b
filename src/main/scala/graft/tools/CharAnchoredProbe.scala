package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for dedup_char_anchored: forces each half (exact
  * char-run coverage, anchored coverage) to a real barrier (sum agg —
  * count() would prune the left-join machinery), then the composed
  * join+decile agg, so the optimization round knows which chain owns
  * the bill. */
object CharAnchoredProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "300")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ca] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }
    val docs = graft.Tables.documents(spark, sfDir)
    // text stats
    t("textstats") {
      docs.agg(count(lit(1)), sum(length(col("text"))), max(length(col("text")))).head.toString
    }
    for (i <- 1 to 2) {
      println(s"--- iter $i ---")
      t("exact sum") {
        graft.operators.TextOps.charRunCoverage(docs, "doc_id", "text", k = 20)
          .agg(sum("covered_chars")).head.getLong(0)
      }
      t("anchored sum") {
        graft.operators.TextOps.charRunCoverageAnchored(docs, "doc_id", "text", k = 20, w = 4)
          .agg(sum("covered_chars")).head.getLong(0)
      }
      t("composed") {
        graft.SparkEntry.queries("dedup_char_anchored")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
