package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Aho-Corasick vs the per-pattern relational alternative (one
  * replace-length expression per pattern in a single scan) at growing
  * filter-list sizes — substantiates the "one pass beats |patterns|
  * passes" claim with numbers. Patterns are corpus-vocabulary tokens
  * plus generated variants so hit rates stay realistic. */
object BlocklistProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sizes = args.lift(1).getOrElse("5,50,200").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .localCheckpoint()
    // realistic mixed list: frequent corpus tokens + long-tail variants
    val vocab = docs.select(explode(graft.operators.TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count().orderBy(desc("count"), col("w"))
      .limit(300).select("w").as[String].collect().toSeq.distinct

    def timed(label: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val v = body
      println(f"[blocklist-probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  out $v%d")
    }

    for (n <- sizes) {
      val pats = vocab.take(n)
      timed(s"aho-corasick n=$n") {
        graft.operators.MultiPattern.blocklistHits(docs, "doc_id", "text", pats)
          .agg(sum("n_hits")).head().getLong(0)
      }
      timed(s"per-pattern-expr n=$n") {
        val total = pats.map { p =>
          ((length(col("text")) - length(regexp_replace(col("text"),
            java.util.regex.Pattern.quote(p), ""))) / p.length).cast("long")
        }.reduce(_ + _)
        docs.agg(sum(total)).head().getLong(0)
      }
    }
    spark.stop()
  }
}
