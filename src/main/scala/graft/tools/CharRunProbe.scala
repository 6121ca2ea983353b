package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exact all-positions char-run coverage vs the winnowed
  * minimizer-anchored variant: exploded row volume, wall, and how far
  * the anchored coverage sits below the exact one (it is a lower
  * envelope by construction). Args: sfDir [k] [w]. */
object CharRunProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    val w = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nChars = docs.select(sum(length(col("text")))).head().getLong(0)
    val exactRows = docs.filter(length(col("text")) >= k)
      .select(sum(length(col("text")) - (k - 1))).head().getLong(0)
    import org.apache.spark.sql.graftbridge.Bridge
    val anchRows = docs.filter(length(col("text")) >= k)
      .select(sum(size(Bridge.column(graft.expressions.CharMinimizers(
        Bridge.expression(col("text")), k, w))))).head().getLong(0)
    println(f"[charrun-probe] corpus chars $nChars%d; exploded rows: exact $exactRows%d, " +
      f"anchored $anchRows%d (${exactRows.toDouble / anchRows}%.1fx less)")

    def timed(label: String)(body: => Long): Unit = {
      body
      val t0 = System.nanoTime()
      val v = body
      println(f"[charrun-probe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  out $v%d")
    }
    timed(s"exact coverage k=$k") {
      graft.operators.TextOps.charRunCoverage(docs, "doc_id", "text", k)
        .agg(sum("covered_chars")).head().getLong(0)
    }
    timed(s"anchored coverage k=$k w=$w") {
      graft.operators.TextOps.charRunCoverageAnchored(docs, "doc_id", "text", k, w)
        .agg(sum("covered_chars")).head().getLong(0)
    }
    val both = graft.operators.TextOps.charRunCoverage(docs, "doc_id", "text", k)
      .select(col("doc"), col("covered_chars").as("exact"))
      .join(graft.operators.TextOps.charRunCoverageAnchored(docs, "doc_id", "text", k, w)
        .select(col("doc"), col("covered_chars").as("anch")), Seq("doc"))
    val bad = both.filter(col("anch") > col("exact")).count()
    val ratio = both.agg((sum("anch") * 1000 / sum("exact")).cast("long")).head().getLong(0)
    println(s"[charrun-probe] envelope: anchored>exact rows=$bad (must be 0); " +
      s"anchored/exact coverage = ${ratio / 10.0}%")
    spark.stop()
  }
}
