package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where is the driver-union-find vs distributed-pointer-doubling
  * crossover for [[Dedup.duplicateClusters]]? The verdict-pinned gate is
  * 4M edges; this probe measures BOTH paths on the same synthetic pair
  * graphs (chained families — the worst shape for label propagation,
  * diameter = chain length) at 1M…16M edges and prints wall times plus
  * a correctness check (cluster count == chain count, labels are chain
  * minima).
  *
  * `sbt "runMain graft.tools.ConnectedComponentsProbe [maxEdgesM] [chainLen]"`
  * `GRAFT_CC_DEBUG=1` prints per-round convergence from the operator.
  */
object ConnectedComponentsProbe {

  def main(args: Array[String]): Unit = {
    val maxM = if (args.nonEmpty) args(0).toInt else 16
    val chainLen = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def chains(nEdges: Long) = {
      val perChain = chainLen - 1
      spark.range(nEdges).select(
        ((col("id") / perChain).cast("long") * chainLen + col("id") % perChain).as("doc_a"),
        ((col("id") / perChain).cast("long") * chainLen + col("id") % perChain + 1).as("doc_b"))
    }

    def run(label: String, nEdges: Long, driverLimit: Long): Unit = {
      val pairs = chains(nEdges).localCheckpoint() // exclude generation cost
      val t0 = System.nanoTime()
      val clusters = Dedup.duplicateClusters(pairs, driverEdgeLimit = driverLimit)
      val wallOp = (System.nanoTime() - t0) / 1e9
      // verification reads the result once; repartition first so a
      // driver-path LocalRelation doesn't serialize 2M+ rows into one task
      val expect = (nEdges + chainLen - 2) / (chainLen - 1)
      val agg = clusters.repartition(32).agg(
        countDistinct("cluster").as("n"),
        sum(when(col("cluster") % chainLen =!= 0, 1).otherwise(0)).as("bad")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[cc-probe] $label%-12s edges=${nEdges / 1e6}%5.1fM chainLen=$chainLen " +
        f"op=$wallOp%7.2f s op+verify=$wall%7.2f s clusters=${agg.getLong(0)} (expect $expect) bad=${agg.getLong(1)}")
      require(agg.getLong(0) == expect && agg.getLong(1) == 0, s"$label WRONG at $nEdges edges")
    }

    Seq(1, 4, maxM).distinct.filter(_ <= maxM).foreach { m =>
      val n = m * 1_000_000L
      run("driver", n, driverLimit = Long.MaxValue)
      run("distributed", n, driverLimit = 0L)
    }
    spark.stop()
  }
}
