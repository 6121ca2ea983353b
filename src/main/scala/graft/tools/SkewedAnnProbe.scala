package graft.tools

import graft.operators.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** What does a SKEWED embedding distribution do to the cell-bucketed ANN
  * operators, and does AQE's skew-join split absorb it?
  *
  * Real embedding corpora are not axis-symmetric: boilerplate/template
  * content concentrates mass in one region, so one IVF cell (or sign
  * orthant) holds a large corpus fraction. This probe builds exactly that
  * corpus — `hotFrac` of the vectors in a tight cluster, the rest
  * uniform — and measures:
  *
  *   1. `nearDupPairs` (sign-LSH): the bounded collect caps the hot
  *      orthant at maxBucket, so work stays bounded and truncation is
  *      counted — the cap IS the mitigation, at recall cost (prefer
  *      `semanticNearDupPairs` when mass concentrates in one orthant).
  *   2. `knnJoin` through IVF cells: the hot cell makes one shuffle
  *      partition quadratic-in-cell. Per-task durations (median/p95/max)
  *      are printed with AQE skew-join split ON vs OFF — the split
  *      parallelizes the hot partition; the WORK dial stays nlist/probes
  *      (cells must stay bounded at corpus scale).
  *
  * `sbt "runMain graft.tools.SkewedAnnProbe [n] [hotFrac] [nlist]"`
  */
object SkewedAnnProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 32768
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.8
    val nlist = if (args.length > 2) args(2).toInt else 64
    val dims = 16

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // per-stage task durations, keyed by stage id
    val taskTimes = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Buffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = taskTimes.synchronized {
        taskTimes.getOrElseUpdate(e.stageId, scala.collection.mutable.Buffer.empty) +=
          e.taskInfo.duration
      }
    })
    def drainHistogram(label: String): Unit = taskTimes.synchronized {
      val all = taskTimes.toSeq.sortBy(_._1)
      val heavy = all.filter(_._2.nonEmpty).sortBy(-_._2.max).take(3)
      heavy.foreach { case (stage, ts) =>
        val s = ts.sorted
        def pct(p: Double) = s((p * (s.size - 1)).toInt)
        println(f"[skew-probe] $label%-28s stage=$stage tasks=${s.size}%3d " +
          f"med=${pct(0.5)}%5d ms p95=${pct(0.95)}%5d ms max=${s.last}%6d ms " +
          f"skew=${s.last.toDouble / math.max(1, pct(0.5))}%5.1fx")
      }
      taskTimes.clear()
    }

    val rnd = new scala.util.Random(7)
    val hotCenter = Array.fill(dims)(0.6f + rnd.nextFloat() * 0.2f)
    val nHot = (n * hotFrac).toInt
    val rows = (0 until n).map { i =>
      val v =
        if (i < nHot) hotCenter.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
        else Seq.fill(dims)(rnd.nextFloat() * 2 - 1)
      (i.toLong, v)
    }
    val corpus = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
      .repartition(32).localCheckpoint()

    // centroids: uniform draws — the hot cluster lands in whichever cell
    // is nearest, concentrating hotFrac of the corpus there
    val centroids = (0 until nlist).map(c => (c.toLong, Seq.fill(dims)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
      .localCheckpoint()

    // cell-population skew, for the record
    val cents = centroids.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val cellCounts = corpus
      .select(Similarity.nearestCentroid(col("v"), cents, round4 = true).as("c"))
      .groupBy("c").count().orderBy(desc("count")).collect()
    println(s"[skew-probe] n=$n hotFrac=$hotFrac nlist=$nlist " +
      s"hottest cells: ${cellCounts.take(3).map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(", ")}")

    // 1. sign-LSH near-dup pairs: the cap bounds the hot orthant
    val dropped = spark.sparkContext.longAccumulator("dropped")
    val t0 = System.nanoTime()
    val pairs = Similarity.nearDupPairs(corpus, "id", "v", p = 4, minCos = 0.95,
      maxBucket = 1000, droppedAcc = Some(dropped)).count()
    println(f"[skew-probe] nearDupPairs capped: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"pairs=$pairs dropped=${dropped.value} (cap bounds the hot orthant)")
    drainHistogram("nearDupPairs")

    // 2. knnJoin through the skewed cells. Two join regimes:
    //    - broadcast (the default when the probe side fits): the hot
    //      cell's quadratic work spreads EVENLY over the corpus
    //      partitions — no straggler to split, AQE skew-join is moot,
    //      and the dial that matters is total work (nlist/probes);
    //    - shuffle (forced via autoBroadcastJoinThreshold=-1, the 100 TB
    //      regime where both sides are too big to broadcast): the hot
    //      cell lands in ONE shuffle partition and AQE's skew split is
    //      what breaks the straggler.
    for (bcast <- Seq(true, false); skewOn <- Seq(true, false)) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", if (bcast) "10m" else "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", if (bcast) "10m" else "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
      // CRITICAL: AQE detects skew on INPUT bytes, but a quadratic
      // in-cell join's hot partition is input-SMALL (13k vectors ≈ 1.3 MB
      // here) and output-huge — the default 256 MB threshold (and even a
      // few-MB one) never fires. The thresholds must come down to the
      // input scale of a hot cell for the split to trigger at all.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      if (bcast && !skewOn) () // broadcast plan ignores skewJoin: skip the duplicate run
      else {
        val t1 = System.nanoTime()
        val out = Similarity.knnJoin(corpus, "id", "v", centroids, "id", k = 5, probes = 1).count()
        println(f"[skew-probe] knnJoin bcast=$bcast%-5s skewJoin=$skewOn%-5s " +
          f"wall=${(System.nanoTime() - t1) / 1e9}%7.2f s rows=$out")
        drainHistogram(s"knnJoin bcast=$bcast skew=$skewOn")
      }
    }
    spark.stop()
  }
}
