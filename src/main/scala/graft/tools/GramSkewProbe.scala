package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the hot-gram behavior of the exact-substring operators
  * (VERDICT r6 #2/#3): the round-6 form computed per-gram min/max doc
  * through ONE window over the gram partition, which serializes a
  * stop-word-hot gram into a single task; round 7 switched to the
  * partial-agg groupBy + join-back form (the shape `crossDupCoverage` /
  * `ngramNovelty` already used), where a hot gram collapses map-side.
  *
  * The probe isolates the skew-sensitive stage: the exploded
  * (doc, pos, g) frame is materialized to parquet ONCE (the shingle
  * scan is HOF-heavy, identical in both forms, and skew-irrelevant —
  * measured: it swamps the exchange signal when left inline), then the
  * post-explode halves of both forms run against it. Corpus: 80% of
  * documents open with the same 5-token phrase over otherwise-unique
  * 10-token bodies, so at n=5 ONE gram holds ~13% of all exploded rows
  * (0.8 of docs x 1 of 6 grams) while a uniform 1/32 partition holds ~3%.
  *
  * Three runs: the window form (hot gram forced into one sort task);
  * the groupBy form as the operator runs it (the filtered stats side —
  * cross-doc grams only — is tiny here and BROADCASTS, so the probe
  * side never shuffles by gram at all); and the groupBy form with
  * broadcast disabled, the 100 TB regime where the stats side is too
  * big to broadcast and the skewed join partition is split by AQE
  * (thresholds scaled to probe partition sizes, same as a real job
  * scales them to its own).
  *
  * Usage: runMain graft.tools.GramSkewProbe [docs] (default 4000000)
  */
object GramSkewProbe {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toInt).getOrElse(4000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // default factor 5 ignores the probe's ~4x hot partition; a 100 TB
      // job tunes this to its own acceptable straggler ratio
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val durations = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        durations.add((t.stageId, t.taskInfo.duration,
          Option(t.taskMetrics).map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)))
    })

    val n = 5
    val L = n.toLong
    def uniq(lo: Int, hi: Int) = concat_ws(" ", transform(sequence(lit(lo), lit(hi)),
      j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(100000000L)))))
    val corpus = spark.range(docs).select(
      col("id").as("doc"),
      concat_ws(" ",
        when(pmod(col("id"), lit(5)) < 4, lit("h1 h2 h3 h4 h5")).otherwise(uniq(6, 10)),
        uniq(1, 5))
        .as("text"))

    val posPath = "target/probe-tmp/gramskew_pos"
    locally {
      import graft.operators.TextOps._
      corpus.select(col("doc"), posexplode(shingles(tokens(col("text")), n)).as(Seq("pos", "g")))
        .write.mode("overwrite").parquet(posPath)
    }
    val pos = spark.read.parquet(posPath)
    println(s"[gram-skew] exploded rows=${pos.count()}")

    // the identical per-doc fold both forms end in (doc-bounded, cheap)
    def fold(covered: DataFrame): DataFrame =
      covered.groupBy("doc")
        .agg(sort_array(collect_list(col("pos").cast("long"))).as("ps"))
        .select(col("doc"), aggregate(
          slice(col("ps"), lit(2), greatest(size(col("ps")) - 1, lit(0))),
          struct(element_at(col("ps"), 1).as("prev"), lit(L).as("covered")),
          (acc, p) => {
            val gap = p - acc.getField("prev")
            struct(p.as("prev"),
              (acc.getField("covered") + when(gap <= L, gap).otherwise(lit(L))).as("covered"))
          }).as("f"))
        .select(col("doc"), col("f.covered").as("covered_tokens"))

    // round-6 shape: ONE window over the gram partition
    def windowForm(): DataFrame = {
      val wg = org.apache.spark.sql.expressions.Window.partitionBy("g")
      fold(pos
        .withColumn("_mind", min("doc").over(wg))
        .withColumn("_maxd", max("doc").over(wg))
        .filter(col("_mind") =!= col("_maxd")))
    }

    // plain groupBy + join-back: partial-agg stats, cross-doc filter
    // BEFORE the join. NOTE (measured here): AQE's OptimizeSkewedJoin
    // never fires on this shape — it only matches
    // SMJ(Sort(Shuffle), Sort(Shuffle)), and the aggregate+filter sits
    // between the stats shuffle and the join; an explicit
    // repartition(g) doesn't help either (REPARTITION_BY_COL origin is
    // not splittable, only ENSURE_REQUIREMENTS is). So the hot gram
    // still serializes into one join partition, same as the window.
    def groupByForm(): DataFrame = {
      val crossGrams = pos.groupBy("g")
        .agg(min("doc").as("_mind"), max("doc").as("_maxd"))
        .filter(col("_mind") =!= col("_maxd"))
        .select("g")
      fold(pos.join(crossGrams, Seq("g")))
    }

    // df-threshold hot/cold split: grams with df >= K resolve through a
    // BROADCAST join map-side and never enter any exchange; the cold
    // shuffle join has every key < K rows by construction — skew is
    // bounded deterministically, no AQE needed, at any corpus size.
    def groupByHotForm(): DataFrame = {
      val K = 100000L
      val stats = pos.groupBy("g")
        .agg(min("doc").as("_mind"), max("doc").as("_maxd"), count(lit(1)).as("_cnt"))
        .filter(col("_mind") =!= col("_maxd"))
      val hot = stats.filter(col("_cnt") >= K).select(col("g"), lit(1).as("_hot"))
      val cold = stats.filter(col("_cnt") < K).select("g")
      val posH = pos.join(broadcast(hot), Seq("g"), "left_outer")
      fold(posH.filter(col("_hot") === 1).select("doc", "pos")
        .unionByName(posH.filter(col("_hot").isNull).join(cold, Seq("g")).select("doc", "pos")))
    }

    def run(tag: String, thunk: () => DataFrame): Unit = {
      def force() = thunk().agg(sum("covered_tokens")).head().getLong(0)
      force() // warm codegen + JIT
      durations.clear()
      val t0 = System.nanoTime()
      val c = force()
      val wall = (System.nanoTime() - t0) / 1e9
      val all = durations.toArray(Array.empty[(Int, Long, Long)]).toSeq
      val ds = all.map(_._2).sorted
      def pct(p: Double) = if (ds.isEmpty) 0L else ds((p * (ds.length - 1)).toInt)
      println(f"[gram-skew] $tag%-12s covered=$c wall=$wall%.2f s tasks=${ds.length} " +
        f"p50=${pct(0.5)}ms p95=${pct(0.95)}ms max=${ds.lastOption.getOrElse(0L)}ms " +
        f"max/p50=${ds.lastOption.getOrElse(0L).toDouble / math.max(pct(0.5), 1)}%.1f")
      // per-stage attribution: shuffle-read record skew separates real
      // data skew (hot partition) from straggler noise (uniform records)
      all.groupBy(_._1).toSeq
        .map { case (sid, ts) =>
          val d = ts.map(_._2).sorted
          val r = ts.map(_._3).sorted
          (sid, d.length, d(d.length / 2), d.last, r(r.length / 2), r.last)
        }
        .sortBy(-_._6).take(3).foreach { case (sid, nT, p50, mx, rP50, rMax) =>
          println(f"[gram-skew]   stage $sid%-4d tasks=$nT%-3d p50=${p50}ms max=${mx}ms " +
            f"recP50=$rP50 recMax=$rMax recSkew=${rMax.toDouble / math.max(rP50, 1)}%.1f")
        }
    }

    run("window", windowForm _)
    run("groupby", groupByForm _)
    run("groupby-hot", groupByHotForm _)
    run("window", windowForm _)
    run("groupby", groupByForm _)
    run("groupby-hot", groupByHotForm _)
    spark.stop()
  }
}
