package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Does [[graft.operators.Dedup.prefixIndexDrift]]'s candidate-mass
  * metric actually track the probe cost a stale frozen ordering pays?
  * Measured, not assumed: build the index on the corpus, arrive a
  * VOCABULARY-SHIFTED batch (the corpus's K most common tokens swapped
  * with K of its rare tokens — the Zipf head migrating, which is what
  * real drift looks like), read the drift row, then time the SAME
  * second batch's probe against the stale index vs against a rebuilt
  * one. The pair counts must be identical (the frozen ordering is
  * recall-exact forever — staleness is a COST story, never a recall
  * story); the walls and the drift metric move together.
  * Args: sfDir [K]. */
object PrefixDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def reps(dd: DataFrame) = dd
      .select(col("doc_id"),
        array_sort(array_distinct(graft.operators.TextOps.tokens(col("text")))).as("ts"))
      .groupBy(md5(concat_ws(" ", col("ts")).cast("binary")).as("_fp"))
      .agg(min(col("doc_id")).as("id"), first(col("ts")).as("ts"))
      .select("id", "ts")
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = reps(docs.filter(pmod(col("doc_id"), lit(10)) >= 2)).localCheckpoint()

    // the shift map: corpus head tokens ↔ corpus tail tokens (df >= 2
    // so both sides exist in the frozen df table)
    val byDf = corpus.select(explode(col("ts")).as("tok"))
      .groupBy("tok").count().filter(col("count") >= 2)
      .orderBy(desc("count"), col("tok")).select("tok").collect().map(_.getString(0))
    val hot = byDf.take(k)
    val rare = byDf.takeRight(k)
    val swap: Map[String, String] = (hot.zip(rare) ++ rare.zip(hot)).toMap
    println(s"[drift-probe] swapping ${hot.length} head tokens with ${rare.length} tail tokens")
    def shifted(dd: DataFrame): DataFrame = {
      val m = typedLit(swap)
      dd.withColumn("ts",
        array_sort(array_distinct(transform(col("ts"),
          (x: Column) => coalesce(element_at(m, x), x)))))
    }
    val b1 = shifted(reps(docs.filter(pmod(col("doc_id"), lit(10)) === 0))).localCheckpoint()
    val b2 = shifted(reps(docs.filter(pmod(col("doc_id"), lit(10)) === 1))).localCheckpoint()

    def timed(label: String)(body: => Long): Long = {
      body // warm
      val t0 = System.nanoTime()
      val v = body
      println(f"[drift-probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  pairs $v%d")
      v
    }
    def drift(dir: String, label: String): Unit = {
      val r = graft.operators.Dedup.prefixIndexDrift(spark, dir).head()
      println(s"[drift-probe] drift $label: sets=${r.getLong(0)} " +
        s"stored_mass=${r.getLong(1)} fresh_mass=${r.getLong(2)} " +
        s"drift_permille=${r.getLong(3)}")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-drift-probe").toString
    graft.operators.Dedup.prefixIndexBuild(corpus, "id", "ts", 900, dir)
    drift(dir, "fresh build")
    graft.operators.Dedup.prefixIndexAppend(b1, "id", "ts", dir, batchId = 0L)
    drift(dir, "after shifted-vocab append")
    val stale = timed("probe b2 on STALE index") {
      graft.operators.Dedup.incrementalPrefixPairs(b2, "id", "ts", dir,
        belowBatch = Some(1L))
        .count()
    }
    // rebuild folds b1 in under a fresh ordering; probe the same batch
    val dir2 = java.nio.file.Files.createTempDirectory("graft-drift-probe2").toString
    graft.operators.Dedup.prefixIndexBuild(corpus.unionByName(b1), "id", "ts", 900, dir2)
    drift(dir2, "after rebuild")
    val freshP = timed("probe b2 on REBUILT index") {
      graft.operators.Dedup.incrementalPrefixPairs(b2, "id", "ts", dir2).count()
    }
    println(s"[drift-probe] recall cross-check: stale pairs == rebuilt pairs: ${stale == freshP}")
    spark.stop()
  }
}
