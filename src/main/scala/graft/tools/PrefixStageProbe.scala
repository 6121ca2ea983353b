package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the exact-threshold prefix join
  * ([[graft.operators.Dedup.prefixFilterPairs]]) on the sf0.1
  * representatives: times each pipeline stage to its own barrier so the
  * optimization round knows whether the bill is the prefix build, the
  * candidate flood, the distinct, or the verify. Mirrors the operator's
  * exact stages (same code shapes) — a measurement harness, not a
  * second implementation used by queries. */
object PrefixStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "300")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pfx] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (iter <- 1 to 2) {
      println(s"--- iter $iter ---")
      val sets0 = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          array_sort(array_distinct(graft.operators.TextOps.tokens(col("text")))).as("ts"))
      val reps = sets0
        .groupBy(md5(concat_ws(" ", col("ts")).cast("binary")).as("_fp"))
        .agg(min(col("doc_id")).as("id"), first(col("ts")).as("ts"))
        .select("id", "ts")
      val sets = t("reps+sets ckpt") {
        reps.select(col("id").as("sid"),
          array_sort(array_distinct(col("ts"))).as("ts")).localCheckpoint()
      }
      val toks = sets.select(col("sid"), explode(col("ts")).as("tok"))
      val dfs = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      val prefix = t("prefix build ckpt") {
        val ordered = toks
          .join(dfs, Seq("tok"), "left_outer")
          .select(col("sid"), col("tok"), coalesce(col("df"), lit(0L)).as("df"))
          .groupBy("sid")
          .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
            x => x.getField("tok")).as("ot"))
          .withColumn("n", size(col("ot")))
          .withColumn("p", {
            val tn = col("n").cast("long") * 900 + 999L
            col("n") - ((tn - tn % 1000L) / 1000L).cast("long") + 1
          })
        ordered.select(col("sid"), col("n"),
          posexplode(slice(col("ot"), lit(1), greatest(col("p"), lit(0)).cast("int"))))
          .toDF("sid", "n", "pos", "tok").localCheckpoint()
      }
      println(s"[pfx] sets=${sets.count()} prefixRows=${prefix.count()}")
      val hotToks = prefix.groupBy("tok").agg(count(lit(1)).as("_pdf"))
        .filter(col("_pdf") >= 4096L).select("tok")
      val hotP = prefix.join(broadcast(hotToks), Seq("tok"), "left_semi")
      val coldP = prefix.join(broadcast(hotToks), Seq("tok"), "left_anti")
      def ppjoinFilters(cands: org.apache.spark.sql.DataFrame) = cands
        .filter(greatest(col("a.n"), col("b.n")).cast("long") * 900 <=
          least(col("a.n"), col("b.n")).cast("long") * 1000)
        .filter(least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")).cast("long") *
          (1000L + 900L) >=
          (col("a.n") + col("b.n")).cast("long") * 900)
      val coldCands = ppjoinFilters(
        coldP.as("a").join(broadcast(coldP.as("b")),
          col("a.tok") === col("b.tok") && col("a.sid") < col("b.sid")))
        .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      val salts = 32
      val hotCands = ppjoinFilters(
        hotP.withColumn("_s", explode(sequence(lit(0), lit(salts - 1)))).as("a")
          .join(hotP.withColumn("_s", pmod(col("sid"), lit(salts)).cast("int")).as("b"),
            col("a.tok") === col("b.tok") && col("a._s") === col("b._s") &&
              col("a.sid") < col("b.sid")),
        )
        .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      t("flood count (no distinct)") {
        println(s"[pfx] flood=${coldCands.unionByName(hotCands).count()}")
      }
      val cands = t("flood+distinct ckpt") {
        coldCands.unionByName(hotCands).distinct().localCheckpoint()
      }
      println(s"[pfx] cands=${cands.count()}")
      t("verify") {
        val verify = cands
          .join(broadcast(sets.select(col("sid").as("id_a"), col("ts").as("ts_a"))), Seq("id_a"))
          .join(broadcast(sets.select(col("sid").as("id_b"), col("ts").as("ts_b"))), Seq("id_b"))
          .withColumn("_i", size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
          .withColumn("_u",
            (size(col("ts_a")) + size(col("ts_b"))).cast("long") - col("_i"))
          .filter(col("_i") * 1000 >= col("_u") * 900)
        println(s"[pfx] verified=${verify.count()}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
