package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the reduced-dimension ANN composition: IVF serving over
  * JL-projected 16-dim vectors (4× less vector IO per scored pair)
  * against full-dim IVF and the exact full-dim top-k — recall@10 and
  * warm scan time for a batch of queries. The question it answers for
  * a 100 TB deployment: how much recall does the 4× IO cut cost ON THIS
  * EMBEDDING DISTRIBUTION — the dial between dOut, probes, and recall
  * that PLANS.md records. Usage: runMain graft.tools.ReducedDimAnnProbe [sfDir] */
object ReducedDimAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, sfDir).cache()
    val corpus = emb.filter(col("vec_id") > 40)
    val queries = emb.filter(col("vec_id") <= 20)
    val cents = emb.filter(col("vec_id").between(21, 36)) // 16 centroid rows

    def projF(df: org.apache.spark.sql.DataFrame) =
      Similarity.randomProject(df, "vec_id", "embedding", 16)
        .select(col("vec_id"),
          transform(col("proj"), x => x.cast("float")).as("embedding")).cache()
    val corpusP = projF(corpus); val queriesP = projF(queries); val centsP = projF(cents)
    corpusP.count(); queriesP.count(); centsP.count()

    // exact full-dim ground truth
    val exact = corpus.crossJoin(broadcast(
        queries.select(col("vec_id").as("qid"), col("embedding").as("_q"))))
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("_q")), 4).as("_c"))
      .filter(col("_c").isNotNull)
      .groupBy("qid")
      .agg(graft.expressions.BoundedCollect.boundedSortedCollect(
        struct((-col("_c")).as("nc"), col("vec_id")), 10).as("_t"))
      .select(col("qid"), explode(col("_t.vec_id")).as("hit"))
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    def recallOf(hits: Map[Long, Set[Long]]): Double = {
      val rs = exact.map { case (q, ex) =>
        hits.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }
      rs.sum / rs.size
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(c: org.apache.spark.sql.DataFrame, ce: org.apache.spark.sql.DataFrame,
            q: org.apache.spark.sql.DataFrame, probes: Int): Map[Long, Set[Long]] =
      Similarity.ivfTopKBatch(c, "vec_id", "embedding", ce, "vec_id", q, "vec_id",
          k = 10, probes = probes)
        .select(col("query_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).map { case (qq, rs) => qq -> rs.map(_.getLong(1)).toSet }

    for (probes <- Seq(1, 2, 4)) {
      run(corpus, cents, queries, probes) // warm
      val (hFull, tFull) = timed(run(corpus, cents, queries, probes))
      run(corpusP, centsP, queriesP, probes)
      val (hRp, tRp) = timed(run(corpusP, centsP, queriesP, probes))
      println(f"[rdann-probe] probes=$probes  full-dim: recall ${recallOf(hFull)}%.3f in $tFull%.2f s   rp16: recall ${recallOf(hRp)}%.3f in $tRp%.2f s")
    }
    spark.stop()
  }
}
