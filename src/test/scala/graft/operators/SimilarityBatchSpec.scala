package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The batch ANN forms must agree row-for-row with looping the
  * single-query forms — same scores (one 4-decimal lattice on both
  * paths), same tie order, for every scoring tier. */
class SimilarityBatchSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(91)
  private def vec(dims: Int) = Seq.fill(dims)(rnd.nextFloat() * 2 - 1)

  private val dims = 16
  private lazy val corpus = (100L until 300L).map(i => (i, vec(dims))).toDF("id", "v")
    .select(col("id"), col("v").cast("array<float>").as("v"))
  private lazy val centroids = (0L until 8L).map(i => (i, vec(dims))).toDF("id", "v")
    .select(col("id"), col("v").cast("array<float>").as("v"))
  private lazy val queries = (0L until 5L).map(i => (i, vec(dims))).toDF("id", "v")
    .select(col("id"), col("v").cast("array<float>").as("v"))
  private lazy val codebooks = Similarity.pqCodebooksFromRows(
    (0 until 16).map(_ => vec(dims)), m = 4)

  private def batchRows(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Double)]] =
    df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("ivfTopKBatch equals per-query ivfTopK (float tier)") {
    val batch = batchRows(Similarity.ivfTopKBatch(
      corpus, "id", "v", centroids, "id", queries, "id", k = 7, probes = 2))
    (0L until 5L).foreach { q =>
      val single = Similarity.ivfTopK(corpus, "id", "v", centroids, "id",
        queries.filter(col("id") === q), k = 7, probes = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) == single, s"query $q diverged")
    }
  }

  test("ivfTopKBatch equals per-query ivfTopK (SQ8 tier)") {
    val batch = batchRows(Similarity.ivfTopKBatch(
      corpus, "id", "v", centroids, "id", queries, "id", k = 5, probes = 2,
      scoreQuantized = true))
    (0L until 5L).foreach { q =>
      val single = Similarity.ivfTopK(corpus, "id", "v", centroids, "id",
        queries.filter(col("id") === q), k = 5, probes = 2, scoreQuantized = true)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) == single, s"query $q diverged")
    }
  }

  test("ivfTopKBatch equals per-query ivfTopK (IVF-PQ tier)") {
    val batch = batchRows(Similarity.ivfTopKBatch(
      corpus, "id", "v", centroids, "id", queries, "id", k = 6, probes = 2,
      pqCodebooks = Some(codebooks)))
    (0L until 5L).foreach { q =>
      val single = Similarity.ivfTopK(corpus, "id", "v", centroids, "id",
        queries.filter(col("id") === q), k = 6, probes = 2,
        pqCodebooks = Some(codebooks))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) == single, s"query $q diverged")
    }
  }

  test("ivfTopKBatch with the two-level coarse index equals the flat batch") {
    val flat = batchRows(Similarity.ivfTopKBatch(
      corpus, "id", "v", centroids, "id", queries, "id", k = 6, probes = 2))
    val twoLevel = batchRows(Similarity.ivfTopKBatch(
      corpus, "id", "v", centroids, "id", queries, "id", k = 6, probes = 2,
      coarseBranches = 3)) // branches == nCoarse(⌈√8⌉=3): exhaustive ⇒ bit-equal
    assert(twoLevel == flat)
  }

  test("pqAdcTopKBatch equals per-query pqAdcTopK") {
    val batch = batchRows(Similarity.pqAdcTopKBatch(
      corpus, "id", "v", codebooks, queries, "id", k = 8))
    (0L until 5L).foreach { q =>
      val single = Similarity.pqAdcTopK(corpus, "id", "v", codebooks,
        queries.filter(col("id") === q), k = 8)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) == single, s"query $q diverged")
    }
  }

  test("a NaN query vector yields no rows for that query, not a job failure") {
    val nanQuery = Seq((99L, Seq.fill(dims)(Float.NaN))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val mixed = queries.unionByName(nanQuery)
    val out = Similarity.pqAdcTopKBatch(corpus, "id", "v", codebooks, mixed, "id", k = 3)
      .select("query_id").distinct().collect().map(_.getLong(0)).toSet
    assert(out == (0L until 5L).toSet, "the NaN query drops out; the rest answer")
  }

  test("batch ranks are 1..k dense per query, ordered by score desc then id") {
    val out = Similarity.ivfTopKBatch(
      corpus, "id", "v", centroids, "id", queries, "id", k = 4, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length), s"query $q ranks not dense")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 > b._3 || (a._3 == b._3 && a._2 < b._2)
        case _ => true
      }, s"query $q order broken")
    }
  }
}
