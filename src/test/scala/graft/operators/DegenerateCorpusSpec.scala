package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pathological-input robustness: the corpora a real pipeline actually
  * meets — empty tables, null/empty/whitespace text, one-token docs,
  * an entirely-identical corpus — must flow through the operator
  * families without exceptions and with sensible shapes. Every case
  * here is a class of production input, not an adversarial fantasy:
  * a filter stage upstream can empty a partition, scraped text is full
  * of nulls and whitespace, and a template corpus IS near-identical. */
class DegenerateCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private val nasty = docs(
    (1L, null), (2L, ""), (3L, "   "), (4L, "one"),
    (5L, "a a a a a a a a a a a a"), (6L, "a a a a a a a a a a a a"))
  private val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup family survives nulls, empties, and an identical pair") {
    assert(Dedup.exact(nasty, "doc_id", "text").count() >= 1)
    assert(Dedup.lshCandidatePairs(nasty, "doc_id", "text").collect()
      .exists(r => r.getAs[Long]("doc_a") == 5L && r.getAs[Long]("doc_b") == 6L),
      "the identical pair must still collide")
    assert(Dedup.lshCandidatePairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.exact(empty, "doc_id", "text").count() == 0)
  }

  test("text family: gram/chunk/quality operators yield rows without throwing") {
    assert(TextOps.crossDupCoverage(nasty, "doc_id", "text", 3).count() == 2,
      "only the two 12-token docs have 3-grams")
    assert(TextOps.crossDupCoverage(empty, "doc_id", "text", 3).count() == 0)
    val cdc = TextOps.cdcChunks(nasty, "doc_id", "text", 3, 4).collect()
    assert(cdc.map(_.getAs[Long]("doc")).toSet == Set(3L, 4L, 5L, 6L) -- Set(3L),
      "every doc with >= 1 token chunks; null/empty/whitespace do not")
    assert(TextOps.cdcChunks(empty, "doc_id", "text", 3, 4).count() == 0)
    val ch = TextOps.chunkTokens(nasty, "doc_id", "text", 8, 2).count()
    assert(ch >= 3)
    assert(TextOps.exactRunDedupText(nasty, "doc_id", "text", 3).count() >= 1)
  }

  test("bpe: training and encoding survive an empty and a degenerate corpus") {
    val m0 = Bpe.train(empty, "text", nMerges = 10)
    assert(m0.isEmpty, "no words, no merges")
    assert(Bpe.encode(empty, "doc_id", "text", m0).count() == 0)
    val m = Bpe.train(nasty, "text", nMerges = 10)
    val enc = Bpe.encode(nasty, "doc_id", "text", m).collect()
    assert(enc.length == 6, "every row encodes, including null/empty text")
    val nullRow = enc.find(_.getAs[Long]("doc") == 1L).get
    assert(nullRow.getAs[Long]("n_tokens") == 0L && nullRow.isNullAt(3),
      "null text = zero tokens, null ratio")
  }

  test("pca: empty input fails loudly, not mysteriously; degenerate vectors solve") {
    val e = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException](Pca.moments(e, "embedding"))
    assert(ex.getMessage.contains("empty"), s"want a named error, got: ${ex.getMessage}")
    // all-identical vectors: zero covariance everywhere — still solves
    val same = (1 to 20).map(i => (i.toLong, Seq.fill(4)(0.25f))).toDF("vec_id", "embedding")
    val m = Pca.topComponent(same, "embedding", iters = 4)
    assert(m.eigval == 0.0, "zero-variance corpus has eigval 0")
    assert(!m.component.exists(_.isNaN), "component must stay finite (no 0/0)")
  }

  test("similarity: zero vectors neither match nor crash") {
    val vs = Seq(
      (1L, Seq.fill(4)(0.0f)), (2L, Seq(1.0f, 0f, 0f, 0f)),
      (3L, Seq(0.9f, 0.1f, 0f, 0f))).toDF("vec_id", "embedding")
    val q = Seq((2L, Seq(1.0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vs, "vec_id", "embedding", q, k = 3).collect()
    assert(!top.exists(_.getAs[Long]("vec_id") == 1L),
      "a zero vector has no cosine and must not rank")
  }

  test("sketches: empty and null-heavy corpora flow through") {
    // HLL: empty input = all-zero registers, estimate defined (raw bias regime)
    val regs = Sketches.hllRegisters(empty.select(col("text").as("k")), "k")
    assert(regs.count() == 256 && regs.agg(sum("register")).collect().head.getLong(0) == 0)
    val est = Sketches.hllEstimate(regs).collect().head
    assert(est.getAs[Long]("n_zero") == 256L)
    // nulls are ignored, not crashed on
    val withNulls = nasty.select(col("text").as("k"))
    assert(Sketches.hllRegisters(withNulls, "k").count() == 256)
    // CMS over an empty frame: zero cells, estimates never invented
    val cells = Sketches.cmsCells(
      empty.select(col("text").as("w")).withColumn("c", lit(1L)), "w", "c")
    assert(cells.count() == 0)
    // histogram quantiles: empty input yields an empty frame, no throw
    assert(Sketches.histQuantiles(empty, "doc_id", length(col("text")),
      Seq("p50" -> 0.5)).count() == 0)
  }

  test("dsir: empty corpus and all-target corpus score without throwing") {
    val e2 = empty.withColumn("is_t", lit(false))
    assert(TextOps.importanceScore(e2, "doc_id", "text", "is_t").count() == 0)
    assert(TextOps.importanceSelect(
      TextOps.importanceScore(e2, "doc_id", "text", "is_t"), 300).count() == 0)
    // target == raw: every smoothed ratio is (t+1)·R vs (r+1)·T with t=r —
    // scores collapse to ~0 and selection still picks ceil(permille)
    val all = nasty.withColumn("is_t", lit(true))
    val sel = TextOps.importanceSelect(
      TextOps.importanceScore(all, "doc_id", "text", "is_t"), 500)
    assert(sel.count() == 6 && sel.where(col("selected")).count() >= 3)
  }

  test("kmeans: k = 1 collapses to the dyadic mean of everything") {
    val vs = Seq((0L, Seq(1.0f, 3.0f)), (1L, Seq(3.0f, 5.0f)), (2L, Seq(5.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val m = KMeans.train(vs, "vec_id", "embedding", k = 1, iters = 2)
    assert(m.sizes.toSeq == Seq(3L))
    assert(math.abs(m.centroids(0)(0) - 3.0) < 1e-9 && math.abs(m.centroids(0)(1) - 3.0) < 1e-9)
  }
}
