package graft.streaming

import graft.SparkSpec
import graft.operators.{Pca, Validation}
import org.apache.spark.sql.functions._

/** Pins the composed streaming corpus build end-to-end: every stage of
  * the funnel gates (validation, quality/language, cross-batch dedup,
  * cross-batch budget), the drift monitor alarms on a poisoned batch,
  * the admitted corpus lands batch-partitioned, and a replayed batch
  * re-derives summary + corpus bit-identically across the WHOLE
  * composition (each vertical's replay contract surviving composition is
  * exactly what this spec adds over the per-vertical specs). */
class StreamingCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val enText =
    "the quick brown fox jumps of the hill and runs to a river in the morning light"
  private def doc(id: Long, text: String, src: String = "web") = (id, text, src)

  private val checks = Seq(
    Validation.Expect("text_not_null", col("text").isNotNull),
    Validation.Unique("doc_id_unique", col("doc_id")))

  private def fixture(): (String, String, String, String) = {
    val momentsDir = tmpDir("scorpus-ref")
    // reference moments over a healthy slice of the gate-passing docs
    val ref = Seq(doc(900L, enText), doc(901L, enText + " extra word"),
      doc(902L, enText + " more and more of the words"))
      .toDF("doc_id", "text", "source")
    Pca.saveMoments(spark,
      Pca.moments(StreamingCorpus.qualityFeatures(ref, "doc_id", "text",
        StreamingCorpus.DefaultStops), "features"), momentsDir)
    (momentsDir, tmpDir("scorpus-state"), tmpDir("scorpus-corpus"), tmpDir("scorpus-out"))
  }

  private def run(batch: Seq[(Long, String, String)], batchId: Long,
                  dirs: (String, String, String, String),
                  budgets: Map[String, Long] = Map.empty,
                  defaultBudget: Long = 1000000L) =
    StreamingCorpus.processBatch(
      batch.toDF("doc_id", "text", "source"), batchId,
      "doc_id", "text", "source", checks, budgets, defaultBudget,
      dirs._1, dirs._2, dirs._3)

  private def summary(df: org.apache.spark.sql.DataFrame) = {
    val r = df.head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
  } // (n_arrived, n_valid, n_gated, n_unique, n_admitted, admitted_tokens)

  test("funnel gates compose: validation, quality/lang, cross-batch dedup, budget") {
    val dirs = fixture()
    // batch 0: 1 null-text (validation), 1 German-ish (lang gate),
    // 1 short (quality), 2 good (one pair near-identical within batch)
    val b0 = run(Seq(
      doc(1L, null), doc(2L, "der schnelle braune fuchs springt"),
      doc(3L, "the a"), doc(4L, enText), doc(5L, enText + " x")), 0L, dirs)
    assert(summary(b0) == ((5L, 4L, 2L, 1L, 1L, 17L)),
      "5 arrived, 4 valid, 2 past gates, near-dup pair collapses to 1, admitted")

    // batch 1: a near-dup of batch 0's admitted doc must be rejected by
    // the STORED index (cross-batch), a novel doc admitted
    val b1 = run(Seq(doc(10L, enText), doc(11L,
      "a tale of two cities is the best story in the world and the author knew it")), 1L, dirs)
    assert(summary(b1) == ((2L, 2L, 2L, 1L, 1L, 17L)),
      "cross-batch duplicate rejected by the stored band index")

    // corpus: exactly the two admitted docs, batch-partitioned
    val corpus = spark.read.parquet(dirs._3)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L, 11L))
    assert(corpus.select(col("batch").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  test("budget closes across batches inside the composition") {
    val dirs = fixture()
    val budgets = Map("web" -> 20L)
    // batch 0: 17 tokens admitted of the 20 budget
    val b0 = run(Seq(doc(1L, enText)), 0L, dirs, budgets, 0L)
    assert(summary(b0)._5 == 1L)
    // batch 1: a NOVEL doc of 17 tokens no longer fits the remaining 3
    val b1 = run(Seq(doc(2L,
      "a tale of two cities is the best story in the world and the author knew it")),
      1L, dirs, budgets, 0L)
    assert(summary(b1) == ((1L, 1L, 1L, 1L, 0L, 0L)),
      "novel and unique, but the source budget is spent")
  }

  test("drift monitor alarms on a poisoned batch, stays quiet on a healthy one") {
    val dirs = fixture()
    val healthy = run(Seq(doc(1L, enText), doc(2L, enText + " y")), 0L, dirs)
    assert(!healthy.head.getAs[Boolean]("drift_alarm"))
    // poisoned: enormous documents (quality features shift hard) built
    // from a DIFFERENT base text - a near-dup of batch 0's admitted doc
    // would (correctly) die in the dedup stage and leave nothing to test
    val base = "colorless green ideas sleep furiously while the data of " +
      "the pipeline grows and grows in a stream of tokens"
    val big = (base + " ") * 200 + "tail"
    val poisoned = run(Seq(doc(10L, big), doc(11L, big + " z"),
      doc(12L, big + " w q"), doc(13L, big + " r s t")), 1L, dirs)
    assert(poisoned.head.getAs[Boolean]("drift_alarm"),
      "a 200x length shift must trip the z-alarm")
  }

  test("replaying a batch re-derives summary and corpus bit-identically") {
    val dirs = fixture()
    run(Seq(doc(1L, enText)), 0L, dirs)
    val novel = "a tale of two cities is the best story in the world and the author knew it"
    val first = run(Seq(doc(2L, novel), doc(3L, enText + " x")), 1L, dirs).collect().toSeq
    val corpusFirst = spark.read.parquet(dirs._3).collect().map(_.toString).sorted.toSeq
    // replay batch 1 (same data): every ledger underneath overwrites its
    // own partition; summary and corpus must not change
    val replay = run(Seq(doc(2L, novel), doc(3L, enText + " x")), 1L, dirs).collect().toSeq
    val corpusReplay = spark.read.parquet(dirs._3).collect().map(_.toString).sorted.toSeq
    assert(replay == first)
    assert(corpusReplay == corpusFirst)
  }

  test("attached stream: the composition runs per micro-batch through foreachBatch") {
    val dirs = fixture()
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val q = StreamingCorpus.attach(
      mem.toDF().toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", checks,
      budgets = Map.empty, defaultBudget = 1000000L,
      dirs._1, dirs._2, dirs._3, dirs._4, tmpDir("scorpus-ckpt"))
    try {
      mem.addData(doc(1L, enText), doc(2L, "the a"))
      q.processAllAvailable()
      mem.addData(doc(3L, enText)) // duplicate of batch 0's admitted doc
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(dirs._4).orderBy("batch_id")
      .select("batch_id", "n_arrived", "n_unique", "n_admitted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((0L, 2L, 1L, 1L), (1L, 1L, 0L, 0L)))
  }
}
