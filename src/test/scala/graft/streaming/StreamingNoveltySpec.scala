package graft.streaming

import graft.SparkSpec

/** Pins the drift-monitor contract: novelty decays on a steady source,
  * spikes on a distribution shift, replays are idempotent, and the gram
  * index accretes only novel vocabulary. */
class StreamingNoveltySpec extends SparkSpec {
  import spark.implicits._

  private val steady = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val shifted = "uno dos tres cuatro cinco seis siete ocho nueve diez"

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def report(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect()(0)
    (r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("novelty decays on a steady source, spikes on drift, replays idempotent, index accretes novel only") {
    val idx = tmpDir("snov-idx")

    // batch 0: everything is novel by definition
    val (g0, n0, f0) = report(StreamingNovelty.processBatch(
      docs((1L, steady), (2L, steady)), 0L, "doc_id", "text", idx))
    assert(g0 == 8 && n0 == 8 && f0.contains(1.0), "first batch: 8 distinct 3-grams, all novel")

    // batch 1: same distribution — zero novelty
    val (g1, n1, f1) = report(StreamingNovelty.processBatch(
      docs((3L, steady)), 1L, "doc_id", "text", idx))
    assert(g1 == 8 && n1 == 0 && f1.contains(0.0), "steady source decays to zero novelty")

    // batch 2: half steady, half shifted vocabulary — the drift alarm
    val (g2, n2, f2) = report(StreamingNovelty.processBatch(
      docs((4L, steady), (5L, shifted)), 2L, "doc_id", "text", idx))
    assert(g2 == 16 && n2 == 8 && f2.contains(0.5), "shifted half is wholly novel")

    // replay batch 2: same report, no index double-append
    val (g2b, n2b, f2b) = report(StreamingNovelty.processBatch(
      docs((4L, steady), (5L, shifted)), 2L, "doc_id", "text", idx))
    assert((g2b, n2b, f2b) == ((g2, n2, f2)), "replay must be idempotent")

    // batch 3: the shifted vocabulary is now known
    val (_, n3, f3) = report(StreamingNovelty.processBatch(
      docs((6L, shifted)), 3L, "doc_id", "text", idx))
    assert(n3 == 0 && f3.contains(0.0), "once-seen vocabulary is no longer novel")

    // the index holds exactly the 16 distinct hashed grams, once each
    val grams = spark.read.parquet(s"$idx/grams")
    assert(grams.count() == 16 && grams.select("gh").distinct().count() == 16)

    // empty batch: no grams, NULL fraction (no division by zero)
    val (ge, ne, fe) = report(StreamingNovelty.processBatch(
      docs((7L, "")), 4L, "doc_id", "text", idx))
    assert(ge == 0 && ne == 0 && fe.isEmpty, "empty batch reports NULL novelty")
  }
}
