package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class TextSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING")

  test("jsonl: syntactic damage quarantines; schema drift stays PERMISSIVE") {
    val dir = tmpDir("jsonl-src")
    Seq(
      """{"doc_id": 1, "text": "hello"}""",
      """{"doc_id": 2}""",                              // missing field → NULL text
      """{"doc_id": "NaN?", "text": "typed"}""",        // type mismatch → NULL doc_id
      """TRUNCATED {"doc_id": 4""",                     // corrupt → quarantine
      """{"doc_id": 5, "text": "ok", "extra": true}""", // extra field → ignored
      """not json either""")                            // corrupt → quarantine
      .toDF("line").coalesce(1).write.mode("overwrite").text(dir)

    val (good, corrupt) = TextSources.readJsonlWithQuarantine(spark, dir, schema)
    val g = good.collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(good.count() == 4 && corrupt.count() == 2, "no line silently dropped: 4 + 2 = 6")
    assert(g.contains((Some(2L), None)), "missing field survives with NULL")
    assert(g.contains((None, Some("typed"))), "type mismatch nulls the field, keeps the row")
    assert(g.contains((Some(5L), Some("ok"))), "extra fields ignored")
    val q = corrupt.collect().map(_.getString(0)).toSet
    assert(q == Set("""TRUNCATED {"doc_id": 4""", "not json either"))
  }

  test("csv: lines without the required key quarantine; quarantine writer round-trips") {
    val dir = tmpDir("csv-src")
    Seq("1,alpha", "2,beta", ",missing-key", "garbage-only-one-column-xyz,", "3,gamma")
      .toDF("line").coalesce(1).write.mode("overwrite").text(dir)
    val (good, corrupt) = TextSources.readCsvWithQuarantine(
      spark, dir, schema, requiredCol = "doc_id")
    assert(good.count() == 3 && corrupt.count() == 2)
    assert(good.select(sum("doc_id")).head.getLong(0) == 6L)
    val qdir = tmpDir("csv-quar")
    TextSources.writeQuarantine(corrupt, qdir)
    val back = spark.read.text(qdir).collect().map(_.getString(0)).toSet
    assert(back == Set(",missing-key", "garbage-only-one-column-xyz,"))
  }

  test("charset quarantine: unknown-verdict payloads persist raw, clean rows flow on") {
    import graft.codec.CharsetCodec
    // unlabeled dense LATIN legacy: the accented-Czech page is the one
    // family the single-byte sweep deliberately excludes (a wrong
    // accent map is quieter mojibake than the cp1252 fallback), so it
    // stays unknown — unlabeled CJK and non-Latin single-byte pages
    // now content-detect instead of quarantining (CharsetCodecSpec)
    val rows = Seq(
      (1L, CharsetCodec.encode("clean utf-8 déjà", "utf-8")),
      (2L, CharsetCodec.encode("Příliš žluťoučký kůň úpěl ďábelské ódy", "iso-8859-2")),
      (3L, CharsetCodec.encode("price €9 here – fine", "windows-1252")))
      .toDF("doc_id", "payload")
    val decoded = graft.operators.TextOps.decodeCharset(rows, "payload")
    val qdir = tmpDir("charset-quar")
    val clean = TextSources.splitCharsetQuarantine(decoded, qdir)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val quarantined = spark.read.parquet(qdir)
    assert(quarantined.count() == 1)
    val r = quarantined.head()
    assert(r.getAs[Long]("doc_id") == 2L, "id rides along for re-entry")
    assert(r.getAs[Array[Byte]]("payload").toSeq ==
      CharsetCodec.encode("Příliš žluťoučký kůň úpěl ďábelské ódy", "iso-8859-2").toSeq,
      "raw bytes survive byte-identical for a later decode pass")
  }

  test("charset quarantine sink ACCUMULATES: per-run overwrite is replay-idempotent, runs add up") {
    import graft.codec.CharsetCodec
    // Unlabeled dense accented-Latin: outside the single-byte sweep's
    // candidate scripts by design — stays unknown.
    def frame(id: Long) = Seq((id, CharsetCodec.encode("žluťoučký kůň úpěl ódy ďábelské", "iso-8859-2")))
      .toDF("doc_id", "payload") // dense enough to clear the 16-byte density floor
    val qdir = tmpDir("charset-quar-runs")
    val d1 = graft.operators.TextOps.decodeCharset(frame(1L), "payload")
    TextSources.splitCharsetQuarantine(d1, qdir, runId = "b1")
    TextSources.splitCharsetQuarantine(d1, qdir, runId = "b1") // replay: same run, no duplicate
    val d2 = graft.operators.TextOps.decodeCharset(frame(2L), "payload")
    TextSources.splitCharsetQuarantine(d2, qdir, runId = "b2") // second run accumulates
    val back = spark.read.parquet(qdir)
    assert(d1.filter(col("charset") === "unknown").count() == 1L)
    assert(back.count() == 2L,
      "replayed run overwrote its own partition; distinct runs accumulated")
  }
}
