package graft.expressions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The codegen'd winnowing expression against the relational reference
  * construction (posexplode char-k-grams → md5 → ROWS-frame window min →
  * distinct/sort): identical fingerprint sets on random text including
  * multi-byte code points, and the same absent-row contract on short/NULL
  * documents. */
class WinnowFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8
  private val w = 4

  /** The pre-expression relational form, kept as executable spec. */
  private def referenceWinnow(df: org.apache.spark.sql.DataFrame) = {
    val hashes = df.select(col("doc_id").as("doc"),
      posexplode(TextOps.charShingles(col("text"), k)).as(Seq("pos", "s")))
      .select(col("doc"), col("pos"), md5(col("s")).as("h"))
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    hashes
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc")))
      .withColumn("wmin", min("h").over(frame))
      .filter(col("pos") <= greatest(col("_n") - w, lit(0)))
      .groupBy("doc")
      .agg(array_sort(array_distinct(collect_list("wmin"))).as("fingerprints"))
  }

  private def randomCorpus(rows: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(23)
    val alphabet = "abcdefg HIJK0123√消😀"
    (0 until rows).map { i =>
      val len = rnd.nextInt(60) // includes < k chars edges
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
  }

  test("expression fingerprints == relational-form fingerprints") {
    val df = randomCorpus(300)
    val got = TextOps.winnowingFingerprints(df, "doc_id", "text", k, w)
    val want = referenceWinnow(df)
    assert(got.count() == want.count())
    val joined = got.alias("g").join(want.alias("w"), col("g.doc") === col("w.doc"))
      .filter(!(col("g.fingerprints") <=> col("w.fingerprints")))
    assert(joined.count() == 0)
  }

  test("short and NULL documents are absent; exact value on a known text") {
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, "short"),                  // < k chars
      (3L, "exactly8"),               // one gram ⇒ one fingerprint
      (4L, "0123456789ab")            // 5 grams, window 4 ⇒ positions 0..1
    ).toDF("doc_id", "text")
    val rows = TextOps.winnowingFingerprints(df, "doc_id", "text", k, w)
      .orderBy("doc").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(0).getSeq[String](1) == Seq(h("exactly8")))
    val grams = (0 until 5).map(i => h("0123456789ab".substring(i, i + 8)))
    val want = Seq(grams.slice(0, 4).min, grams.slice(1, 5).min).distinct.sorted
    assert(rows(1).getSeq[String](1) == want)
  }
}
