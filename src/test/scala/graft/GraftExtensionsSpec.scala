package graft

import org.apache.spark.sql.graftbridge.Bridge

/** The SQL door: GraftExtensions' injected functions must resolve for
  * pure-SQL users and agree with the Scala operator surface. Attached to
  * the shared session via Bridge.attachFunctions — the config path
  * (spark.sql.extensions=graft.GraftExtensions) binds at session build,
  * which a shared test JVM can't re-do; both paths register the same
  * (identifier, info, builder) tuples. */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val session = {
    Bridge.attachFunctions(spark, new GraftExtensions)
    spark
  }

  test("injected functions resolve in SQL and agree with the operator surface") {
    val decomposed = "Café" // e + combining acute
    val row = session.sql(
      s"""SELECT
         |  graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
         |               array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos_same,
         |  graft_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
         |            array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS dot,
         |  graft_nfc('$decomposed') AS nfc,
         |  graft_simhash16(array('a', 'b')) AS sh,
         |  graft_deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa') AS dl
         |""".stripMargin).collect().head
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 23.0)
    assert(row.getString(2) == "Caf\u00e9", "combining acute composes to one codepoint")
    import org.apache.spark.sql.functions._
    val viaScala = session.range(1).select(Bridge.column(
      graft.expressions.SimHash16(Bridge.expression(
        array(lit("a"), lit("b"))))).as("sh")).collect().head.getString(0)
    assert(row.getString(3) == viaScala, "SQL and Scala surfaces share one kernel")
    assert(row.getLong(4) > 0 && row.getLong(4) < 24, "repetitive text deflates")
  }

  test("graft_fix_mojibake resolves in SQL: corrupt inverts, clean passes") {
    val moji = graft.codec.CharsetCodec.decodeAs("café ✓".getBytes("UTF-8"), "windows-1252")
    val row = session.sql(
      s"""SELECT graft_fix_mojibake('$moji') AS fixed,
         |  graft_fix_mojibake('plain café') AS clean,
         |  graft_fix_mojibake(CAST(NULL AS STRING)) AS n
         |""".stripMargin).collect().head
    assert(row.getString(0) == "café ✓")
    assert(row.getString(1) == "plain café")
    assert(row.isNullAt(2))
  }

  test("graft_charset_decode resolves in SQL: label + text, unknown verdict") {
    val r = session.sql(
      "SELECT graft_charset_decode(CAST('plain ascii' AS BINARY)) AS d")
      .select("d.charset", "d.text").head
    assert(r.getString(0) == "utf-8" && r.getString(1) == "plain ascii")
    // unlabeled dense CJK bytes CONTENT-DETECT in SQL too; a dense
    // accented-LATIN payload (outside the single-byte sweep's candidate
    // scripts by design) still quarantines
    import spark.implicits._
    val sjis = graft.codec.CharsetCodec.encode("日本語のテスト文書です。東京都渋谷区", "shift_jis")
    val koi8 = graft.codec.CharsetCodec.encode("Příliš žluťoučký kůň úpěl ďábelské ódy", "iso-8859-2")
    Seq((sjis, koi8)).toDF("sj", "ru").createOrReplaceTempView("cs_v")
    val r2 = session.sql(
      "SELECT graft_charset_decode(sj).charset AS a, graft_charset_decode(ru).charset AS b FROM cs_v").head
    assert(r2.getString(0) == "shift_jis")
    assert(r2.getString(1) == "unknown")
  }

  test("graft_gunzip_text resolves in SQL: gzip decodes by magic, plain passes, broken nulls") {
    import spark.implicits._
    val xml = "<loc>https://a.org/p1</loc>"
    val gz = graft.codec.GzipCodec.gzipMember(xml.getBytes("UTF-8"))
    Seq((xml.getBytes("UTF-8"), gz, gz.take(gz.length - 3)))
      .toDF("p", "g", "bad").createOrReplaceTempView("gz_v")
    val r = session.sql(
      "SELECT graft_gunzip_text(p) AS a, graft_gunzip_text(g) AS b, graft_gunzip_text(bad) AS c FROM gz_v").head
    assert(r.getString(0) == xml && r.getString(1) == xml)
    assert(r.isNullAt(2))
  }

  test("graft_hll_bucket_rho resolves in SQL and matches the Scala surface") {
    val row = session.sql(
      "SELECT graft_hll_bucket_rho('doc-body-42').bucket AS b, " +
        "graft_hll_bucket_rho('doc-body-42').rho AS r").collect().head
    import org.apache.spark.sql.functions._
    val viaScala = session.range(1)
      .select(graft.operators.Sketches.hllBucketRhoFast(lit("doc-body-42")).as("br"))
      .select(col("br.bucket"), col("br.rho")).collect().head
    assert(row.getInt(0) === viaScala.getInt(0) && row.getInt(1) === viaScala.getInt(1))
  }

  test("zero-norm cosine is NULL through SQL too") {
    val r = session.sql(
      "SELECT graft_cosine(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c")
      .collect().head
    assert(r.isNullAt(0))
  }

  test("wrong arity fails analysis, not execution") {
    intercept[Exception] {
      session.sql("SELECT graft_cosine(array(CAST(1.0 AS FLOAT)))").collect()
    }
  }
}
