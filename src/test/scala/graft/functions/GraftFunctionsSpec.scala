package graft.functions

import graft.{Fixtures, SparkSpec}
import graft.codec.{BlockCodec, CanonicalJson, Codecs, TxnId}

/** The G-family functions through the SQL surface (registered UDFs). */
class GraftFunctionsSpec extends SparkSpec {

  test("registered functions work from spark.sql") {
    GraftFunctions.register(spark)
    val pk = Array.fill(32)(3.toByte)
    val addr = Codecs.addressEncode(pk)

    val row = spark.sql(
      s"""SELECT
         |  graft_address_encode(graft_address_decode('$addr')) AS addr_rt,
         |  graft_page_token(7, 3) AS tok,
         |  graft_page_token_round(graft_page_token(7, 3)) AS tok_round,
         |  graft_page_token_intra(graft_page_token(7, 3)) AS tok_intra,
         |  graft_box_key_app(graft_box_key(42, encode('b1', 'UTF-8'))) AS box_app,
         |  graft_printable('ok name') AS printable,
         |  graft_typeenum('axfer') AS te,
         |  graft_typeenum_name(6) AS ten
         |""".stripMargin).head()

    assert(row.getAs[String]("addr_rt") == addr)
    assert(row.getAs[String]("tok") == Codecs.pageTokenEncode(7, 3))
    assert(row.getAs[Long]("tok_round") == 7 && row.getAs[Long]("tok_intra") == 3)
    assert(row.getAs[Long]("box_app") == 42)
    assert(row.getAs[String]("printable") == "ok name")
    assert(row.getAs[Int]("te") == 4 && row.getAs[String]("ten") == "appl")
  }

  test("graft_txid and graft_count_inner over stored txn documents") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val stxn = Fixtures.applWithInners(Fixtures.A, 77)
    val txnDoc = CanonicalJson.render(BlockCodec.signedTxnToJson(stxn))
    val bareTxn = CanonicalJson.render(BlockCodec.txnToJson(stxn.txn))
    val df = Seq((txnDoc, bareTxn)).toDF("stxn", "txn")
    df.createOrReplaceTempView("txdocs")
    val row = spark.sql(
      "SELECT graft_txid(txn) AS id, graft_count_inner(stxn) AS n FROM txdocs").head()
    assert(row.getAs[String]("id") == TxnId.compute(stxn.txn))
    assert(row.getAs[Int]("n") == 3)
  }
}
