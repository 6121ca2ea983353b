package graft.functions

import graft.codec.{Codecs, TxnId}
import graft.transform.BlockTransforms
import org.apache.spark.sql.SparkSession

/** SQL-facing registry for the G-family scalar functions (SURVEY.md §2.G):
  * after `GraftFunctions.register(spark)` every codec is callable from
  * `spark.sql` / `expr`, e.g.
  * `SELECT graft_address_encode(pk), graft_page_token(round, intra) ...`.
  *
  * These are plain Scala UDFs by design (§7.3): none sit on a bench-scale
  * hot path — the hot paths (base64, md5, timestamps, decimal casts) use
  * Spark built-ins which stay inside whole-stage codegen.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    // G3: Algorand-style address codec
    spark.udf.register("graft_address_encode",
      (pk: Array[Byte]) => Codecs.addressEncode(pk))
    spark.udf.register("graft_address_decode",
      (addr: String) => Codecs.addressDecode(addr))

    // G2: base64url
    spark.udf.register("graft_base64url",
      (b: Array[Byte]) => Codecs.base64Url(b))
    spark.udf.register("graft_base64url_decode",
      (s: String) => Codecs.base64UrlDecode(s))

    // G9: keyset pagination token
    spark.udf.register("graft_page_token",
      (round: Long, intra: Long) => Codecs.pageTokenEncode(round, intra))
    spark.udf.register("graft_page_token_round",
      (tok: String) => Codecs.pageTokenDecode(tok)._1)
    spark.udf.register("graft_page_token_intra",
      (tok: String) => Codecs.pageTokenDecode(tok)._2)

    // G8: box keys
    spark.udf.register("graft_box_key",
      (app: Long, name: Array[Byte]) => Codecs.boxKeyMake(app, name))
    spark.udf.register("graft_box_key_app",
      (key: Array[Byte]) => Codecs.boxKeySplit(key)._1)
    spark.udf.register("graft_box_key_name",
      (key: Array[Byte]) => Codecs.boxKeySplit(key)._2)

    // G5: printable-UTF8-or-empty
    spark.udf.register("graft_printable",
      (s: String) => Codecs.printableUtf8OrEmpty(s))

    // G4: transaction id over the canonical txn document
    spark.udf.register("graft_txid",
      (txnJson: String) => TxnId.compute(
        graft.codec.BlockCodec.txnFromJson(graft.codec.CanonicalJson.parse(txnJson))))

    // G10: enum maps
    spark.udf.register("graft_typeenum",
      (t: String) => Codecs.TypeEnums.getOrElse(t, 0))
    spark.udf.register("graft_typeenum_name",
      (e: Int) => Codecs.TypeEnumNames.getOrElse(e, ""))

    // F3: recursive inner-txn count over a stored txn document
    spark.udf.register("graft_count_inner",
      (txnJson: String) => BlockTransforms.countInner(
        graft.codec.BlockCodec.signedTxnFromJson(graft.codec.CanonicalJson.parse(txnJson))))
  }
}
