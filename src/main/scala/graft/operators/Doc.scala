package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Legacy `.doc` front gate — the Word-binary face of the document
  * funnel ([[graft.codec.DocCodec]] does the byte work:
  * [[graft.codec.CfbCodec]] container + FIB/piece-table walk).
  *
  * Scale posture: identical to [[Pdf]]/[[Docx]]/[[Rtf]] — pure
  * per-row CPU riding the scan on mapPartitions (the adjudicated
  * heavy-binary-decoder shape), no shuffle introduced, memory O(one
  * document) per task under the codec's caps. At 100 TB the stage
  * parallelizes with the input splits. */
object Doc {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("doc_ok", BooleanType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("n_paras", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("author", StringType, nullable = true)))

  /** Extract text + SummaryInformation sidecar per blob: `(doc_id,
    * doc_ok, verdict, n_paras, text, title, author)` — one row per
    * input row; undecodable blobs keep their row with `doc_ok =
    * false`, `verdict = corrupt` and null fields (the drop-accounting
    * doctrine). Paragraphs join with '\n' (the
    * [[graft.codec.DocCodec]] layout rules). */
  def extractText(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        graft.codec.DocCodec.extract(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(d) => Row(id, true, "ok", d.nParas, d.text,
            d.title.orNull, d.author.orNull)
          case None => Row(id, false, "corrupt", null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
