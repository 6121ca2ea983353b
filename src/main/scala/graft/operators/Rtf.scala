package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** RTF front gate — the legacy word-processor face of the document
  * funnel ([[graft.codec.RtfCodec]] does the byte work: a from-scratch
  * tokenizer over the public RTF grammar).
  *
  * Scale posture: identical to [[Pdf]] and [[Docx]] — pure per-row CPU
  * riding the scan on mapPartitions (the adjudicated
  * heavy-binary-decoder shape), no shuffle introduced, memory O(one
  * document) per task under the codec's 64 MiB input / 4 MiB output
  * caps. At 100 TB the stage parallelizes with the input splits. */
object Rtf {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("rtf_ok", BooleanType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("n_paras", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("author", StringType, nullable = true)))

  /** Extract text + `{\info}` sidecar per blob: `(doc_id, rtf_ok,
    * verdict, n_paras, text, title, author)` — one row per input row;
    * undecodable blobs keep their row with `rtf_ok = false`,
    * `verdict = corrupt` and null fields (the drop-accounting
    * doctrine). Paragraphs join with '\n' (the
    * [[graft.codec.RtfCodec]] layout rules); a document with no
    * `{\info}` block surfaces null title/author on an ok row. */
  def extractText(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        graft.codec.RtfCodec.extract(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(d) => Row(id, true, "ok", d.nParas, d.text,
            d.title.orNull, d.author.orNull)
          case None => Row(id, false, "corrupt", null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
