package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF front gate — lets `application/pdf` payloads enter the text
  * funnel next to HTML instead of quarantining
  * ([[graft.codec.PdfCodec]] does the byte work).
  *
  * Scale posture: extraction is pure per-row CPU riding the scan on
  * mapPartitions — the adjudicated heavy-decoder shape
  * ([[Multimodal.dHash64]]): codec work dominates serde, no shuffle is
  * introduced, memory is O(one document) per task with the codec's own
  * 64 MiB input / 32 MiB stream caps bounding hostile blobs. At 100 TB
  * the stage parallelizes with the input splits and nothing else. */
object Pdf {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pdf_ok", BooleanType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("n_pages", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** Extract text per blob: `(doc_id, pdf_ok, verdict, n_pages, text)`
    * — one row per input row; undecodable blobs keep their row with
    * `pdf_ok = false` and null pages/text so funnel accounting stays
    * observable (the HttpCodec drop-accounting doctrine: a gate must
    * say what it dropped, not vanish it). `verdict` names the drop
    * class: `ok` (text recovered), `encrypted` (the trailer carries
    * /Encrypt — streams are ciphertext, and a success-with-empty-text
    * row here would launder an unreadable document into a legitimate
    * zero-token one), `corrupt` (not parseable as a PDF at all). Page
    * texts join with '\n' (the [[graft.codec.PdfCodec]] layout
    * rules). */
  def extractText(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val blob = r.getAs[Array[Byte]](blobIdx)
        graft.codec.PdfCodec.extract(blob) match {
          case Some(d) if d.encrypted => Row(id, false, "encrypted", null, null)
          case Some(d) => Row(id, true, "ok", d.nPages, d.text)
          case None => Row(id, false, "corrupt", null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private val metaSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pdf_ok", BooleanType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("n_pages", IntegerType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("author", StringType, nullable = true)))

  /** Document-information extraction: `(doc_id, pdf_ok, verdict,
    * n_pages, title, author)` from the /Info dictionary
    * (UTF-16BE-with-BOM and PDFDocEncoding text strings both decode)
    * — the sidecar fields a corpus pipeline keys provenance and dedup
    * heuristics on. Encrypted documents surface `verdict=encrypted`
    * with null fields (the /Info strings are ciphertext too). Same
    * mapPartitions posture as [[extractText]]. */
  def extractMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        graft.codec.PdfCodec.extract(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(d) if d.encrypted => Row(id, false, "encrypted", null, null, null)
          case Some(d) => Row(id, true, "ok", d.nPages,
            d.info.get("Title").orNull, d.info.get("Author").orNull)
          case None => Row(id, false, "corrupt", null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, metaSchema)
  }

  /** Magic-byte router for a mixed payload column: 'pdf' when the
    * first kilobyte carries the `%PDF-` header (the spec allows a
    * preamble), 'docx' on the ZIP local-header magic (`PK`)
    * with the OPC `[Content_Types].xml` token in the sniff window (the
    * first member of every real OOXML writer's archive), 'zip' on the
    * magic alone (some other archive), 'rtf' on the `{\rtf` opener
    * (RTF is plain bytes — the magic IS text), 'html' on an
    * angle-bracket start, 'other' otherwise — codegen-friendly (pure
    * Column ops, no UDF). */
  def sniffKind(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = substring(blob, 1, 1024).cast("string")
    val pkMagic = substring(blob, 1, 4) === lit(Array[Byte]('P', 'K', 3, 4))
    when(head.contains("%PDF-"), "pdf")
      .when(pkMagic && head.contains("[Content_Types].xml"), "docx")
      .when(pkMagic, "zip")
      .when(substring(blob, 1, 8) === lit(Array[Byte](0xD0.toByte, 0xCF.toByte,
        0x11.toByte, 0xE0.toByte, 0xA1.toByte, 0xB1.toByte, 0x1A.toByte,
        0xE1.toByte)), "ole2")
      .when(head.startsWith("{\\rtf"), "rtf")
      .when(ltrim(head).startsWith("<"), "html")
      .otherwise("other")
  }
}
