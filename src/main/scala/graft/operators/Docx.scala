package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** DOCX front gate — office documents entering the text funnel next to
  * PDF and HTML ([[graft.codec.DocxCodec]] does the byte work:
  * [[graft.codec.ZipCodec]] container + WordprocessingML walk).
  *
  * Scale posture: identical to [[Pdf]] — pure per-row CPU riding the
  * scan on mapPartitions (the adjudicated heavy-binary-decoder shape),
  * no shuffle introduced, memory O(one document) per task under the
  * codec's 64 MiB input / 32 MiB member caps. At 100 TB the stage
  * parallelizes with the input splits and nothing else. */
object Docx {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("docx_ok", BooleanType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("n_paras", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("creator", StringType, nullable = true)))

  /** Extract text + core-properties sidecar per blob: `(doc_id,
    * docx_ok, verdict, n_paras, text, title, creator)` — one row per
    * input row; undecodable blobs keep their row with `docx_ok =
    * false`, `verdict = corrupt` and null fields (the drop-accounting
    * doctrine). Paragraphs join with '\n' (the
    * [[graft.codec.DocxCodec]] layout rules); absent
    * `docProps/core.xml` surfaces null title/creator on an ok row. */
  def extractText(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        graft.codec.DocxCodec.extract(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(d) => Row(id, true, "ok", d.nParas, d.text,
            d.title.orNull, d.creator.orNull)
          case None => Row(id, false, "corrupt", null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private val pptxSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pptx_ok", BooleanType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("n_slides", IntegerType, nullable = true),
    StructField("n_paras", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("creator", StringType, nullable = true)))

  /** PPTX twin of [[extractText]]: `(doc_id, pptx_ok, verdict,
    * n_slides, n_paras, text, title, creator)` — slides in numeric
    * order, paragraphs joined '\n' within a slide, slides joined '\n'
    * (the [[graft.codec.DocxCodec.extractPptx]] layout rules). Same
    * mapPartitions posture and drop accounting. */
  def extractPptxText(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        graft.codec.DocxCodec.extractPptx(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(d) => Row(id, true, "ok", d.nSlides, d.nParas, d.text,
            d.title.orNull, d.creator.orNull)
          case None => Row(id, false, "corrupt", null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, pptxSchema)
  }

  private val xlsxSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("xlsx_ok", BooleanType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("n_sheets", IntegerType, nullable = true),
    StructField("n_rows", IntegerType, nullable = true),
    StructField("n_cells", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("title", StringType, nullable = true)))

  /** XLSX twin: `(doc_id, xlsx_ok, verdict, n_sheets, n_rows, n_cells,
    * text, title)` — cells '\t', rows and sheets '\n', shared-string
    * indirection resolved (the [[graft.codec.XlsxCodec]] layout
    * rules). Same mapPartitions posture and drop accounting. */
  def extractXlsxText(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        graft.codec.XlsxCodec.extract(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(d) => Row(id, true, "ok", d.nSheets, d.nRows, d.nCells,
            d.text, d.title.orNull)
          case None => Row(id, false, "corrupt", null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, xlsxSchema)
  }

  private val odtSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("odt_ok", BooleanType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("n_paras", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("creator", StringType, nullable = true)))

  /** ODT twin of [[extractText]] ([[graft.codec.OdtCodec]] layout
    * rules: mixed-content paragraph folding). Same mapPartitions
    * posture and drop accounting. */
  def extractOdtText(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        graft.codec.OdtCodec.extract(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(d) => Row(id, true, "ok", d.nParas, d.text,
            d.title.orNull, d.creator.orNull)
          case None => Row(id, false, "corrupt", null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, odtSchema)
  }

  private val SlideRe = "^ppt/slides/slide[0-9]+\\.xml$".r
  private val SheetRe = "^xl/worksheets/sheet[0-9]+\\.xml$".r

  /** Content-aware OPC classifier — the router [[Pdf.sniffKind]]'s
    * magic bytes cannot be: real writers DEFLATE-compress
    * `[Content_Types].xml`, so the docx/pptx/xlsx distinction is not
    * in the first kilobyte — it is in the central directory's member
    * NAMES, which [[graft.codec.ZipCodec.memberNames]] reads with zero
    * payload decompression. `docx` | `pptx` | `xlsx` by the main-part
    * name, `zip` for a readable archive that is none of them,
    * `unreadable` for PK-magic bytes without a walkable directory
    * (truncated downloads — a funnel class, not a silent drop), and
    * `other` for non-PK bytes. */
  def sniffOoxml(blob: Array[Byte]): String = {
    if (blob == null || blob.length < 4 ||
      !(blob(0) == 'P' && blob(1) == 'K' && blob(2) == 3 && blob(3) == 4))
      return "other"
    graft.codec.ZipCodec.memberNames(blob) match {
      case None => "unreadable"
      case Some(names) =>
        if (names.contains("word/document.xml")) "docx"
        else if (names.exists(n => SlideRe.pattern.matcher(n).matches())) "pptx"
        else if (names.exists(n => SheetRe.pattern.matcher(n).matches())) "xlsx"
        else if (names.contains("META-INF/container.xml")) "epub"
        else if (names.contains("content.xml")) "odt"
        else "zip"
    }
  }
}
