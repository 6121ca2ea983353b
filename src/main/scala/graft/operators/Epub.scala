package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** EPUB front gate — books entering the text funnel
  * ([[graft.codec.EpubCodec]] does the container work: OCF zip →
  * rootfile → manifest → spine in reading order). The markup→text
  * step deliberately happens DOWNSTREAM through
  * [[TextOps.htmlExtract]] on the exploded chapter rows — the same
  * column every crawled HTML page goes through, so the whole corpus
  * has ONE text-extraction doctrine.
  *
  * Scale posture: per-row CPU riding the scan on mapPartitions (the
  * adjudicated heavy-binary-decoder shape); the chapter EXPLODE is
  * real data growth (a book is many chapters), not an implementation
  * artifact — everything after it is per-row expressions. */
object Epub {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("verdict", StringType, nullable = false),
    StructField("chapter_idx", IntegerType, nullable = true),
    StructField("chapter", StringType, nullable = true),
    StructField("xhtml", StringType, nullable = true),
    StructField("title", StringType, nullable = true)))

  /** Explode each blob into its spine chapters: `(doc_id, verdict,
    * chapter_idx, chapter, xhtml, title)` — one row per chapter in
    * READING order for readable books, ONE `corrupt` row with null
    * chapter fields for unreadable blobs (drop accounting: the funnel
    * counts what it dropped). */
  def chapters(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        graft.codec.EpubCodec.chapters(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(d) =>
            d.chapters.zipWithIndex.map { case ((name, xhtml), i) =>
              Row(id, "ok", i, name, xhtml, d.title.orNull)
            }
          case None => Seq(Row(id, "corrupt", null, null, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
