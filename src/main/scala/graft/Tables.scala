package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-supplied parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under the given scale-factor dir. All reads go
  * through here so every query benefits from the same conventions: plain
  * `spark.read.parquet` (columnar scan, predicate pushdown + column pruning
  * handled by Catalyst — verified via `.explain` in the specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` two ways across testdata generations:
    * TIMESTAMP(NANOS) — which Spark 4 rejects by default
    * ([PARQUET_TYPE_ILLEGAL]) and reads as Long under the nanosAsLong flag,
    * needing a ns→us truncation to match DuckDB's read — and plain
    * timestamp[us], which needs nothing. Dispatch on the loaded type so the
    * loader survives either generation; downstream always sees a
    * microsecond-precision timestamp column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Session tz is pinned to UTC, so NTZ→LTZ is value-preserving; it
        // restores the TIMESTAMP type downstream code (unix_micros,
        // cast-to-bigint epoch math) was written against.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
