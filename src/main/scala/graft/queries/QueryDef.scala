package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark pipeline plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Conventions that make the hash-compare robust across engines:
  *   - double aggregation goes through `decimal(20,4)` (exact in both Spark
  *     and DuckDB) and is cast back to `double` at the end, so the value is
  *     bit-identical regardless of summation order;
  *   - every ORDER BY ends with a unique key so LIMIT is deterministic;
  *   - aggregate/computed columns are aliased identically on both sides
  *     (the driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Size-gated broadcast: hint only when Catalyst's own size estimate says
    * the side is small. At bench SF the hint avoids AQE's pay-the-map-stage-
    * first SMJ→BHJ conversion; at 100 TB the stats exceed the gate and the
    * plan degrades to a shuffle join instead of OOMing the driver.
    */
  def broadcastIfSmall(df: DataFrame, maxBytes: Long = 64L << 20): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes)
      org.apache.spark.sql.functions.broadcast(df)
    else df

  /** Fan a narrow scan out to the full core count before CPU-dense per-row
    * work (per-gram digests, signature loops). A small single-row-group
    * parquet file is ONE unsplittable task, so without this the hash mill
    * runs on one core while 31 idle. Gated on the actual scan partition
    * count: a production table already arrives in many splits, the gate
    * doesn't fire, and no corpus-wide shuffle is ever introduced.
    */
  def fanOutIfNarrow(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
