package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{QueryDef, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered query demonstrates one operator from SURVEY.md §2
  * (the name carries the §2 id); `oracleSql` is the DuckDB-equivalent
  * ANSI SQL the driver hash-compares against.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    RelationalQueries.defs ++
      graft.queries.DataPipelineQueries.defs ++
      graft.queries.DedupSimilarityQueries.defs ++
      graft.queries.EngineQueries.defs ++
      graft.queries.WebQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("f1_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(o)) => n -> o }.toMap
}
