package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks — the validation gate a pipeline runs
  * before (and after) every ingest/transform stage: declared
  * expectations over a table, one violation-count report row per check
  * (the Great-Expectations / dbt-test shape, re-expressed as Spark
  * aggregates).
  *
  * Scale shape: ALL of a table's row-level expectations fold into ONE
  * aggregate over ONE scan — k checks cost one pass, not k (each check
  * is a conditional sum riding the same partial aggregation; a hot
  * table's checks collapse map-side). Uniqueness rides the same pass as
  * a count_distinct. Referential checks are one left join + conditional
  * count each — no broadcast hint, the parent side of a 100 TB child
  * table is rarely small (AQE picks the join). The report output is one
  * row per check — driver-size by construction.
  *
  * Null semantics: a NULL predicate is a VIOLATION (ANSI three-valued
  * logic would silently pass NULLs through `x BETWEEN a AND b`; an
  * expectation that can't evaluate has failed — the not-null check is
  * then just `col.isNotNull` with no special casing).
  */
object Validation {

  sealed trait Check { def name: String }

  /** Row-level predicate expectation: a row violates when the predicate
    * is false OR null. */
  final case class Expect(name: String, predicate: Column) extends Check

  /** Column-uniqueness expectation: violations = n_rows − n_distinct
    * (the number of surplus rows occupying an already-taken key). */
  final case class Unique(name: String, column: Column) extends Check

  /** Expectation report for one table: `(check_name, tbl, n_rows,
    * n_violations, pass)` — one row per check, one scan total. */
  def tableReport(df: DataFrame, tbl: String, checks: Seq[Check]): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("n_rows") +: checks.map {
      case Expect(n, p) =>
        sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"v_$n")
      case Unique(n, c) =>
        (count(lit(1)) - count_distinct(c)).cast("long").as(s"v_$n")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = checks.map(c =>
      struct(lit(c.name).as("check_name"),
        coalesce(col(s"v_${c.name}"), lit(0L)).as("n_violations")))
    one.select(col("n_rows"), explode(array(pairs: _*)).as("p"))
      .select(col("p.check_name").as("check_name"), lit(tbl).as("tbl"),
        col("n_rows"), col("p.n_violations").as("n_violations"),
        (col("p.n_violations") === 0L).as("pass"))
  }

  /** Referential-integrity expectation: count of child rows whose key
    * value has no match in the parent key set (NULL child keys are
    * orphans too — a foreign key that can't resolve is a violation,
    * consistent with the null doctrine above). One left join + one
    * conditional count; the parent side is reduced to its distinct keys
    * first so the join carries no payload. */
  def referentialReport(child: DataFrame, childKey: String, childTbl: String,
                        parent: DataFrame, parentKey: String,
                        checkName: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("_pk")).distinct()
      .withColumn("_present", lit(true))
    child.select(col(childKey).as("_ck"))
      .join(keys, col("_ck") === col("_pk"), "left_outer")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(when(coalesce(col("_present"), lit(false)), 0L).otherwise(1L))
          .as("n_violations"))
      .select(lit(checkName).as("check_name"), lit(childTbl).as("tbl"),
        col("n_rows"), coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("pass"))
  }

  /** Union of per-table reports into one expectation suite result. */
  def suite(reports: Seq[DataFrame]): DataFrame =
    reports.reduceLeft(_.unionByName(_))
}
