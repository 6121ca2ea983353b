package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import Validation._

  test("tableReport: predicate, null-as-violation, and uniqueness counting") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, -3.0), (2L, null), (null, 7.0), (3L, 5.0))
      .toDF("k", "x")
    val rep = tableReport(df, "t", Seq(
      Expect("k_not_null", col("k").isNotNull),
      Expect("x_positive", col("x") > 0), // NULL x must count as violation
      Unique("k_unique", col("k"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rep("k_not_null") == ((5L, 1L, false)))
    assert(rep("x_positive") == ((5L, 2L, false)), "-3.0 and NULL both violate")
    // 5 rows, distinct non-null k = {1,2,3} → count_distinct = 3 → 2 surplus
    assert(rep("k_unique") == ((5L, 2L, false)))
  }

  test("tableReport: all-green table passes every check") {
    import spark.implicits._
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "x")
    val rep = tableReport(df, "t", Seq(
      Expect("k_not_null", col("k").isNotNull),
      Unique("k_unique", col("k"))))
      .collect()
    assert(rep.forall(r => r.getLong(3) == 0L && r.getBoolean(4)))
  }

  test("referentialReport: orphans counted, null child keys are orphans") {
    import spark.implicits._
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq[java.lang.Long](10L, 10L, 30L, null).toDF("fk")
    val r = referentialReport(child, "fk", "child", parent, "pk", "fk_check")
      .collect().head
    assert(r.getString(0) == "fk_check" && r.getString(1) == "child")
    assert(r.getLong(2) == 4L && r.getLong(3) == 2L && !r.getBoolean(4))
  }

  test("suite: unions per-table reports into one frame") {
    import spark.implicits._
    val a = tableReport(Seq(1L).toDF("k"), "a", Seq(Expect("nn", col("k").isNotNull)))
    val b = tableReport(Seq(2L).toDF("k"), "b", Seq(Expect("nn", col("k").isNotNull)))
    val out = suite(Seq(a, b)).collect()
    assert(out.length == 2 && out.map(_.getString(1)).toSet == Set("a", "b"))
  }
}
