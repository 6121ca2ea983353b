package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway: (a) a projected from_json does NOT survive stacked filters
  * as one parse (pushdown re-inlines the alias per reference); (b) a
  * single exists(array(from_json), λ) conjunct carries exactly one
  * from_json through optimization; (c) all-string struct fields coerce
  * JSON numbers to their literal text and objects to JSON text, matching
  * get_json_object's string-out contract. */
object JsonParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("jsonprobe").toString
    (0 until 100).map(i => (i.toLong,
      s"""{"msig":{"thr":2},"txn":{"amt":$i,"rekey":"r$i","aamt":"${i * 7}"},"dt":{"ca":${i % 5}}}"""))
      .toDF("round", "txn").write.mode("overwrite").parquet(dir)

    val schema = StructType(Seq(
      StructField("msig", StringType),
      StructField("txn", StructType(Seq(
        StructField("amt", StringType), StructField("rekey", StringType),
        StructField("aamt", StringType)))),
      StructField("dt", StructType(Seq(StructField("ca", StringType))))))

    def run(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val opt = df.queryExecution.optimizedPlan.toString
      println(s"$label: optimized from_json count = ${"from_json".r.findAllIn(opt).size}, rows = ${df.count()}")
    }

    // (a) naive: withColumn + stacked filters
    val base = spark.read.parquet(dir)
    var naive = base.withColumn("_jb", from_json(col("txn"), schema))
    naive = naive.filter(col("_jb.txn.amt").cast("long") > 10)
    naive = naive.filter(coalesce(col("_jb.txn.amt").cast("long"), lit(0L)) +
      coalesce(col("_jb.dt.ca").cast("long"), lit(0L)) < 90)
    naive = naive.filter(col("_jb.txn.rekey").isNotNull)
    naive = naive.filter(col("_jb.msig").isNotNull)
    naive = naive.filter(col("_jb.txn.aamt").cast("decimal(20,0)") > 5)
    run("naive", naive.drop("_jb"))

    // (b) one conjunct sharing a single parse through a 1-element HOF
    val once = base.filter(exists(array(from_json(col("txn"), schema)), b =>
      b.getField("txn").getField("amt").cast("long") > 10 &&
      (coalesce(b.getField("txn").getField("amt").cast("long"), lit(0L)) +
        coalesce(b.getField("dt").getField("ca").cast("long"), lit(0L)) < 90) &&
      b.getField("txn").getField("rekey").isNotNull &&
      b.getField("msig").isNotNull &&
      b.getField("txn").getField("aamt").cast("decimal(20,0)") > 5))
    run("hof-once", once)

    // (c) coercion: number → text, object → JSON text (vs get_json_object)
    val co = base.select(
      from_json(col("txn"), schema).getField("dt").getField("ca").as("ca_fj"),
      get_json_object(col("txn"), "$.dt.ca").as("ca_gjo"),
      from_json(col("txn"), schema).getField("msig").as("msig_fj"),
      get_json_object(col("txn"), "$.msig").as("msig_gjo")).collect()
    val coOk = co.forall(r => r.getString(0) == r.getString(1) && r.getString(2) == r.getString(3))
    println(s"coercion parity with get_json_object: $coOk (sample: ${co.head})")
    spark.stop()
  }
}
