package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Text-format ingest with corrupt-record QUARANTINE — the front door of
  * a web-scale corpus pipeline (crawl dumps arrive as JSONL/CSV, and at
  * 100 TB some lines are ALWAYS broken: truncated records, encoding
  * damage, schema drift). The contract: no line is silently dropped —
  * every input line is either a typed row or a quarantined raw line the
  * operator hands back for audit/repair.
  *
  * Implementation deliberately avoids Spark's `_corrupt_record` column:
  * filtering on the internal corrupt column requires caching the whole
  * frame (a documented engine limitation — queries referencing only the
  * corrupt column are rejected, and the workaround is `.cache()`, which
  * a 100 TB read cannot afford). Instead the file is read as plain text
  * and parsed with expressions: `from_json` yields an all-NULL struct
  * for a malformed line (measured, not assumed), so syntactic validity
  * is detected with `try_parse_json IS NULL` — two ordinary filters
  * over a re-scannable text frame, no caching, whole-stage codegen,
  * and the raw line text rides along free on the quarantine side.
  *
  * Schema-drift posture (PERMISSIVE by doctrine): a syntactically valid
  * JSON line with missing fields → row with NULLs (the expectation
  * suite downstream counts them); extra fields → ignored; a type
  * mismatch → NULL field, not a dead line. Only syntactic damage
  * quarantines. CSV has no syntactic-validity oracle, so its
  * quarantine contract is a REQUIRED KEY: a line whose parse cannot
  * produce the declared key column is quarantined. */
object TextSources {

  /** JSONL read: `(good rows under `schema`, quarantine as (line))`.
    * Both frames derive from one text scan each — persist the text
    * frame caller-side if both will be consumed in the same job and
    * the source is remote-expensive. */
  def readJsonlWithQuarantine(spark: SparkSession, path: String,
                              schema: StructType): (DataFrame, DataFrame) = {
    val raw = spark.read.textFile(path).toDF("line")
    val tagged = raw.select(col("line"),
      from_json(col("line"), schema).as("r"),
      try_parse_json(col("line")).isNull.as("_bad"))
    (tagged.filter(!col("_bad")).select(col("r.*")),
      tagged.filter(col("_bad")).select(col("line")))
  }

  /** CSV read (no header handling — headers are a manifest concern, not
    * a data concern at shard scale). A line is quarantined when its
    * parse cannot produce a non-null `requiredCol`. */
  def readCsvWithQuarantine(spark: SparkSession, path: String,
                            schema: StructType, requiredCol: String,
                            delimiter: String = ","): (DataFrame, DataFrame) = {
    val raw = spark.read.textFile(path).toDF("line")
    val tagged = raw.select(col("line"),
      from_csv(col("line"), schema, Map("delimiter" -> delimiter)).as("r"))
    val bad = col("r").isNull || col(s"r.$requiredCol").isNull
    (tagged.filter(!bad).select(col("r.*")),
      tagged.filter(bad).select(col("line")))
  }

  /** Quarantine writer: corrupt lines land beside the ingest output
    * (text format — the lines are by definition not parseable) so the
    * audit trail survives the job. */
  def writeQuarantine(corrupt: DataFrame, dir: String): Unit =
    corrupt.select(col("line")).write.mode("overwrite").text(dir)

  /** Binary-payload quarantine — the charset gate's `unknown` verdict
    * sink ([[graft.codec.CharsetCodec.decode]]: unrecognized label,
    * dense unlabeled multi-byte bytes, or a declared-CJK payload that
    * fails strict validation). The RAW bytes persist with their id so
    * a later decode pass (a new charset table, a better detector) can
    * re-enter them; parquet, not text, because the payloads are by
    * definition not text yet. Splits the decoded frame on the verdict
    * column: (clean rows, quarantined raw rows written to `dir`).
    *
    * The sink ACCUMULATES across invocations (the audit trail is the
    * point): with a non-empty `runId` each run overwrites only its own
    * `run=<id>` partition (replay-idempotent — a retried batch lands on
    * the same partition); with the default empty id the write appends,
    * so a retried batch may duplicate raw rows — callers with replay
    * semantics should pass the batch/run id. Callers should also cache
    * or checkpoint `decoded` before splitting, otherwise the decode
    * lineage evaluates twice (once for the sink, once for the returned
    * clean frame). */
  def splitCharsetQuarantine(decoded: DataFrame, dir: String,
                             charsetCol: String = "charset",
                             runId: String = ""): DataFrame = {
    val bad = decoded.filter(col(charsetCol) === "unknown")
    if (runId.nonEmpty) bad.write.mode("overwrite").parquet(s"$dir/run=$runId")
    else bad.write.mode("append").parquet(dir)
    decoded.filter(col(charsetCol) =!= "unknown")
  }
}
