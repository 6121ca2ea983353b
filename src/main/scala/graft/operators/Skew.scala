package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (the 100 TB posture: one hot key — a burned
  * address, an empty-string token, a zero asset id — must not pin a whole
  * stage on one task).
  *
  * First line of defense is AQE's skew-join splitting (enabled in the
  * session configs); these helpers cover the cases AQE doesn't:
  * deterministic protection decided at plan time, and aggregation skew
  * (AQE only splits join partitions).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a salt in [0, factor);
    * the small side is replicated `factor`× so every (key, salt) pair
    * still matches. One hot key's rows spread over `factor` tasks at the
    * cost of `factor`× the small side — only ever salt a join whose build
    * side is broadcast-small or dimension-sized.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // Deterministic per row content + position: hot keys have identical
    // key columns but differing payloads, so hashing the whole row spreads
    // them; identical full duplicates still collide, which only matters if
    // the skew IS full-row duplication (then dedup first).
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*), spark_partition_id(),
        monotonically_increasing_id()), lit(factor)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (keys ++ salt), final aggregate on keys. Pass the same
    * aggregation twice — `partial` computes per-salt pieces, `combine`
    * folds the pieces (e.g. count → sum of counts).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], factor: Int,
                partial: Seq[Column], combine: Seq[Column]): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*), spark_partition_id(),
        monotonically_increasing_id()), lit(factor)).cast("int"))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }
}
