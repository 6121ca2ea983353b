package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pins [[BoundedSortedCollect]]: drop-in equivalence with
  * `slice(sort_array(collect_list(x)), 1, limit)`, bounded buffer memory
  * on a degenerate one-bucket corpus, and the truncation counter. */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  // ---- direct buffer-level: memory is O(limit), not O(group) ----

  test("buffer never holds more than `limit` values through update and merge") {
    val agg = BoundedSortedCollect(BoundReference(0, LongType, nullable = true), 100)
    val buf = agg.createAggregationBuffer()
    val row = new GenericInternalRow(1)
    // descending insert order is the worst case for a naive collect
    var i = 200000L
    while (i > 0) { row.update(0, i); agg.update(buf, row); i -= 1 }
    assert(buf.size == 100)
    assert(buf.dropped == 200000L - 100)

    // serialized partial-buffer size is O(limit) — this is what rides the
    // shuffle; with collect_list it would be ~1.6 MB for this group
    val bytes = agg.serialize(buf)
    assert(bytes.length < 8 * 100 + 128,
      s"serialized buffer should be O(limit), got ${bytes.length} bytes")

    // merge of two full buffers stays bounded and keeps the global minima
    val buf2 = agg.createAggregationBuffer()
    i = 400000L
    while (i > 300000L) { row.update(0, i); agg.update(buf2, row); i -= 1 }
    val merged = agg.merge(buf, agg.deserialize(agg.serialize(buf2)))
    assert(merged.size == 100)
    assert(agg.eval(merged).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == (1L to 100L))
    // invariant: seen == retained + dropped
    assert(merged.dropped == 300000L - 100)
  }

  test("buffer round-trips strings through serialize/deserialize") {
    val agg = BoundedSortedCollect(BoundReference(0, StringType, nullable = true), 3)
    val buf = agg.createAggregationBuffer()
    val row = new GenericInternalRow(1)
    Seq("delta", "alpha", "echo", "bravo", "charlie").foreach { s =>
      row.update(0, UTF8String.fromString(s)); agg.update(buf, row)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSortedArray.map(_.toString).toSeq == Seq("alpha", "bravo", "charlie"))
    assert(back.dropped == 2)
  }

  // ---- DataFrame-level: drop-in equivalence with collect+slice ----

  test("equals slice(sort_array(collect_list)) on a skewed long corpus") {
    // one degenerate bucket ('hot': 5000 members) + long tail, multiple
    // partitions so partial/merge/shuffle paths all run
    val df = ((1 to 5000).map(i => ("hot", i.toLong * 7 % 9973)) ++
      (1 to 500).map(i => (s"k${i % 50}", i.toLong)))
      .toDF("bucket", "id").repartition(8)

    val bounded = df.groupBy("bucket")
      .agg(BoundedCollect.boundedSortedCollect(col("id"), 40).as("ids"))
    val reference = df.groupBy("bucket")
      .agg(slice(sort_array(collect_list(col("id"))), 1, 40).as("ids"))

    val b = bounded.orderBy("bucket").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val r = reference.orderBy("bucket").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(b.toSeq == r.toSeq)
  }

  test("equals slice(sort_array(collect_list)) on strings with NULLs") {
    val df = Seq(("a", "zulu"), ("a", null), ("a", "alpha"), ("a", "mike"),
      ("b", null), ("c", "kilo"), ("c", "kilo"))
      .toDF("g", "v").repartition(5)
    val bounded = df.groupBy("g")
      .agg(BoundedCollect.boundedSortedCollect(col("v"), 2).as("vs"))
    val reference = df.groupBy("g")
      .agg(slice(sort_array(collect_list(col("v"))), 1, 2).as("vs"))
    assert(bounded.orderBy("g").collect().toSeq.map(r => (r.getString(0), r.getSeq[String](1))) ==
      reference.orderBy("g").collect().toSeq.map(r => (r.getString(0), r.getSeq[String](1))))
    // duplicates survive the cap as a multiset
    assert(bounded.filter($"g" === "c").head().getSeq[String](1) == Seq("kilo", "kilo"))
  }

  test("truncation accumulator counts exactly the dropped ids") {
    val acc = spark.sparkContext.longAccumulator("graft.test.dropped")
    val df = (1L to 1000L).map(i => ("only", i)).toDF("bucket", "id").repartition(6)
    val out = df.groupBy("bucket")
      .agg(BoundedCollect.boundedSortedCollect(col("id"), 25, Some(acc)).as("ids"))
      .collect()
    assert(out.head.getSeq[Long](1) == (1L to 25L))
    assert(acc.value == 1000L - 25L)
  }

  // ---- operator-level: the LSH ops still produce identical pairs ----

  test("lshCandidatePairs on a one-bucket degenerate corpus matches the unbounded form") {
    // 60 near-identical docs — every band hash collides, one hot bucket
    val docs = (1 to 60).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "body")
    val acc = spark.sparkContext.longAccumulator("graft.test.lsh_dropped")
    val capped = graft.operators.Dedup
      .lshCandidatePairs(docs, "doc_id", "body", maxBucket = 10, droppedAcc = Some(acc))
      .orderBy("doc_a", "doc_b").collect()
    // cap=10 → pairs only among the 10 smallest ids, per band (4 bands)
    assert(capped.length == 10 * 9 / 2)
    assert(capped.forall(r => r.getLong(0) <= 10 && r.getLong(1) <= 10))
    assert(capped.forall(_.getLong(2) == 4)) // all 4 bands shared
    assert(acc.value == 4L * (60 - 10))      // 50 dropped per band
  }
}
