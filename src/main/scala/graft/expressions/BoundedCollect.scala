package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.util.LongAccumulator

/** Aggregation buffer for [[BoundedSortedCollect]]: the `limit` smallest
  * values seen so far, held in a max-heap so insert against a full buffer
  * is O(log limit) and peak memory is O(limit) — never O(group).
  *
  * `dropped` counts every value that did NOT survive (rejected on arrival
  * or evicted later); the invariant `seen == retained + dropped` holds
  * through update AND merge, so the final buffer knows exactly how much
  * the cap truncated.
  */
final class BoundedTopN(val limit: Int, ord: Ordering[Any]) {
  // head of the reversed-order queue = LARGEST retained value (next victim)
  private val heap =
    new java.util.PriorityQueue[AnyRef](math.min(limit, 16).max(1),
      ord.reverse.asInstanceOf[java.util.Comparator[AnyRef]])
  var dropped: Long = 0L

  def size: Int = heap.size

  /** Insert a value the buffer may keep or count as dropped. The caller
    * must pass an owned copy (see InternalRow.copyValue) — retained values
    * live across input rows. */
  def insert(v: Any): Unit = {
    val ref = v.asInstanceOf[AnyRef]
    if (heap.size < limit) { heap.add(ref); () }
    else if (ord.lt(ref, heap.peek())) { heap.poll(); heap.add(ref); dropped += 1 }
    else dropped += 1
  }

  /** Retained values ascending (the `slice(sort_array(...), 1, limit)`
    * contract). */
  def toSortedArray: Array[Any] = {
    val a = heap.toArray
    java.util.Arrays.sort(a, ord.asInstanceOf[java.util.Comparator[AnyRef]])
    a.asInstanceOf[Array[Any]]
  }

  def foreachRetained(f: Any => Unit): Unit = {
    val it = heap.iterator()
    while (it.hasNext) f(it.next())
  }
}

/** `collect_list` bounded to the `limit` SMALLEST values, sorted ascending
  * — a drop-in for `slice(sort_array(collect_list(x)), 1, limit)` whose
  * aggregation buffer is O(limit) at every stage (partial, shuffle,
  * merge, final) instead of O(group).
  *
  * Why it exists: LSH bucket capping ([[graft.operators.Dedup]],
  * [[graft.operators.Similarity]]) bounds pair WORK at O(limit²), but the
  * collect+slice form still concatenates the whole hot bucket into one
  * aggregation buffer before the slice drops it — an LLM corpus with 100M
  * boilerplate near-identical documents in one bucket means a multi-GB
  * single-task buffer and an executor OOM. This aggregate never holds more
  * than `limit` values, so a degenerate bucket costs memory O(limit) and
  * time O(bucket × log limit).
  *
  * NULL inputs are skipped (collect_list semantics); a group with no
  * non-NULL input yields an empty array. Result order and multiset
  * contents are identical to the collect+slice form (ties keep an
  * arbitrary copy among equal values — indistinguishable after sorting).
  *
  * `droppedAcc`: optional accumulator surfacing the total number of values
  * truncated away by the cap (summed over all groups), so callers can see
  * that — and how hard — the cap fired instead of silently losing pairs.
  * Incremented once per group at final eval; task retries can overcount
  * (standard accumulator caveat) — it is a truncation telemetry signal,
  * not an exact metric.
  */
case class BoundedSortedCollect(
    child: Expression,
    limit: Int,
    droppedAcc: Option[LongAccumulator] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopN] with UnaryLike[Expression] {

  require(limit >= 1, s"$prettyName needs limit >= 1 (got $limit)")

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def prettyName: String = "graft_bounded_sorted_collect"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def createAggregationBuffer(): BoundedTopN = new BoundedTopN(limit, ord)

  override def update(buffer: BoundedTopN, input: InternalRow): BoundedTopN = {
    val v = child.eval(input)
    // copy: unsafe-row-backed values (UTF8String, arrays) are reused
    // across input rows; retained values must own their bytes
    if (v != null) buffer.insert(InternalRow.copyValue(v))
    buffer
  }

  override def merge(buffer: BoundedTopN, other: BoundedTopN): BoundedTopN = {
    other.foreachRetained(buffer.insert)
    buffer.dropped += other.dropped
    buffer
  }

  override def eval(buffer: BoundedTopN): Any = {
    droppedAcc.foreach { acc => if (buffer.dropped > 0) acc.add(buffer.dropped) }
    new GenericArrayData(buffer.toSortedArray)
  }

  // Shuffle format: (retained array, dropped count) as one UnsafeRow —
  // the same projection trick Spark's own Collect uses, plus the count.
  @transient private lazy val serProjection =
    UnsafeProjection.create(
      Array[DataType](ArrayType(child.dataType, containsNull = false), LongType))

  override def serialize(buffer: BoundedTopN): Array[Byte] =
    serProjection.apply(
      InternalRow(new GenericArrayData(buffer.toSortedArray), buffer.dropped)).getBytes

  override def deserialize(bytes: Array[Byte]): BoundedTopN = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    row.getArray(0).foreach(child.dataType,
      (_, v) => if (v != null) buf.insert(InternalRow.copyValue(v)))
    buf.dropped += row.getLong(1)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSortedCollect =
    copy(child = newChild)
}

object BoundedCollect {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: the `limit` smallest non-NULL values of `c`, ascending. */
  def boundedSortedCollect(c: Column, limit: Int,
                           droppedAcc: Option[LongAccumulator] = None): Column =
    Bridge.column(
      BoundedSortedCollect(Bridge.expression(c), limit, droppedAcc)
        .toAggregateExpression())
}
