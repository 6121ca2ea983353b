package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Set-arithmetic expressions over token-set arrays — the verify-side
  * complements of the prefix/LSH candidate machinery.
  *
  * [[SortedIntersectSize]] computes |a ∩ b| of two SORTED, DISTINCT
  * string arrays by a single allocation-free merge pass. The built-in
  * `size(array_intersect(a, b))` builds a per-row hash set AND
  * materializes the intersection array only to take its length — on an
  * exact-threshold verify that touches millions of candidate pairs the
  * allocation is the bill, not the comparison. The merge needs both
  * inputs ordered by the SAME comparator: Spark's `array_sort` on
  * strings orders by `UTF8String.compareTo` (unsigned byte order), and
  * every caller feeds `array_sort(array_distinct(...))` output (the
  * stored prefix-index `sets/` rows are written in exactly that form,
  * so stored and fresh sides agree). Distinctness makes the equality
  * branch advance both sides, so |∩| equals the built-in's on every
  * input the contract admits. Null ARRAYS yield null (BinaryExpression
  * null-intolerance); null ELEMENTS would violate the callers'
  * tokenizer contract and are counted never-equal (they sort last under
  * array_sort's default ordering and terminate the merge early). */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectImpl.size(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedIntersectImpl.size($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Static helper so generated code makes one static call. */
object SortedIntersectImpl {
  def size(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      // null elements (contract violation) sort last under array_sort;
      // a null can never match, and past it only nulls remain: stop.
      if (a.isNullAt(i) || b.isNullAt(j)) return c
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** Exact Jaccard of two DISTINCT string arrays in ONE per-row pass —
  * the verify-side arithmetic of the LSH family. Replaces
  * `size(array_intersect)/size(array_union)`, which builds two hash
  * sets and materializes two result arrays per candidate pair only to
  * take their lengths. For distinct inputs |∪| = |a| + |b| − |∩|, so
  * one hash-set membership pass suffices; the division is the same
  * IEEE double op as before (bit-identical results, oracle-pinned).
  * Inputs need NOT be sorted. Empty-union (both arrays empty) yields
  * NULL — the `when(union = 0, null)` contract of the old column
  * formula; null arrays yield null. Null elements would violate the
  * shingle contract; they hash like any set member (never equal to a
  * string), keeping the expression total. */
case class JaccardDistinct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = JaccardDistinctImpl.eval(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r < 0.0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.expressions.JaccardDistinctImpl.eval($a, $b);
      if (${ev.value} < 0.0) { ${ev.isNull} = true; ${ev.value} = 0.0; }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardDistinct =
    copy(left = newLeft, right = newRight)
}

/** Static helper; returns −1.0 as the NULL sentinel (Jaccard ∈ [0,1]). */
object JaccardDistinctImpl {
  def eval(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na + nb == 0) return -1.0
    if (na == 0 || nb == 0) return 0.0
    // probe the smaller side's set with the larger side
    val (s, p, ns, np) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      Math.max(4, ns * 2))
    var i = 0
    while (i < ns) { if (!s.isNullAt(i)) set.add(s.getUTF8String(i)); i += 1 }
    var inter = 0L
    var j = 0
    while (j < np) {
      if (!p.isNullAt(j) && set.contains(p.getUTF8String(j))) inter += 1
      j += 1
    }
    inter.toDouble / (na.toLong + nb.toLong - inter).toDouble
  }
}

/** Per-position char k-gram hashes in ONE linear pass —
  * `array<long>` where element i (0-based) equals
  * `xxhash64(substr(text, i+1, k))`, null when the text has fewer than
  * k characters. The column-expression form
  * (`transform(sequence(...), p => substr(t, p, k))`) re-scans the
  * string from byte 0 on EVERY substr call to find the code-point
  * offset — O(|text|²) per document (measured 6.5 s warm for the sf0.1
  * corpus's 1.4M grams; this expression does the same work in one
  * offsets pass + one XXH64 per gram). Hash values are bit-identical
  * to Spark's `xxhash64` over the same substrings (same XXH64, seed
  * 42), so mixed producers keep one key space. */
case class CharGramHashes(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, s"k must be >= 1 (got $k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(text: Any): Any =
    CharGramHashImpl.eval(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val r = ctx.freshName("ghs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.CharGramHashImpl.eval($t, $k);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

object CharGramHashImpl {
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  def eval(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val offs = new Array[Int](bytes.length + 1)
    var chars = 0
    var b = 0
    while (b < bytes.length) {
      offs(chars) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      chars += 1
    }
    offs(chars) = bytes.length
    if (chars < k) return null
    val n = chars - k + 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + offs(i), offs(i + k) - offs(i), 42L)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
