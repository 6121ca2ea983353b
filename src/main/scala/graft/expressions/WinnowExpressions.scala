package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint set (Schleimer et al. 2003) as ONE codegen'd
  * per-row expression.
  *
  * Value-identical to the relational construction the DuckDB oracle uses —
  * md5 over character k-grams, `min(h) OVER (ROWS BETWEEN CURRENT ROW AND
  * w-1 FOLLOWING)`, complete windows only (a document shorter than one
  * window keeps its single global min), distinct, sorted — but evaluated
  * as a local loop:
  *
  *   - The relational form explodes |text| rows per document and runs TWO
  *     windows over the exploded frame (a full-partition count + the
  *     ROWS-frame min), i.e. a shuffle and sort of a frame |text|× the
  *     corpus. At 100 TB the exploded frame is the whole job.
  *   - Here each row computes its gram digests and a w-wide sliding
  *     minimum in place: no explode, no exchange, no sort. The digest
  *     minima are tracked on raw 16-byte digests (hex order == unsigned
  *     byte order) and hex-encoded once.
  *
  * Character semantics: grams are code-point based (`substringSQL`), the
  * same indexing DuckDB's `substr` uses, so multi-byte text fingerprints
  * identically on both engines.
  *
  * NULL when the input text is NULL or shorter than k characters (the
  * relational form simply has no gram rows there — callers filter nulls
  * to reproduce that absence).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"WinnowFingerprint needs k>=1, w>=1 (got k=$k, w=$w)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def nullSafeEval(text: Any): Any =
    WinnowImpl.eval(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val r = ctx.freshName("fps")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.WinnowImpl.eval($t, $k, $w);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Static helper (separate object so the generated-code call isn't
  * shadowed by the case class's inherited `eval(InternalRow)`). */
object WinnowImpl {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Returns the sorted distinct window-min digests as hex strings, or
    * null when the text has no k-gram (numChars < k). */
  def eval(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    // One pass to index code-point byte offsets: gram i is the byte range
    // [off(i), off(i+k)). (substringSQL per gram would rescan from the
    // start of the string each call — O(|text|²) per document.)
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
    val md = md5.get()
    val digests = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      digests(i) = md.digest()
      i += 1
    }
    // complete windows only: positions 0..max(n-w, 0); a short document
    // (n <= w) keeps the single global min at position 0
    val maxPos = math.max(n - w, 0)
    val set = new java.util.TreeSet[String]()
    var p = 0
    while (p <= maxPos) {
      var best = digests(p)
      var q = p + 1
      val end = math.min(p + w, n)
      while (q < end) {
        if (unsignedLess(digests(q), best)) best = digests(q)
        q += 1
      }
      set.add(hex(best))
      p += 1
    }
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** Winnowed minimizer (pos, gram) pairs for [[CharMinimizers]]:
    * leftmost window-min per complete window, distinct positions,
    * ascending. Returns null when numChars < k. */
  def minimizers(text: UTF8String, k: Int, w: Int): ArrayData = {
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
    val md = md5.get()
    val digests = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      digests(i) = md.digest()
      i += 1
    }
    val maxPos = math.max(n - w, 0)
    val picked = new java.util.TreeSet[Integer]()
    var p = 0
    while (p <= maxPos) {
      var bestAt = p
      var q = p + 1
      val end = math.min(p + w, n)
      while (q < end) {
        if (unsignedLess(digests(q), digests(bestAt))) bestAt = q
        q += 1
      }
      picked.add(bestAt)
      p += 1
    }
    val out = new Array[AnyRef](picked.size)
    val it = picked.iterator()
    var o = 0
    while (it.hasNext) {
      val at = it.next().intValue()
      val gram = UTF8String.fromBytes(bytes, offs(at), offs(at + k) - offs(at))
      out(o) = org.apache.spark.sql.catalyst.InternalRow(
        Integer.valueOf(at + 1), gram)
      o += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val HEX = "0123456789abcdef".toCharArray
  private def hex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(2 * i) = HEX((d(i) >> 4) & 0xf)
      cs(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(cs)
  }
}

/** Winnowed char-gram MINIMIZERS with their positions — the anchor set
  * of character-granularity exact-substring dedup
  * ([[graft.operators.TextOps.charRunCoverageAnchored]]). Same
  * window-min selection as [[WinnowFingerprint]] (md5 over k-char
  * grams, leftmost min per w-window, complete windows only), but emits
  * `array<struct<pos int, g string>>` — the 1-based char position and
  * the ACTUAL k-char substring of each selected minimizer, so the
  * downstream join keys on content (no hash-collision false anchors)
  * and the span-union fold gets real offsets. Selection is
  * content-determined, so the same substring winnows identically in
  * every document containing it — the winnowing guarantee: any shared
  * run of ≥ k + w − 1 chars shares at least one minimizer. Null when
  * the text has no k-gram. */
case class CharMinimizers(child: Expression, k: Int, w: Int) extends UnaryExpression {
  // w <= k is the merge precondition of charRunCoverageAnchored: consecutive
  // in-run anchors sit <= k apart only then, so the span-union fold keeps one
  // region per shared run. With w > k a single run can split into disjoint
  // regions and under-report coverage beyond the documented w-1 edge slack.
  require(k >= 2 && w >= 1 && w <= k, s"k >= 2, 1 <= w <= k (got k=$k w=$w)")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("g", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_minimizers"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(text: Any): Any =
    WinnowImpl.minimizers(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val r = ctx.freshName("mins")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.WinnowImpl.minimizers($in, $k, $w);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharMinimizers =
    copy(child = newChild)
}

object WinnowExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprint(Bridge.expression(text), k, w))
}
