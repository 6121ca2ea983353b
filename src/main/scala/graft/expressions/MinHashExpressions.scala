package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-signature MinHash as ONE codegen'd expression.
  *
  * Semantics are bit-identical to the composable form
  * `min over word-n-gram shingles of md5(seed ‖ "|" ‖ shingle)` (what the
  * DuckDB oracles replicate), but evaluated as a single per-row loop:
  *
  *   - The composable form needs `explode(shingles)` + `groupBy(doc).agg(k
  *     × min(md5…))`. `min` over a STRING buffer is not HashAggregate-able
  *     (string agg buffers aren't mutable in UnsafeRow), so Spark falls
  *     back to SortAggregate — a full sort of the exploded shingle frame
  *     (|corpus| × |shingles/doc| rows) on both sides of any downstream
  *     self-join. At 100 TB that sort IS the job.
  *   - This expression computes the k digests per shingle and keeps k
  *     running minima in a tight loop: no explode, no sort, no exchange —
  *     the signature is born narrow, inside whole-stage codegen.
  *
  * Hex-string lexicographic order == unsigned byte order of the raw
  * digests (hex is monotone per byte), so minima are tracked on the
  * 16-byte digests and hex-encoded once at the end.
  *
  * NULL when the input token array is NULL or yields fewer than `n`
  * tokens (mirrors `explode_outer` + `min(NULL)` in the agg form).
  * NULL token elements are skipped inside a shingle, matching
  * `concat_ws`.
  */
case class MinHashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {
  require(n >= 1 && k >= 1, s"MinHashSig needs n>=1, k>=1 (got n=$n, k=$k)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got $t")
  }

  override def nullSafeEval(tokens: Any): Any =
    MinHashImpl.eval(tokens.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.MinHashImpl.eval($toks, $n, $k);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Static helper (separate object, NOT the case-class companion: the
  * class's inherited `eval(InternalRow)` would shadow a static forwarder
  * and break the generated-code call). */
object MinHashImpl {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** Seed prefixes "0|", "1|", … are shared across rows; cache per k. */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(i => (i.toString + "|").getBytes("UTF-8")))

  /** Called from both interpreted eval and generated code. Returns null
    * for "no shingles" (fewer than n tokens). */
  def eval(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return null
    val md = md5.get()
    val pfx = prefixes(k)
    val toks = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) {
      toks(t) = if (tokens.isNullAt(t)) null else tokens.getUTF8String(t).getBytes
      t += 1
    }
    val mins = new Array[Array[Byte]](k)
    val space = " ".getBytes("UTF-8")
    var j = 0
    while (j <= m - n) {
      // shingle = tokens[j..j+n-1] joined with ' ' (nulls skipped, concat_ws)
      var len = 0
      var c = 0
      while (c < n) {
        val tb = toks(j + c)
        if (tb != null) len += (if (len > 0) 1 else 0) + tb.length
        c += 1
      }
      val sh = new Array[Byte](len)
      var pos = 0
      c = 0
      while (c < n) {
        val tb = toks(j + c)
        if (tb != null) {
          if (pos > 0) { sh(pos) = space(0); pos += 1 }
          System.arraycopy(tb, 0, sh, pos, tb.length)
          pos += tb.length
        }
        c += 1
      }
      var i = 0
      while (i < k) {
        md.reset()
        md.update(pfx(i))
        md.update(sh)
        val d = md.digest()
        if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
        i += 1
      }
      j += 1
    }
    val out = new Array[AnyRef](k)
    var i = 0
    while (i < k) {
      out(i) = UTF8String.fromString(hex(mins(i)))
      i += 1
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

object MinHashExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def minhashSig(tokens: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(tokens), n, k))
}
