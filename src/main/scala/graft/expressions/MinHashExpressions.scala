package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole-signature MinHash as ONE codegen'd expression.
  *
  * Hash family: ONE md5 per shingle (its first 4 bytes, as an unsigned
  * 32-bit base value `h`) fanned out to `k` signature slots through `k`
  * linear permutations
  *
  *   v_i = (a_i * h + b_i) mod P,   P = 2038074743 (prime < 2^31)
  *
  * with `a_i`/`b_i` themselves md5-derived ([[MinHashImpl.coeffs]]) so
  * the whole construction stays self-contained and engine-portable: the
  * DuckDB oracles rebuild it verbatim (md5 + UBIGINT arithmetic — every
  * product is < 2^63, so no overflow on either engine). This is the
  * standard permuted-MinHash design (same shape as Spark ML's
  * MinHashLSH `(1 + elem) * a + b mod prime`), chosen over the earlier
  * min-of-k-md5s family because it does k× less digest work per shingle
  * — at corpus scale the signature pass IS the dedup cost.
  *
  * Evaluated as a single per-row loop:
  *
  *   - The composable form needs `explode(shingles)` + `groupBy(doc).agg(k
  *     × min(…))` — an exchange plus aggregation the per-row loop avoids
  *     entirely: the signature is born narrow, inside whole-stage codegen.
  *   - Per shingle: one digest, k multiply-adds, k running minima.
  *
  * NULL when the input token array is NULL or yields fewer than `n`
  * tokens (mirrors `explode_outer` + `min(NULL)` in the agg form).
  * NULL token elements are skipped inside a shingle, matching
  * `concat_ws`.
  */
case class MinHashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {
  require(n >= 1 && k >= 1, s"MinHashSig needs n>=1, k>=1 (got n=$n, k=$k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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

  /** The permutation modulus: the largest prime below 2^31 used by Spark
    * ML's MinHashLSH. a_i < P and h < 2^32 keep a_i*h + b_i < 2^63. */
  val Prime: Long = 2038074743L

  /** Unsigned 32-bit value of a digest's first 4 bytes. */
  private def head32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** md5-derived permutation coefficients, identical on every engine:
    * a_i = head32(md5("a|i")) mod (P-1) + 1  (never 0),
    * b_i = head32(md5("b|i")) mod P.
    * Oracle SQL inlines the same values (rendered by [[coeffSql]]). */
  def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, kk => {
      val md = md5.get()
      def h32(s: String): Long = {
        md.reset()
        head32(md.digest(s.getBytes("UTF-8")))
      }
      (Array.tabulate(kk)(i => h32(s"a|$i") % (Prime - 1) + 1),
        Array.tabulate(kk)(i => h32(s"b|$i") % Prime))
    })
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** Called from both interpreted eval and generated code. Returns null
    * for "no shingles" (fewer than n tokens). */
  def eval(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return null
    val md = md5.get()
    val (as, bs) = coeffs(k)
    val toks = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) {
      toks(t) = if (tokens.isNullAt(t)) null else tokens.getUTF8String(t).getBytes
      t += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
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
          if (pos > 0) { sh(pos) = ' '.toByte; pos += 1 }
          System.arraycopy(tb, 0, sh, pos, tb.length)
          pos += tb.length
        }
        c += 1
      }
      md.reset()
      val h = head32(md.digest(sh))
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % Prime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def minhashSig(tokens: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(tokens), n, k))
}
