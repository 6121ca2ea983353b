package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-classifier language ID as ONE codegen'd expression.
  *
  * Semantics are EXACTLY the portable column formula the oracle pins
  * (`Σ_g non-overlapping occurrences of g` per language, argmax with
  * ties to the lexicographically smallest code, all-zero ⇒ "und") — but
  * evaluated in a single per-row pass: one string materialization and
  * ~100 allocation-free indexOf loops, instead of ~100 `replace` calls
  * each copying the text (measured 5× on the sf0.1 corpus). The
  * non-overlapping count (indexOf stepping by the needle's length)
  * matches the `(len(t) - len(replace(t, g))) / len(g)` deletion
  * identity by construction.
  *
  * The input must already be lowercased (`lower(text)`): case folding
  * stays in the engine's own `lower`, which the oracle twins pin, so
  * this expression never has to agree with anyone about Unicode case
  * rules. */
case class LangIdMultiExpr(child: Expression,
                           profiles: Seq[(String, Seq[String])])
  extends UnaryExpression {

  @transient private lazy val sorted = profiles.sortBy(_._1).toArray
  @transient private lazy val langs: Array[UTF8String] =
    sorted.map(p => UTF8String.fromString(p._1))
  @transient private lazy val grams: Array[Array[String]] =
    sorted.map(_._2.toArray)

  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("score", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_langid_multi"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(text: Any): Any =
    LangIdImpl.eval(text.asInstanceOf[UTF8String], langs, grams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val langsRef = ctx.addReferenceObj("langs", langs,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val gramsRef = ctx.addReferenceObj("grams", grams, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.expressions.LangIdImpl.eval($in, $langsRef, $gramsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdMultiExpr =
    copy(child = newChild)
}

/** Static helper (separate object so the generated code's static call
  * isn't shadowed by the case class's inherited `eval`). */
object LangIdImpl {
  private val und = UTF8String.fromString("und")

  def eval(text: UTF8String, langs: Array[UTF8String],
           grams: Array[Array[String]]): InternalRow = {
    val s = text.toString
    var bestScore = 0L
    var bestLang = und
    var i = 0
    while (i < grams.length) {
      val gs = grams(i)
      var sum = 0L
      var j = 0
      while (j < gs.length) {
        val g = gs(j)
        var idx = s.indexOf(g)
        while (idx >= 0) { sum += 1; idx = s.indexOf(g, idx + g.length) }
        j += 1
      }
      // langs are lex-sorted, so strict > pins ties to the smallest code
      if (sum > bestScore) { bestScore = sum; bestLang = langs(i) }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestLang, bestScore))
  }
}

/** Unicode NFC normalization as a codegen'd unary expression — Spark has
  * no built-in normalizer, and a Scala UDF would break whole-stage
  * codegen in the middle of the text-cleaning chain. Delegates to
  * `java.text.Normalizer` (the JDK's ICU-derived tables); the DuckDB
  * oracle twin is `nfc_normalize`. Already-normalized strings (the
  * overwhelming majority of real text — `isNormalized`'s quick-check
  * pass is O(n) with no allocation) are returned as-is, so the copy is
  * paid only on rows that actually decompose. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    TextNormImpl.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.TextNormImpl.nfc($t)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextNormImpl {
  def nfc(t: UTF8String): UTF8String = {
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def fixMojibake(t: UTF8String): UTF8String = {
    // ASCII fast path on the raw bytes — no String materialization for
    // the overwhelmingly common clean row
    val n = t.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if ((t.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) t
    else {
      val (fixed, was) = graft.codec.CharsetCodec.fixMojibake(t.toString)
      if (was) UTF8String.fromString(fixed) else t
    }
  }
}

/** Mojibake repair as a native expression ([[TextNormImpl.fixMojibake]]
  * → [[graft.codec.CharsetCodec.fixMojibake]]): UTF-8-read-as-cp1252
  * text inverts deterministically, clean text passes through — with an
  * ASCII fast path on the raw UTF8String bytes so the common clean row
  * never materializes a java String. Codegen'd static call, which
  * keeps the repair inside the scan's whole-stage pipeline (the
  * mapPartitions form broke the row batch). */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_fix_mojibake"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    TextNormImpl.fixMojibake(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.TextNormImpl.fixMojibake($t)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibakeExpr =
    copy(child = newChild)
}

/** Deflate-compressed byte length of a string — the compression-ratio
  * quality signal (Gopher/RefinedWeb lineage: highly repetitive text
  * compresses far below natural prose, random/binary soup doesn't
  * compress at all). The signal is the LENGTH only; compressed bytes are
  * never materialized into a column. Deterministic for a fixed input on
  * a fixed zlib level (level 6, the java.util.zip default); no SQL
  * engine exposes deflate, so consumers are rows-only + spec-pinned.
  * Codegen'd static call; a fresh Deflater per row is allocation-heavy
  * in principle but the buffer is thread-confined and the cost is
  * dominated by the deflate loop itself. */
case class DeflateLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_deflate_length"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    DeflateImpl.length(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.DeflateImpl.length($t)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object DeflateImpl {
  def length(t: UTF8String): Long = {
    val bytes = t.getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
