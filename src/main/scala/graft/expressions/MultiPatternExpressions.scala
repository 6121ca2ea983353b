package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.MultiPattern

/** Aho-Corasick multi-pattern matching as codegen'd expressions — the
  * columnar form of [[graft.operators.MultiPattern]]'s kernels. The
  * first shipping of the blocklist gate ran `df.rdd.mapPartitions`,
  * which deserializes every row, breaks whole-stage codegen, and drops
  * the scan out of the columnar pipeline — the repo's own doctrine
  * (LangIdMultiExpr, FixMojibakeExpr) says expression-ize the per-row
  * kernel instead; these do, for the operator that runs over EVERY
  * document. The automaton builds once on the driver from the literal
  * pattern list and rides into generated code as a reference object —
  * per-row work is the same O(|text|) scan, now inside the stage. */

/** Per-pattern occurrence counts (all end positions, exact substring
  * semantics; `foldCase` lowercases the text — the pattern list must
  * already be folded by the caller so the two sides agree). Output
  * aligns positionally with `patterns`. */
case class BlocklistCountsExpr(child: Expression, patterns: Seq[String],
                               foldCase: Boolean) extends UnaryExpression {

  @transient private lazy val ac = new MultiPattern.Automaton(patterns.toIndexedSeq)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_blocklist_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(text: Any): Any =
    MultiPatternImpl.counts(ac, text.asInstanceOf[UTF8String], foldCase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("blocklistAc", ac, "java.lang.Object")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.expressions.MultiPatternImpl.counts($acRef, $in, $foldCase);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistCountsExpr =
    copy(child = newChild)
}

/** Leftmost-longest non-overlapping length-preserving redaction:
  * `struct(red: string, n: bigint)` — the masked text and the number of
  * spans masked. */
case class RedactBlocklistExpr(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  @transient private lazy val ac = new MultiPattern.Automaton(patterns.toIndexedSeq)

  override def dataType: DataType = StructType(Seq(
    StructField("red", StringType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_redact_blocklist"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(text: Any): Any =
    MultiPatternImpl.redact(ac, text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("redactAc", ac, "java.lang.Object")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.expressions.MultiPatternImpl.redact($acRef, $in);")
  }

  override protected def withNewChildInternal(newChild: Expression): RedactBlocklistExpr =
    copy(child = newChild)
}

/** Static helpers for the generated code (the LangIdImpl shape). The
  * automaton reference is typed Object in generated Java because the
  * Scala inner-class name (`MultiPattern$Automaton`) is awkward for
  * Janino; the cast happens here once per call. */
object MultiPatternImpl {
  def counts(acObj: Object, text: UTF8String, foldCase: Boolean): ArrayData = {
    val ac = acObj.asInstanceOf[MultiPattern.Automaton]
    val raw = text.toString
    val t = if (foldCase) raw.toLowerCase(java.util.Locale.ROOT) else raw
    ArrayData.toArrayData(ac.countHits(t))
  }

  def redact(acObj: Object, text: UTF8String): InternalRow = {
    val ac = acObj.asInstanceOf[MultiPattern.Automaton]
    val (red, n) = ac.redact(text.toString)
    new GenericInternalRow(Array[Any](UTF8String.fromString(red), n.toLong))
  }
}
