package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization encode: split a dims-vector into `m` subspaces
  * and store, per subspace, the index of the nearest codebook entry —
  * the billion-vector COMPRESSION tier (m bytes per vector instead of
  * dims×4; 32× at dims=64/m=8, before the SQ8 tier's 4×). Encoding is
  * the write-side cost; the scan side never touches floats again
  * ([[PQADCScore]]).
  *
  * Assignment is argmin of the per-subspace L2 distance, ties to the
  * smallest code. `round4` applies the same 4-decimal HALF_UP lattice
  * to the distances that the cosine expressions use, so a SQL oracle
  * reproduces the argmin (and its ties) bit-for-bit. A null/mismatched
  * vector encodes to NULL (standard null-intolerant unary semantics) —
  * degenerate rows drop out of ADC ranking instead of faking a code.
  *
  * k ≤ 256 (codes are bytes). Codebooks ride into the plan driver-side
  * like the IVF centroid matrices (m × k × dims/m floats — tiny).
  */
case class PQEncode(
    child: Expression,
    codebooks: Seq[Seq[Seq[Float]]],
    round4: Boolean)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(codebooks.nonEmpty, "need at least one subspace")
  require(codebooks.forall(cb => cb.nonEmpty && cb.size <= 256),
    "each subspace needs 1..256 codes")
  private val subDim = codebooks.head.head.length
  require(codebooks.forall(_.forall(_.length == subDim)),
    "all codebook entries must share the subspace dimension")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got $other")
  }

  @transient private lazy val cbArr: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  /** Reference-object entry point for interpreted and generated code. */
  def encode(a: ArrayData): Array[Byte] = {
    val m = cbArr.length
    if (a == null || a.numElements() != m * subDim) return null
    var i = 0
    while (i < a.numElements()) { if (a.isNullAt(i)) return null; i += 1 }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cbArr(j).length) {
        val cent = cbArr(j)(c)
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = a.getFloat(base + t).toDouble - cent(t)
          d += diff * diff
          t += 1
        }
        if (!java.lang.Double.isFinite(d)) return null // NaN element → NULL code
        if (round4)
          d = java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        if (d < bestDist) { bestDist = d; best = c } // strict < keeps smallest code on ties
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PQEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.encode((org.apache.spark.sql.catalyst.util.ArrayData) $c);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PQEncode =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) scan over PQ codes: the query's per-
  * (subspace, code) inner products are precomputed driver-side into a
  * lookup table, so scoring a corpus row is `m` table lookups and adds —
  * no float vector is read, no multiplication runs. This is THE
  * billion-vector scan shape: the scan is bounded by code IO (m bytes a
  * row) and add throughput, and the LUT (m × k doubles) rides in the
  * plan like a broadcast literal.
  *
  * Returns the raw sum of LUT terms (callers round for oracle parity);
  * NULL for null/mis-sized code payloads.
  */
case class PQADCScore(child: Expression, lut: Seq[Seq[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(lut.nonEmpty, "empty LUT")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary PQ codes, got $other")
  }

  @transient private lazy val lutArr: Array[Array[Double]] = lut.map(_.toArray).toArray

  def score(codes: Array[Byte]): Any = {
    if (codes == null || codes.length != lutArr.length) return null
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      val c = codes(j) & 0xff
      if (c >= lutArr(j).length) return null
      s += lutArr(j)(c)
      j += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any = score(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PQADCScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object pqScore_${ev.value} = $ref.score((byte[]) $c);
      |${ev.isNull} = pqScore_${ev.value} == null;
      |${ev.value} = ${ev.isNull} ? -1.0 : ((Double) pqScore_${ev.value}).doubleValue();
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PQADCScore =
    copy(child = newChild)
}

/** The query side of BATCHED ADC: build a query vector's m × k inner-
  * product lookup table as DATA (`array<array<double>>`), instead of a
  * driver-side plan literal. A query SET then carries one LUT per row
  * through a broadcast, and a single corpus scan scores every query
  * ([[PQADCScoreDyn]]) — the retrieval-pipeline shape, where re-planning
  * per query (one literal LUT each) would re-scan the corpus N times.
  *
  * Terms land on the same 4-decimal HALF_UP lattice as [[PQADCScore]]'s
  * driver-built tables, so batch and single-query scores are identical.
  */
case class PQAdcLut(
    child: Expression,
    codebooks: Seq[Seq[Seq[Float]]],
    round4: Boolean)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(codebooks.nonEmpty, "need at least one subspace")
  private val subDim = codebooks.head.head.length
  require(codebooks.forall(_.forall(_.length == subDim)),
    "all codebook entries must share the subspace dimension")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> query vector, got $other")
  }

  @transient private lazy val cbArr: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  def buildLut(q: ArrayData): Any = {
    val m = cbArr.length
    if (q == null || q.numElements() != m * subDim) return null
    var i = 0
    while (i < q.numElements()) { if (q.isNullAt(i)) return null; i += 1 }
    val rows = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      val terms = new Array[Double](cbArr(j).length)
      var c = 0
      while (c < cbArr(j).length) {
        val cent = cbArr(j)(c)
        var d = 0.0
        var t = 0
        while (t < subDim) { d += q.getFloat(base + t).toDouble * cent(t); t += 1 }
        // a NaN/Inf element (embedding-pipeline artifact) must yield a
        // NULL LUT, not a NumberFormatException from BigDecimal inside
        // a codegen'd expression on an executor
        if (!java.lang.Double.isFinite(d)) return null
        terms(c) =
          if (round4)
            java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          else d
        c += 1
      }
      rows(j) = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(terms)
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows)
  }

  override def nullSafeEval(input: Any): Any = buildLut(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcLut", this, classOf[PQAdcLut].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object pqLut_${ev.value} = $ref.buildLut((org.apache.spark.sql.catalyst.util.ArrayData) $c);
      |${ev.isNull} = pqLut_${ev.value} == null;
      |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) pqLut_${ev.value};
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PQAdcLut =
    copy(child = newChild)
}

/** [[PQADCScore]] with the lookup table as a COLUMN (from [[PQAdcLut]])
  * instead of a plan literal: score = Σ_j lut[j][code_j]. One corpus
  * scan serves a whole broadcast query set; same null semantics as the
  * literal form (null/mis-sized codes or table → NULL). */
case class PQADCScoreDyn(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(ArrayType(DoubleType, _), _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary codes, array<array<double>> LUT), got $other")
  }

  def score(codes: Array[Byte], lut: ArrayData): Any = {
    if (codes == null || lut == null || codes.length != lut.numElements()) return null
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      if (lut.isNullAt(j)) return null
      val terms = lut.getArray(j)
      val c = codes(j) & 0xff
      if (c >= terms.numElements()) return null
      s += terms.getDouble(c)
      j += 1
    }
    s
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    score(l.asInstanceOf[Array[Byte]], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcDyn", this, classOf[PQADCScoreDyn].getName)
    nullSafeCodeGen(ctx, ev, (c1, c2) => s"""
      |Object pqDyn_${ev.value} = $ref.score((byte[]) $c1, (org.apache.spark.sql.catalyst.util.ArrayData) $c2);
      |${ev.isNull} = pqDyn_${ev.value} == null;
      |${ev.value} = ${ev.isNull} ? -1.0 : ((Double) pqDyn_${ev.value}).doubleValue();
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PQADCScoreDyn =
    copy(left = newLeft, right = newRight)
}
