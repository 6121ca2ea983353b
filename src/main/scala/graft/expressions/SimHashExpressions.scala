package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash of a token array as ONE codegen'd per-row expression.
  *
  * Bit-identical to the relational form (`graft.operators.Dedup.simhash16`
  * oracle): per token, md5 hex chars 1..4 carry 4 bits each
  * (char p = bit p·4‥p·4+3, bit j of digit value v = (v div 2^j) mod 2);
  * tokens vote ±1 per bit and the sign is the fingerprint bit. The
  * relational form explodes |corpus|×|tokens/doc| rows through a
  * 16-aggregate groupBy shuffle; this evaluates the votes in a tight loop
  * per row — the fingerprint is born narrow, no explode, no exchange.
  *
  * A NULL or empty token array yields "0000000000000000" (the agg form's
  * `explode_outer` + zero-vote row), so the expression is never NULL.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    SimHashImpl.eval(if (t == null) null else t.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = graft.expressions.SimHashImpl.eval(
          ${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array as ONE codegen'd per-row expression —
  * the production fingerprint width ([[SimHash16]] is the didactic form;
  * a 16-bit space has 65,536 values and saturates at corpus scale).
  *
  * Same construction, wider: md5 hex chars 1..16 carry 4 bits each
  * (char p, 1-based, = bits (p-1)·4‥(p-1)·4+3; bit j of digit value v =
  * (v div 2^j) mod 2); tokens vote ±1 per bit and the sign is the
  * fingerprint bit. The 64 bits assemble into one LONG with bit i of the
  * long = fingerprint bit i (bit 63 lands on the sign bit — harmless,
  * every consumer treats the long as a bag of bits via xor/bit_count).
  *
  * A NULL or empty token array yields 0L (all votes zero), never NULL.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    SimHashImpl.eval64(if (t == null) null else t.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = graft.expressions.SimHashImpl.eval64(
          ${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashImpl {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def eval(tokens: ArrayData): UTF8String = {
    val counts = new Array[Int](16)
    if (tokens != null) {
      val md = md5.get()
      val m = tokens.numElements()
      var i = 0
      while (i < m) {
        if (!tokens.isNullAt(i)) {
          md.reset()
          val d = md.digest(tokens.getUTF8String(i).getBytes)
          // md5 hex chars 1..4 == high/low nibbles of digest bytes 0..1
          val nib0 = (d(0) >> 4) & 0xf
          val nib1 = d(0) & 0xf
          val nib2 = (d(1) >> 4) & 0xf
          val nib3 = d(1) & 0xf
          var bit = 0
          while (bit < 16) {
            val v = (bit >> 2) match {
              case 0 => nib0
              case 1 => nib1
              case 2 => nib2
              case _ => nib3
            }
            counts(bit) += (if (((v >> (bit & 3)) & 1) == 1) 1 else -1)
            bit += 1
          }
        }
        i += 1
      }
    }
    val cs = new Array[Char](16)
    var b = 0
    while (b < 16) {
      cs(b) = if (counts(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromString(new String(cs))
  }

  /** 64-bit form: digest bytes 0..7 carry the 16 nibbles (hex chars
    * 1..16); nibble p (0-based) = high nibble of byte p/2 when p is
    * even, low when odd — the generalization of the 16-bit chain. */
  def eval64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    if (tokens != null) {
      val md = md5.get()
      val m = tokens.numElements()
      var i = 0
      while (i < m) {
        if (!tokens.isNullAt(i)) {
          md.reset()
          val d = md.digest(tokens.getUTF8String(i).getBytes)
          var bit = 0
          while (bit < 64) {
            val p = bit >> 2
            val v = if ((p & 1) == 0) (d(p >> 1) >> 4) & 0xf else d(p >> 1) & 0xf
            counts(bit) += (if (((v >> (bit & 3)) & 1) == 1) 1 else -1)
            bit += 1
          }
        }
        i += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

object SimHashExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def simhash16(tokens: Column): Column =
    Bridge.column(SimHash16(Bridge.expression(tokens)))

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
