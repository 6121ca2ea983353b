package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HLL (bucket, rho) as ONE codegen'd expression over the raw MD5
  * digest — bit-identical to the portable hex-string chain the oracle
  * pins ([[graft.operators.Sketches.hllBucket]]/`hllRho`: bucket = hex
  * chars 1-2, rho = leading zero BITS of hex chars 3-18, +1, capped),
  * but computed from the 16 digest bytes directly: bucket is byte 0,
  * rho is `Long.numberOfLeadingZeros` of bytes 1-8 big-endian — no hex
  * string, no regexp, no conv(), one digest per row from a thread-local
  * MessageDigest (spec-pinned equal on adversarial + random keys;
  * throughput measured in PLANS.md). */
case class HllBucketRho(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("rho", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hll_bucket_rho"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(key: Any): Any =
    HllImpl.eval(key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.expressions.HllImpl.eval($in);")

  override protected def withNewChildInternal(newChild: Expression): HllBucketRho =
    copy(child = newChild)
}

object HllImpl {
  val RhoCap = 40

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def eval(key: UTF8String): InternalRow = {
    val md = digests.get()
    md.reset()
    val d = md.digest(key.getBytes)
    val bucket = d(0) & 0xff
    // bytes 1..8 big-endian = hex chars 3..18 of the printable digest
    var v = 0L
    var i = 1
    while (i <= 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    val rho = if (v == 0L) RhoCap
      else math.min(java.lang.Long.numberOfLeadingZeros(v) + 1, RhoCap)
    new GenericInternalRow(Array[Any](bucket, rho))
  }
}
