package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 path-pattern match as one codegen'd expression — `true`
  * when `path` matches `pattern` under robots.txt semantics: always
  * start-anchored, `*` matches any run of characters (including
  * empty), a TRAILING `$` (the only position RFC 9309 gives it
  * meaning) anchors the end, and every other character is a literal.
  *
  * Why not the regex compile the evaluator used before: robots.txt
  * patterns are UNTRUSTED input, and `*`→`.*` compilation hands the
  * regex engine a pattern whose backtracking explodes polynomially on
  * hostile star runs like `*a*a*a*a*a` against long non-matching paths —
  * one domain's file slowing a crawl-wide evaluate join. The greedy
  * segment walk here (prefix check, then leftmost `indexOf` per inner
  * segment, then a suffix/containment check for the last) is the
  * classic `*`-only wildcard algorithm: leftmost placement of an inner
  * segment never loses a match, so no backtracking exists to explode —
  * worst case O(path·segment) per scan, in practice one pass. */
case class RobotsMatchExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_robots_match"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($a, $b)")
    }

  override def nullSafeEval(path: Any, pattern: Any): Any =
    RobotsMatchImpl.matches(path.asInstanceOf[UTF8String],
      pattern.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, q) => s"graft.expressions.RobotsMatchImpl.matches($p, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatchExpr =
    copy(left = newLeft, right = newRight)
}

object RobotsMatchImpl {
  /** Greedy `*`-wildcard match, start-anchored, trailing-`$` aware.
    * Matching runs over Java chars; for the literal segments that is
    * equivalent to octet matching on valid UTF-8 (self-synchronizing —
    * a segment can never match starting inside another code point). */
  def matches(pathU: UTF8String, patternU: UTF8String): Boolean = {
    val path = pathU.toString
    val pat = patternU.toString
    val anchored = pat.nonEmpty && pat.charAt(pat.length - 1) == '$'
    val body = if (anchored) pat.substring(0, pat.length - 1) else pat
    val firstStar = body.indexOf('*')
    if (firstStar < 0) {
      // wildcard-free: plain prefix (exact when anchored)
      return if (anchored) path == body else path.startsWith(body)
    }
    if (!path.startsWith(body.substring(0, firstStar))) return false
    var pos = firstStar // chars of path consumed so far
    var segStart = firstStar + 1
    while (segStart <= body.length) {
      val nextStar = body.indexOf('*', segStart)
      if (nextStar < 0) {
        // last segment: suffix when anchored, else anywhere at/after pos
        val last = body.substring(segStart)
        return if (anchored)
          path.length - last.length >= pos && path.endsWith(last)
        else path.indexOf(last, pos) >= 0
      }
      val seg = body.substring(segStart, nextStar)
      if (seg.nonEmpty) { // adjacent stars collapse
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      segStart = nextStar + 1
    }
    true // unreachable: the nextStar < 0 branch always returns
  }
}
