package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_common_prefix(s1, p1, s2, p2)` — the length (in characters)
  * of the longest common prefix of the suffixes starting at 1-based
  * CHARACTER positions `p1` of `s1` and `p2` of `s2`.
  *
  * This is the inner loop of the LCP array (SuffixArray.lcpArray): the
  * HOF formulation (`aggregate` over `sequence(1, bound)` of per-char
  * `substring` compares) materializes a bound-sized array per row and
  * pays a char-indexed substring walk PER CHARACTER — O(p·lcp) with
  * allocation. This expression generates one fused loop: O(p) once to
  * find each byte offset, then O(lcp) byte-wise char compares, no
  * allocation, inside WholeStageCodegen — the same native-Expression >
  * HOF preference as [[DotProduct]], on the suffix-structure family.
  *
  * Character semantics are UTF-8-aware (chars advance by the leading
  * byte's width), matching SQL `substring` comparisons on any input,
  * not just ASCII. Positions past the end yield 0 (empty suffix).
  */
case class CommonPrefixLength(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def pos(dt: DataType) = dt == LongType || dt == IntegerType
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, p1, StringType, p2) if pos(p1) && pos(p2) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_common_prefix expects (string, int/long, string, int/long), got $other")
    }
  }

  private def toLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l
    case other => throw new IllegalStateException(s"position: $other")
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String]
    val s2 = c.asInstanceOf[UTF8String]
    CommonPrefixLength.common(s1, toLong(b), s2, toLong(d))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s1, p1, s2, p2) =>
      s"${ev.value} = graft.plans.CommonPrefixLength.common($s1, (long)$p1, $s2, (long)$p2);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, fo: Expression): CommonPrefixLength =
    copy(first = f, second = s, third = t, fourth = fo)
}

object CommonPrefixLength {
  /** Static worker shared by eval and generated code: one tight loop,
    * no allocation. */
  def common(s1: UTF8String, p1: Long, s2: UTF8String, p2: Long): Long = {
    val n1 = s1.numBytes(); val n2 = s2.numBytes()
    var i = 0; var skipped = 0L
    while (skipped < p1 - 1 && i < n1) {
      i += UTF8String.numBytesForFirstByte(s1.getByte(i)); skipped += 1
    }
    var j = 0; skipped = 0L
    while (skipped < p2 - 1 && j < n2) {
      j += UTF8String.numBytesForFirstByte(s2.getByte(j)); skipped += 1
    }
    var n = 0L
    var done = false
    while (!done && i < n1 && j < n2) {
      val ca = UTF8String.numBytesForFirstByte(s1.getByte(i))
      val cb = UTF8String.numBytesForFirstByte(s2.getByte(j))
      if (ca != cb || i + ca > n1 || j + cb > n2) done = true
      else {
        var k = 0
        while (k < ca && !done) {
          if (s1.getByte(i + k) != s2.getByte(j + k)) done = true
          k += 1
        }
        if (!done) { i += ca; j += ca; n += 1 }
      }
    }
    n
  }
}
