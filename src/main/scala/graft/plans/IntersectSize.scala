package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| for two `array<string>` columns in one fused pass.
  *
  * Equivalent to `size(array_intersect(a, b))` when both inputs hold
  * distinct, non-null elements (the shingle-set invariant), but without
  * materializing the intersection array and without the interpreted
  * expression overhead — the generated code builds one hash set from the
  * left side and counts hits from the right.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_size expects (array<string>, array<string>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[UTF8String](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { set.add(x.getUTF8String(i)); i += 1 }
    var cnt = 0
    var j = 0
    while (j < y.numElements()) {
      if (set.contains(y.getUTF8String(j))) cnt += 1
      j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $set =
         |  new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>($x.numElements() * 2);
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  $set.add($x.getUTF8String($i));
         |}
         |${ev.value} = 0;
         |for (int $j = 0; $j < $y.numElements(); $j++) {
         |  if ($set.contains($y.getUTF8String($j))) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}
