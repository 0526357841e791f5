package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that declares itself NON-DETERMINISTIC so the
  * optimizer leaves the enclosing filter exactly where it was placed.
  *
  * Why it exists: CHECK-constraint and generated-column enforcement is
  * a `raise_error`-bearing filter over the frame being written or
  * validated. Those predicates look like ordinary deterministic
  * filters, so `InferFiltersFromConstraints` happily clones them
  * THROUGH the MoR reconcile's anti-join equality onto the DELETE-KEY
  * scan — and a delete ledger legitimately carries keys that violate a
  * constraint being declared (deleting the violating rows is exactly
  * how a table becomes constraint-clean), which detonated the check on
  * rows that are not table rows at all. Marking the gate
  * non-deterministic keeps both inference and pushdown away: the check
  * runs once, at the enforcement point, over exactly the rows the
  * caller handed it. Evaluation and codegen delegate to the child —
  * the fused-into-the-write-scan property is unchanged.
  */
case class EnforcementGate(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "enforcement_gate"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): EnforcementGate = copy(child = newChild)
}
