package graft.conditions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Condition operator set, mirroring the reference's algebra
  * (reference: core/types.py:37-44 `Operator`, core/utils.py:80-99
  * `_match_condition`).
  */
sealed abstract class Op(val name: String)
object Op {
  case object Eq       extends Op("eq")
  case object Gt       extends Op("gt")
  case object Gte      extends Op("gte")
  case object Lt       extends Op("lt")
  case object Lte      extends Op("lte")
  case object In       extends Op("in")
  case object Contains extends Op("contains")
  // beyond the reference's set (its TODO at core/utils.py:98 mentions
  // extending): explicit null tests, needed because all comparison ops
  // are null-rejecting under three-valued logic
  case object IsNull   extends Op("is_null")
  case object NotNull  extends Op("not_null")
  // prefix match (LIKE 'abc%'): unlike Contains it is RANGE-PRUNABLE —
  // every matching string sits in [prefix, successor(prefix)), so
  // manifest min/max bounds skip files the way Iceberg's
  // truncate-transform bounds do
  case object StartsWith extends Op("starts_with")

  val all: Set[Op] =
    Set(Eq, Gt, Gte, Lt, Lte, In, Contains, IsNull, NotNull, StartsWith)

  def fromName(s: String): Op =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown operator: $s"))
}

/** AND/OR join mode for keyword search expressions
  * (reference: core/types.py:83 `BoolJoin`). */
sealed abstract class BoolJoin(val name: String)
object BoolJoin {
  case object And extends BoolJoin("and")
  case object Or  extends BoolJoin("or")
}

/** A single predicate on a field.
  *
  * Unlike the reference — which splits WHERE (compiled to per-warehouse HTTP
  * query params, core/utils.py:604 `build_connector_params`) from HAVING
  * (evaluated in-memory, core/utils.py:102 `apply_postfilters`) — here both
  * compile to a Catalyst [[Column]]. Catalyst then decides pushdown
  * legality: a Condition applied before an aggregation reaches the parquet
  * scan as a PushedFilter; applied after, it stays post-agg. One algebra,
  * scale-correct placement for free.
  */
final case class Condition(field: String, op: Op, value: Any) {

  def toColumn: Column = {
    val c = col(field)
    op match {
      case Op.Eq  => c === lit(value)
      case Op.Gt  => c > lit(value)
      case Op.Gte => c >= lit(value)
      case Op.Lt  => c < lit(value)
      case Op.Lte => c <= lit(value)
      case Op.In =>
        value match {
          case xs: Seq[_]      => c.isin(xs: _*)
          case xs: Array[_]    => c.isin(xs.toSeq: _*)
          case xs: Iterable[_] => c.isin(xs.toSeq: _*)
          case single          => c.isin(single)
        }
      case Op.Contains => c.contains(lit(value.toString))
      case Op.IsNull   => c.isNull
      case Op.NotNull  => c.isNotNull
      case Op.StartsWith => c.startsWith(lit(value.toString))
    }
  }
}

object Conditions {
  /** AND-fold a condition list (the reference ANDs all conditions,
    * core/utils.py:115-121). Empty list = always true. */
  def all(conds: Seq[Condition]): Column =
    conds.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
}

/** Guarded builder enforcing per-field allowed operators, mirroring
  * `ConditionBuilder` + `Prefilter` (reference: core/expressions.py:9-103,
  * which reads `prefilter.operators` from pydantic json_schema_extra).
  */
final class ConditionBuilder(fieldName: String, allowedOps: Option[Set[Op]]) {
  private def mk(op: Op, value: Any): Condition = {
    allowedOps.foreach { ops =>
      if (!ops.contains(op))
        throw new IllegalArgumentException(
          s"Operator '${op.name}' is not allowed on field '$fieldName'")
    }
    Condition(fieldName, op, value)
  }
  def eqv(value: Any): Condition      = mk(Op.Eq, value)
  def gt(value: Any): Condition       = mk(Op.Gt, value)
  def gte(value: Any): Condition      = mk(Op.Gte, value)
  def lt(value: Any): Condition       = mk(Op.Lt, value)
  def lte(value: Any): Condition      = mk(Op.Lte, value)
  def in(values: Seq[Any]): Condition = mk(Op.In, values)
  def contains(value: Any): Condition = mk(Op.Contains, value)
  def startsWith(value: Any): Condition = mk(Op.StartsWith, value)
}

/** Per-field metadata: the Spark analogue of the reference's pydantic
  * `json_schema_extra` blocks on UnifiedJob/UnifiedProfile fields
  * (reference: core/models.py:160-305). */
final case class FieldSpec(
    name: String,
    allowedOps: Set[Op] = Op.all,
    searchBinding: Option[SearchBinding] = None,
    cursorTag: Option[String] = None)

/** How a CONTAINS condition on a field folds into a keyword search
  * expression (reference: core/utils.py:354-474
  * `build_search_query_params`). */
final case class SearchBinding(
    searchField: String,
    fieldJoin: BoolJoin = BoolJoin.Or,
    valueJoin: BoolJoin = BoolJoin.And)

/** A schema of filterable fields with prefilter metadata. */
final case class FilterSchema(fields: Seq[FieldSpec]) {
  private val byName = fields.map(f => f.name -> f).toMap

  /** `Prefilter(Model, "field")` equivalent: a builder restricted to the
    * field's declared operators. */
  def prefilter(fieldName: String): ConditionBuilder = {
    val spec = byName.getOrElse(fieldName,
      throw new IllegalArgumentException(s"no such field: $fieldName"))
    new ConditionBuilder(fieldName, Some(spec.allowedOps))
  }

  /** Compile CONTAINS conditions that carry a search binding into one
    * boolean Column per search field, replicating the reference's
    * field_join/value_join grouping (core/utils.py:354-474): values inside
    * a field combine with `valueJoin`; fields with fieldJoin=OR combine
    * into an OR block, fieldJoin=AND into an AND block; the two blocks AND
    * together. Non-search conditions are returned unchanged.
    */
  def compileSearch(conds: Seq[Condition]): Column = {
    val (search, plain) = conds.partition(c =>
      c.op == Op.Contains && byName.get(c.field).exists(_.searchBinding.isDefined))

    val bySearchField = search.groupBy(c => byName(c.field).searchBinding.get.searchField)
    val searchCols = bySearchField.toSeq.sortBy(_._1).map { case (_, cs) =>
      def fieldExpr(c: Condition): Column = {
        val b = byName(c.field).searchBinding.get
        val values = c.value match {
          case xs: Seq[_] => xs.map(_.toString)
          case v          => Seq(v.toString)
        }
        val terms = values.map(v => col(c.field).contains(lit(v)))
        b.valueJoin match {
          case BoolJoin.And => terms.reduce(_ && _)
          case BoolJoin.Or  => terms.reduce(_ || _)
        }
      }
      val (andFields, orFields) =
        cs.partition(c => byName(c.field).searchBinding.get.fieldJoin == BoolJoin.And)
      val parts =
        orFields.map(fieldExpr).reduceOption(_ || _).toSeq ++
        andFields.map(fieldExpr).reduceOption(_ && _).toSeq
      parts.reduce(_ && _)
    }
    (searchCols ++ plain.map(_.toColumn)).reduceOption(_ && _).getOrElse(lit(true))
  }
}
