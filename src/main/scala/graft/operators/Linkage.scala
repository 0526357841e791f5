package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969) — the
  * principled form of the reference's cross-warehouse entity matching
  * (profiles/jobs synced from several origins rarely share clean keys;
  * reference unified models exist exactly so records CAN be compared
  * field-by-field).
  *
  * Model: for each comparison field, agreement contributes log2(m/u)
  * and disagreement log2((1-m)/(1-u)) to a pair's match score (m = P
  * (agree | same entity), u = P(agree | different entities)); a pair is
  * a link when the summed score clears a threshold. Weights here are
  * caller-supplied INTEGERS (milli-bits or any fixed-point scale): the
  * score is then an exact BIGINT sum — engine-portable, no FP noise in
  * the oracle compare, and the natural form once weights are estimated
  * offline (EM over a sample, at 100 TB always on a sample).
  *
  * Execution shape: candidate generation is BLOCKING — an equi-join on
  * `blockCols`, i.e. one hash-partitioned shuffle join; pairs never
  * materialize beyond each block. Block sizing is the scale lever (a
  * 100-row block is 10^4 pairs, a 10^5-row block is 10^10 — pick keys
  * accordingly, or salt hot blocks); scoring itself is a codegen'd
  * projection, no extra shuffle. */
object Linkage {

  /** One field comparison: `agree` evaluates on (left column, right
    * column); integer weights added to the score on agree/disagree.
    * A null-involved comparison evaluates agree=false (SQL three-valued
    * logic collapses to the disagree branch), matching CASE WHEN. */
  final case class FieldRule(name: String,
      agree: (Column, Column) => Column,
      agreeWeight: Long, disagreeWeight: Long)

  /** Exact-equality rule. */
  def eqRule(name: String, aw: Long, dw: Long): FieldRule =
    FieldRule(name, (l, r) => l === r, aw, dw)

  /** Case-insensitive string equality. */
  def eqLowerRule(name: String, aw: Long, dw: Long): FieldRule =
    FieldRule(name, (l, r) => lower(l) === lower(r), aw, dw)

  /** Numeric proximity: agree when |l - r| <= tol. */
  def withinRule(name: String, tol: Double, aw: Long, dw: Long): FieldRule =
    FieldRule(name, (l, r) => abs(l - r) <= tol, aw, dw)

  /** Scored candidate pairs: block-join `a`×`b` on `blockCols`, sum the
    * field-rule weights, keep pairs with score >= threshold. Output:
    * (idA as a_id, idB as b_id, score). Column name collisions are
    * resolved by prefixing the right side internally. */
  def linkPairs(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      idA: String, idB: String, rules: Seq[FieldRule],
      threshold: Long): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — an unblocked " +
      "linkage is a cross join; at scale that is never what you want")
    require(rules.nonEmpty, "at least one field rule")
    val l = a.select(
      (blockCols.map(col) :+ col(idA).as("a_id")) ++
        rules.map(r => col(r.name).as(s"__la_${r.name}")): _*)
    val r = b.select(
      (blockCols.map(col) :+ col(idB).as("b_id")) ++
        rules.map(ru => col(ru.name).as(s"__rb_${ru.name}")): _*)
    val score: Column = rules.map { ru =>
      when(ru.agree(col(s"__la_${ru.name}"), col(s"__rb_${ru.name}")),
        lit(ru.agreeWeight)).otherwise(lit(ru.disagreeWeight))
    }.reduce(_ + _)
    l.join(r, blockCols)
      .select(col("a_id"), col("b_id"), score.as("score"))
      .where(col("score") >= threshold)
  }
}
