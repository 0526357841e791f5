package graft

import graft.conditions._
import org.apache.spark.sql.functions._

class ConditionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    ("a", 1, "data engineer"),
    ("b", 5, "scientist"),
    ("c", 10, "ml engineer")).toDF("id", "n", "title")

  test("eq/gt/lte/in/contains compile to correct predicates") {
    assert(df.where(Condition("id", Op.Eq, "a").toColumn).count() == 1)
    assert(df.where(Condition("n", Op.Gt, 1).toColumn).count() == 2)
    assert(df.where(Condition("n", Op.Lte, 5).toColumn).count() == 2)
    assert(df.where(Condition("id", Op.In, Seq("a", "c")).toColumn).count() == 2)
    assert(df.where(Condition("title", Op.Contains, "engineer").toColumn).count() == 2)
  }

  test("conditions AND together; empty list is always-true") {
    val conds = Seq(Condition("n", Op.Gte, 5), Condition("title", Op.Contains, "engineer"))
    assert(df.where(Conditions.all(conds)).as[(String, Int, String)].collect()
      .map(_._1).toSeq == Seq("c"))
    assert(df.where(Conditions.all(Nil)).count() == 3)
  }

  test("allowed-ops guard rejects undeclared operators") {
    val schema = FilterSchema(Seq(FieldSpec("n", Set(Op.Gte, Op.Lte))))
    schema.prefilter("n").gte(1) // fine
    assertThrows[IllegalArgumentException](schema.prefilter("n").eqv(1))
    assertThrows[IllegalArgumentException](schema.prefilter("missing").gte(1))
  }

  test("search bindings: value_join within field, field_join across fields") {
    val schema = FilterSchema(Seq(
      FieldSpec("title", searchBinding = Some(SearchBinding("kw", BoolJoin.Or, BoolJoin.Or))),
      FieldSpec("id", searchBinding = Some(SearchBinding("kw", BoolJoin.And, BoolJoin.Or)))))
    // (title ⊃ data OR title ⊃ ml) AND (id ⊃ a OR id ⊃ c)
    val c = schema.compileSearch(Seq(
      Condition("title", Op.Contains, Seq("data", "ml")),
      Condition("id", Op.Contains, Seq("a", "c"))))
    assert(df.where(c).select("id").as[String].collect().toSet == Set("a", "c"))
  }
}
