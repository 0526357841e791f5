package graft

import graft.operators.Profile
import graft.operators.Profile.ColSpec

/** One-scan column profiling: null/distinct accounting and the
  * engine-portable min/max renders. */
class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("profiles nulls, distincts, and min/max in long form") {
    val df = Seq(
      (Some("b"), Some(2.5)),
      (Some("a"), None),
      (None, Some(1.25)),
      (Some("a"), Some(2.5))
    ).toDF("s", "d")
    val r = Profile.profile(df, Seq(ColSpec("s"), ColSpec.decimal("d")))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(r == Seq(
      ("d", 4L, 1L, 2L, "1.2500", "2.5000"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("single pass: the plan contains exactly one scan of the input") {
    val df = Tables(spark, sf0001, "orders")
    val plan = Profile.profile(df,
        Seq(ColSpec("o_orderstatus"), ColSpec.decimal("o_totalprice")))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, found $scans")
  }
}
