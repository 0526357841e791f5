package graft

import graft.operators.Profile
import graft.operators.Profile.ColSpec

/** One-scan column profiling: null/distinct accounting and the
  * engine-portable min/max renders. */
class ProfileSpec extends SparkSpecBase {

  test("outliers: flags exactly the planted anomalies, n<2 groups flag nothing") {
    import graft.operators.Outliers
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // tight cluster around 100 plus two planted anomalies; a singleton group
    val rows = (1 to 50).map(i => (i.toLong, "a", 100.0 + (i % 7))) ++
      Seq((98L, "a", 5000.0), (99L, "a", -4000.0), (100L, "solo", 1.0))
    val df = rows.toDF("id", "grp", "v")
    val out = Outliers.flag(df, Seq("grp"), "v", z = 3.0, keep = Seq("id", "v"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(98L, 99L))
    // lowering z to 0 flags everything off-mean in the big group, never solo
    val all = Outliers.flag(df, Seq("grp"), "v", z = 0.0, keep = Seq("id"))
      .select("grp").distinct().as[String].collect().toSeq
    assert(all == Seq("a"))
  }
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
