package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpecBase {
  import spark.implicits._

  // key "a": days 10, 13 (gap 11, 12); key "b": single day 5
  private def obs = Seq(
    ("a", 10L, 2L, "x"),
    ("a", 13L, 1L, "y"),
    ("b", 5L, 7L, "z")).toDF("k", "day", "n", "t")

  test("denseGrid emits every day in each key's span; gaps carry nulls") {
    val g = Resample.denseGrid(obs, "k", "day")
      .orderBy("k", "day")
      .select("k", "day", "n").as[(String, Long, Option[Long])].collect()
    assert(g.map(r => (r._1, r._2)).toSeq ==
      Seq(("a", 10L), ("a", 11L), ("a", 12L), ("a", 13L), ("b", 5L)))
    assert(g.map(_._3).toSeq ==
      Seq(Some(2L), None, None, Some(1L), Some(7L)))
  }

  test("zeroFill types zeros; ffill carries the last state forward only") {
    val dense = Resample.denseGrid(obs, "k", "day")
    val filled = Resample.ffill(
      Resample.zeroFill(dense, Map("n" -> lit(0L))), "k", "day", Seq("t"))
      .orderBy("k", "day")
      .select("k", "day", "n", "t").as[(String, Long, Long, String)]
      .collect().toSeq
    assert(filled == Seq(
      ("a", 10L, 2L, "x"), ("a", 11L, 0L, "x"), ("a", 12L, 0L, "x"),
      ("a", 13L, 1L, "y"), ("b", 5L, 7L, "z")))
  }

  test("ffill leaves leading gaps null (no backward fill)") {
    // observation at day 3 only for t; day 1-2 dense rows via another col
    val d = Seq(
      ("a", 1L, Some("s")), ("a", 2L, None), ("a", 3L, None))
      .toDF("k", "day", "t")
    val f = Resample.ffill(d, "k", "day", Seq("t"))
      .orderBy("day").select("t").as[Option[String]].collect().toSeq
    assert(f == Seq(Some("s"), Some("s"), Some("s")))
    val lead = Seq(("a", 1L, None: Option[String]), ("a", 2L, Some("u")))
      .toDF("k", "day", "t")
    val lf = Resample.ffill(lead, "k", "day", Seq("t"))
      .orderBy("day").select("t").as[Option[String]].collect().toSeq
    assert(lf == Seq(None, Some("u")))
  }
}
