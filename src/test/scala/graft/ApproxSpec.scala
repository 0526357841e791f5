package graft

import graft.conditions.{Condition, Op}
import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpecBase {
  import spark.implicits._

  test("approx_count_distinct sketch lands within 5% of exact") {
    val li = Tables(spark, sf0001, "lineitem")
    val exact = li.agg(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.agg(approx_count_distinct(col("l_partkey"), 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val orders = Tables(spark, sf0001, "orders")
    val exact = orders.agg(expr("percentile(o_totalprice, 0.5)")).as[Double].head()
    val approx = orders.agg(expr("approx_percentile(o_totalprice, 0.5, 1000)")).as[Double].head()
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("null-test condition operators") {
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("id", "v")
    assert(df.where(Condition("v", Op.IsNull, null).toColumn)
      .select("id").as[Long].collect().toSeq == Seq(2L))
    assert(df.where(Condition("v", Op.NotNull, null).toColumn).count() == 2)
  }
}
