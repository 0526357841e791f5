package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("custom TopKPerGroup equals window row_number on real data") {
    val orders = Tables(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val custom = TopK.perGroup(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 2)
      .as[(Long, Long, Double)].collect().toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2).drop("rk")
      .as[(Long, Long, Double)].collect().toSet
    assert(custom == windowed && custom.nonEmpty)
  }

  test("plan has partial + final stages with an exchange between") {
    val orders = Tables(spark, sf0001, "orders")
    val plan = TopK.perGroup(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k = 1)
      .queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).length == 2) // partial + final
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("k larger than any group returns everything; ties broken by order") {
    val df = Seq((1, "a", 5.0), (1, "b", 5.0), (2, "c", 1.0)).toDF("g", "id", "v")
    val all = TopK.perGroup(df, Seq("g"), Seq(col("v").desc, col("id")), k = 10)
    assert(all.count() == 3)
    val top1 = TopK.perGroup(df, Seq("g"), Seq(col("v").desc, col("id")), k = 1)
      .as[(Int, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(top1(1) == "a" && top1(2) == "c") // tie at v=5.0 -> id asc wins
  }
}
