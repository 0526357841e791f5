package graft

import graft.operators._
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpecBase {

  test("deterministic split: stable, complete, roughly proportional") {
    val docs = Tables(spark, sf0001, "documents")
    val split = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500 && counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 350 && counts("train") < 450) // ~80% of 500
    // rerun is bitwise identical (unlike randomSplit)
    val again = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
    assertThrows[IllegalArgumentException](
      Sampling.deterministicSplit(docs, "doc_id", Seq("a" -> 50, "b" -> 40)))
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val orders = Tables(spark, sf0001, "orders")
    val direct = orders.groupBy("o_custkey")
      .agg(sum("o_totalprice").as("total"), count(lit(1)).as("n"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Salting.saltedAgg(orders, Seq("o_custkey"), saltBuckets = 8,
      Seq(SumAgg("o_totalprice", "total"), CountAgg("n"),
        MinAgg("o_totalprice", "lo"), MaxAgg("o_totalprice", "hi")))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (t, n, lo, hi)) =>
      val (t2, n2, lo2, hi2) = direct(k)
      assert(n == n2 && lo == lo2 && hi == hi2)
      assert(math.abs(t - t2) < 1e-6) // double sum: order-dependent rounding only
    }
  }
}
