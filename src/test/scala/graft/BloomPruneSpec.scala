package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

/** Bloom-filter runtime join pruning: exactness vs the plain join, real
  * fact-side pruning before the exchange, and the string-key path. */
class BloomPruneSpec extends SparkSpecBase {
  import spark.implicits._

  test("pruned join equals the plain join on lineitem ⋈ filtered part") {
    val dim = Tables(spark, sf0001, "part").where(col("p_size") <= 5)
    val fact = Tables(spark, sf0001, "lineitem")
    val pruned = BloomPrune.prunedJoin(fact, dim, "l_partkey", "p_partkey")
      .select("l_orderkey", "l_partkey", "p_brand")
    val plain = fact.join(dim, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_partkey", "p_brand")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("might_contain filter evaluates on the fact side before the join") {
    val dim = Tables(spark, sf0001, "part").where(col("p_size") <= 5)
    val fact = Tables(spark, sf0001, "lineitem")
    val sketch = BloomPrune.buildFilter(dim, "p_partkey")
    val passed = fact.where(BloomPrune.mightContain(sketch, col("l_partkey"))).count()
    val total = fact.count()
    val matched = fact.join(dim, col("l_partkey") === col("p_partkey")).count()
    // the bloom really prunes (dim keeps a fraction of parts) and never
    // drops a true match
    assert(passed < total, s"bloom pruned nothing: $passed of $total")
    assert(passed >= matched)
    // and the composed plan carries the filter as a plain predicate
    val plan = BloomPrune.prunedJoin(fact, dim, "l_partkey", "p_partkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("empty dim side yields the inner join's empty result, not a crash") {
    val dim = Tables(spark, sf0001, "part").where(col("p_size") < 0) // matches nothing
    val fact = Tables(spark, sf0001, "lineitem")
    val out = BloomPrune.prunedJoin(fact, dim, "l_partkey", "p_partkey")
    assert(out.count() == 0)
    assert(BloomPrune.tryBuildFilter(dim, "p_partkey").isEmpty)
  }

  test("string keys round-trip through the sketch") {
    val dim = Seq("alpha", "beta").toDF("k")
    val fact = Seq("alpha", "beta", "gamma", "delta").toDF("fk")
    val sketch = BloomPrune.buildFilter(dim, "k", expectedItems = 16)
    val kept = fact.where(BloomPrune.mightContain(sketch, col("fk")))
      .as[String].collect().toSet
    assert(Set("alpha", "beta").subsetOf(kept))
    val joined = BloomPrune.prunedJoin(fact, dim, "fk", "k")
      .select("fk").as[String].collect().toSeq.sorted
    assert(joined == Seq("alpha", "beta"))
  }
}
