package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame, maxDist: Int) =
    df.select(col("id").as("id_a"), col("s").as("name_a"))
      .join(df.select(col("id").as("id_b"), col("s").as("name_b")),
        col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
      .as[(Long, Long, String, String, Int)].collect().toSet

  test("segment blocking equals brute force, incl. short-string edge cases") {
    val docs = Seq(
      (1L, "goldenrod lavender spring"),
      (2L, "goldenrod lavander spring"),  // 1 substitution vs 1
      (3L, "goldenrod lavender sprig"),   // 1 deletion vs 1
      (4L, "xgoldenrod lavender springx"),// 2 insertions vs 1
      (5L, "completely different text!"),
      (6L, "ab"),                          // shorter than maxDist+1 segments
      (7L, "xy"),                          // ed(6,7)=2 — short-bucket pair
      (8L, "abq"),                         // ed(6,8)=1
      (9L, ""),                            // empty string
      (10L, "goldenrod lavender spring")   // exact dup of 1
    ).toDF("id", "s")
    val got = FuzzyJoin.selfJoin(docs, "id", "s", maxDist = 2)
      .as[(Long, Long, String, String, Int)].collect().toSet
    assert(got == brute(docs, 2))
    // the tricky pairs are actually present
    val pairs = got.map(t => (t._1, t._2))
    assert(pairs((1L, 2L)) && pairs((1L, 3L)) && pairs((1L, 4L)) &&
      pairs((6L, 7L)) && pairs((6L, 8L)) && pairs((1L, 10L)))
  }

  test("on real part names: equals brute force, hash-join plan") {
    val parts = Tables(spark, sf0001, "part")
      .select(col("p_partkey").as("id"), col("p_name").as("s"))
    val got = FuzzyJoin.selfJoin(parts, "id", "s", maxDist = 2)
      .as[(Long, Long, String, String, Int)].collect().toSet
    assert(got == brute(parts, 2))
    assert(got.nonEmpty) // sf0.001 part has at least one close pair
    // no nested-loop join in the segment path (part names are all longer
    // than maxDist, so the bounded short-bucket contributes nothing)
    val plan = FuzzyJoin.selfJoin(parts, "id", "s", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
