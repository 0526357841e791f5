package graft

import graft.functions.TextFunctions
import graft.operators.dedup.IncrementalDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Incremental (incoming×existing) near-dedup: side discipline on a
  * synthetic corpus, and exact equality with the brute-force cross
  * Jaccard on real documents. */
class IncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def bruteCross(existing: DataFrame, incoming: DataFrame,
      t: Double): Set[(Long, Long, Double)] = {
    def sets(df: DataFrame, pre: String) = df.select(
      col("doc_id").as(s"${pre}_id"),
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as(s"sh_$pre"))
      .where(size(col(s"sh_$pre")) > 0)
    sets(incoming, "in").crossJoin(sets(existing, "ex"))
      .withColumn("inter", ColumnBridge.column(graft.plans.IntersectSize(
        ColumnBridge.expression(col("sh_in")),
        ColumnBridge.expression(col("sh_ex")))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_in")) + size(col("sh_ex")) - col("inter")))
      .where(col("jaccard") >= t)
      .select(col("in_id"), col("ex_id"), round(col("jaccard"), 6).as("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
  }

  test("reports only cross-side duplicates") {
    val existing = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog tonight", // dup within existing
      3L -> "completely different content about spark catalyst optimizer internals"
    ).toDF("doc_id", "text")
    val incoming = Seq(
      10L -> "the quick brown fox jumps over the lazy dog tonight", // dup of 1 and 2
      11L -> "the quick brown fox jumps over the lazy dog tonight", // dup within incoming too
      12L -> "nothing like anything else in either corpus at all honestly"
    ).toDF("doc_id", "text")
    val got = IncrementalDedup.newDuplicates(existing, incoming, "doc_id", "text")
      .select("in_id", "ex_id").as[(Long, Long)].collect().toSet
    // every pair crosses sides; 1-2 (existing×existing) and 10-11
    // (incoming×incoming) never appear
    assert(got == Set((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L)))
  }

  test("equals brute-force cross Jaccard on real documents") {
    val docs = Tables(spark, sf0001, "documents")
    val existing = docs.where(col("doc_id") % 5 =!= 0)
    val incoming = docs.where(col("doc_id") % 5 === 0)
    val got = IncrementalDedup.newDuplicates(existing, incoming, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val want = bruteCross(existing, incoming, 0.8)
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty) // the corpus does contain cross-split dups
  }
}
