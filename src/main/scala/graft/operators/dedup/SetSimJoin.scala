package graft.operators.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard set-similarity self-join with prefix filtering
  * (PPJoin-style).
  *
  * Naive shingle-join dedup is quadratic in the worst case: every pair of
  * documents sharing ANY shingle becomes a candidate. The prefix filter
  * bounds this exactly: order each document's shingles by a global total
  * order (doc-frequency ascending, then shingle — rarest first) and join
  * only on the first `|A| - ceil(t·|A|) + 1` shingles. Any pair with
  * Jaccard ≥ t provably shares a prefix shingle, so recall is exactly 1;
  * candidates collapse to near-linear because common shingles never enter
  * prefixes. Survivors are verified with the true Jaccard, so the output
  * is EXACT — same result as the naive join, orders of magnitude less
  * shuffle at 100 TB.
  */
object SetSimJoin {

  /** Shingle sets per doc: (doc_id, sh: array<string>, set_size). */
  private[dedup] def shingleSets(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(
        col(idCol).as("doc_id"),
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), k).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("set_size", size(col("sh")))

  /** Verify candidate pairs (doc_a < doc_b) with the exact Jaccard and
    * keep those ≥ threshold. */
  private[dedup] def verify(
      candidates: DataFrame, sets: DataFrame, threshold: Double): DataFrame =
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("set_size").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("set_size").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))

  /** All pairs with word-k-gram Jaccard ≥ threshold.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b. */
  def jaccardJoin(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, k)
    val ex = sets.select(col("doc_id"), col("set_size"),
      explode(col("sh")).as("shingle"))
    // global doc-frequency: the canonical rare-first total order
    val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfreq, "shingle").withColumn("rnk",
      row_number().over(Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))))
    val prefix = ranked.where(
      col("rnk") <= col("set_size") - ceil(lit(threshold) * col("set_size")) + 1)
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verify(candidates, sets, threshold)
  }
}
