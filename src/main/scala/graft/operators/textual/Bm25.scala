package graft.operators.textual

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 term scoring over a document corpus (Robertson & Spärck Jones
  * probabilistic relevance; the Okapi BM25 tf saturation + length
  * normalization) — the sparse-retrieval half of training-data curation
  * (query-based contamination sweeps, topic slicing, hybrid dedup
  * candidates).
  *
  * Engine-portability choice: the idf factor is the RATIONAL form
  * (N - df + ½)/(df + ½) WITHOUT the log. Per term the log is a
  * monotone transform, so single-term rankings are IDENTICAL to
  * textbook BM25 — and the score stays in +,·,/ arithmetic, which IEEE
  * doubles evaluate bit-identically across engines (a libm `ln` does
  * not), so scores round-trip through a DuckDB oracle exactly like the
  * similarity family's cosines. Multi-term sums would need the log for
  * textbook weighting; [[graft.operators.similarity.Hybrid]] fuses by
  * RANK (RRF), which is insensitive to that choice.
  *
  * Shape at scale: one tokenize+explode pass builds (term, doc) postings
  * with tf; df is a groupBy over postings; scoring joins postings to the
  * (small) per-term df and the scalar avgdl — the only shuffle is the
  * postings groupBy, partitioned by term. Top-k per term is a bounded
  * window. */
object Bm25 {

  /** Per-(term, doc) BM25 scores for `terms`, top `k` docs per term.
    * Output: (term, doc_id, tf, score, rank) — score rounded to 6,
    * rank 1..k by score desc then doc id. */
  def scoreTerms(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
    val postings = toks
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .where(col("term").isin(terms: _*))
    // corpus stats: N and avgdl from ONE tiny agg (exact: avgdl =
    // bigint token total / bigint doc count, divided once)
    val stats = docs.select(col(idCol),
      size(split(trim(col(textCol)), "\\s+")).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("toktot")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val df = postings.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val scored = postings.join(broadcast(df), "term")
      .withColumn("idf_r",
        (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("score", round(
        col("idf_r") * (col("tf") * (lit(k1) + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl") / lit(avgdl))), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("term").orderBy(col("score").desc, col("doc_id"))))
      .where(col("rank") <= k)
      .select("term", "doc_id", "tf", "score", "rank")
  }
}
