package graft.operators.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — fuse a DENSE (embedding) ranking with a SPARSE
  * (lexical) ranking via Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009): score(d) = Σ_rankings 1/(c + rank_r(d)).
  * RRF is the production default for hybrid search because it consumes
  * only RANKS — no score calibration between incomparable spaces
  * (cosines vs BM25), and rank arithmetic is exact integer+division
  * work, so fused scores are engine-portable like the similarity
  * family's cosines.
  *
  * Shape at scale: each side's ranking is already top-k-per-query
  * (bounded); fusion is a union + one groupBy on (query, doc) — state
  * bounded by queries·k per side, never corpus-sized. */
object Hybrid {

  /** Token-set Jaccard ranking of `docs` against each query doc — the
    * sparse side of hybrid retrieval in rational arithmetic (a BM25
    * ranking fuses identically; Jaccard keeps the oracle exact).
    * Candidates pair through shared tokens only — at corpus scale apply
    * prefix filtering first ([[graft.operators.dedup.SetSimJoin]]); the
    * common-token join here is the exact small-query-set form.
    * Output: (query_id, doc_id, jaccard, rank), rank 1..k per query by
    * jaccard desc then doc id. */
  def jaccardRank(docs: DataFrame, idCol: String, textCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = graft.operators.IndexScope.scoped { sc =>
    require(queryIds.nonEmpty && k > 0)
    // pinned: terms feeds sizes, the query slice, AND the probe join —
    // unpinned, the corpus tokenize+explode lineage would execute three
    // times (Catalyst does not CSE distinct subtrees)
    val terms = sc.index(docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(trim(col(textCol)), "\\s+"))).as("term")))
    val sizes = terms.groupBy("doc_id").agg(count(lit(1)).as("nd"))
    val q = terms.where(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("query_id"), col("term"))
    val qsizes = sizes.where(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("query_id"), col("nd").as("nq"))
    val inter = broadcast(q).join(terms, "term")
      .where(col("query_id") =!= col("doc_id"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("i"))
    inter.join(broadcast(qsizes), "query_id").join(sizes, "doc_id")
      .withColumn("jaccard", round(
        col("i").cast("double") / (col("nq") + col("nd") - col("i")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("jaccard").desc, col("doc_id"))))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "jaccard", "rank")
  }

  /** RRF fusion of two (query_id, doc_id, rank) frames. A doc present in
    * one ranking only contributes that side's term (the standard RRF
    * treatment of un-retrieved docs). Output: (query_id, doc_id, rrf,
    * rank) — rrf rounded to 6, rank 1..k by rrf desc then doc id. */
  def rrf(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    require(k > 0 && c >= 0)
    def contrib(df: DataFrame) = df.select(col("query_id"), col("doc_id"),
      (lit(1.0) / (lit(c.toDouble) + col("rank"))).as("contrib"))
    contrib(a).unionByName(contrib(b))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("contrib")), 6).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "rrf", "rank")
  }
}
