package graft.operators.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact and fingerprint deduplication over a document table.
  *
  * Scale: both are single hash-aggregations on a digest of the text — the
  * shuffle key is the 128-bit digest, never the document body, so shuffle
  * volume is O(rows × 32 bytes) regardless of document size. Map-side
  * partial aggregation collapses duplicates before the exchange.
  */
object Dedup {

  /** Exact dedup: group by md5(text); keep the smallest id as the cluster
    * representative. Output: (text_hash, keep_id, n_dups). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Fuzzy-exact dedup via canonical fingerprint (md5 of normalized text):
    * catches case/punctuation/whitespace variants of the same document. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
}
