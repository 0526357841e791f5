package graft.operators.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segment-level exact deduplication: the paragraph-dedup stage of a
  * training-data pipeline (CCNet / Dolma style) re-expressed over token
  * segments — each document is split into consecutive `segTokens`-token
  * spans, a span that already occurred anywhere earlier in the corpus
  * (ordered by (doc_id, position)) is dropped, and the survivors are
  * reassembled in order.
  *
  * Scale shape: one explode bounded by n_tokens/segTokens per doc, ONE
  * shuffle on the segment text for the global keep-first rule (map-side
  * the segments are already distinct-ish), one shuffle back on doc_id for
  * reassembly. No self-join — corpus-wide duplicate detection rides the
  * groupBy exchange, so cost is O(total segments), not O(pairs). At
  * 100 TB the segment-text key would be replaced by its 128-bit hash to
  * shrink the exchange (same plan shape).
  */
object SegmentDedup {

  /** @return one row per document: segment counts before/after dedup and
    * an md5 of the reassembled retained text (empty-string md5 when every
    * segment was a duplicate). */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    require(segTokens > 0)
    val segs = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr(s"(size(__toks) - 1) div $segTokens")),
          i => concat_ws(" ", slice(col("__toks"), i * segTokens + 1, lit(segTokens)))))
          .as(Seq("seg_idx", "seg")))
    // keep-first: the corpus-wide earliest (doc_id, seg_idx) occurrence of
    // each segment survives; later occurrences (including repeats within
    // one document) are dropped
    val ranked = segs.withColumn("__keep",
      row_number().over(
        Window.partitionBy("seg").orderBy(col("doc_id"), col("seg_idx"))) === 1)
    ranked.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls from the non-kept branch; sort by
        // seg_idx (unique per doc) restores document order after the shuffle
        md5(concat_ws(" ", transform(
          array_sort(collect_list(when(col("__keep"), struct(col("seg_idx"), col("seg"))))),
          x => x.getField("seg")))).as("kept_md5"))
  }
}
