package graft.operators.dedup

import graft.operators.BloomPrune
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-time EXACT dedup with a Bloom prefilter — the 100 TB shape of
  * "is this incoming document already in the corpus": a Bloom sketch of
  * the existing fingerprints (KBs-MBs regardless of corpus size, built
  * once per ingest batch, broadcast to every task) splits the incoming
  * batch BEFORE any shuffle:
  *
  *  - `might_contain = false` → DEFINITELY new (Bloom has no false
  *    negatives): kept with zero join work — at steady state this is
  *    almost every row, so almost nothing shuffles;
  *  - `might_contain = true` → candidate duplicate: verified by the real
  *    anti-join, which kills Bloom false positives.
  *
  * The composed result is EXACT — identical to the plain anti-join — and
  * the exchange only ever carries the candidate slice. This is
  * [[BloomPrune]]'s semi-join reduction applied to the NEGATIVE
  * (anti-join) side, which needs the no-false-negative property rather
  * than the no-false-positive one. */
object BloomDedup {

  /** Exact left-anti join (left rows whose key has NO match in right)
    * with the Bloom prefilter. `expectedItems` sizes the sketch to the
    * existing corpus's distinct-key count. */
  def antiJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, expectedItems: Long = 1L << 20): DataFrame =
    BloomPrune.tryBuildFilter(right, rightKey, expectedItems) match {
      case scala.None => left // empty corpus: everything is new
      case Some(sketch) =>
        val mc: Column = BloomPrune.mightContain(sketch, col(leftKey))
        val definiteNew = left.where(!mc)
        val candidates = left.where(mc)
          .join(right.select(col(rightKey).as(leftKey)), Seq(leftKey), "left_anti")
        definiteNew.unionByName(candidates)
    }

  /** Incoming documents that are NOT fingerprint-duplicates of the
    * existing corpus: (doc_id, fingerprint) of every genuinely new doc. */
  def newDocs(incoming: DataFrame, existing: DataFrame, idCol: String,
      textCol: String, expectedItems: Long = 1L << 20): DataFrame = {
    import graft.functions.TextFunctions
    val in = incoming.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
    val ex = existing.select(
      TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
    antiJoin(in, ex, "fingerprint", "fingerprint", expectedItems)
  }
}
