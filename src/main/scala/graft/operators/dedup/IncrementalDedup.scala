package graft.operators.dedup

import graft.operators.IndexScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental near-dedup: an INCOMING batch checked against an EXISTING
  * corpus — the production shape at 100 TB, where re-deduplicating the
  * whole corpus per ingest is the thing you must never do. Candidates are
  * generated strictly incoming×existing (never existing×existing), so per
  * ingest the work scales with the batch, not the corpus.
  *
  * Same exact PPJoin machinery as [[SetSimJoin.jaccardJoin]] (prefix +
  * length + positional filters, exact-Jaccard verify ⇒ recall exactly 1),
  * with one incremental twist: the shingle total order (doc-frequency
  * ascending, then hash) is defined by the EXISTING corpus — that (df,
  * prefix) table is the persisted index state an ingest pipeline would
  * keep. Incoming shingles unseen in the index order first (df 0), which
  * is consistent on both sides — such shingles cannot match existing
  * anyway — so the prefix-filter recall guarantee (any common total order
  * works) is preserved. */
object IncrementalDedup {

  /** Pairs (in_id, ex_id, jaccard) with word-k-gram Jaccard ≥ threshold,
    * in_id from `incoming`, ex_id from `existing`. */
  def newDuplicates(existing: DataFrame, incoming: DataFrame, idCol: String,
      textCol: String, k: Int = 3, threshold: Double = 0.8): DataFrame =
    IndexScope.scoped { sc =>
      val setsEx = SetSimJoin.shingleSets(existing, idCol, textCol, k, sc)
      val setsIn = SetSimJoin.shingleSets(incoming, idCol, textCol, k, sc)
      def hashed(sets: DataFrame): DataFrame = sets
        .select(col("doc_id"), col("set_size"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), col("set_size"), xxhash64(col("shingle")).as("shash"))
      val exEx = hashed(setsEx)
      val exIn = hashed(setsIn)
      // the index's canonical order: df over EXISTING; unseen → df 0
      val dfreq = exEx.groupBy("shash").agg(count(lit(1)).as("df"))
      def prefixes(ex: DataFrame, joinType: String): DataFrame = {
        val ranked = ex.join(dfreq, Seq("shash"), joinType)
          .withColumn("df", coalesce(col("df"), lit(0L)))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("df"), col("shash"))))
        ranked.where(
            col("rnk") <= col("set_size") - ceil(lit(threshold) * col("set_size")) + 1)
          .select("doc_id", "set_size", "shash", "rnk")
      }
      val prefEx = sc.index(prefixes(exEx, "inner"))
      val prefIn = sc.index(prefixes(exIn, "left"))
      val alpha = threshold / (1 + threshold)
      val candidates = prefIn.as("a").join(prefEx.as("b"),
          col("a.shash") === col("b.shash") &&
            col("a.set_size") >= lit(threshold) * col("b.set_size") &&
            col("b.set_size") >= lit(threshold) * col("a.set_size") &&
            least(col("a.set_size") - col("a.rnk"), col("b.set_size") - col("b.rnk")) + 1 >=
              ceil(lit(alpha) * (col("a.set_size") + col("b.set_size"))))
        .select(col("a.doc_id").as("in_id"), col("b.doc_id").as("ex_id"))
        .distinct()
      candidates
        .join(setsIn.select(col("doc_id").as("in_id"), col("sh").as("sh_a"),
          col("set_size").as("na")), "in_id")
        .join(setsEx.select(col("doc_id").as("ex_id"), col("sh").as("sh_b"),
          col("set_size").as("nb")), "ex_id")
        .withColumn("inter",
          org.apache.spark.sql.graft.ColumnBridge.column(graft.plans.IntersectSize(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("sh_a")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("sh_b")))))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .where(col("jaccard") >= threshold)
        .select(col("in_id"), col("ex_id"), round(col("jaccard"), 6).as("jaccard"))
    }
}
