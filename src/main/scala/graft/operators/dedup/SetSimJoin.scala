package graft.operators.dedup

import graft.functions.TextFunctions
import graft.operators.IndexScope
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

  /** Shingle sets per doc: (doc_id, sh: array<string>, set_size).
    *
    * `toks` is bound as its own projection on purpose: higher-order
    * functions are interpreted (CodegenFallback, no common-subexpression
    * elimination), so if the lambda referenced the raw
    * split(regexp_replace(...)) expression it would re-tokenize the
    * document for every element_at — O(shingles × k) regex evaluations per
    * row. As a materialized attribute each reference is a row-field read.
    * (CollapseProject keeps the split because the alias is non-cheap and
    * multiply referenced.)
    *
    * The result is materialized as SCOPE-OWNED index state (localCheckpoint
    * row blocks, released when the caller's [[graft.operators.IndexScope]]
    * closes): the set-similarity operators are MULTI-PASS — the shingle
    * index feeds the doc-frequency agg, the prefix self-join, and the
    * verification join — and without a lineage break Catalyst inlines the
    * tokenize expressions into constraints/conditions across every branch
    * (we measured 68 regexp_replace copies in one physical plan). Columnar
    * cache() of array<string> is ~12× slower to build than localCheckpoint.
    * On a cluster the same role is played by persist(DISK) or a temp
    * table — materializing the shingle index is the standard first pass of
    * a distributed PPJoin. */
  private[dedup] def shingleSets(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      sc: IndexScope.Scope): DataFrame = {
    // a small input file arrives as one partition: spread the (per-row
    // expensive) tokenize+shingle work across the cluster before
    // materializing; skip when the source is already parallel
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par / 2) docs.repartition(par) else docs
    sc.index(spread.select(
        col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"), TextFunctions.shingles(col("toks"), k).as("sh"))
      .withColumn("set_size", size(col("sh"))))
  }

  /** Verify candidate pairs (doc_a < doc_b) with the exact Jaccard and
    * keep those ≥ threshold. */
  private[dedup] def verify(
      candidates: DataFrame, sets: DataFrame, threshold: Double): DataFrame =
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("set_size").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("set_size").as("nb")), "doc_b")
      .withColumn("inter",
        org.apache.spark.sql.graft.ColumnBridge.column(graft.plans.IntersectSize(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("sh_a")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("sh_b")))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))

  /** All pairs with word-k-gram Jaccard ≥ threshold.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b — eagerly
    * materialized (the pair subset is small); the corpus-sized
    * shingle/prefix indexes are released before returning. */
  def jaccardJoin(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = IndexScope.scoped { sc =>
    val sets = shingleSets(docs, idCol, textCol, k, sc)
    // the prefix machinery works on 64-bit shingle hashes: smaller sort
    // and join keys; a (vanishingly unlikely) hash collision can only ADD
    // a spurious candidate, which exact verification then kills — the
    // output stays exact
    // shingle strings are dropped IMMEDIATELY after hashing: the
    // doc-frequency join and the per-doc ranking window both shuffle the
    // full (doc, shingle) table, and 64-bit keys cost a fraction of the
    // 20-40 byte shingle text (a hash collision merely merges two
    // shingles' ranks/buckets — the exact verify step still decides)
    val ex = sets.select(col("doc_id"), col("set_size"),
        explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("set_size"),
        xxhash64(col("shingle")).as("shash"))
    // global doc-frequency: the canonical rare-first total order
    val dfreq = ex.groupBy("shash").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfreq, "shash").withColumn("rnk",
      row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("df"), col("shash"))))
    val prefix = sc.index(ranked.where(
        col("rnk") <= col("set_size") - ceil(lit(threshold) * col("set_size")) + 1)
      .select("doc_id", "set_size", "shash", "rnk"))
      // self-joined below: one window pass, not two
    // two exact PPJoin prunes on top of the prefix match:
    //  - length filter: J(A,B) ≥ t implies t·|B| ≤ |A| (and symmetrically)
    //  - positional filter: matching at ranks (i, j) caps the achievable
    //    overlap at min(|A|-i, |B|-j)+1, which must reach the required
    //    overlap α = ceil(t/(1+t)·(|A|+|B|))
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.shash") === col("b.shash") && col("a.doc_id") < col("b.doc_id") &&
          col("a.set_size") >= lit(threshold) * col("b.set_size") &&
          col("b.set_size") >= lit(threshold) * col("a.set_size") &&
          least(col("a.set_size") - col("a.rnk"), col("b.set_size") - col("b.rnk")) + 1 >=
            ceil(lit(threshold / (1 + threshold)) * (col("a.set_size") + col("b.set_size"))))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verify(candidates, sets, threshold)
  }
}
