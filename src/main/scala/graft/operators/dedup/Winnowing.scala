package graft.operators.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken: "Local
  * Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  * algorithm): hash every k-gram, slide a window of `w` consecutive
  * hashes, keep each window's minimum. Guarantees: any shared substring
  * of length ≥ w+k-1 between two documents yields at least one shared
  * fingerprint (cannot be evaded by edits outside it), and ~2/(w+1) of
  * positions are kept — position-robust LOCAL fingerprints, unlike the
  * whole-document hash of [[Dedup.fingerprint]].
  *
  * Selection is computed without materializing every window: position i
  * is a window minimum iff no smaller (hash, pos) exists within w-1
  * positions on either side spanning a full window — formally, with
  * L = nearest left j where (h_j ≤ h_i) and R = nearest right j where
  * (h_j < h_i) (the asymmetry IS the (hash, pos) tiebreak), i is
  * selected iff R − L − 1 ≥ w. Each neighborhood is w−1 explicit
  * lag/lead comparisons folded with greatest/least (null-skipping) — all
  * codegen'd window builtins, no per-row array materialization (the
  * first shape used bounded collect_list windows + higher-order filters;
  * HOF lambdas are CodegenFallback and cost ~25% of the build) — and the
  * only shuffle is the per-document sort.
  *
  * The k-gram hash is ENGINE-PORTABLE (first 8 hex digits of md5 as a
  * 32-bit integer), so the DuckDB oracle reproduces the fingerprints
  * exactly. Documents with fewer than w k-grams emit nothing (standard
  * winnowing precondition). */
object Winnowing {

  /** Portable 32-bit shingle hash: md5's first 8 hex digits, big-endian. */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** (doc_id, pos, fingerprint) — `pos` is the 1-based k-gram position. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    val ex = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        posexplode(TextFunctions.shinglesAll(col("toks"), k)).as(Seq("p0", "sh")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), h32(col("sh")).as("h"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val whole = Window.partitionBy("doc_id")
    // nearest smaller-or-equal left / strictly-smaller right neighbor via
    // w-1 lags/leads; greatest/least skip the null terms from
    // out-of-range offsets and failed comparisons
    val lTerms = (1 until w).map(j =>
      when(lag(col("h"), j).over(byPos) <= col("h"), col("pos") - j))
    val rTerms = (1 until w).map(j =>
      when(lead(col("h"), j).over(byPos) < col("h"), col("pos") + j))
    ex
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("L", greatest(lTerms :+ lit(0): _*))
      .withColumn("R", least(rTerms :+ (col("n") + 1): _*))
      .where(col("n") >= w && col("R") - col("L") - 1 >= w)
      .select(col("doc_id"), col("pos").cast("int").as("pos"),
        col("h").as("fingerprint"))
  }
}
