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
  * selected iff R − L − 1 ≥ w. Both neighborhoods are bounded
  * collect_list windows of ≤ w−1 structs, so the per-row cost is
  * constant and the only shuffle is the per-document sort.
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
    val withCtx = ex
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("lw", collect_list(struct(col("h"), col("pos")))
        .over(byPos.rowsBetween(-(w - 1), -1)))
      .withColumn("rw", collect_list(struct(col("h"), col("pos")))
        .over(byPos.rowsBetween(1, w - 1)))
    withCtx
      .withColumn("L", coalesce(
        array_max(transform(
          filter(col("lw"), e => e.getField("h") <= col("h")),
          e => e.getField("pos"))), lit(0)))
      .withColumn("R", coalesce(
        array_min(transform(
          filter(col("rw"), e => e.getField("h") < col("h")),
          e => e.getField("pos"))), col("n") + 1))
      .where(col("n") >= w && col("R") - col("L") - 1 >= w)
      .select(col("doc_id"), col("pos").cast("int").as("pos"),
        col("h").as("fingerprint"))
  }
}
