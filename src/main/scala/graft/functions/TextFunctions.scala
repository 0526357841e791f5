package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators. All are
  * codegen'd builtins (no UDFs); the same definitions are mirrored in the
  * DuckDB oracle SQL, so normalization must stay engine-portable
  * (explicit char classes, no locale-dependent behavior). */
object TextFunctions {

  /** Canonical text normalization: lowercase, any non-[a-z0-9] run → one
    * space, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normalize(c), " ")

  /** Distinct word k-shingles ("a b c") of a token array; empty when the
    * doc has fewer than k tokens (guards sequence() against negative
    * bounds). */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(shinglesAll(toks, k))

  /** All (non-distinct) word k-shingles, for frequency counting.
    * Built with k element_at lookups per shingle instead of slice() —
    * higher-order-function lambdas are interpreted (CodegenFallback), so
    * avoiding per-shingle array allocation is a large constant factor. */
  def shinglesAll(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
    .otherwise(array().cast("array<string>"))

  /** Rolling-hash document fingerprint: md5 of the normalized text
    * (canonical representative for fuzzy-exact dedup). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Characters of the longest common prefix of the suffixes of `s1`
    * at 1-based char position `p1` and `s2` at `p2` — the LCP array's
    * inner loop as a NATIVE codegen expression
    * ([[graft.plans.CommonPrefixLength]]): O(p + lcp) fused walk, no
    * per-row array materialization, stays in WholeStageCodegen. */
  def commonPrefixLength(s1: Column, p1: Column, s2: Column, p2: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.CommonPrefixLength(
        org.apache.spark.sql.graft.ColumnBridge.expression(s1),
        org.apache.spark.sql.graft.ColumnBridge.expression(p1),
        org.apache.spark.sql.graft.ColumnBridge.expression(s2),
        org.apache.spark.sql.graft.ColumnBridge.expression(p2)))
}
