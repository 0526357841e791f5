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
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
    .otherwise(array().cast("array<string>"))

  /** All (non-distinct) word k-shingles, for frequency counting. */
  def shinglesAll(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
    .otherwise(array().cast("array<string>"))

  /** Rolling-hash document fingerprint: md5 of the normalized text
    * (canonical representative for fuzzy-exact dedup). */
  def fingerprint(c: Column): Column = md5(normalize(c))
}
