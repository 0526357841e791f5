package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization dedup — the cheapest and highest-yield dedup
  * stage of every web-corpus pipeline (RefinedWeb §3.2 runs URL dedup
  * BEFORE any content dedup; Dolma and CCNet likewise): the same page
  * re-crawled via http/https, with tracking params, fragments, case-noise
  * hosts or trailing slashes is the same document, detectable without
  * touching the text.
  *
  * Canonical form (each step a portable RE2-compatible regex, shared
  * verbatim with the SQL oracle — the tx12 discipline):
  *   1. drop the fragment (`#...`),
  *   2. drop tracking params (utm_*, fbclid, ref) and repair the query
  *      separators they leave behind (`?&`→`?`, trailing `?`/`&`),
  *   3. fold http→https (scheme is not identity),
  *   4. lowercase the authority and strip a leading `www.`,
  *   5. strip one trailing slash.
  *
  * Dedup itself is one hash groupBy on the canonical URL (exact dedup's
  * plan): keep the smallest id per group. No text is read — at 100 TB
  * this stage runs on the (id, url) projection only, parquet pruning
  * drops every other column at the scan. */
object UrlDedup {

  // shared with the oracle: RE2-safe, no backrefs/lookarounds. The
  // tracking strip normalizes '?' to '&' FIRST so every param match has
  // the same '&'-prefixed shape (a position-dependent '?p=v&' repair
  // cannot be expressed in one RE2 pass without lookarounds), then
  // restores '?' on the first surviving separator via an ANCHORED
  // replace (^ matches once even under replace-all semantics).
  val FragmentRe = "#.*"
  val QueryStartRe = "\\?"
  val TrackingRe = "&(utm_[a-z]+|fbclid|ref)=[^&#]*"
  val RestoreQueryRe = "^([^&]*)&"
  val SchemeRe = "^http://"
  val AuthorityRe = "^https://([^/?#]*)"
  val WwwRe = "^www\\."
  val TrailingSlashRe = "/$"

  /** Canonical form of a URL column (pure codegen projection). */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, FragmentRe, "")
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, QueryStartRe, "&"),
        TrackingRe, ""),
      RestoreQueryRe, "$1?")
    val https = regexp_replace(noTrack, SchemeRe, "https://")
    val host = regexp_replace(
      lower(regexp_extract(https, AuthorityRe, 1)), WwwRe, "")
    val rest = regexp_replace(https, AuthorityRe, "")
    regexp_replace(concat(lit("https://"), host, rest), TrailingSlashRe, "")
  }

  /** Keep-first per canonical URL: (url = canonical form, id = smallest
    * surviving `idCol`, n_variants = collapsed row count). */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalize(col(urlCol)).as("url"))
      .groupBy("url")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_variants"))
      .select(col("url"), col(idCol), col("n_variants"))
}
