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

  // shared with the oracle: RE2-safe, no backrefs/lookarounds. The URL
  // is SPLIT at the first '?' before any separator surgery — rewriting
  // separators on the whole string would corrupt a literal '&' in the
  // path or a second literal '?' inside the query (both legal). Inside
  // the extracted query every param is given the uniform '&'-prefixed
  // shape (prepend one '&'), tracking params are stripped replace-all,
  // and the one synthetic leading '&' is removed again; the '?' is
  // re-attached only when any param survived.
  val FragmentRe = "#.*"
  val PreQueryRe = "^([^?]*)" // scheme+authority+path: before the 1st '?'
  val QueryRe = "^[^?]*\\?(.*)$" // query: after the 1st '?' (may hold '?')
  val TrackingRe = "&(utm_[a-z]+|fbclid|ref)=[^&]*"
  val LeadAmpRe = "^&"
  val SchemeRe = "^http://"
  val AuthorityRe = "^https://([^/?#]*)"
  val WwwRe = "^www\\."
  val TrailingSlashRe = "/$"

  /** Canonical form of a URL column (pure codegen projection). */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, FragmentRe, "")
    val pre = regexp_extract(noFrag, PreQueryRe, 1)
    val qry = regexp_extract(noFrag, QueryRe, 1) // "" when no '?'
    val cleanQry = regexp_replace(
      regexp_replace(concat(lit("&"), qry), TrackingRe, ""),
      LeadAmpRe, "")
    val joined = when(cleanQry === "", pre)
      .otherwise(concat(pre, lit("?"), cleanQry))
    val https = regexp_replace(joined, SchemeRe, "https://")
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
