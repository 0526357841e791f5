package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain document caps — the host-level diversity stage of web-corpus
  * assembly (RefinedWeb/Dolma cap how many documents any single domain
  * contributes, after URL canonicalization): extract the host from each
  * document's URL and keep the top `cap` documents per host by a quality
  * ordering. One window over a host-partitioned sort — at 100 TB this is a
  * single exchange on the host key; heavy-tailed domains are exactly the
  * rows the cap discards, so skew self-resolves as the window prunes.
  *
  * Host extraction is a portable regex (scheme-relative `//host/` — shared
  * verbatim with the oracle) rather than parse_url, so any SQL engine
  * reproduces membership bit-for-bit. */
object DomainCap {

  val HostRe = "^[a-z]+://([^/]+)/"

  /** Kept rows: (id, host, rk ≤ cap), ranked by `qualityCol` descending
    * with the id as tiebreak. */
  def capPerHost(docs: DataFrame, idCol: String, urlCol: String,
      qualityCol: String, cap: Int): DataFrame = {
    require(cap > 0)
    val host = regexp_extract(col(urlCol), HostRe, 1)
    val w = Window.partitionBy("host")
      .orderBy(col(qualityCol).desc, col(idCol))
    docs.withColumn("host", host)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= cap)
      .select(col(idCol), col("host"), col("rk"))
  }
}
