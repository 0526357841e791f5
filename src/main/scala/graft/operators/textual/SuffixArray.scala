package graft.operators.textual

import graft.operators.IndexScope
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** DISTRIBUTED SUFFIX ARRAY by prefix doubling — the suffix-array
  * formulation of exact-substring dedup (Lee et al. 2022 build their
  * dedup on exactly this structure; tx19/tx20's fixed-gram shuffle is
  * the bounded-length approximation, this is the exact-order structure
  * it approximates). Every suffix (doc, position) of the corpus gets
  * its rank in the GLOBAL lexicographic order of all suffixes.
  *
  * Prefix doubling, Spark-first: after round k every suffix is ranked
  * by its first 2^k characters. A round is pure relational algebra —
  * (1) self-join ranks at offset +2^(k-1) on (doc, p) to pair
  * (r₁, r₂); (2) global sort by the pair; (3) new rank = the pair
  * group's first row index (order- and tie-preserving, computed via
  * zipWithIndex + a groupBy-min — never a single-partition window,
  * which is the classic scale trap of rank() with no PARTITION BY).
  * ceil(log₂ maxDocLen) rounds total: a 100 TB corpus of ≤64 KB
  * documents ranks in 16 rounds of sort/join shuffles, each linear in
  * corpus positions — the textbook O(n log n · shuffles) suffix-array
  * build, with no driver-side state beyond the round counter.
  *
  * Suffixes never cross documents (each doc is its own string; a
  * suffix past the doc end compares as the empty string, rank 0,
  * which sorts before every real rank — matching SQL's prefix-first
  * string order "ab" < "abc"). Identical suffixes from different docs
  * stay tied through every round by construction; the final total
  * order breaks those ties by (doc, p), exactly SQL's
  * `ORDER BY suffix, doc_id, p`, so a DuckDB oracle can recompute the
  * whole structure by materializing the suffixes it never has to at
  * scale. Initial ranks are the first character's code point —
  * order-faithful for single-byte text (the synthetic corpus; wide
  * chars would need a byte-level explode). */
object SuffixArray {

  /** (doc_id, p, srank): 1-based rank of the suffix of `textCol`
    * starting at 1-based position p, among all suffixes of all docs,
    * ordered (suffix string, doc_id, p). Empty docs carry no suffixes. */
  def suffixRanks(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = IndexScope.scoped { sc =>
    val base = docs.where(length(col(textCol)) >= 1)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    val maxLen = base.agg(max(length(col("__t")))).head() match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0)
    }
    require(maxLen > 0, "suffixRanks needs at least one non-empty document")
    // initial rank covers the first FOUR characters, packed 9 bits each
    // ((code+1) per char, 0 past the end — so a shorter suffix packs
    // smaller than any extension, matching SQL's prefix-first order and
    // the rank-0 past-end sentinel of the doubling rounds). Numeric
    // order on the packed word == lexicographic order on 4 chars, and
    // the walk starts at offset 4: two fewer sort/join rounds.
    def packedChar(k: Int): String =
      if (k == 0) "(ascii(substring(__t, p, 1)) + 1)"
      else s"(CASE WHEN p + $k <= length(__t) " +
        s"THEN ascii(substring(__t, p + $k, 1)) + 1 ELSE 0 END)"
    val pack = (0 to 3).map(k =>
      s"(CAST(${packedChar(k)} AS BIGINT) * ${1L << (9 * (3 - k))}L)")
      .mkString(" + ")
    var ranks = sc.index(base
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("__t")))).as("p"),
        col("__t"))
      .select(col("doc_id"), col("p"), expr(pack).as("r")))
    var off = 4L
    while (off < maxLen) {
      val shifted = ranks.select(col("doc_id"),
        (col("p") - off).as("p"), col("r").as("r2"))
      val paired = ranks.join(shifted, Seq("doc_id", "p"), "left")
        .select(col("doc_id"), col("p"), col("r").as("r1"),
          coalesce(col("r2"), lit(0L)).as("r2"))
      val next = denseRankPairs(paired)
      IndexScope.release(ranks)
      ranks = next
      off *= 2
    }
    sc.own(ranks)
    // final total order: doubling leaves IDENTICAL suffixes (same tail
    // in two docs) tied forever — break by (doc_id, p)
    zipWithRowIndex(ranks.orderBy("r", "doc_id", "p"))
      .select(col("doc_id"), col("p"), (col("__idx") + 1).as("srank"))
  }

  /** Dense rank of (doc_id, p, r1, r2) rows by (r1, r2): ONE
    * range-partitioned sort shuffle plus two metadata-light passes —
    * pass 1 collects per-partition (group-start count, first pair,
    * last pair) so the driver can stitch group numbering across
    * partition boundaries (a pair group spanning partitions must not be
    * counted twice); pass 2 assigns the running dense rank from each
    * partition's stitched offset. Replaces the groupBy-min + join-back
    * formulation (3 extra shuffles per doubling round) and never uses a
    * partition-less window. Returns a MATERIALIZED (doc_id, p, r)
    * frame, rank 1-based. */
  private def denseRankPairs(paired: DataFrame): DataFrame = {
    val spark = paired.sparkSession
    val sorted = paired.orderBy("r1", "r2").rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partMeta: Array[(Int, Long, (Long, Long), (Long, Long))] =
      sorted.mapPartitionsWithIndex { (pid, it) =>
        var n = 0L
        var first: (Long, Long) = null
        var last: (Long, Long) = null
        it.foreach { row =>
          val pair = (row.getLong(2), row.getLong(3))
          if (first == null) first = pair
          if (last == null || pair != last) n += 1
          last = pair
        }
        if (first == null) Iterator.empty else Iterator((pid, n, first, last))
      }.collect().sortBy(_._1)
    // stitch: a partition whose first pair equals the previous non-empty
    // partition's last pair CONTINUES that group — its first "start"
    // introduced no new group, and its first row ranks with the old one
    val startRank = new Array[Long](partMeta.length)
    val continues = new Array[Boolean](partMeta.length)
    var introduced = 0L
    var prevLast: (Long, Long) = null
    var i = 0
    while (i < partMeta.length) {
      val (_, n, first, last) = partMeta(i)
      val cont = prevLast != null && first == prevLast
      continues(i) = cont
      startRank(i) = if (cont) introduced else introduced + 1
      introduced += (if (cont) n - 1 else n)
      prevLast = last
      i += 1
    }
    val offsetByPid: Map[Int, (Long, Boolean)] =
      partMeta.zipWithIndex.map { case ((pid, _, _, _), j) =>
        pid -> ((startRank(j), continues(j))) }.toMap
    val bOffsets = spark.sparkContext.broadcast(offsetByPid)
    val ranked = sorted.mapPartitionsWithIndex { (pid, it) =>
      bOffsets.value.get(pid) match {
        case None => Iterator.empty
        case Some((start, _)) =>
          var r = start
          var prev: (Long, Long) = null
          it.map { row =>
            val pair = (row.getLong(2), row.getLong(3))
            if (prev != null && pair != prev) r += 1
            prev = pair
            Row(row.get(0), row.get(1), r)
          }
      }
    }
    val out = spark.createDataFrame(ranked,
      org.apache.spark.sql.types.StructType(
        paired.schema.take(2) :+
          org.apache.spark.sql.types.StructField("r", LongType, nullable = false)))
      .localCheckpoint(false)
    out.count() // materialize while the sorted RDD is still cached
    sorted.unpersist(blocking = false)
    out
  }

  /** LCP ARRAY over [[suffixRanks]] — per suffix, the length of the
    * longest common prefix with its PREDECESSOR in suffix order (0 for
    * the first suffix). The classic companion structure: any repeated
    * substring of ANY length shows up as an LCP between rank-adjacent
    * suffixes, so `max(lcp)` is the corpus's longest duplicated
    * substring and a threshold on `lcp` is exact-substring dedup with
    * no fixed gram length (the tx19/tx20 40-gram is the bounded
    * approximation of exactly this).
    *
    * Shape: one self-join of the rank frame on (srank−1) pairs each
    * suffix with its predecessor; two doc-keyed joins re-attach the
    * texts; the LCP itself is the native first-mismatch scan
    * ([[graft.plans.CommonPrefixLength]] — fused O(p + lcp) per pair:
    * the byte walk to the character offset plus the compare, no per-row
    * array materialization). Emits (doc_id, p, srank, lcp,
    * prev_same_doc) — `prev_same_doc` distinguishes within-doc
    * repetition from cross-document duplication.
    *
    * Asymptotics note: the per-pair offset walk makes the LCP pass
    * Σ_p O(p) = O(L²) byte steps within a length-L document — cheap
    * next to the doubling's 16 corpus-wide shuffle rounds at typical
    * doc lengths, but the known better bound is Kasai-style reuse
    * (lcp[rank] ≥ lcp[prev rank] − 1, O(L) total) or rank-table binary
    * lifting (O(log n) per pair, needs the doubling levels retained) —
    * the upgrade path if million-char documents dominate a corpus. */
  def lcpArray(docs: DataFrame, idCol: String, textCol: String,
      precomputedRanks: Option[DataFrame] = None): DataFrame =
    IndexScope.scoped { sc =>
    val base = sc.index(docs.where(length(col(textCol)) >= 1)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t")))
    // a caller that already built [[suffixRanks]] (tx21's artifact)
    // passes it in — the doubling is the dominant cost and must not run
    // twice; ownership stays with the caller (not released here)
    val ranks = precomputedRanks.getOrElse(
      sc.index(suffixRanks(docs, idCol, textCol)))
    val prev = ranks.select((col("srank") + 1).as("srank"),
      col("doc_id").as("prev_doc"), col("p").as("prev_p"))
    val paired = ranks.join(prev, Seq("srank"), "left")
      .join(base, Seq("doc_id"))
      .join(base.select(col("doc_id").as("prev_doc"),
        col("__t").as("__pt")), Seq("prev_doc"), "left")
    // the per-pair first-mismatch scan is a NATIVE expression
    // (plans/CommonPrefixLength): the HOF formulation materialized a
    // bound-sized array per row and paid a char-indexed substring per
    // compared character — O(p·lcp) with allocation vs the fused
    // O(p + lcp) loop inside WholeStageCodegen
    val lcp = graft.functions.TextFunctions.commonPrefixLength(
      col("__t"), col("p"), col("__pt"), col("prev_p"))
    paired.select(
      col("doc_id"), col("p"), col("srank"),
      coalesce(lcp, lit(0L)).as("lcp"),
      coalesce(col("prev_doc") === col("doc_id"), lit(false))
        .as("prev_same_doc"))
  }

  /** Global 0-based row index in the frame's current (sorted) order —
    * RDD zipWithIndex: one count pass for per-partition offsets, then a
    * map; preserves range-partitioned sort order and never funnels the
    * data through one partition. */
  private def zipWithRowIndex(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val out = df.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(out, df.schema.add("__idx", LongType))
  }
}
