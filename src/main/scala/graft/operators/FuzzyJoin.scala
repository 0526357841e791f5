package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join with PIGEONHOLE SEGMENT blocking (PassJoin-
  * style, Li et al. "PassJoin: A Partition-based Method for Similarity
  * Joins", PVLDB 2011 — simplified to fixed shift enumeration).
  *
  * The naive fuzzy join is a quadratic nested-loop × levenshtein — the
  * round-2 version bounded it with a 1-in-50 probe sample, which is a
  * sampling of the ANSWER, not an algorithm. Exact blocking instead:
  * partition every string into `maxDist + 1` contiguous segments; if
  * ed(a, b) ≤ maxDist then b must contain at least one of a's segments
  * VERBATIM, at a position shifted by at most maxDist (each edit moves
  * downstream characters by ≤ 1). So:
  *
  *  - index side: each string emits its maxDist+1 (segment_idx, substring,
  *    own_length) keys — O(k) keys per row;
  *  - probe side: each string emits, for every candidate partner length L
  *    within ±maxDist and every shift d in [-maxDist, maxDist], the
  *    substring it would need to share — O(k · (2k+1)²) keys per row,
  *    constant in corpus size;
  *  - an equi-join on (segment_idx, substring, L) yields candidates, which
  *    a single levenshtein pass then verifies EXACTLY.
  *
  * Recall is exactly 1 (pigeonhole), the join is a plain shuffle hash
  * join on short string keys, and per-row work is constant — the shape
  * that survives a 100× corpus, unlike any nested loop. */
object FuzzyJoin {

  /** Exact all-pairs (a < b by id) with levenshtein(a, b) ≤ maxDist.
    * Output: (id_a, id_b, name_a, name_b, dist). */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 2): DataFrame = IndexScope.scoped { sc =>
    val nSeg = maxDist + 1
    val base = sc.index(df.select(
      col(idCol).as("id"), col(strCol).as("s"), length(col(strCol)).as("len")))

    // segment boundaries for a string of length L: segment i covers
    // [start(i, L), start(i+1, L)) with start(i, L) = floor(i * L / nSeg)
    def segStart(i: Column, len: Column): Column = floor(i * len / nSeg).cast("int")

    // index side: the nSeg segments of each string, as 64-bit hashes — the
    // join shuffles fixed-size keys and ids only, never the strings
    // (a hash collision can only ADD a candidate; verification kills it)
    val indexed = base.select(col("id"), col("len"),
        explode(sequence(lit(0), lit(nSeg - 1))).as("seg"),
        col("s"))
      .select(col("id").as("id_b"), col("len").as("len_b"), col("seg"),
        xxhash64(col("seg"),
          expr(s"substring(s, cast(floor(seg * len / $nSeg) as int) + 1, " +
            s"cast(floor((seg + 1) * len / $nSeg) as int) - cast(floor(seg * len / $nSeg) as int))"))
          .as("phash"),
        (expr(s"cast(floor((seg + 1) * len / $nSeg) as int)") -
          expr(s"cast(floor(seg * len / $nSeg) as int)")).as("piece_len"))
      .where(col("piece_len") > 0)
      .drop("piece_len")

    // probe side: for each partner length L in [len-maxDist, len+maxDist]
    // and shift d in [-maxDist, maxDist], the hash of the substring at the
    // partner segment's position (clamped to valid range)
    val probes = base.select(col("id"), col("s"), col("len"),
        explode(sequence(greatest(col("len") - maxDist, lit(1)),
          col("len") + maxDist)).as("plen"))
      .select(col("id"), col("s"), col("len"), col("plen"),
        explode(sequence(lit(0), lit(nSeg - 1))).as("seg"))
      .select(col("id"), col("s"), col("len"), col("plen"), col("seg"),
        explode(sequence(lit(-maxDist), lit(maxDist))).as("d"))
      .select(col("id").as("id_a"), col("plen"), col("seg"),
        (segStart(col("seg"), col("plen")) + col("d")).as("pos"),
        (segStart(col("seg") + 1, col("plen")) - segStart(col("seg"), col("plen"))).as("plen_seg"),
        col("s"), col("len"))
      .where(col("pos") >= 0 && col("plen_seg") > 0 &&
        col("pos") + col("plen_seg") <= col("len"))
      .select(col("id_a"), col("plen"), col("seg"),
        xxhash64(col("seg"), expr("substring(s, pos + 1, plen_seg)")).as("phash"))

    val segCandidates = probes.join(indexed,
        probes("phash") === indexed("phash") && probes("seg") === indexed("seg") &&
          probes("plen") === indexed("len_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))

    // pigeonhole needs nSeg NON-EMPTY segments on the indexed side, i.e.
    // len_b > maxDist. Pairs whose higher-id string is shorter than that
    // are found by a (by-construction bounded) bucket join: the indexed
    // side has len ≤ maxDist, partners len ≤ 2·maxDist — both vanish at
    // corpus scale, so the broadcast here is over a constant-size set
    val shortB = base.where(col("len") <= maxDist)
      .select(col("id").as("id_b"))
    val shortCandidates = base.where(col("len") <= 2 * maxDist)
      .select(col("id").as("id_a"))
      .join(broadcast(shortB), col("id_a") < col("id_b"))

    // distinct on the id pair alone (fixed-size rows through the
    // exchange), then re-attach the strings from the materialized base
    val pairs = segCandidates.unionByName(shortCandidates).distinct()
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")

    // verify: equal strings short-circuit to 0 (no DP); otherwise Spark's
    // BANDED levenshtein — O(len·maxDist) per pair instead of O(len²),
    // returning -1 above the threshold
    pairs
      .withColumn("dist", when(col("s_a") === col("s_b"), lit(0))
        .otherwise(levenshtein(col("s_a"), col("s_b"), maxDist)))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("s_a").as("name_a"),
        col("s_b").as("name_b"), col("dist"))
  }
}
