package graft.operators.dedup

import graft.operators.IndexScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Pipeline: shingle → per-shingle double hash (h1, h2 via xxhash64 with
  * two salts) → minhash signature of `numPerms` permutations using
  * Kirsch-Mitzenmacher composition h_i = h1 + i·h2 (long wrap-around is
  * deterministic) → split into `numBands` bands of r = numPerms/numBands
  * rows → bucket-join on (band, band signature) → exact-Jaccard
  * verification of candidates.
  *
  * Scale properties: the signature is computed entirely with higher-order
  * functions (transform/aggregate) — per-row codegen, NO explode of the
  * shingle set, no shuffle until the band bucket join, whose keys are
  * fixed-size (band_id, 64-bit bucket hash). With b bands of r rows the
  * candidate probability is 1-(1-s^r)^b: at (b=32, r=4) a true pair at
  * s=0.8 is missed with p≈6e-8 while an s=0.2 pair survives with p≈5%
  * and is then killed by exact verification — so the verified output
  * equals the exact Jaccard join with near-certainty, at near-linear cost.
  */
object MinHashLSH {

  /** Mersenne prime 2^31-1: hash composition stays within 2^40, so the
    * (h1 + i·h2) mod p permutation family never overflows ANSI long
    * arithmetic. */
  private val P = 2147483647L

  /** (doc_id, sig: array<long>[numPerms]).
    *
    * Computed as numPerms codegen'd `min` aggregates over the exploded
    * (doc_id, shingle-hash) table rather than a higher-order-function fold:
    * HOF lambdas are interpreted (CodegenFallback), which made the fold
    * ~100× slower than this hash-aggregate — and the partial (map-side)
    * aggregation collapses each document's shingles before any shuffle,
    * so at scale only numPerms longs per document cross the wire. */
  private[dedup] def signatures(sets: DataFrame, numPerms: Int): DataFrame = {
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"),
        pmod(xxhash64(col("shingle")), lit(P)).as("h1"),
        pmod(xxhash64(col("shingle"), lit(7)), lit(P)).as("h2"))
    val aggs = (0 until numPerms).map(i =>
      min(pmod(col("h1") + lit(i.toLong) * col("h2"), lit(P))).as(s"s$i"))
    ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerms).map(i => col(s"s$i")): _*).as("sig"))
  }

  /** Near-dup pairs with verified Jaccard ≥ threshold.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b — same contract as
    * [[SetSimJoin.jaccardJoin]], approximate candidate generation with
    * exact verification. */
  /** Pick (numBands, rowsPerBand) for a Jaccard `threshold` at a signature
    * budget of `numPerms` hashes. A missed true pair is PERMANENT while a
    * false candidate only costs one exact-Jaccard verification, so the
    * rule is constraint-form, not a weighted sum: among the divisor
    * splits b·r = numPerms, keep those whose S-curve miss rate
    * 1 − (1 − (1−s^r)^b) at s = threshold is ≤ `maxMiss`, and of those
    * take the one with the LOWEST candidate rate at s =
    * `farBelow`·threshold (the verification-cost proxy). Falls back to
    * the minimum-miss split if nothing meets the bound. Returns
    * (bands, rows); for t=0.8 at 128 perms this yields (32, 4) — the
    * suite's hand-picked dd4 configuration. */
  def tuneBands(threshold: Double, numPerms: Int = 128,
      maxMiss: Double = 1e-6, farBelow: Double = 0.5): (Int, Int) = {
    require(threshold > 0 && threshold < 1 && numPerms > 1)
    def curve(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    val splits = (1 to numPerms).filter(numPerms % _ == 0)
      .map(b => (b, numPerms / b))
    val qualifying = splits.filter { case (b, r) =>
      1.0 - curve(threshold, b, r) <= maxMiss
    }
    if (qualifying.nonEmpty)
      qualifying.minBy { case (b, r) => curve(threshold * farBelow, b, r) }
    else splits.minBy { case (b, r) => 1.0 - curve(threshold, b, r) }
  }

  def nearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8,
      numPerms: Int = 128, numBands: Int = 32): DataFrame = IndexScope.scoped { sc =>
    require(numPerms % numBands == 0, "numPerms must divide into numBands")
    val r = numPerms / numBands
    val sets = SetSimJoin.shingleSets(docs, idCol, textCol, k, sc)
    val sig = signatures(sets, numPerms)
    val buckets = sc.index(sig.select(
        col("doc_id"),
        explode(transform(sequence(lit(0), lit(numBands - 1)),
          b => struct(b.as("band_id"),
            xxhash64(b, slice(col("sig"), b * r + 1, lit(r))).as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band_id").as("band_id"), col("bb.bucket").as("bucket")))
      // self-joined below: one signature pass, not two
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    SetSimJoin.verify(candidates, sets, threshold)
  }
}
