package graft.operators.dedup

import graft.functions.TextFunctions
import graft.operators.IndexScope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate detection with pigeonhole blocking.
  *
  * Per document: hash each distinct token, weight by its term count, sum
  * ±weight per bit position, take signs → a 64-bit signature. Candidate
  * generation: split the signature into `chunks` equal chunks; by
  * pigeonhole, any pair within Hamming distance < chunks shares at least
  * one exact chunk, so a self-join on (chunk_idx, chunk_value) has perfect
  * recall for maxHamming ≤ chunks-1 while only colliding near-identical
  * signatures — no quadratic compare.
  *
  * The token hash is ENGINE-PORTABLE by construction: the first 16 hex
  * digits of md5(token), read digit-by-digit (digit i supplies bits
  * 4i..4i+3). md5 is bit-identical everywhere, so the DuckDB oracle
  * reproduces the exact signatures — unlike xxhash64, whose seed/variant
  * is Spark-specific — making the full pair output oracle-checkable.
  */
object SimHash {

  /** Hex-digit value (0-15) of digit `i` (0-based) of a lowercase hex
    * string column: conv is codegen'd and case-insensitive. */
  private def hexDigit(hex: Column, i: Int): Column =
    conv(substring(hex, i + 1, 1), 16, 10).cast("int")

  /** (doc_id, simhash: long) */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("hx", md5(col("token")))
    // materialize the 16 digit values once per (doc, token), then derive
    // the 64 bit terms from them — 16 conv calls per row, not 64
    val withDigits = tf.select(col("doc_id") +: col("cnt") +:
      (0 until 16).map(i => hexDigit(col("hx"), i).as(s"dv$i")): _*)
    val bitSums = (0 until 64).map { j =>
      val bit = shiftright(col(s"dv${j / 4}"), j % 4).bitwiseAND(lit(1))
      sum(col("cnt") * (bit * 2 - lit(1))).as(s"b$j")
    }
    val summed = withDigits.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    summed.select(col("doc_id"), sig.as("simhash"))
  }

  /** Candidate near-dup pairs with Hamming distance ≤ maxHamming.
    * Output: (doc_a, doc_b, hamming) with doc_a < doc_b. Requires
    * maxHamming < chunks for exact recall (pigeonhole).
    *
    * The chunked signature table is materialized index state
    * ([[graft.operators.IndexScope]]): the self-join below reads it on
    * BOTH sides, and without the checkpoint Catalyst would inline the
    * whole token-explode → md5 → 64-sum signature pipeline into each
    * branch — twice the corpus-scale work per run (and the 64-aggregate
    * stage is the JIT-heaviest plan in the dedup family, so doubling it
    * is what a contended machine amplifies first). */
  def nearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 4): DataFrame =
    pairsFromSignatures(signatures(docs, idCol, textCol), "doc_id", "simhash",
      maxHamming, chunks)

  /** The pigeonhole band join alone, over PRECOMPUTED 64-bit signatures —
    * any fixed-width fingerprint family reuses this exact-recall
    * candidate generation (text SimHash, perceptual image hashes, binary
    * embedding sketches). Output: (doc_a, doc_b, hamming) with
    * doc_a < doc_b and hamming ≤ maxHamming; exact by pigeonhole for
    * maxHamming < chunks. */
  def pairsFromSignatures(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3, chunks: Int = 4): DataFrame = IndexScope.scoped { sc =>
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val width = 64 / chunks
    val chunked = sc.index(sigs
      .select(col(idCol).as("doc_id"), col(sigCol).as("__sig"),
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk_idx"))
      // chunk value: unsigned shift then mask to `width` bits
      .withColumn("chunk_val",
        expr(s"shiftrightunsigned(__sig, chunk_idx * $width)")
          .bitwiseAND(lit((1L << width) - 1))))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(expr("a.__sig ^ b.__sig")).as("hamming"))
      // filter BEFORE distinct: hamming is a cheap bit_count, and pruning
      // first shrinks the distinct exchange to the qualifying pairs
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
