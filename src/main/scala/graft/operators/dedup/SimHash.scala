package graft.operators.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate detection with pigeonhole blocking.
  *
  * Per document: hash each distinct token (xxhash64), weight by its term
  * count, sum ±weight per bit position, take signs → a 64-bit signature.
  * Candidate generation: split the signature into `chunks` equal chunks;
  * by pigeonhole, any pair within Hamming distance < chunks shares at
  * least one exact chunk, so a self-join on (chunk_idx, chunk_value) has
  * perfect recall for maxHamming ≤ chunks-1 while only colliding
  * near-identical signatures — no quadratic compare.
  */
object SimHash {

  /** (doc_id, simhash: long) */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map(j =>
      sum(expr(s"cnt * (2 * ((h >> $j) & 1) - 1)")).as(s"b$j"))
    val summed = tf.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    summed.select(col("doc_id"), sig.as("simhash"))
  }

  /** Candidate near-dup pairs with Hamming distance ≤ maxHamming.
    * Output: (doc_a, doc_b, hamming) with doc_a < doc_b. Requires
    * maxHamming < chunks for exact recall (pigeonhole). */
  def nearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val width = 64 / chunks
    val sigs = signatures(docs, idCol, textCol)
    val chunked = sigs.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk_idx"))
      // chunk value: unsigned shift then mask to `width` bits
      .withColumn("chunk_val",
        expr(s"shiftrightunsigned(simhash, chunk_idx * $width)")
          .bitwiseAND(lit((1L << width) - 1)))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(expr("a.simhash ^ b.simhash")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
