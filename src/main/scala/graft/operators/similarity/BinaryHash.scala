package graft.operators.similarity

import graft.functions.VectorFunctions._
import graft.operators.IndexScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary (sign-bit) embedding hashing — the extreme end of the
  * quantization spectrum (Charikar's SimHash applied to dense vectors;
  * "binary embeddings" in the vector-DB world): each dimension
  * contributes its SIGN, packed into 64-bit words, so a d-dim float
  * vector becomes d bits — 32× smaller than float32, 64× smaller than
  * the double math — and the scan distance is pure integer hardware:
  * popcount(xor) per word. For sign bits of unit vectors,
  * E[hamming]/d ∝ angle (Goemans-Williamson), so Hamming rank is an
  * unbiased angle rank estimate.
  *
  * Scan shape: one codegen'd `bit_count(q ^ n)` per (query, candidate)
  * word pair — no lookup tables (PQ), no per-dimension arithmetic
  * (SQ8); the cheapest possible first-stage filter. Exact cosine
  * re-rank of the top `rerank` finishes, same contract as ss5/ss6/ss10.
  * Encoding is a one-time per-row fold (interpreted HOF — fine for a
  * build pass; the HOT path is the codegen'd scan). */
object BinaryHash {

  private def unit(df: DataFrame, idCol: String, vecCol: String,
      idAlias: String, vecAlias: String): DataFrame =
    PqCommon.unitTable(df, idCol, toDouble(col(vecCol)), idAlias, vecAlias)

  /** Sign-bit codes: one BIGINT per 64 dimensions (array for d > 64). */
  private def codeExpr(vecCol: String, dim: Int): org.apache.spark.sql.Column = {
    val words = (dim + 63) / 64
    val perWord = (0 until words).map { w =>
      val lo = w * 64
      val hi = math.min(dim, lo + 64) - 1
      s"""aggregate(
            zip_with(slice($vecCol, ${lo + 1}, ${hi - lo + 1}),
                     sequence(0, ${hi - lo}),
                     (x, i) -> IF(x >= 0D, shiftleft(1L, CAST(i AS INT)), 0L)),
            0L, (a, b) -> a | b)"""
    }
    expr(s"array(${perWord.mkString(",")})")
  }

  /** Approximate top-k by Hamming distance over sign codes, exact cosine
    * re-rank. Output: (query_id, neighbor_id, cosine, rk). */
  def knnBinary(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, rerank: Int = 100): DataFrame =
    IndexScope.scoped { sc =>
      val c = sc.index(unit(corpus, idCol, vecCol, "neighbor_id", "n_vec"))
      val dim = c.select(size(col("n_vec"))).head().getInt(0)
      val words = (dim + 63) / 64
      val codes = sc.index(c.select(col("neighbor_id"),
        codeExpr("n_vec", dim).as("n_code")))
      val q = broadcast(unit(queries, idCol, vecCol, "query_id", "q_vec")
        .withColumn("q_code", codeExpr("q_vec", dim)))
      // the scan: popcount(xor) per word — codegen integer ops
      val ham = (0 until words).map(w =>
        expr(s"bit_count(q_code[$w] ^ n_code[$w])")).reduce(_ + _)
      val approx = q.join(codes, col("query_id") =!= col("neighbor_id"))
        .withColumn("__h", ham)
      val wA = Window.partitionBy("query_id")
        .orderBy(col("__h"), col("neighbor_id"))
      val shortlist = approx.withColumn("__r", row_number().over(wA))
        .where(col("__r") <= rerank)
        .select(col("query_id"), col("q_vec"), col("neighbor_id"))
      val exact = shortlist.join(c, "neighbor_id")
        .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
      val wE = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      exact.withColumn("rk", row_number().over(wE))
        .where(col("rk") <= k)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
    }
}
