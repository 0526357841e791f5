package graft.operators.similarity

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sub-quantizer geometry shared by flat PQ and IVF-PQ: m codebooks
  * of nCodes centroids over d/m-dim blocks, with every per-row operation
  * expressed as codegen'd native dots against centroid literals. ONE
  * implementation of the encode/ADC formulas — the place where a dropped
  * term stays an explicit decision instead of a divergent copy. */
private[similarity] final case class SubQuantizer(
    centers: Array[Array[Array[Double]]], subDim: Int) {

  val m: Int = centers.length
  val nCodes: Int = centers.head.length

  def subvec(v: Column, i: Int): Column = slice(v, i * subDim + 1, subDim)
  def centerLit(i: Int, j: Int): Column =
    array(centers(i)(j).toIndexedSeq.map(lit): _*).cast("array<double>")
  def centerNormSq(i: Int, j: Int): Double = centers(i)(j).map(x => x * x).sum

  /** Nearest-centroid code for block i:
    * argmin_j ||s−c_j||² = argmax_j s·c_j − ½||c_j||². */
  def codeOf(v: Column, i: Int): Column = {
    val scores = array((0 until nCodes).map(j =>
      dot(subvec(v, i), centerLit(i, j)) - lit(0.5 * centerNormSq(i, j))): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** FLAT m·nCodes ADC lookup table for a (residual) query vector:
    * entry (i, j) = ||c_ij||² − 2·v_i·c_ij (block i, code j at position
    * i·nCodes+j). The query-norm term is NOT included — rank-invariant
    * only when every compared candidate shares the same query vector
    * (flat PQ); IVF-PQ must add its per-list residual norm back. */
  def adcTable(v: Column): Column =
    array((0 until m).flatMap(i => (0 until nCodes).map(j =>
      lit(centerNormSq(i, j)) - lit(2.0) * dot(subvec(v, i), centerLit(i, j)))): _*)

  /** Sum of the m codegen'd table lookups over code_0..code_{m-1}. */
  def adcSum(table: Column): Column =
    (0 until m).map(i =>
      element_at(table, col(s"code_$i") + lit(i * nCodes) + 1)).reduce(_ + _)
}

private[similarity] object PqCommon {

  /** Unit-normalized (id, vec) table with the norm bound as an attribute
    * first (HOF lambdas are interpreted and re-evaluate captured
    * expressions per element). */
  def unitTable(df: DataFrame, idCol: String, vecCol: Column,
      idAlias: String, vecAlias: String): DataFrame =
    df.select(col(idCol).as(idAlias), vecCol.as("__v"))
      .select(col(idAlias), col("__v"), sqrt(dot(col("__v"), col("__v"))).as("__n"))
      .select(col(idAlias), transform(col("__v"), x => x / col("__n")).as(vecAlias))

  /** Exact cosine re-rank of a (query_id, neighbor_id) candidate set
    * against pre-normalized query/corpus tables.
    * Output: (query_id, neighbor_id, cosine, rk ≤ k). */
  def exactRerank(candidates: DataFrame, qUnit: DataFrame, unit: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(qUnit, "query_id").join(unit, "neighbor_id")
      .withColumn("cosine", round(dot(col("q_unit"), col("n_unit")), 6))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }
}
