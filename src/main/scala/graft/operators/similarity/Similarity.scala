package graft.operators.similarity

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute force is the exact baseline: broadcast the (small) query side and
  * map over the corpus — no shuffle, the corpus streams through codegen'd
  * zip_with/aggregate dot products. The LSH variant is the scale path:
  * random-hyperplane signatures bucket the corpus so each query only
  * scores its own bucket (candidates ~ N/2^planes per bucket).
  */
object Similarity {

  /** All pairs (a < b) with cosine ≥ threshold — embedding near-dup
    * detection. Quadratic in rows; intended for corpus-vs-corpus audit at
    * moderate N or as the verify stage after LSH blocking. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Exact top-k cosine neighbors for each query row (brute force).
    * `queries` should be small (it is broadcast). Ranking uses the cosine
    * rounded to 6 decimals with the neighbor id as tiebreak, so results
    * are deterministic and engine-portable. */
  def knnBrute(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("q_vec"), col("n_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }

  /** Per-label centroid, emitted flat as (label, pos, c): the coarse
    * quantizer step of an IVF index. One shuffle keyed by (label, pos). */
  def centroids(emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    emb.select(col(labelCol).as("label"),
        posexplode(toDouble(col(vecCol))).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v")), 6).as("c"))

  /** Approximate top-k via random-hyperplane LSH: bucket = sign bits of
    * `planes` fixed pseudo-random hyperplanes (seeded, deterministic);
    * each query scores only its bucket. Recall < 1 by construction —
    * the scale path when brute force is too expensive. */
  def knnLsh(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val planeVecs = Array.fill(planes, dim)(rng.nextGaussian())
    val planeCols = planeVecs.map(p => array(p.map(lit): _*))
    def bucket(vec: org.apache.spark.sql.Column) =
      planeCols.zipWithIndex.map { case (p, i) =>
        when(dot(toDouble(vec), p) >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"), bucket(col(vecCol)).as("bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("n_vec"), bucket(col(vecCol)).as("bucket"))
    val scored = q.join(c,
        q("bucket") === c("bucket") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("q_vec"), col("n_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }
}
