package graft.operators.similarity

import graft.functions.VectorFunctions._
import graft.operators.IndexScope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze, Schmid: "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the memory-bound scale
  * path for embedding search: the corpus is stored as m small codes
  * (m·log2(nCodes) bits per vector ≈ 8 bytes at m=8/nCodes=256-) instead
  * of d floats, and queries scan codes with table lookups instead of
  * full-dimension arithmetic.
  *
  * Pipeline:
  *  1. TRAIN: m sub-quantizers — KMeans (spark.ml, fixed seed) over each
  *     d/m-dim subvector block of the corpus;
  *  2. ENCODE: one pass assigns every corpus vector its nearest
  *     sub-centroid per block. The argmin is computed with native
  *     [[graft.plans.DotProduct]] expressions against centroid literals
  *     (argmin_j ||s-c_j||² = argmax_j s·c_j − ½||c_j||², the ||s||² term
  *     is block-constant), so encoding stays in WholeStageCodegen;
  *  3. SEARCH (ADC): per query, an m×nCodes lookup table of sub-distances
  *     (||c||² − 2·q·c; the query-norm term is rank-invariant and
  *     dropped); the approximate distance of a corpus row is m table
  *     lookups on its codes. Top `rerank` candidates per query are then
  *     RE-RANKED with the exact cosine, so final scores are exact and the
  *     output is deterministic.
  *
  * At 100 TB the wins are the 30-60× smaller scan footprint and the
  * cheap per-pair cost; recall is bounded by quantization error and
  * measured in the spec (vs [[Similarity.knnBrute]]). Training here runs
  * on the full corpus — at scale you train on a bounded sample, which
  * changes nothing structurally. */
object ProductQuantization {

  /** Approximate top-k with exact re-ranked scores.
    * Output: (query_id, neighbor_id, cosine, rk). */
  def knnPq(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, nCodes: Int = 16, rerank: Int = 50,
      seed: Long = 42L): DataFrame = IndexScope.scoped { sc =>
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = sc.index(corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v")))
    val dim = base.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m

    def subvec(v: Column, i: Int): Column = slice(v, i * subDim + 1, subDim)

    // 1. train one sub-quantizer per block (tiny models, centers collected)
    val centers: Array[Array[Array[Double]]] = (0 until m).map { i =>
      val feats = base.select(array_to_vector(subvec(col("v"), i)).as("__f"))
      new KMeans().setK(nCodes).setSeed(seed + i)
        .setFeaturesCol("__f").fit(feats)
        .clusterCenters.map(_.toArray)
    }.toArray

    def centerLit(i: Int, j: Int): Column =
      array(centers(i)(j).map(lit): _*).cast("array<double>")
    def centerNormSq(i: Int, j: Int): Double =
      centers(i)(j).map(x => x * x).sum

    // 2. encode: argmax_j (s·c_j − ½||c_j||²) per block, native dots
    def codeOf(v: Column, i: Int): Column = {
      val scores = array((0 until nCodes).map(j =>
        dot(subvec(v, i), centerLit(i, j)) - lit(0.5 * centerNormSq(i, j))): _*)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    val encoded = sc.index(base.select(col("id").as("neighbor_id"),
      array((0 until m).map(i => codeOf(col("v"), i)): _*).as("codes")))

    // 3. ADC tables per query (broadcast; m×nCodes doubles each)
    val q = broadcast(sc.index(
      queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
        .select(col("query_id"), col("qv"),
          array((0 until m).map(i =>
            array((0 until nCodes).map(j =>
              lit(centerNormSq(i, j)) - lit(2.0) * dot(subvec(col("qv"), i), centerLit(i, j))): _*)): _*)
            .as("tables"))))

    val approx = q.join(encoded, col("query_id") =!= col("neighbor_id"))
      // SQL [] is 0-based: m table lookups per pair, nothing re-derived
      .withColumn("adc",
        expr(s"aggregate(sequence(0, ${m - 1}), cast(0 as double), " +
          "(acc, i) -> acc + tables[i][codes[i]])"))
    val preW = Window.partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
    val candidates = approx
      .withColumn("pre_rk", row_number().over(preW))
      .where(col("pre_rk") <= rerank)
      .select("query_id", "neighbor_id")

    // exact re-rank of the candidate set (norms bound as attributes first:
    // HOF lambdas are interpreted and re-evaluate captured expressions
    // per element)
    val qUnit = broadcast(q
      .select(col("query_id"), col("qv"), sqrt(dot(col("qv"), col("qv"))).as("__n"))
      .select(col("query_id"), transform(col("qv"), x => x / col("__n")).as("q_unit")))
    val cUnit = sc.index(base
      .select(col("id").as("neighbor_id"), col("v"), sqrt(dot(col("v"), col("v"))).as("__n"))
      .select(col("neighbor_id"), transform(col("v"), x => x / col("__n")).as("n_unit")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(qUnit, "query_id").join(cUnit, "neighbor_id")
      .withColumn("cosine", round(dot(col("q_unit"), col("n_unit")), 6))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }
}
