package graft.operators.similarity

import graft.functions.VectorFunctions._
import graft.operators.IndexScope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the production ANN composition (Jégou et al., TPAMI 2011 §IV)
  * — a coarse inverted file bounds WHICH corpus vectors a query touches
  * (nProbe of nLists partitions), and product quantization of the
  * RESIDUAL (vector − its coarse centroid) bounds WHAT each touched
  * vector costs (m table lookups on small codes). Residual encoding beats
  * plain PQ because vectors inside one list share their coarse offset, so
  * the sub-quantizers spend their codebook on the remaining variance.
  *
  * Build: coarse KMeans over full vectors → per-list assignment →
  * residuals → m sub-quantizer KMeans over residual blocks → codegen'd
  * argmin encoding (one int code column per block). Search: rank coarse
  * lists by distance, keep nProbe; per (query, probed list) build the ADC
  * table from the QUERY residual against that list's centroid; scan only
  * the probed lists' codes with codegen'd element_at lookups; exact
  * cosine re-rank of the top `rerank`. Scan fraction ≈ nProbe/nLists of
  * the corpus, at code cost — multiplicative with PQ's footprint win. */
object IvfPq {

  final case class Index private[similarity] (
      coarse: Array[Array[Double]],
      subCenters: Array[Array[Array[Double]]],
      encoded: DataFrame, unit: DataFrame,
      nLists: Int, m: Int, nCodes: Int, subDim: Int) {

    private def subvec(v: Column, i: Int): Column =
      slice(v, i * subDim + 1, subDim)
    private def centerLit(i: Int, j: Int): Column =
      array(subCenters(i)(j).map(lit): _*).cast("array<double>")
    private def centerNormSq(i: Int, j: Int): Double =
      subCenters(i)(j).map(x => x * x).sum
    private def coarseLit(l: Int): Column =
      array(coarse(l).map(lit): _*).cast("array<double>")

    /** nProbe-bounded ADC search + exact re-rank.
      * Output: (query_id, neighbor_id, cosine, rk). */
    def search(queries: DataFrame, idCol: String, vecCol: String,
        k: Int, nProbe: Int = 2, rerank: Int = 50): DataFrame = IndexScope.scoped { sc =>
      val spark = queries.sparkSession
      import spark.implicits._
      val q0 = sc.index(queries.select(
        col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv")))
      // rank coarse lists: dist² ∝ ||c||² − 2 q·c (||q||² constant);
      // centroid norms precomputed on the driver, dots native
      val lists = broadcast((0 until nLists)
        .map(l => (l, coarse(l), coarse(l).map(x => x * x).sum))
        .toDF("list", "cvec", "cnorm2"))
      val probeW = Window.partitionBy("query_id").orderBy(col("__d"), col("list"))
      val probed = q0.join(lists)
        .withColumn("__d", col("cnorm2") - dot(col("qv"), col("cvec")) * 2.0)
        .withColumn("__pr", row_number().over(probeW))
        .where(col("__pr") <= nProbe)
        .select(col("query_id"), col("qv"), col("list"))
      // per (query, probed list): the QUERY residual against that list's
      // centroid, then the FLAT m·nCodes ADC table from it. The residual
      // norm ||r_q||² is NOT rank-invariant here (unlike flat PQ, where
      // one table serves the whole corpus): candidates from different
      // probed lists have different dropped constants, so it must be
      // carried into the ranked score or far lists get systematically
      // under-counted distances.
      val probedC = probed.withColumn("cvec2",
        element_at(array((0 until nLists).map(coarseLit): _*), col("list") + 1))
        .withColumn("__r", zip_with(col("qv"), col("cvec2"), (x, y) => x - y))
        .select(col("query_id"), col("qv"), col("list"),
          dot(col("__r"), col("__r")).as("rnorm2"),
          array((0 until m).flatMap(i => (0 until nCodes).map(j =>
            lit(centerNormSq(i, j)) - lit(2.0) * dot(subvec(col("__r"), i), centerLit(i, j)))): _*)
            .as("table"))
      val adc = (0 until m).map(i =>
        element_at(col("table"), col(s"code_$i") + lit(i * nCodes) + 1))
        .reduce(_ + _) + col("rnorm2")
      val preW = Window.partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
      val candidates = broadcast(probedC)
        .join(encoded, probedC("list") === encoded("list") &&
          col("query_id") =!= col("neighbor_id"))
        .withColumn("adc", adc)
        .withColumn("pre_rk", row_number().over(preW))
        .where(col("pre_rk") <= rerank)
        .select("query_id", "neighbor_id")
      // exact re-rank on the ORIGINAL vectors
      val qUnit = broadcast(q0
        .select(col("query_id"), col("qv"), sqrt(dot(col("qv"), col("qv"))).as("__n"))
        .select(col("query_id"), transform(col("qv"), x => x / col("__n")).as("q_unit")))
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
      candidates
        .join(qUnit, "query_id").join(unit, "neighbor_id")
        .withColumn("cosine", round(dot(col("q_unit"), col("n_unit")), 6))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
    }

    def close(): Unit = {
      IndexScope.release(encoded)
      IndexScope.release(unit)
    }
  }

  /** Train coarse + residual sub-quantizers, encode the corpus. */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 8, m: Int = 8, nCodes: Int = 16,
      seed: Long = 42L): Index = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .localCheckpoint()
    val dim = base.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m

    // coarse quantizer over full vectors
    val coarseModel = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("__f")
      .fit(base.select(array_to_vector(col("v")).as("__f")))
    val coarse = coarseModel.clusterCenters.map(_.toArray)
    def coarseLit(l: Int): Column =
      array(coarse(l).map(lit): _*).cast("array<double>")
    def coarseNormSq(l: Int): Double = coarse(l).map(x => x * x).sum

    // assignment: argmax_l (v·c_l − ½||c_l||²), native dots
    val listScores = array((0 until nLists).map(l =>
      dot(col("v"), coarseLit(l)) - lit(0.5 * coarseNormSq(l))): _*)
    val assigned = base
      .withColumn("list", (array_position(listScores, array_max(listScores)) - 1).cast("int"))
      .withColumn("cvec", element_at(array((0 until nLists).map(coarseLit): _*), col("list") + 1))
      .withColumn("r", zip_with(col("v"), col("cvec"), (x, y) => x - y))
      .select("id", "v", "list", "r")
      .localCheckpoint()

    // residual sub-quantizers
    def subvec(v: Column, i: Int): Column = slice(v, i * subDim + 1, subDim)
    val subCenters: Array[Array[Array[Double]]] = (0 until m).map { i =>
      new KMeans().setK(nCodes).setSeed(seed + 1 + i).setFeaturesCol("__f")
        .fit(assigned.select(array_to_vector(subvec(col("r"), i)).as("__f")))
        .clusterCenters.map(_.toArray)
    }.toArray
    def centerLit(i: Int, j: Int): Column =
      array(subCenters(i)(j).map(lit): _*).cast("array<double>")
    def codeOf(r: Column, i: Int): Column = {
      val scores = array((0 until nCodes).map(j =>
        dot(subvec(r, i), centerLit(i, j)) -
          lit(0.5 * subCenters(i)(j).map(x => x * x).sum)): _*)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    val encoded = assigned.select(
      col("id").as("neighbor_id") +: col("list") +:
        (0 until m).map(i => codeOf(col("r"), i).as(s"code_$i")): _*)
      .localCheckpoint()
    val unit = base
      .select(col("id").as("neighbor_id"), col("v"), sqrt(dot(col("v"), col("v"))).as("__n"))
      .select(col("neighbor_id"), transform(col("v"), x => x / col("__n")).as("n_unit"))
      .localCheckpoint()
    IndexScope.release(base)
    IndexScope.release(assigned)
    Index(coarse, subCenters, encoded, unit, nLists, m, nCodes, subDim)
  }
}
