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
  * residuals → residual sub-quantizers ([[ProductQuantization
  * .trainSubQuantizers]]) → codegen'd encoding. Search: rank coarse lists
  * by distance, keep nProbe; per (query, probed list) build the ADC table
  * from the QUERY residual against that list's centroid
  * ([[SubQuantizer.adcTable]]) — and, unlike flat PQ, carry the residual
  * norm ||q − c_list||² into the ranked score: candidates from different
  * probed lists have different dropped constants, so omitting it biases
  * selection toward far lists. Exact cosine re-rank finishes
  * ([[PqCommon.exactRerank]]). Scan fraction ≈ nProbe/nLists of the
  * corpus, at code cost — multiplicative with PQ's footprint win. */
object IvfPq {

  final case class Index private[similarity] (
      coarse: Array[Array[Double]], sq: SubQuantizer,
      encoded: DataFrame, unit: DataFrame, nLists: Int) {

    private def coarseLit(l: Int): Column =
      array(coarse(l).toIndexedSeq.map(lit): _*).cast("array<double>")

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
      // centroid, its norm (NOT rank-invariant across lists), and the
      // flat ADC table
      val probedC = probed.withColumn("cvec2",
        element_at(array((0 until nLists).map(coarseLit): _*), col("list") + 1))
        .withColumn("__r", zip_with(col("qv"), col("cvec2"), (x, y) => x - y))
        .select(col("query_id"), col("qv"), col("list"),
          dot(col("__r"), col("__r")).as("rnorm2"),
          sq.adcTable(col("__r")).as("table"))
      val preW = Window.partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
      val candidates = broadcast(probedC)
        .join(encoded, probedC("list") === encoded("list") &&
          col("query_id") =!= col("neighbor_id"))
        .withColumn("adc", sq.adcSum(col("table")) + col("rnorm2"))
        .withColumn("pre_rk", row_number().over(preW))
        .where(col("pre_rk") <= rerank)
        .select("query_id", "neighbor_id")
      val qUnit = broadcast(
        PqCommon.unitTable(q0, "query_id", col("qv"), "query_id", "q_unit"))
      PqCommon.exactRerank(candidates, qUnit, unit, k)
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
    val base = corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .localCheckpoint()
    val dim = base.select(size(col("v"))).head().getInt(0)

    // coarse quantizer over full vectors — trained on a bounded driver
    // sample ([[LocalKMeans]]); assignment below stays distributed
    val coarse = LocalKMeans.fit(
      base.select(col("v")).limit(ProductQuantization.MaxTrainSample)
        .collect().map(_.getSeq[Double](0).toArray),
      nLists, iters = 8, seed = seed)
    def coarseLit(l: Int): Column =
      array(coarse(l).toIndexedSeq.map(lit): _*).cast("array<double>")

    // assignment: argmax_l (v·c_l − ½||c_l||²), native dots
    val listScores = array((0 until nLists).map(l =>
      dot(col("v"), coarseLit(l)) - lit(0.5 * coarse(l).map(x => x * x).sum)): _*)
    val assigned = base
      .withColumn("list", (array_position(listScores, array_max(listScores)) - 1).cast("int"))
      .withColumn("cvec", element_at(array((0 until nLists).map(coarseLit): _*), col("list") + 1))
      .withColumn("r", zip_with(col("v"), col("cvec"), (x, y) => x - y))
      .select("id", "v", "list", "r")
      .localCheckpoint()

    val sq = ProductQuantization.trainSubQuantizers(
      assigned, "r", dim, m, nCodes, seed + 1)
    val encoded = assigned.select(
      col("id").as("neighbor_id") +: col("list") +:
        (0 until m).map(i => sq.codeOf(col("r"), i).as(s"code_$i")): _*)
      .localCheckpoint()
    val unit = PqCommon.unitTable(base, "id", col("v"), "neighbor_id", "n_unit")
      .localCheckpoint()
    IndexScope.release(base)
    IndexScope.release(assigned)
    Index(coarse, sq, encoded, unit, nLists)
  }
}
