package graft.operators.textual

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of corpus
  * curation (the GPT-3 WebText-quality classifier shape, Brown et al.
  * 2020 Appendix A: score every document with a cheap linear model,
  * keep high scorers): a logistic model over engine-exact text features
  * ([[TextStats.quality]]'s rounded ratios), trained DRIVER-SIDE on a
  * bounded labeled sample — the same sample-train / broadcast-score
  * lifecycle as [[graft.operators.similarity.LocalKMeans]] and
  * [[Perplexity]]; at 100 TB a classifier trains on 10^4-10^6 labeled
  * rows regardless of corpus size — and scored DISTRIBUTED as a codegen
  * projection with the weights inlined as literals (no join, no UDF,
  * no shuffle).
  *
  * Training is deterministic: full-batch gradient descent, fixed epoch
  * count and learning rate, samples taken in a deterministic order. */
object QualityClassifier {

  final case class Model(featureCols: Seq[String], weights: Array[Double],
      bias: Double)

  /** Full-batch logistic GD over at most `maxSamples` rows of
    * `labeled` (deterministic `orderBy(idCol)` sample). */
  def train(labeled: DataFrame, idCol: String, featureCols: Seq[String],
      labelCol: String, maxSamples: Int = 8192, epochs: Int = 3000,
      learningRate: Double = 5.0): Model = {
    val rows = labeled
      .select((col(idCol) +: featureCols.map(c => col(c).cast("double")) :+
        col(labelCol).cast("boolean")): _*)
      .orderBy(col(idCol)).limit(maxSamples).collect()
    require(rows.nonEmpty, "classifier train slice is empty")
    val n = rows.length
    val d = featureCols.length
    val x = rows.map(r => Array.tabulate(d)(j => r.getDouble(j + 1)))
    val y = rows.map(r => if (r.getBoolean(d + 1)) 1.0 else 0.0)
    require(y.sum > 0 && y.sum < n,
      "classifier train slice is single-class: nothing to learn")
    val w = new Array[Double](d)
    var b = 0.0
    var e = 0
    while (e < epochs) {
      val gw = new Array[Double](d)
      var gb = 0.0
      var i = 0
      while (i < n) {
        var z = b
        var j = 0
        while (j < d) { z += w(j) * x(i)(j); j += 1 }
        val g = 1.0 / (1.0 + math.exp(-z)) - y(i)
        j = 0
        while (j < d) { gw(j) += g * x(i)(j); j += 1 }
        gb += g
        i += 1
      }
      var j = 0
      while (j < d) { w(j) -= learningRate * gw(j) / n; j += 1 }
      b -= learningRate * gb / n
      e += 1
    }
    Model(featureCols, w, b)
  }

  /** Sigmoid score as a codegen projection: weights are literals. */
  def score(df: DataFrame, model: Model, out: String = "p_keep"): DataFrame = {
    val z = model.featureCols.zip(model.weights.toIndexedSeq)
      .map { case (c, wi) => col(c) * lit(wi) }
      .foldLeft(lit(model.bias): Column)(_ + _)
    df.withColumn(out, lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** Fraction of rows where (p >= 0.5) matches the boolean label. */
  def accuracy(scored: DataFrame, labelCol: String,
      scoreCol: String = "p_keep"): Double =
    scored.agg(avg(when((col(scoreCol) >= 0.5) === col(labelCol), 1.0)
      .otherwise(0.0))).head.getDouble(0)
}
