package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns. The hot path (dot
  * product) is a native codegen'd Catalyst expression
  * ([[graft.plans.DotProduct]]); higher-order functions are interpreted
  * (CodegenFallback) and ~100× slower per pair. */
object VectorFunctions {

  /** Element-wise cast to array<double>: similarity math runs in double so
    * Spark and the DuckDB oracle agree to ~1e-15 instead of float noise. */
  def toDouble(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.DotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** One-shot cosine: dot + both norms fused into ONE generated loop
    * ([[graft.plans.CosineSimilarity]]). For scoring the same vectors
    * against many partners, pre-normalize once and use [[dot]] instead —
    * the norm work then amortizes. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.CosineSimilarity(
        org.apache.spark.sql.graft.ColumnBridge.expression(toDouble(a)),
        org.apache.spark.sql.graft.ColumnBridge.expression(toDouble(b))))

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column = {
    val d = zip_with(toDouble(a), toDouble(b), (x, y) => x - y)
    aggregate(d, lit(0.0), (acc, v) => acc + v * v)
  }
}
