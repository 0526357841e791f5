package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built on codegen'd
  * higher-order functions (`zip_with`/`aggregate`) — no UDFs, so the whole
  * similarity pipeline stays inside WholeStageCodegen. */
object VectorFunctions {

  /** Element-wise cast to array<double>: similarity math runs in double so
    * Spark and the DuckDB oracle agree to ~1e-15 instead of float noise. */
  def toDouble(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column = {
    val d = zip_with(toDouble(a), toDouble(b), (x, y) => x - y)
    aggregate(d, lit(0.0), (acc, v) => acc + v * v)
  }
}
