package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular per-key event series
  * onto a DENSE integer grid (every index between each key's first and
  * last observation), then fill the introduced gaps — zero-fill for
  * additive measures, forward-fill for categorical/state columns. The
  * standard prep step before per-key feature windows (rolling averages,
  * lag features) whose semantics assume one row per period.
  *
  * Scale shape: the grid explode is bounded by each key's span (not the
  * global span), the grid-to-observation join is a plain shuffle join on
  * (key, idx) co-partitioned with the aggregation that produced the
  * observations, and the forward-fill is one window per key ordered by
  * the grid index — parallelism = keys, state = one row. Nothing is
  * driver-side; a 100 TB series table resamples in three exchanges
  * (agg, span, window).
  */
object Resample {

  /** Densify `perIdx` (one row per (key, idx) observation) to every idx
    * in [min(idx), max(idx)] per key. Gap rows carry nulls for all other
    * columns. */
  def denseGrid(perIdx: DataFrame, keyCol: String, idxCol: String): DataFrame = {
    val span = perIdx.groupBy(keyCol)
      .agg(min(col(idxCol)).as("__d0"), max(col(idxCol)).as("__d1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"))).as(idxCol))
    grid.join(perIdx, Seq(keyCol, idxCol), "left")
  }

  /** Forward-fill `cols` within each key along ascending `idxCol` (last
    * non-null value wins; leading gaps stay null). */
  def ffill(df: DataFrame, keyCol: String, idxCol: String,
      cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Replace nulls in additive measure columns with typed zeros. */
  def zeroFill(df: DataFrame, fills: Map[String, Column]): DataFrame =
    fills.foldLeft(df) { case (d, (c, z)) =>
      d.withColumn(c, coalesce(col(c), z))
    }
}
