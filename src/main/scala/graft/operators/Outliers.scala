package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Group-wise statistical outlier detection — the data-quality pass that
  * runs after [[Profile]]'s structural checks (reference pipelines
  * validate each record against a schema; distributed validation also
  * needs DISTRIBUTIONAL checks: a price 40σ from its group's mean is a
  * sync bug even when the schema accepts it).
  *
  * Shape: one partial-aggregated groupBy computes each group's exact
  * decimal (n, Σx, Σx²) — order-independent, so Spark and a SQL oracle
  * agree bit-for-bit — then the tiny stats table broadcasts back onto
  * the rows and the z² test `(x − mean)² > z²·var` evaluates as a
  * codegen projection. Two scans of the fact, zero extra shuffles, and
  * the flagged output is the small side. Sample variance
  * (Σx² − (Σx)²/n)/(n−1); groups with n < 2 have no variance and flag
  * nothing. */
object Outliers {

  // precision >18 forces int128-backed decimal arithmetic in DuckDB-like
  // engines (an int64-width square overflows there), while staying well
  // inside Spark's 38-digit cap after the product
  private val dec = "decimal(19,2)"

  /** Rows whose `valueCol` lies more than `z` sample standard deviations
    * from their group's mean. Output: the `keep` columns + group columns
    * + `n` (group size). */
  def flag(df: DataFrame, groupCols: Seq[String], valueCol: String,
      z: Double, keep: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && keep.nonEmpty)
    val x = col(valueCol).cast(dec)
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(x).as("__s"),
        sum(x * x).as("__s2"))
    val joined = df.join(F.broadcast(stats), groupCols)
    // the decimal sums are exact; the scalar test then runs in DOUBLE
    // with one fixed expression shape so any SQL engine reproduces it
    val sD = col("__s").cast("double")
    val s2D = col("__s2").cast("double")
    val nD = col("__n").cast("double")
    val mean = sD / nD
    val variance = (s2D - sD * sD / nD) / (nD - 1.0)
    val dev = col(valueCol).cast("double") - mean
    joined
      .where(col("__n") >= 2 && dev * dev > lit(z * z) * variance)
      .select((keep ++ groupCols).map(col) :+ col("__n").as("n"): _*)
  }
}
