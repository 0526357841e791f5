package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-aggregable aggregate specs for two-phase (salted) aggregation. */
sealed trait MergeableAgg { def alias: String }
final case class SumAgg(column: String, alias: String) extends MergeableAgg
final case class CountAgg(alias: String) extends MergeableAgg
final case class MinAgg(column: String, alias: String) extends MergeableAgg
final case class MaxAgg(column: String, alias: String) extends MergeableAgg

/** Skew-resistant aggregation: salt the group key so one hot key spreads
  * over `saltBuckets` reducers, aggregate partially, then merge partials
  * by the true key.
  *
  * Spark's map-side partial aggregation already handles most skew for
  * algebraic aggregates; explicit salting matters when the DISTINCT key
  * count per reducer is the bottleneck or when composing with joins on
  * the salted key. AQE's skew-join handling covers joins; this utility is
  * the aggregation-side tool. Only re-aggregable (algebraic) aggregates
  * are accepted — averages compose as SumAgg/CountAgg and divide after.
  */
object Salting {

  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      aggs: Seq[MergeableAgg]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    // deterministic salt (hash of the whole row modulo buckets) — spreads
    // rows of a hot key without an RNG (keeps retries/speculation safe)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val phase1: Seq[Column] = aggs.map {
      case SumAgg(c, a)   => sum(col(c)).as(a)
      case CountAgg(a)    => count(lit(1)).as(a)
      case MinAgg(c, a)   => min(col(c)).as(a)
      case MaxAgg(c, a)   => max(col(c)).as(a)
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
    val phase2: Seq[Column] = aggs.map {
      case SumAgg(_, a)   => sum(col(a)).as(a)
      case CountAgg(a)    => sum(col(a)).as(a)
      case MinAgg(_, a)   => min(col(a)).as(a)
      case MaxAgg(_, a)   => max(col(a)).as(a)
    }
    partial.groupBy(keys.map(col): _*).agg(phase2.head, phase2.tail: _*)
  }
}
