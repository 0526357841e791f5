package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign documents to fixed-capacity
  * token bins ("concat-and-chop" packing) deterministically.
  *
  * Documents are ordered inside each shard by a stable hash of their id
  * (so packing is reproducible and independent of physical partitioning),
  * then a running token total assigns bin `floor(cumsum_before / capacity)`
  * — the greedy concatenation order a sequence-packing writer consumes.
  *
  * Scale shape: ONE window over (shard, hash-order) — a single exchange
  * partitioned by shard. The shard column bounds every window partition
  * (lang, source, date bucket...), which is what keeps the sort local at
  * 100 TB; an unsharded corpus should pass a synthetic shard =
  * hash-bucket column instead of forcing a global sort. */
object Packing {

  /** @return input plus `bin_idx` (0-based within shard) and
    * `offset_tokens` (token offset of this doc inside its bin's
    * concatenation stream). */
  def packBins(df: DataFrame, idCol: String, shardCol: String,
      tokenCol: String, capacity: Long,
      order: Column => Column = Sampling.knuthBucket(_, 1000000)): DataFrame = {
    require(capacity > 0)
    val w = Window.partitionBy(shardCol)
      .orderBy(order(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      // token offset of this doc inside the running concatenation: always
      // >= 0, so truncating and flooring division agree below
      .withColumn("__prev", col("__cum") - col(tokenCol))
      // integer `div`, not `/`: Spark's / on longs is double division, and
      // near bin boundaries the double quotient rounds UP once cumulative
      // sums exceed ~2^47 (double spacing > 1/capacity) — landing a doc in
      // the wrong bin at corpus scale. `div` matches the oracle's `//`
      // (Spark div truncates toward zero, Python // floors — identical on
      // the non-negative __prev). Referencing the pre-computed __prev keeps
      // arbitrary user column names out of the parsed expression.
      .withColumn("bin_idx", expr(s"__prev div ${capacity}L"))
      .withColumn("offset_tokens", col("__prev") % capacity)
      .drop("__cum", "__prev")
  }
}
