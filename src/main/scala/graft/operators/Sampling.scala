package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * Rows are assigned to named splits by hashing a stable id into 100
  * buckets — reproducible across runs, engines, and repartitioning
  * (unlike `randomSplit`, which depends on partitioning), and any
  * downstream system can recompute membership from the id alone.
  *
  * Default bucket hash is Knuth's multiplicative scheme
  * `(id * 2654435761) mod 2^32 mod 100`: plain integer arithmetic, so it
  * is portable to any SQL engine (the DuckDB oracle replicates it
  * exactly) and never overflows a 64-bit signed long for ids < ~3.4e9.
  * For string or larger keys pass a custom bucket expression (e.g.
  * `pmod(xxhash64(col), 100)`).
  */
object Sampling {

  def knuthBucket(idCol: Column, buckets: Int = 100): Column =
    pmod(pmod(idCol * lit(2654435761L), lit(4294967296L)), lit(buckets))

  /** @param splits (name, percent) — must sum to 100.
    * @return input plus a `split` column. */
  def deterministicSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)],
      bucket: Column => Column = knuthBucket(_, 100)): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(col(idCol))
    val cut = splits.scanLeft(0)(_ + _._2).tail
    val assignment = splits.zip(cut).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), els) => when(b < hi, lit(name)).otherwise(els)
    }
    df.withColumn("split", assignment)
  }

  /** Deterministic source-weighted training mix — the data-mix curation
    * step of corpus assembly (downsample noisy sources, upsample scarce
    * high-quality ones for multiple epochs), as a pure function of
    * (id, key): each row is emitted `floor(ppm/1e6)` times, plus one more
    * when its million-bucket Knuth hash falls under `ppm mod 1e6`.
    * Weights are integer PARTS-PER-MILLION, so every comparison is
    * integer-exact and engine-portable (no float-weight boundary drift).
    * Output adds `copy_idx` (1..copies); rows with zero copies drop.
    * No shuffle — one projection + bounded explode. */
  def weightedMix(df: DataFrame, idCol: String, keyCol: String,
      ppmWeights: Map[String, Long], defaultPpm: Long = 1000000L): DataFrame = {
    require((defaultPpm +: ppmWeights.values.toSeq).forall(_ >= 0))
    val ppm = ppmWeights.toSeq.sortBy(_._1).foldLeft(lit(defaultPpm)) {
      case (els, (k, v)) => when(col(keyCol) === k, lit(v)).otherwise(els)
    }
    val h = knuthBucket(col(idCol), 1000000)
    df.withColumn("__copies",
        (ppm.cast("long") / lit(1000000L)).cast("long") +
          when(h < ppm % 1000000L, 1L).otherwise(0L))
      .where(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Deterministic stratified sample targeting ~`target` rows PER STRATUM
    * (balanced eval-set construction: small strata are kept whole, large
    * strata are down-sampled to the target).
    *
    * Per-stratum rate = target/n_s, applied as an integer threshold on a
    * million-bucket Knuth hash of the id — membership is a pure function
    * of (id, stratum size), reproducible on any engine, and the sample is
    * stable under repartitioning. Two passes: one map-side-combined count
    * per stratum (broadcast back — O(strata) rows), one filtered scan. No
    * shuffle of the data itself. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n_stratum"))
    val h = knuthBucket(col(idCol), 1000000)
    df.join(broadcast(counts), Seq(stratumCol))
      // integer division (`div`, DuckDB `//`): double `/` then truncate
      // could land on the wrong side of the threshold for edge quotients
      .where(h < expr(s"CAST(${target * 1000000L} AS BIGINT) div __n_stratum"))
      .drop("__n_stratum")
  }
}
