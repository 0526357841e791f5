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

  /** Deterministic TOKEN-BUDGET sampling per source: admit documents in
    * pseudo-random (Knuth-hash) order until each source's running token
    * total reaches its budget — the corpus-assembly step that fills a
    * training mix to a per-source TOKEN target rather than a row count
    * (sources differ wildly in tokens/doc, so row sampling misses the
    * budget). A document is kept while its cumulative tokens ≤ budget;
    * the first over-budget document is cut — the boundary rule any
    * engine reproduces exactly. Membership is a pure function of
    * (id, token counts, budgets).
    *
    * The running total is a DISTRIBUTED PREFIX SUM, not one window
    * partition per source (which would serialize each source through a
    * single task — the scale cliff at 100 TB, where one source can be
    * most of the corpus): rows hash into `buckets` ranges forming the
    * major sort key, per-(source, bucket) token partials aggregate
    * map-side-combined to an O(sources × buckets) frame, cross-bucket
    * offsets are computed on that tiny frame and broadcast back, and the
    * within-bucket cumsum runs as a window over (source, bucket) —
    * parallelism = sources × buckets, one data shuffle total.
    *
    * @param budgets (sourceCol, budget) — token budget per source value.
    * @return kept rows plus `cum_tokens` (running total along the
    *         admission order, ≤ that source's budget). */
  def tokenBudget(df: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, budgets: DataFrame, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .withColumn("__b", knuthBucket(col(idCol), buckets).cast("int"))
      .withColumn("__h", knuthBucket(col(idCol), 1000000))
    val partials = base.groupBy(col(sourceCol), col("__b"))
      .agg(sum(col(tokensCol)).as("__part"))
    val offW = Window.partitionBy(sourceCol).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partials.withColumn("__off",
      coalesce(sum(col("__part")).over(offW), lit(0L))).drop("__part")
    val inW = Window.partitionBy(col(sourceCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(offsets), Seq(sourceCol, "__b"))
      .withColumn("cum_tokens",
        col("__off") + sum(col(tokensCol)).over(inW))
      .join(broadcast(budgets), Seq(sourceCol))
      .where(col("cum_tokens") <= col("budget"))
      .drop("__b", "__h", "__off", "budget")
  }

  /** Greedy sequential TRAINING-SHARD assignment: documents are laid out
    * in deterministic Knuth-hash shuffle order (the corpus shuffle every
    * training run needs, reproducible across engines and partitionings —
    * unlike a `rand()` sort) and packed into shards of `shardTokens`
    * tokens: a document belongs to the shard its cumulative-token span
    * STARTS in, `shard_id = (cum - n_tok) div shardTokens` — so shards
    * are contiguous runs of the shuffled order, every shard except the
    * last holds ≥ shardTokens tokens once its successor opens, and the
    * assignment is a pure function of (ids, token counts) that any
    * engine reproduces exactly.
    *
    * The running total is the same DISTRIBUTED PREFIX SUM as
    * [[tokenBudget]], minus the per-source partition: rows hash into
    * `buckets` ranges (the major sort key), per-bucket token partials
    * aggregate map-side-combined into an O(buckets) frame, cross-bucket
    * offsets are a window over that tiny frame (one task on `buckets`
    * rows — metadata, not data), and the within-bucket cumsum is a
    * window over each bucket. One data shuffle; parallelism = buckets.
    * A single global `Window.orderBy` over the data — the obvious
    * formulation — would serialize the whole corpus through one task.
    *
    * @return input plus `cum_tokens` (running total along the shuffle
    *         order, inclusive) and `shard_id` (0-based). */
  def shardByTokens(df: DataFrame, idCol: String, tokensCol: String,
      shardTokens: Long, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardTokens > 0, "shardTokens must be positive")
    val base = df
      .withColumn("__b", knuthBucket(col(idCol), buckets).cast("int"))
      .withColumn("__h", knuthBucket(col(idCol), 1000000))
    val partials = base.groupBy(col("__b"))
      .agg(sum(col(tokensCol)).as("__part"))
    // one window task over `buckets` rows — the lit(0) partition is
    // deliberate: the frame is metadata-sized by construction
    val offW = Window.partitionBy(lit(0)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partials.withColumn("__off",
      coalesce(sum(col("__part")).over(offW), lit(0L))).drop("__part")
    val inW = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("cum_tokens",
        col("__off") + sum(col(tokensCol)).over(inW))
      .withColumn("shard_id",
        expr(s"(cum_tokens - `$tokensCol`) div $shardTokens"))
      .drop("__b", "__h", "__off")
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
