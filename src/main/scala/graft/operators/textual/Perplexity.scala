package graft.operators.textual

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Language-model perplexity filtering — the CCNet/Gopher-style quality
  * gate (Wenzek et al. 2020 train a KenLM on a reference corpus and drop
  * high-perplexity crawl documents). No external model artifact is
  * available here, so the model is an interpolated bigram LM trained on a
  * designated slice of the corpus itself (the "reference" slice standing
  * in for Wikipedia); every document is then scored against it.
  *
  * Model (all engine-portable arithmetic, mirrored in the DuckDB oracle):
  *  - unigram: p_u(w) = (c(w)+1) / (N+V+1) — add-one smoothed, so OOV
  *    tokens get mass 1/(N+V+1);
  *  - bigram ML rate: r(w1,w2) = c(w1,w2) / c(w1·) over the train slice
  *    (context counts from the bigram table itself, so the model is
  *    self-consistent at document edges);
  *  - interpolation with EXACT binary λ: p = 0.75·r + 0.25·p_u (λ chosen
  *    representable so the Spark and SQL literals are the same double).
  *
  * Score: per-position log2 p is rounded to 8 decimals and summed as
  * DECIMAL — exact, order-independent — then ppl = 2^(−Σ/n) rounded to 4
  * (the decimal trick makes the only FP-order-sensitive step a per-row
  * scalar, same as the suite's other float aggregates).
  *
  * Scale: the trained tables (bigram rates, unigram probs) ARE the model
  * artifact — at 100 TB you train on a bounded reference sample, so they
  * stay broadcastable and the scoring pass is a map-side join over the
  * corpus (AQE already picks broadcast here); the only shuffle is the
  * final per-doc aggregation.
  */
object Perplexity {

  private val dec = DecimalType(27, 8)

  /** The trained LM artifact: a bigram-rate table, a unigram-count
    * table, and the scalar (N+V+1) normalizer. At 100 TB these ARE the
    * reusable model — train once on the bounded reference slice, persist
    * with [[save]], score any number of corpora with [[score]]. */
  final case class Model(rate: DataFrame, uni: DataFrame, denom: Long)

  private def tokenize(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 2)

  /** Train the interpolated bigram LM on the `trainPred` slice. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column): Model = {
    val toks = tokenize(docs.where(trainPred), idCol, textCol)
    val grams = toks.select(
      explode(TextFunctions.shinglesAll(col("__toks"), 2)).as("g"))
    val bi = grams.groupBy("g").agg(count(lit(1)).as("cb"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
    val ctx = bi.groupBy("w1").agg(sum("cb").as("cw1"))
    // pre-divide into a (g, rate) model table: one scoring join on g
    // instead of separate bigram-count and context-count joins
    val rate = bi.join(ctx, "w1")
      .select(col("g"),
        (col("cb").cast("double") / col("cw1").cast("double")).as("rate"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    // the (N, V) normalizer is one row of metadata: collect it instead of
    // cross-joining a scalar frame (an untrained model must FAIL loudly —
    // with no reference slice every score would silently go null)
    val constsRow = uni.agg(sum("cu"), count(lit(1))).head()
    require(!constsRow.isNullAt(0) && constsRow.getLong(0) > 0,
      "perplexity train slice is empty: trainPred selected no scorable docs")
    Model(rate, uni, constsRow.getLong(0) + constsRow.getLong(1) + 1)
  }

  /** Score ALL docs against a trained (possibly loaded) model. Docs with
    * fewer than 2 tokens have no bigram evidence and are excluded.
    * Output: (doc_id, n_bigrams, ppl, keep = ppl <= maxPpl). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: Model, maxPpl: Double): DataFrame = {
    val toks = tokenize(docs, idCol, textCol)
    val pos = toks.select(col("doc_id"),
        explode(TextFunctions.shinglesAll(col("__toks"), 2)).as("g"))
      .withColumn("w2", substring_index(col("g"), " ", -1))
    val scored = pos
      .join(model.rate, Seq("g"), "left")
      .join(model.uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("cu", "cu2"), Seq("w2"), "left")
    val pUni = (coalesce(col("cu2"), lit(0L)) + 1).cast("double") /
      lit(model.denom).cast("double")
    val p = lit(0.75) * coalesce(col("rate"), lit(0.0)) + lit(0.25) * pUni
    val lp = round(log2(p), 8).cast(dec)
    val ppl = round(pow(lit(2.0), (-col("__slp")).cast("double") / col("n_bigrams")), 4)
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(lp).as("__slp"))
      .select(col("doc_id"), col("n_bigrams"), ppl.as("ppl"),
        (ppl <= maxPpl).as("keep"))
  }

  /** Train on `trainPred` docs, score ALL docs (train docs included, as in
    * CCNet where the reference corpus is also scored). */
  def scoreFilter(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column, maxPpl: Double): DataFrame =
    score(docs, idCol, textCol, train(docs, idCol, textCol, trainPred), maxPpl)

  /** Persist the model artifact as transactional tables (the
    * VectorIndexStore pattern for the LM): rate, unigram, and a one-row
    * meta table under `dir` — train once, [[load]] in any later job. */
  def save(model: Model, dir: String): Unit = {
    import graft.sources.ManifestTable
    val spark = model.rate.sparkSession
    import spark.implicits._
    ManifestTable.overwrite(model.rate, s"$dir/rate")
    ManifestTable.overwrite(model.uni, s"$dir/uni")
    ManifestTable.overwrite(Seq(model.denom).toDF("denom"), s"$dir/meta")
  }

  /** Load a [[save]]d model; fails loudly on a missing/empty artifact. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    import graft.sources.ManifestTable
    val denomRows = ManifestTable.read(spark, s"$dir/meta")
      .select("denom").collect()
    require(denomRows.length == 1,
      s"LM artifact at $dir has ${denomRows.length} meta rows, expected 1")
    Model(ManifestTable.read(spark, s"$dir/rate"),
      ManifestTable.read(spark, s"$dir/uni"), denomRows(0).getLong(0))
  }
}
