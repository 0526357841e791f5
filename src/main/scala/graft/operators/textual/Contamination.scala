package graft.operators.textual

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination check (test-set decontamination): for every
  * training document, count how many of its distinct word n-grams also
  * appear in a held-out benchmark corpus. Documents sharing any benchmark
  * n-gram are flagged for removal before training — the standard
  * 8–13-gram collision rule (GPT-3 appendix C / PaLM style).
  *
  * Scale shape: the benchmark n-gram set is DISTINCT n-grams of the eval
  * suites — metadata-sized next to a 100 TB corpus — so it broadcasts and
  * the per-doc overlap is a broadcast left-semi-ish join + groupBy on
  * doc_id: one pass over the corpus grams, no shuffle of the corpus
  * against itself. */
object Contamination {

  /** @param corpus training docs (idCol, textCol)
    * @param benchmark eval docs (textCol)
    * @return per corpus doc: distinct n-gram count, contaminated n-gram
    * count, contamination fraction, and the removal flag. */
  def check(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n > 0)
    // bind the token array to an attribute BEFORE shingling: the shingle
    // lambda is interpreted (CodegenFallback), and each of its k
    // element_at calls would otherwise re-run the full tokenize regex on
    // the text — O(shingles × k) regex evaluations per document
    // (measured 31s → <1s at sf0.1; same trap documented in
    // SetSimJoin.scala:31).
    // array_distinct BEFORE the explode: the GPT-3-style rule counts each
    // doc's DISTINCT n-grams, and per-row dedup costs no shuffle while
    // shrinking the exploded join input (a degenerate doc repeating one
    // gram contributes 1 row, not n_positions rows)
    def grams(df: DataFrame, cols: Seq[String]): DataFrame =
      df.select((TextFunctions.tokens(col(textCol)).as("__toks") +: cols.map(col)): _*)
        .select((explode(array_distinct(TextFunctions.shingles(
          col("__toks"), n))).as("gram") +: cols.map(col)): _*)
    val benchGrams = grams(benchmark, Seq.empty).distinct()
    grams(corpus, Seq(idCol))
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("gram"), "left")
      .groupBy(col(idCol).as("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_grams"), 6)
          .as("contaminated_frac"),
        (col("n_contaminated") > 0).as("flagged"))
  }
}
