package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969) — the
  * principled form of the reference's cross-warehouse entity matching
  * (profiles/jobs synced from several origins rarely share clean keys;
  * reference unified models exist exactly so records CAN be compared
  * field-by-field).
  *
  * Model: for each comparison field, agreement contributes log2(m/u)
  * and disagreement log2((1-m)/(1-u)) to a pair's match score (m = P
  * (agree | same entity), u = P(agree | different entities)); a pair is
  * a link when the summed score clears a threshold. Weights here are
  * caller-supplied INTEGERS (milli-bits or any fixed-point scale): the
  * score is then an exact BIGINT sum — engine-portable, no FP noise in
  * the oracle compare, and the natural form once weights are estimated
  * offline (EM over a sample, at 100 TB always on a sample).
  *
  * Execution shape: candidate generation is BLOCKING — an equi-join on
  * `blockCols`, i.e. one hash-partitioned shuffle join; pairs never
  * materialize beyond each block. Block sizing is the scale lever (a
  * 100-row block is 10^4 pairs, a 10^5-row block is 10^10 — pick keys
  * accordingly, or salt hot blocks); scoring itself is a codegen'd
  * projection, no extra shuffle. */
object Linkage {

  /** One field comparison: `agree` evaluates on (left column, right
    * column); integer weights added to the score on agree/disagree.
    * A null-involved comparison evaluates agree=false (SQL three-valued
    * logic collapses to the disagree branch), matching CASE WHEN. */
  final case class FieldRule(name: String,
      agree: (Column, Column) => Column,
      agreeWeight: Long, disagreeWeight: Long)

  /** Exact-equality rule. */
  def eqRule(name: String, aw: Long, dw: Long): FieldRule =
    FieldRule(name, (l, r) => l === r, aw, dw)

  /** Case-insensitive string equality. */
  def eqLowerRule(name: String, aw: Long, dw: Long): FieldRule =
    FieldRule(name, (l, r) => lower(l) === lower(r), aw, dw)

  /** Numeric proximity: agree when |l - r| <= tol. */
  def withinRule(name: String, tol: Double, aw: Long, dw: Long): FieldRule =
    FieldRule(name, (l, r) => abs(l - r) <= tol, aw, dw)

  /** Scored candidate pairs: block-join `a`×`b` on `blockCols`, sum the
    * field-rule weights, keep pairs with score >= threshold. Output:
    * (idA as a_id, idB as b_id, score). Column name collisions are
    * resolved by prefixing the right side internally. */
  def linkPairs(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      idA: String, idB: String, rules: Seq[FieldRule],
      threshold: Long): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — an unblocked " +
      "linkage is a cross join; at scale that is never what you want")
    require(rules.nonEmpty, "at least one field rule")
    val l = a.select(
      (blockCols.map(col) :+ col(idA).as("a_id")) ++
        rules.map(r => col(r.name).as(s"__la_${r.name}")): _*)
    val r = b.select(
      (blockCols.map(col) :+ col(idB).as("b_id")) ++
        rules.map(ru => col(ru.name).as(s"__rb_${ru.name}")): _*)
    val score: Column = rules.map { ru =>
      when(ru.agree(col(s"__la_${ru.name}"), col(s"__rb_${ru.name}")),
        lit(ru.agreeWeight)).otherwise(lit(ru.disagreeWeight))
    }.reduce(_ + _)
    // hash-partition the probe side on the block keys BEFORE the join:
    // when the right side broadcasts (small dim), the pair scoring
    // inherits the left's file partitioning — a single-file input would
    // score every block's pair fan-out in ONE task. The partition count
    // is EXPLICIT because the exchange must survive AQE: the pre-join
    // row count is tiny (AQE would coalesce to one partition), while the
    // post-join fan-out is blocksize² per block — invisible to AQE's
    // input-size estimate.
    val shufflePartitions =
      a.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    l.repartition(shufflePartitions, blockCols.map(col): _*)
      .join(r, blockCols)
      .select(col("a_id"), col("b_id"), score.as("score"))
      .where(col("score") >= threshold)
  }

  // ------------------------------------------------------- EM estimation

  /** A comparison field for EM estimation: name + agreement predicate,
    * no weights yet (estimation produces them). */
  final case class EmField(name: String, agree: (Column, Column) => Column)

  final case class FieldEstimate(name: String, m: Double, u: Double,
      agreeWeight: Long, disagreeWeight: Long)

  /** EM-estimated Fellegi-Sunter parameters. `threshold` is the integer
    * score at which the posterior match probability crosses 1/2
    * (score >= scale·log2((1-λ)/λ)) — the natural link cutoff for
    * [[linkPairs]] with the estimated rules. */
  final case class EmEstimate(lambda: Double, scale: Long,
      fields: Seq[FieldEstimate]) {
    def threshold: Long =
      math.ceil(scale * math.log((1 - lambda) / lambda) / math.log(2.0)).toLong
    def rules(emFields: Seq[EmField]): Seq[FieldRule] = {
      require(emFields.map(_.name) == fields.map(_.name),
        "field list must match the one estimation ran on")
      emFields.zip(fields).map { case (f, e) =>
        FieldRule(f.name, f.agree, e.agreeWeight, e.disagreeWeight) }
    }
  }

  /** Fellegi-Sunter EM over blocked candidate pairs (the classic
    * unsupervised estimator, Winkler 1988 / the Splink lineage): learns
    * λ = P(pair is a match), m_f = P(field f agrees | match), u_f =
    * P(agrees | non-match) from the agreement-PATTERN distribution, then
    * converts to the integer weights [[linkPairs]] consumes
    * (round(scale·log2(m/u)) / round(scale·log2((1-m)/(1-u)))).
    *
    * Scale shape: the ONLY distributed work is one blocked join that
    * collapses pairs to at most 2^K pattern counts (groupBy on K bits —
    * map-side combinable, fixed-size state); EM then iterates on the
    * driver over those ≤2^K numbers. At 100 TB, run it on a blocked
    * SAMPLE of a/b — the estimator needs pattern frequencies, not the
    * corpus (sample first; the pattern pass costs one shuffle of the
    * sampled pairs). Deterministic: no RNG anywhere — init is m=0.9,
    * u = the observed marginal agreement rate (pairs are overwhelmingly
    * non-matches, so the marginal is a good u seed and puts the m/u
    * labels the right way around). */
  def estimateWeights(a: DataFrame, b: DataFrame, blockCols: Seq[String],
      fields: Seq[EmField], scale: Long = 1000, lambdaInit: Double = 0.1,
      maxIters: Int = 100, tol: Double = 1e-10): EmEstimate = {
    require(blockCols.nonEmpty && fields.nonEmpty)
    require(fields.size <= 20, "2^K pattern state: keep K small")
    val l = a.select(
      blockCols.map(col) ++
        fields.map(f => col(f.name).as(s"__la_${f.name}")): _*)
    val r = b.select(
      blockCols.map(col) ++
        fields.map(f => col(f.name).as(s"__rb_${f.name}")): _*)
    val bits = fields.map(f =>
      when(f.agree(col(s"__la_${f.name}"), col(s"__rb_${f.name}")), 1)
        .otherwise(0).as(s"__g_${f.name}"))
    // same block-parallelism shuffle as linkPairs — the partition count
    // is EXPLICIT for the same reason (the pre-join sample is tiny, so
    // AQE would coalesce the exchange to one task and the blocksize²
    // pattern fan-out would serialize through it)
    val emPartitions =
      a.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val patterns = l.repartition(emPartitions, blockCols.map(col): _*)
      .join(r, blockCols)
      .select(bits: _*)
      .groupBy(fields.map(f => col(s"__g_${f.name}")): _*)
      .count()
      .collect()
      .map(row => (fields.indices.map(row.getInt).toVector,
        row.getLong(fields.size)))
      .toSeq
    emOnPatterns(patterns, fields.map(_.name), scale, lambdaInit,
      maxIters, tol)
  }

  /** Driver-side EM on agreement-pattern counts (exposed for specs:
    * feeding exact expected counts recovers the generating parameters). */
  private[graft] def emOnPatterns(patterns: Seq[(Vector[Int], Long)],
      names: Seq[String], scale: Long, lambdaInit: Double,
      maxIters: Int, tol: Double): EmEstimate = {
    val k = names.size
    val total = patterns.map(_._2).sum.toDouble
    require(total > 0, "no candidate pairs to estimate from")
    def clamp(x: Double) = math.min(1 - 1e-6, math.max(1e-6, x))
    var lambda = clamp(lambdaInit)
    val m = Array.fill(k)(0.9)
    val u = Array.tabulate(k)(f =>
      clamp(patterns.collect { case (g, c) if g(f) == 1 => c }.sum / total))
    var prevLl = Double.NegativeInfinity
    var iter = 0
    var done = false
    while (iter < maxIters && !done) {
      val sumWg = Array.fill(k)(0.0)
      val sumUg = Array.fill(k)(0.0)
      var sumW = 0.0
      var ll = 0.0
      patterns.foreach { case (g, c) =>
        var pm = lambda
        var pu = 1 - lambda
        var f = 0
        while (f < k) {
          pm *= (if (g(f) == 1) m(f) else 1 - m(f))
          pu *= (if (g(f) == 1) u(f) else 1 - u(f))
          f += 1
        }
        val w = pm / (pm + pu)
        sumW += w * c
        ll += c * math.log(pm + pu)
        f = 0
        while (f < k) {
          if (g(f) == 1) { sumWg(f) += w * c; sumUg(f) += (1 - w) * c }
          f += 1
        }
      }
      lambda = clamp(sumW / total)
      var f = 0
      while (f < k) {
        m(f) = clamp(sumWg(f) / math.max(sumW, 1e-12))
        u(f) = clamp(sumUg(f) / math.max(total - sumW, 1e-12))
        f += 1
      }
      iter += 1
      done = prevLl != Double.NegativeInfinity &&
        math.abs(ll - prevLl) <= tol * math.abs(prevLl)
      prevLl = ll
    }
    def bits(x: Double) = math.log(x) / math.log(2.0)
    EmEstimate(lambda, scale, names.indices.map { f =>
      FieldEstimate(names(f), m(f), u(f),
        math.round(scale * bits(m(f) / u(f))),
        math.round(scale * bits((1 - m(f)) / (1 - u(f)))))
    })
  }
}
