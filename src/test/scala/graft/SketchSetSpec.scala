package graft

import graft.plans.{FreqSketchFns, GraftExtensions}
import org.apache.spark.sql.functions._

/** Theta set-algebra and frequent-items aggregates: library-bound
  * contracts through distributed partial merges. */
class SketchSetSpec extends SparkSpecBase {
  import spark.implicits._

  test("theta intersection bounds hold the exact overlap across a shuffle") {
    GraftExtensions.register(spark)
    // A = 0..5999, B = 3000..8999 → |A∩B| = 3000 exactly
    val df = spark.range(9000).repartition(8)
      .select(col("id"),
        when(col("id") < 6000, "a").otherwise(null).as("sa"),
        when(col("id") >= 3000, "b").otherwise(null).as("sb"))
    val sks = df.agg(
      expr("graft_theta_agg(CASE WHEN sa IS NOT NULL THEN id END)").as("ska"),
      expr("graft_theta_agg(CASE WHEN sb IS NOT NULL THEN id END)").as("skb"))
      .select(expr("graft_theta_intersect_bounds(ska, skb)").as("bnd"))
      .as[Seq[Double]].head()
    assert(sks(0) <= 3000.0 && 3000.0 <= sks(2),
      s"exact 3000 outside [${sks(0)}, ${sks(2)}]")
    assert(sks(0) <= sks(1) && sks(1) <= sks(2), "bounds not ordered")
  }

  test("theta union of partial sketches bounds the exact distinct count") {
    GraftExtensions.register(spark)
    val parts = spark.range(20000)
      .select((col("id") % 5).as("b"), (col("id") % 7000).as("k"))
      .groupBy("b").agg(expr("graft_theta_agg(k)").as("sk"))
    val bnd = parts.agg(expr("graft_theta_union(sk)").as("u"))
      .select(expr("graft_theta_intersect_bounds(u, u)").as("bnd"))
      .as[Seq[Double]].head()
    assert(bnd(0) <= 7000.0 && 7000.0 <= bnd(2),
      s"exact 7000 outside [${bnd(0)}, ${bnd(2)}]")
  }

  test("freq sketch: exact stream length, no false negatives, item bounds") {
    GraftExtensions.register(spark)
    // zipf-ish: token t_i appears ~N/i times
    val rows = (1 to 50).flatMap(i => Seq.fill(3000 / i)(s"t_$i"))
    val df = rows.toDF("tok").repartition(16)
    val bytes = df.agg(expr("graft_freq_agg(tok)"))
      .head.getAs[Array[Byte]](0)
    assert(FreqSketchFns.streamLength(bytes) == rows.size.toLong)
    val exact = rows.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    val threshold = rows.size / 20L // 5%
    val heavy = FreqSketchFns.frequentItems(bytes, threshold)
    val returned = heavy.map(_._1).toSet
    val trueHeavy = exact.filter(_._2 >= threshold).keySet
    assert(trueHeavy.subsetOf(returned),
      s"missing heavy items: ${trueHeavy -- returned}")
    heavy.foreach { case (item, _, lb, ub) =>
      val n = exact.getOrElse(item, 0L)
      assert(lb <= n && n <= ub, s"'$item' count $n outside [$lb, $ub]")
    }
  }

  test("freq sketch merge is associative enough: error within the bound") {
    GraftExtensions.register(spark)
    val rows = (1 to 2000).map(i => s"t_${i % 100}")
    val bytes = rows.toDF("tok").repartition(8)
      .agg(expr("graft_freq_agg(tok)")).head.getAs[Array[Byte]](0)
    // 100 items at count 20 each fit the 1024-slot map: zero error
    assert(FreqSketchFns.maximumError(bytes) == 0L,
      "under-capacity stream must be tracked exactly")
    val all = FreqSketchFns.frequentItems(bytes, 1L)
    assert(all.size == 100 && all.forall(_._2 == 20L),
      "exact-mode counts drifted through distributed merges")
  }
}
